from .ranking import ranks_from_scores, rank_metrics
from .losses import label_smoothing_cross_entropy, relaxation_loss
from .masks import attention_bias, analogy_score_multiplier

__all__ = [
    "ranks_from_scores",
    "rank_metrics",
    "label_smoothing_cross_entropy",
    "relaxation_loss",
    "attention_bias",
    "analogy_score_multiplier",
]
