"""On-device ranking and Hits@k / MR / MRR metrics.

The reference ranks by double argsort of descending scores
(lit_models/transformer.py:162-164; IKRL.py:304-307; RSME datasets.py:120).
With a stable sort, the rank of the label equals::

    1 + #{j : s_j > s_label} + #{j < label : s_j == s_label}

which we compute directly — O(C) per row instead of two O(C log C) sorts,
and fully vectorized on the VPU (no host round-trip).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def ranks_from_scores(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Ranks (1-based) of ``labels`` under descending stable sort of ``scores``.

    scores: (B, C) float; labels: (B,) int. Returns (B,) int32.
    """
    b, c = scores.shape
    s_label = jnp.take_along_axis(scores, labels[:, None], axis=1)  # (B, 1)
    greater = jnp.sum((scores > s_label).astype(jnp.int32), axis=1)
    col = jnp.arange(c, dtype=labels.dtype)[None, :]
    ties_before = jnp.sum(
        ((scores == s_label) & (col < labels[:, None])).astype(jnp.int32), axis=1
    )
    return greater + ties_before + 1


def tie_counts(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Size of the score tie-group containing the label (>=1; 1 = unique).

    Diagnostic for rank-histogram analysis: under the stable-sort rank
    semantics above, a label inside a tie-group of size g can land anywhere
    in a g-wide rank window, so large tie-groups flatten the Hits@k curve
    between k=1 and k=g (reference tie behavior is identical,
    lit_models/transformer.py:162-164 — torch argsort is also stable).
    """
    s_label = jnp.take_along_axis(scores, labels[:, None], axis=1)
    return jnp.sum((scores == s_label).astype(jnp.int32), axis=1)


def rank_metrics(ranks: jnp.ndarray, ks=(1, 3, 5, 10, 20)) -> Dict[str, jnp.ndarray]:
    """Hits@k / mean-rank / MRR over a vector of 1-based ranks."""
    r = ranks.astype(jnp.float32)
    out = {f"hits{k}": jnp.mean((r <= k).astype(jnp.float32)) for k in ks}
    out["mean_rank"] = jnp.mean(r)
    out["mrr"] = jnp.mean(1.0 / r)
    return out


def rank_score(ranks):
    """(hits10, hits5, hits1, mrr) tuple — lit_models/utils.py:4 parity."""
    m = rank_metrics(jnp.asarray(ranks), ks=(1, 5, 10))
    return (float(m["hits10"]), float(m["hits5"]), float(m["hits1"]),
            float(m["mrr"]))
