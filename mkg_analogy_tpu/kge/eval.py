"""KGE evaluation: filtered link prediction, analogical reasoning, triple
classification.

The reference streams per-triple full-entity score buffers into C
(Base.so testHead/testTail -> test_link_prediction, IKRL.py:276-297). Here
ranking runs on-device over batched candidate matrices; the filter mask
(known positives from train+valid+test, OpenKE's l_filter semantics) is a
host-built boolean matrix per batch.

Rank convention: energies — lower is better; rank = 1 + #{strictly better}
(OpenKE counts strictly smaller scores). ``higher_better=True`` flips it for
CE-trained logits (finetune path, ranked descending — IKRL.py:299-316).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.ranking import rank_metrics, ranks_from_scores
from .sampling import TripleStore


def build_filters(*stores: TripleStore):
    """(h, r) -> all known tails, (t, r) -> all known heads, over every
    split (filtered evaluation, OpenKE importTestFiles semantics)."""
    t_of_hr: Dict[Tuple[int, int], set] = {}
    h_of_tr: Dict[Tuple[int, int], set] = {}
    for s in stores:
        for h, t, r in zip(s.heads, s.tails, s.rels):
            t_of_hr.setdefault((int(h), int(r)), set()).add(int(t))
            h_of_tr.setdefault((int(t), int(r)), set()).add(int(h))
    return t_of_hr, h_of_tr


def _filter_mask(pairs, gold, filt, num_entities) -> np.ndarray:
    """(B, E) bool: True where the candidate is a *different* known positive
    and must be skipped."""
    mask = np.zeros((len(pairs), num_entities), dtype=bool)
    for i, ((a, r), g) in enumerate(zip(pairs, gold)):
        known = filt.get((a, r))
        if known:
            mask[i, list(known)] = True
        mask[i, g] = False  # never filter the gold answer itself
    return mask


def link_prediction(
    candidate_fn: Callable,
    test: TripleStore,
    filters,
    num_entities: int,
    batch_size: int = 64,
    task_mode: str = "text",
    seed: int = 0,
) -> Dict[str, float]:
    """Head and tail prediction with raw + filtered metrics.

    candidate_fn(h_idx, r_idx, task_mode, corrupt) -> (B, E) energies
    (lower = better). ``task_mode``: "text" (deterministic 0) or "random"
    (reference parity — Tester.get_task_mode draws 0.4/0.3/0.3 at test
    time, IKRL.py:263-274).
    """
    t_of_hr, h_of_tr = filters
    rng = np.random.default_rng(seed)
    all_ranks = {"raw": [], "filter": []}
    n = len(test)
    for start in range(0, n, batch_size):
        sl = slice(start, min(start + batch_size, n))
        hs = test.heads[sl]
        ts = test.tails[sl]
        rs = test.rels[sl]
        if task_mode == "random":
            tm = rng.choice([0, 1, 2], size=len(hs), p=[0.4, 0.3, 0.3])
        else:
            tm = np.zeros(len(hs), np.int64)
        for corrupt, anchor, gold, filt in (
            ("tail", hs, ts, t_of_hr),
            ("head", ts, hs, h_of_tr),
        ):
            energies = np.asarray(
                candidate_fn(
                    jnp.asarray(anchor), jnp.asarray(rs), jnp.asarray(tm), corrupt
                ),
                dtype=np.float32,
            )
            gold_e = energies[np.arange(len(gold)), gold]
            raw_rank = 1 + (energies < gold_e[:, None]).sum(axis=1)
            fmask = _filter_mask(list(zip(anchor, rs)), gold, filt, num_entities)
            filt_e = np.where(fmask, np.inf, energies)
            filt_rank = 1 + (filt_e < gold_e[:, None]).sum(axis=1)
            all_ranks["raw"].append(raw_rank)
            all_ranks["filter"].append(filt_rank)
    out = {}
    for kind, ranks in all_ranks.items():
        r = np.concatenate(ranks)
        m = rank_metrics(jnp.asarray(r), ks=(1, 3, 10))
        for k, v in m.items():
            out[f"{kind}/{k}"] = float(v)
    # headline keys match getTestLink* (filtered)
    out.update(
        mrr=out["filter/mrr"], mr=out["filter/mean_rank"],
        hit10=out["filter/hits10"], hit3=out["filter/hits3"],
        hit1=out["filter/hits1"],
    )
    return out


def analogical_reasoning(
    finetune_scores_fn: Callable,
    tuples: np.ndarray,
    batch_size: int = 128,
    return_ranks: bool = False,
):
    """Double-argsort ranking of the answer among all entities
    (IKRL.py:299-316). With ``return_ranks`` also returns the per-example
    rank array (tuples order) for diagnostics — the KGE-silo counterpart
    of the MarT trainer's test_ranks.npz dump (tools/analyze_ranks.py)."""
    ranks = []
    for start in range(0, len(tuples), batch_size):
        rows = tuples[start : start + batch_size]
        scores = finetune_scores_fn(
            jnp.asarray(rows[:, 0]), jnp.asarray(rows[:, 1]),
            jnp.asarray(rows[:, 2]), jnp.asarray(rows[:, 5]),
        )
        r = ranks_from_scores(scores, jnp.asarray(rows[:, 3]))
        ranks.append(np.asarray(r))
    r = np.concatenate(ranks)
    m = rank_metrics(jnp.asarray(r), ks=(1, 3, 5, 10))
    metrics = {k: float(v) for k, v in m.items()}
    if return_ranks:
        return metrics, r
    return metrics


def best_threshold(scores: np.ndarray, labels: np.ndarray) -> Tuple[float, float]:
    """Accuracy-maximizing threshold for triple classification
    (Tester.get_best_threshlod semantics, IKRL.py:318-343): candidates
    sorted ascending; positives score below the threshold (energy
    convention)."""
    order = np.argsort(scores, kind="stable")
    s, y = scores[order], labels[order]
    total = float(len(s))
    total_true = float(y.sum())
    total_false = total - total_true
    cum_true = 0.0
    best_acc, best_thr = -1.0, s[0]
    for i in range(len(s)):
        acc = (2 * cum_true + total_false - i) / total
        if acc > best_acc:
            best_acc, best_thr = acc, s[i]
        if y[i] == 1:
            cum_true += 1.0
    return float(best_thr), float(best_acc)


def triple_classification(
    score_fn: Callable,
    pos: TripleStore,
    neg: TripleStore,
    threshold: Optional[float] = None,
) -> Tuple[float, float]:
    """Accuracy with learned threshold: triples scoring below it (energies)
    are classified positive."""

    def scores_of(store):
        return np.asarray(
            score_fn(
                jnp.asarray(store.heads), jnp.asarray(store.tails),
                jnp.asarray(store.rels),
                jnp.zeros(len(store), jnp.int32),
            )
        )

    s = np.concatenate([scores_of(pos), scores_of(neg)])
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    if threshold is None:
        threshold, _ = best_threshold(s, y)
    pred = (s < threshold).astype(np.float64)
    acc = float((pred == y).mean())
    return acc, threshold
