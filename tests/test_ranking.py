"""Ranking math vs the reference's double-argsort (stable sort) semantics."""

import jax.numpy as jnp
import numpy as np

from mkg_analogy_tpu.ops.ranking import rank_metrics, ranks_from_scores


def double_argsort_rank(scores: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Reference method (lit_models/transformer.py:162-164) in numpy:
    stable descending sort, then positions."""
    order = np.argsort(-scores, axis=1, kind="stable")
    pos = np.argsort(order, axis=1, kind="stable")
    return pos[np.arange(len(labels)), labels] + 1


def test_matches_double_argsort_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        b, c = rng.integers(1, 8), rng.integers(2, 50)
        scores = rng.standard_normal((b, c)).astype(np.float32)
        labels = rng.integers(0, c, size=b)
        expect = double_argsort_rank(scores, labels)
        got = np.asarray(ranks_from_scores(jnp.asarray(scores), jnp.asarray(labels)))
        np.testing.assert_array_equal(got, expect)


def test_matches_double_argsort_with_ties():
    rng = np.random.default_rng(1)
    for _ in range(20):
        b, c = 4, 16
        # heavy ties: few distinct values
        scores = rng.integers(0, 3, size=(b, c)).astype(np.float32)
        labels = rng.integers(0, c, size=b)
        expect = double_argsort_rank(scores, labels)
        got = np.asarray(ranks_from_scores(jnp.asarray(scores), jnp.asarray(labels)))
        np.testing.assert_array_equal(got, expect)


def test_rank_metrics():
    ranks = jnp.asarray([1, 2, 11, 5])
    m = rank_metrics(ranks)
    assert float(m["hits1"]) == 0.25
    assert float(m["hits10"]) == 0.75
    np.testing.assert_allclose(float(m["mrr"]), np.mean([1, 1 / 2, 1 / 11, 1 / 5]))
    np.testing.assert_allclose(float(m["mean_rank"]), 4.75)
