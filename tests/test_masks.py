"""Adaptive analogy mask: vectorized multiplier vs the reference's
per-example scatter-loop semantics (modeling_unimo.py:342-349)."""

import jax.numpy as jnp
import numpy as np

from mkg_analogy_tpu.ops.masks import analogy_score_multiplier, attention_bias


def reference_apply(scores, sep2, w0, w1):
    """Reference loop: scores (B, H, L, L) modified in place."""
    out = scores.copy()
    w0c = np.clip(w0, 0.0, 0.5)
    w1c = np.clip(w1, 0.5, 1.0)
    for i, idx2 in enumerate(sep2):
        out[i, :, :idx2, idx2:] = w0c * out[i, :, :idx2, idx2:]
        out[i, :, idx2:, idx2:] = w1c * out[i, :, idx2:, idx2:]
    return out


def test_multiplier_matches_reference_loop():
    rng = np.random.default_rng(0)
    B, H, L = 3, 2, 10
    scores = rng.standard_normal((B, H, L, L)).astype(np.float32)
    sep2 = np.array([4, 7, 0])
    for w0, w1 in [(0.3, 0.5), (0.9, 0.2), (-1.0, 1.5)]:
        mult = np.asarray(
            analogy_score_multiplier(
                jnp.asarray(sep2), L, jnp.asarray(w0), jnp.asarray(w1)
            )
        )
        got = scores * mult
        expect = reference_apply(scores, sep2, w0, w1)
        np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_attention_bias():
    mask = jnp.asarray([[1, 1, 0], [1, 0, 0]])
    bias = np.asarray(attention_bias(mask))
    assert bias.shape == (2, 1, 1, 3)
    np.testing.assert_allclose(bias[0, 0, 0], [0, 0, -10000.0])
    np.testing.assert_allclose(bias[1, 0, 0], [0, -10000.0, -10000.0])
