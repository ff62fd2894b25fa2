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


def reference_apply_rowstart(scores, sep2, w0, w1, row_start):
    """ViLBERT/FLAVA variant: rows start at 1 (vilbert.py:449-454,
    modeling_flava.py:491-496)."""
    out = scores.copy()
    w0c = np.clip(w0, 0.0, 0.5)
    w1c = np.clip(w1, 0.5, 1.0)
    for i, idx2 in enumerate(sep2):
        out[i, :, row_start:idx2, idx2:] = w0c * out[i, :, row_start:idx2, idx2:]
        out[i, :, idx2:, idx2:] = w1c * out[i, :, idx2:, idx2:]
    return out


def reference_apply_img_offset(scores, sep2, w0, w1, img_length):
    """VisualBERT/ViLT variant: sep_idx += img_length, rows img_length+1:
    (modeling_visual_bert.py:255-260,864-866; modeling_vilt.py:370-375,
    843-844)."""
    out = scores.copy()
    w0c = np.clip(w0, 0.0, 0.5)
    w1c = np.clip(w1, 0.5, 1.0)
    for i, idx2 in enumerate(sep2 + img_length):
        out[i, :, img_length + 1:idx2, idx2:] = (
            w0c * out[i, :, img_length + 1:idx2, idx2:]
        )
        out[i, :, idx2:, idx2:] = w1c * out[i, :, idx2:, idx2:]
    return out


def test_multiplier_row_start_matches_vilbert_loop():
    rng = np.random.default_rng(1)
    B, H, L = 3, 2, 10
    scores = rng.standard_normal((B, H, L, L)).astype(np.float32)
    sep2 = np.array([4, 7, 1])
    mult = np.asarray(
        analogy_score_multiplier(
            jnp.asarray(sep2), L, jnp.asarray(0.3), jnp.asarray(0.7),
            row_start=1,
        )
    )
    np.testing.assert_allclose(
        scores * mult, reference_apply_rowstart(scores, sep2, 0.3, 0.7, 1),
        rtol=1e-6,
    )


def test_multiplier_compat_img_offset_matches_reference_loop():
    """Quirk flag reproduces the reference's shifted mask bit-for-bit."""
    rng = np.random.default_rng(2)
    B, H, T, V = 3, 2, 8, 5  # [text(8) ; visual(5)]
    L = T + V
    scores = rng.standard_normal((B, H, L, L)).astype(np.float32)
    sep2 = np.array([3, 6, 1])
    mult = np.asarray(
        analogy_score_multiplier(
            jnp.asarray(sep2), L, jnp.asarray(0.2), jnp.asarray(0.9),
            compat_img_offset=V,
        )
    )
    np.testing.assert_allclose(
        scores * mult, reference_apply_img_offset(scores, sep2, 0.2, 0.9, V),
        rtol=1e-6,
    )


def test_multiplier_text_len_clamps_visual_block():
    """Corrected single-stream default: visual rows/cols keep multiplier 1."""
    sep2 = np.array([2])
    mult = np.asarray(
        analogy_score_multiplier(
            jnp.asarray(sep2), 6, jnp.asarray(0.25), jnp.asarray(0.5),
            text_len=4,
        )
    )[0, 0]
    # visual cols (4,5) untouched for every row; visual rows untouched
    np.testing.assert_allclose(mult[:, 4:], 1.0)
    np.testing.assert_allclose(mult[4:, :], 1.0)
    np.testing.assert_allclose(mult[:2, 2:4], 0.25)
    np.testing.assert_allclose(mult[2:4, 2:4], 0.5)


def test_attention_bias():
    mask = jnp.asarray([[1, 1, 0], [1, 0, 0]])
    bias = np.asarray(attention_bias(mask))
    assert bias.shape == (2, 1, 1, 3)
    np.testing.assert_allclose(bias[0, 0, 0], [0, 0, -10000.0])
    np.testing.assert_allclose(bias[1, 0, 0], [0, -10000.0, -10000.0])
