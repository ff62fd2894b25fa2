"""Loss parity vs explicit torch-style references."""

import jax.numpy as jnp
import numpy as np

from mkg_analogy_tpu.ops.losses import (
    cosine_similarity,
    label_smoothing_cross_entropy,
    relaxation_loss,
)


def ref_label_smooth_ce(logits, labels, smooth, ignore=-100):
    """Direct port of LabelSmoothSoftmaxCEV1 math (lit_models/utils.py:30)
    in numpy."""
    logits = logits.astype(np.float64)
    n, c = logits.shape
    ignore_mask = labels == ignore
    labels = np.where(ignore_mask, 0, labels)
    target = np.full((n, c), smooth / c)
    target[np.arange(n), labels] = 1.0 - smooth + smooth / c
    # NOTE reference scatters lb_pos over the base fill, so the label cell is
    # exactly (1 - smooth) — replicate that:
    target = np.full((n, c), smooth / c)
    target[np.arange(n), labels] = 1.0 - smooth
    logp = logits - logits.max(1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(1, keepdims=True))
    loss = -(target * logp).sum(1)
    loss[ignore_mask] = 0.0
    return loss.sum() / max((~ignore_mask).sum(), 1)


def test_label_smoothing_matches_reference():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((6, 10)).astype(np.float32)
    labels = np.array([0, 3, 9, 2, -100, 5])
    got = float(
        label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.1)
    )
    expect = ref_label_smooth_ce(logits, labels, 0.1)
    np.testing.assert_allclose(got, expect, rtol=2e-5)


def test_label_smoothing_zero_is_ce():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 7)).astype(np.float32)
    labels = np.array([1, 2, 3, 4])
    got = float(
        label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.0)
    )
    lp = logits - logits.max(1, keepdims=True)
    lp = lp - np.log(np.exp(lp).sum(1, keepdims=True))
    expect = -lp[np.arange(4), labels].mean()
    np.testing.assert_allclose(got, expect, rtol=2e-5)


def test_cosine_similarity_parity():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((5, 8)).astype(np.float32)
    b = rng.standard_normal((5, 8)).astype(np.float32)
    got = np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
    expect = (a * b).sum(1) / (
        np.maximum(np.linalg.norm(a, axis=1), 1e-8)
        * np.maximum(np.linalg.norm(b, axis=1), 1e-8)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_relaxation_loss_formula():
    rng = np.random.default_rng(3)
    qh, ah, rel, r = (rng.standard_normal((4, 6)).astype(np.float32) for _ in range(4))
    got = float(relaxation_loss(*(jnp.asarray(x) for x in (qh, ah, rel, r))))

    def cos(x, y):
        return (x * y).sum(1) / (np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1))

    expect = np.mean(np.maximum(cos(qh, ah), 0) + 1 - cos(rel, r))
    np.testing.assert_allclose(got, expect, rtol=1e-5)
