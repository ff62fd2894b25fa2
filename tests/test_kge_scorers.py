"""Closed-form checks for the KGE scorers."""

import jax.numpy as jnp
import numpy as np

from mkg_analogy_tpu.kge.scorers import (
    analogy_energy,
    complex_queries,
    complex_score,
    margin_loss,
    softplus_loss,
    transe_distance,
)


def test_transe_distance_l1():
    h = jnp.asarray([[1.0, 0.0]])
    r = jnp.asarray([[0.0, 1.0]])
    t = jnp.asarray([[1.0, 1.0]])
    # normalized: h+r-t has known value; easier to check unnormalized:
    d = transe_distance(h, t, r, p_norm=1, normalize=False)
    np.testing.assert_allclose(np.asarray(d), [0.0], atol=1e-6)
    d2 = transe_distance(h, t * 2, r, p_norm=1, normalize=False)
    np.testing.assert_allclose(np.asarray(d2), [2.0], atol=1e-6)


def test_transe_broadcast():
    rng = np.random.default_rng(0)
    h = rng.standard_normal((4, 1, 8)).astype(np.float32)
    t = rng.standard_normal((1, 10, 8)).astype(np.float32)
    r = rng.standard_normal((4, 1, 8)).astype(np.float32)
    d = transe_distance(jnp.asarray(h), jnp.asarray(t), jnp.asarray(r))
    assert d.shape == (4, 10)


def test_complex_score_matches_manual():
    rng = np.random.default_rng(1)
    rank = 4
    lhs = rng.standard_normal((3, 2 * rank)).astype(np.float32)
    rel = rng.standard_normal((3, 2 * rank)).astype(np.float32)
    rhs = rng.standard_normal((3, 2 * rank)).astype(np.float32)
    got = np.asarray(complex_score(*(jnp.asarray(x) for x in (lhs, rel, rhs)), rank))
    lr, li = lhs[:, :rank], lhs[:, rank:]
    rr, ri = rel[:, :rank], rel[:, rank:]
    or_, oi = rhs[:, :rank], rhs[:, rank:]
    expect = ((lr * rr - li * ri) * or_ + (lr * ri + li * rr) * oi).sum(1)
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # query form consistency: q @ rhs == score
    q = np.asarray(complex_queries(jnp.asarray(lhs), jnp.asarray(rel), rank))
    np.testing.assert_allclose((q * rhs).sum(1), expect, rtol=1e-4)


def test_analogy_energy_manual():
    rng = np.random.default_rng(2)
    d = 4
    args = [rng.standard_normal((2, d)).astype(np.float32) for _ in range(6)]
    h_re, h_im, t_re, t_im, r_re, r_im = args
    h, t, r = (rng.standard_normal((2, 2 * d)).astype(np.float32) for _ in range(3))
    got = np.asarray(
        analogy_energy(*map(jnp.asarray, (h_re, h_im, h, t_re, t_im, t, r_re, r_im, r)))
    )
    cplx = (r_re * h_re * t_re + r_re * h_im * t_im + r_im * h_re * t_im
            - r_im * h_im * t_re).sum(1)
    dist = (h * t * r).sum(1)
    np.testing.assert_allclose(got, -(cplx + dist), rtol=1e-5)


def test_margin_loss():
    p = jnp.asarray([1.0, 2.0])
    n = jnp.asarray([[2.0], [1.0]])
    # max(p-n, -m): [max(-1,-5), max(1,-5)] -> mean 0 + margin 5
    got = float(margin_loss(p, n, 5.0))
    np.testing.assert_allclose(got, 5.0)


def test_softplus_loss_positive():
    p = jnp.asarray([[-3.0], [-2.0]])
    n = jnp.asarray([[-5.0, -4.0], [-6.0, -3.0]])
    val = float(softplus_loss(p, n))
    assert val > 0
