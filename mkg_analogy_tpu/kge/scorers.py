"""KG-embedding scoring functions as pure, broadcastable jnp ops.

The reference implements these inside nn.Modules with per-row Python loops
and boolean index_put (IKRL.py:447-486, 645-650; RSME models.py:216-222).
Here each scorer is a shape-polymorphic function over embedding tensors —
`vmap`/broadcasting replaces the loops, and full-vocabulary scoring is one
MXU matmul.

Conventions:
- ``*_distance`` / ``*_energy``: LOWER is better (margin-loss family).
- ``*_score``: HIGHER is better (softmax-CE family).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize(p=2) parity (norm clamped at eps)."""
    n = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    return x / n


def transe_distance(
    h: jnp.ndarray,
    t: jnp.ndarray,
    r: jnp.ndarray,
    p_norm: int = 1,
    normalize: bool = True,
) -> jnp.ndarray:
    """|| h + r - t ||_p with optional L2-normalized inputs
    (IKRL.py:430-445 TransE._calc semantics; the head_batch/tail_batch
    reshapes are handled by broadcasting at the call site)."""
    if normalize:
        h, r, t = l2_normalize(h), l2_normalize(r), l2_normalize(t)
    diff = h + r - t
    if p_norm == 1:
        return jnp.sum(jnp.abs(diff), axis=-1)
    if p_norm == 2:
        return jnp.linalg.norm(diff, axis=-1)
    return jnp.power(jnp.sum(jnp.power(jnp.abs(diff), p_norm), axis=-1), 1.0 / p_norm)


def analogy_energy(
    h_re: jnp.ndarray, h_im: jnp.ndarray, h: jnp.ndarray,
    t_re: jnp.ndarray, t_im: jnp.ndarray, t: jnp.ndarray,
    r_re: jnp.ndarray, r_im: jnp.ndarray, r: jnp.ndarray,
) -> jnp.ndarray:
    """ANALOGY energy: negated (ComplEx-part + DistMult-part); lower is
    better (IKRL.py:645-650 _calc)."""
    cplx = jnp.sum(
        r_re * h_re * t_re
        + r_re * h_im * t_im
        + r_im * h_re * t_im
        - r_im * h_im * t_re,
        axis=-1,
    )
    dist = jnp.sum(h * t * r, axis=-1)
    return -(cplx + dist)


def split_complex(x: jnp.ndarray, rank: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return x[..., :rank], x[..., rank:]


def complex_score(
    lhs: jnp.ndarray, rel: jnp.ndarray, rhs: jnp.ndarray, rank: int
) -> jnp.ndarray:
    """Re(<lhs, rel, conj(rhs)>) per row; embeddings are [re ; im] of width
    2*rank (RSME models.py:216-222)."""
    l_re, l_im = split_complex(lhs, rank)
    r_re, r_im = split_complex(rel, rank)
    o_re, o_im = split_complex(rhs, rank)
    return jnp.sum(
        (l_re * r_re - l_im * r_im) * o_re + (l_re * r_im + l_im * r_re) * o_im,
        axis=-1,
    )


def complex_queries(lhs: jnp.ndarray, rel: jnp.ndarray, rank: int) -> jnp.ndarray:
    """Query vector q(lhs, rel) with score(q, rhs) = q @ rhs
    (RSME models.py get_queries)."""
    l_re, l_im = split_complex(lhs, rank)
    r_re, r_im = split_complex(rel, rank)
    return jnp.concatenate(
        [l_re * r_re - l_im * r_im, l_re * r_im + l_im * r_re], axis=-1
    )


def distmult_score(h: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(h * r * t, axis=-1)


def margin_loss(
    p_dist: jnp.ndarray, n_dist: jnp.ndarray, margin: float
) -> jnp.ndarray:
    """mean(max(p - n, -margin)) + margin — MarginLoss parity
    (IKRL.py:171-196). p_dist (B,) or (B,1); n_dist (B, N)."""
    if p_dist.ndim < n_dist.ndim:
        p_dist = p_dist[..., None]
    return jnp.mean(jnp.maximum(p_dist - n_dist, -margin)) + margin


def softplus_loss(p_score: jnp.ndarray, n_score: jnp.ndarray) -> jnp.ndarray:
    """(mean(softplus(-p)) + mean(softplus(n))) / 2 — SoftplusLoss parity
    (IKRL.py:887-911). Scores here follow the energy convention of the
    caller (IKRL passes raw energies)."""
    sp = lambda x: jnp.logaddexp(x, 0.0)
    return (jnp.mean(sp(-p_score)) + jnp.mean(sp(n_score))) / 2.0
