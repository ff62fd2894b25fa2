"""Pallas fused multi-head attention for the MarT towers.

Folds the whole attention score chain of models/common.py:AttentionCore —
scaled QK^T, the adaptive analogy score *multiplier* (built inline from the
``sep_idx[:,2]`` boundary instead of materializing the reference's
per-example (B, 1, L, L) tensor, modeling_unimo.py:342-349), the additive
padding bias (modeling_unimo.py:56), the fp32 softmax, attention dropout,
and the probs@V contraction — into one kernel, so no (B, H, L, L) fp32
score tensor ever round-trips HBM in either the forward or backward pass.

Sequences here are short (<=256: text 128, vision 99, vision+text 227), so
each (batch, head) grid cell holds full score rows in VMEM and runs a
single-pass softmax — no online/flash tiling needed. The backward is a
custom VJP that recomputes scores/probs in-kernel (flash-attention style)
and regenerates the dropout mask from the same per-cell PRNG seed; it also
emits the gradients of the two trainable adaptive-mask scalars (the clamp
in front of them stays outside the kernel, so autodiff chains it).

Numerics match the einsum path: fp32 score accumulation and softmax, probs
cast to the compute dtype before the V contraction. The dropout RNG stream
(TPU hardware PRNG) differs from the jax.random stream of the einsum path —
masks are equally Bernoulli(rate) but not bit-identical.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIAS = -10000.0  # reference padding bias (modeling_unimo.py:56)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _score_mods(s_raw, mask_row, boundary, w0, w1, *, lq_pad, lk_pad,
                geometry):
    """Multiplier + padding bias on raw fp32 scores.

    geometry: None (no analogy mask) or a static tuple
    (row_start, text_len, offset) replicating ops/masks.py.
    Returns (s_final, mult, region0, region1) — regions for dw0/dw1.
    """
    bias = (1.0 - mask_row) * NEG_BIAS  # (1, lk_pad)
    if geometry is None:
        return s_raw + bias, None, None, None
    row_start, text_len, offset = geometry
    rows = jax.lax.broadcasted_iota(jnp.int32, (lq_pad, lk_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (lq_pad, lk_pad), 1)
    bnd = boundary + offset
    col_is_answer = (cols >= bnd) & (cols < text_len)
    row_is_example = (rows >= row_start) & (rows < bnd)
    row_is_answer = rows >= bnd
    row_in_scope = (row_is_example | row_is_answer) & (rows < text_len)
    region0 = col_is_answer & row_in_scope & row_is_example
    region1 = col_is_answer & row_in_scope & (~row_is_example)
    mult = jnp.where(region0, w0, jnp.where(region1, w1, 1.0))
    return s_raw * mult + bias, mult, region0, region1


def _dropout_keep(shape, rate, seed):
    pltpu.prng_seed(seed)
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    threshold = jnp.uint32(int(rate * float(2 ** 32)))
    return bits >= threshold  # keep with prob (1 - rate)


def _cell_seed(seed_ref, num_heads, h):
    b = pl.program_id(0)
    return seed_ref[0] + b * num_heads + h


def _fwd_kernel(bnd_ref, w_ref, seed_ref, mask_ref, q_ref, k_ref, v_ref,
                out_ref, *, scale, rate, geometry, num_heads, deterministic,
                out_dtype):
    mask_row = mask_ref[0].astype(jnp.float32)  # (1, lk_pad)
    boundary = bnd_ref[pl.program_id(0)] if geometry is not None else 0
    w0 = w_ref[0]
    w1 = w_ref[1]
    lq_pad, d = q_ref.shape[2], q_ref.shape[3]
    lk_pad = k_ref.shape[2]
    # geometry + bias are head-invariant: build once per cell
    _, mult, _, _ = _score_mods(
        jnp.zeros((lq_pad, lk_pad), jnp.float32), mask_row, boundary, w0, w1,
        lq_pad=lq_pad, lk_pad=lk_pad, geometry=geometry,
    )
    bias = (1.0 - mask_row) * NEG_BIAS
    # one grid cell per batch row; static unroll over heads keeps the MXU
    # pipeline busy without 12x as many tiny grid cells
    for h in range(num_heads):
        # native-dtype MXU dots (bf16 in production) with fp32 accumulation
        q = q_ref[0, h]
        k = k_ref[0, h]
        s_raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = (s_raw * mult if mult is not None else s_raw) + bias
        p = jax.nn.softmax(s, axis=-1)
        if not deterministic and rate > 0.0:
            keep = _dropout_keep(p.shape, rate,
                                 _cell_seed(seed_ref, num_heads, h))
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        ctx = jax.lax.dot_general(
            p.astype(out_dtype), v_ref[0, h].astype(out_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, h, :, :] = ctx.astype(out_ref.dtype)


def _bwd_kernel(bnd_ref, w_ref, seed_ref, mask_ref, q_ref, k_ref, v_ref,
                g_ref, dq_ref, dk_ref, dv_ref, dw_ref, *, scale, rate,
                geometry, num_heads, deterministic, out_dtype):
    mask_row = mask_ref[0].astype(jnp.float32)
    boundary = bnd_ref[pl.program_id(0)] if geometry is not None else 0
    w0 = w_ref[0]
    w1 = w_ref[1]
    dw0_acc = jnp.float32(0.0)
    dw1_acc = jnp.float32(0.0)
    for h in range(num_heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        g = g_ref[0, h]
        s_raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s, mult, region0, region1 = _score_mods(
            s_raw, mask_row, boundary, w0, w1,
            lq_pad=q.shape[0], lk_pad=k.shape[0], geometry=geometry,
        )
        p = jax.nn.softmax(s, axis=-1)
        if not deterministic and rate > 0.0:
            keep = _dropout_keep(p.shape, rate,
                                 _cell_seed(seed_ref, num_heads, h))
            inv = 1.0 / (1.0 - rate)
            p_drop = jnp.where(keep, p * inv, 0.0)
        else:
            keep, inv, p_drop = None, 1.0, p
        # the fwd casts probs to the compute dtype before the V
        # contraction; mirror that so gradients match the actual forward
        p_cast = p_drop.astype(out_dtype)
        dv = jax.lax.dot_general(
            p_cast, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if keep is not None:
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if geometry is not None:
            dw0_acc = dw0_acc + jnp.sum(jnp.where(region0, ds * s_raw, 0.0))
            dw1_acc = dw1_acc + jnp.sum(jnp.where(region1, ds * s_raw, 0.0))
            ds_raw = ds * mult
        else:
            ds_raw = ds
        ds_raw = (ds_raw * scale).astype(out_dtype)
        dq = jax.lax.dot_general(
            ds_raw, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds_raw, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, h, :, :] = dq.astype(dq_ref.dtype)
        dk_ref[0, h, :, :] = dk.astype(dk_ref.dtype)
        dv_ref[0, h, :, :] = dv.astype(dv_ref.dtype)
    # (8, 128) VMEM tile per cell: row 0 carries dw0, row 1 dw1
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    dw_ref[0, :, :] = jnp.where(
        rows8 == 0, dw0_acc, jnp.where(rows8 == 1, dw1_acc, 0.0)
    )


def _pad_axis(x, axis, target):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _specs(b, h, lq_pad, lk_pad, d, geometry):
    """Grid + in_specs for PrefetchScalarGridSpec: boundary (B,), w (2,) and
    seed (1,) ride as scalar-prefetch SMEM arrays; index_maps take the
    scalar refs as trailing args (ignored)."""
    grid = (b,)
    in_specs = [
        pl.BlockSpec((1, 1, lk_pad), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # mask
        pl.BlockSpec((1, h, lq_pad, d), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),          # q
        pl.BlockSpec((1, h, lk_pad, d), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),          # k
        pl.BlockSpec((1, h, lk_pad, d), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),          # v
    ]
    return grid, in_specs


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12)
)
def _fused_attention(q, k, v, mask, boundary, w, seed,
                     scale, rate, geometry, deterministic, compute_dtype,
                     interpret):
    out, _ = _fused_attention_fwd(q, k, v, mask, boundary, w, seed, scale,
                                  rate, geometry, deterministic,
                                  compute_dtype, interpret)
    return out


def _fused_attention_fwd(q, k, v, mask, boundary, w, seed, scale, rate,
                         geometry, deterministic, compute_dtype, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_pad, lk_pad = _round_up(lq, 128), _round_up(lk, 128)
    qp = _pad_axis(q, 2, lq_pad)
    kp = _pad_axis(k, 2, lk_pad)
    vp = _pad_axis(v, 2, lk_pad)
    maskp = _pad_axis(mask.astype(jnp.float32), 1, lk_pad)[:, None, :]
    grid, in_specs = _specs(b, h, lq_pad, lk_pad, d, geometry)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, rate=rate, geometry=geometry,
        num_heads=h, deterministic=deterministic, out_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, h, lq_pad, d),
                                   lambda i, *_: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_pad, d), q.dtype),
        interpret=interpret,
    )(boundary, w, seed, maskp, qp, kp, vp)
    out = out[:, :, :lq]
    return out, (q, k, v, mask, boundary, w, seed)


def _fused_attention_bwd(scale, rate, geometry, deterministic,
                         compute_dtype, interpret, residuals, g):
    q, k, v, mask, boundary, w, seed = residuals
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_pad, lk_pad = _round_up(lq, 128), _round_up(lk, 128)
    qp = _pad_axis(q, 2, lq_pad)
    kp = _pad_axis(k, 2, lk_pad)
    vp = _pad_axis(v, 2, lk_pad)
    gp = _pad_axis(g, 2, lq_pad)
    maskp = _pad_axis(mask.astype(jnp.float32), 1, lk_pad)[:, None, :]
    grid, in_specs = _specs(b, h, lq_pad, lk_pad, d, geometry)
    in_specs = in_specs + [
        pl.BlockSpec((1, h, lq_pad, d), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # g
    ]
    kernel = functools.partial(
        _bwd_kernel, scale=scale, rate=rate, geometry=geometry,
        num_heads=h, deterministic=deterministic, out_dtype=compute_dtype,
    )
    dq, dk, dv, dw = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, h, lq_pad, d), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, lk_pad, d), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, lk_pad, d), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, lq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, lk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, lk_pad, d), v.dtype),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(boundary, w, seed, maskp, qp, kp, vp, gp)
    dw_total = jnp.stack(
        [jnp.sum(dw[:, 0, 0]), jnp.sum(dw[:, 1, 0])]
    ).astype(w.dtype)
    return (dq[:, :, :lq], dk[:, :, :lk], dv[:, :, :lk],
            jnp.zeros_like(mask), jnp.zeros_like(boundary), dw_total,
            jnp.zeros_like(seed))


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention(
    q: jnp.ndarray,              # (B, H, Lq, D)
    k: jnp.ndarray,              # (B, H, Lk, D)
    v: jnp.ndarray,              # (B, H, Lk, D)
    mask: jnp.ndarray,           # (B, Lk) 1=attend, 0=pad
    *,
    boundary: Optional[jnp.ndarray] = None,  # (B,) sep_idx[:, 2]
    w0: Optional[jnp.ndarray] = None,        # clamped scalar, shape (1,)
    w1: Optional[jnp.ndarray] = None,
    text_len: Optional[int] = None,
    row_start: int = 0,
    offset: int = 0,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_seed: Optional[jnp.ndarray] = None,  # scalar int32
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(scale·QKᵀ ∘ analogy_mult + pad_bias) @ V, fused.

    ``boundary``/``w0``/``w1`` enable the analogy multiplier with the
    ops/masks.py geometry (row_start / text_len / compat offset).
    """
    b, h, lq, d = q.shape
    scale = float(d) ** -0.5
    geometry = None
    if boundary is not None:
        geometry = (
            int(row_start),
            int(lq if text_len is None else text_len),
            int(offset),
        )
        bnd = boundary.astype(jnp.int32).reshape(b)
    else:
        bnd = jnp.zeros((b,), jnp.int32)
    if w0 is None:
        w = jnp.ones((2,), jnp.float32)
    else:
        w = jnp.stack(
            [w0.reshape(()), w1.reshape(())]
        ).astype(jnp.float32)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    seed = dropout_seed.astype(jnp.int32).reshape(1)
    return _fused_attention(
        q, k, v, mask, bnd, w, seed, scale, float(dropout_rate), geometry,
        bool(deterministic), compute_dtype, bool(interpret),
    )
