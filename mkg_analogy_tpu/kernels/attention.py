"""Pallas fused multi-head attention for the MarT towers.

Folds the whole attention score chain of models/common.py:AttentionCore —
scaled QK^T, the adaptive analogy score *multiplier* (built inline from the
``sep_idx[:,2]`` boundary instead of materializing the reference's
per-example (B, 1, L, L) tensor, modeling_unimo.py:342-349), the additive
padding bias (modeling_unimo.py:56), the fp32 softmax, attention dropout,
and the probs@V contraction — into one kernel, so no (B, H, L, L) fp32
score tensor ever round-trips HBM in either the forward or backward pass.

Layout is the whole point of this kernel's design: q/k/v arrive **packed as
(B, L, num_heads*head_dim)** — the exact tensor the QKV projection GEMMs
produce — and the context leaves the kernel the same way, feeding the
output projection directly. The previous (B, H, L, D) convention forced XLA
to materialize transposed copies of every projection output (measured
466 MB/step of HBM copy traffic on the flagship train step at B=32); this
one needs none. Heads are carved out by the *grid*: one cell per
(batch row, head), so the per-head (L, d) slices are strided DMAs done by
the memory engine, not VPU lane shuffles (an earlier in-kernel-slicing
variant spent 7.8 ms/step on shuffles and lost to XLA).

The analogy-multiplier geometry is head-invariant, so it is computed once
per batch row (at head 0) into VMEM scratch that persists across the
consecutive head cells of the same row — Mosaic executes grid cells
sequentially over the same scratch buffers.

Sequences here are short (<=256: text 128, vision 99, vision+text 227), so
each cell holds full score rows in VMEM and runs a single-pass softmax — no
online/flash tiling needed, and no padding: block shapes use the exact
(Lq, Lk) and Mosaic handles the ragged tile edges. This VMEM-residency
bounds the kernel near L=1024 on v5e; ``kernels/flash_attention.py`` is the
K-blocked online-softmax variant with the same contract that scales to
arbitrary sequence length (``--fused_attention flash``). The backward is a custom
VJP that recomputes scores/probs in-kernel (flash-attention style) and
regenerates the dropout mask from the same per-cell PRNG seed; it also
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


def _geometry_planes(boundary, w0, w1, *, lq, lk, geometry, row0=0, col0=0):
    """(mult, region0, region1) planes for one batch row — head-invariant
    (ops/masks.py parity). region* are 0/1 floats for the dw reductions.
    ``row0``/``col0`` offset the iota planes so a (lq, lk)-shaped *tile* of
    the full score matrix gets the right absolute geometry (flash path)."""
    row_start, text_len, offset = geometry
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
    bnd = boundary + offset
    col_is_answer = (cols >= bnd) & (cols < text_len)
    row_is_example = (rows >= row_start) & (rows < bnd)
    row_is_answer = rows >= bnd
    row_in_scope = (row_is_example | row_is_answer) & (rows < text_len)
    region0 = col_is_answer & row_in_scope & row_is_example
    region1 = col_is_answer & row_in_scope & (~row_is_example)
    mult = jnp.where(region0, w0, jnp.where(region1, w1, 1.0))
    return (mult, region0.astype(jnp.float32), region1.astype(jnp.float32))


def _dropout_keep(shape, rate, seed, *, interpret=False):
    threshold = jnp.uint32(int(rate * float(2 ** 32)))
    if interpret:
        # pltpu PRNG has no CPU lowering; interpret mode substitutes a
        # counter-based integer hash (lowbias32-style finalizer). The only
        # property the kernels rely on is identical masks for identical
        # (shape, seed) across forward and both backward passes — which a
        # pure function of (element index, seed) gives by construction.
        idx = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
               * jnp.uint32(shape[-1])
               + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        x = idx ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
        x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        return x >= threshold
    pltpu.prng_seed(seed)
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    return bits >= threshold  # keep with prob (1 - rate)


def _cell_seed(seed_ref, num_heads, heads_per_cell, h):
    head = pl.program_id(1) * heads_per_cell + h
    return seed_ref[0] + pl.program_id(0) * num_heads + head


def _hoist_geometry(bnd_ref, w_ref, mult_ref, r0_ref, r1_ref, *, lq, lk,
                    geometry):
    """Fill the per-row scratch planes once, at the head-0 cell."""
    # program_id / scalar reads stay OUTSIDE the pl.when body (interpret
    # mode cannot lower program_id from inside the predicated closure)
    boundary = bnd_ref[pl.program_id(0)]
    w0 = w_ref[0]
    w1 = w_ref[1]
    is_head0 = pl.program_id(1) == 0

    @pl.when(is_head0)
    def _():
        mult, r0, r1 = _geometry_planes(
            boundary, w0, w1, lq=lq, lk=lk, geometry=geometry,
        )
        mult_ref[:, :] = mult
        r0_ref[:, :] = r0
        r1_ref[:, :] = r1


def _fwd_kernel(bnd_ref, w_ref, seed_ref, mask_ref, q_ref, k_ref, v_ref,
                out_ref, mult_ref=None, r0_ref=None, r1_ref=None, *, scale, rate, geometry,
                num_heads, heads_per_cell, head_dim, deterministic,
                out_dtype, interpret=False):
    lq, lk = q_ref.shape[1], k_ref.shape[1]
    d = head_dim
    if geometry is not None:
        _hoist_geometry(bnd_ref, w_ref, mult_ref, r0_ref, r1_ref,
                        lq=lq, lk=lk, geometry=geometry)
    bias = (1.0 - mask_ref[0].astype(jnp.float32)) * NEG_BIAS  # (1, lk)
    for h in range(heads_per_cell):
        q = q_ref[0, :, h * d:(h + 1) * d]
        k = k_ref[0, :, h * d:(h + 1) * d]
        s_raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = (s_raw * mult_ref[:, :] if geometry is not None else s_raw) + bias
        p = jax.nn.softmax(s, axis=-1)
        if not deterministic and rate > 0.0:
            keep = _dropout_keep(
                p.shape, rate,
                _cell_seed(seed_ref, num_heads, heads_per_cell, h),
                interpret=interpret,
            )
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        ctx = jax.lax.dot_general(
            p.astype(out_dtype),
            v_ref[0, :, h * d:(h + 1) * d].astype(out_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, h * d:(h + 1) * d] = ctx.astype(out_ref.dtype)


def _bwd_kernel(bnd_ref, w_ref, seed_ref, mask_ref, q_ref, k_ref, v_ref,
                g_ref, dq_ref, dk_ref, dv_ref, dw_ref, mult_ref=None, r0_ref=None,
                r1_ref=None, *, scale, rate, geometry, num_heads, heads_per_cell,
                head_dim, deterministic, out_dtype, interpret=False):
    lq, lk = q_ref.shape[1], k_ref.shape[1]
    d = head_dim
    if geometry is not None:
        _hoist_geometry(bnd_ref, w_ref, mult_ref, r0_ref, r1_ref,
                        lq=lq, lk=lk, geometry=geometry)
    bias = (1.0 - mask_ref[0].astype(jnp.float32)) * NEG_BIAS
    dw0_acc = jnp.float32(0.0)
    dw1_acc = jnp.float32(0.0)
    for h in range(heads_per_cell):
        q = q_ref[0, :, h * d:(h + 1) * d]
        k = k_ref[0, :, h * d:(h + 1) * d]
        v = v_ref[0, :, h * d:(h + 1) * d]
        g = g_ref[0, :, h * d:(h + 1) * d]
        s_raw = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if geometry is not None:
            mult = mult_ref[:, :]
            s = s_raw * mult + bias
        else:
            mult = None
            s = s_raw + bias
        p = jax.nn.softmax(s, axis=-1)
        if not deterministic and rate > 0.0:
            keep = _dropout_keep(
                p.shape, rate,
                _cell_seed(seed_ref, num_heads, heads_per_cell, h),
                interpret=interpret,
            )
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
            dw0_acc = dw0_acc + jnp.sum(ds * s_raw * r0_ref[:, :])
            dw1_acc = dw1_acc + jnp.sum(ds * s_raw * r1_ref[:, :])
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
        dq_ref[0, :, h * d:(h + 1) * d] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, h * d:(h + 1) * d] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, h * d:(h + 1) * d] = dv.astype(dv_ref.dtype)
    # (8, 128) VMEM tile per cell: row 0 carries dw0, row 1 dw1
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    dw_ref[0, 0, :, :] = jnp.where(
        rows8 == 0, dw0_acc, jnp.where(rows8 == 1, dw1_acc, 0.0)
    )


def _heads_per_cell(num_heads: int, d: int) -> int:
    """Largest head group whose packed width is a legal Mosaic block minor
    dim: either the full packed width, or a multiple of 128 lanes."""
    hd = num_heads * d
    if hd <= 128 or 128 % d != 0:
        return num_heads          # whole packed width in one cell
    hpc = 128 // d
    while num_heads % hpc != 0:   # need an integer number of cells
        hpc -= 1
        if hpc <= 1:
            return 1
    return hpc


def _specs(b, num_heads, lq, lk, d, geometry=None):
    """Grid (batch, head-group) + in_specs; boundary (B,), w (2,) and seed
    (1,) ride as scalar-prefetch SMEM arrays (index_maps get the scalar
    refs as trailing args, ignored). Each cell's block carries
    ``heads_per_cell`` packed heads — a 128-lane-aligned strided DMA, so
    the head split costs no VPU shuffles (Mosaic requires minor block dims
    divisible by 128 or full). Blocks carry exact logical shapes otherwise
    — no padding, Mosaic masks ragged tile edges. The three (lq, lk) fp32
    geometry scratch planes are only allocated when an analogy geometry is
    present — the no-geometry path (vision tower, plain self-attention)
    would otherwise waste 3*lq*lk*4 bytes of VMEM per cell on dead
    buffers (the kernels then see their default ``None`` refs)."""
    hpc = _heads_per_cell(num_heads, d)
    w = hpc * d
    grid = (b, num_heads // hpc)
    in_specs = [
        pl.BlockSpec((1, 1, lk), lambda i, j, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # mask
        pl.BlockSpec((1, lq, w), lambda i, j, *_: (i, 0, j),
                     memory_space=pltpu.VMEM),          # q
        pl.BlockSpec((1, lk, w), lambda i, j, *_: (i, 0, j),
                     memory_space=pltpu.VMEM),          # k
        pl.BlockSpec((1, lk, w), lambda i, j, *_: (i, 0, j),
                     memory_space=pltpu.VMEM),          # v
    ]
    if geometry is not None:
        scratch = [
            pltpu.VMEM((lq, lk), jnp.float32),   # mult plane (per batch row)
            pltpu.VMEM((lq, lk), jnp.float32),   # region0
            pltpu.VMEM((lq, lk), jnp.float32),   # region1
        ]
    else:
        scratch = []
    return grid, in_specs, scratch, hpc


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13)
)
def _fused_attention(q, k, v, mask, boundary, w, seed,
                     num_heads, scale, rate, geometry, deterministic,
                     compute_dtype, interpret):
    out, _ = _fused_attention_fwd(q, k, v, mask, boundary, w, seed,
                                  num_heads, scale, rate, geometry,
                                  deterministic, compute_dtype, interpret)
    return out


def _fused_attention_fwd(q, k, v, mask, boundary, w, seed, num_heads, scale,
                         rate, geometry, deterministic, compute_dtype,
                         interpret):
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // num_heads
    maskf = mask.astype(jnp.float32)[:, None, :]
    grid, in_specs, scratch, hpc = _specs(b, num_heads, lq, lk, d, geometry)
    wblk = hpc * d
    kernel = functools.partial(
        _fwd_kernel, scale=scale, rate=rate, geometry=geometry,
        num_heads=num_heads, heads_per_cell=hpc, head_dim=d,
        deterministic=deterministic, out_dtype=compute_dtype,
        interpret=interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, lq, wblk),
                                   lambda i, j, *_: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
        interpret=interpret,
    )(boundary, w, seed, maskf, q, k, v)
    return out, (q, k, v, mask, boundary, w, seed)


def _fused_attention_bwd(num_heads, scale, rate, geometry, deterministic,
                         compute_dtype, interpret, residuals, g):
    q, k, v, mask, boundary, w, seed = residuals
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // num_heads
    maskf = mask.astype(jnp.float32)[:, None, :]
    grid, in_specs, scratch, hpc = _specs(b, num_heads, lq, lk, d, geometry)
    wblk = hpc * d
    n_cells = num_heads // hpc
    in_specs = in_specs + [
        pl.BlockSpec((1, lq, wblk), lambda i, j, *_: (i, 0, j),
                     memory_space=pltpu.VMEM),  # g
    ]
    kernel = functools.partial(
        _bwd_kernel, scale=scale, rate=rate, geometry=geometry,
        num_heads=num_heads, heads_per_cell=hpc, head_dim=d,
        deterministic=deterministic, out_dtype=compute_dtype,
        interpret=interpret,
    )
    dq, dk, dv, dw = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, lq, wblk), lambda i, j, *_: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, wblk), lambda i, j, *_: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, wblk), lambda i, j, *_: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, 128), lambda i, j, *_: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=scratch,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, lk, hd), k.dtype),
            jax.ShapeDtypeStruct((b, lk, hd), v.dtype),
            jax.ShapeDtypeStruct((b, n_cells, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(boundary, w, seed, maskf, q, k, v, g)
    dw_total = jnp.stack(
        [jnp.sum(dw[:, :, 0, 0]), jnp.sum(dw[:, :, 1, 0])]
    ).astype(w.dtype)
    return (dq, dk, dv, jnp.zeros_like(mask), jnp.zeros_like(boundary),
            dw_total, jnp.zeros_like(seed))


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention(
    q: jnp.ndarray,              # (B, Lq, num_heads*head_dim) packed
    k: jnp.ndarray,              # (B, Lk, num_heads*head_dim)
    v: jnp.ndarray,              # (B, Lk, num_heads*head_dim)
    mask: jnp.ndarray,           # (B, Lk) 1=attend, 0=pad
    num_heads: int,
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
    """softmax(scale·QKᵀ ∘ analogy_mult + pad_bias) @ V, fused, in the
    packed (B, L, H) head layout of the projection GEMMs.

    ``boundary``/``w0``/``w1`` enable the analogy multiplier with the
    ops/masks.py geometry (row_start / text_len / compat offset).
    """
    b, lq, hd = q.shape
    d = hd // num_heads
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
        q, k, v, mask, bnd, w, seed, num_heads, scale, float(dropout_rate),
        geometry, bool(deterministic), compute_dtype, bool(interpret),
    )
