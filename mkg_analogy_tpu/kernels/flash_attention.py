"""K/Q-blocked (flash) variant of the fused attention kernel.

Same contract and packed (B, L, num_heads*head_dim) layout as
``kernels.attention`` — scaled QK^T, the adaptive analogy multiplier
(modeling_unimo.py:342-349 semantics via ops/masks.py geometry), the
additive padding bias, fp32 softmax, attention dropout, and the V
contraction — but with an **online softmax over K blocks** so the score
plane never exists in VMEM at full (Lq, Lk) size. The single-block kernel
in attention.py holds full (Lq, Lk) fp32 planes (scores + three geometry
scratch planes) and exceeds v5e VMEM around L=1024; this one is bounded by
(block_q, block_k) tiles and scales to arbitrary sequence length.

Grid layout: forward (B, head_groups, num_q_blocks, num_k_blocks) with the
K dimension innermost; running (m, l, acc) live in VMEM scratch that
persists across the consecutive K cells of one (batch, head-group, q-block)
and the output is written at the last K cell. The forward also emits the
per-row log-sum-exp so both backward passes recompute normalized
probabilities tile-by-tile (standard flash backward):

- kernel A, grid (..., num_k_blocks, num_q_blocks): accumulates dK/dV (and
  the adaptive-scalar grads dw0/dw1) over Q tiles;
- kernel B, grid (..., num_q_blocks, num_k_blocks): accumulates dQ over K
  tiles.

Dropout is drawn per (q-block, k-block) tile from a seed derived from
(batch, head, q-block, k-block), so forward and both backward kernels
regenerate identical keep-masks. Dropout multiplies the *unnormalized*
exp(s - m) inside the accumulation; because the final division by
l = sum(exp(s - m)) is linear, the result equals dropout applied to
normalized probabilities — the reference semantics (modeling_unimo.py:355).

Numerics note: the single-block kernel casts normalized probs to the
compute dtype before the V contraction; this one casts the unnormalized
exp-weights and divides in fp32 at the end. Both accumulate scores in fp32;
the results differ only at round-off (tested to 2e-2 in bf16, 1e-5 in f32).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import (
    NEG_BIAS,
    _dropout_keep,
    _geometry_planes,
    _heads_per_cell,
)

HARD_MASK = -1e30  # exact exclusion of out-of-range K columns (exp -> 0)


def _tile_seed(seed_ref, *, num_heads, heads_per_cell, h, b_idx, qb, kb,
               n_qblk, n_kblk):
    head = pl.program_id(1) * heads_per_cell + h
    tile = (b_idx * num_heads + head) * n_qblk + qb
    return seed_ref[0] + tile * n_kblk + kb


def _tile_geometry(bnd_ref, w_ref, b_idx, *, bq, bk, row0, col0, geometry):
    boundary = bnd_ref[b_idx]
    return _geometry_planes(
        boundary, w_ref[0], w_ref[1], lq=bq, lk=bk, geometry=geometry,
        row0=row0, col0=col0,
    )


def _col_bias(mask_ref, col0, bk, lk):
    """(1, bk) additive bias: reference pad bias on real columns, hard mask
    on out-of-range columns of a ragged last K tile."""
    bias = (1.0 - mask_ref[0].astype(jnp.float32)) * NEG_BIAS  # (1, bk)
    if lk % bk != 0:
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        bias = jnp.where(cols < lk, bias, HARD_MASK)
    return bias


def _zero_oob_rows(x, row0, limit, blk):
    """Zero rows of a (blk, ...) tile beyond the logical bound ``limit``.

    Ragged last tiles read past the array bound: interpret mode pads with
    NaN, real TPU with undefined data. Multiplicative masks cannot recover
    (0 * NaN = NaN inside the contractions), so every loaded operand gets
    its out-of-range rows zeroed; combined with the HARD_MASK column bias
    this keeps all accumulations exact. No-op (None check) when the block
    divides the length."""
    if limit % blk == 0:
        return x
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    return jnp.where(rows < limit, x, jnp.zeros_like(x))


def _flash_fwd_kernel(bnd_ref, w_ref, seed_ref, mask_ref, q_ref, k_ref,
                      v_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref, *,
                      scale, rate, geometry, num_heads, heads_per_cell,
                      head_dim, deterministic, out_dtype, lq, lk, bq, bk,
                      n_qblk, n_kblk, interpret=False):
    d = head_dim
    b_idx = pl.program_id(0)
    qb = pl.program_id(2)
    kb = pl.program_id(3)
    row0 = qb * bq
    col0 = kb * bk

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, HARD_MASK)
        l_ref[...] = jnp.zeros_like(l_ref)

    bias = _col_bias(mask_ref, col0, bk, lk)
    mult = None
    if geometry is not None:
        mult, _, _ = _tile_geometry(bnd_ref, w_ref, b_idx, bq=bq, bk=bk,
                                    row0=row0, col0=col0, geometry=geometry)
    use_dropout = rate > 0.0 and not deterministic
    inv = 1.0 / (1.0 - rate) if use_dropout else 1.0
    for h in range(heads_per_cell):
        q = q_ref[0, :, h * d:(h + 1) * d]
        k = _zero_oob_rows(k_ref[0, :, h * d:(h + 1) * d], col0, lk, bk)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if mult is not None:
            s = s * mult
        s = s + bias
        m_prev = m_ref[h][:, 0:1]
        l_prev = l_ref[h][:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if use_dropout:
            keep = _dropout_keep(
                p.shape, rate,
                _tile_seed(seed_ref, num_heads=num_heads,
                           heads_per_cell=heads_per_cell, h=h, b_idx=b_idx,
                           qb=qb, kb=kb, n_qblk=n_qblk, n_kblk=n_kblk),
                interpret=interpret,
            )
            p_ctx = jnp.where(keep, p * inv, 0.0)
        else:
            p_ctx = p
        pv = jax.lax.dot_general(
            p_ctx.astype(out_dtype),
            _zero_oob_rows(v_ref[0, :, h * d:(h + 1) * d], col0, lk,
                           bk).astype(out_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:, h * d:(h + 1) * d] = (
            acc_ref[:, h * d:(h + 1) * d] * alpha + pv
        )
        m_ref[h] = jnp.broadcast_to(m_new, m_ref[h].shape)
        l_ref[h] = jnp.broadcast_to(l_new, l_ref[h].shape)

    @pl.when(kb == n_kblk - 1)
    def _():
        for h in range(heads_per_cell):
            l_fin = l_ref[h][:, 0:1]
            out_ref[0, :, h * d:(h + 1) * d] = (
                acc_ref[:, h * d:(h + 1) * d] / l_fin
            ).astype(out_ref.dtype)
            lse_ref[0, h] = m_ref[h][:, 0:1] + jnp.log(l_fin)


def _recompute_tile(q, k, bias, mult, lse_rows, *, scale):
    """Normalized probability tile p = exp(s - lse) plus the raw scores."""
    s_raw = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = (s_raw * mult if mult is not None else s_raw) + bias
    return s_raw, jnp.exp(s - lse_rows)


def _flash_bwd_kv_kernel(bnd_ref, w_ref, seed_ref, mask_ref, q_ref, k_ref,
                         v_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                         dw_ref, dk_acc, dv_acc, dw_acc, *, scale, rate,
                         geometry, num_heads, heads_per_cell, head_dim,
                         deterministic, out_dtype, lq, lk, bq, bk,
                         n_qblk, n_kblk, interpret=False):
    d = head_dim
    b_idx = pl.program_id(0)
    kb = pl.program_id(2)   # K outer
    qb = pl.program_id(3)   # Q inner
    row0 = qb * bq
    col0 = kb * bk

    @pl.when(qb == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when((qb == 0) & (kb == 0))
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)

    bias = _col_bias(mask_ref, col0, bk, lk)
    mult = r0 = r1 = None
    if geometry is not None:
        mult, r0, r1 = _tile_geometry(bnd_ref, w_ref, b_idx, bq=bq, bk=bk,
                                      row0=row0, col0=col0, geometry=geometry)
    use_dropout = rate > 0.0 and not deterministic
    inv = 1.0 / (1.0 - rate) if use_dropout else 1.0
    dw0_acc = jnp.float32(0.0)
    dw1_acc = jnp.float32(0.0)
    for h in range(heads_per_cell):
        q = _zero_oob_rows(q_ref[0, :, h * d:(h + 1) * d], row0, lq, bq)
        k = _zero_oob_rows(k_ref[0, :, h * d:(h + 1) * d], col0, lk, bk)
        v = _zero_oob_rows(v_ref[0, :, h * d:(h + 1) * d], col0, lk, bk)
        g = _zero_oob_rows(g_ref[0, :, h * d:(h + 1) * d], row0, lq, bq)
        lse_rows = _zero_oob_rows(lse_ref[0, h], row0, lq, bq)     # (bq, 1)
        delta_rows = _zero_oob_rows(delta_ref[0, h], row0, lq, bq)
        s_raw, p = _recompute_tile(q, k, bias, mult, lse_rows, scale=scale)
        if use_dropout:
            keep = _dropout_keep(
                p.shape, rate,
                _tile_seed(seed_ref, num_heads=num_heads,
                           heads_per_cell=heads_per_cell, h=h, b_idx=b_idx,
                           qb=qb, kb=kb, n_qblk=n_qblk, n_kblk=n_kblk),
                interpret=interpret,
            )
            p_drop = jnp.where(keep, p * inv, 0.0)
        else:
            keep, p_drop = None, p
        dv_acc[:, h * d:(h + 1) * d] += jax.lax.dot_general(
            p_drop.astype(out_dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if keep is not None:
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = p * (dp - delta_rows)
        if geometry is not None:
            dw0_acc = dw0_acc + jnp.sum(ds * s_raw * r0)
            dw1_acc = dw1_acc + jnp.sum(ds * s_raw * r1)
            ds_raw = ds * mult
        else:
            ds_raw = ds
        ds_raw = (ds_raw * scale).astype(out_dtype)
        dk_acc[:, h * d:(h + 1) * d] += jax.lax.dot_general(
            ds_raw, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if geometry is not None:
        rows8 = jax.lax.broadcasted_iota(jnp.int32, dw_acc.shape, 0)
        dw_acc[...] += jnp.where(
            rows8 == 0, dw0_acc, jnp.where(rows8 == 1, dw1_acc, 0.0)
        )

    @pl.when(qb == n_qblk - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    @pl.when((qb == n_qblk - 1) & (kb == n_kblk - 1))
    def _():
        dw_ref[0, 0] = dw_acc[...]


def _flash_bwd_q_kernel(bnd_ref, w_ref, seed_ref, mask_ref, q_ref, k_ref,
                        v_ref, g_ref, lse_ref, delta_ref, dq_ref, dq_acc, *,
                        scale, rate, geometry, num_heads, heads_per_cell,
                        head_dim, deterministic, out_dtype, lq, lk, bq, bk,
                        n_qblk, n_kblk, interpret=False):
    d = head_dim
    b_idx = pl.program_id(0)
    qb = pl.program_id(2)   # Q outer
    kb = pl.program_id(3)   # K inner
    row0 = qb * bq
    col0 = kb * bk

    @pl.when(kb == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    bias = _col_bias(mask_ref, col0, bk, lk)
    mult = None
    if geometry is not None:
        mult, _, _ = _tile_geometry(bnd_ref, w_ref, b_idx, bq=bq, bk=bk,
                                    row0=row0, col0=col0, geometry=geometry)
    use_dropout = rate > 0.0 and not deterministic
    inv = 1.0 / (1.0 - rate) if use_dropout else 1.0
    for h in range(heads_per_cell):
        # OOB q-rows produce garbage dq rows that the ragged writeback
        # drops; only the K/V operands (contracted over bk) need zeroing.
        q = q_ref[0, :, h * d:(h + 1) * d]
        k = _zero_oob_rows(k_ref[0, :, h * d:(h + 1) * d], col0, lk, bk)
        v = _zero_oob_rows(v_ref[0, :, h * d:(h + 1) * d], col0, lk, bk)
        g = g_ref[0, :, h * d:(h + 1) * d]
        lse_rows = lse_ref[0, h]          # (bq, 1)
        delta_rows = delta_ref[0, h]      # (bq, 1)
        s_raw, p = _recompute_tile(q, k, bias, mult, lse_rows, scale=scale)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if use_dropout:
            keep = _dropout_keep(
                p.shape, rate,
                _tile_seed(seed_ref, num_heads=num_heads,
                           heads_per_cell=heads_per_cell, h=h, b_idx=b_idx,
                           qb=qb, kb=kb, n_qblk=n_qblk, n_kblk=n_kblk),
                interpret=interpret,
            )
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = p * (dp - delta_rows)
        if mult is not None:
            ds = ds * mult
        ds = (ds * scale).astype(out_dtype)
        dq_acc[:, h * d:(h + 1) * d] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kb == n_kblk - 1)
    def _():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _blocks(lq, lk, bq, bk):
    bq = min(bq, lq)
    bk = min(bk, lk)
    return bq, bk, -(-lq // bq), -(-lk // bk)


def _common_specs(b, num_heads, lq, lk, d, bq, bk, kv_grid):
    """in_specs shared by all three kernels. ``kv_grid`` selects which of
    the two trailing grid dims is the q-block index."""
    hpc = _heads_per_cell(num_heads, d)
    w = hpc * d
    if kv_grid:                      # grid (..., kb, qb)
        imap_q = lambda i, j, kb, qb, *_: (i, qb, j)        # noqa: E731
        imap_k = lambda i, j, kb, qb, *_: (i, kb, j)        # noqa: E731
        imap_mask = lambda i, j, kb, qb, *_: (i, 0, kb)     # noqa: E731
        imap_stat = lambda i, j, kb, qb, *_: (i, j, qb, 0)  # noqa: E731
    else:                            # grid (..., qb, kb)
        imap_q = lambda i, j, qb, kb, *_: (i, qb, j)        # noqa: E731
        imap_k = lambda i, j, qb, kb, *_: (i, kb, j)        # noqa: E731
        imap_mask = lambda i, j, qb, kb, *_: (i, 0, kb)     # noqa: E731
        imap_stat = lambda i, j, qb, kb, *_: (i, j, qb, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1, bk), imap_mask, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, w), imap_q, memory_space=pltpu.VMEM),   # q
        pl.BlockSpec((1, bk, w), imap_k, memory_space=pltpu.VMEM),   # k
        pl.BlockSpec((1, bk, w), imap_k, memory_space=pltpu.VMEM),   # v
    ]
    return hpc, w, in_specs, imap_q, imap_k, imap_stat


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15)
)
def _flash_attention(q, k, v, mask, boundary, w, seed, num_heads, scale,
                     rate, geometry, deterministic, compute_dtype, interpret,
                     block_q, block_k):
    out, _ = _flash_attention_fwd(
        q, k, v, mask, boundary, w, seed, num_heads, scale, rate, geometry,
        deterministic, compute_dtype, interpret, block_q, block_k,
    )
    return out


def _flash_attention_fwd(q, k, v, mask, boundary, w, seed, num_heads, scale,
                         rate, geometry, deterministic, compute_dtype,
                         interpret, block_q, block_k):
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // num_heads
    bq, bk, n_qblk, n_kblk = _blocks(lq, lk, block_q, block_k)
    maskf = mask.astype(jnp.float32)[:, None, :]
    hpc, wblk, in_specs, imap_q, _, imap_stat = _common_specs(
        b, num_heads, lq, lk, d, bq, bk, kv_grid=False,
    )
    grid = (b, num_heads // hpc, n_qblk, n_kblk)
    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, rate=rate, geometry=geometry,
        num_heads=num_heads, heads_per_cell=hpc, head_dim=d,
        deterministic=deterministic, out_dtype=compute_dtype,
        lq=lq, lk=lk, bq=bq, bk=bk, n_qblk=n_qblk, n_kblk=n_kblk,
        interpret=interpret,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, bq, wblk), imap_q, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hpc, bq, 1), imap_stat,
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((bq, wblk), jnp.float32),        # acc
                pltpu.VMEM((hpc, bq, 128), jnp.float32),    # running max
                pltpu.VMEM((hpc, bq, 128), jnp.float32),    # running sum
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, num_heads, lq, 1), jnp.float32),
        ),
        interpret=interpret,
    )(boundary, w, seed, maskf, q, k, v)
    return out, (q, k, v, mask, boundary, w, seed, out, lse)


def _flash_attention_bwd(num_heads, scale, rate, geometry, deterministic,
                         compute_dtype, interpret, block_q, block_k,
                         residuals, g):
    q, k, v, mask, boundary, w, seed, out, lse = residuals
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // num_heads
    bq, bk, n_qblk, n_kblk = _blocks(lq, lk, block_q, block_k)
    maskf = mask.astype(jnp.float32)[:, None, :]
    # delta_i = sum_d(g * out) per row/head — the rowsum term of the softmax
    # backward (equals sum_k p_drop * dp, see module docstring derivation)
    delta = jnp.sum(
        g.astype(jnp.float32).reshape(b, lq, num_heads, d)
        * out.astype(jnp.float32).reshape(b, lq, num_heads, d),
        axis=-1,
    ).transpose(0, 2, 1)[..., None]  # (b, num_heads, lq, 1)

    kw = dict(scale=scale, rate=rate, geometry=geometry,
              num_heads=num_heads, head_dim=d, deterministic=deterministic,
              out_dtype=compute_dtype, lq=lq, lk=lk, bq=bq, bk=bk,
              n_qblk=n_qblk, n_kblk=n_kblk, interpret=interpret)

    # --- kernel A: dK/dV/dw, Q innermost
    hpc, wblk, in_specs, imap_q, imap_k, imap_stat = _common_specs(
        b, num_heads, lq, lk, d, bq, bk, kv_grid=True,
    )
    n_cells = num_heads // hpc
    in_specs_a = in_specs + [
        pl.BlockSpec((1, bq, wblk), imap_q, memory_space=pltpu.VMEM),  # g
        pl.BlockSpec((1, hpc, bq, 1), imap_stat,
                     memory_space=pltpu.VMEM),                         # lse
        pl.BlockSpec((1, hpc, bq, 1), imap_stat,
                     memory_space=pltpu.VMEM),                         # delta
    ]
    dk, dv, dw = pl.pallas_call(
        functools.partial(_flash_bwd_kv_kernel, heads_per_cell=hpc, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, n_cells, n_kblk, n_qblk),
            in_specs=in_specs_a,
            out_specs=(
                pl.BlockSpec((1, bk, wblk), imap_k, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, wblk), imap_k, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, 128),
                             lambda i, j, kb, qb, *_: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((bk, wblk), jnp.float32),   # dk acc
                pltpu.VMEM((bk, wblk), jnp.float32),   # dv acc
                pltpu.VMEM((8, 128), jnp.float32),     # dw acc
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, lk, hd), k.dtype),
            jax.ShapeDtypeStruct((b, lk, hd), v.dtype),
            jax.ShapeDtypeStruct((b, n_cells, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(boundary, w, seed, maskf, q, k, v, g, lse, delta)

    # --- kernel B: dQ, K innermost
    hpc, wblk, in_specs, imap_q, imap_k, imap_stat = _common_specs(
        b, num_heads, lq, lk, d, bq, bk, kv_grid=False,
    )
    in_specs_b = in_specs + [
        pl.BlockSpec((1, bq, wblk), imap_q, memory_space=pltpu.VMEM),  # g
        pl.BlockSpec((1, hpc, bq, 1), imap_stat,
                     memory_space=pltpu.VMEM),                         # lse
        pl.BlockSpec((1, hpc, bq, 1), imap_stat,
                     memory_space=pltpu.VMEM),                         # delta
    ]
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_q_kernel, heads_per_cell=hpc, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, n_cells, n_qblk, n_kblk),
            in_specs=in_specs_b,
            out_specs=pl.BlockSpec((1, bq, wblk), imap_q,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bq, wblk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
        interpret=interpret,
    )(boundary, w, seed, maskf, q, k, v, g, lse, delta)

    dw_total = jnp.stack(
        [jnp.sum(dw[:, :, 0, 0]), jnp.sum(dw[:, :, 1, 0])]
    ).astype(w.dtype)
    return (dq, dk, dv, jnp.zeros_like(mask), jnp.zeros_like(boundary),
            dw_total, jnp.zeros_like(seed))


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jnp.ndarray,              # (B, Lq, num_heads*head_dim) packed
    k: jnp.ndarray,              # (B, Lk, num_heads*head_dim)
    v: jnp.ndarray,              # (B, Lk, num_heads*head_dim)
    mask: jnp.ndarray,           # (B, Lk) 1=attend, 0=pad
    num_heads: int,
    *,
    boundary: Optional[jnp.ndarray] = None,
    w0: Optional[jnp.ndarray] = None,
    w1: Optional[jnp.ndarray] = None,
    text_len: Optional[int] = None,
    row_start: int = 0,
    offset: int = 0,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_seed: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    block_q: int = 256,
    block_k: int = 512,
) -> jnp.ndarray:
    """Blocked fused attention — same contract as
    ``kernels.attention.fused_attention`` at any sequence length."""
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
        w = jnp.stack([w0.reshape(()), w1.reshape(())]).astype(jnp.float32)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    seed = dropout_seed.astype(jnp.int32).reshape(1)
    return _flash_attention(
        q, k, v, mask, bnd, w, seed, num_heads, scale, float(dropout_rate),
        geometry, bool(deterministic), compute_dtype, bool(interpret),
        int(block_q), int(block_k),
    )
