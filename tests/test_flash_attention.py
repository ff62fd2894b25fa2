"""Blocked (flash) fused attention vs the einsum reference path: forward
and gradient equivalence in interpret mode (CPU), across the mask
geometries the models use and across block shapes (single block, exact
division, ragged last tiles, cross-length K/V). Dropout uses pltpu PRNG
and is validated on real TPU (tools/bench_attention_seq.py --check);
interpret mode cannot lower it on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mkg_analogy_tpu.kernels.flash_attention import flash_attention

from test_fused_attention import CASES, H, einsum_reference, make_inputs

# (block_q, block_k) shapes exercised against the L=12 default inputs:
# one block, exact division, ragged Q, ragged K, ragged both.
BLOCKS = [(16, 16), (6, 6), (8, 6), (6, 8), (8, 8)]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("blocks", [(16, 16), (8, 8)])
def test_forward_matches_einsum(case, blocks):
    q, k, v, mask = make_inputs()
    kwargs = dict(case)
    if "boundary" in kwargs:
        kwargs["boundary"] = jnp.asarray(kwargs["boundary"])
        kwargs["w0"] = jnp.asarray([0.3])
        kwargs["w1"] = jnp.asarray([0.7])
    want = einsum_reference(q, k, v, mask, **kwargs)
    got = flash_attention(q, k, v, mask, H, deterministic=True,
                          compute_dtype=jnp.float32, interpret=True,
                          block_q=blocks[0], block_k=blocks[1], **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("blocks", BLOCKS)
def test_block_shapes(blocks):
    """Ragged last tiles in Q and/or K leave no trace in the output."""
    q, k, v, mask = make_inputs(seed=11)
    want = einsum_reference(q, k, v, mask, boundary=jnp.asarray((5, 7)),
                            w0=jnp.asarray([0.3]), w1=jnp.asarray([0.7]),
                            row_start=1)
    got = flash_attention(q, k, v, mask, H, boundary=jnp.asarray((5, 7)),
                          w0=jnp.asarray([0.3]), w1=jnp.asarray([0.7]),
                          row_start=1, deterministic=True,
                          compute_dtype=jnp.float32, interpret=True,
                          block_q=blocks[0], block_k=blocks[1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("blocks", [(16, 16), (8, 6)])
def test_grads_match_einsum(blocks):
    """dq/dk/dv and the adaptive-scalar grads dw0/dw1 match autodiff of
    the einsum path, including across ragged tile boundaries."""
    q, k, v, mask = make_inputs(seed=3)
    boundary = jnp.asarray([5, 7])

    def loss_ref(q, k, v, w0, w1):
        out = einsum_reference(q, k, v, mask, boundary=boundary, w0=w0,
                               w1=w1, row_start=1, text_len=10)
        return jnp.sum(out * jnp.cos(out))

    def loss_flash(q, k, v, w0, w1):
        out = flash_attention(q, k, v, mask, H, boundary=boundary, w0=w0,
                              w1=w1, row_start=1, text_len=10,
                              deterministic=True,
                              compute_dtype=jnp.float32, interpret=True,
                              block_q=blocks[0], block_k=blocks[1])
        return jnp.sum(out * jnp.cos(out))

    w0, w1 = jnp.asarray([0.3]), jnp.asarray([0.7])
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, w0, w1)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, w0, w1)
    for a, b, name in zip(g_ref, g_flash, "q k v w0 w1".split()):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5,
                                   err_msg=name)


def test_cross_length_kv():
    """Lq != Lk (the UniMo vision tower attending [text ; vision]),
    with K blocked more finely than Q."""
    q, _, _, _ = make_inputs(lq=9, lk=9)
    _, k, v, mask = make_inputs(lq=20, lk=20, seed=5)
    want = einsum_reference(q, k, v, mask)
    got = flash_attention(q, k, v, mask, H, deterministic=True,
                          compute_dtype=jnp.float32, interpret=True,
                          block_q=16, block_k=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bf16_forward_tolerance():
    """bf16 compute path vs the f32 einsum reference on identical
    (bf16-rounded) inputs — backs the 2e-2 claim in the module docstring
    (the flash path casts unnormalized exp-weights and divides in fp32)."""
    q, k, v, mask = make_inputs(seed=21)
    qb = q.astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)
    vb = v.astype(jnp.bfloat16)
    want = einsum_reference(qb.astype(jnp.float32), kb.astype(jnp.float32),
                            vb.astype(jnp.float32), mask,
                            boundary=jnp.asarray((5, 7)),
                            w0=jnp.asarray([0.3]), w1=jnp.asarray([0.7]))
    got = flash_attention(qb, kb, vb, mask, H, boundary=jnp.asarray((5, 7)),
                          w0=jnp.asarray([0.3]), w1=jnp.asarray([0.7]),
                          deterministic=True, compute_dtype=jnp.bfloat16,
                          interpret=True, block_q=8, block_k=8)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=2e-2)


def test_dropout_fwd_bwd_mask_consistency():
    """With dropout active, the custom VJP must regenerate the exact keep
    mask the forward drew (per (batch, head, q-tile, k-tile) seed). Checked
    by central finite differences through the kernel itself — any fwd/bwd
    mask mismatch shows up as a gradient error far above round-off.
    Uses the interpret-mode hash PRNG (CPU); the TPU PRNG path shares all
    seed-derivation code."""
    q, k, v, mask = make_inputs(seed=13)
    boundary = jnp.asarray([5, 7])
    w0, w1 = jnp.asarray([0.3]), jnp.asarray([0.7])
    seed = jnp.asarray(1234, jnp.int32)

    def loss(q, w0):
        out = flash_attention(q, k, v, mask, H, boundary=boundary, w0=w0,
                              w1=w1, row_start=1, text_len=10,
                              dropout_rate=0.25, deterministic=False,
                              dropout_seed=seed, compute_dtype=jnp.float32,
                              interpret=True, block_q=8, block_k=8)
        return jnp.sum(out * jnp.cos(out))

    # determinism: same seed -> identical output
    l1, l2 = loss(q, w0), loss(q, w0)
    np.testing.assert_allclose(float(l1), float(l2), rtol=0)

    gq, gw0 = jax.grad(loss, argnums=(0, 1))(q, w0)
    eps = 1e-3
    # spot-check a few q coordinates
    for idx in [(0, 2, 5), (1, 7, 11), (0, 11, 20)]:
        dq = np.zeros(q.shape, np.float32)
        dq[idx] = eps
        num = (float(loss(q + dq, w0)) - float(loss(q - dq, w0))) / (2 * eps)
        np.testing.assert_allclose(float(gq[idx]), num, rtol=2e-2, atol=2e-4)
    num_w0 = (float(loss(q, w0 + eps)) - float(loss(q, w0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(gw0[0]), num_w0, rtol=2e-2, atol=2e-4)


def test_dropout_keep_fraction_and_scaling():
    """Dropout zeroes ~rate of the context contributions and rescales the
    rest by 1/(1-rate): with v = ones, every output coordinate is the sum
    of surviving normalized probs * inv, so the mean over many draws is ~1."""
    rng = np.random.default_rng(0)
    b, l, hd = 4, 16, H * 8
    q = jnp.asarray(rng.standard_normal((b, l, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, hd)), jnp.float32)
    v = jnp.ones((b, l, hd), jnp.float32)
    mask = jnp.ones((b, l), jnp.float32)
    outs = []
    for s in range(8):
        outs.append(np.asarray(flash_attention(
            q, k, v, mask, H, dropout_rate=0.3, deterministic=False,
            dropout_seed=jnp.asarray(s, jnp.int32),
            compute_dtype=jnp.float32, interpret=True,
            block_q=8, block_k=8)))
    mean = np.mean(outs)
    assert abs(mean - 1.0) < 0.05, mean
    # and the draws actually differ between seeds
    assert np.abs(outs[0] - outs[1]).max() > 1e-3


def test_attention_core_flash_backend_equivalence():
    """AttentionCore produces the same output with the flash backend
    (interpret) as with the einsum path."""
    from mkg_analogy_tpu.models import common
    from mkg_analogy_tpu.ops.masks import attention_bias as ab

    B, L = 2, 12
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, L, H * 8)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[:, 10:] = 0
    bias = ab(jnp.asarray(mask))
    core = common.AttentionCore(num_heads=H, head_dim=8, dtype=jnp.float32)
    analogy = (jnp.asarray([4, 6]), jnp.asarray([0.25]), jnp.asarray([0.6]),
               0, None, 0)
    params = core.init(jax.random.PRNGKey(0), x, attention_bias=bias,
                       analogy=analogy)
    try:
        common.set_fused_attention(False)
        want, _ = core.apply(params, x, attention_bias=bias, analogy=analogy)
        common.set_fused_attention(True, interpret=True, backend="flash")
        got, _ = core.apply(params, x, attention_bias=bias, analogy=analogy)
    finally:
        common.set_fused_attention(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_matches_single_block_kernel():
    """flash_attention agrees with kernels.attention.fused_attention on
    the same inputs (both deterministic, fp32)."""
    from mkg_analogy_tpu.kernels.attention import fused_attention

    q, k, v, mask = make_inputs(seed=9)
    kwargs = dict(boundary=jnp.asarray((4, 6)), w0=jnp.asarray([0.25]),
                  w1=jnp.asarray([0.6]), row_start=1, text_len=8)
    a = fused_attention(q, k, v, mask, H, deterministic=True,
                        compute_dtype=jnp.float32, interpret=True, **kwargs)
    b = flash_attention(q, k, v, mask, H, deterministic=True,
                        compute_dtype=jnp.float32, interpret=True,
                        block_q=6, block_k=6, **kwargs)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
