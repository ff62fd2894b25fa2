"""Pallas fused attention (kernels/attention.py) vs the einsum reference
path: forward and gradient equivalence in interpret mode (CPU), across the
mask geometries the models use. The kernel convention is the packed
(B, L, heads*d) layout of the projection GEMMs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mkg_analogy_tpu.kernels.attention import fused_attention
from mkg_analogy_tpu.ops.masks import analogy_score_multiplier, attention_bias

H, D = 3, 8  # heads, head_dim used throughout


def unpack(x):
    """(B, L, H*D) -> (B, H, L, D)"""
    b, l, _ = x.shape
    return x.reshape(b, l, H, D).transpose(0, 2, 1, 3)


def einsum_reference(q, k, v, mask, boundary=None, w0=None, w1=None,
                     row_start=0, text_len=None, offset=0):
    """The AttentionCore einsum path, standalone, on packed inputs."""
    q, k, v = unpack(q), unpack(k), unpack(v)
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if boundary is not None:
        mult = analogy_score_multiplier(
            boundary, q.shape[2], w0, w1, text_len=text_len,
            row_start=row_start, compat_img_offset=offset if offset else None,
        )
        scores = scores * mult.astype(scores.dtype)
    scores = scores + attention_bias(mask).astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    b, h, l, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def make_inputs(b=2, lq=12, lk=12, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, lq, H * D)), dtype)
    k = jnp.asarray(rng.standard_normal((b, lk, H * D)), dtype)
    v = jnp.asarray(rng.standard_normal((b, lk, H * D)), dtype)
    mask = np.ones((b, lk), np.float32)
    mask[:, lk - 2:] = 0.0
    return q, k, v, jnp.asarray(mask)


CASES = [
    # (boundary, row_start, text_len, offset)
    dict(),                                             # padding mask only
    dict(boundary=(5, 7), row_start=0),                 # unimo geometry
    dict(boundary=(5, 7), row_start=1),                 # vilbert/flava
    dict(boundary=(4, 6), row_start=1, text_len=8),     # single-stream fix
    dict(boundary=(3, 5), row_start=5, offset=4),       # compat img offset
]


@pytest.mark.parametrize("case", CASES)
def test_forward_matches_einsum(case):
    q, k, v, mask = make_inputs()
    kwargs = dict(case)
    if "boundary" in kwargs:
        kwargs["boundary"] = jnp.asarray(kwargs["boundary"])
        kwargs["w0"] = jnp.asarray([0.3])
        kwargs["w1"] = jnp.asarray([0.7])
    want = einsum_reference(q, k, v, mask, **kwargs)
    got = fused_attention(q, k, v, mask, H, deterministic=True,
                          compute_dtype=jnp.float32, interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_grads_match_einsum():
    """dq/dk/dv and the adaptive-scalar grads dw0/dw1 match autodiff of the
    einsum path (including the softmax backward and multiplier chain)."""
    q, k, v, mask = make_inputs(seed=3)
    boundary = jnp.asarray([5, 7])

    def loss_ref(q, k, v, w0, w1):
        out = einsum_reference(q, k, v, mask, boundary=boundary, w0=w0,
                               w1=w1, row_start=1, text_len=10)
        return jnp.sum(out * jnp.cos(out))

    def loss_fused(q, k, v, w0, w1):
        out = fused_attention(q, k, v, mask, H, boundary=boundary, w0=w0,
                              w1=w1, row_start=1, text_len=10,
                              deterministic=True,
                              compute_dtype=jnp.float32, interpret=True)
        return jnp.sum(out * jnp.cos(out))

    w0, w1 = jnp.asarray([0.3]), jnp.asarray([0.7])
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, w0, w1)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, w0, w1)
    for a, b, name in zip(g_ref, g_fused, "q k v w0 w1".split()):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5,
                                   err_msg=name)


def test_cross_length_kv():
    """Lq != Lk (the UniMo vision tower attending [text ; vision])."""
    q, _, _, _ = make_inputs(lq=9, lk=9)
    _, k, v, mask = make_inputs(lq=20, lk=20, seed=5)
    want = einsum_reference(q, k, v, mask)
    got = fused_attention(q, k, v, mask, H, deterministic=True,
                          compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_attention_core_fused_flag_equivalence():
    """The full AttentionCore module produces the same output with the
    fused kernel (interpret) as with the einsum path."""
    from mkg_analogy_tpu.models import common
    from mkg_analogy_tpu.ops.masks import attention_bias as ab

    B, L = 2, 12
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, L, H * D)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[:, 10:] = 0
    bias = ab(jnp.asarray(mask))
    core = common.AttentionCore(num_heads=H, head_dim=D, dtype=jnp.float32)
    analogy = (jnp.asarray([4, 6]), jnp.asarray([0.25]), jnp.asarray([0.6]),
               0, None, 0)
    params = core.init(jax.random.PRNGKey(0), x, attention_bias=bias,
                       analogy=analogy)
    try:
        common.set_fused_attention(False)
        want, _ = core.apply(params, x, attention_bias=bias, analogy=analogy)
        common.set_fused_attention(True, interpret=True)
        got, _ = core.apply(params, x, attention_bias=bias, analogy=analogy)
    finally:
        common.set_fused_attention(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_attention_core_flash_autoroute_long_seq():
    """Sequences >= FLASH_AUTO_MIN_LEN route to the flash kernel WITHOUT
    any set_fused_attention call (measured winner from L=512 on v5e-1,
    RESULTS.md), and the output matches the einsum path. The threshold is
    lowered for test speed (interpret-mode kernels are slow); the routing
    logic `l >= FLASH_AUTO_MIN_LEN` is what's under test."""
    from mkg_analogy_tpu.models import common
    from mkg_analogy_tpu.ops.masks import attention_bias as ab

    B, L = 2, 16
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((B, L, H * D)), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[:, 14:] = 0
    bias = ab(jnp.asarray(mask))
    core = common.AttentionCore(num_heads=H, head_dim=D, dtype=jnp.float32)
    analogy = (jnp.asarray([5, 7]), jnp.asarray([0.25]), jnp.asarray([0.6]),
               0, None, 0)
    params = core.init(jax.random.PRNGKey(0), x, attention_bias=bias,
                       analogy=analogy)
    want, _ = core.apply(params, x, attention_bias=bias, analogy=analogy)
    saved = common.FLASH_AUTO_MIN_LEN
    calls = []
    from mkg_analogy_tpu.kernels import flash_attention as fa
    orig = fa.flash_attention

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    try:
        common.FLASH_AUTO_MIN_LEN = L
        fa.flash_attention = spy
        got, _ = core.apply(params, x, attention_bias=bias, analogy=analogy)
    finally:
        common.FLASH_AUTO_MIN_LEN = saved
        fa.flash_attention = orig
    assert calls, "flash kernel was not auto-routed at L >= threshold"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
