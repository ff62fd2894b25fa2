"""QK_BF16_GRAD (models/common.py): exact forward, bf16-cast backward.

The variant must leave the forward bit-identical (it only overrides the
VJP) and keep gradients within bf16 round-off of the default f32-cotangent
backward — the claim the round-5 perf session prices on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mkg_analogy_tpu.models import common
from mkg_analogy_tpu.models.common import AttentionCore


def _run(flag: bool, dtype):
    old = common.QK_BF16_GRAD
    common.set_qk_bf16_grad(flag)
    try:
        mod = AttentionCore(num_heads=4, head_dim=8, dtype=dtype,
                            dropout_rate=0.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32)).astype(dtype)
        params = mod.init(jax.random.PRNGKey(1), x)

        def loss(p, x):
            out, _ = mod.apply(p, x, deterministic=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        val, grads = jax.value_and_grad(loss)(params, x)
        return np.asarray(val), jax.tree_util.tree_map(np.asarray, grads)
    finally:
        common.set_qk_bf16_grad(old)


def test_forward_bit_identical_bf16():
    v0, _ = _run(False, jnp.bfloat16)
    v1, _ = _run(True, jnp.bfloat16)
    assert v0 == v1  # forward path is untouched by the custom VJP


def test_gradients_no_farther_from_fp32_truth():
    """The yardstick is distance to exact fp32 math, not distance to the
    default bf16 path: bf16 compute already reshuffles round-off, so
    per-leaf closeness to the default is the wrong test (cancellation-heavy
    bias leaves differ by ~their own magnitude between ANY two rounding
    schedules). What must hold is that casting the score cotangent does
    not move the gradient away from the true gradient. Measured here:
    default bf16 is ~0.69% from fp32 in relative L2; flag-on is ~0.69%
    too (the flag-on-vs-default delta, 0.21%, is 3x smaller than the
    error the pipeline already carries)."""
    _, g32 = _run(False, jnp.float32)
    _, g0 = _run(False, jnp.bfloat16)
    _, g1 = _run(True, jnp.bfloat16)

    def dist2(ga, gb):
        return sum(
            float(((a.astype(np.float32) - b.astype(np.float32)) ** 2).sum())
            for a, b in zip(jax.tree_util.tree_leaves(ga),
                            jax.tree_util.tree_leaves(gb))
        )

    d_default = dist2(g0, g32) ** 0.5
    d_flag = dist2(g1, g32) ** 0.5
    norm = dist2(g32, jax.tree_util.tree_map(np.zeros_like, g32)) ** 0.5
    assert d_default / norm < 0.02  # sanity: bf16 pipeline baseline
    assert d_flag <= 1.15 * d_default, (d_flag, d_default)


def test_fp32_ignores_flag():
    # fp32 compute (torch-parity dtype) must never take the cast path
    v0, g0 = _run(False, jnp.float32)
    v1, g1 = _run(True, jnp.float32)
    assert v0 == v1
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        assert np.array_equal(a, b)
