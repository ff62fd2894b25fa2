"""Shared Flax building blocks for the vision-language model family."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


# The reference's "gelu" is torch.nn.functional.gelu = exact erf
# (modeling_unimo.py ACT2FN via HF transformers). fp32 compute (the
# torch-parity dtype) ALWAYS uses exact erf. Under bf16 the history:
# round 3 shipped the tanh approximation as the bf16
# default (+12% step throughput; max deviation 4.8e-4, sub-bf16-ULP) on a
# metric-neutrality claim whose validation arm never ran — round 4 ran it:
# same-seed scratch-15 on MARS lands at test Hits@1 0.2203 (tanh) vs
# 0.2849 (erf, exactly reproducing the round-3 erf control), a 6-point
# regression far outside seed noise (RESULTS.md round-4 "tanh-GELU
# retraction"). Sub-ULP forward deviation is NOT sufficient for metric
# neutrality: the gradient deviates up to 8.7e-4 and the training
# trajectory diverges chaotically. tanh remains opt-in for throughput
# experiments via set_gelu_impl("tanh") / --gelu_impl tanh, quality caveat
# documented at the flag.
#
# "poly" — the bf16 default since round 4 — is a 200x-tighter replacement
# than tanh ever was: a degree-14 Chebyshev minimax fit evaluated by
# Clenshaw in fp32 (gelu_poly below), forward within 2.1e-6 of erf
# everywhere (>99.5% of bf16-resolvable outputs bit-identical) and, via
# the custom-JVP fitted derivative series, gradient within 4.3e-6 of
# erf-gelu's over the whole real line (tanh: 8.7e-4). Unlike the tanh
# episode it passed the gate the retraction demanded BEFORE becoming the
# default: measured +6.8% step throughput at the recipe point (820/827
# vs 768/775 ex/s) AND end-to-end same-seed quality arms statistically
# indistinguishable from erf (RESULTS.md "gelu_poly end-to-end quality
# A/B"). fp32 compute always uses exact erf (torch-parity dtype);
# --gelu_impl erf restores exact erf under bf16 too. Provenance +
# validation gates: tools/fit_gelu_poly.py.
GELU_IMPL = "poly"  # "erf" | "tanh" | "poly" (non-fp32 inputs only)


def set_gelu_exact(exact: bool) -> None:
    """Back-compat shim: exact=True -> erf, False -> tanh."""
    set_gelu_impl("erf" if exact else "tanh")


def set_gelu_impl(impl: str) -> None:
    global GELU_IMPL
    if impl not in ("erf", "tanh", "poly"):
        raise ValueError(f"unknown gelu impl {impl!r}")
    GELU_IMPL = impl


# QK^T backward dtype experiment (round 5). The forward QK^T einsum keeps
# f32 scores (exact — softmax needs them), but its autodiff backward then
# runs dq/dk as f32-cotangent x bf16-operand GEMMs, which the MXU executes
# as slow multi-pass fp32 matmuls (~1.1 ms/step of `conv f32[B,12,L,64]`
# in the poly-base attr_trace). The gradient signal arriving at the scores
# is ALREADY bf16-grained: dprobs comes out of the bf16 probs@V backward,
# so keeping the softmax-jacobian product in f32 adds at most one rounding
# step of information. With QK_BF16_GRAD the score cotangent is cast to
# the compute dtype before the dq/dk GEMMs (exact forward, bf16 MXU
# backward). Default OFF: per the tanh-gelu retraction lesson, any
# gradient-side approximation ships only after an end-to-end quality A/B
# (RESULTS.md round-5 perf session).
QK_BF16_GRAD = False


def set_qk_bf16_grad(enabled: bool) -> None:
    global QK_BF16_GRAD
    QK_BF16_GRAD = bool(enabled)


@jax.custom_vjp
def _qk_scores_bf16grad(q, k):
    """bf16 QK^T with f32 scores whose VJP casts the cotangent to the
    input dtype (see QK_BF16_GRAD above)."""
    return jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32)


def _qk_scores_fwd(q, k):
    return _qk_scores_bf16grad(q, k), (q, k)


def _qk_scores_bwd(res, g):
    q, k = res
    gc = g.astype(q.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", gc, k)
    dk = jnp.einsum("bhqk,bqhd->bkhd", gc, q)
    return dq.astype(q.dtype), dk.astype(k.dtype)


_qk_scores_bf16grad.defvjp(_qk_scores_fwd, _qk_scores_bwd)


# Chebyshev coefficients of q in s = clip(x^2/18 - 1, -1, 1), fitted so
# that clip(x*q(s), -1, 1) is a minimax approximation of erf(x/sqrt(2))
# (max product error 4.2e-7 in fp64, 2.2e-6 evaluated in fp32). Fit,
# rationale, and the PASS/FAIL validation gates: tools/fit_gelu_poly.py.
_GELU_POLY_CHEB = (
    0.33028964434727737,
    -0.24219334583714663,
    0.11777000939518502,
    -0.0582491905022037,
    0.027863442342632622,
    -0.012659164253535369,
    0.00542071972438396,
    -0.002180891087797214,
    0.0008237438783073934,
    -0.00029222435125419576,
    9.74498053259353e-05,
    -3.0554179772880074e-05,
    8.974542569486454e-06,
    -2.4208471486769374e-06,
    5.430217595261719e-07,
)


# Chebyshev coefficients of r in the same s, fitted so that
# 0.5 + clip(x, -6, 6) * r(s) is a minimax approximation of gelu'(x) =
# 0.5*(1+erf(x/sqrt2)) + x*phi(x): max deviation 4.3e-6 over the WHOLE
# real line (fp32 eval) — the custom-JVP below uses it instead of
# autodiff through the Clenshaw chain, which (a) tripled the backward's
# elementwise cost (measured: 720.7 vs 768-775 ex/s base) and (b) had a
# 1.2e-4 subgradient blip at the |x|=6 clamp corner. Same fit machinery:
# tools/fit_gelu_poly.py. (gelu' - 0.5 is odd and entire in x^2, so the
# structural x*r(x^2) trick applies; the x-clamp freezes the saturated
# tails at d(+-6), within 4e-8 of the true 1/0.)
_GELU_POLY_DERIV_CHEB = (
    0.21898524531263905,
    -0.22260624861509148,
    0.14400788421381755,
    -0.0928012135086846,
    0.056602672027503374,
    -0.03207533320570575,
    0.016773504258689072,
    -0.008083637805368912,
    0.0035947343345571346,
    -0.0014786162490729624,
    0.0005640296608659698,
    -0.00019982686276727213,
    6.555459678467149e-05,
    -1.9516758768489917e-05,
    4.780831823745028e-06,
)


def _clenshaw_f32(s: jnp.ndarray, coeffs) -> jnp.ndarray:
    two_s = s + s
    b1 = jnp.zeros_like(s)
    b2 = jnp.zeros_like(s)
    for ci in coeffs[:0:-1]:
        b1, b2 = two_s * b1 - b2 + jnp.float32(ci), b1
    return s * b1 - b2 + jnp.float32(coeffs[0])


@jax.custom_jvp
def gelu_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-gelu via structural polynomial: x/2*(1+clip(x*q(x^2), -1, 1)).

    q is a degree-14 Chebyshev series in s = x^2/18 - 1 evaluated by
    Clenshaw in fp32 (all intermediates O(1), so fp32 round-off stays
    ~1e-7 — the monomial/Horner form needs +-5000-scale coefficients and
    loses 6e-4). The s-clamp freezes q outside |x|=6 where the t-clip
    already saturates t to sign(x); erf(6/sqrt2) differs from 1 by 2e-9,
    below fp32 eps, so the saturated tails match the fp32 erf path
    bit-exactly. ~16 VPU FMAs vs XLA's erf expansion (~4.4 ms/step at the
    recipe point, RESULTS.md MFU ledger). The gradient is its own fitted
    series (custom JVP below), exact to 4.3e-6 everywhere.
    """
    xf = x.astype(jnp.float32)
    one = jnp.float32(1.0)
    s = jnp.clip(xf * xf * jnp.float32(1.0 / 18.0) - one, -one, one)
    q = _clenshaw_f32(s, _GELU_POLY_CHEB)
    t = jnp.clip(xf * q, -one, one)
    return (jnp.float32(0.5) * xf * (one + t)).astype(x.dtype)


@gelu_poly.defjvp
def _gelu_poly_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    xf = x.astype(jnp.float32)
    one = jnp.float32(1.0)
    s = jnp.clip(xf * xf * jnp.float32(1.0 / 18.0) - one, -one, one)
    xc = jnp.clip(xf, jnp.float32(-6.0), jnp.float32(6.0))
    d = jnp.float32(0.5) + xc * _clenshaw_f32(s, _GELU_POLY_DERIV_CHEB)
    return gelu_poly(x), (d * dx.astype(jnp.float32)).astype(x.dtype)


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    if GELU_IMPL == "erf" or x.dtype == jnp.float32:
        return nn.gelu(x, approximate=False)
    if GELU_IMPL == "poly":
        return gelu_poly(x)
    return nn.gelu(x, approximate=True)


ACT2FN: dict = {
    "gelu": _gelu,
    "relu": nn.relu,
    "quick_gelu": quick_gelu,
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
}


def get_activation(name: str) -> Callable:
    return ACT2FN[name]


# Attention lowering: False -> XLA einsum path (reference-identical math);
# True -> the Pallas fused kernel (kernels/attention.py) which folds the
# score multiplier + padding bias + softmax + dropout + V contraction into
# one kernel operating on the packed (B, L, heads*d) projection layout.
# Toggled by --fused_attention in the CLI and measured by tools/bench_opts;
# the default recorded here is what bench.py uses. CPU tests exercise the
# kernel via interpret mode in tests/test_fused_attention.py.
USE_FUSED_ATTENTION = False
FUSED_INTERPRET = False  # interpret-mode kernel (CPU testing)
# "single" -> kernels/attention.py (whole-row score plane in VMEM, fastest
# at short L but VMEM-bound past L~512); "flash" -> kernels/flash_attention.py
# (online-softmax over K tiles, scales to arbitrary L).
FUSED_BACKEND = "single"
# Sequences at or above this length auto-route to the flash kernel even
# without --fused_attention: measured on v5e-1 it beats the XLA einsum path
# from L=512 (2.1x at 512 with dropout, 1.9x at 1024, only survivor at
# 2048 — RESULTS.md); the recipe point L=128 stays on XLA, which wins
# there. Set to a large value to disable.
FLASH_AUTO_MIN_LEN = 512

# Bench-only experiment: project Q/K/V with one (H, 3*inner) GEMM instead
# of three (H, inner) GEMMs. Changes the param tree ("qkv" replaces
# query/key/value) so it is NOT checkpoint/converter compatible — toggled
# by tools/bench_opts.py to measure the MXU-dispatch saving before any
# productization.
USE_FUSED_QKV = False


def set_fused_attention(enabled: bool, interpret: Optional[bool] = None,
                        backend: str = "single") -> None:
    """``interpret=None`` auto-detects: Pallas has no CPU lowering, so on
    the CPU backend (tests, offline runs) the kernels run interpreted;
    anything else (TPU, incl. the "axon" tunnel platform) compiles."""
    global USE_FUSED_ATTENTION, FUSED_INTERPRET, FUSED_BACKEND
    assert backend in ("single", "flash"), backend
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    USE_FUSED_ATTENTION = enabled
    FUSED_INTERPRET = interpret
    FUSED_BACKEND = backend


class AttentionCore(nn.Module):
    """Q/K/V projection + scaled dot-product attention on (B, L, H) inputs.

    TPU notes: head layout (B, heads, L, D); softmax in fp32; optional
    adaptive analogy score geometry (``analogy``) and optional extra
    key/value states *prepended* to the keys (UniMo passes text K/V into the
    vision tower that way, modeling_unimo.py:227-229).

    ``analogy``: None or (boundary (B,), w0 (1,), w1 (1,), row_start,
    text_len, offset) — the adaptive-mask geometry of ops/masks.py. The
    einsum path materializes the multiplier tensor; the fused path builds
    it inline in VMEM.
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    dropout_rate: float = 0.0
    out_bias: bool = True

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        analogy: Optional[tuple] = None,
        extra_kv: Optional[tuple] = None,
        extra_kv_bias: Optional[jnp.ndarray] = None,
        output_kv: bool = False,
        output_context: bool = False,
        deterministic: bool = True,
    ):
        b, l, _ = hidden_states.shape
        inner = self.num_heads * self.head_dim

        def proj(name):
            return nn.Dense(inner, dtype=self.dtype, name=name)(hidden_states)

        # Heads stay in (B, L, heads, head_dim): the einsums below carry the
        # head dimension through dot_general batch dims, so no (B,h,L,d)
        # transpose is ever materialized (the explicit transpose showed up
        # as a 6.3 MB layout copy per projection per layer in the step HLO).
        def split_heads(x):
            return x.reshape(b, l, self.num_heads, self.head_dim)

        if USE_FUSED_QKV:
            qkv = nn.Dense(3 * inner, dtype=self.dtype, name="qkv")(
                hidden_states
            )
            q, k, v = (split_heads(x) for x in jnp.split(qkv, 3, axis=-1))
        else:
            q = split_heads(proj("query"))
            k = split_heads(proj("key"))
            v = split_heads(proj("value"))
        kv_out = (k, v) if output_kv else None

        if extra_kv is not None:
            n_extra = extra_kv[0].shape[1]
            k = jnp.concatenate([extra_kv[0].astype(k.dtype), k], axis=1)
            v = jnp.concatenate([extra_kv[1].astype(v.dtype), v], axis=1)
            if extra_kv_bias is not None:
                # Mask padded text keys when they feed another tower's
                # attention. (The reference leaves PAD embeddings attendable,
                # making outputs depend on per-batch pad length —
                # modeling_unimo.py:481-527 has no mask on the vision side.
                # Masking is the static-shape-correct behavior.)
                zeros = jnp.zeros(
                    extra_kv_bias.shape[:-1] + (l,), extra_kv_bias.dtype
                )
                assert attention_bias is None
                attention_bias = jnp.concatenate([extra_kv_bias, zeros], axis=-1)

        if USE_FUSED_ATTENTION or l >= FLASH_AUTO_MIN_LEN:
            # Long sequences auto-route to the K-blocked flash kernel: it
            # beats the XLA einsums from L=512 up and is the only path
            # standing at L>=2048 (measured fwd+bwd on v5e-1 — RESULTS.md
            # "Long-sequence headroom"); the recipe point L=128 stays on
            # the XLA path, which wins there.
            ctx = self._fused(q, k, v, attention_bias, analogy, deterministic,
                              force_flash=not USE_FUSED_ATTENTION)
        else:
            ctx = self._einsum(q, k, v, attention_bias, analogy, deterministic)
        ctx = ctx.reshape(b, l, inner)
        out = nn.Dense(inner, dtype=self.dtype, use_bias=self.out_bias, name="out")(ctx)
        if output_context:
            # raw pre-out-projection context (UniMo's BertFusion consumes
            # this, modeling_unimo.py:367-373)
            return out, kv_out, ctx
        return out, kv_out

    def _einsum(self, q, k, v, attention_bias, analogy, deterministic):
        """XLA attention with flash-style rematerialization.

        The scores -> multiplier -> softmax -> dropout -> @V region is
        wrapped in ``jax.checkpoint(policy=nothing_saveable)``: the backward
        pass recomputes probabilities and dropout masks from (q, k, v, bias,
        key) instead of stashing them. Without this, XLA saves the softmax
        probs (B,h,L,L bf16) AND the raw dropout RNG bits (B,h,L,L u32,
        behind a layout copy) per layer — ~38 MB/text-layer of HBM write +
        read traffic on the flagship step, measured at ~13% of step time
        (tools/attr_trace.py). The recompute is one extra QK^T matmul +
        softmax + rbg draw per layer in the backward (<2% of step FLOPs).
        """
        rate = float(self.dropout_rate)
        use_dropout = rate > 0.0 and not deterministic
        key = self.make_rng("dropout") if use_dropout else None
        row_start = text_len = offset = None
        lq = q.shape[1]
        if analogy is not None:
            boundary, w0, w1, row_start, text_len, offset = analogy
            analogy_arrs = (boundary, w0, w1)
        else:
            analogy_arrs = None

        def core(q, k, v, attention_bias, analogy_arrs, key):
            scale = jnp.asarray(self.head_dim, jnp.float32) ** -0.5
            if QK_BF16_GRAD and q.dtype != jnp.float32:
                scores = _qk_scores_bf16grad(q, k) * scale
            else:
                scores = jnp.einsum(
                    "bqhd,bkhd->bhqk", q, k,
                    preferred_element_type=jnp.float32,
                ) * scale
            if analogy_arrs is not None:
                from ..ops.masks import analogy_score_multiplier

                boundary, w0, w1 = analogy_arrs
                mult = analogy_score_multiplier(
                    boundary, lq, w0, w1, text_len=text_len,
                    row_start=row_start,
                    compat_img_offset=offset if offset else None,
                )
                scores = scores * mult.astype(scores.dtype)
            if attention_bias is not None:
                scores = scores + attention_bias.astype(scores.dtype)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            if use_dropout:
                # Draw the keep-mask with q/k swapped, then view-transpose:
                # iid bits are layout-free, and the swapped draw's default
                # layout matches what the probs fusion wants — the straight
                # draw cost a 25 MB u32 layout copy per generation in the
                # step HLO (fwd + bwd recompute).
                b_, h_, lq_, lk_ = probs.shape
                keep = jax.random.bernoulli(
                    key, 1.0 - rate, (b_, h_, lk_, lq_)
                ).swapaxes(-1, -2)
                probs = jnp.where(
                    keep, probs / (1.0 - rate), jnp.zeros_like(probs)
                )
            return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

        core = jax.checkpoint(
            core, policy=jax.checkpoint_policies.nothing_saveable
        )
        return core(q, k, v, attention_bias, analogy_arrs, key)

    def _fused(self, q, k, v, attention_bias, analogy, deterministic,
               force_flash=False):
        if force_flash or FUSED_BACKEND == "flash":
            from ..kernels.flash_attention import flash_attention as kernel
        else:
            from ..kernels.attention import fused_attention as kernel

        # kernel convention is the packed (B, L, heads*d) layout — exactly
        # what the projection GEMMs produce, so no transpose/relayout is
        # ever materialized (the einsum path costs ~466 MB/step of layout
        # copies at B=32; this path costs zero).
        b, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]
        inner = self.num_heads * self.head_dim
        q = q.reshape(b, lq, inner)
        k = k.reshape(b, lk, inner)
        v = v.reshape(b, lk, inner)
        if attention_bias is None:
            mask = jnp.ones((b, lk), jnp.float32)
        else:
            # bias is 0 / -10000 of shape (B, 1, 1, Lk) everywhere in this
            # codebase (ops/masks.attention_bias + the extra_kv concat)
            mask = (attention_bias[:, 0, 0, :] > -1.0).astype(jnp.float32)
        kwargs = dict()
        if analogy is not None:
            boundary, w0, w1, row_start, text_len, offset = analogy
            if offset:
                # compat geometry: boundary shifts, rows start at
                # img_length+1, columns run to the sequence end
                # (ops/masks.py compat_img_offset)
                kwargs = dict(boundary=boundary, w0=jnp.clip(w0, 0.0, 0.5),
                              w1=jnp.clip(w1, 0.5, 1.0), row_start=offset + 1,
                              text_len=lk, offset=offset)
            else:
                kwargs = dict(
                    boundary=boundary, w0=jnp.clip(w0, 0.0, 0.5),
                    w1=jnp.clip(w1, 0.5, 1.0), row_start=row_start,
                    text_len=lq if text_len is None else text_len,
                    offset=0,
                )
        rate = float(self.dropout_rate)
        seed = None
        if rate > 0.0 and not deterministic:
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max
            )
        ctx = kernel(
            q, k, v, mask, self.num_heads,
            dropout_rate=rate, deterministic=deterministic,
            dropout_seed=seed, compute_dtype=self.dtype,
            # the auto-routed long-L path reaches here without any
            # set_fused_attention call, so detect the CPU backend (no
            # Pallas lowering) at the call site too
            interpret=FUSED_INTERPRET or jax.default_backend() == "cpu",
            **kwargs,
        )
        return ctx.reshape(b, lq, self.num_heads, self.head_dim)


def gather_positions(seq: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """seq (B, L, H), positions (B, P) -> (B, P, H) via take_along_axis."""
    return jnp.take_along_axis(seq, positions[:, :, None], axis=1)


class MLMTransform(nn.Module):
    """BertPredictionHeadTransform: dense + act + LayerNorm
    (modeling_unimo.py:962-976)."""

    hidden_size: int
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="dense")(x)
        x = get_activation(self.hidden_act)(x)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="ln")(x)


def adaptive_weights(module: nn.Module):
    """Declare the per-layer adaptive analogy-mask scalars
    (w0 ~ U(0, 0.5), w1 = 0.5 — modeling_unimo.py:305-310)."""
    w0 = module.param(
        "adaptive_w0",
        lambda key, shape: jax.random.uniform(key, shape, jnp.float32, 0.0, 0.5),
        (1,),
    )
    w1 = module.param("adaptive_w1", nn.initializers.constant(0.5), (1,))
    return w0, w1


class EncoderLayer(nn.Module):
    """Generic transformer layer: post-LN (BERT) or pre-LN (ViT) residual
    wiring, optional adaptive analogy score multiplier."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32
    pre_norm: bool = False
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, attn_bias=None, analogy=None,
                 deterministic=True):
        head_dim = self.hidden_size // self.num_heads
        attn = AttentionCore(
            num_heads=self.num_heads, head_dim=head_dim, dtype=self.dtype,
            dropout_rate=self.attention_dropout, name="attn",
        )
        ln1 = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                           name="ln1")
        ln2 = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                           name="ln2")
        fc1 = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")
        drop = nn.Dropout(self.hidden_dropout)
        act = get_activation(self.hidden_act)

        if self.pre_norm:
            h, _ = attn(ln1(x), attention_bias=attn_bias, analogy=analogy,
                        deterministic=deterministic)
            x = x + drop(h, deterministic=deterministic)
            h = fc2(act(fc1(ln2(x))))
            return x + drop(h, deterministic=deterministic)
        h, _ = attn(x, attention_bias=attn_bias, analogy=analogy,
                    deterministic=deterministic)
        x = ln1(x + drop(h, deterministic=deterministic))
        h = fc2(act(fc1(x)))
        return ln2(x + drop(h, deterministic=deterministic))


class AnalogyEncoderLayer(nn.Module):
    """EncoderLayer + per-layer adaptive analogy mask over the text block.

    ``row_start`` follows the reference's per-family slice start (0 for
    UniMo-style, 1 for ViLBERT/FLAVA which skip the CLS row).
    ``compat_img_offset`` (a static image length) opts into the reference's
    shifted mask geometry for single-stream models — see ops/masks.py.
    """

    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32
    pre_norm: bool = False
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    row_start: int = 0
    compat_img_offset: Optional[int] = None

    @nn.compact
    def __call__(self, x, attn_bias=None, boundary=None, text_len=None,
                 deterministic=True):
        analogy = None
        w0, w1 = adaptive_weights(self)
        if boundary is not None:
            if self.compat_img_offset is not None:
                text_len, offset = None, self.compat_img_offset
            else:
                offset = 0
            analogy = (boundary, w0, w1, self.row_start, text_len, offset)
        return EncoderLayer(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            hidden_act=self.hidden_act, layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype, pre_norm=self.pre_norm,
            hidden_dropout=self.hidden_dropout,
            attention_dropout=self.attention_dropout, name="layer",
        )(x, attn_bias=attn_bias, analogy=analogy,
          deterministic=deterministic)


def tied_logits(word_embeddings, mlm_bias, trans_hidden, compute_dtype,
                vocab_ids=None, vocab_start=None, vocab_end=None):
    """Tied-decoder logits over a vocab slice (shared by every MaskedLM
    model; see UnimoForMaskedLM.logits)."""
    table, bias = word_embeddings, mlm_bias
    if vocab_ids is not None:
        table = jnp.take(table, vocab_ids, axis=0)
        bias = jnp.take(bias, vocab_ids, axis=0)
    elif vocab_start is not None:
        table = jax.lax.slice_in_dim(table, vocab_start, vocab_end, axis=0)
        bias = jax.lax.slice_in_dim(bias, vocab_start, vocab_end, axis=0)
    x = trans_hidden.astype(compute_dtype)
    out = jnp.einsum("...h,vh->...v", x, table.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return out + bias.astype(jnp.float32)


# Patch-embedding lowering: "reshape" (explicit patchify + one matmul) or
# "conv" (lax.conv_general_dilated, stride == kernel). Same parameters and
# numerics either way — this only picks the XLA lowering. Measured on v5e-1
# (tools/bench_opts.py): conv avoids the strided patchify copy and is ~1.5%
# faster end-to-end (742 vs 731 ex/s), so it is the default.
PATCH_EMBED_IMPL = "conv"


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding (one linear map per patch).

    The parameter keeps the Conv kernel layout (P, P, C, H) so torch
    checkpoint conversion is unchanged regardless of the lowering.
    """

    hidden_size: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = False
    impl: Optional[str] = None  # None -> module default PATCH_EMBED_IMPL

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (N, H, W, C) -> (N, H/P * W/P, hidden)."""
        n, h, w, c = x.shape
        p = self.patch_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.hidden_size),
        )
        impl = self.impl or PATCH_EMBED_IMPL
        if impl == "conv":
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(p, p), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(n, (h // p) * (w // p), self.hidden_size)
        else:
            gh, gw = h // p, w // p
            xr = x.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
            xr = xr.reshape(n, gh * gw, p * p * c)
            kflat = kernel.reshape(p * p * c, self.hidden_size).astype(self.dtype)
            out = jnp.einsum("npk,kh->nph", xr.astype(self.dtype), kflat)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.hidden_size,))
            out = out + bias.astype(self.dtype)
        return out
