"""Perf experiment harness: candidate optimizations measured on the real
full-size train step (monkeypatched variants; winners get productized —
measured verdicts live in RESULTS.md "MFU experiment ledger").

Variants:
  base        — current production code
  qkv         — fused QKV projection (one (H, 3H) GEMM; param tree changes)
  convpatch   — patch embed via lax.conv NCHW instead of reshape+matmul
  fused/flashattn — Pallas attention kernels (single-block / K-blocked flash)
  nognorm     — drop the per-step grad-norm metric (now the default)
  smalladam   — vector-fused small-leaf AdamW (productized as --fused_adamw)
  bf16mu/bf16mom — AdamW first / both moment(s) stored in bf16
  bf16stage   — params cast to bf16 once per step outside jax.grad
  tdense      — pre-transposed Dense kernels (wgrad layout experiment)
  gelutanh/geluexact/gelupoly — force tanh / exact-erf / Chebyshev-poly
                gelu (gelupoly is the bf16 default since round 4, quality-
                A/B gated; tanh retracted round 4; "base" therefore now
                measures the poly path — use geluexact for the erf anchor)
  remat_probs — save post-dropout attention probs instead of recomputing
  autolayout  — XLA AUTO in/out layouts on the donated train state
                (compiler-chosen weight/moment layouts; targets the
                copy-done staging tail)
  vmem<KiB>   — xla_tpu_scoped_vmem_limit_kib sweep
  --copt k=v  — arbitrary XLA compiler-option passthrough (repeatable);
                winners ship via the CLI --xla_opt flag
Combos join with "+" (e.g. qkv+smalladam+nognorm).
"""
from __future__ import annotations

import argparse, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_default_prng_impl", "unsafe_rbg")
from mkg_analogy_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def patch_qkv():
    """Flip common.USE_FUSED_QKV: one (H, 3*inner) projection GEMM per
    attention call instead of three (H, inner) ones. Param tree changes
    ("qkv" leaf) — bench-only until it proves a win."""
    from mkg_analogy_tpu.models import common

    common.USE_FUSED_QKV = True


def patch_convpatch():
    from mkg_analogy_tpu.models import common

    common.PATCH_EMBED_IMPL = "conv"


def patch_smalladam(threshold=8192):
    """Route the trainer through the productized fused small-leaf AdamW
    (train/optim.fused_adamw, shipped behind --fused_adamw): every small
    leaf (size <= threshold: biases, LN scales, adaptive weights — ~500 of
    the ~700 leaves) is updated as ONE concatenated fp32 vector, collapsing
    ~2.6k per-leaf DMA dispatches. This patch used to carry its own copy of
    that logic; it now delegates so the bench variant always measures the
    exact math --fused_adamw ships."""
    import functools

    from mkg_analogy_tpu.train import optim, trainer as tr

    tr.make_optimizer = functools.partial(optim.make_optimizer, fused=True)


def patch_tdense():
    """Store every Dense kernel transposed — (features, in) instead of
    flax's (in, features) — and contract over the kernel's dim 1 in the
    forward. The backward then contracts over dim 0 for dgrad, so XLA
    never needs the explicit weight-transpose DMA copies the base step
    spends ~5%% of device time on (tools/attr_trace.py). Param layout
    changes -> bench-only until it proves a win."""
    import typing as _t

    import flax.linen as fnn
    from flax.linen import initializers

    class TDense(fnn.Module):
        features: int
        use_bias: bool = True
        dtype: _t.Any = None
        param_dtype: _t.Any = jnp.float32
        kernel_init: _t.Any = initializers.lecun_normal()
        bias_init: _t.Any = initializers.zeros_init()
        precision: _t.Any = None

        @fnn.compact
        def __call__(self, x):
            kernel = self.param(
                "kernel", self.kernel_init,
                (self.features, x.shape[-1]), self.param_dtype,
            )
            dt = self.dtype or x.dtype
            y = jax.lax.dot_general(
                x.astype(dt), kernel.astype(dt),
                (((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=dt,
            )
            if self.use_bias:
                bias = self.param(
                    "bias", self.bias_init, (self.features,), self.param_dtype
                )
                y = y + bias.astype(dt)
            return y

    fnn.Dense = TDense


def patch_gelutanh():
    """Force the tanh gelu approximation regardless of dtype/flag: +12%
    step throughput on v5e, but RETRACTED as the production default in
    round 4 (same-seed MARS scratch-15: test Hits@1 0.2203 vs erf 0.2849;
    models/common.py). Throughput pricing only."""
    from mkg_analogy_tpu.models import common

    common.ACT2FN["gelu"] = lambda x: nn.gelu(x, approximate=True)


def patch_geluexact():
    """Force exact erf gelu (the reference's bit-semantics anchor; the
    production bf16 default is gelu_poly since the round-4 quality gate)."""
    from mkg_analogy_tpu.models import common

    common.set_gelu_exact(True)


def patch_gelupoly():
    """Degree-14 Chebyshev minimax gelu (models/common.py gelu_poly):
    targets the ~4.4 ms/step erf VPU tail with >99% bf16 bit-identity and
    <=4.3e-6 gradient deviation via the custom-JVP fitted derivative
    (tanh's was 8.7e-4; the retired v1 plain-autodiff kernel had a
    1.2e-4 clamp-corner blip). Default-change gated on the end-to-end
    quality A/B per the round-4 tanh retraction."""
    from mkg_analogy_tpu.models import common

    common.set_gelu_impl("poly")


def patch_bf16mu(nu_too=False):
    """Store the AdamW first moment (mu) in bf16 (optax mu_dtype): halves
    mu's HBM read+write (~440 MB/step on the 110M-param flagship). EMA-safe
    for mu — b1=0.9 means per-step relative increments ~0.1, well above the
    bf16 epsilon 0.0078 — unlike nu, whose (1-b2)=1e-3 increments vanish in
    bf16 and freeze the accumulator (the round-2 'numerics drift'). With
    nu_too=True both moments go bf16 to reproduce the round-2 measurement."""
    import functools

    import optax

    from mkg_analogy_tpu.train import optim, trainer as tr

    orig_adamw = optax.adamw

    def adamw_bf16mu(*a, **kw):
        kw["mu_dtype"] = jnp.bfloat16
        tx = orig_adamw(*a, **kw)
        if not nu_too:
            return tx
        # optax has no nu_dtype; wrap init/update to round-trip nu via bf16.
        def init_fn(params):
            st = tx.init(params)

            def cast_nu(s):
                if hasattr(s, "nu"):
                    return s._replace(
                        nu=jax.tree_util.tree_map(
                            lambda x: x.astype(jnp.bfloat16), s.nu
                        )
                    )
                return s

            return tuple(cast_nu(s) for s in st)

        def update_fn(updates, state, params=None):
            def f32_nu(s):
                if hasattr(s, "nu"):
                    return s._replace(
                        nu=jax.tree_util.tree_map(
                            lambda x: x.astype(jnp.float32), s.nu
                        )
                    )
                return s

            upd, new_state = tx.update(
                updates, tuple(f32_nu(s) for s in state), params
            )

            def bf16_nu(s):
                if hasattr(s, "nu"):
                    return s._replace(
                        nu=jax.tree_util.tree_map(
                            lambda x: x.astype(jnp.bfloat16), s.nu
                        )
                    )
                return s

            return upd, tuple(bf16_nu(s) for s in new_state)

        return optax.GradientTransformation(init_fn, update_fn)

    def make_optimizer(*a, **kw):
        optax.adamw = adamw_bf16mu
        try:
            return optim.make_optimizer(*a, **kw)
        finally:
            optax.adamw = orig_adamw

    tr.make_optimizer = functools.wraps(optim.make_optimizer)(make_optimizer)


def patch_nognorm():
    """Drop the per-step optax.global_norm(grads) metric — a full extra
    HBM pass over every gradient (~680 MB/step). pl does not compute
    grad norms unless --track_grad_norm is set."""
    from mkg_analogy_tpu.train import trainer as tr

    def _train_step(self, state, batch, rng, image_table=None):
        import jax as _jax
        rng = _jax.random.fold_in(rng, state.step)
        cfg = self.config
        use_triple = cfg.pretrain and not cfg.analogy_pretrain
        loss_fn = self._pretrain_loss if use_triple else self._finetune_loss
        grads, metrics = _jax.grad(
            lambda p: loss_fn(p, batch, rng, image_table), has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads)
        return new_state, metrics

    tr.MarTTrainer._train_step = _train_step


def patch_bf16stage(keep_gnorm=True):
    """Cast >=2-D float32 params to bf16 ONCE, outside jax.grad, so every
    GEMM stages bf16 weights into VMEM (half the DMA bytes of the f32
    staging XLA does today). Numerically identical on the matmul path —
    Dense already casts params to bf16 at each use site."""
    from mkg_analogy_tpu.train import trainer as tr

    def _train_step(self, state, batch, rng, image_table=None):
        import jax as _jax
        rng = _jax.random.fold_in(rng, state.step)
        cfg = self.config
        use_triple = cfg.pretrain and not cfg.analogy_pretrain
        loss_fn = self._pretrain_loss if use_triple else self._finetune_loss

        def stage(x):
            if x.ndim >= 2 and x.dtype == jnp.float32:
                return x.astype(jnp.bfloat16)
            return x

        pbf = _jax.tree_util.tree_map(stage, state.params)
        grads, metrics = _jax.grad(
            lambda p: loss_fn(p, batch, rng, image_table), has_aux=True
        )(pbf)
        grads = _jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype), grads, state.params
        )
        new_state = state.apply_gradients(grads=grads)
        if keep_gnorm:
            import optax as _optax
            metrics["grad_norm"] = _optax.global_norm(grads)
        return new_state, metrics

    tr.MarTTrainer._train_step = _train_step


def patch_remat_save_probs():
    """Attention remat alternative: save the (bf16) post-dropout probs
    instead of recomputing the whole score chain in backward. Trades
    ~300 MB/step of probs HBM traffic for the backward's recomputed
    QK^T GEMM + softmax + dropout redraw."""
    from jax.ad_checkpoint import checkpoint_name

    from mkg_analogy_tpu.models import common

    def _einsum(self, q, k, v, attention_bias, analogy, deterministic):
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
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            if analogy_arrs is not None:
                from mkg_analogy_tpu.ops.masks import analogy_score_multiplier

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
                b_, h_, lq_, lk_ = probs.shape
                keep = jax.random.bernoulli(
                    key, 1.0 - rate, (b_, h_, lk_, lq_)
                ).swapaxes(-1, -2)
                probs = jnp.where(
                    keep, probs / (1.0 - rate), jnp.zeros_like(probs)
                )
            probs = checkpoint_name(probs, "attn_probs")
            return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

        core = jax.checkpoint(
            core,
            policy=jax.checkpoint_policies.save_only_these_names("attn_probs"),
        )
        return core(q, k, v, attention_bias, analogy_arrs, key)

    common.AttentionCore._einsum = _einsum


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variant", default="base")
    ap.add_argument("--copt", action="append", default=[],
                    help="key=val XLA compiler option(s) applied via "
                         "lower().compile(compiler_options=...) — e.g. "
                         "--copt xla_tpu_scoped_vmem_limit_kib=65536")
    args = ap.parse_args()

    if args.variant in ("qkv", "both"):
        patch_qkv()
    if args.variant in ("convpatch", "both", "fused+conv"):
        patch_convpatch()
    if args.variant in ("fused", "fused+conv"):
        from mkg_analogy_tpu.models import common
        common.set_fused_attention(True)
    if args.variant == "flashattn":
        from mkg_analogy_tpu.models import common
        common.set_fused_attention(True, backend="flash")
    if args.variant == "nognorm":
        patch_nognorm()
    if args.variant == "smalladam":
        patch_smalladam()
    if args.variant == "smalladam+nognorm":
        patch_smalladam()
        patch_nognorm()
    if args.variant == "qkv+nognorm":
        patch_qkv()
        patch_nognorm()
    if args.variant == "qkv+smalladam+nognorm":
        patch_qkv()
        patch_smalladam()
        patch_nognorm()
    if args.variant == "bf16mu":
        patch_bf16mu()
    if args.variant == "bf16mom":
        patch_bf16mu(nu_too=True)
    if args.variant == "tdense":
        patch_tdense()
    if args.variant == "gelutanh":
        patch_gelutanh()
    if args.variant == "geluexact":
        patch_geluexact()
    if args.variant == "gelupoly":
        patch_gelupoly()
    if args.variant == "tdense+gelutanh":
        patch_tdense()
        patch_gelutanh()
    if args.variant == "bf16stage":
        patch_bf16stage(keep_gnorm=True)
    if args.variant == "bf16stage+nognorm":
        patch_bf16stage(keep_gnorm=False)
    if args.variant == "qkgrad":
        # attention dq/dk backward GEMMs in bf16 instead of f32 (the score
        # cotangent is already bf16-grained at dprobs; models/common.py
        # QK_BF16_GRAD). Targets the ~1.1 ms/step of `conv f32[B,12,L,64]`
        # in the poly-base attr_trace.
        from mkg_analogy_tpu.models import common
        common.set_qk_bf16_grad(True)
    if args.variant == "remat_probs":
        patch_remat_save_probs()
    if args.variant == "remat_probs+bf16stage+nognorm":
        patch_remat_save_probs()
        patch_bf16stage(keep_gnorm=False)

    from __graft_entry__ import _synthetic_batch
    from mkg_analogy_tpu.core.mesh import make_mesh
    from mkg_analogy_tpu.models.unimo import TextConfig, UnimoConfig, UnimoForMaskedLM
    from mkg_analogy_tpu.train.trainer import MarTTrainer, TrainConfig

    vocab_size, n_analogy = 19712, 2063

    class _V:
        analogy_entity_ids = np.arange(n_analogy, dtype=np.int32) + 8192
        analogy_relation_ids = np.arange(27, dtype=np.int32) + 19484
        r_token_id = 19676
        entity_id_st, entity_id_ed = 8192, 19484
        relation_id_st, relation_id_ed = 19484, 19676
        padded_vocab_size = vocab_size

    B = args.batch
    mesh = make_mesh()
    model = UnimoForMaskedLM(UnimoConfig(text=TextConfig(vocab_size=vocab_size)))
    trainer = MarTTrainer(model, _V(), TrainConfig(batch_size=B), mesh=mesh)
    batch = _synthetic_batch(B, 128, vocab_size, 224, n_analogy)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, total_steps=1000)
    step = jax.jit(trainer._train_step, donate_argnums=0)
    rng = jax.random.PRNGKey(1)
    if args.variant == "autolayout":
        # Let XLA pick the on-HBM layout of every state leaf (weights,
        # AdamW moments) instead of the default major-to-minor order: if
        # the program wants a kernel transposed, AUTO stores it that way
        # and the per-step entry/exit relayout copies disappear — aimed at
        # the 5.7% copy-done tail (tools/attr_trace.py). The state is
        # re-device_put once into the compiler-chosen formats; donation
        # keeps in/out layouts aliased.
        from jax.experimental.layout import Format, Layout

        step = jax.jit(
            trainer._train_step,
            donate_argnums=0,
            in_shardings=Format(Layout.AUTO),
            out_shardings=Format(Layout.AUTO),
        )

        def _sds(t):
            def f(x):
                x = jnp.asarray(x) if not hasattr(x, "shape") else x
                return jax.ShapeDtypeStruct(x.shape, x.dtype)

            return jax.tree_util.tree_map(f, t)

        with mesh:
            db0 = trainer._put_batch(batch)
            compiled = step.lower(_sds(state), _sds(db0), _sds(rng)).compile()
            fmts = compiled.input_formats[0]
            state = jax.device_put(state, fmts[0])
            batch_fmt, rng_fmt = fmts[1], fmts[2]
            rng = jax.device_put(rng, rng_fmt)
            _inner = compiled

            def step(s, b, r):  # noqa: F811 — device_put is a no-op once
                # the operand already carries the compiler-chosen format
                return _inner(s, jax.device_put(b, batch_fmt),
                              jax.device_put(r, rng_fmt))

    copts = {}
    if args.variant.startswith("vmem"):
        # scoped-VMEM limit via per-compile options (XLA_FLAGS is rejected
        # by the axon client); larger scratch budget -> deeper weight
        # prefetch pipelining
        copts["xla_tpu_scoped_vmem_limit_kib"] = args.variant[4:] or "65536"
    for kv in args.copt:
        k, _, v = kv.partition("=")
        copts[k] = v
    if copts and args.variant != "autolayout":
        with mesh:
            db0 = trainer._put_batch(batch)
            step = step.lower(state, db0, rng).compile(
                compiler_options=copts
            )
    with mesh:
        db = trainer._put_batch(batch)
        for _ in range(5):
            state, m = step(state, db, rng)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(30):
            state, m = step(state, db, rng)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / 30
    print(json.dumps({"variant": args.variant, "batch": B,
                      "step_ms": round(dt * 1000, 2),
                      "ex_per_sec": round(B / dt, 1)}))


if __name__ == "__main__":
    main()
