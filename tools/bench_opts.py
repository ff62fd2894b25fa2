"""Perf experiments round 2: candidate optimizations measured on the real
train step (monkeypatched variants; the winners get productized).

Variants:
  base      — current code
  qkv       — fused QKV projection (one (H, 3H) matmul, split heads after)
  convpatch — patch embed via lax.conv_general_dilated NCHW (no host-visible
              transpose copy) instead of reshape+matmul
  both      — qkv + convpatch
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
    from mkg_analogy_tpu.models import common

    @nn.compact
    def call(self, hidden_states, attention_bias=None, score_multiplier=None,
             extra_kv=None, extra_kv_bias=None, output_kv=False,
             output_context=False, deterministic=True):
        b, l, _ = hidden_states.shape
        inner = self.num_heads * self.head_dim
        qkv = nn.Dense(3 * inner, dtype=self.dtype, name="qkv")(hidden_states)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(x):
            return x.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        kv_out = (k, v) if output_kv else None
        if extra_kv is not None:
            n_extra = extra_kv[0].shape[2]
            k = jnp.concatenate([extra_kv[0].astype(k.dtype), k], axis=2)
            v = jnp.concatenate([extra_kv[1].astype(v.dtype), v], axis=2)
            if extra_kv_bias is not None:
                zeros = jnp.zeros(extra_kv_bias.shape[:-1] + (l,), extra_kv_bias.dtype)
                assert attention_bias is None
                attention_bias = jnp.concatenate([extra_kv_bias, zeros], axis=-1)
        scale = jnp.asarray(self.head_dim, jnp.float32) ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if score_multiplier is not None:
            scores = scores * score_multiplier.astype(scores.dtype)
        if attention_bias is not None:
            scores = scores + attention_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        if self.dropout_rate > 0.0:
            probs = nn.Dropout(self.dropout_rate)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, inner)
        out = nn.Dense(inner, dtype=self.dtype, use_bias=self.out_bias, name="out")(ctx)
        if output_context:
            return out, kv_out, ctx
        return out, kv_out

    common.AttentionCore.__call__ = call


def patch_convpatch():
    from mkg_analogy_tpu.models import common

    common.PATCH_EMBED_IMPL = "conv"


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
    args = ap.parse_args()

    if args.variant in ("qkv", "both"):
        patch_qkv()
    if args.variant in ("convpatch", "both", "fused+conv"):
        patch_convpatch()
    if args.variant in ("fused", "fused+conv"):
        from mkg_analogy_tpu.models import common
        common.set_fused_attention(True)
    if args.variant == "nognorm":
        patch_nognorm()
    if args.variant == "bf16stage":
        patch_bf16stage(keep_gnorm=True)
    if args.variant == "bf16stage+nognorm":
        patch_bf16stage(keep_gnorm=False)
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
    if args.variant.startswith("vmem"):
        # scoped-VMEM limit via per-compile options (XLA_FLAGS is rejected
        # by the axon client); larger scratch budget -> deeper weight
        # prefetch pipelining
        kib = args.variant[4:] or "65536"
        with mesh:
            db0 = trainer._put_batch(batch)
            step = step.lower(state, db0, rng).compile(
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": kib}
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
