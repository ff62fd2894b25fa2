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
