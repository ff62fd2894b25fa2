"""Throughput experiments: isolate the cost of each step component by
toggling it off and timing the full train step (fwd+bwd+update).

Variants: base / nodrop (deterministic fwd) / nomask (no analogy
multiplier) / nognorm (no grad-norm metric) / sgd (optimizer swap) /
fwdonly (loss only, no backward).
"""
from __future__ import annotations

import argparse, json, sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_default_prng_impl", "unsafe_rbg")
from mkg_analogy_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()

import jax.numpy as jnp
import numpy as np
import optax


def time_fn(step, state, batch, rng, steps=20, warmup=3):
    for _ in range(warmup):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variants", default="base,nodrop,nomask,nognorm,sgd,fwdonly")
    args = ap.parse_args()

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
    rng = jax.random.PRNGKey(1)
    results = {}
    with mesh:
        db = trainer._put_batch(batch)
        for variant in args.variants.split(","):
            # fresh state per variant (donated buffers are consumed)
            state = trainer.init_state(jax.random.PRNGKey(0), batch,
                                       total_steps=1000)
            tr = trainer
            if variant == "nomask":
                db2 = dict(db)
                def loss_nomask(params, b, r, image_table=None, _t=trainer):
                    b = dict(b); 
                    return _t._finetune_loss(params, b, r, image_table)
                # patch _model_inputs boundary off
                import types
                tr = MarTTrainer(model, _V(), TrainConfig(batch_size=B), mesh=mesh)
                orig = tr._model_inputs
                def mi(b, train, image_table=None):
                    out = orig(b, train, image_table)
                    out["boundary"] = None
                    return out
                tr._model_inputs = mi
                step = jax.jit(tr._train_step, donate_argnums=0)
            elif variant == "nodrop":
                tr = MarTTrainer(model, _V(), TrainConfig(batch_size=B), mesh=mesh)
                def loss_det(params, b, r, image_table=None, _t=tr):
                    cfg = _t.config
                    inputs = _t._model_inputs(b, train=True, image_table=image_table)
                    trans = model.apply(params, **inputs, deterministic=True)
                    logits = model.apply(params, trans[:, 0],
                                         vocab_ids=_t.analogy_entity_ids,
                                         method=type(model).logits)
                    from mkg_analogy_tpu.ops.losses import (
                        label_smoothing_cross_entropy, relaxation_loss)
                    ce = label_smoothing_cross_entropy(logits, b["label"], cfg.label_smoothing)
                    sim = relaxation_loss(trans[:, 3], trans[:, 4], trans[:, 1], trans[:, 2])
                    loss = ce + cfg.alpha * sim
                    return loss, {"loss": loss}
                def stp(state, b, r):
                    grads, m = jax.grad(lambda p: loss_det(p, b, r), has_aux=True)(state.params)
                    state = state.apply_gradients(grads=grads)
                    m["grad_norm"] = optax.global_norm(grads)
                    return state, m
                step = jax.jit(stp, donate_argnums=0)
            elif variant == "nognorm":
                def stp(state, b, r, _t=trainer):
                    r = jax.random.fold_in(r, state.step)
                    grads, m = jax.grad(lambda p: _t._finetune_loss(p, b, r), has_aux=True)(state.params)
                    return state.apply_gradients(grads=grads), m
                step = jax.jit(stp, donate_argnums=0)
            elif variant == "sgd":
                from flax.training import train_state as ts
                st2 = ts.TrainState.create(apply_fn=model.apply,
                                           params=state.params, tx=optax.sgd(1e-3))
                def stp(state, b, r, _t=trainer):
                    r = jax.random.fold_in(r, state.step)
                    grads, m = jax.grad(lambda p: _t._finetune_loss(p, b, r), has_aux=True)(state.params)
                    return state.apply_gradients(grads=grads), m
                step = jax.jit(stp, donate_argnums=0)
                dt = time_fn(step, st2, db, rng)
                results[variant] = B / dt
                print(variant, round(B / dt, 1), "ex/s", flush=True)
                continue
            elif variant == "bf16mom":
                # AdamW with bf16 first/second moments: halves optimizer
                # HBM traffic (m+v are 2x792MB fp32 on the 198M-param
                # flagship). Numerics deviation is measured separately.
                from flax.training import train_state as ts

                def scale_by_adam_bf16():
                    def init_fn(params):
                        z = lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16)
                        return (jax.tree_util.tree_map(z, params),
                                jax.tree_util.tree_map(z, params),
                                jnp.zeros((), jnp.int32))
                    def update_fn(updates, st, params=None):
                        m, v, cnt = st
                        cnt = cnt + 1
                        b1, b2, eps = 0.9, 0.999, 1e-8
                        m = jax.tree_util.tree_map(
                            lambda mm, g: (b1 * mm.astype(jnp.float32)
                                           + (1 - b1) * g).astype(jnp.bfloat16),
                            m, updates)
                        v = jax.tree_util.tree_map(
                            lambda vv, g: (b2 * vv.astype(jnp.float32)
                                           + (1 - b2) * g * g).astype(jnp.bfloat16),
                            v, updates)
                        c = cnt.astype(jnp.float32)
                        out = jax.tree_util.tree_map(
                            lambda mm, vv: -(1e-4) * (mm.astype(jnp.float32) / (1 - 0.9 ** c))
                            / (jnp.sqrt(vv.astype(jnp.float32) / (1 - 0.999 ** c)) + eps),
                            m, v)
                        return out, (m, v, cnt)
                    return optax.GradientTransformation(init_fn, update_fn)

                st3 = ts.TrainState.create(apply_fn=model.apply,
                                           params=state.params,
                                           tx=scale_by_adam_bf16())
                def stp(state, b, r, _t=trainer):
                    r = jax.random.fold_in(r, state.step)
                    grads, m = jax.grad(lambda p: _t._finetune_loss(p, b, r), has_aux=True)(state.params)
                    return state.apply_gradients(grads=grads), m
                step = jax.jit(stp, donate_argnums=0)
                dt = time_fn(step, st3, db, rng)
                results[variant] = B / dt
                print(variant, round(B / dt, 1), "ex/s", flush=True)
                continue
            elif variant == "fwdonly":
                def stp(state, b, r, _t=trainer):
                    r = jax.random.fold_in(r, state.step)
                    loss, m = _t._finetune_loss(state.params, b, r)
                    return state, m
                step = jax.jit(stp)
            else:
                step = jax.jit(trainer._train_step, donate_argnums=0)
            dt = time_fn(step, state, db, rng)
            results[variant] = B / dt
            print(variant, round(B / dt, 1), "ex/s", flush=True)
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
