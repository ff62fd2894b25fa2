"""Calibrate the bench denominator (VERDICT r1 item 9).

Measures, on THIS host's CPU:
  (a) the reference torch MarT-MKGformer train step — the model AS WRITTEN
      (full-vocab MLM logits over all L positions, per-example adaptive-mask
      scatter loops, fp32) driven exactly like lit_models/transformer.py;
  (b) this framework's train step on the jax CPU backend, same
      batch/seq/model size.

The same-host ratio (b)/(a) is a hardware-neutral datapoint for how much
faster the TPU-native design is per unit of compute, independent of the
A100-vs-v5e hardware question. Results are printed as one JSON line and
belong in BASELINE.md.

  python tools/calibrate_baseline.py [--batch 8] [--steps 3]
"""
from __future__ import annotations

import argparse, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ref_step_time(batch, seq, steps):
    import importlib.util
    import types

    import torch

    import transformers.modeling_utils as _mu
    import transformers.pytorch_utils as _pu
    import transformers.utils as _tu

    for n in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
              "prune_linear_layer"):
        if not hasattr(_mu, n) and hasattr(_pu, n):
            setattr(_mu, n, getattr(_pu, n))
    spec = importlib.util.spec_from_file_location(
        "ref_unimo_cal", "/root/reference/MarT/models/modeling_unimo.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_unimo_cal"] = mod
    spec.loader.exec_module(mod)

    class Cfg:
        vocab_size = 42112
        hidden_size = 768
        num_attention_heads = 12
        num_hidden_layers = 12
        intermediate_size = 3072
        image_size = 224
        patch_size = 32
        attention_dropout = 0.0
        hidden_dropout_prob = 0.1
        attention_probs_dropout_prob = 0.1
        layer_norm_eps = 1e-12
        hidden_act = "gelu"
        max_position_embeddings = 512
        type_vocab_size = 2
        pad_token_id = 0
        position_embedding_type = "absolute"
        chunk_size_feed_forward = 0
        add_cross_attention = False
        is_decoder = False
        device = "cpu"
        torchscript = False
        initializer_range = 0.02

    model = mod.UnimoForMaskedLM(Cfg(), Cfg())
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=5e-5)
    g = torch.Generator().manual_seed(0)
    input_ids = torch.randint(5, 42000, (batch, seq), generator=g)
    attention_mask = torch.ones(batch, seq, dtype=torch.long)
    token_type_ids = torch.zeros(batch, seq, dtype=torch.long)
    pixel_values = torch.randn(batch, 2, 3, 224, 224, generator=g)
    sep_idx = torch.sort(torch.randint(4, seq - 2, (batch, 6), generator=g),
                         dim=1).values
    labels = torch.randint(0, 2063, (batch,))
    analogy_ids = torch.arange(2063) + 8192

    def step():
        opt.zero_grad()
        out, trans = model(
            input_ids=input_ids, attention_mask=attention_mask,
            token_type_ids=token_type_ids, pixel_values=pixel_values,
            sep_idx=sep_idx.clone(), return_dict=True,
        )
        # transformer.py:92-109: mask-position logits over analogy entities
        mask_idx = sep_idx[:, 5] - 1
        logits = out.logits[torch.arange(batch), mask_idx][:, analogy_ids]
        loss = torch.nn.functional.cross_entropy(logits, labels)
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return (time.perf_counter() - t0) / steps


def ours_step_time(batch, seq, steps):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from __graft_entry__ import _synthetic_batch
    from mkg_analogy_tpu.core.mesh import make_mesh
    from mkg_analogy_tpu.models.unimo import TextConfig, UnimoConfig, UnimoForMaskedLM
    from mkg_analogy_tpu.train.trainer import MarTTrainer, TrainConfig

    vocab_size, n_analogy = 42112, 2063

    class _V:
        analogy_entity_ids = np.arange(n_analogy, dtype=np.int32) + 8192
        analogy_relation_ids = np.arange(27, dtype=np.int32) + 30000
        r_token_id = 30100
        entity_id_st, entity_id_ed = 8192, 19484
        relation_id_st, relation_id_ed = 19484, 19676
        padded_vocab_size = vocab_size

    mesh = make_mesh(dp=1, tp=1, devices=jax.devices("cpu")[:1])
    model = UnimoForMaskedLM(
        UnimoConfig(text=TextConfig(vocab_size=vocab_size), dtype="float32")
    )
    trainer = MarTTrainer(model, _V(), TrainConfig(batch_size=batch),
                          mesh=mesh)
    b = _synthetic_batch(batch, seq, vocab_size, 224, n_analogy)
    state = trainer.init_state(jax.random.PRNGKey(0), b, total_steps=100)
    step = jax.jit(trainer._train_step, donate_argnums=0)
    rng = jax.random.PRNGKey(1)
    with mesh:
        db = trainer._put_batch(b)
        state, m = step(state, db, rng)  # compile+warmup
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, db, rng)
        jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    t_ref = ref_step_time(args.batch, args.seq, args.steps)
    t_ours = ours_step_time(args.batch, args.seq, args.steps)
    print(json.dumps({
        "host": "cpu",
        "batch": args.batch,
        "ref_torch_step_s": round(t_ref, 3),
        "ref_torch_ex_per_s": round(args.batch / t_ref, 2),
        "ours_jax_cpu_step_s": round(t_ours, 3),
        "ours_jax_cpu_ex_per_s": round(args.batch / t_ours, 2),
        "same_host_speedup": round(t_ref / t_ours, 3),
    }))


if __name__ == "__main__":
    main()
