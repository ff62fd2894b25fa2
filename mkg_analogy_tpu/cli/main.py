"""CLI entry point mirroring the reference's flag surface (MarT/main.py:20-60
plus the flags contributed by KGC.add_to_argparse and
TransformerLitModel.add_to_argparse), with TPU-native additions (--dp/--tp/
--dtype).

Examples (reference script parity, MarT/scripts/run_finetune_mkgformer.sh):

  python -m mkg_analogy_tpu.cli.main \
      --model_class MKGformerKGC --batch_size 32 --lr 5e-5 --alpha 0.43 \
      --max_epochs 15 --max_seq_length 128 --eval_batch_size 128 \
      --data_dir dataset/MARS --pretrain_path dataset/MarKG --pretrain 0
"""

from __future__ import annotations

import argparse
import os

import jax


def _int_or_float(token: str):
    """pl.Trainer disambiguates limit_train_batches by Python type: int =
    batch count, float = epoch fraction. Keep that distinction at argparse
    time (ADVICE r2: a bare '1' must mean ONE batch, not the full epoch)."""
    if any(c in token for c in ".eE"):
        return float(token)
    return int(token)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native MKG analogy framework (MarT pipeline)"
    )
    # Basic (main.py:29-41)
    p.add_argument("--wandb", action="store_true", default=False,
                   help="also write a wandb-offline-format run directory "
                        "(history/summary/config files) under log_dir/wandb "
                        "(main.py:136-139 parity; no egress, so offline only)")
    p.add_argument("--litmodel_class", type=str, default="TransformerLitModel")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--data_class", type=str, default="KGC")
    p.add_argument("--chunk", type=str, default="")
    p.add_argument("--model_class", type=str, default="MKGformerKGC")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--visual_model_path", type=str, default=None)
    p.add_argument("--pretrain_path", type=str, default=None)
    p.add_argument("--alpha", type=float, default=0.4,
                   help="weight of the relaxation (similarity) loss")
    p.add_argument("--only_test", action="store_true", default=False)
    p.add_argument("--export_torch", type=str, default=None,
                   help="write the best params as a reference-format torch "
                        "checkpoint (MKGformerKGC only)")
    # Trainer args (pl.Trainer surface used by the run scripts)
    p.add_argument("--max_epochs", type=int, default=15)
    p.add_argument("--gpus", type=str, default=None,
                   help="ignored on TPU; accepted for script parity")
    p.add_argument("--accumulate_grad_batches", type=int, default=1)
    p.add_argument("--track_grad_norm", type=int, default=-1,
                   help="pl.Trainer parity: -1 (default) = no grad-norm "
                        "metric; any other value logs the global L2 norm "
                        "(costs a full HBM pass over all grads per step)")
    p.add_argument("--check_val_every_n_epoch", type=int, default=1)
    p.add_argument("--precision", type=int, default=32,
                   help="16 -> bfloat16 activations on TPU (default already bf16)")
    p.add_argument("--num_workers", type=int, default=4,
                   help="accepted for parity; input pipeline is vectorized")
    p.add_argument("--limit_train_batches", type=_int_or_float, default=None,
                   help="pl.Trainer semantics: an integer token is a batch "
                        "COUNT (so '1' = one batch); only a token containing "
                        "'.' in (0, 1] is a fraction of the epoch")
    # Data args (data_module.py:253-262)
    p.add_argument("--model_name_or_path", type=str, default="wordpiece-kg",
                   help="path to a vocab.txt/tokenizer dir, or 'wordpiece-kg' "
                        "to train an offline WordPiece vocab from the corpus")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--warm_up_radio", type=float, default=0.1)
    p.add_argument("--eval_batch_size", type=int, default=128)
    p.add_argument("--overwrite_cache", action="store_true", default=False)
    p.add_argument("--batch_size", type=int, default=32)
    # Model args (models/model.py)
    p.add_argument("--pretrain", type=int, default=0)
    p.add_argument("--pretrain_format", type=str, default="triple",
                   choices=["triple", "analogy", "mixed"],
                   help="pretrain prompt format: 'triple' = the reference's "
                        "link/relation-prediction prompts (processor.py:"
                        "124-149); 'analogy' = MarKG pseudo-analogies in the "
                        "fine-tune layout (TPU-native addition, data/"
                        "prompt.py:build_pseudo_analogy_features); 'mixed' = "
                        "per-epoch interleave of both diets (two compiled "
                        "steps over one state; eval in the analogy geometry)")
    # diagnostic ablation (models/vilbert.py VilBertConfig.ablate_img_to_txt)
    p.add_argument("--vilbert_ablate_img_to_txt", type=int, default=0)
    # LitModel args (lit_models/base.py + transformer.py)
    p.add_argument("--optimizer", type=str, default="AdamW")
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--label_smoothing", type=float, default=0.1)
    p.add_argument("--bce", type=int, default=0)
    # TPU-native extensions
    p.add_argument("--dp", type=int, default=None, help="data-parallel size")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--log_dir", type=str, default="training/logs")
    p.add_argument("--cache_dir", type=str, default=".cache/mkg")
    p.add_argument("--image_features", type=str, default=None,
                   help="path to a .npy pixel/region feature cache")
    p.add_argument("--text_vocab_size", type=int, default=8192)
    # architecture overrides (small-scale runs / CI)
    p.add_argument("--hidden_size", type=int, default=None)
    p.add_argument("--num_layers", type=int, default=None)
    p.add_argument("--num_heads", type=int, default=None)
    p.add_argument("--intermediate_size", type=int, default=None)
    p.add_argument("--profile", action="store_true", default=False,
                   help="capture a jax.profiler trace of a few train steps")
    p.add_argument("--fused_attention", type=str, default=None,
                   choices=["0", "1", "flash"],
                   help="1 -> single-block Pallas fused attention kernel, "
                        "flash -> K-blocked online-softmax kernel (scales to "
                        "long L), 0 -> XLA einsum path; default = "
                        "models.common.USE_FUSED_ATTENTION "
                        "(the configuration bench.py records)")
    p.add_argument("--exact_gelu", type=int, default=None, choices=[0, 1],
                   help="1 -> exact erf gelu, the reference's semantics, in "
                        "every dtype. 0 -> tanh approximation under bf16: "
                        "+12% step throughput on v5e; quality-inconclusive "
                        "at n=2 same-seed pairs (tanh-erf = -6.5/+0.9 pts "
                        "Hits@1, RESULTS.md round-4 qualification) and "
                        "retracted as default on reference-semantics "
                        "grounds — throughput experiments only. Unset -> "
                        "the module default (gelu_poly under bf16 since "
                        "round 4; fp32 always exact erf).")
    p.add_argument("--gelu_impl", type=str, default=None,
                   choices=["erf", "tanh", "poly"],
                   help="gelu lowering for bf16 compute (fp32 always uses "
                        "exact erf): poly (default since round 4: degree-14 "
                        "Chebyshev minimax fit of erf-gelu, fwd within "
                        "2.1e-6 and grad within 4.3e-6 of erf everywhere, "
                        "+6.8% step throughput, quality-gated by the 2-seed "
                        "A/B in RESULTS.md — models/common.py gelu_poly), "
                        "erf (exact reference semantics), tanh (retracted; "
                        "quality caveat at --exact_gelu). Overrides "
                        "--exact_gelu when given.")
    p.add_argument("--qk_bf16_grad", type=int, default=None, choices=[0, 1],
                   help="1 -> compute the attention dq/dk backward GEMMs in "
                        "the compute dtype instead of f32 (exact forward; "
                        "the score cotangent is already bf16-grained from "
                        "the probs@V backward — models/common.py "
                        "QK_BF16_GRAD). Off by default pending the "
                        "round-5 end-to-end quality A/B.")
    p.add_argument("--fused_adamw", action="store_true", default=False,
                   help="vector-fused small-leaf AdamW (train/optim.fused_adamw):"
                        " numerically optax.adamw; measured throughput-neutral"
                        " on v5e at B=32 (RESULTS.md), so opt-in")
    p.add_argument("--host_gather", action="store_true", default=False,
                   help="gather image features on host per batch (reference-"
                        "style) instead of the device-resident table")
    p.add_argument("--xla_opt", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="extra XLA backend option(s) for every jitted "
                        "function (repeatable), e.g. --xla_opt "
                        "xla_tpu_scoped_vmem_limit_kib=65536; unknown keys "
                        "fail at compile time (tools/bench_opts.py --copt "
                        "is the sweep harness)")
    p.add_argument("--prng", type=str, default="unsafe_rbg",
                   choices=["threefry2x32", "rbg", "unsafe_rbg"],
                   help="JAX PRNG impl; rbg variants are ~20%% faster "
                        "per train step on TPU (dropout mask generation)")
    return p


def make_model(args, vocab_size: int):
    from ..models.registry import create_model

    overrides = {
        k: getattr(args, k)
        for k in ("hidden_size", "num_layers", "num_heads", "intermediate_size")
        if getattr(args, k, None)
    }
    if getattr(args, "vilbert_ablate_img_to_txt", 0):
        overrides["vilbert_ablate_img_to_txt"] = True
    return create_model(args.model_class, vocab_size=vocab_size,
                        dtype=args.dtype, **overrides)


def main(argv=None):
    args = build_parser().parse_args(argv)
    print(args)
    jax.config.update("jax_default_prng_impl", args.prng)
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..core.mesh import make_mesh
    from ..data.module import KGCDataModule
    from ..train.checkpoint import Checkpointer, partial_restore
    from ..train.trainer import MarTTrainer, TrainConfig
    from ..utils.logging import MetricLogger

    if args.fused_attention is not None:
        from ..models import common as _common

        if args.fused_attention == "flash":
            _common.set_fused_attention(True, backend="flash")
        else:
            _common.set_fused_attention(args.fused_attention == "1")
    if args.gelu_impl is not None:
        from ..models import common as _common

        _common.set_gelu_impl(args.gelu_impl)
    elif args.exact_gelu is not None:
        from ..models import common as _common

        _common.set_gelu_exact(bool(args.exact_gelu))
    if args.qk_bf16_grad is not None:
        from ..models import common as _common

        _common.set_qk_bf16_grad(bool(args.qk_bf16_grad))

    vocab_file = None
    if args.model_name_or_path and args.model_name_or_path != "wordpiece-kg":
        cand = os.path.join(args.model_name_or_path, "vocab.txt")
        if os.path.exists(cand):
            vocab_file = cand
        elif os.path.exists(args.model_name_or_path):
            vocab_file = args.model_name_or_path

    from ..models.registry import IMAGE_INPUT

    kind, img_size = IMAGE_INPUT.get(args.model_class, ("pixels", 224))
    if args.image_features not in (None, "", "synthetic", "synthetic_noise") \
            and not os.path.exists(args.image_features):
        # An explicit feature cache that doesn't exist must not silently
        # degrade to the zero-feature baseline (open_store's fallback is
        # for the no---image_features default only): that would train and
        # report the wrong experiment arm.
        raise SystemExit(
            f"--image_features {args.image_features!r} is neither a known "
            "synthetic mode (synthetic, synthetic_noise) nor an existing "
            "feature-cache path"
        )
    data = KGCDataModule(
        data_dir=args.data_dir,
        pretrain_path=args.pretrain_path or args.data_dir,
        max_seq_length=args.max_seq_length,
        pretrain=bool(args.pretrain),
        vocab_file=vocab_file,
        text_vocab_size=args.text_vocab_size,
        cache_dir=args.cache_dir,
        image_features=args.image_features,
        image_size=img_size or 224,
        image_kind=kind,
        overwrite_cache=args.overwrite_cache,
        seed=args.seed,
        pretrain_format=args.pretrain_format,
    )
    model = make_model(args, data.vocab.padded_vocab_size)

    mesh = make_mesh(dp=args.dp, tp=args.tp)
    cfg = TrainConfig(
        lr=args.lr,
        max_epochs=args.max_epochs,
        batch_size=args.batch_size,
        eval_batch_size=args.eval_batch_size,
        alpha=args.alpha,
        label_smoothing=args.label_smoothing,
        warmup_ratio=args.warm_up_radio,
        weight_decay=args.weight_decay,
        grad_accum_steps=args.accumulate_grad_batches,
        pretrain=bool(args.pretrain),
        analogy_pretrain=bool(args.pretrain)
        and args.pretrain_format in ("analogy", "mixed"),
        mixed_pretrain=bool(args.pretrain) and args.pretrain_format == "mixed",
        seed=args.seed,
        track_grad_norm=args.track_grad_norm != -1,
        check_val_every_n_epoch=args.check_val_every_n_epoch,
        profile_dir=os.path.join(args.log_dir, "profile") if args.profile else None,
        # pl.Trainer semantics: a fraction <= 1.0 limits to that share of
        # the train batches; an integer limits to that many batches
        # (lit_models/base.py:79-82) — resolved in MarTTrainer.fit
        limit_train_batches=args.limit_train_batches or None,
        fused_adamw=args.fused_adamw,
        compiler_options=dict(kv.partition("=")[::2] for kv in args.xla_opt)
        or None,
    )
    logger = MetricLogger(args.log_dir, wandb=args.wandb,
                          config=vars(args) if args.wandb else None)
    trainer = MarTTrainer(model, data.vocab, cfg, mesh=mesh, logger=logger)
    ckpt = Checkpointer(os.path.join(args.output_dir, "ckpt"))

    if args.image_features in ("synthetic", "synthetic_noise") and kind == "pixels":
        # Identity-signal ablation: deterministic per-entity noise images,
        # generated directly ON DEVICE (the (11292, 3, 224, 224) bf16 table
        # is ~3.4 GB — never materialized on the host or shipped over the
        # tunnel). The real entity photos are an external download the
        # zero-egress environment cannot fetch; this mode proves the
        # vision tower + fusion path transmits per-entity signal
        # end-to-end (see RESULTS.md).
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = data.markg.num_entities
        size = img_size or 224
        shape = (3, size, size)

        def _make_table():
            # "synthetic": low-frequency identity patterns, NOT white
            # noise — each (size/7)^2 block is one per-entity Gaussian
            # value, so the ViT-B/32 patch embedding of each (uniform)
            # patch is a scalar times a fixed vector — a clean 3x7x7
            # identity code the tower can actually learn to read.
            # "synthetic_noise": per-pixel white noise, the high-frequency
            # control arm. (Measured: noise scores BELOW the zero-image
            # baseline — 0.225 vs 0.297 test MRR — because noise-pattern
            # discrimination from scratch is itself an unsolved subtask;
            # see RESULTS.md.)
            if args.image_features == "synthetic_noise":
                tab = jax.random.normal(
                    jax.random.PRNGKey(314159), (n,) + shape, jnp.bfloat16
                )
            else:
                blocks = max(1, size // 32)
                g = jax.random.normal(
                    jax.random.PRNGKey(314159), (n, 3, blocks, blocks),
                    jnp.bfloat16,
                )
                rep = size // blocks
                tab = jnp.repeat(jnp.repeat(g, rep, axis=2), rep, axis=3)
                tab = tab[:, :, :size, :size]
            return jnp.concatenate(
                [tab, jnp.zeros((1,) + shape, jnp.bfloat16)], axis=0
            )

        with mesh:
            table = jax.jit(
                _make_table, out_shardings=NamedSharding(mesh, P())
            )()
        trainer.set_image_table(table, kind=kind)
        attach = None
    elif args.image_features in ("synthetic", "synthetic_noise") and kind == "regions":
        # Region-path identity-signal ablation (VisualBERT/ViLBERT) —
        # mirror of the pixel ablation above, in detector-feature space
        # (data_module.py:129-159 region collation, modeling_visual_bert.py:72
        # embeddings). "synthetic": each entity's 36 regions carry the SAME
        # per-entity 2048-d Gaussian code (rank-1, the cleanest structured
        # identity — the region projection reads it in one linear map).
        # "synthetic_noise": iid Gaussians per (entity, region, dim) — the
        # high-frequency control arm. (11293, 36, 2048) bf16 = 1.7 GB,
        # built on device.
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..data.images import RegionStore

        n = data.markg.num_entities
        n_reg, d_reg = RegionStore.num_regions, RegionStore.feat_dim

        def _make_region_table():
            key = jax.random.PRNGKey(271828)
            if args.image_features == "synthetic_noise":
                g = jax.random.normal(key, (n, n_reg, d_reg), jnp.bfloat16)
            else:
                code = jax.random.normal(key, (n, 1, d_reg), jnp.bfloat16)
                g = jnp.broadcast_to(code, (n, n_reg, d_reg))
            return jnp.concatenate(
                [g, jnp.zeros((1, n_reg, d_reg), jnp.bfloat16)], axis=0
            )

        with mesh:
            table = jax.jit(
                _make_region_table, out_shardings=NamedSharding(mesh, P())
            )()
        trainer.set_image_table(table, kind=kind)
        attach = None
    elif args.host_gather:
        attach = data.pixel_attach()
    else:
        # device-resident feature table: only int indices cross the link
        trainer.set_image_table(data.device_table(), kind=kind)
        attach = None
    if args.pretrain:
        if args.pretrain_format == "mixed":
            # two component diets, each cached under its single-format key;
            # dev/test ranking runs in the analogy geometry (the downstream
            # task the pretrain is meant to transfer to)
            analogy_feats = data.features("train", fmt="analogy")
            train_feats = (data.features("train", fmt="triple"), analogy_feats)
            dev_feats = analogy_feats
            test_feats = analogy_feats
        else:
            train_feats = data.features("train")
            dev_feats = train_feats  # reference evaluates pretrain on train triples
            test_feats = train_feats
    else:
        train_feats = data.features("train")
        dev_feats = data.features("dev")
        test_feats = data.features("test")

    if args.only_test:
        import jax.random as jr

        it = data.iterator("test", args.eval_batch_size, shuffle=False,
                           pad_tail=True)
        sample = next(iter(it))
        sample.pop("valid", None)
        state = trainer.init_state(jr.PRNGKey(args.seed), sample, total_steps=1)
        params = state.params
        if args.checkpoint:
            restored = Checkpointer(args.checkpoint).restore(like=params)
            params = partial_restore(params, restored)
        metrics = trainer.evaluate(
            params, test_feats, attach=attach,
            dump_path=(os.path.join(args.output_dir, "test_ranks.npz")
                       if args.output_dir else None))
        logger.log(0, metrics, prefix="test/")
        print(metrics)
        return metrics

    init_params_fn = None
    if args.checkpoint:
        def init_params_fn(params):
            restored = Checkpointer(args.checkpoint).restore(like=params)
            return partial_restore(params, restored)

    state, best = trainer.fit(
        train_feats, dev_feats, attach=attach, checkpointer=ckpt,
        init_params_fn=init_params_fn,
    )
    # test with the best-hits10 checkpoint of THIS fit (main.py:157-159
    # parity — pl loads best_model_path from the current run; a stale
    # checkpoint directory from an older, differently-shaped run must not
    # be picked up)
    params = state.params
    if ckpt.saved_steps:
        params = ckpt.restore(step=ckpt.saved_steps[-1], like=params)
    test_metrics = trainer.evaluate(
        params, test_feats, attach=attach,
        dump_path=(os.path.join(args.output_dir, "test_ranks.npz")
                   if args.output_dir else None))
    logger.log(int(state.step), test_metrics, prefix="test/")
    print(test_metrics)
    if args.export_torch and args.model_class == "MKGformerKGC":
        # reference-format torch checkpoint of the best params
        # (models/export_torch.py; loadable by MarT main.py --checkpoint)
        import torch as _torch

        from ..models.export_torch import (
            state_dict_to_torch,
            unimo_params_to_reference,
        )

        sd = unimo_params_to_reference(
            jax.device_get(params),
            num_layers=model.cfg.text.num_layers,
            vocab_rows=data.vocab.vocab_size,
        )
        _torch.save({"state_dict": state_dict_to_torch(sd)}, args.export_torch)
        print(f"exported reference-format checkpoint to {args.export_torch}")
    return test_metrics


if __name__ == "__main__":
    main()
