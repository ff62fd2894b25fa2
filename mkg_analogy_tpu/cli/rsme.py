"""RSME command-line driver (learn.py parity).

Mirrors M-KGE/RSME/learn.py:20-91 flags and the run.sh / run_finetune.sh
recipes (ComplEx rank 1000 lr 1e-2 Adagrad 300 epochs; --finetune --ckpt for
the Analogy stage):

  python -m mkg_analogy_tpu.cli.rsme --data_dir dataset/MARS \
      --pretrain_path dataset/MarKG --model ComplEx --rank 1000 \
      --learning_rate 1e-2 --max_epochs 300
  python -m mkg_analogy_tpu.cli.rsme ... --model Analogy --finetune --ckpt out/rsme
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="RSME KBC driver")
    p.add_argument("--data_dir", required=True, help="MARS dir")
    p.add_argument("--pretrain_path", required=True, help="MarKG dir")
    p.add_argument("--dataset", default="analogy")
    p.add_argument("--model", choices=["ComplEx", "Analogy", "CP"],
                   default="ComplEx")
    p.add_argument("--regularizer", choices=["N3", "F2"], default="N3")
    p.add_argument("--reg", type=float, default=0.0)
    p.add_argument("--optimizer", choices=["Adagrad", "Adam", "SGD"],
                   default="Adagrad")
    p.add_argument("--max_epochs", type=int, default=300)
    p.add_argument("--valid", type=int, default=3,
                   help="evaluate every N epochs")
    p.add_argument("--rank", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=1000)
    p.add_argument("--learning_rate", type=float, default=1e-2)
    p.add_argument("--decay1", type=float, default=0.9)
    p.add_argument("--decay2", type=float, default=0.999)
    p.add_argument("--init", type=float, default=1e-3)
    p.add_argument("--finetune", action="store_true")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--beta", type=float, default=0.5)
    p.add_argument("--no_forget_gate", action="store_true")
    p.add_argument("--remember_rate", type=int, default=100)
    p.add_argument("--img_vec", default=None, help=".npy (E, 1000) ViT store")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", default="output/rsme")
    p.add_argument("--log_dir", default="training/logs")
    p.add_argument("--eval_only", action="store_true",
                   help="skip training and evaluate the restored --ckpt "
                        "(held-out link prediction in pretrain mode, MARS "
                        "analogy ranking with --finetune); the reference "
                        "inlines eval after training (learn.py:124-150)")
    p.add_argument("--dump_ranks", default=None,
                   help="npz path for per-example analogy-eval ranks "
                        "(keys ranks/mode/tie — tools/analyze_ranks.py "
                        "layout); finetune mode only")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    print(args)
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..data.gates import build_gates
    from ..data.readers import MARS, MarKG
    from ..kge.rsme import (
        CPModel,
        RSMEConfig,
        RSMEModel,
        RSMETrainConfig,
        RSMETrainer,
        assign_modes,
        build_to_skip,
        eval_both_sides,
        reciprocal_augment,
    )
    from ..kge.trainer import mars_finetune_tuples
    from ..ops.ranking import rank_metrics, ranks_from_scores
    from ..train.checkpoint import Checkpointer
    from ..utils.logging import MetricLogger

    logger = MetricLogger(args.log_dir, name="rsme")
    markg = MarKG(args.pretrain_path)
    mars = MARS(args.data_dir, markg)
    rng = np.random.default_rng(args.seed)

    triples = np.asarray(
        [(h, r, t) for h, r, t in markg.triples_as_ids()], np.int64
    )
    modes = assign_modes(len(triples), rng)
    data4 = np.column_stack([triples[:, 0], triples[:, 1], triples[:, 2], modes])
    # 98/1/1 split of MarKG for pretrain valid/test
    perm = rng.permutation(len(data4))
    n_valid = max(1, len(data4) // 100)
    valid4 = data4[perm[:n_valid]]
    test4 = data4[perm[n_valid : 2 * n_valid]]
    train4 = data4[perm[2 * n_valid :]]
    train_aug = reciprocal_augment(train4, markg.num_relations)
    # the reciprocal-augmented (lhs, rel)->rhs map covers both directions:
    # lhs-side queries are rewritten to rhs form (swap + rel+n_rel) in
    # eval_both_sides before the lookup.
    rhs_map = build_to_skip(reciprocal_augment(data4, markg.num_relations)[:, :3])["rhs"]
    to_skip_all = {"rhs": rhs_map, "lhs": rhs_map}

    img_vec = None
    if args.img_vec and os.path.exists(args.img_vec):
        img_vec = np.load(args.img_vec)
    if img_vec is None:
        img_vec = np.zeros((markg.num_entities, 1000), np.float32)
    _, sig_alpha, rel_pd = build_gates(
        data4[:, :3], img_vec, markg.num_relations, args.remember_rate
    )
    rel_pd2 = np.vstack([rel_pd, rel_pd])  # reciprocal copy (models.py:193)

    if args.model == "CP":
        model = CPModel(markg.num_entities, markg.num_relations, args.rank,
                        args.init)
    else:
        cfg = RSMEConfig(
            markg.num_entities, markg.num_relations, rank=args.rank,
            init_size=args.init, img_dim=img_vec.shape[1], alpha=args.alpha,
            beta=args.beta, forget_gate=not args.no_forget_gate,
            model=args.model.lower(),
        )
        model = RSMEModel(cfg, img_vec=img_vec, rel_pd=rel_pd2)

    tcfg = RSMETrainConfig(
        lr=args.learning_rate, optimizer=args.optimizer.lower(),
        batch_size=args.batch_size, reg_weight=args.reg,
        regularizer=args.regularizer.lower(), max_epochs=args.max_epochs,
        seed=args.seed, decay1=args.decay1, decay2=args.decay2,
    )
    trainer = RSMETrainer(model, tcfg, finetune=args.finetune)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    ckpt = Checkpointer(os.path.join(args.output_dir, "ckpt"))
    if args.ckpt:
        restored = Checkpointer(args.ckpt).restore(like=state.params)
        state = state.replace(params=restored)

    if args.eval_only:
        assert args.ckpt, "--eval_only needs --ckpt"
    nprng = np.random.default_rng(args.seed + 1)
    if not args.finetune:
        best_mrr = 0.0
        for epoch in range(0 if args.eval_only else args.max_epochs):
            state, loss = trainer.epoch(state, train_aug, nprng)
            logger.log(int(state.step), {"loss": loss, "epoch": epoch},
                       prefix="rsme_train/")
            if (epoch + 1) % args.valid == 0:
                variables = {"params": state.params, "frozen": state.frozen}
                m = eval_both_sides(model, variables, test4, to_skip_all,
                                    markg.num_relations)
                logger.log(int(state.step), m, prefix="rsme_test/")
                if m["mrr"] > best_mrr:
                    best_mrr = m["mrr"]
                    ckpt.save(int(state.step), state.params, metrics=m)
        variables = {"params": state.params, "frozen": state.frozen}
        result = eval_both_sides(model, variables, test4, to_skip_all,
                                 markg.num_relations)
        print("TEST:", result)
        return result

    tuples = mars_finetune_tuples(mars, markg)
    if not args.eval_only:
        for epoch in range(args.max_epochs):
            state, loss = trainer.epoch(state, tuples["train"], nprng)
            logger.log(int(state.step), {"loss": loss, "epoch": epoch},
                       prefix="rsme_ft/")
        ckpt.save(int(state.step), state.params)
    variables = {"params": state.params, "frozen": state.frozen}

    import jax.numpy as jnp

    preds_fn = jax.jit(
        lambda q: model.apply(variables, q,
                              method=type(model).finetune_forward)[0]
    )
    ranks = []
    for b in range(0, len(tuples["test"]), 500):
        rows = jnp.asarray(tuples["test"][b : b + 500], jnp.int32)
        preds = preds_fn(rows)
        ranks.append(np.asarray(ranks_from_scores(preds, rows[:, 3])))
    if args.dump_ranks:
        r_all = np.concatenate(ranks)
        np.savez(args.dump_ranks, ranks=r_all,
                 mode=tuples["test"][:, 5],
                 tie=np.ones(len(r_all), dtype=np.int64))
        print(f"ranks dumped to {args.dump_ranks}")
    m = rank_metrics(jnp.asarray(np.concatenate(ranks)), ks=(1, 3, 5, 10))
    result = {k: float(v) for k, v in m.items()}
    logger.log(int(state.step), result, prefix="rsme_ft_test/")
    print("TEST_FT:", result)
    return result


if __name__ == "__main__":
    main()
