"""IKRL / TransAE command-line driver.

The reference toggles ``finetune`` / ``analogy`` booleans in source
(IKRL.py:982-983, documented in its README); here they are flags. The flow
mirrors the module bodies of IKRL.py:985-1107 and TransAE.py:

  pretrain:  Bernoulli sampler (neg 25+25, bern, filter) -> margin/softplus
             negative-sampling training -> filtered link prediction
  finetune:  Adam CE over MARS 6-tuples -> analogical reasoning metrics

Examples:
  python -m mkg_analogy_tpu.cli.ikrl --data_dir dataset/MARS \
      --pretrain_path dataset/MarKG --model transe --train_times 2000
  python -m mkg_analogy_tpu.cli.ikrl ... --finetune --ckpt out/ikrl_pt
  python -m mkg_analogy_tpu.cli.ikrl ... --transae   # TransAE variant
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="IKRL/TransAE KGE driver")
    p.add_argument("--data_dir", required=True, help="MARS dir")
    p.add_argument("--pretrain_path", required=True, help="MarKG dir")
    p.add_argument("--in_path", default=None,
                   help="existing OpenKE-format dir (else derived from MarKG)")
    p.add_argument("--model", choices=["transe", "analogy"], default="transe")
    p.add_argument("--transae", action="store_true",
                   help="use the TransAE autoencoder entity encoder")
    p.add_argument("--dim", type=int, default=None,
                   help="embedding dim (default: 400 transe / 200 analogy)")
    p.add_argument("--train_times", type=int, default=2000)
    p.add_argument("--nbatches", type=int, default=100)
    p.add_argument("--neg_ent", type=int, default=25)
    p.add_argument("--neg_rel", type=int, default=25)
    p.add_argument("--margin", type=float, default=5.0)
    p.add_argument("--alpha", type=float, default=1.0, help="pretrain lr")
    p.add_argument("--finetune", action="store_true")
    p.add_argument("--finetune_lr", type=float, default=1e-4)
    p.add_argument("--finetune_epochs", type=int, default=1000)
    p.add_argument("--finetune_bsz", type=int, default=128)
    p.add_argument("--ckpt", default=None, help="checkpoint dir to restore")
    p.add_argument("--output_dir", default="output/ikrl")
    p.add_argument("--visual_features", default=None,
                   help=".npy (E+1, 4096) VGG feature store")
    p.add_argument("--use_native_sampler", action="store_true",
                   help="sample via the C++ kgsampler library")
    p.add_argument("--task_mode", choices=["text", "random"], default="text")
    p.add_argument("--triple_classification", action="store_true",
                   help="also run triple classification after link prediction")
    p.add_argument("--holdout_frac", type=float, default=0.0,
                   help="carve this fraction each for valid/test out of the "
                        "training triples (seeded) and evaluate link "
                        "prediction on the held-out test split. The "
                        "reference has no such split: its valid2id/test2id "
                        "are byte-copies of train2id (see "
                        "kge/sampling.split_store)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_dir", default="training/logs")
    p.add_argument("--eval_only", action="store_true",
                   help="skip training and evaluate the restored --ckpt "
                        "(link prediction in pretrain mode, analogical "
                        "reasoning with --finetune). The reference has no "
                        "such entry — its eval is inlined after training "
                        "(IKRL.py:1040-1107); this makes checkpoints "
                        "re-scorable, e.g. on the host CPU")
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

    from ..data.readers import MARS, MarKG
    from ..kge.eval import analogical_reasoning, build_filters, link_prediction
    from ..kge.ikrl import IKRLConfig, create_ikrl
    from ..kge.sampling import NegativeSampler, TripleStore
    from ..kge.trainer import KGETrainConfig, KGETrainer, mars_finetune_tuples
    from ..train.checkpoint import Checkpointer
    from ..utils.logging import MetricLogger

    logger = MetricLogger(args.log_dir, name="ikrl")
    markg = MarKG(args.pretrain_path)
    mars = MARS(args.data_dir, markg)
    test_store = valid_store = None
    if args.in_path:
        store = TripleStore.from_openke_dir(args.in_path)
        for name in ("test", "valid"):
            try:
                s = TripleStore.from_openke_dir(args.in_path, split=name)
            except FileNotFoundError:
                continue
            if name == "test":
                test_store = s
            else:
                valid_store = s
    else:
        store = TripleStore.from_arrays(
            markg.triples_as_ids(), markg.num_entities, markg.num_relations
        )
    if args.holdout_frac:
        from ..kge.sampling import split_store

        store, valid_store, test_store = split_store(
            store, args.holdout_frac, seed=args.seed
        )
        print(f"holdout split: train={len(store)} valid={len(valid_store)} "
              f"test={len(test_store)}")

    visual = None
    if args.visual_features and os.path.exists(args.visual_features):
        visual = np.load(args.visual_features)

    dim = args.dim or (400 if args.model == "transe" else 200)
    if args.transae:
        from ..kge.transae import TransAEConfig, TransAETransE, build_transae_inputs

        text_feats, vis_feats = build_transae_inputs(markg, visual)
        model = TransAETransE(
            TransAEConfig(markg.num_entities, markg.num_relations, dim=dim),
            text_features=text_feats, visual_features=vis_feats,
        )
    else:
        cfg = IKRLConfig(markg.num_entities, markg.num_relations, dim=dim,
                         scorer=args.model, margin=args.margin)
        model = create_ikrl(cfg, visual)

    batch_size = len(store) // args.nbatches
    tcfg = KGETrainConfig(
        train_times=args.train_times, lr=args.alpha,
        loss="margin" if args.model == "transe" else "softplus",
        margin=args.margin,
        regul_rate=0.0 if args.model == "transe" else 1.0,
        finetune_lr=args.finetune_lr, finetune_epochs=args.finetune_epochs,
        finetune_batch_size=args.finetune_bsz, seed=args.seed,
    )
    trainer = KGETrainer(model, tcfg, batch_size,
                         neg_total=args.neg_ent + args.neg_rel)
    ckpt = Checkpointer(os.path.join(args.output_dir, "ckpt"))

    state = trainer.init_state(jax.random.PRNGKey(args.seed),
                               finetune=args.finetune)
    if args.ckpt:
        restored = Checkpointer(args.ckpt).restore(like=state.params)
        state = state.replace(params=restored)
    if args.eval_only:
        assert args.ckpt, "--eval_only needs --ckpt"

    if not args.finetune:
        if not args.eval_only:
            native = None
            if args.use_native_sampler:
                assert args.in_path, "--use_native_sampler needs --in_path"
                from ..native.api import NativeTrainLoader

                native = NativeTrainLoader(
                    args.in_path, batch_size=batch_size,
                    neg_ent=args.neg_ent, neg_rel=args.neg_rel,
                    bern_flag=True,
                )
                sampler = native
            else:
                sampler = NegativeSampler(
                    store, batch_size=batch_size, neg_ent=args.neg_ent,
                    neg_rel=args.neg_rel, bern=True, seed=args.seed,
                )
            state = trainer.pretrain(sampler, state, logger=logger)
            ckpt.save(int(state.step), state.params)

        variables = {"params": state.params, "frozen": state.frozen}
        candidate_fn = jax.jit(
            lambda h, r, tm, corrupt: model.apply(
                variables, h, r, tm, corrupt,
                method=type(model).candidate_energies,
            ),
            static_argnames="corrupt",
        )
        eval_store = test_store if test_store is not None else store
        filter_stores = [s for s in (store, valid_store, test_store)
                         if s is not None]
        metrics = link_prediction(
            candidate_fn, eval_store, build_filters(*filter_stores),
            markg.num_entities, task_mode=args.task_mode, seed=args.seed,
        )
        logger.log(int(state.step), metrics, prefix="link_prediction/")
        print({k: metrics[k] for k in ("mrr", "mr", "hit10", "hit3", "hit1")})

        if args.triple_classification:
            from ..kge.eval import triple_classification
            from ..kge.sampling import NegativeSampler as _NS

            # corrupted negatives for classification (getTestBatch parity)
            neg_sampler = _NS(store, batch_size=len(store), neg_ent=1,
                              neg_rel=0, bern=True, seed=args.seed)
            nb = neg_sampler._normal_batch(np.arange(len(store)))
            n = len(store)
            neg_store = TripleStore(
                nb["batch_h"][n : 2 * n], nb["batch_t"][n : 2 * n],
                nb["batch_r"][n : 2 * n], store.num_entities,
                store.num_relations,
            )
            score_fn = jax.jit(
                lambda h, t, r, tm: model.apply(variables, h, t, r, tm)
            )
            acc, thr = triple_classification(score_fn, store, neg_store)
            logger.log(int(state.step), {"acc": acc, "threshold": thr},
                       prefix="triple_classification/")
            print({"triple_classification_acc": acc})
        return metrics

    tuples = mars_finetune_tuples(mars, markg)
    if not args.eval_only:
        state = trainer.finetune(tuples["train"], state, logger=logger)
        ckpt.save(int(state.step), state.params)
    variables = {"params": state.params, "frozen": state.frozen}
    scores_fn = jax.jit(
        lambda eh, et, q, tm: model.apply(
            variables, eh, et, q, tm, method=type(model).finetune_scores
        )
    )
    metrics, ranks = analogical_reasoning(scores_fn, tuples["test"],
                                          return_ranks=True)
    if args.dump_ranks:
        np.savez(args.dump_ranks, ranks=ranks,
                 mode=tuples["test"][:, 5],
                 tie=np.ones(len(ranks), dtype=np.int64))
        print(f"ranks dumped to {args.dump_ranks}")
    logger.log(int(state.step), metrics, prefix="analogy/")
    print(metrics)
    return metrics


if __name__ == "__main__":
    main()
