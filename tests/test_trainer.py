"""End-to-end: tiny synthetic KG -> features -> sharded train/eval loop."""

import jax
import numpy as np
import pytest

from mkg_analogy_tpu.core.mesh import make_mesh
from mkg_analogy_tpu.data.batching import BatchIterator
from mkg_analogy_tpu.data.images import PixelStore
from mkg_analogy_tpu.data.prompt import build_finetune_features, build_pretrain_features
from mkg_analogy_tpu.models.unimo import UnimoForMaskedLM
from mkg_analogy_tpu.train.trainer import MarTTrainer, TrainConfig
from tests.util import build_tiny, tiny_unimo_config


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    markg, mars, vocab = build_tiny(str(tmp_path_factory.mktemp("kg")))
    store = PixelStore.random(markg.num_entities, image_size=16)
    return markg, mars, vocab, store


def make_attach(store):
    def attach(batch):
        batch = dict(batch)
        batch["pixel_values"] = store.gather(batch["img0"], batch["img1"])
        return batch

    return attach


def test_finetune_fit_and_eval(tiny):
    markg, mars, vocab, store = tiny
    model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
    cfg = TrainConfig(
        lr=1e-3, max_epochs=2, batch_size=8, eval_batch_size=8,
        alpha=0.4, log_every=1,
    )
    mesh = make_mesh(dp=8, tp=1)
    trainer = MarTTrainer(model, vocab, cfg, mesh=mesh)
    train = build_finetune_features(mars, vocab, "train", max_seq_length=48)
    dev = build_finetune_features(mars, vocab, "dev", max_seq_length=48)
    state, best = trainer.fit(train, dev, attach=make_attach(store))
    assert "Eval_entity/mrr" in best
    assert 0.0 < best["Eval_entity/mrr"] <= 1.0
    assert best["Eval_entity/hits1"] <= best["Eval_entity/hits10"] <= 1.0
    assert int(state.step) == (len(train["label"]) // 8) * 2


def test_finetune_loss_decreases(tiny):
    markg, mars, vocab, store = tiny
    model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
    cfg = TrainConfig(lr=3e-3, max_epochs=1, batch_size=8)
    mesh = make_mesh(dp=8, tp=1)
    trainer = MarTTrainer(model, vocab, cfg, mesh=mesh)
    train = build_finetune_features(mars, vocab, "train", max_seq_length=48)
    attach = make_attach(store)
    it = BatchIterator(train, 8, shuffle=False, attach=attach)
    batch = next(iter(it))
    batch.pop("valid")
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, batch, total_steps=50)
    step = jax.jit(trainer._train_step, donate_argnums=0)
    with mesh:
        dbatch = trainer._put_batch(batch)
        losses = []
        for _ in range(12):
            state, metrics = step(state, dbatch, rng)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_pretrain_fit(tiny):
    markg, mars, vocab, store = tiny
    model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
    cfg = TrainConfig(
        lr=1e-3, max_epochs=1, batch_size=8, eval_batch_size=8, pretrain=True,
    )
    mesh = make_mesh(dp=8, tp=1)
    trainer = MarTTrainer(model, vocab, cfg, mesh=mesh)
    feats = build_pretrain_features(markg, vocab, max_seq_length=48)
    state, _ = trainer.fit(feats, feats, attach=make_attach(store))
    metrics = trainer.evaluate(state.params, feats, attach=make_attach(store))
    assert "Eval_entity/mrr" in metrics
    assert "Eval_relation/mrr" in metrics


def test_tp_sharding_runs(tiny):
    """dp=2 x tp=4: decoder table sharded over tp, batch over dp."""
    markg, mars, vocab, store = tiny
    model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
    cfg = TrainConfig(lr=1e-3, max_epochs=1, batch_size=8)
    mesh = make_mesh(dp=2, tp=4)
    trainer = MarTTrainer(model, vocab, cfg, mesh=mesh)
    train = build_finetune_features(mars, vocab, "train", max_seq_length=48)
    it = BatchIterator(train, 8, shuffle=False, attach=make_attach(store))
    batch = next(iter(it))
    batch.pop("valid")
    state = trainer.init_state(jax.random.PRNGKey(0), batch, total_steps=10)
    # verify the embedding table is actually sharded over tp
    emb = state.params["params"]["word_embeddings"]
    spec = emb.sharding.spec
    assert spec[0] == "tp", spec
    step = jax.jit(trainer._train_step, donate_argnums=0)
    with mesh:
        dbatch = trainer._put_batch(batch)
        state, metrics = step(state, dbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_mixed_pretrain_fit(tiny):
    """cfg.mixed_pretrain: one epoch interleaves both diets — the step
    count must equal len(triple batches) + len(analogy batches), BOTH
    compiled programs must exist, and eval runs in the analogy geometry."""
    from mkg_analogy_tpu.data.prompt import build_pseudo_analogy_features

    markg, mars, vocab, store = tiny
    model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
    cfg = TrainConfig(lr=1e-3, max_epochs=1, batch_size=8, eval_batch_size=8,
                      pretrain=True, analogy_pretrain=True, mixed_pretrain=True)
    mesh = make_mesh(dp=8, tp=1)
    trainer = MarTTrainer(model, vocab, cfg, mesh=mesh)
    tf = build_pretrain_features(markg, vocab, max_seq_length=48)
    af = build_pseudo_analogy_features(markg, vocab, max_seq_length=48)
    attach = make_attach(store)
    state, best = trainer.fit((tf, af), af, attach=attach)
    assert "train" in trainer._jitted and "train_triple" in trainer._jitted
    expected = len(tf["label"]) // 8 + len(af["label"]) // 8
    assert int(state.step) == expected
    assert 0.0 < best["Eval_entity/mrr"] <= 1.0
    assert "Eval_relation/mrr" not in best


def test_pretrain_eval_tp_sharded_parity(tiny):
    """VERDICT r3 item 8: the all-vocab pretrain eval ranking runs as a
    tp-sharded matmul + psum instead of a replicated (B, V) logits tensor
    per dp shard. Metrics must be identical across 1-device, dp8 and
    dp2xtp4 meshes, and the dp2xtp4 eval program must actually contain the
    cross-tp reduction."""
    markg, mars, vocab, store = tiny
    feats = build_pretrain_features(markg, vocab, max_seq_length=48)
    attach = make_attach(store)

    results = {}
    for name, (dp, tp, devs) in {
        "1dev": (1, 1, jax.devices()[:1]),
        "dp8": (8, 1, None),
        "dp2tp4": (2, 4, None),
    }.items():
        model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
        mesh = make_mesh(dp=dp, tp=tp, devices=devs)
        cfg = TrainConfig(lr=1e-3, max_epochs=1, batch_size=8,
                          eval_batch_size=8, pretrain=True)
        trainer = MarTTrainer(model, vocab, cfg, mesh=mesh)
        it = BatchIterator(feats, 8, shuffle=False, attach=attach)
        batch = next(iter(it))
        batch.pop("valid")
        state = trainer.init_state(jax.random.PRNGKey(0), batch,
                                   total_steps=10)
        results[name] = trainer.evaluate(state.params, feats, attach=attach)
        if tp > 1:
            # the ranking reductions must cross tp shards on device
            with mesh:
                dbatch = trainer._put_batch(
                    {k: v for k, v in BatchIterator(
                        feats, 8, shuffle=False, attach=attach,
                        pad_tail=True).__iter__().__next__().items()})
                txt = (
                    jax.jit(trainer._eval_step)
                    .lower(state.params, dbatch)
                    .compile()
                    .as_text()
                )
            assert "all-reduce" in txt or "reduce-scatter" in txt, (
                "expected a cross-tp reduction in the sharded eval program"
            )
    base = results["1dev"]
    for name in ("dp8", "dp2tp4"):
        for k, v in base.items():
            assert abs(results[name][k] - v) < 1e-4, (name, k, results[name][k], v)


def test_single_vs_multi_device_parity(tiny):
    """SURVEY §4: one train step on a 1-device mesh, a dp8 mesh and a
    dp2xtp4 mesh must produce the same loss and (near-)identical updated
    params — GSPMD sharding is a layout choice, not a numerics choice."""
    markg, mars, vocab, store = tiny
    train = build_finetune_features(mars, vocab, "train", max_seq_length=48)
    it = BatchIterator(train, 8, shuffle=False, attach=make_attach(store))
    batch = next(iter(it))
    batch.pop("valid")

    results = {}
    for name, (dp, tp, devs) in {
        "1dev": (1, 1, jax.devices()[:1]),
        "dp8": (8, 1, None),
        "dp2tp4": (2, 4, None),
    }.items():
        model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
        mesh = make_mesh(dp=dp, tp=tp, devices=devs)
        cfg = TrainConfig(lr=1e-3, max_epochs=1, batch_size=8)
        trainer = MarTTrainer(model, vocab, cfg, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0), batch,
                                   total_steps=10)
        step = jax.jit(trainer._train_step)
        with mesh:
            dbatch = trainer._put_batch(batch)
            new_state, metrics = step(state, dbatch, jax.random.PRNGKey(1))
        flat = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
        results[name] = (
            float(jax.device_get(metrics["loss"])),
            np.concatenate([np.asarray(x).ravel() for x in flat]),
        )

    loss_1, params_1 = results["1dev"]
    for name in ("dp8", "dp2tp4"):
        loss_n, params_n = results[name]
        assert abs(loss_n - loss_1) < 1e-5, (name, loss_n, loss_1)
        np.testing.assert_allclose(params_n, params_1, rtol=2e-5, atol=2e-6,
                                   err_msg=name)
