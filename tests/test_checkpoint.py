"""Checkpointing: save/restore roundtrip + pretrain->finetune transfer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mkg_analogy_tpu.core.mesh import make_mesh
from mkg_analogy_tpu.data.images import PixelStore
from mkg_analogy_tpu.data.prompt import build_finetune_features, build_pretrain_features
from mkg_analogy_tpu.models.unimo import UnimoForMaskedLM
from mkg_analogy_tpu.train.checkpoint import Checkpointer, partial_restore
from mkg_analogy_tpu.train.trainer import MarTTrainer, TrainConfig
from tests.util import build_tiny, tiny_unimo_config


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    markg, mars, vocab = build_tiny(str(tmp_path_factory.mktemp("kg")))
    store = PixelStore.random(markg.num_entities, image_size=16)
    return markg, mars, vocab, store


def attach_of(store):
    def attach(batch):
        batch = dict(batch)
        batch["pixel_values"] = store.gather(batch["img0"], batch["img1"])
        return batch

    return attach


def test_save_restore_roundtrip(tmp_path, tiny):
    markg, mars, vocab, store = tiny
    model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
    mesh = make_mesh(dp=8, tp=1)
    trainer = MarTTrainer(model, vocab, TrainConfig(batch_size=8), mesh=mesh)
    feats = build_finetune_features(mars, vocab, "train", max_seq_length=48)
    from mkg_analogy_tpu.data.batching import BatchIterator

    batch = next(iter(BatchIterator(feats, 8, attach=attach_of(store))))
    batch.pop("valid")
    state = trainer.init_state(jax.random.PRNGKey(0), batch, total_steps=5)

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(1, state.params, metrics={"Eval_entity/mrr": 0.5})
    restored = Checkpointer(str(tmp_path / "ckpt")).restore(like=state.params)
    orig = jax.tree_util.tree_leaves(state.params)
    rest = jax.tree_util.tree_leaves(restored)
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrain_to_finetune_transfer(tmp_path, tiny):
    """Pretrain a few steps, checkpoint, restore into a finetune run
    (main.py:133-134 strict=False parity); the vocabulary is full-size from
    the start so no embedding surgery is needed."""
    markg, mars, vocab, store = tiny
    model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
    mesh = make_mesh(dp=8, tp=1)

    pre_cfg = TrainConfig(batch_size=8, max_epochs=1, pretrain=True, lr=1e-3)
    pre_trainer = MarTTrainer(model, vocab, pre_cfg, mesh=mesh)
    pre_feats = build_pretrain_features(markg, vocab, max_seq_length=48)
    state, _ = pre_trainer.fit(pre_feats, pre_feats, attach=attach_of(store))
    ckpt = Checkpointer(str(tmp_path / "pre"))
    ckpt.save(int(state.step), state.params)
    pretrained_word = np.asarray(state.params["params"]["word_embeddings"])

    ft_cfg = TrainConfig(batch_size=8, max_epochs=1, lr=1e-3)
    ft_trainer = MarTTrainer(model, vocab, ft_cfg, mesh=mesh)
    ft_feats = build_finetune_features(mars, vocab, "train", max_seq_length=48)

    captured = {}

    def init_params_fn(params):
        restored = Checkpointer(str(tmp_path / "pre")).restore(like=params)
        merged = partial_restore(params, restored)
        captured["word"] = np.asarray(merged["params"]["word_embeddings"])
        return merged

    state2, best = ft_trainer.fit(
        ft_feats, ft_feats, attach=attach_of(store),
        init_params_fn=init_params_fn,
    )
    # the restored finetune start weights are the pretrained ones
    np.testing.assert_array_equal(captured["word"], pretrained_word)
    assert "Eval_entity/mrr" in best


def test_partial_restore_shape_mismatch():
    cur = {"a": np.zeros((4, 4)), "b": np.ones((2,))}
    res = {"a": np.full((4, 4), 7.0), "b": np.ones((3,))}  # b mismatched
    merged = partial_restore(cur, res)
    np.testing.assert_array_equal(merged["a"], res["a"])
    np.testing.assert_array_equal(merged["b"], cur["b"])


def test_async_save_snapshots_before_donation(tmp_path):
    """save() returns before the write lands; the enqueued values must be
    the ones at call time even if the caller's buffers are then donated
    into a jitted update (the training loop does exactly this)."""
    params = {"w": jnp.arange(8.0)}

    @jax.jit
    def bump(p):
        return {"w": p["w"] + 1.0}

    bump_donating = jax.jit(lambda p: {"w": p["w"] * 0.0}, donate_argnums=0)

    ckpt = Checkpointer(str(tmp_path / "async"))
    ckpt.save(1, params)
    params = bump_donating(params)  # invalidates the original buffers
    ckpt.flush()
    restored = Checkpointer(str(tmp_path / "async")).restore(
        like={"w": jnp.zeros(8)}
    )
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(8.0))


def test_async_save_error_surfaces(tmp_path):
    """A failing background save must raise on the next flush/save, not
    vanish."""
    ckpt = Checkpointer(str(tmp_path / "err"))

    class Bad:
        """Not a saveable tree leaf."""

    ckpt.save(1, {"w": Bad()})
    with pytest.raises(BaseException):
        ckpt.flush()


def test_save_overwrites_stale_step(tmp_path):
    """A reused output_dir can hold the SAME step number from an earlier,
    differently-shaped run. orbax silently SKIPS such a save; the worker
    must overwrite instead (pl.ModelCheckpoint overwrite-by-name
    semantics — found driving the CLI against a reused output_dir)."""
    import jax.numpy as jnp

    from mkg_analogy_tpu.train.checkpoint import Checkpointer

    d = str(tmp_path / "ckpt")
    old = {"params": {"old_layer": jnp.ones((3,))}}
    c1 = Checkpointer(d)
    c1.save(3, old)
    c1.close()

    new_tree = {"params": {"brand_new": jnp.full((5,), 2.0)}}
    c2 = Checkpointer(d)
    c2.save(3, new_tree)
    c2.flush()
    assert c2.saved_steps == [3]
    restored = c2.restore(step=3, like=new_tree)
    assert "brand_new" in restored["params"]
    import numpy as np
    np.testing.assert_array_equal(np.asarray(restored["params"]["brand_new"]),
                                  np.full((5,), 2.0, np.float32))
    c2.close()


def test_save_overwrites_stale_later_step(tmp_path):
    """A reused output_dir whose previous run saved a LATER step (e.g. best
    at step 300, new shorter run's first save at step 80): orbax's default
    should_save refuses step <= latest, which surfaced as a RuntimeError on
    the next flush. Stale higher steps must be deleted and the save land."""
    import jax.numpy as jnp
    import numpy as np

    from mkg_analogy_tpu.train.checkpoint import Checkpointer

    d = str(tmp_path / "ckpt")
    c1 = Checkpointer(d)
    c1.save(300, {"params": {"w": jnp.ones((3,))}})
    c1.close()

    tree = {"params": {"w": jnp.full((3,), 7.0)}}
    c2 = Checkpointer(d)
    c2.save(80, tree)
    c2.flush()
    assert c2.saved_steps == [80]
    restored = c2.restore(step=80, like=tree)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.full((3,), 7.0, np.float32))
    # the stale higher step is gone: latest is this fit's save
    assert c2.latest_step() == 80
    c2.close()
