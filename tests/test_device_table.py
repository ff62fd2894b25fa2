"""Device-resident image tables: gather-by-index must equal host gather."""

import jax
import numpy as np
import pytest

from mkg_analogy_tpu.core.mesh import make_mesh
from mkg_analogy_tpu.data.images import PixelStore, RegionStore
from mkg_analogy_tpu.data.prompt import build_finetune_features
from mkg_analogy_tpu.models.unimo import UnimoForMaskedLM
from mkg_analogy_tpu.train.trainer import MarTTrainer, TrainConfig
from tests.util import build_tiny, tiny_unimo_config


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return build_tiny(str(tmp_path_factory.mktemp("kg")))


def test_pixel_table_matches_host_gather(tiny):
    markg, mars, vocab = tiny
    store = PixelStore.random(markg.num_entities, image_size=16)
    model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    trainer = MarTTrainer(model, vocab, TrainConfig(batch_size=4), mesh=mesh)
    table = np.concatenate(
        [store.features, np.zeros((1, 3, 16, 16), np.float32)], axis=0
    )
    trainer.set_image_table(table, kind="pixels")

    feats = build_finetune_features(mars, vocab, "dev", max_seq_length=48)
    batch = {k: v[:6] for k, v in feats.items()}
    import jax.numpy as jnp

    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    gathered, vam = trainer._gather_images(dev_batch, trainer.image_table)
    assert vam is None
    host = store.gather(batch["img0"], batch["img1"])
    np.testing.assert_allclose(
        np.asarray(gathered, np.float32), host, atol=0.01  # bf16 table
    )


def test_region_table_matches_host_gather(tiny):
    markg, mars, vocab = tiny
    store = RegionStore.random(markg.num_entities)
    model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    trainer = MarTTrainer(model, vocab, TrainConfig(batch_size=4), mesh=mesh)
    table = np.concatenate(
        [store.features, np.zeros((1, 36, 2048), np.float32)], axis=0
    )
    trainer.set_image_table(table, kind="regions")

    feats = build_finetune_features(mars, vocab, "dev", max_seq_length=48)
    batch = {k: v[:6] for k, v in feats.items()}
    import jax.numpy as jnp

    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    gathered, vam = trainer._gather_images(dev_batch, trainer.image_table)
    host_feats, host_mask = store.gather(batch["img0"], batch["img1"])
    np.testing.assert_allclose(np.asarray(gathered, np.float32), host_feats,
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(vam), host_mask)


def test_one_row_zero_table(tiny):
    """ZeroPixelStore collapses to a 1-row table; every index maps to it."""
    markg, mars, vocab = tiny
    model = UnimoForMaskedLM(tiny_unimo_config(vocab.padded_vocab_size))
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    trainer = MarTTrainer(model, vocab, TrainConfig(batch_size=4), mesh=mesh)
    trainer.set_image_table(np.zeros((1, 3, 16, 16), np.float32))
    import jax.numpy as jnp

    batch = dict(img0=jnp.asarray([0, 5, -1]), img1=jnp.asarray([-1, 3, 2]))
    gathered, _ = trainer._gather_images(batch, trainer.image_table)
    assert gathered.shape == (3, 2, 3, 16, 16)
    assert float(jnp.abs(gathered).sum()) == 0.0
