"""KGCDataModule: feature caching, config export, iterators."""

import numpy as np
import pytest

from mkg_analogy_tpu.data.module import KGCDataModule
from tests.util import make_tiny_dataset


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("dm")
    markg_dir, mars_dir = make_tiny_dataset(str(root))
    return str(root), markg_dir, mars_dir


def test_feature_cache_roundtrip(dirs, tmp_path):
    root, markg_dir, mars_dir = dirs
    dm = KGCDataModule(
        data_dir=mars_dir, pretrain_path=markg_dir, max_seq_length=48,
        text_vocab_size=256, cache_dir=str(tmp_path / "cache"),
    )
    f1 = dm.features("dev")
    # second call must hit the npz cache and be identical
    f2 = dm.features("dev")
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k])
    # overwrite_cache regenerates
    dm.overwrite_cache = True
    f3 = dm.features("dev")
    for k in f1:
        np.testing.assert_array_equal(f1[k], f3[k])


def test_get_config_ranges(dirs, tmp_path):
    root, markg_dir, mars_dir = dirs
    dm = KGCDataModule(
        data_dir=mars_dir, pretrain_path=markg_dir, max_seq_length=48,
        text_vocab_size=256, cache_dir=str(tmp_path / "cache"),
    )
    cfg = dm.get_config()
    assert cfg["entity_id_ed"] - cfg["entity_id_st"] == dm.markg.num_entities
    assert cfg["relation_id_ed"] - cfg["relation_id_st"] == dm.markg.num_relations
    assert len(cfg["analogy_entity_ids"]) == dm.mars.num_analogy_entities
    assert cfg["vocab_size"] % 128 == 0


def test_iterator_with_zero_store(dirs, tmp_path):
    root, markg_dir, mars_dir = dirs
    dm = KGCDataModule(
        data_dir=mars_dir, pretrain_path=markg_dir, max_seq_length=48,
        text_vocab_size=256, cache_dir=str(tmp_path / "cache"), image_size=16,
    )
    it = dm.iterator("dev", batch_size=4, shuffle=False, pad_tail=True)
    batch = next(iter(it))
    assert batch["pixel_values"].shape == (4, 2, 3, 16, 16)
    assert batch["valid"].all()


def test_region_store_module(dirs, tmp_path):
    root, markg_dir, mars_dir = dirs
    dm = KGCDataModule(
        data_dir=mars_dir, pretrain_path=markg_dir, max_seq_length=48,
        text_vocab_size=256, cache_dir=str(tmp_path / "cache"),
        image_kind="regions",
    )
    it = dm.iterator("dev", batch_size=4, shuffle=False, pad_tail=True)
    batch = next(iter(it))
    assert batch["pixel_values"].shape == (4, 72, 2048)
    assert batch["visual_attention_mask"].shape == (4, 72)
    # slots with img0 >= 0 are marked attendable
    row = 0
    if batch["img0"][row] >= 0:
        assert batch["visual_attention_mask"][row, :36].all()
