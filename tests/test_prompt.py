"""Prompt/feature construction on the synthetic tiny KG."""

import numpy as np
import pytest

from mkg_analogy_tpu.data.prompt import (
    build_finetune_features,
    build_pretrain_features,
    truncate_longest_first,
)
from tests.util import build_tiny


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return build_tiny(str(tmp_path_factory.mktemp("kg")))


def test_truncate_longest_first():
    a, b = list(range(10)), list(range(4))
    truncate_longest_first(a, b, 8)
    assert len(a) + len(b) == 8
    assert len(a) == 4 and len(b) == 4  # removed from the longer first
    a, b = [1, 2], [3, 4, 5, 6, 7, 8]
    truncate_longest_first(a, b, 5)
    assert a == [1, 2] and b == [3, 4, 5]
    a = list(range(10))
    truncate_longest_first(a, None, 4)
    assert a == [0, 1, 2, 3]


def test_finetune_features_structure(tiny):
    markg, mars, vocab = tiny
    feats = build_finetune_features(mars, vocab, "dev", max_seq_length=64)
    n = len(mars.split("dev"))
    assert feats["input_ids"].shape == (n, 64)
    assert feats["sep_idx"].shape == (n, 6)
    assert feats["rel_idx"].shape == (n, 2)
    ids = feats["input_ids"]
    # CLS first, exactly one MASK, q_head at position 1
    assert (ids[:, 0] == vocab.cls_id).all()
    assert ((ids == vocab.mask_id).sum(axis=1) == 1).all()
    assert (feats["q_head_idx"] == 1).all()
    # mask position recorded correctly
    for i in range(n):
        assert ids[i, feats["mask_idx"][i]] == vocab.mask_id
        # the two [R] slots
        assert (ids[i, feats["rel_idx"][i]] == vocab.r_token_id).all()
        # sep positions hold [SEP]
        assert (ids[i, feats["sep_idx"][i]] == vocab.sep_id).all()
        # entity tokens at recorded head positions
        assert vocab.entity_id_st <= ids[i, feats["q_head_idx"][i]] < vocab.entity_id_ed
        assert vocab.entity_id_st <= ids[i, feats["a_head_idx"][i]] < vocab.entity_id_ed
    # labels inside analogy answer space
    assert (feats["label"] >= 0).all()
    assert (feats["label"] < mars.num_analogy_entities).all()


def test_finetune_mode_image_slots(tiny):
    markg, mars, vocab = tiny
    feats = build_finetune_features(mars, vocab, "dev", max_seq_length=64)
    for i, ex in enumerate(mars.split("dev")):
        if ex.mode == 0:  # question image only
            assert feats["img0"][i] == markg.ent2id[ex.question]
            assert feats["img1"][i] == -1
        elif ex.mode == 1:
            assert feats["img0"][i] == markg.ent2id[ex.head]
            assert feats["img1"][i] == markg.ent2id[ex.tail]
        else:
            assert feats["img0"][i] == markg.ent2id[ex.head]
            assert feats["img1"][i] == markg.ent2id[ex.question]


def test_pretrain_features(tiny):
    markg, mars, vocab = tiny
    feats = build_pretrain_features(markg, vocab, max_seq_length=64, seed=1)
    n = feats["input_ids"].shape[0]
    assert n == 2 * len(markg.triples_as_ids())
    # alternating pre_type 1/2
    assert set(np.unique(feats["pre_type"])) == {1, 2}
    ids = feats["input_ids"]
    assert ((ids == vocab.mask_id).sum(axis=1) == 1).all()
    # labels: entity rows in entity space, relation rows in relation space
    is_rel = feats["pre_type"] == 2
    assert (feats["label"][~is_rel] < markg.num_entities).all()
    assert (feats["label"][is_rel] < markg.num_relations).all()
    # pre_type=1 rows contain a relation token; pre_type=2 rows do not
    rel_tok_present = (
        (ids >= vocab.relation_id_st) & (ids < vocab.relation_id_ed)
    ).any(axis=1)
    assert rel_tok_present[~is_rel].all()
    assert not rel_tok_present[is_rel].any()


def test_batch_iterator_determinism_and_pad_tail(tiny):
    from mkg_analogy_tpu.data.batching import BatchIterator

    markg, mars, vocab = tiny
    feats = build_finetune_features(mars, vocab, "dev", max_seq_length=64)
    it1 = BatchIterator(feats, 4, shuffle=True, seed=3)
    it2 = BatchIterator(feats, 4, shuffle=True, seed=3)
    b1, b2 = next(iter(it1)), next(iter(it2))
    np.testing.assert_array_equal(b1["input_ids"], b2["input_ids"])

    n = len(feats["label"])
    itp = BatchIterator(feats, 4, shuffle=False, pad_tail=True)
    batches = list(itp)
    assert len(batches) == (n + 3) // 4
    total_valid = sum(int(b["valid"].sum()) for b in batches)
    assert total_valid == n
    for b in batches:
        assert b["input_ids"].shape[0] == 4  # static shape incl. tail


def test_pseudo_analogy_features(tiny):
    """Pseudo-analogy pretraining (TPU-native addition): fine-tune prompt
    geometry with global-entity labels, pairs drawn within each relation."""
    from mkg_analogy_tpu.data.prompt import build_pseudo_analogy_features

    markg, mars, vocab = tiny
    feats = build_pseudo_analogy_features(markg, vocab, max_seq_length=64,
                                          seed=3, partners_per_triple=2)
    n = feats["input_ids"].shape[0]
    assert n > 0
    ids = feats["input_ids"]
    # fine-tune geometry: exactly one [MASK], six [SEP]s, two [R]s
    assert ((ids == vocab.mask_id).sum(axis=1) == 1).all()
    assert feats["sep_idx"].shape == (n, 2 * 3)
    assert feats["rel_idx"].shape == (n, 2)
    # labels are GLOBAL entity ids (not analogy-entity indices)
    assert (feats["label"] >= 0).all()
    assert (feats["label"] < markg.num_entities).all()
    # the boundary used by the adaptive mask is the third [SEP]
    b = np.arange(n)
    assert (ids[b, feats["sep_idx"][:, 2]] == vocab.sep_id).all()
    # both [R] positions hold the [R] token
    assert (ids[b, feats["rel_idx"][:, 0]] == vocab.r_token_id).all()
    assert (ids[b, feats["rel_idx"][:, 1]] == vocab.r_token_id).all()
    # every example's question head differs from the example head
    qh = ids[b, feats["q_head_idx"]]
    ah = ids[b, feats["a_head_idx"]]
    assert (qh != ah).all()
    # modes follow the 0/1/2 scheme with all three present
    assert set(np.unique(feats["mode"])) <= {0, 1, 2}
