"""Negative sampler: layout, filtering, and Bernoulli properties vs the
reference spec (DATA_/PyTorchTrainDataLoader.py)."""

import numpy as np
import pytest

from mkg_analogy_tpu.kge.sampling import NegativeSampler, TripleStore


@pytest.fixture(scope="module")
def store():
    rng = np.random.default_rng(0)
    n_ent, n_rel, n_tri = 30, 5, 200
    triples = set()
    while len(triples) < n_tri:
        triples.add(
            (int(rng.integers(n_ent)), int(rng.integers(n_rel)), int(rng.integers(n_ent)))
        )
    arr = np.array(sorted(triples), np.int64)
    return TripleStore(arr[:, 0], arr[:, 2], arr[:, 1], n_ent, n_rel)


def test_normal_batch_layout(store):
    s = NegativeSampler(store, batch_size=16, neg_ent=3, neg_rel=2, seed=1)
    batch = next(iter(s))
    cols = 1 + 3 + 2
    assert batch["batch_h"].shape == (16 * cols,)
    assert batch["mode"] == "normal"
    y = batch["batch_y"].reshape(cols, 16)
    assert (y[0] == 1).all() and (y[1:] == 0).all()
    # positive block is real training triples
    key = set(zip(store.heads.tolist(), store.tails.tolist(), store.rels.tolist()))
    h, t, r = (batch[k].reshape(cols, 16) for k in ("batch_h", "batch_t", "batch_r"))
    for i in range(16):
        assert (int(h[0, i]), int(t[0, i]), int(r[0, i])) in key


def test_negatives_are_filtered(store):
    s = NegativeSampler(store, batch_size=len(store), neg_ent=4, neg_rel=2, seed=2)
    batch = next(iter(s))
    cols = 7
    bs = len(store)
    h = batch["batch_h"].reshape(cols, bs)
    t = batch["batch_t"].reshape(cols, bs)
    r = batch["batch_r"].reshape(cols, bs)
    key = set(zip(store.heads.tolist(), store.tails.tolist(), store.rels.tolist()))
    # every negative row must NOT be a known positive
    for c in range(1, cols):
        for i in range(bs):
            trip = (int(h[c, i]), int(t[c, i]), int(r[c, i]))
            assert trip not in key, (c, i, trip)


def test_bernoulli_probability_direction():
    """A 1-to-N relation corrupts the HEAD (the safe side: only one valid
    head exists, so a random head is almost surely a true negative) — the
    TransH bern rule as Base.so executes it (tools/race_base_so.py)."""
    n_ent = 50
    heads = np.zeros(40, np.int64)  # head 0 -> many tails (1-to-N)
    tails = np.arange(1, 41, dtype=np.int64)
    rels = np.zeros(40, np.int64)
    store = TripleStore(heads, tails, rels, n_ent, 1)
    # rig_mean(hpt) = 40/40=1, lef_mean(tph) = 40/1=40
    # -> p(corrupt head) = 40/41
    assert store.lef_mean[0] / (store.rig_mean[0] + store.lef_mean[0]) > 0.95
    s = NegativeSampler(store, batch_size=40, neg_ent=10, neg_rel=0, bern=True, seed=3)
    batch = next(iter(s))
    h = batch["batch_h"].reshape(11, 40)
    t = batch["batch_t"].reshape(11, 40)
    head_corrupted = (h[1:] != h[0]).sum()
    tail_corrupted = (t[1:] != t[0]).sum()
    assert head_corrupted > tail_corrupted * 5


def test_cross_mode_alternates(store):
    s = NegativeSampler(store, batch_size=8, neg_ent=2, neg_rel=0,
                        sampling_mode="cross", seed=4)
    it = iter(s)
    b1, b2 = next(it), next(it)
    assert {b1["mode"], b2["mode"]} == {"head_batch", "tail_batch"}


def test_openke_dir_roundtrip(tmp_path, store):
    d = tmp_path / "kg"
    d.mkdir()
    (d / "entity2id.txt").write_text(
        f"{store.num_entities}\n" + "".join(f"e{i}\t{i}\n" for i in range(store.num_entities))
    )
    (d / "relation2id.txt").write_text(
        f"{store.num_relations}\n" + "".join(f"r{i}\t{i}\n" for i in range(store.num_relations))
    )
    lines = [f"{len(store)}\n"] + [
        f"{h} {t} {r}\n" for h, t, r in zip(store.heads, store.tails, store.rels)
    ]
    (d / "train2id.txt").write_text("".join(lines))
    s2 = TripleStore.from_openke_dir(str(d))
    np.testing.assert_array_equal(s2.heads, store.heads)
    np.testing.assert_array_equal(s2.tails, store.tails)
    np.testing.assert_array_equal(s2.rels, store.rels)


def test_split_store_holdout(store):
    from mkg_analogy_tpu.kge.sampling import split_store

    tr, va, te = split_store(store, 0.1, seed=3)
    n_hold = int(len(store) * 0.1)
    assert len(va) == len(te) == n_hold
    assert len(tr) == len(store) - 2 * n_hold
    # partition: every original triple lands in exactly one split
    def keyset(s):
        return {(int(h), int(t), int(r))
                for h, t, r in zip(s.heads, s.tails, s.rels)}

    all_keys = keyset(store)
    k_tr, k_va, k_te = keyset(tr), keyset(va), keyset(te)
    assert k_tr | k_va | k_te == all_keys
    assert not (k_tr & k_te) and not (k_va & k_te)
    # universes inherited (embeddings cover held-out entities)
    assert tr.num_entities == store.num_entities
    assert tr.num_relations == store.num_relations
    # deterministic under the same seed
    tr2, _, te2 = split_store(store, 0.1, seed=3)
    np.testing.assert_array_equal(tr2.heads, tr.heads)
    np.testing.assert_array_equal(te2.heads, te.heads)
