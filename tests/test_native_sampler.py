"""C++ kgsampler vs the Python spec: layout, filtering, Bernoulli, and
filtered link-prediction metric parity."""

import numpy as np
import pytest

from mkg_analogy_tpu.kge.eval import build_filters, link_prediction
from mkg_analogy_tpu.kge.sampling import TripleStore
from mkg_analogy_tpu.native.api import KGSamplerLib, NativeTestLoader, NativeTrainLoader

N_ENT, N_REL = 25, 4


def write_openke_dir(root, train, test=None, valid=None):
    root.mkdir(parents=True, exist_ok=True)
    (root / "entity2id.txt").write_text(
        f"{N_ENT}\n" + "".join(f"e{i}\t{i}\n" for i in range(N_ENT))
    )
    (root / "relation2id.txt").write_text(
        f"{N_REL}\n" + "".join(f"r{i}\t{i}\n" for i in range(N_REL))
    )

    def write_triples(name, rows):
        (root / name).write_text(
            f"{len(rows)}\n" + "".join(f"{h} {t} {r}\n" for h, t, r in rows)
        )

    write_triples("train2id.txt", train)
    if test is not None:
        write_triples("test2id.txt", test)
    if valid is not None:
        write_triples("valid2id.txt", valid)


@pytest.fixture(scope="module")
def kg_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    triples = set()
    while len(triples) < 120:
        triples.add((int(rng.integers(N_ENT)), int(rng.integers(N_ENT)),
                     int(rng.integers(N_REL))))
    rows = sorted(triples)
    train, test, valid = rows[:90], rows[90:110], rows[110:]
    d = tmp_path_factory.mktemp("openke")
    write_openke_dir(d, train, test, valid)
    return d, train, test, valid


def test_native_normal_batch(kg_dir):
    d, train, *_ = kg_dir
    loader = NativeTrainLoader(str(d), batch_size=16, neg_ent=4, neg_rel=2,
                               bern_flag=True, threads=4)
    assert loader.ent_total == N_ENT and loader.rel_total == N_REL
    batch = loader.sample_normal()
    cols = 7
    h = batch["batch_h"].reshape(cols, 16)
    t = batch["batch_t"].reshape(cols, 16)
    r = batch["batch_r"].reshape(cols, 16)
    y = batch["batch_y"].reshape(cols, 16)
    assert (y[0] == 1).all() and (y[1:] == 0).all()
    key = {(hh, tt, rr) for hh, tt, rr in train}
    for i in range(16):
        assert (int(h[0, i]), int(t[0, i]), int(r[0, i])) in key
    # all entity-negatives filtered
    for c in range(1, 5):
        for i in range(16):
            assert (int(h[c, i]), int(t[c, i]), int(r[c, i])) not in key
    # relation negatives in relation range and filtered
    for c in range(5, 7):
        assert (r[c] < N_REL).all()
        for i in range(16):
            assert (int(h[c, i]), int(t[c, i]), int(r[c, i])) not in key


def test_native_cross_mode(kg_dir):
    d, *_ = kg_dir
    loader = NativeTrainLoader(str(d), batch_size=8, neg_ent=3, neg_rel=0,
                               sampling_mode="cross")
    it = iter(loader)
    b1, b2 = next(it), next(it)
    assert {b1["mode"], b2["mode"]} == {"head_batch", "tail_batch"}
    assert b1["batch_t"].shape == (8,) if b1["mode"] == "head_batch" else (32,)


def test_native_link_prediction_perfect_model(kg_dir):
    """An oracle scorer (gold gets energy 0) must give MRR == 1."""
    d, train, test, valid = kg_dir
    loader = NativeTestLoader(str(d))

    # oracle: energy 0 at the gold entity, 1 elsewhere
    calls = {"n": 0}

    def oracle(bh, bt, br, mode):
        h, t, r = test[calls["n"] // 2]
        calls["n"] += 1
        scores = np.ones(N_ENT, np.float32)
        scores[h if mode == "head_batch" else t] = 0.0
        return scores

    m = loader.run_link_prediction(oracle)
    assert m["mrr"] == pytest.approx(1.0)
    assert m["hit1"] == pytest.approx(1.0)
    assert m["mr"] == pytest.approx(1.0)


def test_native_metrics_match_python_eval(kg_dir):
    """Deterministic energies -> identical filtered metrics from the C++
    accumulator and the Python/JAX link_prediction path."""
    d, train, test, valid = kg_dir
    rng = np.random.default_rng(7)
    # random but fixed energy table: E[h, r, t] via hashed projection
    table = rng.standard_normal((N_ENT, N_REL, N_ENT)).astype(np.float32)

    loader = NativeTestLoader(str(d))
    state = {"i": 0}

    def score_fn(bh, bt, br, mode):
        h, t, r = test[state["i"]]
        if mode == "head_batch":
            return np.ascontiguousarray(table[:, r, t])
        out = np.ascontiguousarray(table[h, r, :])
        state["i"] += 1
        return out

    native = loader.run_link_prediction(score_fn)

    def to_store(rows):
        a = np.array(rows, np.int64)
        return TripleStore(a[:, 0], a[:, 1], a[:, 2], N_ENT, N_REL)

    tr_s, te_s, va_s = to_store(train), to_store(test), to_store(valid)
    filters = build_filters(tr_s, te_s, va_s)

    def candidate_fn(hx, rx, tm, corrupt):
        hx, rx = np.asarray(hx), np.asarray(rx)
        if corrupt == "tail":
            return np.stack([table[h, r, :] for h, r in zip(hx, rx)])
        return np.stack([table[:, r, t] for t, r in zip(hx, rx)])

    py = link_prediction(candidate_fn, te_s, filters, N_ENT, batch_size=8)
    for k in ("mrr", "mr", "hit10", "hit3", "hit1"):
        assert py[k] == pytest.approx(native[k], abs=1e-4), k


def test_native_bernoulli_direction(tmp_path):
    """1-to-N relation corrupts HEADS (the safe side) under bern — the
    direction the reference's executed Base.so uses (verified in
    tools/race_base_so.py; the repo's Python fallback spec flips it)."""
    train = [(0, t, 0) for t in range(1, 21)]
    d = tmp_path / "bern"
    write_openke_dir(d, train)
    loader = NativeTrainLoader(str(d), batch_size=20, neg_ent=10, neg_rel=0,
                               bern_flag=True, threads=1)
    batch = loader.sample_normal()
    h = batch["batch_h"].reshape(11, 20)
    t = batch["batch_t"].reshape(11, 20)
    # rig_mean(hpt)=1, lef_mean(tph)=20 -> p(corrupt head) = 20/21
    head_corrupted = (h[1:] != h[0]).sum()
    tail_corrupted = (t[1:] != t[0]).sum()
    assert head_corrupted > tail_corrupted * 5


def test_classification_batch(kg_dir):
    d, train, test, valid = kg_dir
    loader = NativeTestLoader(str(d))
    pos, neg = loader.classification_batch()
    key = {(h, t, r) for h, t, r in train}
    test_set = {(h, t, r) for h, t, r in test}
    for i in range(len(test)):
        assert (int(pos[0][i]), int(pos[1][i]), int(pos[2][i])) in test_set
        assert (int(neg[0][i]), int(neg[1][i]), int(neg[2][i])) not in key


def test_persistent_pool_resize_and_reuse(kg_dir):
    """Repeated sampling calls reuse parked pool workers; changing the
    thread count mid-stream rebuilds the pool without losing correctness
    (ADVICE r1: the pool must actually persist)."""
    d, train, *_ = kg_dir
    key = {(hh, tt, rr) for hh, tt, rr in train}
    for threads in (8, 3, 8):
        loader = NativeTrainLoader(str(d), batch_size=16, neg_ent=3,
                                   neg_rel=3, bern_flag=True, threads=threads)
        for _ in range(30):
            batch = loader.sample_normal()
        y = batch["batch_y"].reshape(7, 16)
        h = batch["batch_h"].reshape(7, 16)
        t = batch["batch_t"].reshape(7, 16)
        r = batch["batch_r"].reshape(7, 16)
        assert (y[0] == 1).all() and (y[1:] == 0).all()
        assert h.max() < N_ENT and r.max() < N_REL
        for i in range(16):
            assert (int(h[0, i]), int(t[0, i]), int(r[0, i])) in key


def test_pool_resize_does_not_touch_previous_buffers(kg_dir):
    """ADVICE r2 (medium): respawned pool workers must not re-execute the
    stale job. Before the fix, resize() preserved the pool-level generation
    counter while new workers started at seen=0, so their wait predicate was
    instantly true and they re-ran the previous loader's SampleJob — writing
    through that loader's (possibly freed) numpy buffers. Observable effect:
    the old loader's arrays change during the new loader's first sampling
    call. kgsampler.cpp resize() now resets generation/active/remaining."""
    import time

    d, train, *_ = kg_dir
    a = NativeTrainLoader(str(d), batch_size=16, neg_ent=3, neg_rel=3,
                          bern_flag=True, threads=8)
    for _ in range(3):
        a.sample_normal()
    snap = {k: a.__dict__[k].copy()
            for k in ("batch_h", "batch_t", "batch_r", "batch_y")}
    # different thread count -> stop() + respawn inside the next sampling
    b = NativeTrainLoader(str(d), batch_size=16, neg_ent=3, neg_rel=3,
                          bern_flag=True, threads=5)
    for _ in range(5):
        b.sample_normal()
    time.sleep(0.05)  # give any rogue stale-job writers time to land
    for k, v in snap.items():
        np.testing.assert_array_equal(a.__dict__[k], v)
