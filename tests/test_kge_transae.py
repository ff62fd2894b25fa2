"""TransAE: PV-DM vectors, autoencoder behavior, training smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from mkg_analogy_tpu.kge.pvdm import PVDMConfig, simple_preprocess, train_pvdm
from mkg_analogy_tpu.kge.transae import IMGEncoder, TransAEConfig, TransAETransE

E, R = 15, 3


def test_simple_preprocess():
    assert simple_preprocess("Hello, World! A x22 bb") == ["hello", "world", "bb"]


def test_pvdm_learns_similarity():
    """Topic clusters should be closer within than across (averaged —
    doc2vec on tiny corpora is noisy per pair)."""
    cats = [
        "the cat sat on the mat with another cat",
        "cat and kitten play with the cat toy",
        "the kitten chased the cat around the mat",
        "a cat and a kitten nap on the mat",
    ]
    phys = [
        "quantum physics equations describe particle fields",
        "particle physics uses quantum field equations",
        "the quantum equations govern particle physics fields",
        "fields and particles obey quantum physics equations",
    ]
    cfg = PVDMConfig(vector_size=8, epochs=400, window=2, min_count=1,
                     lr=0.05, seed=0)
    vecs = train_pvdm(cats + phys, cfg)
    assert vecs.shape == (8, 8)
    v = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-9)
    sim = v @ v.T
    within = (sim[:4, :4].sum() - 4 + sim[4:, 4:].sum() - 4) / (2 * 12)
    across = sim[:4, 4:].mean()
    assert within > across, (within, across)


def _model():
    rng = np.random.default_rng(0)
    cfg = TransAEConfig(E, R, dim=16, text_dim=8, visual_dim=12,
                        visual_hidden=10)
    text = rng.standard_normal((E + 1, 8)).astype(np.float32)
    vis = rng.standard_normal((E + 1, 12)).astype(np.float32)
    model = TransAETransE(cfg, text_features=text, visual_features=vis)
    n = 10
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
    )
    return cfg, model, variables


def test_forward_and_recon_added_to_image_rows():
    cfg, model, variables = _model()
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.integers(0, E, 10))
    t = jnp.asarray(rng.integers(0, E, 10))
    r = jnp.asarray(rng.integers(0, R, 10))
    tm0 = jnp.zeros((10,), jnp.int32)
    tm1 = jnp.ones((10,), jnp.int32)
    s0 = np.asarray(model.apply(variables, h, t, r, tm0))
    s1 = np.asarray(model.apply(variables, h, t, r, tm1))
    assert s0.shape == (10,)
    assert not np.allclose(s0, s1)  # different branch + recon offset


def test_candidate_and_finetune_shapes():
    cfg, model, variables = _model()
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.integers(0, E, 4))
    r = jnp.asarray(rng.integers(0, R, 4))
    tm = jnp.asarray(rng.integers(0, 3, 4))
    for corrupt in ("tail", "head"):
        en = model.apply(variables, h, r, tm, corrupt,
                         method=TransAETransE.candidate_energies)
        assert en.shape == (4, E)
    sc = model.apply(variables, h, h, h, tm,
                     method=TransAETransE.finetune_scores)
    assert sc.shape == (4, E)


def test_pretrain_with_kge_trainer():
    from mkg_analogy_tpu.kge.sampling import NegativeSampler, TripleStore
    from mkg_analogy_tpu.kge.trainer import KGETrainConfig, KGETrainer

    cfg, model, _ = _model()
    rng = np.random.default_rng(3)
    triples = set()
    while len(triples) < 40:
        triples.add((int(rng.integers(E)), int(rng.integers(R)),
                     int(rng.integers(E))))
    arr = np.array(sorted(triples), np.int64)
    store = TripleStore(arr[:, 0], arr[:, 2], arr[:, 1], E, R)
    trainer = KGETrainer(model, KGETrainConfig(train_times=1, lr=0.1),
                         batch_size=10, neg_total=4)
    sampler = NegativeSampler(store, batch_size=10, neg_ent=4, neg_rel=0, seed=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = next(iter(sampler))
    dev = {k: jnp.asarray(batch[k]) for k in ("batch_h", "batch_t", "batch_r")}
    losses = []
    for _ in range(25):
        state, loss = trainer.pretrain_step(state, dict(dev), jax.random.PRNGKey(5))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_pvdm_vocab_ids_contiguous():
    """Regression: ids must be reindexed AFTER min_count filtering (an
    enumerate-before-filter bug produced out-of-range ids -> NaN training
    on the real corpus)."""
    from mkg_analogy_tpu.kge.pvdm import _build_vocab, simple_preprocess

    docs = [simple_preprocess(t) for t in
            ["aa bb aa cc", "bb dd ee bb", "ff aa bb"]]
    vocab = _build_vocab(docs, min_count=2)
    assert sorted(vocab.values()) == list(range(len(vocab)))
