"""RSME ComplEx/ANALOGY: scoring parity with manual math, mode gating,
training loss decrease, filtered eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mkg_analogy_tpu.kge.rsme import (
    RSMEConfig,
    RSMEModel,
    RSMETrainConfig,
    RSMETrainer,
    assign_modes,
    build_to_skip,
    eval_both_sides,
    filtered_eval,
    reciprocal_augment,
)

E, R, RANK, IMG = 12, 3, 8, 6


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((E, IMG)).astype(np.float32)
    pd = rng.integers(0, 2, size=(2 * R,)).astype(np.float32)
    cfg = RSMEConfig(E, R, rank=RANK, img_dim=IMG, model="complex")
    model = RSMEModel(cfg, img_vec=img, rel_pd=pd)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4), jnp.int32))
    return cfg, model, variables, img, pd


def test_forward_shapes_and_mode_sensitivity(setup):
    cfg, model, variables, img, pd = setup
    x0 = jnp.asarray([[0, 1, 2, 0], [3, 2, 4, 0]], jnp.int32)
    preds, factors = model.apply(variables, x0)
    assert preds.shape == (2, E)
    assert len(factors) == 3 and factors[0].shape == (2, RANK)
    # mode changes lhs fusion -> predictions differ
    x1 = jnp.asarray([[0, 1, 2, 1], [3, 2, 4, 1]], jnp.int32)
    p1, _ = model.apply(variables, x1)
    assert not np.allclose(np.asarray(preds), np.asarray(p1))


def test_mode0_matches_pure_complex(setup):
    cfg, model, variables, img, pd = setup
    params = variables["params"]
    x = jnp.asarray([[1, 0, 3, 0]], jnp.int32)
    preds, _ = model.apply(variables, x)
    # manual: q(lhs, rel) @ fused_table.T
    ent = np.asarray(params["ent"])
    rel = np.asarray(params["rel"])
    post = np.asarray(params["post_mats"])
    img_emb = img @ post
    fused = (1 - cfg.alpha) * ent + cfg.alpha * img_emb
    l_re, l_im = ent[1, :RANK], ent[1, RANK:]
    r_re, r_im = rel[0, :RANK], rel[0, RANK:]
    q = np.concatenate([l_re * r_re - l_im * r_im, l_re * r_im + l_im * r_re])
    np.testing.assert_allclose(np.asarray(preds)[0], q @ fused.T, rtol=2e-4,
                               atol=1e-5)


def test_ranking_gate_semantics():
    """With alpha=0 the lhs fusion is a no-op, isolating the forget gate:
    mode1 = beta*mode0, mode2 = beta*mode0 + (1-beta)*cos*pd."""
    rng = np.random.default_rng(9)
    img = rng.standard_normal((E, IMG)).astype(np.float32)
    pd = np.ones((2 * R,), np.float32)
    cfg = RSMEConfig(E, R, rank=RANK, img_dim=IMG, alpha=0.0)
    model = RSMEModel(cfg, img_vec=img, rel_pd=pd)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((2, 4), jnp.int32))
    q = jnp.asarray([[1, 0, 3, 0], [1, 0, 3, 1], [1, 0, 3, 2]], jnp.int32)
    s = np.asarray(model.apply(variables, q, method=RSMEModel.ranking_scores))
    np.testing.assert_allclose(s[1], cfg.beta * s[0], rtol=1e-5, atol=1e-7)
    l = img[1] / np.linalg.norm(img[1])
    allv = img / np.linalg.norm(img, axis=1, keepdims=True)
    cos = allv @ l
    np.testing.assert_allclose(
        s[2], cfg.beta * s[0] + (1 - cfg.beta) * cos, rtol=1e-4, atol=1e-6
    )


def test_training_decreases_loss(setup):
    cfg, model, variables, img, pd = setup
    rng = np.random.default_rng(1)
    triples = np.stack(
        [rng.integers(0, E, 64), rng.integers(0, R, 64), rng.integers(0, E, 64)],
        axis=1,
    )
    modes = assign_modes(64, rng)
    data = reciprocal_augment(np.column_stack([triples, modes]), R)
    tcfg = RSMETrainConfig(lr=0.5, batch_size=32, reg_weight=1e-3,
                           max_epochs=1)
    trainer = RSMETrainer(model, tcfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    losses = []
    nprng = np.random.default_rng(2)
    for _ in range(8):
        state, loss = trainer.epoch(state, data, nprng)
        losses.append(loss)
    assert losses[-1] < losses[0], losses


def test_finetune_forward_and_training(setup):
    cfg, model, variables, img, pd = setup
    rng = np.random.default_rng(3)
    x = np.stack(
        [
            rng.integers(0, E, 16), rng.integers(0, E, 16),
            rng.integers(0, E, 16), rng.integers(0, E, 16),
            rng.integers(0, R, 16), rng.integers(0, 3, 16),
        ],
        axis=1,
    )
    preds, factors = model.apply(
        variables, jnp.asarray(x, jnp.int32), method=RSMEModel.finetune_forward
    )
    assert preds.shape == (16, E)
    trainer = RSMETrainer(model, RSMETrainConfig(lr=0.5, batch_size=8),
                          finetune=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    nprng = np.random.default_rng(4)
    losses = []
    for _ in range(8):
        state, loss = trainer.epoch(state, x, nprng)
        losses.append(loss)
    assert losses[-1] < losses[0], losses


def test_analogy_variant_adds_real_term():
    rng = np.random.default_rng(5)
    img = rng.standard_normal((E, IMG)).astype(np.float32)
    cfg = RSMEConfig(E, R, rank=RANK, img_dim=IMG, model="analogy")
    model = RSMEModel(cfg, img_vec=img)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((2, 4), jnp.int32))
    assert "ent_d" in variables["params"]
    preds, _ = model.apply(variables, jnp.asarray([[0, 1, 2, 0]], jnp.int32))
    assert preds.shape == (1, E)


def test_filtered_eval(setup):
    cfg, model, variables, img, pd = setup
    rng = np.random.default_rng(6)
    triples = np.stack(
        [rng.integers(0, E, 40), rng.integers(0, R, 40), rng.integers(0, E, 40)],
        axis=1,
    )
    modes = assign_modes(40, rng)
    data = reciprocal_augment(np.column_stack([triples, modes]), R)
    to_skip = build_to_skip(data[:, :3])
    test = data[:8]
    metrics = eval_both_sides(model, variables, test, to_skip, R)
    assert "mrr" in metrics and 0 < metrics["mrr"] <= 1
    assert metrics["hits10"] >= metrics["hits1"]


def test_filtered_beats_unfiltered(setup):
    """Filtering known positives cannot worsen the rank."""
    cfg, model, variables, img, pd = setup
    q = np.asarray([[0, 0, 1, 0]])
    to_skip_empty = {}
    to_skip_full = {(0, 0): {1, 2, 3}}
    r_nofilter = filtered_eval(model, variables, q, to_skip_empty)
    r_filter = filtered_eval(model, variables, q, to_skip_full)
    assert r_filter[0] <= r_nofilter[0]
