"""UniMo model behavior tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mkg_analogy_tpu.models.unimo import UnimoForMaskedLM
from tests.util import tiny_unimo_config


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_unimo_config(vocab_size=256)
    model = UnimoForMaskedLM(cfg)
    B, L = 2, 16
    batch = dict(
        input_ids=jnp.arange(B * L).reshape(B, L) % 256,
        attention_mask=jnp.ones((B, L), jnp.int32),
        token_type_ids=jnp.zeros((B, L), jnp.int32),
        pixel_values=jax.random.normal(jax.random.PRNGKey(1), (B, 2, 3, 16, 16)),
        positions=jnp.zeros((B, 5), jnp.int32),
        boundary=jnp.array([8, 10], jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch, deterministic=True)
    return cfg, model, params, batch


def test_forward_shapes(model_and_params):
    cfg, model, params, batch = model_and_params
    trans = model.apply(params, **batch, deterministic=True)
    assert trans.shape == (2, 5, cfg.text.hidden_size)
    logits = model.apply(
        params, trans[:, 0], vocab_ids=jnp.arange(10),
        method=UnimoForMaskedLM.logits,
    )
    assert logits.shape == (2, 10)
    full = model.apply(params, trans[:, 0], method=UnimoForMaskedLM.logits)
    assert full.shape == (2, cfg.text.vocab_size)
    # slice consistency: contiguous range equals full-slice
    rng_logits = model.apply(
        params, trans[:, 0], vocab_start=5, vocab_end=15,
        method=UnimoForMaskedLM.logits,
    )
    np.testing.assert_allclose(np.asarray(rng_logits), np.asarray(full[:, 5:15]),
                               rtol=1e-5, atol=1e-5)


def test_boundary_changes_output(model_and_params):
    cfg, model, params, batch = model_and_params
    t1 = model.apply(params, **batch, deterministic=True)
    b2 = dict(batch, boundary=jnp.array([3, 14], jnp.int32))
    t2 = model.apply(params, **b2, deterministic=True)
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_no_boundary_pretrain_mode(model_and_params):
    cfg, model, params, batch = model_and_params
    b = dict(batch, boundary=None, positions=jnp.ones((2, 1), jnp.int32))
    trans = model.apply(params, **b, deterministic=True)
    assert trans.shape == (2, 1, cfg.text.hidden_size)


def test_images_affect_text_output(model_and_params):
    cfg, model, params, batch = model_and_params
    t1 = model.apply(params, **batch, deterministic=True)
    b2 = dict(batch, pixel_values=batch["pixel_values"] * 0.0)
    t2 = model.apply(params, **b2, deterministic=True)
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_padding_invariance(model_and_params):
    """Tokens beyond the attention mask must not change gathered outputs."""
    cfg, model, params, batch = model_and_params
    mask = np.ones((2, 16), np.int32)
    mask[:, 12:] = 0
    b1 = dict(batch, attention_mask=jnp.asarray(mask))
    ids2 = np.asarray(batch["input_ids"]).copy()
    ids2[:, 12:] = 7  # garbage in padded region
    b2 = dict(b1, input_ids=jnp.asarray(ids2))
    t1 = model.apply(params, **b1, deterministic=True)
    t2 = model.apply(params, **b2, deterministic=True)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=2e-5)


def test_dropout_stochastic(model_and_params):
    cfg, model, params, batch = model_and_params
    r1 = model.apply(params, **batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    r2 = model.apply(params, **batch, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(r1), np.asarray(r2))
