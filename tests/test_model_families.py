"""All VL model families: shared interface, shapes, analogy-mask effect,
and a trainer step each (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mkg_analogy_tpu.models.flava import FlavaConfig, FlavaForMaskedLM
from mkg_analogy_tpu.models.unimo import TextConfig
from mkg_analogy_tpu.models.vilbert import VilBertConfig, VilBertForMaskedLM
from mkg_analogy_tpu.models.vilt import ViltConfig, ViltForMaskedLM
from mkg_analogy_tpu.models.visualbert import VisualBertConfig, VisualBertForMaskedLM

B, L, V, H = 2, 16, 128, 32

TINY_TEXT = TextConfig(
    vocab_size=V, hidden_size=H, num_layers=2, num_heads=2,
    intermediate_size=64, max_position_embeddings=64,
)


def tiny_models():
    return {
        "visualbert": (
            VisualBertForMaskedLM(
                VisualBertConfig(text=TINY_TEXT, visual_embedding_dim=20,
                                 num_regions=8, dtype="float32")
            ),
            ("regions", (B, 8, 20)),
        ),
        "vilt": (
            ViltForMaskedLM(
                ViltConfig(text=TINY_TEXT, image_size=16, patch_size=8,
                           dtype="float32")
            ),
            ("pixels", (B, 2, 3, 16, 16)),
        ),
        "flava": (
            FlavaForMaskedLM(
                FlavaConfig(text=TINY_TEXT, image_size=16, patch_size=8,
                            image_layers=2, multimodal_layers=1,
                            dtype="float32")
            ),
            ("pixels", (B, 2, 3, 16, 16)),
        ),
        "vilbert": (
            VilBertForMaskedLM(
                VilBertConfig(
                    text=TINY_TEXT, v_hidden_size=24, v_num_layers=2,
                    v_num_heads=2, v_intermediate_size=48, v_feature_size=20,
                    bi_hidden_size=24, bi_num_heads=2,
                    v_biattention_id=(0, 1), t_biattention_id=(1, 2),
                    dtype="float32",
                )
            ),
            ("regions", (B, 8, 20)),
        ),
    }


def make_batch(kind, img_shape, rng):
    batch = dict(
        input_ids=jnp.asarray(rng.integers(5, V, (B, L)), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        token_type_ids=jnp.zeros((B, L), jnp.int32),
        pixel_values=jnp.asarray(rng.standard_normal(img_shape), jnp.float32),
        positions=jnp.asarray(rng.integers(0, L, (B, 5)), jnp.int32),
        boundary=jnp.asarray([6, 9], jnp.int32),
    )
    if kind == "regions":
        batch["visual_attention_mask"] = jnp.ones(img_shape[:2], jnp.float32)
    return batch


@pytest.mark.parametrize("name", ["visualbert", "vilt", "flava", "vilbert"])
def test_forward_logits_and_mask(name):
    model, (kind, img_shape) = tiny_models()[name]
    rng = np.random.default_rng(0)
    batch = make_batch(kind, img_shape, rng)
    params = model.init(jax.random.PRNGKey(0), **batch, deterministic=True)
    trans = model.apply(params, **batch, deterministic=True)
    assert trans.shape == (B, 5, H)
    logits = model.apply(params, trans[:, 0], vocab_ids=jnp.arange(10),
                         method=type(model).logits)
    assert logits.shape == (B, 10)
    assert np.isfinite(np.asarray(logits)).all()
    # boundary changes the output (adaptive analogy mask active)
    b2 = dict(batch, boundary=jnp.asarray([3, 13], jnp.int32))
    t2 = model.apply(params, **b2, deterministic=True)
    assert not np.allclose(np.asarray(trans), np.asarray(t2), atol=1e-7)
    # images affect text-position outputs (cross-modal flow)
    b3 = dict(batch, pixel_values=batch["pixel_values"] * 0.0)
    t3 = model.apply(params, **b3, deterministic=True)
    assert not np.allclose(np.asarray(trans), np.asarray(t3), atol=1e-7)


@pytest.mark.parametrize("name", ["visualbert", "vilt"])
def test_trainer_step_each_family(name):
    from mkg_analogy_tpu.core.mesh import make_mesh
    from mkg_analogy_tpu.train.trainer import MarTTrainer, TrainConfig

    model, (kind, img_shape) = tiny_models()[name]
    rng = np.random.default_rng(1)

    class _Vocab:
        analogy_entity_ids = np.arange(16, dtype=np.int32) + 40
        analogy_relation_ids = np.arange(4, dtype=np.int32) + 100
        r_token_id = 110
        entity_id_st, entity_id_ed = 40, 90
        relation_id_st, relation_id_ed = 90, 110
        padded_vocab_size = V

    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    trainer = MarTTrainer(model, _Vocab(), TrainConfig(lr=1e-3, batch_size=B),
                          mesh=mesh)
    np_batch = dict(
        input_ids=rng.integers(5, V, (B, L)).astype(np.int32),
        attention_mask=np.ones((B, L), np.int32),
        token_type_ids=np.zeros((B, L), np.int32),
        pixel_values=rng.standard_normal(img_shape).astype(np.float32),
        label=rng.integers(0, 16, (B,)).astype(np.int32),
        sep_idx=np.tile(np.array([2, 4, 6, 9, 11, 14], np.int32), (B, 1)),
        rel_idx=np.tile(np.array([3, 10], np.int32), (B, 1)),
        q_head_idx=np.ones((B,), np.int32),
        a_head_idx=np.full((B,), 7, np.int32),
        mask_idx=np.full((B,), 13, np.int32),
    )
    if kind == "regions":
        np_batch["visual_attention_mask"] = np.ones(img_shape[:2], np.float32)
    state = trainer.init_state(jax.random.PRNGKey(0), np_batch, total_steps=10)
    step = jax.jit(trainer._train_step, donate_argnums=0)
    with mesh:
        dbatch = trainer._put_batch(np_batch)
        state, metrics = step(state, dbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_registry_creates_all():
    from mkg_analogy_tpu.models.registry import available_models, create_model

    names = available_models()
    assert set(names) == {
        "MKGformerKGC", "VisualBertKGC", "VilBertKGC", "ViltKGC", "FlavaKGC",
    }
    for n in names:
        m = create_model(n, vocab_size=256)
        assert hasattr(m, "logits")


def test_flava_deep_zero_images_finite_grads():
    """Regression: 12 pre-LN image layers over an all-zero image tower must
    not explode (zero-variance LayerNorm backward scales grads by
    rsqrt(eps) per layer; zero-init CLS/pos made activations exactly zero)."""
    from mkg_analogy_tpu.models.flava import FlavaConfig, FlavaForMaskedLM

    cfg = FlavaConfig(
        text=TINY_TEXT, image_size=16, patch_size=8, image_layers=12,
        multimodal_layers=2, dtype="float32",
    )
    model = FlavaForMaskedLM(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch("pixels", (B, 2, 3, 16, 16), rng)
    batch["pixel_values"] = jnp.zeros_like(batch["pixel_values"])
    params = model.init(jax.random.PRNGKey(0), **batch, deterministic=True)

    def loss(p):
        t = model.apply(p, **batch, deterministic=True)
        return (t ** 2).sum()

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
