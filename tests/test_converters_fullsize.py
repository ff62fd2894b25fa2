"""Full-size converter key-surface round-trips, one per model family.

The tiny-config round-trips in test_torch_parity*.py can miss
size-dependent converter paths (ViLT's position-interpolation branch,
FLAVA's 393-token image-position table, the 42k-row padded vocab strip).
Here every family runs export -> import -> exact tree equality at its
DEFAULT (full) config — vocab 42,112, hidden 768, 12 layers — with the
param tree obtained structurally via jax.eval_shape (no forward compute)
and filled with per-leaf deterministic randoms so any transposition or
row-slip in the converters breaks equality.

Reference weight surface: /root/reference/MarT/main.py:82-128 (the loaded
state_dict keys these converters emit/consume).
"""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mkg_analogy_tpu.models import export_torch as ex
from mkg_analogy_tpu.models import import_torch as im
from mkg_analogy_tpu.models.flava import FlavaConfig, FlavaForMaskedLM
from mkg_analogy_tpu.models.unimo import UnimoConfig, UnimoForMaskedLM
from mkg_analogy_tpu.models.vilbert import VilBertConfig, VilBertForMaskedLM
from mkg_analogy_tpu.models.vilt import ViltConfig, ViltForMaskedLM
from mkg_analogy_tpu.models.visualbert import (
    VisualBertConfig,
    VisualBertForMaskedLM,
)

B, L = 1, 128


def _batch(kind, img_shape):
    batch = dict(
        input_ids=jnp.zeros((B, L), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        token_type_ids=jnp.zeros((B, L), jnp.int32),
        pixel_values=jnp.zeros(img_shape, jnp.float32),
        positions=jnp.zeros((B, 5), jnp.int32),
        boundary=jnp.asarray([64] * B, jnp.int32),
    )
    if kind == "regions":
        batch["visual_attention_mask"] = jnp.ones(img_shape[:2], jnp.float32)
    return batch


def _fill_params(model, batch):
    """Full-size param tree without running an init forward: eval_shape for
    the structure, per-leaf seeded randoms for the values."""
    shapes = jax.eval_shape(
        lambda rng: model.init(rng, **batch, deterministic=True),
        jax.random.PRNGKey(0),
    )

    def fill(path, s):
        seed = int.from_bytes(
            hashlib.md5(jax.tree_util.keystr(path).encode()).digest()[:4],
            "little",
        )
        rng = np.random.default_rng(seed)
        return rng.standard_normal(s.shape).astype(np.float32)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def _assert_exact(params, back):
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path)
        )


def test_unimo_fullsize_roundtrip():
    model = UnimoForMaskedLM(UnimoConfig())
    params = _fill_params(model, _batch("pixels", (B, 2, 3, 224, 224)))
    sd = ex.unimo_params_to_reference(params, num_layers=12)
    back = im.unimo_params_from_reference(sd, num_layers=12)
    _assert_exact(params, back)
    # the vocab_rows strip drops exactly the MXU padding rows
    sd_stripped = ex.unimo_params_to_reference(
        params, num_layers=12, vocab_rows=42006
    )
    assert sd_stripped["unimo.text_embeddings.word_embeddings.weight"].shape[0] == 42006


def test_visualbert_fullsize_roundtrip():
    model = VisualBertForMaskedLM(VisualBertConfig())
    params = _fill_params(model, _batch("regions", (B, 72, 2048)))
    sd = ex.visualbert_params_to_reference(params, num_layers=12)
    back = im.visualbert_params_from_reference(sd, num_layers=12)
    _assert_exact(params, back)


def test_vilt_fullsize_roundtrip():
    model = ViltForMaskedLM(ViltConfig())
    params = _fill_params(model, _batch("pixels", (B, 2, 3, 384, 384)))
    sd = ex.vilt_params_to_reference(params, num_layers=12)
    back = im.vilt_params_from_reference(sd, num_layers=12)
    _assert_exact(params, back)


def test_vilt_fullsize_position_interpolation():
    """Importing a 224-grid ViLT checkpoint into the 384-grid model walks
    the interpolation branch at full size (modeling_vilt.py:112-196)."""
    model = ViltForMaskedLM(ViltConfig())
    params = _fill_params(model, _batch("pixels", (B, 2, 3, 384, 384)))
    sd = ex.vilt_params_to_reference(params, num_layers=12)
    pos_key = "vilt.embeddings.patch_embeddings.position_embeddings"
    key = next((k for k in sd if "position_embeddings" in k and "text" not in k), None)
    assert key is not None, sorted(k for k in sd if "position" in k)
    full = sd[key]
    # shrink to a 7x7 (224/32) grid + CLS, then re-import at 12x12
    small = np.concatenate([full[:1], full[1 : 1 + 49]], axis=0)
    sd[key] = small
    back = im.vilt_params_from_reference(sd, num_layers=12, num_patches=144)
    flat = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    interp = next(
        np.asarray(v)
        for p, v in flat.items()
        if "pos" in jax.tree_util.keystr(p).lower()
        and np.asarray(v).ndim >= 2
        and np.asarray(v).shape[-2] == 145
    )
    assert np.isfinite(interp).all()


def test_flava_fullsize_roundtrip():
    model = FlavaForMaskedLM(FlavaConfig())
    cfg = FlavaConfig()
    assert cfg.image_tokens == 393  # 2 x 196 patches + CLS
    params = _fill_params(model, _batch("pixels", (B, 2, 3, 224, 224)))
    sd = ex.flava_params_to_reference(params, num_layers=12, mm_layers=6)
    back = im.flava_params_from_reference(sd, num_layers=12, mm_layers=6)
    _assert_exact(params, back)


def test_vilbert_fullsize_roundtrip():
    model = VilBertForMaskedLM(VilBertConfig())
    batch = _batch("regions", (B, 72, 2048))
    # region boxes engage loc_proj so the full reference key surface
    # (bert.v_embeddings.image_location_embeddings) is exercised
    batch["image_locs"] = jnp.zeros((B, 72, 5), jnp.float32)
    params = _fill_params(model, batch)
    sd = ex.vilbert_params_to_reference(
        params, num_layers=12, v_num_layers=6, num_connections=6
    )
    back = im.vilbert_params_from_reference(
        sd, num_layers=12, v_num_layers=6, num_connections=6
    )
    _assert_exact(params, back)
