"""Activation parity for the four non-flagship families: reference torch
models (tiny config, random weights, eval mode) vs our Flax models, weights
mapped by models/import_torch.py converters.

Covers VisualBERT (modeling_visual_bert.py), ViLT (modeling_vilt.py),
FLAVA (modeling_flava.py), ViLBERT (vilbert.py). The single-stream models
run with ``compat_ref_mask_offset=True`` so the reference's shifted
adaptive-mask geometry (modeling_visual_bert.py:864-866,
modeling_vilt.py:843-844) is exercised bit-for-bit; the corrected default
geometry is covered by tests/test_masks.py.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/MarT"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference checkout not available", allow_module_level=True)

ATOL = 3e-4


def load_ref_module(name, filename):
    """Load a reference modeling file by path, shimming HF-era moved
    symbols (the reference targets transformers 4.11)."""
    import transformers.modeling_utils as _mu
    import transformers.pytorch_utils as _pu
    import transformers.utils as _tu

    for attr in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(_mu, attr) and hasattr(_pu, attr):
            setattr(_mu, attr, getattr(_pu, attr))
    if not hasattr(_tu, "doc"):
        doc = types.ModuleType("transformers.utils.doc")

        def add_code_sample_docstrings(*a, **k):
            def deco(fn):
                return fn

            return deco

        doc.add_code_sample_docstrings = add_code_sample_docstrings
        _tu.doc = doc
        sys.modules["transformers.utils.doc"] = doc
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, "models", filename)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def tiny_text_cfg(num_layers=3):
    from mkg_analogy_tpu.models.unimo import TextConfig

    return TextConfig(
        vocab_size=128, hidden_size=32, num_layers=num_layers, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0,
    )


def text_inputs(rng, B=2, L=12, pad_from=10):
    input_ids = rng.integers(1, 128, (B, L)).astype(np.int64)
    attention_mask = np.ones((B, L), np.int64)
    attention_mask[:, pad_from:] = 0
    token_type_ids = np.zeros((B, L), np.int64)
    sep_idx = np.tile(np.array([2, 4, 6, 8, 9, 11]), (B, 1))
    return input_ids, attention_mask, token_type_ids, sep_idx


def run_flax(model, params, input_ids, attention_mask, token_type_ids,
             pixel_values, sep_idx, **extra):
    import jax.numpy as jnp

    B, L = input_ids.shape
    positions = jnp.asarray(np.tile(np.arange(L), (B, 1)))
    trans = model.apply(
        params,
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.asarray(attention_mask),
        token_type_ids=jnp.asarray(token_type_ids),
        pixel_values=jnp.asarray(pixel_values),
        positions=positions,
        boundary=jnp.asarray(sep_idx[:, 2]),
        deterministic=True,
        **extra,
    )
    logits = model.apply(params, trans, method=type(model).logits)
    return np.asarray(trans), np.asarray(logits)


# ---------------------------------------------------------------- VisualBERT

def test_visualbert_parity():
    from transformers.models.visual_bert import VisualBertConfig as HFCfg

    vb = load_ref_module("ref_visual_bert", "modeling_visual_bert.py")
    torch.manual_seed(0)
    ref = vb.VisualBertForMaskedLM(
        HFCfg(vocab_size=128, hidden_size=32, num_hidden_layers=3,
              num_attention_heads=2, intermediate_size=64,
              visual_embedding_dim=16, max_position_embeddings=64,
              hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    )
    ref.eval()

    from mkg_analogy_tpu.models.import_torch import visualbert_params_from_reference
    from mkg_analogy_tpu.models.visualbert import (
        VisualBertConfig,
        VisualBertForMaskedLM,
    )

    model = VisualBertForMaskedLM(
        VisualBertConfig(text=tiny_text_cfg(3), visual_embedding_dim=16,
                         num_regions=5, dtype="float32",
                         compat_ref_mask_offset=True)
    )
    params = visualbert_params_from_reference(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=3,
    )

    rng = np.random.default_rng(0)
    input_ids, attention_mask, token_type_ids, sep_idx = text_inputs(rng)
    visual = rng.standard_normal((2, 5, 16)).astype(np.float32)
    vmask = np.ones((2, 5), np.int64)
    vmask[:, 4:] = 0

    with torch.no_grad():
        out, trans = ref(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(attention_mask),
            token_type_ids=torch.from_numpy(token_type_ids),
            pixel_values=torch.from_numpy(visual),
            visual_attention_mask=torch.from_numpy(vmask),
            sep_idx=torch.from_numpy(sep_idx.copy()),
            return_dict=True,
        )
    import jax.numpy as jnp

    flax_trans, flax_logits = run_flax(
        model, params, input_ids, attention_mask, token_type_ids, visual,
        sep_idx, visual_attention_mask=jnp.asarray(vmask),
    )
    np.testing.assert_allclose(flax_trans, trans.numpy()[:, :12], atol=ATOL)
    np.testing.assert_allclose(
        flax_logits, out.logits.numpy()[:, :12], atol=ATOL
    )


# --------------------------------------------------------------------- ViLT

def test_vilt_parity():
    from transformers.models.vilt.configuration_vilt import ViltConfig as HFCfg

    vilt = load_ref_module("ref_vilt", "modeling_vilt.py")
    torch.manual_seed(0)
    ref = vilt.ViltForMaskedLM(
        HFCfg(vocab_size=128, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=2, intermediate_size=64, image_size=32,
              patch_size=16, max_position_embeddings=64,
              modality_type_vocab_size=2, max_image_length=-1,
              hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
              tie_word_embeddings=True)
    )
    ref.eval()
    # the zero-init position/cls params never exercise position handling;
    # randomize them (they are loaded from checkpoints in practice)
    with torch.no_grad():
        ref.vilt.embeddings.position_embeddings.normal_(0, 0.5)
        ref.vilt.embeddings.cls_token.normal_(0, 0.5)

    from mkg_analogy_tpu.models.import_torch import vilt_params_from_reference
    from mkg_analogy_tpu.models.vilt import ViltConfig, ViltForMaskedLM

    model = ViltForMaskedLM(
        ViltConfig(text=tiny_text_cfg(2), image_size=32, patch_size=16,
                   dtype="float32", compat_ref_mask_offset=True)
    )
    params = vilt_params_from_reference(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=2,
    )

    rng = np.random.default_rng(1)
    input_ids, attention_mask, token_type_ids, sep_idx = text_inputs(rng)
    pixels = rng.standard_normal((2, 2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        out, trans = ref(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(attention_mask),
            token_type_ids=torch.from_numpy(token_type_ids),
            pixel_values=torch.from_numpy(pixels),
            sep_idx=torch.from_numpy(sep_idx.copy()),
            return_dict=True,
        )
    flax_trans, flax_logits = run_flax(
        model, params, input_ids, attention_mask, token_type_ids, pixels,
        sep_idx,
    )
    # reference permutes image patch order (multinomial over all-valid
    # patches) — text-slice outputs are permutation-invariant up to fp
    # summation order
    np.testing.assert_allclose(flax_trans, trans.numpy(), atol=ATOL)
    np.testing.assert_allclose(flax_logits, out.logits.numpy(), atol=ATOL)


def test_vilt_position_interpolation():
    """interpolate_patch_positions matches torch bilinear align_corners."""
    from mkg_analogy_tpu.models.import_torch import interpolate_patch_positions

    rng = np.random.default_rng(2)
    pos = rng.standard_normal((10, 8)).astype(np.float32)  # CLS + 3x3 grid
    got = interpolate_patch_positions(pos, 16)  # -> 4x4 grid
    grid = torch.from_numpy(pos[1:].reshape(1, 3, 3, 8)).permute(0, 3, 1, 2)
    want = torch.nn.functional.interpolate(
        grid, size=(4, 4), mode="bilinear", align_corners=True
    ).permute(0, 2, 3, 1).reshape(16, 8).numpy()
    np.testing.assert_allclose(got[1:], want, atol=1e-5)
    np.testing.assert_allclose(got[0], pos[0])


# -------------------------------------------------------------------- FLAVA

def test_flava_parity():
    from transformers.models.flava.configuration_flava import (
        FlavaConfig as HFCfg,
        FlavaImageConfig,
        FlavaMultimodalConfig,
        FlavaTextConfig,
    )

    flava = load_ref_module("ref_flava", "modeling_flava.py")
    torch.manual_seed(0)
    kw = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
              intermediate_size=64, hidden_dropout_prob=0.0,
              attention_probs_dropout_prob=0.0)
    ref = flava.FlavaForMaskedLM(
        HFCfg(
            image_config=FlavaImageConfig(image_size=32, patch_size=16, **kw).to_dict(),
            text_config=FlavaTextConfig(vocab_size=128,
                                        max_position_embeddings=64, **kw).to_dict(),
            multimodal_config=FlavaMultimodalConfig(**kw).to_dict(),
            hidden_size=32,
        )
    )
    ref.eval()
    with torch.no_grad():  # zero-init positions/cls never exercise the path
        ref.flava.image_model.embeddings.position_embeddings.normal_(0, 0.5)
        ref.flava.image_model.embeddings.cls_token.normal_(0, 0.5)
        ref.flava.multimodal_model.cls_token.normal_(0, 0.5)

    from mkg_analogy_tpu.models.flava import FlavaConfig, FlavaForMaskedLM
    from mkg_analogy_tpu.models.import_torch import flava_params_from_reference

    model = FlavaForMaskedLM(
        FlavaConfig(text=tiny_text_cfg(2), image_size=32, patch_size=16,
                    image_layers=2, multimodal_layers=2, dtype="float32")
    )
    params = flava_params_from_reference(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=2, mm_layers=2,
    )

    rng = np.random.default_rng(3)
    input_ids, attention_mask, token_type_ids, sep_idx = text_inputs(rng)
    pixels = rng.standard_normal((2, 2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        out, trans = ref(
            input_ids=torch.from_numpy(input_ids),
            pixel_values=torch.from_numpy(pixels),
            attention_mask=torch.from_numpy(attention_mask),
            token_type_ids=torch.from_numpy(token_type_ids),
            sep_idx=torch.from_numpy(sep_idx.copy()),
        )
    flax_trans, flax_logits = run_flax(
        model, params, input_ids, attention_mask, token_type_ids, pixels,
        sep_idx,
    )
    np.testing.assert_allclose(flax_trans, trans.numpy(), atol=ATOL)
    np.testing.assert_allclose(flax_logits, out.logits.numpy(), atol=ATOL)


# ------------------------------------------------------------------ ViLBERT

def test_vilbert_parity():
    vl = load_ref_module("ref_vilbert", "vilbert.py")
    torch.manual_seed(0)
    cfg = vl.BertConfig(
        vocab_size_or_config_json_file=128, hidden_size=32,
        num_hidden_layers=3, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, v_feature_size=16, v_hidden_size=32,
        v_num_hidden_layers=2, v_num_attention_heads=2,
        v_intermediate_size=32, bi_hidden_size=32, bi_num_attention_heads=2,
        v_biattention_id=[0, 1], t_biattention_id=[1, 2],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
    )
    ref = vl.VilBertForMaskLM(cfg)
    ref.eval()

    from mkg_analogy_tpu.models.import_torch import vilbert_params_from_reference
    from mkg_analogy_tpu.models.vilbert import VilBertConfig, VilBertForMaskedLM

    model = VilBertForMaskedLM(
        VilBertConfig(
            text=tiny_text_cfg(3), v_hidden_size=32, v_num_layers=2,
            v_num_heads=2, v_intermediate_size=32, v_feature_size=16,
            bi_hidden_size=32, bi_num_heads=2,
            v_biattention_id=(0, 1), t_biattention_id=(1, 2),
            dtype="float32",
        )
    )
    params = vilbert_params_from_reference(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=3, v_num_layers=2, num_connections=2,
    )

    rng = np.random.default_rng(4)
    input_ids, attention_mask, token_type_ids, sep_idx = text_inputs(rng)
    visual = rng.standard_normal((2, 5, 16)).astype(np.float32)
    vmask = np.ones((2, 5), np.int64)
    vmask[:, 4:] = 0

    with torch.no_grad():
        out, trans = ref(
            input_ids=torch.from_numpy(input_ids),
            pixel_values=torch.from_numpy(visual),
            token_type_ids=torch.from_numpy(token_type_ids),
            attention_mask=torch.from_numpy(attention_mask),
            visual_attention_mask=torch.from_numpy(vmask),
            sep_idx=torch.from_numpy(sep_idx.copy()),
            return_dict=True,
        )
    import jax.numpy as jnp

    flax_trans, flax_logits = run_flax(
        model, params, input_ids, attention_mask, token_type_ids, visual,
        sep_idx, visual_attention_mask=jnp.asarray(vmask),
    )
    np.testing.assert_allclose(flax_trans, trans.numpy(), atol=ATOL)
    np.testing.assert_allclose(flax_logits, out.logits.numpy(), atol=ATOL)


def test_visualbert_export_roundtrip():
    """export_torch.visualbert_params_to_reference inverts the importer and
    loads into the reference model with no unexpected keys."""
    from transformers.models.visual_bert import VisualBertConfig as HFCfg

    vb = load_ref_module("ref_visual_bert", "modeling_visual_bert.py")
    torch.manual_seed(1)
    cfg = HFCfg(vocab_size=128, hidden_size=32, num_hidden_layers=3,
                num_attention_heads=2, intermediate_size=64,
                visual_embedding_dim=16, max_position_embeddings=64,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    ref = vb.VisualBertForMaskedLM(cfg)
    ref.eval()

    from mkg_analogy_tpu.models.export_torch import (
        state_dict_to_torch,
        visualbert_params_to_reference,
    )
    from mkg_analogy_tpu.models.import_torch import (
        visualbert_params_from_reference,
    )

    params = visualbert_params_from_reference(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=3,
    )
    sd = visualbert_params_to_reference(params, num_layers=3)
    back = visualbert_params_from_reference(sd, num_layers=3)
    import jax

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path)
        )

    fresh = vb.VisualBertForMaskedLM(cfg)
    result = fresh.load_state_dict(state_dict_to_torch(sd), strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    assert all("position_ids" in k for k in result.missing_keys), result.missing_keys


def _assert_roundtrip(params, back):
    import jax

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path)
        )


def test_vilt_export_roundtrip():
    from transformers.models.vilt.configuration_vilt import ViltConfig as HFCfg

    vilt = load_ref_module("ref_vilt", "modeling_vilt.py")
    torch.manual_seed(2)
    cfg = HFCfg(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64, image_size=32,
                patch_size=16, max_position_embeddings=64,
                modality_type_vocab_size=2, max_image_length=-1,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                tie_word_embeddings=True)
    ref = vilt.ViltForMaskedLM(cfg)
    from mkg_analogy_tpu.models.export_torch import (
        state_dict_to_torch,
        vilt_params_to_reference,
    )
    from mkg_analogy_tpu.models.import_torch import vilt_params_from_reference

    params = vilt_params_from_reference(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=2,
    )
    sd = vilt_params_to_reference(params, num_layers=2)
    _assert_roundtrip(params, vilt_params_from_reference(sd, num_layers=2))
    fresh = vilt.ViltForMaskedLM(cfg)
    result = fresh.load_state_dict(state_dict_to_torch(sd), strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    allowed = ("position_ids", "pooler")
    assert all(any(a in k for a in allowed) for k in result.missing_keys), (
        result.missing_keys
    )


def test_flava_export_roundtrip():
    from transformers.models.flava.configuration_flava import (
        FlavaConfig as HFCfg,
        FlavaImageConfig,
        FlavaMultimodalConfig,
        FlavaTextConfig,
    )

    flava = load_ref_module("ref_flava", "modeling_flava.py")
    torch.manual_seed(3)
    kw = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
              intermediate_size=64, hidden_dropout_prob=0.0,
              attention_probs_dropout_prob=0.0)
    cfg = HFCfg(
        image_config=FlavaImageConfig(image_size=32, patch_size=16, **kw).to_dict(),
        text_config=FlavaTextConfig(vocab_size=128,
                                    max_position_embeddings=64, **kw).to_dict(),
        multimodal_config=FlavaMultimodalConfig(**kw).to_dict(),
        hidden_size=32,
    )
    ref = flava.FlavaForMaskedLM(cfg)
    from mkg_analogy_tpu.models.export_torch import (
        flava_params_to_reference,
        state_dict_to_torch,
    )
    from mkg_analogy_tpu.models.import_torch import flava_params_from_reference

    params = flava_params_from_reference(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=2, mm_layers=2,
    )
    sd = flava_params_to_reference(params, num_layers=2, mm_layers=2)
    _assert_roundtrip(
        params, flava_params_from_reference(sd, num_layers=2, mm_layers=2)
    )
    fresh = flava.FlavaForMaskedLM(cfg)
    result = fresh.load_state_dict(state_dict_to_torch(sd), strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    allowed = ("position_ids", "pooler", "layernorm", "projection",
               "logit_scale", "mask_token", "adaptive_weight", "itm_head",
               "decoder")
    assert all(any(a in k for a in allowed) for k in result.missing_keys), (
        result.missing_keys
    )


def test_vilbert_export_roundtrip():
    vl = load_ref_module("ref_vilbert", "vilbert.py")
    torch.manual_seed(4)
    cfg = vl.BertConfig(
        vocab_size_or_config_json_file=128, hidden_size=32,
        num_hidden_layers=3, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, v_feature_size=16, v_hidden_size=32,
        v_num_hidden_layers=2, v_num_attention_heads=2,
        v_intermediate_size=32, bi_hidden_size=32, bi_num_attention_heads=2,
        v_biattention_id=[0, 1], t_biattention_id=[1, 2],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
    )
    ref = vl.VilBertForMaskLM(cfg)
    from mkg_analogy_tpu.models.export_torch import (
        state_dict_to_torch,
        vilbert_params_to_reference,
    )
    from mkg_analogy_tpu.models.import_torch import vilbert_params_from_reference

    params = vilbert_params_from_reference(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=3, v_num_layers=2, num_connections=2,
    )
    sd = vilbert_params_to_reference(
        params, num_layers=3, v_num_layers=2, num_connections=2
    )
    _assert_roundtrip(
        params,
        vilbert_params_from_reference(
            sd, num_layers=3, v_num_layers=2, num_connections=2
        ),
    )
    fresh = vl.VilBertForMaskLM(cfg)
    result = fresh.load_state_dict(state_dict_to_torch(sd), strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    allowed = ("position_ids", "pooler", "q_dense", "decoder")
    assert all(any(a in k for a in allowed) for k in result.missing_keys), (
        result.missing_keys
    )
