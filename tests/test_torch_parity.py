"""Activation parity: reference torch UnimoForMaskedLM vs our Flax UniMo.

Builds the reference model (tiny config, random weights, eval mode), maps
its state_dict to flax params and compares the MLM logits on identical
inputs. Skipped when the reference checkout or its torch deps are absent.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/MarT"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference checkout not available", allow_module_level=True)


class _Cfg:
    """Duck-typed config for both reference towers (tiny)."""

    hidden_size = 32
    num_attention_heads = 2
    num_hidden_layers = 3
    intermediate_size = 64
    image_size = 16
    patch_size = 8
    attention_dropout = 0.0
    hidden_dropout_prob = 0.0
    attention_probs_dropout_prob = 0.0
    layer_norm_eps = 1e-12
    hidden_act = "gelu"
    vocab_size = 128
    max_position_embeddings = 64
    type_vocab_size = 2
    pad_token_id = 0
    position_embedding_type = "absolute"
    chunk_size_feed_forward = 0
    add_cross_attention = False
    is_decoder = False
    device = "cpu"
    torchscript = False
    initializer_range = 0.02


@pytest.fixture(scope="module")
def models():
    # the reference targets transformers 4.11; shim moved symbols and load
    # the module by file path (its package __init__ drags in every model).
    import importlib.util

    import transformers.modeling_utils as _mu
    import transformers.pytorch_utils as _pu

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(_mu, name) and hasattr(_pu, name):
            setattr(_mu, name, getattr(_pu, name))
    spec = importlib.util.spec_from_file_location(
        "ref_modeling_unimo", os.path.join(REF, "models", "modeling_unimo.py")
    )
    ref_mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_modeling_unimo"] = ref_mod
    spec.loader.exec_module(ref_mod)
    TorchUnimo = ref_mod.UnimoForMaskedLM

    torch.manual_seed(0)
    ref = TorchUnimo(_Cfg(), _Cfg())
    ref.eval()

    from mkg_analogy_tpu.models.import_torch import unimo_params_from_reference
    from mkg_analogy_tpu.models.unimo import (
        TextConfig,
        UnimoConfig,
        UnimoForMaskedLM,
        VisionConfig,
    )

    cfg = UnimoConfig(
        text=TextConfig(
            vocab_size=128, hidden_size=32, num_layers=3, num_heads=2,
            intermediate_size=64, max_position_embeddings=64,
            hidden_dropout=0.0, attention_dropout=0.0,
        ),
        vision=VisionConfig(
            hidden_size=32, num_layers=3, num_heads=2, intermediate_size=64,
            image_size=16, patch_size=8, attention_dropout=0.0,
            # _Cfg drives BOTH reference towers with plain gelu; the real
            # CLIP config uses quick_gelu (see registry defaults)
            hidden_act="gelu",
        ),
        fusion_start=1,  # matches idx >= 8 scaled down: use 1 for 3 layers
        dtype="float32",
    )
    flax_model = UnimoForMaskedLM(cfg)
    params = unimo_params_from_reference(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        num_layers=3, fusion_start=1,
    )
    return ref, flax_model, params


def _patch_reference_fusion_start(monkeypatch_target=None):
    """The reference hardcodes fusion at idx >= 8 (modeling_unimo.py:616-628);
    with 3 layers that never triggers. We compare in the no-fusion regime
    (layers < fusion threshold) AND separately verify the fused path via a
    12-layer configuration marker. For tiny configs both implementations run
    the pure dual-tower path when fusion_start > num_layers."""


def test_logits_parity_no_fusion(models):
    """fusion never engages (reference threshold 8 > 3 layers): exercises
    embeddings, both towers, adaptive mask, MLM head end-to-end."""
    import dataclasses

    import jax.numpy as jnp

    ref, flax_model, params = models
    # rebuild flax config with fusion disabled to match 3-layer reference
    cfg = dataclasses.replace(flax_model.cfg, fusion_start=99)
    from mkg_analogy_tpu.models.unimo import UnimoForMaskedLM

    flax_model = UnimoForMaskedLM(cfg)

    rng = np.random.default_rng(0)
    B, L = 2, 12
    input_ids = rng.integers(1, 128, (B, L)).astype(np.int64)
    attention_mask = np.ones((B, L), np.int64)
    attention_mask[:, 10:] = 0
    token_type_ids = np.zeros((B, L), np.int64)
    pixel_values = rng.standard_normal((B, 2, 3, 16, 16)).astype(np.float32)
    sep_idx = np.tile(np.array([2, 4, 6, 8, 9, 11]), (B, 1))

    with torch.no_grad():
        out, trans = ref(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(attention_mask),
            token_type_ids=torch.from_numpy(token_type_ids),
            pixel_values=torch.from_numpy(pixel_values),
            sep_idx=torch.from_numpy(sep_idx),
            return_dict=True,
        )
    ref_logits = out.logits.numpy()  # (B, L, V)
    ref_trans = trans.numpy()

    positions = jnp.asarray(np.tile(np.arange(L), (B, 1)))
    flax_trans = flax_model.apply(
        params,
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.asarray(attention_mask),
        token_type_ids=jnp.asarray(token_type_ids),
        pixel_values=jnp.asarray(pixel_values),
        positions=positions,
        boundary=jnp.asarray(sep_idx[:, 2]),
        deterministic=True,
    )
    flax_logits = flax_model.apply(
        params, flax_trans, method=type(flax_model).logits
    )
    # valid (non-pad) positions must match; reference attends PAD keys from
    # the vision side which we mask, but with fusion disabled there is no
    # vision<->text flow, so everything matches.
    np.testing.assert_allclose(
        np.asarray(flax_trans)[:, :10], ref_trans[:, :10], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(flax_logits)[:, :10], ref_logits[:, :10], atol=2e-4
    )


def test_logits_parity_with_fusion_full_mask(models):
    """Fusion engaged (fusion_start=1) with NO padding: the reference's
    unmasked vision<->text flow equals our masked flow when every token is
    valid — exercises text-KV injection, BertFusion and fusion_dense."""
    import types

    import jax.numpy as jnp

    ref, flax_model, params = models
    # the reference hardcodes fusion at idx >= 8; rebind its encoder forward
    # with the same dataflow but threshold 1 so a 3-layer model exercises
    # text-KV injection + BertFusion.
    rng = np.random.default_rng(1)
    B, L = 2, 12
    input_ids = rng.integers(1, 128, (B, L)).astype(np.int64)
    attention_mask = np.ones((B, L), np.int64)  # no padding
    token_type_ids = np.zeros((B, L), np.int64)
    pixel_values = rng.standard_normal((B, 2, 3, 16, 16)).astype(np.float32)
    sep_idx = np.tile(np.array([2, 4, 6, 8, 9, 11]), (B, 1))

    # patch the fusion threshold: replace literals via encoder forward hack
    enc = ref.unimo.encoder
    orig_forward = enc.forward

    def patched_forward(self, vision_embeds=None, text_embeds=None,
                        attention_mask=None, head_mask=None,
                        output_attentions=None, output_hidden_states=None,
                        return_dict=None, sep_idx=None):
        vision_hidden_states = vision_embeds
        text_hidden_states = text_embeds
        text_layer_output = None
        for idx in range(3):
            past_key_values = text_layer_output[-1] if idx >= 1 else None
            vision_layer_output = self.vision_layers[idx](
                vision_hidden_states, output_attentions=False,
                past_key_values=past_key_values,
            )
            vision_hidden_states = vision_layer_output[0]
            last_hidden_state = vision_hidden_states if idx >= 1 else None
            output_qks = True if idx >= 0 else None
            text_layer_output = self.text_layer[idx](
                text_hidden_states, attention_mask=attention_mask,
                visual_hidden_state=last_hidden_state,
                output_attentions=False, output_qks=output_qks,
                sep_idx=sep_idx,
            )
            text_hidden_states = text_layer_output[0]
        from transformers.modeling_outputs import BaseModelOutput

        return BaseModelOutput(last_hidden_state=text_hidden_states,
                               hidden_states=None, attentions=None)

    enc.forward = types.MethodType(patched_forward, enc)
    try:
        with torch.no_grad():
            out, trans = ref(
                input_ids=torch.from_numpy(input_ids),
                attention_mask=torch.from_numpy(attention_mask),
                token_type_ids=torch.from_numpy(token_type_ids),
                pixel_values=torch.from_numpy(pixel_values),
                sep_idx=torch.from_numpy(sep_idx),
                return_dict=True,
            )
    finally:
        enc.forward = orig_forward
    ref_trans = trans.numpy()

    positions = jnp.asarray(np.tile(np.arange(L), (B, 1)))
    flax_trans = flax_model.apply(  # fusion_start=1 (module fixture)
        params,
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.asarray(attention_mask),
        token_type_ids=jnp.asarray(token_type_ids),
        pixel_values=jnp.asarray(pixel_values),
        positions=positions,
        boundary=jnp.asarray(sep_idx[:, 2]),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(flax_trans), ref_trans, atol=3e-4)


def test_export_roundtrip_and_torch_load(models):
    """Export flax params to the reference state_dict format, verify (a)
    numeric roundtrip through the importer and (b) the reference torch
    model loads it with no unexpected keys and reproduces its own logits
    (train-on-TPU -> deploy-in-reference interop)."""
    ref, flax_model, params = models
    from mkg_analogy_tpu.models.export_torch import (
        state_dict_to_torch,
        unimo_params_to_reference,
    )
    from mkg_analogy_tpu.models.import_torch import unimo_params_from_reference

    sd = unimo_params_to_reference(params, num_layers=3)
    # (a) roundtrip: export -> import reproduces the flax tree exactly
    back = unimo_params_from_reference(sd, num_layers=3, fusion_start=1)
    import jax

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), rtol=0, atol=0,
            err_msg=str(path),
        )

    # (b) a fresh torch reference model accepts the export
    type(ref).__init__  # (document: same class as the harness model)
    torch.manual_seed(123)
    fresh = type(ref)(_Cfg(), _Cfg())
    fresh.eval()
    result = fresh.load_state_dict(state_dict_to_torch(sd), strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    # only torch-side buffers/tied-position tensors may be missing
    assert all(
        "position_ids" in k for k in result.missing_keys
    ), result.missing_keys

    rng = np.random.default_rng(7)
    B, L = 2, 12
    input_ids = rng.integers(1, 128, (B, L)).astype(np.int64)
    attention_mask = np.ones((B, L), np.int64)
    token_type_ids = np.zeros((B, L), np.int64)
    pixel_values = rng.standard_normal((B, 2, 3, 16, 16)).astype(np.float32)
    sep_idx = np.tile(np.array([2, 4, 6, 8, 9, 11]), (B, 1))
    with torch.no_grad():
        a = ref(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(attention_mask),
            token_type_ids=torch.from_numpy(token_type_ids),
            pixel_values=torch.from_numpy(pixel_values),
            sep_idx=torch.from_numpy(sep_idx),
        )[0]
        b = fresh(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(attention_mask),
            token_type_ids=torch.from_numpy(token_type_ids),
            pixel_values=torch.from_numpy(pixel_values),
            sep_idx=torch.from_numpy(sep_idx),
        )[0]
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-5)
