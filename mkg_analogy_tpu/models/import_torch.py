"""Torch -> Flax weight conversion for the UniMo/MKGformer family.

Covers two flows:
- converting a *reference-format* UnimoForMaskedLM state_dict (the layout of
  MarT/models/modeling_unimo.py, i.e. the published MKG_Analogy checkpoints)
  into this framework's parameter tree — enabling checkpoint reuse and the
  activation-parity tests;
- the BERT+CLIP "model surgery" of MarT/main.py:90-109 (loading
  bert-base-uncased + openai/clip-vit-base-patch32 weights into the two
  towers) when local torch checkpoints are available (this framework never
  downloads).

Conventions: torch Linear weight (out, in) -> flax kernel (in, out);
torch Conv2d weight (O, I, kh, kw) -> flax (kh, kw, I, O);
LayerNorm weight/bias -> scale/bias.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w).T


def _conv(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _ln(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _dense(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def unimo_params_from_reference(sd: Dict[str, Any], num_layers: int = 12,
                                vocab_rows: int = None) -> Dict[str, Any]:
    """Reference UnimoForMaskedLM state_dict -> flax params dict.

    ``vocab_rows``: target vocab size of the flax table; the torch rows are
    copied into the top and extra (padding) rows stay zero.
    """
    sd = {k: v for k, v in sd.items()}
    word = np.asarray(sd["unimo.text_embeddings.word_embeddings.weight"])
    dec_bias = np.asarray(sd["cls.predictions.bias"])
    if vocab_rows is not None and vocab_rows != word.shape[0]:
        w2 = np.zeros((vocab_rows, word.shape[1]), word.dtype)
        w2[: word.shape[0]] = word
        word = w2
        b2 = np.zeros((vocab_rows,), dec_bias.dtype)
        b2[: dec_bias.shape[0]] = dec_bias
        dec_bias = b2

    params: Dict[str, Any] = {
        "word_embeddings": word,
        "mlm_bias": dec_bias,
        "vision_embeddings": {
            "class_embedding": np.asarray(
                sd["unimo.vision_embeddings.class_embedding"]
            ),
            "patch_embedding": {
                "kernel": _conv(
                    sd["unimo.vision_embeddings.patch_embedding.weight"]
                )
            },
            "position_embedding": np.asarray(
                sd["unimo.vision_embeddings.position_embedding.weight"]
            ),
        },
        "vision_pre_ln": _ln(sd, "unimo.vision_pre_layrnorm"),
        "text_embeddings": {
            "position_embeddings": np.asarray(
                sd["unimo.text_embeddings.position_embeddings.weight"]
            ),
            "token_type_embeddings": np.asarray(
                sd["unimo.text_embeddings.token_type_embeddings.weight"]
            ),
            "ln": _ln(sd, "unimo.text_embeddings.LayerNorm"),
        },
        "mlm_transform": {
            "dense": _dense(sd, "cls.predictions.transform.dense"),
            "ln": _ln(sd, "cls.predictions.transform.LayerNorm"),
        },
        "encoder": {},
    }
    enc = params["encoder"]
    for i in range(num_layers):
        vp = f"unimo.encoder.vision_layers.{i}"
        enc[f"vision_{i}"] = {
            "ln1": _ln(sd, f"{vp}.layer_norm1"),
            "ln2": _ln(sd, f"{vp}.layer_norm2"),
            "attn": {
                "query": _dense(sd, f"{vp}.self_attn.q_proj"),
                "key": _dense(sd, f"{vp}.self_attn.k_proj"),
                "value": _dense(sd, f"{vp}.self_attn.v_proj"),
                "out": _dense(sd, f"{vp}.self_attn.out_proj"),
            },
            "fc1": _dense(sd, f"{vp}.mlp.fc1"),
            "fc2": _dense(sd, f"{vp}.mlp.fc2"),
        }
        tp = f"unimo.encoder.text_layer.{i}"
        enc[f"text_{i}"] = {
            "adaptive_w0": np.asarray(
                sd[f"{tp}.attention.self.adaptive_weight.0"]
            ),
            "adaptive_w1": np.asarray(
                sd[f"{tp}.attention.self.adaptive_weight.1"]
            ),
            "attn": {
                "query": _dense(sd, f"{tp}.attention.self.query"),
                "key": _dense(sd, f"{tp}.attention.self.key"),
                "value": _dense(sd, f"{tp}.attention.self.value"),
                "out": _dense(sd, f"{tp}.attention.output.dense"),
            },
            "attn_ln": _ln(sd, f"{tp}.attention.output.LayerNorm"),
            "intermediate": _dense(sd, f"{tp}.intermediate.dense"),
            "fusion_dense": _dense(sd, f"{tp}.intermediate.fusion_dense"),
            "output": _dense(sd, f"{tp}.output.dense"),
            "out_ln": _ln(sd, f"{tp}.output.LayerNorm"),
        }
    return {"params": params}


def unimo_params_from_bert_clip(
    bert_sd: Dict[str, Any], clip_vision_sd: Dict[str, Any],
    num_layers: int = 12, vocab_rows: int = None,
) -> Dict[str, Any]:
    """BERT encoder + CLIP vision-tower state_dicts -> flax params
    (the MarT/main.py:90-109 surgery, name-mapped directly)."""
    merged: Dict[str, Any] = {}
    # re-express both checkpoints in the reference-unimo namespace, then
    # reuse the converter above.
    for k, v in clip_vision_sd.items():
        if k.startswith("embeddings."):
            merged[f"unimo.vision_embeddings.{k[len('embeddings.'):]}"] = v
        elif k.startswith("pre_layrnorm.") or k.startswith("pre_layernorm."):
            merged[f"unimo.vision_pre_layrnorm.{k.split('.', 1)[1]}"] = v
        elif k.startswith("encoder.layers."):
            merged[f"unimo.encoder.vision_layers.{k[len('encoder.layers.'):]}"] = v
    for k, v in bert_sd.items():
        if k.startswith("embeddings."):
            merged[f"unimo.text_embeddings.{k[len('embeddings.'):]}"] = v
        elif k.startswith("encoder.layer."):
            merged[f"unimo.encoder.text_layer.{k[len('encoder.layer.'):]}"] = v

    word = np.asarray(merged["unimo.text_embeddings.word_embeddings.weight"])
    merged.setdefault("cls.predictions.bias", np.zeros((word.shape[0],), np.float32))
    hidden = word.shape[1]
    eye = {"weight": np.eye(hidden, dtype=np.float32),
           "bias": np.zeros((hidden,), np.float32)}
    merged.setdefault("cls.predictions.transform.dense.weight", eye["weight"])
    merged.setdefault("cls.predictions.transform.dense.bias", eye["bias"])
    merged.setdefault("cls.predictions.transform.LayerNorm.weight",
                      np.ones((hidden,), np.float32))
    merged.setdefault("cls.predictions.transform.LayerNorm.bias",
                      np.zeros((hidden,), np.float32))
    for i in range(num_layers):
        tp = f"unimo.encoder.text_layer.{i}"
        merged.setdefault(f"{tp}.attention.self.adaptive_weight.0",
                          np.asarray([0.25], np.float32))
        merged.setdefault(f"{tp}.attention.self.adaptive_weight.1",
                          np.asarray([0.5], np.float32))
        merged.setdefault(f"{tp}.intermediate.fusion_dense.weight",
                          np.zeros_like(np.asarray(
                              merged[f"{tp}.intermediate.dense.weight"])))
        merged.setdefault(f"{tp}.intermediate.fusion_dense.bias",
                          np.zeros_like(np.asarray(
                              merged[f"{tp}.intermediate.dense.bias"])))
    return unimo_params_from_reference(merged, num_layers, vocab_rows)
