"""Model registry: reference class names -> TPU-native constructors
(MarT/models/model.py:7-35 parity; string dispatch as in main.py:31-35).

Each model shares the interface::

    model(input_ids, attention_mask, token_type_ids, pixel_values,
          positions, boundary=None, visual_attention_mask=None,
          deterministic=True) -> trans_hidden (B, P, H)
    model.logits(trans_hidden, vocab_ids|vocab_start/end) -> logits

``image_input(name)`` describes the visual features each family consumes
(the collator contract, data_module.py:121-161).
"""

from __future__ import annotations

from typing import Callable, Dict

from .flava import FlavaConfig, FlavaForMaskedLM
from .unimo import TextConfig, UnimoConfig, UnimoForMaskedLM, VisionConfig
from .vilbert import VilBertConfig, VilBertForMaskedLM
from .vilt import ViltConfig, ViltForMaskedLM
from .visualbert import VisualBertConfig, VisualBertForMaskedLM

_REGISTRY: Dict[str, Callable] = {}

# visual-input kind per model family: ("pixels", size) or ("regions",)
IMAGE_INPUT = {
    "MKGformerKGC": ("pixels", 224),
    "ViltKGC": ("pixels", 384),
    "FlavaKGC": ("pixels", 224),
    "VisualBertKGC": ("regions", None),
    "VilBertKGC": ("regions", None),
}


def _text_cfg(vocab_size: int, kw: dict) -> TextConfig:
    """TextConfig with optional size overrides (hidden_size, num_layers,
    num_heads, intermediate_size, max_position_embeddings) — used by tests
    and small-scale runs."""
    fields = {k: v for k, v in kw.items() if k in (
        "hidden_size", "num_layers", "num_heads", "intermediate_size",
        "max_position_embeddings")}
    return TextConfig(vocab_size=vocab_size, **fields)


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


@register("MKGformerKGC")
def _mkgformer(vocab_size: int, dtype: str = "bfloat16", **kw):
    text = _text_cfg(vocab_size, kw)
    # lockstep towers: vision mirrors any size overrides
    vision = VisionConfig(
        hidden_size=text.hidden_size, num_layers=text.num_layers,
        num_heads=text.num_heads, intermediate_size=text.intermediate_size,
    )
    fusion_start = max(0, text.num_layers - 4)
    return UnimoForMaskedLM(
        UnimoConfig(text=text, vision=vision, fusion_start=fusion_start,
                    dtype=dtype)
    )


@register("VisualBertKGC")
def _visualbert(vocab_size: int, dtype: str = "bfloat16", **kw):
    return VisualBertForMaskedLM(
        VisualBertConfig(text=_text_cfg(vocab_size, kw), dtype=dtype)
    )


@register("ViltKGC")
def _vilt(vocab_size: int, dtype: str = "bfloat16", **kw):
    return ViltForMaskedLM(
        ViltConfig(text=_text_cfg(vocab_size, kw), dtype=dtype)
    )


@register("FlavaKGC")
def _flava(vocab_size: int, dtype: str = "bfloat16", **kw):
    return FlavaForMaskedLM(
        FlavaConfig(text=_text_cfg(vocab_size, kw), dtype=dtype)
    )


@register("VilBertKGC")
def _vilbert(vocab_size: int, dtype: str = "bfloat16", **kw):
    text = _text_cfg(vocab_size, kw)
    ablate = bool(kw.get("vilbert_ablate_img_to_txt", False))
    # scale the rendezvous schedule to a reduced depth (tiny/test configs):
    # the default 6-connection schedule indexes text layers 6..11
    # (vilbert.py config bert_base_6layer_6conect)
    n_conn = min(6, text.num_layers // 2, max(1, text.num_layers - 1))
    v_num_layers = max(n_conn, 6 if text.num_layers >= 12 else n_conn)
    t_start = text.num_layers - n_conn
    return VilBertForMaskedLM(
        VilBertConfig(
            text=text, dtype=dtype,
            v_num_layers=v_num_layers,
            v_biattention_id=tuple(range(n_conn)),
            t_biattention_id=tuple(range(t_start, text.num_layers)),
            ablate_img_to_txt=ablate,
        )
    )


def create_model(name: str, **kw):
    try:
        ctor = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model_class {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
    return ctor(**kw)


def available_models():
    return sorted(_REGISTRY)
