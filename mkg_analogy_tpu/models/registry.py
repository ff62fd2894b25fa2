"""Model registry: reference class names -> TPU-native constructors
(MarT/models/model.py:7-35 parity; string dispatch as in main.py:31-35)."""

from __future__ import annotations

from typing import Callable, Dict

from .unimo import TextConfig, UnimoConfig, UnimoForMaskedLM, VisionConfig

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


@register("MKGformerKGC")
def _mkgformer(vocab_size: int, dtype: str = "bfloat16", **kw):
    cfg = UnimoConfig(
        text=TextConfig(vocab_size=vocab_size),
        vision=VisionConfig(),
        dtype=dtype,
    )
    return UnimoForMaskedLM(cfg)


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
