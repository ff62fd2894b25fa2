"""Standalone vision encoders for the offline feature pipelines.

- ``VGG16Features``  — truncated VGG16 (fc7, 4096-d) for the IKRL/TransAE
  per-entity averaged image embeddings (visual_embed.py:10-71, K8);
- ``ViTClassifier``  — ViT-B/16 with a 1000-d classifier head for the RSME
  image vectors (RSME/image_encoder.py:79, R6).

Both expose ``from_torch_state_dict`` so torchvision/timm weights can be
converted when a checkpoint file is available (this framework is offline —
no hub downloads; randomly-initialized encoders still exercise the full
pipeline).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import EncoderLayer

VGG16_CONV_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                   512, 512, 512, "M", 512, 512, 512, "M"]


class VGG16Features(nn.Module):
    """VGG16 through fc7: (B, 3, 224, 224) -> (B, 4096)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)  # NHWC
        conv_i = 0
        for spec in VGG16_CONV_PLAN:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(spec, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
        x = x.reshape(x.shape[0], -1)  # (B, 7*7*512)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7")(x))
        return x

    @staticmethod
    def params_from_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
        """Convert torchvision vgg16 state_dict -> flax params."""
        params: Dict[str, Any] = {}
        conv_idx = [i for i, s in enumerate(VGG16_CONV_PLAN) if s != "M"]
        torch_conv_keys = sorted(
            {k.rsplit(".", 1)[0] for k in sd if k.startswith("features")},
            key=lambda s: int(s.split(".")[1]),
        )
        for i, tk in enumerate(torch_conv_keys):
            w = np.asarray(sd[f"{tk}.weight"])  # (O, I, kh, kw)
            params[f"conv_{i}"] = {
                "kernel": w.transpose(2, 3, 1, 0),
                "bias": np.asarray(sd[f"{tk}.bias"]),
            }
        for name, tk in (("fc6", "classifier.0"), ("fc7", "classifier.3")):
            w = np.asarray(sd[f"{tk}.weight"])  # (out, in)
            params[name] = {"kernel": w.T, "bias": np.asarray(sd[f"{tk}.bias"])}
        return params


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_classes: int = 1000
    layer_norm_eps: float = 1e-6


class ViTClassifier(nn.Module):
    """ViT-B/16 with classification head: (B, 3, 224, 224) -> (B, 1000)."""

    cfg: ViTConfig = ViTConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b = pixel_values.shape[0]
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), dtype=self.dtype,
            name="patch_embedding",
        )(x)
        n = (cfg.image_size // cfg.patch_size) ** 2
        patches = patches.reshape(b, n, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)),
             patches], axis=1,
        )
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (n + 1, cfg.hidden_size))
        tokens = tokens + pos[None].astype(self.dtype)
        for i in range(cfg.num_layers):
            tokens = EncoderLayer(
                hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
                intermediate_size=cfg.intermediate_size, hidden_act="gelu",
                layer_norm_eps=cfg.layer_norm_eps, dtype=self.dtype,
                pre_norm=True, hidden_dropout=0.0, attention_dropout=0.0,
                name=f"layer_{i}",
            )(tokens)
        tokens = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="final_ln")(tokens)
        return nn.Dense(cfg.num_classes, dtype=self.dtype, name="head")(
            tokens[:, 0]
        )


class _Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         scale_init=nn.initializers.zeros, name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(residual + y)


class ResNet50Features(nn.Module):
    """ResNet50 pooled features (2048-d) — the RSME image-encoder variant
    (RSME/image_encoder.py Resnet50 branch, R6)."""

    dtype: jnp.dtype = jnp.float32
    num_classes: int = 0  # 0 -> pooled features, else classifier logits

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, train: bool = False):
        x = pixel_values.astype(self.dtype).transpose(0, 2, 3, 1)  # NHWC
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        plan = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        for si, (feats, blocks, stride) in enumerate(plan):
            for bi in range(blocks):
                x = _Bottleneck(feats, strides=stride if bi == 0 else 1,
                                dtype=self.dtype,
                                name=f"stage{si}_block{bi}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)
        if self.num_classes:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
