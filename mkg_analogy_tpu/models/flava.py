"""FLAVA: separate image/text towers + multimodal fusion tower.

TPU-native re-design of MarT/models/modeling_flava.py (M9):

- image tower (ViT-B/16 pre-LN) embeds BOTH images: [CLS ; patches(head)]
  gets position rows 0..P, patches(tail) get position rows 0..P-1 (the
  reference reuses the table head *including* the CLS row,
  modeling_flava.py:336-343) -> 2*196 + 1 = 393 tokens;
- text tower applies the adaptive analogy mask inside its attention with
  rows starting at 1 (modeling_flava.py:491-496);
- the multimodal tower consumes the towers' *pre-final-layernorm* states
  ("Note that these states don't use final layernorm",
  modeling_flava.py:1429-1450), runs UNMASKED (the reference passes no
  attention mask to the multimodal model, modeling_flava.py:1456), prepends
  its own CLS, and the MLM head reads the text slice of its post-layernorm
  output (modeling_flava.py:1452-1457, 2127-2204). The towers' final
  layernorms and poolers are dead parameters in the MaskedLM path and are
  not instantiated here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import attention_bias
from .common import (
    AnalogyEncoderLayer,
    EncoderLayer,
    MLMTransform,
    PatchEmbed,
    gather_positions,
    tied_logits,
)
from .unimo import TextConfig, TextEmbeddings


@dataclass(frozen=True)
class FlavaConfig:
    text: TextConfig = field(default_factory=TextConfig)
    image_size: int = 224
    patch_size: int = 16
    image_layers: int = 12
    multimodal_layers: int = 6
    layer_norm_eps: float = 1e-12
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def patches_per_image(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def image_tokens(self) -> int:
        return 2 * self.patches_per_image + 1  # head CLS + 2x patches


class FlavaImageEmbeddings(nn.Module):
    """Stacked 2-image embedding: [CLS ; patches(head) ; patches(tail)] with
    positions [pos ; pos[1:]] (modeling_flava.py:310-344)."""

    cfg: FlavaConfig

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        H = cfg.text.hidden_size
        b = pixel_values.shape[0]
        x = pixel_values.astype(dtype).reshape(
            b * 2, 3, cfg.image_size, cfg.image_size
        ).transpose(0, 2, 3, 1)
        patches = PatchEmbed(
            H, cfg.patch_size, dtype=dtype, use_bias=True,
            name="patch_embedding",
        )(x).reshape(b, 2 * cfg.patches_per_image, H)
        # NOTE: HF FLAVA zero-inits CLS/positions and immediately loads
        # pretrained weights; training from scratch with a zero image store
        # would make the whole image tower exactly zero — every
        # zero-variance LayerNorm backward then scales gradients by
        # rsqrt(eps)=1e6 per layer and 12 stacked layers overflow to NaN.
        # Small random init keeps the variance positive.
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, H))
        cls = jnp.broadcast_to(cls.astype(dtype), (b, 1, H))
        tokens = jnp.concatenate([cls, patches], axis=1)
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (cfg.patches_per_image + 1, H),
        ).astype(dtype)
        # tail patches reuse table rows 0..P-1 (including the CLS row 0 —
        # modeling_flava.py:336-343: position_embeddings[:, :tail.shape[1]])
        full_pos = jnp.concatenate([pos, pos[: cfg.patches_per_image]], axis=0)
        tokens = tokens + full_pos[None]
        return nn.Dropout(cfg.text.hidden_dropout)(
            tokens, deterministic=deterministic
        )


class FlavaForMaskedLM(nn.Module):
    cfg: FlavaConfig

    def setup(self):
        cfg = self.cfg
        t = cfg.text
        dtype = cfg.compute_dtype
        H = t.hidden_size
        self.word_embeddings = self.param(
            "word_embeddings", nn.initializers.normal(t.initializer_range),
            (t.vocab_size, H),
        )
        self.mlm_bias = self.param("mlm_bias", nn.initializers.zeros,
                                   (t.vocab_size,))
        self.image_embeddings = FlavaImageEmbeddings(cfg)
        self.text_embeddings = TextEmbeddings(t, dtype=dtype)

        def vit_layer(i, name, analogy=False):
            klass = AnalogyEncoderLayer if analogy else EncoderLayer
            extra = {"row_start": 1} if analogy else {}  # flava:493 rows 1:idx2
            return klass(
                **extra,
                hidden_size=H, num_heads=t.num_heads,
                intermediate_size=t.intermediate_size, hidden_act="gelu",
                layer_norm_eps=cfg.layer_norm_eps, dtype=dtype, pre_norm=True,
                hidden_dropout=t.hidden_dropout,
                attention_dropout=t.attention_dropout, name=f"{name}_{i}",
            )

        self.image_layers = [vit_layer(i, "image") for i in range(cfg.image_layers)]
        self.text_layers = [
            vit_layer(i, "text", analogy=True) for i in range(t.num_layers)
        ]
        self.image_to_mm = nn.Dense(H, dtype=dtype, name="image_to_mm")
        self.text_to_mm = nn.Dense(H, dtype=dtype, name="text_to_mm")
        self.mm_cls = self.param("mm_cls_token", nn.initializers.normal(0.02),
                                 (1, 1, H))
        self.mm_layers = [
            vit_layer(i, "mm") for i in range(cfg.multimodal_layers)
        ]
        self.mm_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                                  name="mm_ln")
        self.mlm_transform = MLMTransform(H, "gelu", cfg.layer_norm_eps,
                                          dtype=dtype)

    def __call__(
        self,
        input_ids,
        attention_mask,
        token_type_ids,
        pixel_values,  # (B, 2, 3, 224, 224)
        positions,
        boundary=None,
        visual_attention_mask=None,
        deterministic=True,
    ):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        b, L = input_ids.shape

        img = self.image_embeddings(pixel_values, deterministic=deterministic)
        for layer in self.image_layers:
            img = layer(img, deterministic=deterministic)

        txt = self.text_embeddings(
            input_ids, token_type_ids, self.word_embeddings, deterministic
        )
        txt_bias = attention_bias(attention_mask)
        for layer in self.text_layers:
            txt = layer(txt, attn_bias=txt_bias, boundary=boundary,
                        deterministic=deterministic)

        # the multimodal tower consumes the PRE-final-layernorm states
        # (modeling_flava.py:1429-1450) and runs without an attention mask
        # (modeling_flava.py:1456) — reference-exact.
        mm_img = self.image_to_mm(img)
        mm_txt = self.text_to_mm(txt)
        cls = jnp.broadcast_to(
            self.mm_cls.astype(dtype), (b, 1, cfg.text.hidden_size)
        )
        mm = jnp.concatenate([cls, mm_img, mm_txt], axis=1)
        n_prefix = 1 + img.shape[1]
        for layer in self.mm_layers:
            mm = layer(mm, deterministic=deterministic)
        mm = self.mm_ln(mm)

        text_seq = mm[:, n_prefix:]  # MLM over the text slice (flava:2127-2204)
        return self.mlm_transform(gather_positions(text_seq, positions))

    def logits(self, trans_hidden, vocab_ids=None, vocab_start=None,
               vocab_end=None):
        return tied_logits(
            self.word_embeddings, self.mlm_bias, trans_hidden,
            self.cfg.compute_dtype, vocab_ids, vocab_start, vocab_end,
        )
