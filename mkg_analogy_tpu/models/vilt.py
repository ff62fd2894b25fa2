"""ViLT: single-stream pre-LN transformer over [text ; patches of 2 images].

TPU-native re-design of MarT/models/modeling_vilt.py (M8):

- both 384x384 images are patch-embedded (32x32 -> 144 patches + CLS each)
  and concatenated after the text (modeling_vilt.py:216-224, 240);
- modality type embeddings (0=text, 1=image) are added on top of the text's
  segment token-types (modeling_vilt.py:232-236);
- the reference's multinomial patch sampling with interpolated positions
  (modeling_vilt.py:112-196) exists to bound dynamic sequence lengths; with
  fixed-size square inputs every patch is valid, so we keep all 145 tokens
  per image — static shapes, no sampling;
- adaptive analogy mask on text->text attention in true text coordinates
  (the reference shifts sep_idx by the image length although images FOLLOW
  the text, modeling_vilt.py:843-844 + 370-375 — see ops/masks); set
  ``compat_ref_mask_offset=True`` to reproduce the reference geometry;
- embedding dropout on the image tokens after position add
  (modeling_vilt.py:189-192).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import attention_bias
from .common import (
    AnalogyEncoderLayer,
    MLMTransform,
    PatchEmbed,
    gather_positions,
    tied_logits,
)
from .unimo import TextConfig, TextEmbeddings


@dataclass(frozen=True)
class ViltConfig:
    text: TextConfig = field(default_factory=TextConfig)
    image_size: int = 384
    patch_size: int = 32
    num_images: int = 2
    layer_norm_eps: float = 1e-12
    dtype: str = "bfloat16"
    # opt-in reference quirk: apply the adaptive mask with sep_idx shifted
    # by the image length (modeling_vilt.py:843-844)
    compat_ref_mask_offset: bool = False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def patches_per_image(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def tokens_per_image(self) -> int:
        return self.patches_per_image + 1  # + per-image CLS


class ViltImageEmbeddings(nn.Module):
    cfg: ViltConfig

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        b = pixel_values.shape[0]
        n_img = cfg.num_images
        x = pixel_values.astype(dtype).reshape(
            b * n_img, 3, cfg.image_size, cfg.image_size
        ).transpose(0, 2, 3, 1)
        patches = PatchEmbed(
            cfg.text.hidden_size, cfg.patch_size, dtype=dtype, use_bias=True,
            name="patch_embedding",
        )(x)  # (B*N, patches, H)
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02),
            (1, 1, cfg.text.hidden_size),
        )
        cls = jnp.broadcast_to(cls.astype(dtype), (b * n_img, 1, cfg.text.hidden_size))
        tokens = jnp.concatenate([cls, patches], axis=1)  # (B*N, 145, H)
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (cfg.tokens_per_image, cfg.text.hidden_size),
        )
        tokens = tokens + pos[None].astype(dtype)
        # embedding dropout on the image path (modeling_vilt.py:189-192)
        tokens = nn.Dropout(cfg.text.hidden_dropout)(
            tokens, deterministic=deterministic
        )
        return tokens.reshape(b, n_img * cfg.tokens_per_image,
                              cfg.text.hidden_size)


class ViltForMaskedLM(nn.Module):
    cfg: ViltConfig

    def setup(self):
        cfg = self.cfg
        t = cfg.text
        dtype = cfg.compute_dtype
        self.word_embeddings = self.param(
            "word_embeddings", nn.initializers.normal(t.initializer_range),
            (t.vocab_size, t.hidden_size),
        )
        self.mlm_bias = self.param("mlm_bias", nn.initializers.zeros,
                                   (t.vocab_size,))
        self.text_embeddings = TextEmbeddings(t, dtype=dtype)
        self.image_embeddings = ViltImageEmbeddings(cfg)
        # modality type embeddings: 0 = text, 1 = image (vilt parity)
        self.modal_type = self.param(
            "modal_type_embeddings", nn.initializers.normal(0.02),
            (2, t.hidden_size),
        )
        self.layers = [
            AnalogyEncoderLayer(
                hidden_size=t.hidden_size, num_heads=t.num_heads,
                intermediate_size=t.intermediate_size, hidden_act="gelu",
                layer_norm_eps=cfg.layer_norm_eps, dtype=dtype, pre_norm=True,
                hidden_dropout=t.hidden_dropout,
                attention_dropout=t.attention_dropout, name=f"layer_{i}",
                # corrected default: text coordinates, rows from 1 (the
                # reference's img_length+1 slice start, modeling_vilt.py:371)
                row_start=1,
                compat_img_offset=(
                    cfg.num_images * cfg.tokens_per_image
                    if cfg.compat_ref_mask_offset else None
                ),
            )
            for i in range(t.num_layers)
        ]
        self.final_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                                     name="final_ln")
        self.mlm_transform = MLMTransform(
            t.hidden_size, "gelu", cfg.layer_norm_eps, dtype=dtype
        )

    def __call__(
        self,
        input_ids,
        attention_mask,
        token_type_ids,
        pixel_values,  # (B, 2, 3, 384, 384)
        positions,
        boundary=None,
        visual_attention_mask=None,
        deterministic=True,
    ):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        L = input_ids.shape[1]
        txt = self.text_embeddings(
            input_ids, token_type_ids, self.word_embeddings, deterministic
        )
        txt = txt + self.modal_type[0].astype(dtype)
        img = self.image_embeddings(pixel_values,
                                    deterministic=deterministic)
        img = img + self.modal_type[1].astype(dtype)
        x = jnp.concatenate([txt, img], axis=1)
        img_mask = jnp.ones(img.shape[:2], attention_mask.dtype)
        bias = attention_bias(
            jnp.concatenate([attention_mask, img_mask], axis=1)
        )
        for layer in self.layers:
            x = layer(x, attn_bias=bias, boundary=boundary, text_len=L,
                      deterministic=deterministic)
        x = self.final_ln(x)
        text_seq = x[:, :L]  # MLM over the text slice (modeling_vilt.py:949-952)
        return self.mlm_transform(gather_positions(text_seq, positions))

    def logits(self, trans_hidden, vocab_ids=None, vocab_start=None,
               vocab_end=None):
        return tied_logits(
            self.word_embeddings, self.mlm_bias, trans_hidden,
            self.cfg.compute_dtype, vocab_ids, vocab_start, vocab_end,
        )
