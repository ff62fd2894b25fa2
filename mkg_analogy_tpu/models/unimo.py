"""MKGformer / UniMo: dual-tower CLIP-ViT + BERT encoder advanced in lockstep.

TPU-native re-design of MarT/models/modeling_unimo.py:

- the 12 vision (CLIP) and 12 text (BERT) layers run in lockstep; from layer
  ``fusion_start`` (=8) the vision layer attends over [text K/V of the
  *previous* text layer ; vision tokens] (modeling_unimo.py:609-643 — note
  ``text_layer_output`` is read before reassignment, i.e. it is the previous
  iteration's output), and the text layer's FFN receives a softmax
  cross-attention fusion of the *current* vision hidden states
  (BertFusion, modeling_unimo.py:394-414, 452-463);
- the per-example adaptive analogy mask is a broadcasted multiplier tensor
  (ops/masks.py) instead of the reference's Python scatter loop
  (modeling_unimo.py:342-349);
- two images are patch-embedded and concatenated: [CLS, patches(img0),
  patches(img1)] with position embeddings [pos, pos[1:]]
  (modeling_unimo.py:119-132) — 2*(224/32)^2 + 1 = 99 vision tokens;
- the MLM head evaluates the tied decoder only at *gathered positions* and
  only over the requested vocab slice; computing (B, L, 42k) logits like the
  reference does, then indexing one row, wastes ~L× the decoder FLOPs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import attention_bias
from .common import (
    AttentionCore,
    MLMTransform,
    PatchEmbed,
    gather_positions,
    get_activation,
)


@dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 42112  # padded: wordpiece + entities + relations + [R]
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    initializer_range: float = 0.02

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class VisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 32
    num_images: int = 2
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    attention_dropout: float = 0.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patches_per_image(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_tokens(self) -> int:
        return self.num_images * self.patches_per_image + 1


@dataclass(frozen=True)
class UnimoConfig:
    text: TextConfig = field(default_factory=TextConfig)
    vision: VisionConfig = field(default_factory=VisionConfig)
    fusion_start: int = 8  # first layer with cross-modal flow (idx >= 8)
    dtype: str = "bfloat16"
    remat: bool = False  # jax.checkpoint each layer (memory for FLOPs)

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class CLIPVisionEmbeddings(nn.Module):
    """Patch-embed ``num_images`` images and concat with a single CLS token
    (modeling_unimo.py:100-132)."""

    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b = pixel_values.shape[0]
        # (B, N_img, 3, H, W) -> (B*N_img, H, W, 3) for lax conv via nn.Conv
        x = pixel_values.astype(self.dtype)
        n_img = cfg.num_images
        x = x.reshape(b * n_img, 3, cfg.image_size, cfg.image_size)
        x = x.transpose(0, 2, 3, 1)
        patches = PatchEmbed(
            cfg.hidden_size, cfg.patch_size, dtype=self.dtype, use_bias=False,
            name="patch_embedding",
        )(x)  # (B*N, 49, H)
        patches = patches.reshape(b, n_img * cfg.patches_per_image, cfg.hidden_size)

        cls = self.param(
            "class_embedding", nn.initializers.normal(1.0), (cfg.hidden_size,)
        )
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size))
        embeds = jnp.concatenate([cls, patches], axis=1)  # (B, 99, H)

        pos_table = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.patches_per_image + 1, cfg.hidden_size),
        ).astype(self.dtype)
        # [pos(50), pos[1:](49), pos[1:](49), ...] for num_images images
        pos = jnp.concatenate(
            [pos_table] + [pos_table[1:]] * (cfg.num_images - 1), axis=0
        )
        return embeds + pos[None, :, :]


class TextEmbeddings(nn.Module):
    """Word + position + token-type embeddings with LN/dropout. The word
    table is passed in (owned by the LM head for weight tying)."""

    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        token_type_ids: jnp.ndarray,
        word_table: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        seq_len = input_ids.shape[1]
        inputs_embeds = jnp.take(word_table, input_ids, axis=0).astype(self.dtype)
        pos_table = self.param(
            "position_embeddings",
            nn.initializers.normal(cfg.initializer_range),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        type_table = self.param(
            "token_type_embeddings",
            nn.initializers.normal(cfg.initializer_range),
            (cfg.type_vocab_size, cfg.hidden_size),
        )
        x = (
            inputs_embeds
            + pos_table[:seq_len][None].astype(self.dtype)
            + jnp.take(type_table, token_type_ids, axis=0).astype(self.dtype)
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln")(x)
        return nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)


class CLIPLayer(nn.Module):
    """Pre-LN CLIP encoder layer, optionally attending over prepended text
    K/V (modeling_unimo.py:481-527)."""

    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, extra_kv=None, extra_kv_bias=None, deterministic=True):
        cfg = self.cfg
        residual = x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln1")(x)
        h, _ = AttentionCore(
            num_heads=cfg.num_heads,
            head_dim=cfg.head_dim,
            dtype=self.dtype,
            dropout_rate=cfg.attention_dropout,
            name="attn",
        )(h, extra_kv=extra_kv, extra_kv_bias=extra_kv_bias,
          deterministic=deterministic)
        x = residual + h
        residual = x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = get_activation(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return residual + h


class BertFusion(nn.Module):
    """Parameter-free softmax cross-attention of text context over vision
    hidden states (modeling_unimo.py:394-414)."""

    @nn.compact
    def __call__(self, text_ctx: jnp.ndarray, vision_hidden: jnp.ndarray):
        scores = jnp.einsum(
            "blh,bvh->blv", text_ctx, vision_hidden,
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(scores, axis=-1).astype(vision_hidden.dtype)
        return jnp.einsum("blv,bvh->blh", probs, vision_hidden)


class BertLayer(nn.Module):
    """Post-LN BERT layer with adaptive analogy mask, optional vision fusion
    into the FFN, and optional K/V export (modeling_unimo.py:290-377,
    448-464, 530-577)."""

    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        attn_bias,
        boundary: Optional[jnp.ndarray] = None,
        vision_hidden: Optional[jnp.ndarray] = None,
        output_kv: bool = False,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        # Adaptive analogy mask scalars: w0 ~ U(0, 0.5), w1 = 0.5
        # (modeling_unimo.py:305-310).
        w0 = self.param(
            "adaptive_w0",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, 0.0, 0.5),
            (1,),
        )
        w1 = self.param("adaptive_w1", nn.initializers.constant(0.5), (1,))
        analogy = None
        if boundary is not None:
            # UniMo geometry: rows from 0, full text coords
            # (modeling_unimo.py:342-349)
            analogy = (boundary, w0, w1, 0, None, 0)
        out, kv, raw_ctx = AttentionCore(
            num_heads=cfg.num_heads,
            head_dim=cfg.head_dim,
            dtype=self.dtype,
            dropout_rate=cfg.attention_dropout,
            name="attn",
        )(
            x,
            attention_bias=attn_bias,
            analogy=analogy,
            output_kv=output_kv,
            output_context=True,
            deterministic=deterministic,
        )
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        attn_out = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="attn_ln"
        )(out + x)

        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(
            attn_out
        )
        # The reference instantiates fusion_dense in every BertIntermediate
        # (modeling_unimo.py:452) but only layers idx >= fusion_start call
        # it; flax materializes params lazily, so pre-fusion layers carry
        # none — the converters bridge the key surface (import drops the
        # reference's dead copies, export emits zeros for them).
        fusion_proj = nn.Dense(
            cfg.intermediate_size, dtype=self.dtype, name="fusion_dense"
        )
        if vision_hidden is not None:
            # fusion consumes the RAW attention context, pre out-projection
            # (modeling_unimo.py:367-373)
            fusion_out = BertFusion(name="fusion")(raw_ctx, vision_hidden)
            h = h + fusion_proj(fusion_out)
        h = get_activation(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(h)
        h = nn.Dropout(cfg.hidden_dropout)(h, deterministic=deterministic)
        out = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="out_ln"
        )(h + attn_out)
        return out, kv


class UnimoEncoder(nn.Module):
    """Lockstep dual-tower loop (modeling_unimo.py:580-658)."""

    cfg: UnimoConfig

    @nn.compact
    def __call__(
        self,
        vision_embeds,
        text_embeds,
        attn_bias,
        boundary=None,
        deterministic=True,
    ):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        assert cfg.text.num_layers == cfg.vision.num_layers
        vision_h, text_h = vision_embeds, text_embeds
        prev_text_kv: Optional[Tuple] = None
        CLIPLayerCls, BertLayerCls = CLIPLayer, BertLayer
        if cfg.remat:
            CLIPLayerCls = nn.remat(CLIPLayer, static_argnums=(4,))
            BertLayerCls = nn.remat(BertLayer, static_argnums=(5, 6))
        for idx in range(cfg.text.num_layers):
            # Vision layer idx >= fusion_start attends over the *previous*
            # text layer's K/V (exported from idx >= fusion_start - 1).
            extra_kv = prev_text_kv if idx >= cfg.fusion_start else None
            vision_h = CLIPLayerCls(cfg.vision, dtype=dtype, name=f"vision_{idx}")(
                vision_h,
                extra_kv,
                attn_bias if extra_kv is not None else None,
                deterministic,
            )
            vision_for_text = vision_h if idx >= cfg.fusion_start else None
            output_kv = idx >= cfg.fusion_start - 1
            text_h, kv = BertLayerCls(cfg.text, dtype=dtype, name=f"text_{idx}")(
                text_h,
                attn_bias,
                boundary,
                vision_for_text,
                output_kv,
                deterministic,
            )
            prev_text_kv = kv
        return text_h, vision_h


class UnimoForMaskedLM(nn.Module):
    """UniMo with a tied-embedding MLM head returning prediction logits over
    a vocab slice plus the transformed hidden states at gathered positions
    (modeling_unimo.py:839-959 parity, position-gathered for TPU)."""

    cfg: UnimoConfig

    def setup(self):
        cfg = self.cfg
        self.word_embeddings = self.param(
            "word_embeddings",
            nn.initializers.normal(cfg.text.initializer_range),
            (cfg.text.vocab_size, cfg.text.hidden_size),
        )
        self.mlm_bias = self.param(
            "mlm_bias", nn.initializers.zeros, (cfg.text.vocab_size,)
        )
        dtype = cfg.compute_dtype
        self.vision_embeddings = CLIPVisionEmbeddings(cfg.vision, dtype=dtype)
        self.vision_pre_ln = nn.LayerNorm(
            epsilon=cfg.vision.layer_norm_eps, dtype=dtype, name="vision_pre_ln"
        )
        self.text_embeddings = TextEmbeddings(cfg.text, dtype=dtype)
        self.encoder = UnimoEncoder(cfg)
        self.mlm_transform = MLMTransform(
            cfg.text.hidden_size,
            cfg.text.hidden_act,
            cfg.text.layer_norm_eps,
            dtype=dtype,
        )

    def encode(
        self,
        input_ids,
        attention_mask,
        token_type_ids,
        pixel_values,
        boundary=None,
        deterministic=True,
    ):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        vis = self.vision_embeddings(pixel_values)
        vis = self.vision_pre_ln(vis)
        txt = self.text_embeddings(
            input_ids, token_type_ids, self.word_embeddings, deterministic
        )
        bias = attention_bias(attention_mask, dtype=jnp.float32)
        text_h, vision_h = self.encoder(
            vis, txt, bias, boundary=boundary, deterministic=deterministic
        )
        return text_h

    def __call__(
        self,
        input_ids,
        attention_mask,
        token_type_ids,
        pixel_values,
        positions,
        boundary=None,
        visual_attention_mask=None,  # unused: UniMo consumes raw pixels
        deterministic=True,
    ):
        """Returns transformed hidden states at ``positions`` (B, P, H).

        Feed slices of this to :meth:`logits` for vocab scoring; the
        reference's ``trans_hidden_states`` (used by the relaxation loss)
        are exactly these vectors.
        """
        seq = self.encode(
            input_ids,
            attention_mask,
            token_type_ids,
            pixel_values,
            boundary=boundary,
            deterministic=deterministic,
        )
        gathered = gather_positions(seq, positions)
        return self.mlm_transform(gathered)

    def logits(self, trans_hidden, vocab_ids=None, vocab_start=None, vocab_end=None):
        """Tied-decoder logits for ``trans_hidden`` (..., H).

        ``vocab_ids`` — static int array of vocab rows (e.g. the 2,063
        analogy entities); or ``vocab_start/end`` — a contiguous range
        (pretrain entity/relation ranges); or neither — full vocab.
        """
        table = self.word_embeddings
        bias = self.mlm_bias
        if vocab_ids is not None:
            table = jnp.take(table, vocab_ids, axis=0)
            bias = jnp.take(bias, vocab_ids, axis=0)
        elif vocab_start is not None:
            table = jax.lax.slice_in_dim(table, vocab_start, vocab_end, axis=0)
            bias = jax.lax.slice_in_dim(bias, vocab_start, vocab_end, axis=0)
        x = trans_hidden.astype(self.cfg.compute_dtype)
        out = jnp.einsum(
            "...h,vh->...v", x, table.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        return out + bias.astype(jnp.float32)
