"""ViLBERT: two-stream transformer with co-attention connection layers.

TPU-native re-design of MarT/models/vilbert.py (M7):

- text stream (BERT-base, adaptive analogy mask — vilbert.py:421-454) and a
  region-feature visual stream with its own width (v_hidden_size);
- the interleave schedule follows v_biattention_id / t_biattention_id
  (vilbert.py:979-1025): advance each stream to the next rendezvous layer,
  run a BertConnectionLayer (bi-directional cross-attention + per-stream
  FFN), repeat; leftover layers run after the last rendezvous;
- region features arrive as (B, 72, 2048) + visual_attention_mask
  (data_module.py:129-159); spatial location features are optional and
  default to zeros (the reference's 5-d loc boxes are part of its detector
  cache, vilbert.py:1438-1460);
- MLM over the text stream with the tied decoder.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import attention_bias
from .common import (
    AnalogyEncoderLayer,
    EncoderLayer,
    MLMTransform,
    gather_positions,
    get_activation,
    tied_logits,
)
from .unimo import TextConfig, TextEmbeddings


@dataclass(frozen=True)
class VilBertConfig:
    text: TextConfig = field(default_factory=TextConfig)
    v_hidden_size: int = 1024
    v_num_layers: int = 6
    v_num_heads: int = 8
    v_intermediate_size: int = 1024
    v_feature_size: int = 2048
    v_loc_size: int = 5
    bi_hidden_size: int = 1024
    bi_num_heads: int = 8
    v_biattention_id: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    t_biattention_id: Tuple[int, ...] = (6, 7, 8, 9, 10, 11)
    layer_norm_eps: float = 1e-12
    dtype: str = "bfloat16"
    # DIAGNOSTIC (not reference behavior): drop the image->text co-attention
    # context. In the zero-region-feature regime every image token is the
    # same learned constant, so each connection layer force-injects a
    # constant vector into every text position (softmax over identical
    # keys is uniform) — this flag isolates that injection as the cause of
    # the from-scratch collapse (RESULTS.md ViLBERT 0.082 vs VisualBERT
    # 0.179 under the same handicap).
    ablate_img_to_txt: bool = False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class CrossAttention(nn.Module):
    """Queries from one stream over keys/values of the other, through a
    shared bi_hidden width (BertBiAttention halves, vilbert.py:715-860)."""

    num_heads: int
    bi_hidden: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q_states, kv_states, kv_bias=None, deterministic=True):
        head_dim = self.bi_hidden // self.num_heads
        b, lq, _ = q_states.shape
        lk = kv_states.shape[1]

        def split(x, l):
            return x.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(nn.Dense(self.bi_hidden, dtype=self.dtype, name="query")(q_states), lq)
        k = split(nn.Dense(self.bi_hidden, dtype=self.dtype, name="key")(kv_states), lk)
        v = split(nn.Dense(self.bi_hidden, dtype=self.dtype, name="value")(kv_states), lk)
        scale = jnp.asarray(head_dim, jnp.float32) ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if kv_bias is not None:
            scores = scores + kv_bias.astype(scores.dtype)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, lq, self.bi_hidden)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(ctx)


class ConnectionLayer(nn.Module):
    """Bi-attention exchange + per-stream FFN (BertConnectionLayer,
    vilbert.py:876-950)."""

    cfg: VilBertConfig

    @nn.compact
    def __call__(self, img, txt, img_bias, txt_bias, boundary=None,
                 deterministic=True):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        eps = cfg.layer_norm_eps
        # image queries attend text; text queries attend image
        img_ctx = CrossAttention(
            cfg.bi_num_heads, cfg.bi_hidden_size, cfg.v_hidden_size,
            dtype=dtype, name="img_from_txt",
        )(img, txt, kv_bias=txt_bias, deterministic=deterministic)
        txt_ctx = CrossAttention(
            cfg.bi_num_heads, cfg.bi_hidden_size, cfg.text.hidden_size,
            dtype=dtype, name="txt_from_img",
        )(txt, img, kv_bias=img_bias, deterministic=deterministic)
        if cfg.ablate_img_to_txt:
            txt_ctx = jnp.zeros_like(txt_ctx)
        drop = nn.Dropout(cfg.text.hidden_dropout)
        img = nn.LayerNorm(epsilon=eps, dtype=dtype, name="img_ln")(
            img + drop(img_ctx, deterministic=deterministic)
        )
        txt = nn.LayerNorm(epsilon=eps, dtype=dtype, name="txt_ln")(
            txt + drop(txt_ctx, deterministic=deterministic)
        )

        def ffn(x, width, inter, name):
            h = nn.Dense(inter, dtype=dtype, name=f"{name}_fc1")(x)
            h = get_activation("gelu")(h)
            h = nn.Dense(width, dtype=dtype, name=f"{name}_fc2")(h)
            h = drop(h, deterministic=deterministic)
            return nn.LayerNorm(epsilon=eps, dtype=dtype, name=f"{name}_ln")(x + h)

        img = ffn(img, cfg.v_hidden_size, cfg.v_intermediate_size, "img_ffn")
        txt = ffn(txt, cfg.text.hidden_size, cfg.text.intermediate_size, "txt_ffn")
        return img, txt


class VilBertForMaskedLM(nn.Module):
    cfg: VilBertConfig

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
        self.image_proj = nn.Dense(cfg.v_hidden_size, dtype=dtype,
                                   name="image_proj")
        self.loc_proj = nn.Dense(cfg.v_hidden_size, dtype=dtype,
                                 name="loc_proj")
        self.image_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                                     name="image_ln")
        self.t_layers = [
            AnalogyEncoderLayer(
                hidden_size=t.hidden_size, num_heads=t.num_heads,
                intermediate_size=t.intermediate_size, hidden_act=t.hidden_act,
                layer_norm_eps=cfg.layer_norm_eps, dtype=dtype,
                hidden_dropout=t.hidden_dropout,
                attention_dropout=t.attention_dropout, name=f"t_layer_{i}",
                row_start=1,  # vilbert.py:452 scales rows 1:idx2
            )
            for i in range(t.num_layers)
        ]
        self.v_layers = [
            EncoderLayer(
                hidden_size=cfg.v_hidden_size, num_heads=cfg.v_num_heads,
                intermediate_size=cfg.v_intermediate_size, hidden_act="gelu",
                layer_norm_eps=cfg.layer_norm_eps, dtype=dtype,
                hidden_dropout=t.hidden_dropout,
                attention_dropout=t.attention_dropout, name=f"v_layer_{i}",
            )
            for i in range(cfg.v_num_layers)
        ]
        self.c_layers = [
            ConnectionLayer(cfg, name=f"c_layer_{i}")
            for i in range(len(cfg.v_biattention_id))
        ]
        self.mlm_transform = MLMTransform(
            t.hidden_size, t.hidden_act, cfg.layer_norm_eps, dtype=dtype
        )

    def __call__(
        self,
        input_ids,
        attention_mask,
        token_type_ids,
        pixel_values,  # (B, 72, 2048) region features
        positions,
        boundary=None,
        visual_attention_mask=None,
        image_locs: Optional[jnp.ndarray] = None,
        deterministic=True,
    ):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        txt = self.text_embeddings(
            input_ids, token_type_ids, self.word_embeddings, deterministic
        )
        img = self.image_proj(pixel_values.astype(dtype))
        if image_locs is not None:
            img = img + self.loc_proj(image_locs.astype(dtype))
        img = self.image_ln(img)
        if visual_attention_mask is None:
            visual_attention_mask = jnp.ones(pixel_values.shape[:2],
                                             attention_mask.dtype)
        txt_bias = attention_bias(attention_mask)
        img_bias = attention_bias(visual_attention_mask)

        t_start, v_start = 0, 0
        for count, (v_id, t_id) in enumerate(
            zip(cfg.v_biattention_id, cfg.t_biattention_id)
        ):
            for idx in range(t_start, t_id):
                txt = self.t_layers[idx](
                    txt, attn_bias=txt_bias, boundary=boundary,
                    deterministic=deterministic,
                )
            for idx in range(v_start, v_id):
                img = self.v_layers[idx](img, attn_bias=img_bias,
                                         deterministic=deterministic)
            img, txt = self.c_layers[count](
                img, txt, img_bias, txt_bias, boundary=boundary,
                deterministic=deterministic,
            )
            t_start, v_start = t_id, v_id
        for idx in range(v_start, cfg.v_num_layers):
            img = self.v_layers[idx](img, attn_bias=img_bias,
                                     deterministic=deterministic)
        for idx in range(t_start, cfg.text.num_layers):
            txt = self.t_layers[idx](
                txt, attn_bias=txt_bias, boundary=boundary,
                deterministic=deterministic,
            )
        return self.mlm_transform(gather_positions(txt, positions))

    def logits(self, trans_hidden, vocab_ids=None, vocab_start=None,
               vocab_end=None):
        return tied_logits(
            self.word_embeddings, self.mlm_bias, trans_hidden,
            self.cfg.compute_dtype, vocab_ids, vocab_start, vocab_end,
        )
