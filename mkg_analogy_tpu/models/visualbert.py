"""VisualBERT: single-stream BERT over [text ; 72 x 2048 detector region
features].

TPU-native re-design of MarT/models/modeling_visual_bert.py (M6): the
sequence is [text(0..L) ; visual(L..L+72)] (modeling_visual_bert.py:196),
region features are projected to hidden size with modality type/position
embeddings, and the adaptive analogy mask scales only text->text attention
(the reference offsets its slice bounds by the image length even though its
sequence is text-first, modeling_visual_bert.py:255-260 — see
ops/masks.analogy_score_multiplier for the documented correction).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import attention_bias
from .common import AnalogyEncoderLayer, MLMTransform, gather_positions, tied_logits
from .unimo import TextConfig, TextEmbeddings


@dataclass(frozen=True)
class VisualBertConfig:
    text: TextConfig = field(default_factory=TextConfig)
    visual_embedding_dim: int = 2048
    num_regions: int = 72
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class VisualBertForMaskedLM(nn.Module):
    cfg: VisualBertConfig

    def setup(self):
        t = self.cfg.text
        dtype = self.cfg.compute_dtype
        self.word_embeddings = self.param(
            "word_embeddings", nn.initializers.normal(t.initializer_range),
            (t.vocab_size, t.hidden_size),
        )
        self.mlm_bias = self.param("mlm_bias", nn.initializers.zeros,
                                   (t.vocab_size,))
        self.text_embeddings = TextEmbeddings(t, dtype=dtype)
        self.visual_projection = nn.Dense(t.hidden_size, dtype=dtype,
                                          name="visual_projection")
        self.visual_position = self.param(
            "visual_position", nn.initializers.normal(t.initializer_range),
            (self.cfg.num_regions, t.hidden_size),
        )
        self.visual_type = self.param(
            "visual_type", nn.initializers.normal(t.initializer_range),
            (t.hidden_size,),
        )
        self.visual_ln = nn.LayerNorm(epsilon=t.layer_norm_eps, dtype=dtype,
                                      name="visual_ln")
        self.layers = [
            AnalogyEncoderLayer(
                hidden_size=t.hidden_size, num_heads=t.num_heads,
                intermediate_size=t.intermediate_size,
                hidden_act=t.hidden_act, layer_norm_eps=t.layer_norm_eps,
                dtype=dtype, hidden_dropout=t.hidden_dropout,
                attention_dropout=t.attention_dropout, name=f"layer_{i}",
            )
            for i in range(t.num_layers)
        ]
        self.mlm_transform = MLMTransform(
            t.hidden_size, t.hidden_act, t.layer_norm_eps, dtype=dtype
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
        deterministic=True,
    ):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        L = input_ids.shape[1]
        txt = self.text_embeddings(
            input_ids, token_type_ids, self.word_embeddings, deterministic
        )
        vis = self.visual_projection(pixel_values.astype(dtype))
        vis = vis + self.visual_position[None].astype(dtype)
        vis = vis + self.visual_type.astype(dtype)
        vis = self.visual_ln(vis)
        x = jnp.concatenate([txt, vis], axis=1)
        if visual_attention_mask is None:
            visual_attention_mask = jnp.ones(pixel_values.shape[:2],
                                             attention_mask.dtype)
        full_mask = jnp.concatenate(
            [attention_mask, visual_attention_mask.astype(attention_mask.dtype)],
            axis=1,
        )
        bias = attention_bias(full_mask)
        for layer in self.layers:
            x = layer(x, attn_bias=bias, boundary=boundary, text_len=L,
                      deterministic=deterministic)
        text_seq = x[:, :L]
        return self.mlm_transform(gather_positions(text_seq, positions))

    def logits(self, trans_hidden, vocab_ids=None, vocab_start=None,
               vocab_end=None):
        return tied_logits(
            self.word_embeddings, self.mlm_bias, trans_hidden,
            self.cfg.compute_dtype, vocab_ids, vocab_start, vocab_end,
        )
