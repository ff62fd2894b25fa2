"""VisualBERT: single-stream BERT over [text ; 72 x 2048 detector region
features].

TPU-native re-design of MarT/models/modeling_visual_bert.py (M6):

- the sequence is [text(0..L) ; visual(L..L+72)]
  (modeling_visual_bert.py:196);
- reference-exact embeddings (modeling_visual_bert.py:72-201): text =
  word + token-type + position; visual = projection(features) +
  visual-position row 0 (every region shares position id 0) +
  visual-token-type row 1; one shared LayerNorm + dropout over the
  concatenated sequence;
- the adaptive analogy mask scales only text->text attention by default
  (the reference offsets its slice bounds by the image length even though
  its sequence is text-first, modeling_visual_bert.py:255-260, 864-866 —
  see ops/masks.analogy_score_multiplier); set
  ``compat_ref_mask_offset=True`` to reproduce the reference geometry
  bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import attention_bias
from .common import AnalogyEncoderLayer, MLMTransform, gather_positions, tied_logits
from .unimo import TextConfig


@dataclass(frozen=True)
class VisualBertConfig:
    text: TextConfig = field(default_factory=TextConfig)
    visual_embedding_dim: int = 2048
    num_regions: int = 72
    dtype: str = "bfloat16"
    # opt-in reference quirk: apply the adaptive mask with sep_idx shifted
    # by the image length (modeling_visual_bert.py:864-866)
    compat_ref_mask_offset: bool = False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class VisualBertEmbeddings(nn.Module):
    """Reference-exact joint embedding (modeling_visual_bert.py:72-201):
    all regions share visual-position row 0 and visual-token-type row 1,
    and one LayerNorm covers the concatenated sequence."""

    cfg: VisualBertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, visual_feats, word_table,
                 deterministic=True):
        cfg = self.cfg
        t = cfg.text
        dtype = cfg.compute_dtype
        L = input_ids.shape[1]
        init = nn.initializers.normal(t.initializer_range)
        pos_table = self.param(
            "position_embeddings", init, (t.max_position_embeddings, t.hidden_size)
        )
        type_table = self.param(
            "token_type_embeddings", init, (t.type_vocab_size, t.hidden_size)
        )
        vis_pos_table = self.param(
            "visual_position_embeddings", init,
            (t.max_position_embeddings, t.hidden_size),
        )
        vis_type_table = self.param(
            "visual_token_type_embeddings", init,
            (t.type_vocab_size, t.hidden_size),
        )
        txt = (
            jnp.take(word_table, input_ids, axis=0).astype(dtype)
            + jnp.take(type_table, token_type_ids, axis=0).astype(dtype)
            + pos_table[:L][None].astype(dtype)
        )
        vis = nn.Dense(t.hidden_size, dtype=dtype, name="visual_projection")(
            visual_feats.astype(dtype)
        )
        # every region gets position id 0 and token-type id 1
        # (modeling_visual_bert.py:188-195)
        vis = vis + vis_pos_table[0].astype(dtype) + vis_type_table[1].astype(dtype)
        x = jnp.concatenate([txt, vis], axis=1)
        x = nn.LayerNorm(epsilon=t.layer_norm_eps, dtype=dtype, name="ln")(x)
        return nn.Dropout(t.hidden_dropout)(x, deterministic=deterministic)


class VisualBertForMaskedLM(nn.Module):
    cfg: VisualBertConfig

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
        self.embeddings = VisualBertEmbeddings(cfg)
        self.layers = [
            AnalogyEncoderLayer(
                hidden_size=t.hidden_size, num_heads=t.num_heads,
                intermediate_size=t.intermediate_size,
                hidden_act=t.hidden_act, layer_norm_eps=t.layer_norm_eps,
                dtype=dtype, hidden_dropout=t.hidden_dropout,
                attention_dropout=t.attention_dropout, name=f"layer_{i}",
                # corrected default: true text coordinates, rows from 1
                # (the reference's img_length+1 slice start suggests
                # "skip the CLS row"); compat flag reproduces the shifted
                # reference geometry instead
                row_start=1,
                compat_img_offset=(cfg.num_regions
                                   if cfg.compat_ref_mask_offset else None),
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
        L = input_ids.shape[1]
        x = self.embeddings(
            input_ids, token_type_ids, pixel_values, self.word_embeddings,
            deterministic=deterministic,
        )
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
