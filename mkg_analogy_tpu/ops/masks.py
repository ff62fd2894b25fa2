"""Attention-mask construction, fully vectorized.

The reference mutates per-example attention-score slices in a Python loop
with ``.clone()`` (modeling_unimo.py:342-349):

    scores[i, :, :idx2, idx2:] *= clamp(w0, 0.0, 0.5)   # example -> answer
    scores[i, :, idx2:, idx2:] *= clamp(w1, 0.5, 1.0)   # answer  -> answer

where ``idx2 = sep_idx[i][2]`` is the example/question boundary. On TPU that
becomes one broadcasted multiplier tensor built from iota comparisons — no
scatter, no dynamic slicing, batched over examples.
"""

from __future__ import annotations

import jax.numpy as jnp


def attention_bias(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, L) {0,1} padding mask -> (B, 1, 1, L) additive bias of 0 / -1e4.

    -10000 matches the reference (modeling_unimo.py:56) and is safely
    representable in bfloat16.
    """
    bias = (1.0 - attention_mask.astype(dtype)) * jnp.asarray(-10000.0, dtype)
    return bias[:, None, None, :]


def analogy_score_multiplier(
    boundary: jnp.ndarray,
    seq_len: int,
    w_example_to_answer: jnp.ndarray,
    w_answer_to_answer: jnp.ndarray,
    dtype=jnp.float32,
    text_len: int = None,
) -> jnp.ndarray:
    """Per-example (B, 1, L, L) multiplier for raw attention scores.

    boundary: (B,) int — sep_idx[:, 2], the first position of the
    question/answer segment. Columns < boundary keep multiplier 1 (the
    answer may always attend back to the example); columns >= boundary are
    scaled by w0 for example rows and w1 for answer rows.

    ``text_len``: for single-stream models whose sequence is
    [text(0..text_len) ; visual(...)], positions >= text_len are visual
    tokens and keep multiplier 1. (The reference's VisualBERT/ViLT variants
    offset the slice bounds by the *image* length even though their
    sequences are text-first — modeling_visual_bert.py:255-260,
    modeling_vilt.py:370-375 with modeling_vilt.py:843-844 — which ends up
    scaling image-to-image attention; we apply the mask in true text
    coordinates instead.)
    """
    w0 = jnp.clip(w_example_to_answer, 0.0, 0.5).astype(dtype)
    w1 = jnp.clip(w_answer_to_answer, 0.5, 1.0).astype(dtype)
    pos = jnp.arange(seq_len, dtype=boundary.dtype)
    is_text = pos < (seq_len if text_len is None else text_len)
    row_is_example = (pos[None, :] < boundary[:, None])[:, :, None]  # (B, L, 1)
    col_is_answer = (
        (pos[None, :] >= boundary[:, None]) & is_text[None, :]
    )[:, None, :]  # (B, 1, L)
    row_is_text = (is_text[None, :] | jnp.zeros_like(boundary[:, None], bool))[
        :, :, None
    ]
    mult = jnp.where(
        col_is_answer & row_is_text,
        jnp.where(row_is_example, w0, w1),
        jnp.asarray(1.0, dtype),
    )
    return mult[:, None, :, :]
