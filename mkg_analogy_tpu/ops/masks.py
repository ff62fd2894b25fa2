"""Attention-mask construction, fully vectorized.

The reference mutates per-example attention-score slices in a Python loop
with ``.clone()`` (modeling_unimo.py:342-349):

    scores[i, :, :idx2, idx2:] *= clamp(w0, 0.0, 0.5)   # example -> answer
    scores[i, :, idx2:, idx2:] *= clamp(w1, 0.5, 1.0)   # answer  -> answer

where ``idx2 = sep_idx[i][2]`` is the example/question boundary. On TPU that
becomes one broadcasted multiplier tensor built from iota comparisons — no
scatter, no dynamic slicing, batched over examples.

Per-family slice geometry in the reference (rows are queries, cols keys):

- UniMo        rows ``:idx2``                      (modeling_unimo.py:342-349)
- ViLBERT      rows ``1:idx2``  — skips the CLS row (vilbert.py:449-454)
- FLAVA        rows ``1:idx2``                     (modeling_flava.py:491-496)
- VisualBERT   rows ``img_length+1 : idx2+img_length`` with
  ``sep_idx += img_length`` — although its sequence is [text ; visual], so
  the scaled block lands across late-text/visual coordinates
  (modeling_visual_bert.py:255-260, 864-866)
- ViLT         same shifted geometry (modeling_vilt.py:370-375, 843-844)

For the single-stream models the shifted geometry is a reference quirk: the
default here applies the mask in true text coordinates (``text_len`` clamps
the scaled columns/rows to the text block). Pass ``compat_img_offset`` to
reproduce the reference bit-for-bit (opt-in quirk flag; see README
"Reference quirks handled deliberately").
"""

from __future__ import annotations

from typing import Optional

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
    text_len: Optional[int] = None,
    row_start: int = 0,
    compat_img_offset: Optional[int] = None,
) -> jnp.ndarray:
    """Per-example (B, 1, L, L) multiplier for raw attention scores.

    boundary: (B,) int — sep_idx[:, 2], the first position of the
    question/answer segment. Columns < boundary keep multiplier 1 (the
    answer may always attend back to the example); columns >= boundary are
    scaled by w0 for example rows and w1 for answer rows.

    ``row_start``: first example row that is scaled — 0 for UniMo
    (modeling_unimo.py:343), 1 for ViLBERT/FLAVA which skip the CLS row
    (vilbert.py:452, modeling_flava.py:493).

    ``text_len``: for single-stream models whose sequence is
    [text(0..text_len) ; visual(...)], positions >= text_len are visual
    tokens and keep multiplier 1 (the corrected default for
    VisualBERT/ViLT).

    ``compat_img_offset``: reproduce the reference's shifted geometry
    exactly — boundary and rows shift by the image length and the scaled
    columns run to the end of the full sequence
    (modeling_visual_bert.py:255-260,864-866; modeling_vilt.py:370-375,
    843-844). Mutually exclusive with ``text_len``.
    """
    w0 = jnp.clip(w_example_to_answer, 0.0, 0.5).astype(dtype)
    w1 = jnp.clip(w_answer_to_answer, 0.5, 1.0).astype(dtype)
    pos = jnp.arange(seq_len, dtype=boundary.dtype)
    if compat_img_offset is not None:
        assert text_len is None, "compat offset replaces text-coord clamping"
        boundary = boundary + compat_img_offset
        row_start = compat_img_offset + 1  # rows img_length+1:... (reference)
        is_text = jnp.ones_like(pos, bool)  # cols run to the end of the seq
    else:
        is_text = pos < (seq_len if text_len is None else text_len)
    row_is_example = (
        (pos[None, :] >= row_start) & (pos[None, :] < boundary[:, None])
    )[:, :, None]  # (B, L, 1)
    row_is_answer = (pos[None, :] >= boundary[:, None])[:, :, None]
    col_is_answer = (
        (pos[None, :] >= boundary[:, None]) & is_text[None, :]
    )[:, None, :]  # (B, 1, L)
    row_in_scope = (row_is_example | row_is_answer) & (
        is_text[None, :, None] | jnp.zeros_like(boundary[:, None, None], bool)
    )
    mult = jnp.where(
        col_is_answer & row_in_scope,
        jnp.where(row_is_example, w0, w1),
        jnp.asarray(1.0, dtype),
    )
    return mult[:, None, :, :]
