"""Shared Flax building blocks for the vision-language model family."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACT2FN: dict = {
    "gelu": nn.gelu,
    "relu": nn.relu,
    "quick_gelu": quick_gelu,
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
}


def get_activation(name: str) -> Callable:
    return ACT2FN[name]


class AttentionCore(nn.Module):
    """Q/K/V projection + scaled dot-product attention on (B, L, H) inputs.

    TPU notes: head layout (B, heads, L, D); softmax in fp32; optional
    per-example score multiplier (adaptive analogy mask) and optional extra
    key/value states *prepended* to the keys (UniMo passes text K/V into the
    vision tower that way, modeling_unimo.py:227-229).
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    dropout_rate: float = 0.0
    out_bias: bool = True

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray] = None,
        score_multiplier: Optional[jnp.ndarray] = None,
        extra_kv: Optional[tuple] = None,
        extra_kv_bias: Optional[jnp.ndarray] = None,
        output_kv: bool = False,
        deterministic: bool = True,
    ):
        b, l, _ = hidden_states.shape
        inner = self.num_heads * self.head_dim

        def proj(name):
            return nn.Dense(inner, dtype=self.dtype, name=name)(hidden_states)

        def split_heads(x):
            return x.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        q = split_heads(proj("query"))
        k = split_heads(proj("key"))
        v = split_heads(proj("value"))
        kv_out = (k, v) if output_kv else None

        if extra_kv is not None:
            n_extra = extra_kv[0].shape[2]
            k = jnp.concatenate([extra_kv[0].astype(k.dtype), k], axis=2)
            v = jnp.concatenate([extra_kv[1].astype(v.dtype), v], axis=2)
            if extra_kv_bias is not None:
                # Mask padded text keys when they feed another tower's
                # attention. (The reference leaves PAD embeddings attendable,
                # making outputs depend on per-batch pad length —
                # modeling_unimo.py:481-527 has no mask on the vision side.
                # Masking is the static-shape-correct behavior.)
                zeros = jnp.zeros(
                    extra_kv_bias.shape[:-1] + (l,), extra_kv_bias.dtype
                )
                assert attention_bias is None
                attention_bias = jnp.concatenate([extra_kv_bias, zeros], axis=-1)

        scale = jnp.asarray(self.head_dim, jnp.float32) ** -0.5
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if score_multiplier is not None:
            scores = scores * score_multiplier.astype(scores.dtype)
        if attention_bias is not None:
            scores = scores + attention_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        if self.dropout_rate > 0.0:
            probs = nn.Dropout(self.dropout_rate)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, inner)
        out = nn.Dense(inner, dtype=self.dtype, use_bias=self.out_bias, name="out")(ctx)
        return out, kv_out


def gather_positions(seq: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """seq (B, L, H), positions (B, P) -> (B, P, H) via take_along_axis."""
    return jnp.take_along_axis(seq, positions[:, :, None], axis=1)


class MLMTransform(nn.Module):
    """BertPredictionHeadTransform: dense + act + LayerNorm
    (modeling_unimo.py:962-976)."""

    hidden_size: int
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="dense")(x)
        x = get_activation(self.hidden_act)(x)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="ln")(x)
