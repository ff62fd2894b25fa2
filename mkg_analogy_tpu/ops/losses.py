"""Loss functions.

- ``label_smoothing_cross_entropy`` — parity with
  MarT/lit_models/utils.py:30 (LabelSmoothSoftmaxCEV1): smoothed target is
  ``(1-s)`` on the label and ``s/C`` on *every* class (including the label),
  ignore_index rows dropped from the mean.
- ``relaxation_loss`` — MarT/lit_models/transformer.py:103-108: pull the
  example-pair relation representation toward the question-pair relation,
  push the question head away from the answer head.
"""

from __future__ import annotations

import jax.numpy as jnp


def _log_softmax(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(x, axis=-1, keepdims=True)
    shifted = x - m
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))


def label_smoothing_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    smoothing: float = 0.1,
    ignore_index: int = -100,
) -> jnp.ndarray:
    """Mean label-smoothed CE. logits (B, C), computed in fp32; labels (B,)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = _log_softmax(logits)
    label_logp = jnp.take_along_axis(logp, safe_labels[:, None], axis=1)[:, 0]
    lb_pos = 1.0 - smoothing
    lb_neg = smoothing / num_classes
    # Reference target (utils.py:30): fill lb_neg everywhere then *scatter*
    # lb_pos over the label cell (replacing, not adding), so
    # <target, logp> = (lb_pos - lb_neg) * logp[label] + lb_neg * sum(logp).
    loss = -((lb_pos - lb_neg) * label_logp + lb_neg * jnp.sum(logp, axis=-1))
    loss = jnp.where(valid, loss, 0.0)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(loss) / n_valid


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Row-wise cosine similarity; per-vector norms clamped at ``eps``
    (torch.nn.functional.cosine_similarity semantics)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def relaxation_loss(
    q_head_hidden: jnp.ndarray,
    a_head_hidden: jnp.ndarray,
    rel_hidden: jnp.ndarray,
    r_hidden: jnp.ndarray,
) -> jnp.ndarray:
    """mean( relu(cos(q_head, a_head)) + 1 - cos(rel_example, rel_question) )."""
    ent_term = jnp.maximum(cosine_similarity(q_head_hidden, a_head_hidden), 0.0)
    rel_term = 1.0 - cosine_similarity(rel_hidden, r_hidden)
    return jnp.mean(ent_term + rel_term)
