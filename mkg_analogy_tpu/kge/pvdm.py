"""PV-DM document vectors in JAX (TransAE's text modality).

The reference trains gensim Doc2Vec (PV-DM) over entity glossaries
(TransAE.py:21-65) to get 100-d text vectors per entity. gensim is not a
dependency of this framework, so we train the same objective natively:
predict a center word from the mean of its context-word vectors and the
document vector, with sampled-softmax negatives — one jitted step, whole
corpus batched.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

_TOKEN_RE = re.compile(r"[a-z]{2,15}")


def simple_preprocess(text: str) -> List[str]:
    """gensim.utils.simple_preprocess-like tokenization: lowercase ASCII
    alpha tokens of length 2..15."""
    return _TOKEN_RE.findall(text.lower())


@dataclass
class PVDMConfig:
    vector_size: int = 100
    window: int = 4
    min_count: int = 2
    epochs: int = 40
    negatives: int = 5
    lr: float = 0.01
    batch_size: int = 4096
    seed: int = 1


def _build_vocab(docs: Sequence[List[str]], min_count: int) -> Dict[str, int]:
    freq: Dict[str, int] = {}
    for d in docs:
        for w in d:
            freq[w] = freq.get(w, 0) + 1
    words = [w for w, c in sorted(freq.items()) if c >= min_count]
    return {w: i for i, w in enumerate(words)}


def _training_windows(docs, vocab, window, rng):
    doc_ids, centers, contexts = [], [], []
    for di, doc in enumerate(docs):
        ids = [vocab[w] for w in doc if w in vocab]
        for i, c in enumerate(ids):
            lo, hi = max(0, i - window), min(len(ids), i + window + 1)
            ctx = ids[lo:i] + ids[i + 1 : hi]
            if not ctx:
                continue
            ctx = ctx[: 2 * window]
            ctx = ctx + [ctx[-1]] * (2 * window - len(ctx))  # pad to fixed width
            doc_ids.append(di)
            centers.append(c)
            contexts.append(ctx)
    order = rng.permutation(len(doc_ids))
    return (
        np.asarray(doc_ids, np.int32)[order],
        np.asarray(centers, np.int32)[order],
        np.asarray(contexts, np.int32)[order],
    )


def train_pvdm(texts: Sequence[str], cfg: PVDMConfig = PVDMConfig()) -> np.ndarray:
    """Returns (len(texts), vector_size) float32 document vectors."""
    docs = [simple_preprocess(t) for t in texts]
    vocab = _build_vocab(docs, cfg.min_count)
    if not vocab:
        return np.zeros((len(texts), cfg.vector_size), np.float32)
    V, D, H = len(vocab), len(texts), cfg.vector_size
    rng = np.random.default_rng(cfg.seed)
    doc_ids, centers, contexts = _training_windows(docs, vocab, cfg.window, rng)
    if len(doc_ids) == 0:
        return np.zeros((D, H), np.float32)

    key = jax.random.PRNGKey(cfg.seed)
    k1, k2, key = jax.random.split(key, 3)
    params = {
        "doc": jax.random.uniform(k1, (D, H), jnp.float32, -0.5 / H, 0.5 / H),
        "word": jax.random.uniform(k2, (V, H), jnp.float32, -0.5 / H, 0.5 / H),
        "out": jnp.zeros((V, H), jnp.float32),
    }
    # clip: the sampled-softmax objective can spike on rare-word batches
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(cfg.lr))
    opt_state = tx.init(params)

    def loss_fn(p, d_ids, ctr, ctx, neg):
        dvec = jnp.take(p["doc"], d_ids, axis=0)  # (B, H)
        wvec = jnp.mean(jnp.take(p["word"], ctx, axis=0), axis=1)  # (B, H)
        h = (dvec + wvec) / 2.0
        pos = jnp.take(p["out"], ctr, axis=0)  # (B, H)
        negv = jnp.take(p["out"], neg, axis=0)  # (B, N, H)
        pos_logit = jnp.sum(h * pos, axis=-1)
        neg_logit = jnp.einsum("bh,bnh->bn", h, negv)
        loss = -jnp.mean(
            jax.nn.log_sigmoid(pos_logit)
            + jnp.sum(jax.nn.log_sigmoid(-neg_logit), axis=-1)
        )
        return loss

    @jax.jit
    def step(p, o, d_ids, ctr, ctx, neg):
        loss, grads = jax.value_and_grad(loss_fn)(p, d_ids, ctr, ctx, neg)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    n = len(doc_ids)
    bs = min(cfg.batch_size, n)
    n_batches = max(1, n // bs)
    for epoch in range(cfg.epochs):
        for b in range(n_batches):
            sl = slice(b * bs, (b + 1) * bs)
            neg = rng.integers(0, V, size=(sl.stop - sl.start, cfg.negatives))
            params, opt_state, _ = step(
                params, opt_state,
                jnp.asarray(doc_ids[sl]), jnp.asarray(centers[sl]),
                jnp.asarray(contexts[sl]), jnp.asarray(neg, jnp.int32),
            )
    return np.asarray(params["doc"], np.float32)
