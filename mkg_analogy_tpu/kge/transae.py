"""TransAE: multimodal autoencoder entity encoder + TransE/ANALOGY scoring.

TPU-native re-design of M-KGE/IKRL_TransAE/TransAE.py:430-923:

- ``IMGEncoder``: Doc2Vec text vector (100-d, kge/pvdm.py) and VGG image
  vector (4096-d) -> ReLU encoders -> combined hidden (dim) -> decoders;
  MSE reconstruction loss (TransAE.py:534-561);
- head entities are encoded multimodally, tails/relations use plain
  embedding tables (TransAE.py:563-633);
- the reference adds the scalar reconstruction loss onto the scores of
  image-mode rows (TransAE.py:634-641); we keep that convention.

Deviation (documented): the reference encoder assigns mode-2 rows a ZERO
embedding (the v3 buffer is only written for task_mode 0/1,
TransAE.py:546-548). We route every image mode (1 and 2) through the
combined encoder instead — zero rows train nothing and are clearly an
oversight.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .scorers import transe_distance


@dataclass(frozen=True)
class TransAEConfig:
    num_entities: int
    num_relations: int
    dim: int = 200
    text_dim: int = 100
    visual_dim: int = 4096
    visual_hidden: int = 1024
    p_norm: int = 1
    norm_flag: bool = True


class IMGEncoder(nn.Module):
    """Multimodal autoencoder (TransAE.py:430-561)."""

    cfg: TransAEConfig
    text_features: Optional[np.ndarray] = None  # (E+1, text_dim), frozen
    visual_features: Optional[np.ndarray] = None  # (E+1, visual_dim), frozen

    def _frozen(self, name, data, shape, key):
        def init(_key):
            if data is not None:
                assert data.shape == shape, (data.shape, shape)
                return jnp.asarray(data, jnp.float32)
            return jax.nn.initializers.uniform(0.1)(key, shape, jnp.float32)

        return self.variable("frozen", name, init, None).value

    @nn.compact
    def __call__(self, entity_id, task_mode, finetune: bool = False,
                 is_head: bool = True):
        cfg = self.cfg
        key = self.make_rng("params") if self.is_initializing() else None
        text_table = self._frozen(
            "text_features", self.text_features,
            (cfg.num_entities + 1, cfg.text_dim), key,
        )
        vis_table = self._frozen(
            "visual_features", self.visual_features,
            (cfg.num_entities + 1, cfg.visual_dim), key,
        )
        v1_t = jnp.take(text_table, entity_id, axis=0)
        v1_i = jnp.take(vis_table, entity_id, axis=0)

        enc_t = nn.Dense(cfg.dim, name="enc_text")
        enc_i = nn.Dense(cfg.visual_hidden, name="enc_visual")
        enc_c = nn.Dense(cfg.dim, name="enc_combined")
        dec_t1 = nn.Dense(cfg.dim, name="dec_text1")
        dec_i1 = nn.Dense(cfg.visual_hidden, name="dec_visual1")
        dec_t2 = nn.Dense(cfg.text_dim, name="dec_text2")
        dec_i2 = nn.Dense(cfg.visual_dim, name="dec_visual2")

        v2_t = nn.relu(enc_t(v1_t))  # (B, dim)
        v2_i = nn.relu(enc_i(v1_i))  # (B, visual_hidden)
        combined = nn.relu(enc_c(jnp.concatenate([v2_t, v2_i], axis=-1)))

        if finetune and not is_head:
            return v2_t, jnp.asarray(0.0, jnp.float32)

        is_text = task_mode == 0
        v3 = jnp.where(is_text[:, None], v2_t, combined)

        v4_t = nn.relu(dec_t1(v3))
        v4_i = nn.relu(dec_i1(v3))
        v5_t = nn.relu(dec_t2(v4_t))
        v5_i = nn.relu(dec_i2(v4_i))

        def masked_mse(a, b, m):
            se = jnp.mean((a - b) ** 2, axis=-1)
            denom = jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
            return jnp.sum(jnp.where(m, se, 0.0)) / denom

        recon = masked_mse(v1_t, v5_t, is_text) + masked_mse(v1_i, v5_i, ~is_text)
        return v3, recon


class TransAETransE(nn.Module):
    """TransE over autoencoded heads + plain tail/relation tables
    (TransAE.py:563-713)."""

    cfg: TransAEConfig
    text_features: Optional[np.ndarray] = None
    visual_features: Optional[np.ndarray] = None

    def setup(self):
        cfg = self.cfg
        xavier = nn.initializers.xavier_uniform()
        self.tail_embeddings = nn.Embed(cfg.num_entities, cfg.dim,
                                        embedding_init=xavier)
        self.rel_embeddings = nn.Embed(cfg.num_relations, cfg.dim,
                                       embedding_init=xavier)
        self.encoder = IMGEncoder(cfg, self.text_features, self.visual_features)

    def _dist(self, h, t, r):
        return transe_distance(h, t, r, self.cfg.p_norm, self.cfg.norm_flag)

    def __call__(self, batch_h, batch_t, batch_r, task_mode):
        """Flat pretrain batch -> energies with the reconstruction loss
        added onto image-mode rows (TransAE.py:631-641)."""
        h, recon = self.encoder(batch_h, task_mode)
        t = self.tail_embeddings(batch_t)
        r = self.rel_embeddings(batch_r)
        score = self._dist(h, t, r)
        return jnp.where(task_mode != 0, score + recon, score)

    def candidate_energies(self, h_idx, r_idx, task_mode, corrupt: str = "tail"):
        cfg = self.cfg
        cand = self.tail_embeddings(jnp.arange(cfg.num_entities))
        r = self.rel_embeddings(r_idx)
        if corrupt == "tail":
            h, _ = self.encoder(h_idx, task_mode)
            return self._dist(h[:, None, :], cand[None, :, :], r[:, None, :])
        # head corruption: encode all entities as heads (text branch for
        # efficiency parity is not possible -> use task_mode broadcast)
        all_h, _ = self.encoder(
            jnp.arange(cfg.num_entities), jnp.zeros(cfg.num_entities, jnp.int32)
        )
        t = self.tail_embeddings(h_idx)
        return self._dist(all_h[None, :, :], t[:, None, :], r[:, None, :])

    def finetune_scores(self, e_head, e_tail, q_head, task_mode):
        """Two-stage pipeline (TransAE.py:648-681)."""
        cfg = self.cfg
        h_eh, _ = self.encoder(e_head, task_mode, finetune=True, is_head=True)
        h_et, _ = self.encoder(e_tail, task_mode, finetune=True, is_head=False)
        rel_all = self.rel_embeddings(jnp.arange(cfg.num_relations))
        rel_score = self._dist(
            h_eh[:, None, :], h_et[:, None, :], rel_all[None, :, :]
        )
        pred_rel = self.rel_embeddings(jnp.argmax(rel_score, axis=-1))
        h_q, _ = self.encoder(q_head, task_mode, finetune=True, is_head=True)
        cand = self.tail_embeddings(jnp.arange(cfg.num_entities))
        return self._dist(h_q[:, None, :], cand[None, :, :], pred_rel[:, None, :])


def build_transae_inputs(markg, visual_store=None,
                         pvdm_cfg=None) -> Tuple[np.ndarray, np.ndarray]:
    """Assemble the frozen (E+1, text_dim)/(E+1, visual_dim) feature tables
    from entity glossaries (PV-DM) and a VGG feature store."""
    from .pvdm import PVDMConfig, train_pvdm

    cfg = pvdm_cfg or PVDMConfig()
    texts = [markg.entity2text[e] for e in markg.entities]
    doc_vecs = train_pvdm(texts, cfg)
    text = np.zeros((markg.num_entities + 1, cfg.vector_size), np.float32)
    text[: markg.num_entities] = doc_vecs
    if visual_store is not None:
        vis = np.zeros((markg.num_entities + 1, visual_store.shape[1]), np.float32)
        vis[: markg.num_entities] = visual_store
    else:
        vis = None
    return text, vis
