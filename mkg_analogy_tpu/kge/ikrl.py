"""IKRL: multimodal TransE / ANALOGY with 4-way (text/image) scoring.

TPU-native re-design of M-KGE/IKRL_TransAE/IKRL.py:379-845:

- the reference's per-row boolean index_put mixing (score[tt_idx] += ...,
  IKRL.py:478-486) becomes a vectorized ``jnp.where`` over task_mode;
- the fine-tune two-stage pipeline (relation classification over all 192
  relations, then link prediction over all 11,292 entities with the argmax
  relation, IKRL.py:487-545) is two batched MXU matmul-like contractions;
- frozen VGG16 visual features live in a separate ``frozen`` variable
  collection (the reference freezes them via Embedding.from_pretrained,
  IKRL.py:413-428), so the optimizer never touches them.

Task-mode conventions (reference parity):
- pre-train  (IKRL.py:75-85):  0 -> (T,T): tt | 1 -> (I,T): it+ti | 2 -> (I,I): ii
- fine-tune  (IKRL.py:529-533): 0 -> tt | 1 -> ii | 2 -> it+ti
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .scorers import analogy_energy, transe_distance


@dataclass(frozen=True)
class IKRLConfig:
    num_entities: int
    num_relations: int
    dim: int = 400
    p_norm: int = 1
    norm_flag: bool = True
    margin: float = 5.0
    visual_dim: int = 4096
    scorer: str = "transe"  # "transe" | "analogy"


def mix_modal_scores(tt, ii, ti, it, task_mode, finetune: bool):
    """4-way score selection by task_mode (see module docstring)."""
    if finetune:
        blended = jnp.where(task_mode == 1, ii, it + ti)
    else:
        blended = jnp.where(task_mode == 2, ii, it + ti)
    return jnp.where(task_mode == 0, tt, blended)


class _VisualTable(nn.Module):
    """Frozen (E+1, 4096) VGG feature table; row E is the padding row."""

    cfg: IKRLConfig
    features: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, idx: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg

        def init(key):
            if self.features is not None:
                assert self.features.shape == (
                    cfg.num_entities + 1,
                    cfg.visual_dim,
                ), self.features.shape
                return jnp.asarray(self.features, jnp.float32)
            bound = 6.0 / np.sqrt(cfg.dim)
            return jax.random.uniform(
                key, (cfg.num_entities + 1, cfg.visual_dim), jnp.float32,
                -bound, bound,
            )

        table = self.variable("frozen", "visual_features", init,
                              self.make_rng("params") if self.is_initializing()
                              else None)
        return jnp.take(table.value, idx, axis=0)


class IKRLTransE(nn.Module):
    """TransE with projected-image parallel scoring (IKRL.py:379-580)."""

    cfg: IKRLConfig
    visual_features: Optional[np.ndarray] = None

    def setup(self):
        cfg = self.cfg
        self.ent_embeddings = nn.Embed(
            cfg.num_entities, cfg.dim, name="ent_embeddings",
            embedding_init=nn.initializers.normal(1.0),
        )
        self.rel_embeddings = nn.Embed(
            cfg.num_relations, cfg.dim, name="rel_embeddings",
            embedding_init=nn.initializers.xavier_uniform(),
        )
        self.ent_project = nn.Dense(cfg.dim, name="ent_project")
        self.img_project = nn.Dense(cfg.dim, name="img_project")
        self.visual = _VisualTable(cfg, self.visual_features)

    def _text_emb(self, idx):
        return self.ent_project(self.ent_embeddings(idx))

    def _img_emb(self, idx):
        return self.img_project(self.visual(idx))

    def _dist(self, h, t, r):
        return transe_distance(h, t, r, self.cfg.p_norm, self.cfg.norm_flag)

    def __call__(self, batch_h, batch_t, batch_r, task_mode):
        """Per-row energies for a flat (pretrain) batch; lower is better."""
        h_t, t_t = self._text_emb(batch_h), self._text_emb(batch_t)
        h_i, t_i = self._img_emb(batch_h), self._img_emb(batch_t)
        r = self.rel_embeddings(batch_r)
        tt = self._dist(h_t, t_t, r)
        ii = self._dist(h_i, t_i, r)
        ti = self._dist(h_t, t_i, r)
        it = self._dist(h_i, t_t, r)
        return mix_modal_scores(tt, ii, ti, it, task_mode, finetune=False)

    def all_entity_embeddings(self):
        idx = jnp.arange(self.cfg.num_entities)
        return self._text_emb(idx), self._img_emb(idx)

    def candidate_energies(self, h_idx, r_idx, task_mode, corrupt: str = "tail"):
        """(B, E) energies with every entity substituted into one slot —
        the vectorized form of the reference's per-triple full-entity
        batches (TestDataLoader + IKRL.py:276-297)."""
        cand_t, cand_i = self.all_entity_embeddings()  # (E, d) each
        h_t, h_i = self._text_emb(h_idx), self._img_emb(h_idx)
        r = self.rel_embeddings(r_idx)
        B = h_idx.shape[0]

        def dist(h, t):
            return self._dist(h[:, None, :], t[None, :, :], r[:, None, :])

        if corrupt == "tail":
            tt = dist(h_t, cand_t)
            ii = dist(h_i, cand_i)
            ti = dist(h_t, cand_i)
            it = dist(h_i, cand_t)
        else:  # corrupt == "head": candidates fill the head slot
            tt = self._dist(cand_t[None, :, :], h_t[:, None, :], r[:, None, :])
            ii = self._dist(cand_i[None, :, :], h_i[:, None, :], r[:, None, :])
            ti = self._dist(cand_t[None, :, :], h_i[:, None, :], r[:, None, :])
            it = self._dist(cand_i[None, :, :], h_t[:, None, :], r[:, None, :])
        tm = task_mode[:, None]
        return mix_modal_scores(tt, ii, ti, it, tm, finetune=False)

    def finetune_scores(self, e_head, e_tail, q_head, task_mode):
        """Two-stage analogical pipeline -> (B, E) entity logits.

        Reference parity note (IKRL.py:543-545): the raw mixed distances are
        fed to CrossEntropy as logits and ranked descending at eval — the
        model therefore learns "larger value = answer"; we keep the same
        convention rather than negating."""
        cfg = self.cfg
        rel_all = self.rel_embeddings(jnp.arange(cfg.num_relations))  # (R, d)
        h_t, h_i = self._text_emb(e_head), self._img_emb(e_head)
        t_t, t_i = self._text_emb(e_tail), self._img_emb(e_tail)

        def dist_r(h, t):
            return self._dist(h[:, None, :], t[:, None, :], rel_all[None, :, :])

        tm = task_mode[:, None]
        rel_energy = mix_modal_scores(
            dist_r(h_t, t_t), dist_r(h_i, t_i), dist_r(h_t, t_i),
            dist_r(h_i, t_t), tm, finetune=True,
        )  # (B, R)
        # Reference argmaxes raw distances (IKRL.py:543): keep parity.
        pred_rel = self.rel_embeddings(jnp.argmax(rel_energy, axis=-1))

        cand_t, cand_i = self.all_entity_embeddings()
        q_t, q_i = self._text_emb(q_head), self._img_emb(q_head)

        def dist_e(h, cand):
            return self._dist(h[:, None, :], cand[None, :, :], pred_rel[:, None, :])

        ent_energy = mix_modal_scores(
            dist_e(q_t, cand_t), dist_e(q_i, cand_i), dist_e(q_t, cand_i),
            dist_e(q_i, cand_t), tm, finetune=True,
        )  # (B, E)
        return ent_energy


class IKRLAnalogy(nn.Module):
    """ANALOGY scorer variant (IKRL.py:582-845): complex bilinear + real
    DistMult term; image vectors substitute only the real part."""

    cfg: IKRLConfig
    visual_features: Optional[np.ndarray] = None

    def setup(self):
        cfg = self.cfg
        xavier = nn.initializers.xavier_uniform()
        self.ent_re = nn.Embed(cfg.num_entities, cfg.dim, embedding_init=xavier)
        self.ent_im = nn.Embed(cfg.num_entities, cfg.dim, embedding_init=xavier)
        self.rel_re = nn.Embed(cfg.num_relations, cfg.dim, embedding_init=xavier)
        self.rel_im = nn.Embed(cfg.num_relations, cfg.dim, embedding_init=xavier)
        self.ent = nn.Embed(cfg.num_entities, 2 * cfg.dim, embedding_init=xavier)
        self.rel = nn.Embed(cfg.num_relations, 2 * cfg.dim, embedding_init=xavier)
        self.img_project = nn.Dense(2 * cfg.dim, kernel_init=xavier,
                                    name="img_project")
        self.visual = _VisualTable(cfg, self.visual_features)

    def _img_emb(self, idx):
        return self.img_project(self.visual(idx))

    def _energies(self, h_idx, t_idx, r_idx):
        """Returns (tt, ii, ti, it) energies with shared complex parts."""
        h_re, h_im = self.ent_re(h_idx), self.ent_im(h_idx)
        t_re, t_im = self.ent_re(t_idx), self.ent_im(t_idx)
        r_re, r_im = self.rel_re(r_idx), self.rel_im(r_idx)
        h, t, r = self.ent(h_idx), self.ent(t_idx), self.rel(r_idx)
        h_img, t_img = self._img_emb(h_idx), self._img_emb(t_idx)

        def e(hh, tt):
            return analogy_energy(h_re, h_im, hh, t_re, t_im, tt, r_re, r_im, r)

        return e(h, t), e(h_img, t_img), e(h, t_img), e(h_img, t)

    def __call__(self, batch_h, batch_t, batch_r, task_mode):
        tt, ii, ti, it = self._energies(batch_h, batch_t, batch_r)
        return mix_modal_scores(tt, ii, ti, it, task_mode, finetune=False)

    def candidate_energies(self, h_idx, r_idx, task_mode, corrupt: str = "tail"):
        cfg = self.cfg
        E = cfg.num_entities
        all_idx = jnp.arange(E)
        c_re, c_im = self.ent_re(all_idx), self.ent_im(all_idx)
        c, c_img = self.ent(all_idx), self._img_emb(all_idx)
        h_re, h_im = self.ent_re(h_idx), self.ent_im(h_idx)
        h, h_img = self.ent(h_idx), self._img_emb(h_idx)
        r_re, r_im = self.rel_re(r_idx), self.rel_im(r_idx)
        r = self.rel(r_idx)

        def expand(x):
            return x[:, None, :]

        def cand(x):
            return x[None, :, :]

        if corrupt == "tail":
            def e(hh, tt):
                return analogy_energy(
                    expand(h_re), expand(h_im), hh, cand(c_re), cand(c_im), tt,
                    expand(r_re), expand(r_im), expand(r),
                )

            tt_ = e(expand(h), cand(c))
            ii_ = e(expand(h_img), cand(c_img))
            ti_ = e(expand(h), cand(c_img))
            it_ = e(expand(h_img), cand(c))
        else:
            def e(hh, tt):
                return analogy_energy(
                    cand(c_re), cand(c_im), hh, expand(h_re), expand(h_im), tt,
                    expand(r_re), expand(r_im), expand(r),
                )

            tt_ = e(cand(c), expand(h))
            ii_ = e(cand(c_img), expand(h_img))
            ti_ = e(cand(c), expand(h_img))
            it_ = e(cand(c_img), expand(h))
        tm = task_mode[:, None]
        return mix_modal_scores(tt_, ii_, ti_, it_, tm, finetune=False)

    def finetune_scores(self, e_head, e_tail, q_head, task_mode):
        cfg = self.cfg
        R = cfg.num_relations
        all_r = jnp.arange(R)
        r_re_all, r_im_all = self.rel_re(all_r), self.rel_im(all_r)
        r_all = self.rel(all_r)

        def rel_energy(h_idx, t_idx):
            h_re, h_im = self.ent_re(h_idx)[:, None], self.ent_im(h_idx)[:, None]
            t_re, t_im = self.ent_re(t_idx)[:, None], self.ent_im(t_idx)[:, None]

            def e(hh, tt):
                return analogy_energy(
                    h_re, h_im, hh, t_re, t_im, tt,
                    r_re_all[None], r_im_all[None], r_all[None],
                )

            h, t = self.ent(h_idx)[:, None], self.ent(t_idx)[:, None]
            h_img = self._img_emb(h_idx)[:, None]
            t_img = self._img_emb(t_idx)[:, None]
            return e(h, t), e(h_img, t_img), e(h, t_img), e(h_img, t)

        tm = task_mode[:, None]
        tt, ii, ti, it = rel_energy(e_head, e_tail)
        r_scores = mix_modal_scores(tt, ii, ti, it, tm, finetune=True)  # (B, R)
        pred = jnp.argmax(r_scores, axis=-1)

        E = cfg.num_entities
        all_e = jnp.arange(E)
        c_re, c_im = self.ent_re(all_e)[None], self.ent_im(all_e)[None]
        c, c_img = self.ent(all_e)[None], self._img_emb(all_e)[None]
        q_re, q_im = self.ent_re(q_head)[:, None], self.ent_im(q_head)[:, None]
        q, q_img = self.ent(q_head)[:, None], self._img_emb(q_head)[:, None]
        pr_re, pr_im = self.rel_re(pred)[:, None], self.rel_im(pred)[:, None]
        pr = self.rel(pred)[:, None]

        def e2(hh, tt):
            return analogy_energy(q_re, q_im, hh, c_re, c_im, tt, pr_re, pr_im, pr)

        ent_scores = mix_modal_scores(
            e2(q, c), e2(q_img, c_img), e2(q, c_img), e2(q_img, c), tm,
            finetune=True,
        )
        return ent_scores

    def regularization(self, batch_h, batch_t, batch_r):
        """mean-square of involved embeddings (OpenKE regul_rate hook)."""
        terms = [
            self.ent_re(batch_h), self.ent_im(batch_h), self.ent(batch_h),
            self.ent_re(batch_t), self.ent_im(batch_t), self.ent(batch_t),
            self.rel_re(batch_r), self.rel_im(batch_r), self.rel(batch_r),
        ]
        return sum(jnp.mean(x ** 2) for x in terms) / len(terms)


def create_ikrl(cfg: IKRLConfig, visual_features: Optional[np.ndarray] = None):
    if cfg.scorer == "transe":
        return IKRLTransE(cfg, visual_features)
    if cfg.scorer == "analogy":
        return IKRLAnalogy(cfg, visual_features)
    raise ValueError(cfg.scorer)
