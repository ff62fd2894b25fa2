"""RSME: ComplEx / ANALOGY factorization with gated image fusion.

TPU-native re-design of M-KGE/RSME/{models,optimizers,regularizers}.py:

- per-row Python mode loops (models.py:227-243, 302-328) become vectorized
  ``jnp.where`` over the mode column;
- full-vocabulary scoring is one MXU matmul against the α-fused entity
  table; reciprocal relations double the relation table (datasets.py:35-41);
- the forget gate (mode-dependent blend of structural score and image
  cosine similarity, models.py:69-78) is computed batched:
      mode 0 -> s_str | mode 1 -> β·s_str | mode 2 -> β·s_str + (1-β)·cos·pd
- regularizers: F2 / N3 over the factor magnitudes (regularizers.py:14-38).

Deviation from the reference (documented): in filtered ranking the reference
computes the gold target through ``score()`` whose mode-1 branch skips the
β scaling that ``get_ranking`` applies to candidate rows (models.py:69-78 vs
models.py:252-266) — we score gold and candidates through the SAME blended
path, which is self-consistent.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.training import train_state
import optax

from ..ops.ranking import rank_metrics
from .scorers import complex_queries, split_complex


@dataclass(frozen=True)
class RSMEConfig:
    num_entities: int
    num_relations: int  # base count; reciprocal doubles it internally
    rank: int = 1000
    init_size: float = 1e-3
    img_dim: int = 1000
    alpha: float = 0.7  # constant image-fusion weight (config.py:1)
    beta: float = 0.5  # structural/image blend (config.py:2)
    forget_gate: bool = True
    model: str = "complex"  # "complex" | "analogy" | "cp"
    # opt-in reference quirk: during filtered ranking, score the GOLD
    # through score() whose mode-1 branch skips the beta blend applied to
    # every candidate (models.py:252-266 vs :69-78) — inflating mode-1
    # gold scores; default scores gold and candidates identically
    compat_ref_mode1_gold: bool = False

    @property
    def n_pred(self) -> int:
        return 2 * self.num_relations


class RSMEModel(nn.Module):
    """ComplEx (+ optional ANALOGY real term) with image fusion."""

    cfg: RSMEConfig
    img_vec: Optional[np.ndarray] = None  # (E, img_dim) frozen ViT features
    rel_pd: Optional[np.ndarray] = None  # (n_pred,) binary forget gate

    def setup(self):
        cfg = self.cfg
        init = nn.initializers.normal(cfg.init_size)
        self.ent = self.param("ent", init, (cfg.num_entities, 2 * cfg.rank))
        self.rel = self.param("rel", init, (cfg.n_pred, 2 * cfg.rank))
        if cfg.model == "analogy":
            self.ent_d = self.param("ent_d", init,
                                    (cfg.num_entities, 2 * cfg.rank))
            self.rel_d = self.param("rel_d", init, (cfg.n_pred, 2 * cfg.rank))
        self.post_mats = self.param(
            "post_mats", nn.initializers.xavier_uniform(),
            (cfg.img_dim, 2 * cfg.rank),
        )

        def img_init(_key):
            if self.img_vec is not None:
                return jnp.asarray(self.img_vec, jnp.float32)
            return jnp.zeros((cfg.num_entities, cfg.img_dim), jnp.float32)

        def pd_init(_key):
            if self.rel_pd is not None:
                return jnp.asarray(self.rel_pd, jnp.float32).reshape(-1)
            return jnp.ones((cfg.n_pred,), jnp.float32)

        self.img_table = self.variable(
            "frozen", "img_vec", img_init,
            self.make_rng("params") if self.is_initializing() else None,
        )
        self.pd_table = self.variable(
            "frozen", "rel_pd", pd_init,
            self.make_rng("params") if self.is_initializing() else None,
        )

    # ------------------------------------------------------------- fusion
    def _img_embeddings(self):
        return self.img_table.value @ self.post_mats  # (E, 2r)

    def _fused(self, table, img_emb, ids, fuse_mask):
        """(1-α)·struct + α·img where fuse_mask, else struct."""
        a = self.cfg.alpha
        struct = jnp.take(table, ids, axis=0)
        img = jnp.take(img_emb, ids, axis=0)
        fused = (1.0 - a) * struct + a * img
        return jnp.where(fuse_mask[:, None], fused, struct)

    def _fused_table(self, table, img_emb):
        a = self.cfg.alpha
        return (1.0 - a) * table + a * img_emb

    def _img_cosine(self, lhs_ids, rhs_ids=None):
        iv = self.img_table.value
        l = jnp.take(iv, lhs_ids, axis=0)
        l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-8)
        if rhs_ids is None:  # vs all entities
            r = iv / jnp.maximum(jnp.linalg.norm(iv, axis=-1, keepdims=True), 1e-8)
            return l @ r.T  # (B, E)
        r = jnp.take(iv, rhs_ids, axis=0)
        r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-8)
        return jnp.sum(l * r, axis=-1)  # (B,)

    def _gate(self, s_str, s_img, rel_ids, mode):
        """Forget-gate blend (models.py:69-81).

        With the gate ON the reference splits by mode (mode 0 pure
        structure, mode 1 beta*structure, mode 2 adds the pd-gated image
        cosine, models.py:71-78); with the gate OFF it blends
        beta*s_str + (1-beta)*s_img uniformly for ALL modes
        (models.py:80-81 else-branch) — no mode split, no rel_pd.
        """
        cfg = self.cfg
        b = cfg.beta
        if not cfg.forget_gate:
            return b * s_str + (1.0 - b) * s_img
        pd = jnp.take(self.pd_table.value, rel_ids, axis=0)
        if s_str.ndim == 2:  # (B, E) candidate matrices
            pd = pd[:, None]
            mode = mode[:, None]
        s_img = s_img * pd
        return jnp.where(
            mode == 0,
            s_str,
            jnp.where(mode == 1, b * s_str, b * s_str + (1.0 - b) * s_img),
        )

    # ------------------------------------------------------------- forward
    def __call__(self, x: jnp.ndarray):
        """Pretrain forward: x (B, 4) = [lhs, rel, rhs, mode] ->
        (predictions (B, E) over the fused table, factors for N3)."""
        cfg = self.cfg
        img_emb = self._img_embeddings()
        lhs_ids, rel_ids, rhs_ids, mode = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
        lhs = self._fused(self.ent, img_emb, lhs_ids, mode >= 1)
        rhs = self._fused(self.ent, img_emb, rhs_ids, mode == 2)
        rel = jnp.take(self.rel, rel_ids, axis=0)
        to_score = self._fused_table(self.ent, img_emb)
        q = complex_queries(lhs, rel, cfg.rank)
        preds = q @ to_score.T
        if cfg.model == "analogy":
            lhs_d = self._fused(self.ent_d, img_emb, lhs_ids, mode >= 1)
            rel_d = jnp.take(self.rel_d, rel_ids, axis=0)
            to_score_d = self._fused_table(self.ent_d, img_emb)
            preds = preds + (lhs_d * rel_d) @ to_score_d.T
        factors = self._factors(lhs, rel, rhs)
        return preds, factors

    def _factors(self, lhs, rel, rhs):
        r = self.cfg.rank

        def mag(x):
            re, im = split_complex(x, r)
            return jnp.sqrt(re ** 2 + im ** 2)

        return (mag(lhs), mag(rel), mag(rhs))

    # ------------------------------------------------------------ finetune
    def finetune_forward(self, x: jnp.ndarray):
        """x (B, 6) = [e_h, e_t, q, a, r, mode]: relation classification from
        the example pair, then link prediction with the argmax relation
        (models.py:330-386)."""
        cfg = self.cfg
        img_emb = self._img_embeddings()
        mode = x[:, 5]
        lhs = self._fused(self.ent, img_emb, x[:, 0], mode >= 1)
        rhs = self._fused(self.ent, img_emb, x[:, 1], mode == 2)
        q_rel = complex_queries(lhs, rhs, cfg.rank)
        rel_scores = q_rel @ self.rel.T  # (B, n_pred)
        pred_rel_ids = jnp.argmax(rel_scores, axis=-1)
        pred_rel = jnp.take(self.rel, pred_rel_ids, axis=0)

        a_lhs = self._fused(self.ent, img_emb, x[:, 2], mode >= 1)
        to_score = self._fused_table(self.ent, img_emb)
        preds = complex_queries(a_lhs, pred_rel, cfg.rank) @ to_score.T
        if cfg.model == "analogy":
            lhs_d = self._fused(self.ent_d, img_emb, x[:, 2], mode >= 1)
            rel_dd = jnp.take(self.rel_d, pred_rel_ids, axis=0)
            to_score_d = self._fused_table(self.ent_d, img_emb)
            preds = preds + (lhs_d * rel_dd) @ to_score_d.T
        factors = self._factors(a_lhs, pred_rel, a_lhs)
        return preds, factors

    # ------------------------------------------------------------- ranking
    def ranking_scores(self, queries: jnp.ndarray):
        """(B, E) gated scores for filtered ranking
        (KBCModel.get_ranking, models.py:24-100). queries (B, 4)."""
        cfg = self.cfg
        img_emb = self._img_embeddings()
        lhs_ids, rel_ids, mode = queries[:, 0], queries[:, 1], queries[:, 3]
        lhs = self._fused(self.ent, img_emb, lhs_ids, mode >= 1)
        rel = jnp.take(self.rel, rel_ids, axis=0)
        to_score = self._fused_table(self.ent, img_emb)
        s_str = complex_queries(lhs, rel, cfg.rank) @ to_score.T
        if cfg.model == "analogy":
            lhs_d = self._fused(self.ent_d, img_emb, lhs_ids, mode >= 1)
            rel_d = jnp.take(self.rel_d, rel_ids, axis=0)
            s_str = s_str + (lhs_d * rel_d) @ self._fused_table(
                self.ent_d, img_emb
            ).T
        s_img = self._img_cosine(lhs_ids)  # (B, E)
        return self._gate(s_str, s_img, rel_ids, mode)

    def gold_scores(self, queries: jnp.ndarray):
        """Reference score() semantics for the gold triple
        (models.py:245-266): mode 0/1 -> pure structural score, mode 2 ->
        beta*s_str + (1-beta)*cos(lhs_img, rhs_img)[*pd]. Used only under
        ``compat_ref_mode1_gold`` (the corrected default takes the gold's
        score from the same gated candidate row instead)."""
        cfg = self.cfg
        img_emb = self._img_embeddings()
        lhs_ids, rel_ids, rhs_ids, mode = (
            queries[:, 0], queries[:, 1], queries[:, 2], queries[:, 3]
        )
        lhs = self._fused(self.ent, img_emb, lhs_ids, mode >= 1)
        rhs = self._fused(self.ent, img_emb, rhs_ids, mode == 2)
        rel = jnp.take(self.rel, rel_ids, axis=0)
        s_str = jnp.sum(complex_queries(lhs, rel, cfg.rank) * rhs, axis=-1)
        if cfg.model == "analogy":
            lhs_d = self._fused(self.ent_d, img_emb, lhs_ids, mode >= 1)
            rhs_d = self._fused(self.ent_d, img_emb, rhs_ids, mode == 2)
            rel_d = jnp.take(self.rel_d, rel_ids, axis=0)
            s_str = s_str + jnp.sum(lhs_d * rel_d * rhs_d, axis=-1)
        s_img = self._img_cosine(lhs_ids, rhs_ids)  # (B,)
        if cfg.forget_gate:
            s_img = s_img * jnp.take(self.pd_table.value, rel_ids, axis=0)
        b = cfg.beta
        return jnp.where(mode == 2, b * s_str + (1.0 - b) * s_img, s_str)


# ---------------------------------------------------------------- training
@dataclass
class RSMETrainConfig:
    lr: float = 1e-2
    optimizer: str = "adagrad"
    batch_size: int = 1000
    reg_weight: float = 0.0
    regularizer: str = "n3"
    max_epochs: int = 300
    seed: int = 0
    decay1: float = 0.9
    decay2: float = 0.999


def n3_reg(factors, weight: float):
    n = factors[0].shape[0]
    return weight * sum(jnp.sum(jnp.abs(f) ** 3) for f in factors) / n


def f2_reg(factors, weight: float):
    n = factors[0].shape[0]
    return weight * sum(jnp.sum(f ** 2) for f in factors) / n


class RSMEState(train_state.TrainState):
    frozen: dict = None


class RSMETrainer:
    """KBCOptimizer parity (optimizers.py:12-49): full-softmax CE +
    regularizer over shuffled batches."""

    def __init__(self, model: RSMEModel, cfg: RSMETrainConfig,
                 finetune: bool = False):
        self.model = model
        self.cfg = cfg
        self.finetune = finetune

    def init_state(self, rng: jax.Array) -> RSMEState:
        cols = 6 if self.finetune else 4
        variables = self.model.init(rng, jnp.zeros((2, cols), jnp.int32))
        from ..train.optim import torch_adagrad

        tx = {
            "adagrad": torch_adagrad(self.cfg.lr),
            "adam": optax.adam(self.cfg.lr, b1=self.cfg.decay1,
                               b2=self.cfg.decay2),
            "sgd": optax.sgd(self.cfg.lr),
        }[self.cfg.optimizer.lower()]
        return RSMEState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=tx,
            frozen=variables.get("frozen", {}),
        )

    def _loss(self, params, frozen, batch):
        method = (type(self.model).finetune_forward if self.finetune
                  else type(self.model).__call__)
        preds, factors = self.model.apply(
            {"params": params, "frozen": frozen}, batch, method=method
        )
        truth = batch[:, 3] if self.finetune else batch[:, 2]
        logp = jax.nn.log_softmax(preds.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, truth[:, None], axis=1).mean()
        if self.cfg.regularizer == "n3":
            reg = n3_reg(factors, self.cfg.reg_weight)
        else:
            reg = f2_reg(factors, self.cfg.reg_weight)
        return nll + reg

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def step(self, state: RSMEState, batch):
        loss, grads = jax.value_and_grad(
            lambda p: self._loss(p, state.frozen, batch)
        )(state.params)
        return state.apply_gradients(grads=grads), loss

    def epoch(self, state: RSMEState, examples: np.ndarray,
              rng: np.random.Generator) -> Tuple[RSMEState, float]:
        order = rng.permutation(len(examples))
        bs = self.cfg.batch_size
        losses = []  # device-side; one host sync per epoch, not per step
        for b in range(0, len(examples) - bs + 1, bs):
            batch = jnp.asarray(examples[order[b : b + bs]], jnp.int32)
            state, loss = self.step(state, batch)
            losses.append(loss)
        if not losses:
            return state, 0.0
        return state, float(jnp.stack(losses).mean())


# ----------------------------------------------------------------- dataset
def reciprocal_augment(triples_mode: np.ndarray, n_rel: int) -> np.ndarray:
    """[lhs, rel, rhs, mode] + swapped copy with rel += n_rel
    (datasets.py:35-41)."""
    swapped = triples_mode.copy()
    swapped[:, [0, 2]] = swapped[:, [2, 0]]
    swapped[:, 1] += n_rel
    return np.vstack([triples_mode, swapped])


def assign_modes(n: int, rng: np.random.Generator) -> np.ndarray:
    """Random 0.4/0.3/0.3 modality split (RSME utils.py:143-157)."""
    u = rng.random(n)
    return np.where(u <= 0.4, 0, np.where(u < 0.7, 1, 2)).astype(np.int64)


def build_to_skip(*triple_arrays: np.ndarray):
    """to_skip dict for filtered eval (process_datasets.py semantics):
    rhs[(lhs, rel)] -> known tails; lhs[(rhs, rel + n_rel)] -> known heads."""
    rhs: Dict[Tuple[int, int], set] = {}
    lhs: Dict[Tuple[int, int], set] = {}
    for arr in triple_arrays:
        for row in arr:
            l, r, o = int(row[0]), int(row[1]), int(row[2])
            rhs.setdefault((l, r), set()).add(o)
            lhs.setdefault((o, r), set()).add(l)
    return {"rhs": rhs, "lhs": lhs}


def filtered_eval(
    model: RSMEModel,
    variables,
    queries: np.ndarray,
    to_skip: Dict[Tuple[int, int], set],
    batch_size: int = 500,
) -> np.ndarray:
    """Filtered ranks, reference counting convention: rank = 1 + #{scores >=
    target} excluding known positives (models.py:83-97 uses >=, which
    counts ties against the gold)."""
    ranks = np.ones(len(queries))
    num_entities = model.cfg.num_entities
    scores_fn = jax.jit(
        lambda v, q: model.apply(v, q, method=type(model).ranking_scores)
    )
    gold_fn = jax.jit(
        lambda v, q: model.apply(v, q, method=type(model).gold_scores)
    )
    for b in range(0, len(queries), batch_size):
        rows = queries[b : b + batch_size]
        scores = np.array(scores_fn(variables, jnp.asarray(rows, jnp.int32)),
                          np.float32, copy=True)
        if model.cfg.compat_ref_mode1_gold:
            # reference quirk: gold scored through score(), candidates
            # through the gated blend (models.py:81-82 targets)
            target = np.asarray(
                gold_fn(variables, jnp.asarray(rows, jnp.int32)), np.float32
            )
        else:
            target = scores[np.arange(len(rows)), rows[:, 2]]
        for i, row in enumerate(rows):
            skip = to_skip.get((int(row[0]), int(row[1])))
            if skip:
                cols = np.fromiter(skip, int)
                scores[i, cols] = -1e6
            scores[i, row[2]] = target[i]
        ranks[b : b + len(rows)] += (scores >= target[:, None]).sum(1) - 1
    return ranks


def eval_both_sides(model, variables, test: np.ndarray, to_skip,
                    n_rel: int) -> Dict[str, float]:
    """rhs + lhs (reciprocal) filtered evaluation, averaged
    (datasets.py:43-75 + learn.py avg_both)."""
    out = {}
    ranks_all = []
    for side in ("rhs", "lhs"):
        q = test.copy()
        if side == "lhs":
            q[:, [0, 2]] = q[:, [2, 0]]
            q[:, 1] += n_rel
        ranks = filtered_eval(model, variables, q, to_skip[side])
        ranks_all.append(ranks)
        m = rank_metrics(jnp.asarray(ranks), ks=(1, 3, 5, 10))
        for k, v in m.items():
            out[f"{side}/{k}"] = float(v)
    both = np.concatenate(ranks_all)
    for k, v in rank_metrics(jnp.asarray(both), ks=(1, 3, 5, 10)).items():
        out[k] = float(v)
    return out


class CPModel(nn.Module):
    """Canonical-Polyadic factorization (RSME models.py:103-150): separate
    lhs/rel/rhs tables, score = <lhs, rel, rhs>."""

    num_entities: int
    num_relations: int  # base count; reciprocal doubles it at the call site
    rank: int = 1000
    init_size: float = 1e-3

    def setup(self):
        init = nn.initializers.normal(self.init_size)
        self.lhs = self.param("lhs", init, (self.num_entities, self.rank))
        self.rel = self.param("rel", init, (2 * self.num_relations, self.rank))
        self.rhs = self.param("rhs", init, (self.num_entities, self.rank))

    def __call__(self, x: jnp.ndarray):
        lhs = jnp.take(self.lhs, x[:, 0], axis=0)
        rel = jnp.take(self.rel, x[:, 1], axis=0)
        rhs = jnp.take(self.rhs, x[:, 2], axis=0)
        preds = (lhs * rel) @ self.rhs.T
        return preds, (lhs, rel, rhs)

    def ranking_scores(self, queries: jnp.ndarray):
        lhs = jnp.take(self.lhs, queries[:, 0], axis=0)
        rel = jnp.take(self.rel, queries[:, 1], axis=0)
        return (lhs * rel) @ self.rhs.T
