"""KGE training loops (IKRL / TransAE pretrain + finetune).

Replaces the reference Trainer (IKRL.py:18-168): margin/softplus negative-
sampling pretrain over the Bernoulli sampler, Adam CE finetune over MARS
6-tuples. Steps are jitted with donated state; batches have static shapes
(bs * (1 + neg_ent + neg_rel) rows).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from .sampling import NegativeSampler
from ..train.optim import torch_adagrad
from .scorers import margin_loss, softplus_loss


@dataclass
class KGETrainConfig:
    train_times: int = 2000
    lr: float = 1.0  # reference: SGD alpha=1.0 pretrain, Adam 1e-4 finetune
    optimizer: str = "sgd"
    loss: str = "margin"  # "margin" | "softplus"
    # opt-in reference quirk: feed RAW energies to the softplus logistic
    # loss like IKRL.py:1030-1040 does (inverted w.r.t. its own
    # smaller-is-better evaluator) instead of the corrected negation
    compat_ref_softplus_sign: bool = False
    margin: float = 5.0
    regul_rate: float = 0.0
    finetune_lr: float = 1e-4
    finetune_epochs: int = 1000
    finetune_batch_size: int = 128
    seed: int = 0


class KGEState(train_state.TrainState):
    frozen: dict = None


def draw_task_mode(rng: jax.Array, n: int) -> jnp.ndarray:
    """Random per-row task mode, 0.4/0.3/0.3 (IKRL.py:75-85)."""
    u = jax.random.randint(rng, (n,), 0, 10)
    return jnp.where(u < 4, 0, jnp.where(u < 7, 1, 2))


class KGETrainer:
    def __init__(self, model, cfg: KGETrainConfig, batch_size: int,
                 neg_total: int):
        self.model = model
        self.cfg = cfg
        self.batch_size = batch_size
        self.neg_total = neg_total  # neg_ent + neg_rel

    def _make_tx(self, lr: float, name: str):
        return {
            "sgd": optax.sgd(lr),
            "adam": optax.adam(lr),
            "adagrad": torch_adagrad(lr),
        }[name.lower()]

    def init_state(self, rng: jax.Array, finetune: bool = False) -> KGEState:
        n = self.batch_size * (1 + self.neg_total)
        variables = self.model.init(
            rng,
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.int32),
        )
        params = variables["params"]
        frozen = variables.get("frozen", {})
        tx = (
            self._make_tx(self.cfg.finetune_lr, "adam")
            if finetune
            else self._make_tx(self.cfg.lr, self.cfg.optimizer)
        )
        return KGEState.create(
            apply_fn=self.model.apply, params=params, tx=tx, frozen=frozen
        )

    # ---------------------------------------------------------------- pretrain
    def _pretrain_loss(self, params, frozen, batch, rng):
        bs = self.batch_size
        task_mode = draw_task_mode(rng, batch["batch_h"].shape[0])
        energies = self.model.apply(
            {"params": params, "frozen": frozen},
            batch["batch_h"], batch["batch_t"], batch["batch_r"], task_mode,
        )
        # OpenKE layout: first bs rows positive, rest negatives (column-major
        # blocks); NegativeSampling reshapes to (bs, n_neg) — same here.
        p = energies[:bs]
        n = energies[bs:].reshape(self.neg_total, bs).T
        if self.cfg.loss == "margin":
            loss = margin_loss(p, n, self.cfg.margin)
        else:
            # Energies are lower-is-better; softplus logistic loss wants
            # higher-is-better scores, so negate. (The reference feeds raw
            # ANALOGY energies to SoftplusLoss, IKRL.py:1030-1040 — which
            # pushes positive energies UP, inverted w.r.t. its own
            # smaller-is-better evaluator; compat flag reproduces that.)
            if self.cfg.compat_ref_softplus_sign:
                loss = softplus_loss(p, n)
            else:
                loss = softplus_loss(-p, -n)
        if self.cfg.regul_rate and hasattr(self.model, "regularization"):
            reg = self.model.apply(
                {"params": params, "frozen": frozen},
                batch["batch_h"], batch["batch_t"], batch["batch_r"],
                method=type(self.model).regularization,
            )
            loss = loss + self.cfg.regul_rate * reg
        return loss

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def pretrain_step(self, state: KGEState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(
            lambda p: self._pretrain_loss(p, state.frozen, batch, rng)
        )(state.params)
        return state.apply_gradients(grads=grads), loss

    def pretrain(self, sampler: NegativeSampler, state: Optional[KGEState] = None,
                 log_every: int = 50, logger=None) -> KGEState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        if state is None:
            state = self.init_state(rng)
        step_rng = jax.random.fold_in(rng, 1)
        for epoch in range(self.cfg.train_times):
            # Keep per-step losses on device; a float() per step would be a
            # host sync over the TPU tunnel (~200k syncs at the reference
            # budget of 2000 epochs x 100 batches, IKRL.py:1006).
            losses = []
            for batch in sampler:
                dev_batch = {
                    k: jnp.asarray(v)
                    for k, v in batch.items()
                    if k in ("batch_h", "batch_t", "batch_r")
                }
                state, loss = self.pretrain_step(state, dev_batch, step_rng)
                losses.append(loss)
            if logger and (epoch % log_every == 0 or epoch == self.cfg.train_times - 1):
                total = float(jnp.stack(losses).sum())
                logger.log(int(state.step), {"epoch_loss": total, "epoch": epoch},
                           prefix="kge_pretrain/")
        return state

    # ---------------------------------------------------------------- finetune
    def _finetune_loss(self, params, frozen, batch):
        scores = self.model.apply(
            {"params": params, "frozen": frozen},
            batch["e_head"], batch["e_tail"], batch["q_head"],
            batch["task_mode"],
            method=type(self.model).finetune_scores,
        )
        logp = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, batch["q_tail"][:, None], axis=1)
        return jnp.mean(nll), scores

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def finetune_step(self, state: KGEState, batch):
        (loss, _), grads = jax.value_and_grad(
            lambda p: self._finetune_loss(p, state.frozen, batch), has_aux=True
        )(state.params)
        return state.apply_gradients(grads=grads), loss

    def finetune(self, tuples: np.ndarray, state: KGEState,
                 logger=None, log_every: int = 10) -> KGEState:
        """tuples: (N, 6) int array [e_h, e_t, q_head, q_tail(answer), r, mode]."""
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        bs = cfg.finetune_batch_size
        n = len(tuples)
        for epoch in range(cfg.finetune_epochs):
            order = rng.permutation(n)
            losses = []  # device-side; one sync per logged epoch (see pretrain)
            for b in range(n // bs):
                rows = tuples[order[b * bs : (b + 1) * bs]]
                batch = dict(
                    e_head=jnp.asarray(rows[:, 0]),
                    e_tail=jnp.asarray(rows[:, 1]),
                    q_head=jnp.asarray(rows[:, 2]),
                    q_tail=jnp.asarray(rows[:, 3]),
                    task_mode=jnp.asarray(rows[:, 5]),
                )
                state, loss = self.finetune_step(state, batch)
                losses.append(loss)
            if logger and (epoch % log_every == 0 or epoch == cfg.finetune_epochs - 1):
                total = float(jnp.stack(losses).sum())
                logger.log(int(state.step), {"epoch_loss": total, "epoch": epoch},
                           prefix="kge_finetune/")
        return state


def mars_finetune_tuples(mars, markg) -> Dict[str, np.ndarray]:
    """MARS splits -> (N, 6) [e_h, e_t, q, a, r, mode] id arrays — the
    in-memory equivalent of data/analogy/{train,valid,test}2id_ft.txt
    (IKRL.py:944-953 AnalogyFinetuneDataset)."""
    out = {}
    for split in ("train", "dev", "test"):
        rows = [
            (
                markg.ent2id[e.head], markg.ent2id[e.tail],
                markg.ent2id[e.question], markg.ent2id[e.answer],
                markg.rel2id[e.relation], e.mode,
            )
            for e in mars.split(split)
        ]
        out[split] = np.asarray(rows, dtype=np.int64)
    return out
