"""Optimizer factory: AdamW + linear warmup/decay with BERT-style no-decay
parameter groups.

Parity: MarT/lit_models/transformer.py:224-241 — AdamW(eps=1e-8), weight
decay on everything except biases and LayerNorm scales, linear schedule with
``warm_up_radio`` warmup fraction; grad accumulation via optax.MultiSteps
(pl ``--accumulate_grad_batches``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def linear_warmup_linear_decay(
    lr: float, total_steps: int, warmup_ratio: float = 0.1
) -> optax.Schedule:
    warmup_steps = max(1, int(total_steps * warmup_ratio))
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.linear_schedule(lr, 0.0, max(1, total_steps - warmup_steps)),
        ],
        [warmup_steps],
    )


def no_decay_mask(params: Any) -> Any:
    """True where weight decay applies: everything except params whose leaf
    name is ``bias`` or whose parent is a LayerNorm (``scale``)."""

    def decide(path, _leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        leaf_name = names[-1] if names else ""
        return not (leaf_name == "bias" or leaf_name == "scale")

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(
    lr: float,
    total_steps: int,
    warmup_ratio: float = 0.1,
    weight_decay: float = 0.01,
    eps: float = 1e-8,
    grad_accum_steps: int = 1,
    max_grad_norm: Optional[float] = None,
    params_example: Any = None,
) -> optax.GradientTransformation:
    # MultiSteps advances the inner optimizer (and thus the schedule) once
    # per k micro-batches — the schedule horizon is optimizer steps, like the
    # reference's num_training_steps // accumulate_grad_batches (base.py:90).
    schedule = linear_warmup_linear_decay(
        lr, max(1, total_steps // max(1, grad_accum_steps)), warmup_ratio
    )
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            schedule,
            b1=0.9,
            b2=0.999,
            eps=eps,
            weight_decay=weight_decay,
            mask=no_decay_mask if weight_decay else None,
        )
    )
    tx = optax.chain(*chain)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def torch_adagrad(
    lr: float, eps: float = 1e-10, initial_accumulator_value: float = 0.0
) -> optax.GradientTransformation:
    """torch.optim.Adagrad parity: ``p -= lr * g / (sqrt(acc) + eps)`` with
    eps OUTSIDE the sqrt and a zero-initialized accumulator.

    optax.adagrad folds eps into the accumulator (rsqrt(acc + eps)), which
    floors the denominator at sqrt(eps); with the KBC models' 1e-3-scale
    init the gradients are ~1e-9 and training never leaves the plateau —
    torch's formulation takes sign-like first steps instead (the behavior
    the RSME/OpenKE recipes rely on, RSME/run.sh lr 1e-2).
    """

    def init_fn(params):
        return jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params
        )

    def update_fn(updates, state, params=None):
        del params
        acc = jax.tree_util.tree_map(lambda g, a: a + g * g, updates, state)
        scaled = jax.tree_util.tree_map(
            lambda g, a: -lr * g / (jnp.sqrt(a) + eps), updates, acc
        )
        return scaled, acc

    return optax.GradientTransformation(init_fn, update_fn)
