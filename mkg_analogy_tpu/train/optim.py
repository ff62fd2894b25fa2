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


def fused_adamw(
    schedule: optax.Schedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    mask=None,
    small_leaf_threshold: int = 8192,
) -> optax.GradientTransformation:
    """AdamW with every small leaf's moments/update fused into ONE vector.

    Numerically equivalent to ``optax.adamw`` (same scale_by_adam →
    add_decayed_weights → -lr(count) composition; tested to float32
    round-off in tests/test_optim.py), but the ~500 sub-``threshold``
    leaves of the flagship model (biases, LayerNorm scales, adaptive-mask
    scalars) are concatenated into a single fp32 vector whose mu/nu/update
    run as one fused elementwise chain. The per-leaf formulation costs
    ~2.6k async f32[768]-class DMA dispatches per step on TPU (HLO census,
    tools/attr_trace.py) — pure dispatch overhead this layout removes.
    Large leaves (embeddings, GEMM kernels) keep per-leaf updates: they
    are few, bandwidth-bound, and donation-aliased.

    ``mask``: callable(params)->bool tree (True where decay applies), a
    bool tree, or None (decay everywhere) — optax.adamw's contract.
    """

    def _split(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        small = [i for i, x in enumerate(leaves) if x.size <= small_leaf_threshold]
        big = [i for i, x in enumerate(leaves) if x.size > small_leaf_threshold]
        return leaves, treedef, small, big

    def _decay_leaves(params):
        if mask is None:
            return [True] * len(jax.tree_util.tree_leaves(params))
        tree = mask(params) if callable(mask) else mask
        return jax.tree_util.tree_leaves(tree)

    def init_fn(params):
        import numpy as np

        leaves, _, small, big = _split(params)
        dleaves = _decay_leaves(params)
        n_small = sum(leaves[i].size for i in small)
        sdecay = (
            np.concatenate(
                [
                    np.full(leaves[i].size, float(dleaves[i]), np.float32)
                    for i in small
                ]
            )
            if small
            else np.zeros((0,), np.float32)
        )
        return {
            "count": jnp.zeros([], jnp.int32),
            "smu": jnp.zeros((n_small,), jnp.float32),
            "snu": jnp.zeros((n_small,), jnp.float32),
            "sdecay": jnp.asarray(sdecay),
            "bmu": [jnp.zeros_like(leaves[i]) for i in big],
            "bnu": [jnp.zeros_like(leaves[i]) for i in big],
        }

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("fused_adamw requires params")
        gleaves, treedef, small, big = _split(updates)
        pleaves = jax.tree_util.tree_leaves(params)
        dleaves = _decay_leaves(params)
        count = state["count"] + 1
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1**cf
        bc2 = 1.0 - b2**cf
        neg_lr = -schedule(state["count"])
        new = list(gleaves)

        smu, snu = state["smu"], state["snu"]
        if small:
            sg = jnp.concatenate(
                [gleaves[i].reshape(-1).astype(jnp.float32) for i in small]
            )
            sp = jnp.concatenate(
                [pleaves[i].reshape(-1).astype(jnp.float32) for i in small]
            )
            smu = b1 * smu + (1.0 - b1) * sg
            snu = b2 * snu + (1.0 - b2) * sg * sg
            supd = (smu / bc1) / (jnp.sqrt(snu / bc2) + eps)
            supd = neg_lr * (supd + weight_decay * state["sdecay"] * sp)
            off = 0
            for i in small:
                sz = gleaves[i].size
                new[i] = supd[off : off + sz].reshape(gleaves[i].shape).astype(
                    gleaves[i].dtype
                )
                off += sz

        bmu, bnu = [], []
        for j, i in enumerate(big):
            g = gleaves[i].astype(jnp.float32)
            mu = b1 * state["bmu"][j] + (1.0 - b1) * g
            nu = b2 * state["bnu"][j] + (1.0 - b2) * g * g
            upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            if dleaves[i]:
                upd = upd + weight_decay * pleaves[i].astype(jnp.float32)
            new[i] = (neg_lr * upd).astype(gleaves[i].dtype)
            bmu.append(mu)
            bnu.append(nu)

        nstate = {
            "count": count,
            "smu": smu,
            "snu": snu,
            "sdecay": state["sdecay"],
            "bmu": bmu,
            "bnu": bnu,
        }
        return jax.tree_util.tree_unflatten(treedef, new), nstate

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    lr: float,
    total_steps: int,
    warmup_ratio: float = 0.1,
    weight_decay: float = 0.01,
    eps: float = 1e-8,
    grad_accum_steps: int = 1,
    max_grad_norm: Optional[float] = None,
    params_example: Any = None,
    fused: bool = False,
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
    if fused:
        chain.append(
            fused_adamw(
                schedule,
                eps=eps,
                weight_decay=weight_decay,
                mask=no_decay_mask if weight_decay else None,
            )
        )
    else:
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
