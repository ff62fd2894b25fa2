"""Orbax-backed checkpointing.

Parity: pl.ModelCheckpoint(monitor="Eval_entity/hits10", save_weights_only)
+ strict=False partial restore for pretrain->finetune transfer
(MarT/main.py:133-148). Since the vocabulary is allocated at its final padded
size from the start, pretrain->finetune restore needs no embedding surgery.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, params: Any, metrics: Optional[Dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(params))
        self._mgr.wait_until_finished()
        if metrics is not None:
            with open(os.path.join(self.directory, f"metrics_{step}.json"), "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, like: Any = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if like is not None:
            target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
            return self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        return self._mgr.restore(step)


def partial_restore(params: Any, restored: Any) -> Any:
    """strict=False-style restore: copy leaves that exist in both trees with
    matching shapes; keep freshly-initialized values elsewhere
    (main.py:134 parity)."""

    def merge(path, cur, res=None):
        if res is not None and getattr(res, "shape", None) == cur.shape:
            return res
        return cur

    flat_cur = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_res = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    out = {}
    for path, leaf in flat_cur.items():
        r = flat_res.get(path)
        out[path] = r if (r is not None and r.shape == leaf.shape) else leaf
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, [out[p] for p, _ in
                                                   jax.tree_util.tree_flatten_with_path(params)[0]])
