"""Orbax-backed checkpointing.

Parity: pl.ModelCheckpoint(monitor="Eval_entity/hits10", save_weights_only)
+ strict=False partial restore for pretrain->finetune transfer
(MarT/main.py:133-148). Since the vocabulary is allocated at its final padded
size from the start, pretrain->finetune restore needs no embedding surgery.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Best-checkpoint writer with the save moved OFF the training loop.

    ``save`` enqueues (step, params, metrics) and returns immediately; a
    worker thread does the device->host fetch + orbax write. jax arrays are
    immutable, so the snapshot is consistent even while training races
    ahead. On this machine the device->host fetch of the 190M-param fp32
    tree crosses the TPU tunnel (~55 s measured per save) — synchronous
    saving made every improving epoch pay that on the critical path.
    Consistency points: a pending save is drained before the next save,
    before any restore/latest_step, and in ``close``.
    """

    # Pending-save queues shared PER DIRECTORY across instances: a second
    # Checkpointer on the same path (tests, restart flows) must observe
    # in-flight saves enqueued through an earlier instance.
    _shared: Dict[str, tuple] = {}
    _shared_lock = threading.Lock()

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        with Checkpointer._shared_lock:
            entry = Checkpointer._shared.get(self.directory)
            if entry is None:
                pending: "queue.Queue" = queue.Queue(maxsize=1)
                errbox: list = []
                worker = threading.Thread(
                    target=self._drain, args=(pending, errbox), daemon=True
                )
                worker.start()
                entry = (pending, errbox, worker)
                Checkpointer._shared[self.directory] = entry
        self._pending, self._errbox, self._worker = entry
        # Steps saved through THIS instance (pl.ModelCheckpoint tracks
        # best_model_path per fit; a stale directory from an earlier run
        # with a different architecture must not be auto-restored).
        self.saved_steps: list = []

    def _drain(self, pending: "queue.Queue", errbox: list) -> None:
        while True:
            item = pending.get()
            if item is None:
                pending.task_done()
                return
            step, params, metrics = item
            try:
                # A reused output directory can hold the same — or a LATER
                # — step number from an earlier run; orbax silently SKIPS
                # (returns False) any save whose step is <= the directory's
                # latest, leaving a stale tree where this run believes it
                # saved. Within one fit steps only increase, so every
                # existing step >= the incoming one is stale by
                # construction: delete them and overwrite —
                # pl.ModelCheckpoint's overwrite-by-name semantics (found
                # driving the CLI against a reused output_dir).
                for stale in self._mgr.all_steps():
                    if stale >= step:
                        self._mgr.delete(stale)
                saved = self._mgr.save(step, args=ocp.args.StandardSave(params))
                self._mgr.wait_until_finished()
                if not saved:
                    raise RuntimeError(
                        f"orbax skipped saving step {step} in "
                        f"{self.directory}"
                    )
                if metrics is not None:
                    path = os.path.join(self.directory, f"metrics_{step}.json")
                    with open(path, "w") as f:
                        json.dump(
                            {k: float(v) for k, v in metrics.items()}, f
                        )
            except BaseException as e:  # surfaced on the next save/flush
                errbox.append(e)
            finally:
                pending.task_done()

    def _check_error(self) -> None:
        if self._errbox:
            raise self._errbox.pop()

    def flush(self) -> None:
        """Block until any enqueued save has fully landed on disk."""
        self._pending.join()
        self._check_error()
        # A save may have been written through another instance's manager;
        # drop this manager's cached step listing.
        self._mgr.reload()

    def save(self, step: int, params: Any, metrics: Optional[Dict] = None) -> None:
        self.flush()  # at most one save in flight; also surfaces errors
        # Device-side snapshot (~2 ms for the 760 MB tree): the training
        # loop donates state buffers into the next step, so the worker must
        # not read the caller's arrays after save() returns.
        params = jax.tree_util.tree_map(
            lambda x: x.copy() if hasattr(x, "copy") else x, params
        )
        self._pending.put((step, params, metrics))
        self.saved_steps.append(step)

    def latest_step(self) -> Optional[int]:
        self.flush()
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, like: Any = None) -> Any:
        self.flush()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if like is not None:
            target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
            return self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        return self._mgr.restore(step)

    def close(self) -> None:
        with Checkpointer._shared_lock:
            entry = Checkpointer._shared.pop(self.directory, None)
        if entry is not None and entry[2].is_alive():
            self.flush()
            self._pending.put(None)
            entry[2].join(timeout=60)


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
