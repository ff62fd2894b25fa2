"""Device mesh construction.

Axes:
- ``dp`` — data parallel (batch dimension).
- ``tp`` — tensor parallel (vocab/MLP/head dimensions).

The reference trains on one GPU (scripts pass ``--gpus "0,"``); its latent
DDP path maps to ``dp`` here, and the ~42k-row tied MLM decoder is what
``tp`` shards (SURVEY.md §2.4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshAxes:
    dp: str = "dp"
    tp: str = "tp"


AXES = MeshAxes()


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over available devices.

    Defaults to all devices on the data axis. ``dp * tp`` must equal the
    device count when both are given.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, (AXES.dp, AXES.tp))
