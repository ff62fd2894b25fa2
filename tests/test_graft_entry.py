"""Driver entry points stay healthy (CPU, virtual devices)."""

import jax
import numpy as np


def test_dryrun_multichip_various_sizes():
    import __graft_entry__ as g

    g.dryrun_multichip(4)  # dp=2, tp=2
    g.dryrun_multichip(8)  # dp=4, tp=2


def test_synthetic_batch_invariants():
    from __graft_entry__ import _synthetic_batch

    b = _synthetic_batch(6, 32, 512, 16, 40)
    assert b["sep_idx"].shape == (6, 6)
    assert (np.diff(b["sep_idx"], axis=1) >= 0).all()
    assert (b["mask_idx"] < 32).all()
    assert (b["label"] < 40).all()
