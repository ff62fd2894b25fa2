"""Driver entry points stay healthy (CPU, virtual devices)."""

import jax
import numpy as np


import pytest


def test_dryrun_multichip_various_sizes():
    import __graft_entry__ as g

    g.dryrun_multichip(4)  # dp=2, tp=2
    g.dryrun_multichip(8)  # dp=4, tp=2


@pytest.mark.slow
def test_dryrun_multichip_full_width():
    """Full-width (768-wide, 12-layer, B=32) dp=4 x tp=2 train step + eval +
    checkpoint roundtrip under the 8-device mesh — the reproducible record
    behind README's full-width multi-chip claim (VERDICT r3 item 4; the
    committed run log is scripts/experiments/multichip_fullwidth_r4.log).
    ~10 min of CPU compile; excluded from the default suite — run with
    ``pytest -m slow tests/test_graft_entry.py``."""
    import __graft_entry__ as g

    g.dryrun_multichip(8, full_width=True)


def test_synthetic_batch_invariants():
    from __graft_entry__ import _synthetic_batch

    b = _synthetic_batch(6, 32, 512, 16, 40)
    assert b["sep_idx"].shape == (6, 6)
    assert (np.diff(b["sep_idx"], axis=1) >= 0).all()
    assert (b["mask_idx"] < 32).all()
    assert (b["label"] < 40).all()


def test_bench_watchdog_fires_with_error_json():
    """bench.py must never hang the driver: if the TPU tunnel is
    unreachable (the relay died mid-round once), the watchdog emits an
    error JSON line and hard-exits nonzero within its budget."""
    import json
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys, time, importlib.util\n"
        "sys.path.insert(0, '.')\n"
        "spec = importlib.util.spec_from_file_location('benchmod', 'bench.py')\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "m._watchdog(0.5)\n"
        "time.sleep(10)\n"
        "print('watchdog failed to fire')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, cwd=".",
    )
    assert r.returncode == 3, (r.returncode, r.stdout, r.stderr)
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["value"] == 0.0 and "watchdog" in out["error"]
