"""Run an mkg_analogy_tpu CLI module on the host CPU platform.

The environment's sitecustomize pins ``JAX_PLATFORMS=axon`` (the TPU
tunnel) before user code runs, so env-var overrides are too late;
``jax.config.update`` before first device use is the supported escape
hatch (same mechanism as tests/conftest.py). Used to run the small
embedding-table KGE silos concurrently with MarT jobs that own the chip.

Usage: python tools/cpu_cli.py <cli-module> [args...]
e.g.   python tools/cpu_cli.py ikrl --data_dir ... --model transe
"""

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    mod = sys.argv[1]
    importlib.import_module(f"mkg_analogy_tpu.cli.{mod}").main(sys.argv[2:])


if __name__ == "__main__":
    main()
