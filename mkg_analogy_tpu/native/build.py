"""Build libkgsampler.so with g++ (no external build deps).

Called lazily by native.api.load_library(); the shared object is cached next
to the source and rebuilt when the source is newer.
"""

from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "kgsampler.cpp")
LIB = os.path.join(HERE, "libkgsampler.so")


def build(force: bool = False, tsan: bool = False) -> str:
    """Build the library; ``tsan=True`` produces a ThreadSanitizer build
    (libkgsampler_tsan.so) for race detection on the sampler's worker pool
    (SURVEY.md §5 — the reference ships an unauditable prebuilt binary)."""
    lib = LIB.replace(".so", "_tsan.so") if tsan else LIB
    if (
        not force
        and os.path.exists(lib)
        and os.path.getmtime(lib) >= os.path.getmtime(SRC)
    ):
        return lib
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread"]
    if tsan:
        cmd += ["-fsanitize=thread", "-g"]
    cmd += ["-o", lib, SRC]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return lib


if __name__ == "__main__":
    import sys

    print(build(force=True, tsan="--tsan" in sys.argv))
