"""Execute every tutorial end-to-end in quick mode.

The tutorials (examples/tutorials/) are the adoption surface and the
de-facto integration tests of the full public API — mirroring the five
reference notebooks plus the TPU batch-mapping tutorial. Each runs
self-contained on synthetic data; HYBDRT_TPU_QUICK=1 shrinks sizes.

Each tutorial runs in its OWN subprocess (as a user would run it), not via
runpy in the suite process: the suite process compiles hundreds of distinct
XLA executables, and in that state jaxlib's persistent-cache native
serialize/deserialize has segfaulted twice (once on the write path, once on
the read path) precisely while a tutorial was executing in-process. A fresh
short-lived process per tutorial sidesteps that and still benefits from
persistent-cache hits.
"""
import os
import subprocess
import sys

import pytest

TUTORIAL_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "tutorials")
TUTORIALS = sorted(f for f in os.listdir(TUTORIAL_DIR)
                   if f[0].isdigit() and f.endswith(".py"))


@pytest.mark.parametrize("script", TUTORIALS)
def test_tutorial_runs(script):
    env = dict(os.environ)
    env["HYBDRT_TPU_QUICK"] = "1"
    env.setdefault("MPLBACKEND", "Agg")
    # The subprocess is short-lived and compiles few executables: let it use
    # the persistent cache normally (read AND write), unlike the suite
    # process which disables it (tests/conftest.py) — this doubles as
    # integration coverage of the default-on cache path
    env.pop("HYBDRT_TPU_NO_COMPILE_CACHE", None)
    env.pop("HYBDRT_TPU_COMPILE_CACHE_READONLY", None)
    # Each tutorial asserts on its own physical results internally
    proc = subprocess.run(
        [sys.executable, os.path.join(TUTORIAL_DIR, script)],
        cwd=TUTORIAL_DIR, env=env, capture_output=True, text=True,
        timeout=1800)
    if proc.returncode != 0:
        pytest.fail(f"{script} exited {proc.returncode}\n"
                    f"--- stdout ---\n{proc.stdout[-4000:]}\n"
                    f"--- stderr ---\n{proc.stderr[-4000:]}")
