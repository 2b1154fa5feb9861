"""Execute every tutorial end-to-end in quick mode.

The tutorials (examples/tutorials/) are the adoption surface and the
de-facto integration tests of the full public API — mirroring the five
reference notebooks plus the TPU batch-mapping tutorial. Each runs
self-contained on synthetic data; HYBDRT_TPU_QUICK=1 shrinks sizes.
"""
import os
import runpy
import sys

import pytest

TUTORIAL_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "tutorials")
TUTORIALS = sorted(f for f in os.listdir(TUTORIAL_DIR)
                   if f[0].isdigit() and f.endswith(".py"))


@pytest.mark.parametrize("script", TUTORIALS)
def test_tutorial_runs(script, monkeypatch):
    monkeypatch.setenv("HYBDRT_TPU_QUICK", "1")
    monkeypatch.syspath_prepend(TUTORIAL_DIR)
    monkeypatch.chdir(TUTORIAL_DIR)
    # Each tutorial asserts on its own physical results internally
    runpy.run_path(os.path.join(TUTORIAL_DIR, script), run_name="__main__")
    sys.modules.pop("tutorial_utils", None)
