"""Docs-rot guard: every fenced python block in docs/*.md must execute.

The reference CI runs a Documenter doctest job
(/root/reference/.github/workflows/CI.yml:42-61); scripts/run_doc_examples.py
is the markdown equivalent here, and this slow-marked test keeps it in the
nightly suite as well as the CI docs step.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_all_doc_blocks_execute():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "run_doc_examples.py")],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, f"doc blocks failed:\n{r.stdout}\n{r.stderr}"
