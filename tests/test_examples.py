"""Every example script must run end-to-end against the smallest
testdata — examples are documentation that executes, so they are
tested like code."""

import glob
import os
import subprocess
import sys

import pytest

from conftest import _REPO_ROOT, SF_DIR

EXAMPLES = sorted(glob.glob(os.path.join(_REPO_ROOT, "examples", "*.py")))


@pytest.mark.parametrize("script", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs_clean(script):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, script, SF_DIR],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=_REPO_ROOT,
    )
    assert proc.returncode == 0, (
        f"{os.path.basename(script)} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
