"""Every shipped example runs end-to-end as a user would invoke it.

Reference parity: the reference pytest config collects `examples/` as a
testpath (reference pyproject.toml:87-90), so example bitrot fails CI.
Ours are standalone scripts; we execute them in subprocesses exactly as the
README documents (`python examples/<name>/run_example.py`)."""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[2]
EXAMPLES = sorted(p.parent.name for p in REPO.glob("examples/*/run_example.py"))


@pytest.mark.parametrize("name", EXAMPLES)
@pytest.mark.slow
def test_example_runs(name, tmp_path):
    script = REPO / "examples" / name / "run_example.py"
    res = subprocess.run(
        [sys.executable, str(script), str(tmp_path)],
        capture_output=True, text=True, timeout=300, cwd=tmp_path,
    )
    assert res.returncode == 0, res.stdout + res.stderr
