"""The tutorial notebook is executed and executable.

The reference ships docs/getting_started/basic_usage.ipynb WITH outputs;
this pins (a) that our committed twin carries real captured outputs and
(b) that its code cells still run top-to-bottom against the current API
(stdlib exec, no jupyter dependency — see scripts/execute_notebook.py).
"""

import json
import pathlib

import pytest

NB = (
    pathlib.Path(__file__).resolve().parents[2]
    / "docs/getting_started/basic_usage.ipynb"
)


def _code_cells():
    nb = json.loads(NB.read_text())
    return [c for c in nb["cells"] if c["cell_type"] == "code"]


def test_notebook_ships_executed():
    cells = _code_cells()
    assert all(c.get("execution_count") for c in cells), (
        "code cells missing execution counts — run scripts/execute_notebook.py"
    )
    printed = [c for c in cells if "print(" in "".join(c["source"])]
    assert printed, "tutorial should show results"
    for c in printed:
        outs = c.get("outputs", [])
        assert outs and any(
            o.get("output_type") == "stream" and "".join(o.get("text", []))
            for o in outs
        ), "a printing cell has no captured output — re-execute the notebook"


@pytest.mark.slow
def test_notebook_executes():
    ns: dict = {}
    for k, c in enumerate(_code_cells()):
        exec(compile("".join(c["source"]), f"<cell {k}>", "exec"), ns)  # noqa: S102
    # the tutorial's physics: exponential hardening saturates toward p_y00
    assert 2400.0 < max(ns["stress_path"]) < 2500.0
