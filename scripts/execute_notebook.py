"""Execute docs/getting_started/basic_usage.ipynb and store its outputs.

The reference ships its tutorial notebook EXECUTED
(/root/reference/docs/getting_started/basic_usage.ipynb); this repo's twin
must too. No jupyter needed: code cells are exec'd in order in one shared
namespace, their stdout captured as nbformat stream outputs, and the
notebook is rewritten in place. tests/docs/test_notebook.py re-executes the
same cells in CI and asserts the committed file carries the outputs.

Run: python scripts/execute_notebook.py
"""

from __future__ import annotations

import contextlib
import io
import json
import pathlib
import sys

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

NB = _ROOT / "docs/getting_started/basic_usage.ipynb"


def execute(nb: dict) -> dict:
    ns: dict = {}
    count = 0
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        count += 1
        src = "".join(cell["source"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            exec(compile(src, f"<cell {count}>", "exec"), ns)  # noqa: S102
        cell["execution_count"] = count
        text = buf.getvalue()
        cell["outputs"] = (
            [
                {
                    "output_type": "stream",
                    "name": "stdout",
                    "text": text.splitlines(keepends=True),
                }
            ]
            if text
            else []
        )
    return nb


def main() -> None:
    nb = json.loads(NB.read_text())
    execute(nb)
    NB.write_text(json.dumps(nb, indent=1, ensure_ascii=False) + "\n")
    n_out = sum(
        1
        for c in nb["cells"]
        if c["cell_type"] == "code" and c.get("outputs")
    )
    print(f"executed {NB.name}: {n_out} code cells with captured output")


if __name__ == "__main__":
    sys.exit(main())
