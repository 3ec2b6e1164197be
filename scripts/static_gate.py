"""In-repo static gate: the subset of the lint/type gates that can run anywhere.

The reference enforces ruff + mypy-strict in CI (reference pyproject.toml:
101-155). This image ships neither and has no network, so this script covers
the high-signal, zero-dependency subset with stdlib `ast`:

  * syntax: every file must compile (py_compile);
  * unused module-level imports (ruff F401);
  * duplicate top-level def/class names in a module — in test files these
    silently SHADOW earlier tests (pytest collects only the last one), the
    nastiest lint miss there is (ruff F811);
  * mutable default arguments (ruff B006).

CI still runs the full ruff+mypy jobs (.github/workflows/pytest.yml); this
gate is what `pytest`/developers can run offline:  python scripts/static_gate.py
Exits non-zero on findings.
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SCAN = ["fenics_constitutive_tpu", "tests", "scripts", "examples"]
TOP_FILES = ["bench.py", "__graft_entry__.py"]

# names that tools/frameworks reference implicitly
IMPORT_ALLOW = {"jax.numpy", "conftest"}


def _imported_names(tree: ast.Module):
    """(alias_name, lineno, is_future) for module-level imports."""
    out = []
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                out.append((a.asname or a.name.split(".")[0], node.lineno))
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                out.append((a.asname or a.name, node.lineno))
    return out


def _used_names(tree: ast.Module):
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # x.y.z -> record the root name
            cur = node
            while isinstance(cur, ast.Attribute):
                cur = cur.value
            if isinstance(cur, ast.Name):
                used.add(cur.id)
    # names re-exported via __all__ strings count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for elt in ast.walk(node.value):
                        if isinstance(elt, ast.Constant) and isinstance(
                            elt.value, str
                        ):
                            used.add(elt.value)
    return used


def check_file(path: pathlib.Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    findings = []
    rel = path.relative_to(ROOT)

    # unused module-level imports (skip __init__.py re-export surfaces and
    # lines marked noqa — side-effect imports like models.packed_models)
    lines = src.splitlines()
    if path.name != "__init__.py":
        used = _used_names(tree)
        for name, lineno in _imported_names(tree):
            if "noqa" in lines[lineno - 1]:
                continue
            if name not in used and name not in IMPORT_ALLOW:
                findings.append(f"{rel}:{lineno}: unused import '{name}'")

    # duplicate top-level defs (silent test shadowing)
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen:
                findings.append(
                    f"{rel}:{node.lineno}: '{node.name}' redefines "
                    f"line {seen[node.name]} (shadowed silently)"
                )
            seen[node.name] = node.lineno

    # mutable default arguments
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        f"{rel}:{node.lineno}: mutable default argument "
                        f"in '{node.name}'"
                    )
    return findings


def main() -> int:
    files: list[pathlib.Path] = []
    for d in SCAN:
        files += sorted((ROOT / d).rglob("*.py"))
    files += [ROOT / f for f in TOP_FILES]
    files = [f for f in files if "build" not in f.parts]
    findings = []
    for f in files:
        findings += check_file(f)
    for line in findings:
        print(line)
    print(f"static_gate: {len(files)} files, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
