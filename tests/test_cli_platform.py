"""Regression: every CLI must call ``apply_platform_override()`` before any
import/call that can initialize the jax backend (VERDICT round-1 item 7 —
``test.py`` once restored an orbax checkpoint before applying the override,
so ``TPUDEPTH_PLATFORM=cpu`` and the compile cache were dead for eval).

Static AST check: in each CLI's ``main()``, the ``apply_platform_override()``
call must appear before the first import of jax / tpudepth modules (other
than ``tpudepth.core.runtime`` itself) and before any other call statement.
"""

import ast
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLIS = ["train.py", "test.py", "demo.py", "guidedepth_main.py", "inference.py"]

_BACKEND_MODULES = ("jax", "tpudepth", "flax", "orbax")
_SAFE_MODULES = ("tpudepth.core.runtime",)


def _module_of(node):
    if isinstance(node, ast.Import):
        return [a.name for a in node.names]
    if isinstance(node, ast.ImportFrom):
        return [node.module or ""]
    return []


def _first_index(body, pred):
    for i, stmt in enumerate(body):
        for node in ast.walk(stmt):
            if pred(node):
                return i
    return None


@pytest.mark.parametrize("cli", CLIS)
def test_platform_override_precedes_backend_use(cli):
    src = open(os.path.join(REPO, cli)).read()
    tree = ast.parse(src)

    # no module-level backend imports
    for stmt in tree.body:
        for mod in _module_of(stmt):
            assert not mod.startswith(_BACKEND_MODULES), (
                f"{cli}: module-level import of {mod} initializes the backend "
                "before apply_platform_override() can run"
            )

    main = next(
        s for s in tree.body if isinstance(s, ast.FunctionDef) and s.name == "main"
    )

    def is_override_call(node):
        return (
            isinstance(node, ast.Call)
            and (
                (isinstance(node.func, ast.Name) and node.func.id == "apply_platform_override")
                or (isinstance(node.func, ast.Attribute) and node.func.attr == "apply_platform_override")
            )
        )

    def is_backend_import(node):
        mods = _module_of(node)
        return any(
            m.startswith(_BACKEND_MODULES) and m not in _SAFE_MODULES for m in mods
        )

    override_idx = _first_index(main.body, is_override_call)
    assert override_idx is not None, f"{cli}: main() never calls apply_platform_override()"

    backend_idx = _first_index(main.body, is_backend_import)
    assert backend_idx is not None and override_idx < backend_idx, (
        f"{cli}: backend import (stmt {backend_idx}) precedes "
        f"apply_platform_override (stmt {override_idx})"
    )
