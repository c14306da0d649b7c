"""Pinned DISK_ONLY rule for loop-internal checkpoints (VERDICT r9 item 4).

The r9 sf0.1 endurance sweep found the engine's only long-session failure
mode: memory-backed ``localCheckpoint`` blocks created inside iteration
loops accumulate across queries faster than the async ContextCleaner
reaps them, and a later broadcast build finds no storage headroom
(NOTES.md r9).  The fix — checkpoint iteration state to DISK, never to
storage memory — must hold for every FUTURE iterative operator too, so
this test statically scans the package: any ``.localCheckpoint(...)``
call that lexically sits inside a ``for``/``while`` body must pass
``storageLevel=...DISK_ONLY...`` (or appear on the measured-exception
allowlist below with a justification).

Lexical scope is the deliberate limit: a helper called from a loop (e.g.
``operators/rollup.py:_materialize``) is not flagged — those sites are
covered by the endurance sweep itself (``tools/sweep_chunks.py``), and
the rollup's memory-backed checkpoint was measured faster and is
node-domain-sized (2 narrow columns).
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ror_etl_spark")

# (relative path, function name) pairs allowed to keep a memory-backed
# loop checkpoint, each with a measured justification. Empty on purpose:
# add an entry only with a SCALING.md/NOTES.md measurement showing
# DISK_ONLY costs more than it saves for that operator.
ALLOWED: set[tuple[str, str]] = set()


def _is_disk_only(call: ast.Call) -> bool:
    for kw in call.keywords:
        if kw.arg == "storageLevel":
            return "DISK_ONLY" in ast.unparse(kw.value)
    return False


def test_loop_internal_checkpoints_are_disk_only() -> None:
    violations: list[str] = []
    for dirpath, _, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as f:
                tree = ast.parse(f.read())
            parents: dict[ast.AST, ast.AST] = {}
            for node in ast.walk(tree):
                for child in ast.iter_child_nodes(node):
                    parents[child] = node
            for node in ast.walk(tree):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "localCheckpoint"
                ):
                    continue
                in_loop = False
                func_name = "<module>"
                p: ast.AST = node
                while p in parents:
                    p = parents[p]
                    if isinstance(p, (ast.For, ast.While)):
                        in_loop = True
                    if isinstance(p, (ast.FunctionDef, ast.AsyncFunctionDef)) and func_name == "<module>":
                        func_name = p.name
                if not in_loop or _is_disk_only(node):
                    continue
                rel = os.path.relpath(path, os.path.dirname(PKG))
                if (rel, func_name) in ALLOWED:
                    continue
                violations.append(f"{rel}:{node.lineno} ({func_name})")
    assert not violations, (
        "loop-internal localCheckpoint without StorageLevel.DISK_ONLY "
        "(r9 endurance rule, see module docstring): " + ", ".join(violations)
    )
