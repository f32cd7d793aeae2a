"""Per-query source fingerprints — the machine-checkable half of the
DRIVER_WINDOW discipline (VERDICT.md round-14 ask #8).

For every registry query this computes a fingerprint over
  - the DuckDB oracle SQL,
  - the AST-normalized source of the query function (docstrings
    stripped, so comment/doc edits don't flag), and
  - the AST-normalized sources of every data_warehouse_spark function
    and class it TRANSITIVELY references (resolved through the live
    function's globals and its body-local ``from ... import``s, so an
    operator edit three calls deep flags every query whose behavior it
    can change),
plus the repr of any simple module-level constant referenced.

``tests/test_window_integrity.py`` runs this script twice — against
the working tree and against the last round-boundary commit (the
driver's ``round N: ...`` commits) — and asserts every query whose
fingerprint changed is in DRIVER_WINDOW. Run standalone:

    python tools/query_fingerprints.py [--root DIR]

prints one JSON object {query_name: fingerprint}.
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import inspect
import json
import sys
import textwrap

PKG = "data_warehouse_spark"


def _normalized_src(obj) -> str | None:
    """AST dump of the object's source with docstrings stripped, or
    None when source is unavailable (builtins, C extensions)."""
    try:
        src = textwrap.dedent(inspect.getsource(obj))
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError):
        return None
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef, ast.Module)):
            body = getattr(node, "body", [])
            if (body and isinstance(body[0], ast.Expr)
                    and isinstance(body[0].value, ast.Constant)
                    and isinstance(body[0].value.value, str)):
                del body[0]
    return ast.dump(tree, include_attributes=False)


def _referenced_objects(fn) -> list:
    """Objects a function references: global names, attribute bases
    resolved through globals, and body-local ``from X import y``
    targets (the registry's house import style)."""
    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
    except (OSError, TypeError, SyntaxError):
        return []
    g = getattr(fn, "__globals__", {})
    out, seen_names = [], set()

    def add(obj):
        out.append(obj)

    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            try:
                mod = __import__(node.module, fromlist=[a.name for a
                                                        in node.names])
            except Exception:
                continue
            for a in node.names:
                try:
                    add(getattr(mod, a.name))
                except AttributeError:
                    pass
        elif isinstance(node, ast.Name) and node.id not in seen_names:
            seen_names.add(node.id)
            if node.id in g:
                add(g[node.id])
        elif isinstance(node, ast.Attribute):
            base = node.value
            if isinstance(base, ast.Name) and base.id in g:
                try:
                    add(getattr(g[base.id], node.attr))
                except AttributeError:
                    pass
    return out


def _is_dws(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    return isinstance(mod, str) and mod.startswith(PKG)


def _closure_parts(fn) -> list[str]:
    """Normalized sources of fn plus the transitive dws closure, each
    prefixed with its qualified name so renames flag too. Simple
    module-level constants are included by repr."""
    parts: dict[str, str] = {}
    stack, visited = [fn], set()
    while stack:
        cur = stack.pop()
        key = id(cur)
        if key in visited:
            continue
        visited.add(key)
        qual = (f"{getattr(cur, '__module__', '?')}."
                f"{getattr(cur, '__qualname__', repr(cur))}")
        norm = _normalized_src(cur)
        if norm is not None:
            parts[qual] = norm
        for obj in _referenced_objects(cur):
            if callable(obj) and _is_dws(obj):
                stack.append(obj)
            elif isinstance(obj, (str, int, float, bool, tuple,
                                  frozenset)):
                parts.setdefault(f"const:{repr(obj)[:2000]}", "")
    return [f"{k}\n{v}" for k, v in sorted(parts.items())]


def fingerprints() -> dict[str, str]:
    from data_warehouse_spark.queries.registry import load_all

    out = {}
    for name, spec in load_all().items():
        h = hashlib.sha256()
        h.update((spec.oracle or "").encode())
        for part in _closure_parts(spec.fn):
            h.update(b"\x00")
            h.update(part.encode())
        out[name] = h.hexdigest()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None,
                    help="repo root to import the package from "
                         "(default: this script's parent's parent)")
    args = ap.parse_args()
    import pathlib
    root = args.root or str(pathlib.Path(__file__).resolve().parent.parent)
    sys.path.insert(0, root)
    print(json.dumps(fingerprints(), indent=0, sort_keys=True))


if __name__ == "__main__":
    main()
