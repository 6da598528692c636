"""Mechanized rotation honesty (round-13 verdict ask #5): every query
whose IMPLEMENTATION changed since the last driver-checked round must sit
inside the first-50 driver window — the "changed rows must join" rule,
previously enforced by discipline alone.

Mechanism (hash-of-source, comment/docstring-insensitive):

- ``tests/rotation_baseline.json`` pins the git rev of the previous
  round's final commit. At the START of each round the rev is bumped to
  the last round's final commit, so the comparison is always "this
  round's edits vs the state the driver last verified".
- A query's implementation signature covers (1) its ``q_`` function and,
  transitively WITHIN ``__spark_entry__``, every top-level helper
  function and constant it references (catches ``_finish``,
  ``_stream_job_conf``, ``_SPAN_W``, shared SQL fragments...); (2) its
  ``_ORACLES`` entry expression and the constants/builders behind it;
  (3) the FULL module source of every ``nexus_spark.*`` module the
  closure's functions import (module granularity — the conservative rule
  rounds 11-12 practiced by hand: a memo-policy change inside
  ``operators/dedup.py`` re-windows every dedup consumer). One level of
  module imports is followed (not module-to-module transitive), matching
  that practice.
- Sources are normalized to ``ast.dump`` with docstrings stripped, so
  comment- and docstring-only edits (ADVICE doc items) do not force a
  re-window, but ANY code change does.

A change to a wide-fanout module (``catalog.py`` touches 131 queries)
deliberately cannot fit the window — this test then fails, which is the
intended brake: such a change needs its own round with an explicit
full-registry re-verification, not a silent exemption."""

from __future__ import annotations

import ast
import json
import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = "__spark_entry__.py"
BASELINE_FILE = os.path.join(ROOT, "tests", "rotation_baseline.json")
WINDOW = 50


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (isinstance(node, (ast.Module, ast.FunctionDef,
                              ast.AsyncFunctionDef, ast.ClassDef))
                and body and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)):
            node.body = body[1:] or [ast.Pass()]
    return tree


def _norm(node: ast.AST) -> str:
    return ast.dump(_strip_docstrings(node))


def _git_show(rev: str, path: str) -> str | None:
    try:
        return subprocess.run(
            ["git", "show", f"{rev}:{path}"], cwd=ROOT, check=True,
            capture_output=True, text=True).stdout
    except subprocess.CalledProcessError:
        return None  # file did not exist at the baseline rev


class _EntryIndex:
    """Top-level structure of one __spark_entry__.py source."""

    def __init__(self, src: str):
        tree = ast.parse(src)
        self.funcs: dict[str, ast.FunctionDef] = {}
        self.assigns: dict[str, ast.AST] = {}
        self.queries: dict[str, str] = {}   # query name -> q_fn name
        self.oracles: dict[str, ast.AST] = {}  # query name -> value expr
        for node in tree.body:
            if isinstance(node, ast.FunctionDef):
                self.funcs[node.name] = node
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                tgt = (node.targets[0] if isinstance(node, ast.Assign)
                       else node.target)
                if not isinstance(tgt, ast.Name) or node.value is None:
                    continue
                self.assigns[tgt.id] = node.value
                if tgt.id in ("_QUERIES", "_ORACLES") and isinstance(
                        node.value, ast.Dict):
                    for k, v in zip(node.value.keys, node.value.values):
                        if tgt.id == "_QUERIES":
                            self.queries[k.value] = v.id
                        else:
                            self.oracles[k.value] = v

    def closure(self, query: str) -> tuple[list[tuple[str, str]],
                                           set[str]]:
        """(sorted (name, normalized-source) pairs of every entry-module
        function/constant reachable from the query's q_fn + oracle expr,
        set of nexus_spark modules imported by the reachable funcs)."""
        seeds, parts = [], {}
        qfn = self.queries.get(query)
        if qfn:
            seeds.append(qfn)
        oracle = self.oracles.get(query)
        if oracle is not None:
            parts["__oracle_expr__"] = ast.dump(oracle)
            seeds.extend(n.id for n in ast.walk(oracle)
                         if isinstance(n, ast.Name))
        mods: set[str] = set()
        todo, seen = list(seeds), set()
        while todo:
            name = todo.pop()
            if name in seen:
                continue
            seen.add(name)
            node = self.funcs.get(name)
            if node is None:
                node = self.assigns.get(name)
                if node is None:
                    continue  # import / builtin / local-only name
                parts[name] = ast.dump(node)
            else:
                parts[name] = _norm(node)
                mods.update(_nexus_imports(node))
            todo.extend(n.id for n in ast.walk(node)
                        if isinstance(n, ast.Name))
        return sorted(parts.items()), mods


def _nexus_imports(node: ast.AST) -> set[str]:
    """Repo-relative .py paths of nexus_spark modules imported under
    `node` (``from nexus_spark.a.b import c`` resolves ``c`` to a module
    file when one exists, else to ``a/b``'s own file/package init)."""
    out: set[str] = set()

    def add(dotted: str) -> None:
        base = dotted.replace(".", "/")
        for cand in (f"{base}.py", f"{base}/__init__.py"):
            if os.path.exists(os.path.join(ROOT, cand)):
                out.add(cand)
                return

    for n in ast.walk(node):
        if isinstance(n, ast.ImportFrom) and n.module \
                and n.module.startswith("nexus_spark"):
            for alias in n.names:
                sub = f"{n.module}.{alias.name}".replace(".", "/")
                if os.path.exists(os.path.join(ROOT, f"{sub}.py")):
                    out.add(f"{sub}.py")
                else:
                    add(n.module)
        elif isinstance(n, ast.Import):
            for alias in n.names:
                if alias.name.startswith("nexus_spark"):
                    add(alias.name)
    return out


def _module_norm(src: str | None) -> str:
    if src is None:
        return "<absent>"
    return _norm(ast.parse(src))


def test_changed_implementations_are_inside_the_driver_window():
    with open(BASELINE_FILE) as fh:
        baseline = json.load(fh)
    rev = baseline["rev"]
    # An exemption flag must be BOUND to the rev it was declared for
    # (r13 ADVICE): bumping "rev" for a new round without re-declaring
    # verified_for_rev re-arms this test automatically, so a forgotten
    # manual cleanup can no longer leave the window rule silently
    # unenforced. (The r13 flag itself was dropped in round 14: the
    # driver verifies a 50-row window even in optimization rounds, so
    # the exemption's premise was false.)
    if (baseline.get("full_registry_verified")
            and baseline.get("verified_for_rev") == rev):
        pytest.skip(
            "rotation_baseline.json declares a full-registry-verification "
            "round bound to this exact baseline rev: "
            + baseline.get("full_registry_note", ""))
    base_entry_src = _git_show(rev, ENTRY)
    assert base_entry_src is not None, (
        f"baseline rev {rev} unreadable — regenerate "
        "tests/rotation_baseline.json from the last round's final commit")
    base = _EntryIndex(base_entry_src)
    with open(os.path.join(ROOT, ENTRY)) as fh:
        cur = _EntryIndex(fh.read())

    window = list(cur.queries)[:WINDOW]
    mod_cache: dict[str, bool] = {}

    def mod_changed(path: str) -> bool:
        if path not in mod_cache:
            with open(os.path.join(ROOT, path)) as fh:
                now = _module_norm(fh.read())
            mod_cache[path] = now != _module_norm(_git_show(rev, path))
        return mod_cache[path]

    offenders = []
    for q in cur.queries:
        if q not in base.queries:   # NEW query -> must be windowed
            if q not in window:
                offenders.append((q, "new query"))
            continue
        cur_parts, cur_mods = cur.closure(q)
        base_parts, _ = base.closure(q)
        why = None
        if cur_parts != base_parts:
            why = "entry-module implementation changed"
        else:
            hit = sorted(m for m in cur_mods if mod_changed(m))
            if hit:
                why = f"imported module(s) changed: {', '.join(hit)}"
        if why and q not in window:
            offenders.append((q, why))
    assert not offenders, (
        "queries changed since the baseline rev but NOT in the first-50 "
        f"driver window (rotation rule 2): {offenders}")
