"""Memo-discipline meta-tests.

Every operator module that holds a session memo (a module-level
``*_CACHE`` dict keyed on a plan's semanticHash) must expose
``clear_cache()`` covering ALL of its memos, and ``domain.invalidate()``
must call it — otherwise an in-place lake rewrite can serve pre-rewrite
cached state (the staleness class the round-9 ADVICE flagged, closed in
round 10). These tests DISCOVER memos instead of listing them, so adding
a new memo without its clear hook fails here instead of in a future
audit."""

import inspect
import pkgutil
import re
from importlib import import_module

import nexus_spark.operators as ops_pkg
import nexus_spark.sources as sources_pkg
import nexus_spark.streaming as streaming_pkg
from nexus_spark import domain


def _operator_modules():
    # The walk covers every package that could plausibly grow a session
    # memo (round-10 verdict: streaming/ and sources/ were outside the
    # discovery surface — today they hold none, and if one appears it
    # must arrive with its clear hook, not wait for an audit).
    for pkg in (ops_pkg, sources_pkg, streaming_pkg):
        for info in pkgutil.iter_modules(pkg.__path__):
            yield import_module(f"{pkg.__name__}.{info.name}")


def _memo_names(mod):
    return sorted(n for n, v in vars(mod).items()
                  if n.endswith("_CACHE") and isinstance(v, dict))


def _transitive_clear_source(mod) -> str:
    """Source of clear_cache plus every same-module function it calls
    (text.clear_cache delegates to clear_nb_fit_cache etc.)."""
    seen, todo, src = set(), ["clear_cache"], []
    while todo:
        name = todo.pop()
        if name in seen or not hasattr(mod, name):
            continue
        seen.add(name)
        fn = getattr(mod, name)
        if not callable(fn):
            continue
        s = inspect.getsource(fn)
        src.append(s)
        todo.extend(re.findall(r"(\w+)\(\)", s))
    return "\n".join(src)


def test_every_module_memo_has_a_clear_hook():
    found_any = False
    for mod in _operator_modules():
        memos = _memo_names(mod)
        if not memos:
            continue
        found_any = True
        assert hasattr(mod, "clear_cache"), (
            f"{mod.__name__} holds memos {memos} but has no clear_cache()")
        cleared = _transitive_clear_source(mod)
        for name in memos:
            assert name in cleared, (
                f"{mod.__name__}.{name} is not referenced by clear_cache() "
                "or any function it calls — a lake rewrite would serve it "
                "stale")
    assert found_any  # the discovery itself must keep working


def test_domain_invalidate_calls_every_memo_module():
    src = inspect.getsource(domain.invalidate)
    for mod in _operator_modules():
        if not _memo_names(mod):
            continue
        short = mod.__name__.rsplit(".", 1)[-1]
        assert f"{short}.clear_cache()" in src, (
            f"domain.invalidate() does not call {short}.clear_cache(); "
            f"its memos {_memo_names(mod)} survive a lake rewrite")


def test_clear_cache_actually_empties(spark):
    """Behavioral backstop for the source-level checks: populate one
    memo per module via a cheap call, clear, and assert every memo dict
    in every operator module is empty."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators import dedup, retrieval, similarity, text
    from tests.conftest import SF_DIR

    docs = spark.createDataFrame([(0, "spark joins data fast")],
                                 ["doc_id", "text"])
    emb = load_table(spark, SF_DIR, "embeddings")
    dedup.distinct_postings(docs).count()
    retrieval.bm25_index_cached(docs)
    text.text_stats(docs).count()
    similarity.warm_index(emb)
    domain.invalidate()
    for mod in _operator_modules():
        for name in _memo_names(mod):
            assert not getattr(mod, name), (
                f"{mod.__name__}.{name} non-empty after invalidate()")
