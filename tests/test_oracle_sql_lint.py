"""Static lint over every registered DuckDB oracle: no bare UNION in a
non-recursive CTE.

Why this exists: DuckDB 1.0 compiles every CTE inside a ``WITH
RECURSIVE`` block through the recursive set-operation path, and for a
CTE that does NOT reference itself a plain ``UNION`` between its two
branches does not deduplicate — it behaves as ``UNION ALL`` (pinned by
test_duckdb_union_quirk_still_present below). That silently inflated
the corpus ``csym`` CTE's symmetric edge multiplicity and broke the
degree colors of corpus_wl_refinement while leaving dup-insensitive
consumers (min-label components, BFS) green — the worst kind of oracle
bug, invisible until a dup-sensitive aggregation lands on top.

Rule enforced here: inside any oracle that uses WITH RECURSIVE, a bare
``UNION`` may only appear in a CTE whose body references the CTE's own
name (the recursive-fixpoint idiom, where UNION-dedup IS the
termination mechanism). Everywhere else, dedup must be explicit:
``SELECT DISTINCT ... FROM (... UNION ALL ...)``.

No Spark session needed — pure string analysis, runs in milliseconds.
"""

from __future__ import annotations

import re

import duckdb
import pytest

import __spark_entry__ as entrymod

_BARE_UNION = re.compile(r"\bUNION\b(?!\s+ALL\b)", re.IGNORECASE)
_CTE_HEAD = re.compile(r"(\w+)\s*(?:\([^)]*\))?\s+AS\s*\(", re.IGNORECASE)


def _cte_blocks(sql: str):
    """Yield (cte_name, body, start, end) for every
    ``name [cols] AS ( body )`` in the statement, via paren matching
    from each head — the span comes from the match itself, so
    identical CTE bodies can't alias each other. Nested CTEs (there
    are none in the oracles) would simply yield twice, which is fine
    for a lint."""
    for m in _CTE_HEAD.finditer(sql):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        yield m.group(1), sql[m.end() : i - 1], m.end(), i - 1


def _violations(sql: str) -> list[str]:
    sql = re.sub(r"--[^\n]*", "", sql)  # line comments aren't SQL
    bad = []
    covered: list[tuple[int, int]] = []
    for name, body, start, end in _cte_blocks(sql):
        covered.append((start, end))
        if not _BARE_UNION.search(body):
            continue
        # recursive idiom: the body must read FROM/JOIN its own name —
        # a mere mention (string literal, alias) doesn't make it
        # recursive, and DuckDB won't dedup its UNION
        if not re.search(
            rf"\b(FROM|JOIN)\s+{re.escape(name)}\b", body, re.IGNORECASE
        ):
            bad.append(name)
    # bare UNION in the final SELECT (outside every CTE body)
    for m in _BARE_UNION.finditer(sql):
        if not any(a <= m.start() < b for a, b in covered):
            bad.append(f"<top-level @{m.start()}>")
    return bad


def test_no_bare_union_in_nonrecursive_ctes():
    failures = {}
    for name, sql in entrymod.oracle_sql().items():
        v = _violations(sql)
        if v:
            failures[name] = v
    assert not failures, (
        "bare UNION in a non-recursive CTE (DuckDB under WITH RECURSIVE "
        f"will not dedup it — use SELECT DISTINCT over UNION ALL): {failures}"
    )


def test_duckdb_union_quirk_still_present():
    """Pin the environment behavior the lint defends against. If this
    ever fails (a DuckDB upgrade fixed the quirk), the lint above can
    be relaxed — until then it must stay."""
    con = duckdb.connect()
    plain = con.execute(
        """WITH e AS (SELECT * FROM (VALUES (1,2),(2,1)) t(src,dst)),
           s AS (SELECT src,dst FROM e UNION SELECT dst,src FROM e)
           SELECT count(*) FROM s"""
    ).fetchone()[0]
    rec = con.execute(
        """WITH RECURSIVE
           e AS (SELECT * FROM (VALUES (1,2),(2,1)) t(src,dst)),
           s AS (SELECT src,dst FROM e UNION SELECT dst,src FROM e),
           r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r WHERE n<2)
           SELECT count(*) FROM s"""
    ).fetchone()[0]
    assert plain == 2
    assert rec == 4, "DuckDB now dedups UNION under WITH RECURSIVE — lint can relax"


def test_corpus_csym_is_duplicate_free():
    """The concrete CTE the WL bug lived in: csym must be a set."""
    from citation_graph_spark.operators.graphq import (
        _CORPUS_CTE,
        _CORPUS_PARQUET,
    )
    import os

    if not os.path.exists(_CORPUS_PARQUET):
        pytest.skip("corpus parquet not materialized in this environment")
    con = duckdb.connect()
    total, distinct = con.execute(
        f"""WITH RECURSIVE {_CORPUS_CTE}
            SELECT count(*),
                   (SELECT count(*) FROM (SELECT DISTINCT src, dst FROM csym))
            FROM csym"""
    ).fetchone()
    assert total == distinct


def test_no_fragile_output_types():
    """DESCRIBE every registered oracle; forbid HUGEINT/DECIMAL outputs.

    Why: DuckDB types ``//`` over a ``sum()`` as HUGEINT, and HUGEINT
    fetches as float64 through pandas — the repo's own hasher
    normalizes integral floats, but the round-4 driver gate's hasher
    stringified the raw value, producing 4 hash-red rows for queries
    that are bit-exact locally (VERDICT r4 "What's wrong" #1). Output
    types must be environment-stable: CAST to BIGINT at the oracle's
    final SELECT. DESCRIBE plans without executing, so the full sweep
    is seconds.
    """
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    )
    from oracle_type_sweep import sweep

    sf_dir = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.01")
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.01 testdata not present")
    bad, errs = sweep(sf_dir)
    assert not errs, f"DESCRIBE failed for: {errs}"
    assert not bad, f"environment-fragile oracle output types: {bad}"
