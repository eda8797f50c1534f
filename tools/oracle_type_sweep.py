"""DESCRIBE every registered oracle and report environment-fragile
output column types.

DuckDB types ``//`` over a ``sum()`` as HUGEINT, and HUGEINT (or
DECIMAL) columns fetch differently across client versions /
normalization layers — the round-4 driver gate's only hash-red rows
were exactly this (VERDICT r4 "What's wrong" #1). This sweep uses
``DESCRIBE <oracle sql>`` (DuckDB plans but does not execute), so the
full 150-oracle pass takes seconds, and flags any output column whose
declared type is HUGEINT, UHUGEINT, or DECIMAL.

Usage: python tools/oracle_type_sweep.py [sf_dir]
Exit status 1 if any fragile column is found (CI-able).

The same check runs in-pytest via tests/test_oracle_sql_lint.py.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAGILE = ("HUGEINT", "UHUGEINT", "DECIMAL")


def sweep(sf_dir: str = "/root/testdata/sf0.01"):
    """Return {query: [(column, type), ...]} for fragile-typed outputs."""
    import __spark_entry__ as entrymod
    from citation_graph_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad: dict[str, list[tuple[str, str]]] = {}
    errs: dict[str, str] = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # noqa: BLE001
            errs[name] = str(exc).splitlines()[0]
            continue
        hits = [
            (col, typ)
            for col, typ, *_ in rows
            if any(f in typ.upper() for f in FRAGILE)
        ]
        # integer-quantized columns (the repo's *_milli/_micro/… naming
        # convention) must be integer-typed: a DOUBLE-typed floor()
        # carries 4375.0 where Spark emits 4375 — raw-stringify hashers
        # diverge even though the values are equal (r5 strict-mode find:
        # doc_repetition, benchmark_contamination)
        hits += [
            (col, typ)
            for col, typ, *_ in rows
            if col.endswith(
                ("_milli", "_micro", "_nano", "_pico", "_r4", "_q4")
            )
            and typ.upper() not in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT")
        ]
        if hits:
            bad[name] = hits
    return bad, errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    bad, errs = sweep(sf_dir)
    for name, hits in sorted(bad.items()):
        for col, typ in hits:
            print(f"FRAGILE {name}: {col} -> {typ}")
    for name, err in sorted(errs.items()):
        print(f"ERROR   {name}: {err}")
    print(f"swept oracles; fragile={len(bad)} describe-errors={len(errs)}")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
