"""Independent-semantics oracle self-check (no Spark needed).

Round 4 hit two oracle bugs that were ENVIRONMENT semantics, not
query logic — the recursive-CTE bare-UNION dedup quirk and HUGEINT
output typing — both caught late, at the driver. A second DuckDB
*version* is unavailable here (no pip installs), so this runs the
next-best independent check: every registered oracle executes twice
in the same DuckDB —

  A. default configuration (what the gate uses), and
  B. ALL optimizers disabled (``duckdb_optimizers()`` enumeration)
     + ``threads=1``

— and the order-insensitive value hashes must agree. Pass B takes
materially different plans (no filter pushdown, no join reorder, no
CTE dedup shortcuts, serial execution), so any oracle whose result
depends on plan shape, parallel accumulation order, or an optimizer
rewrite diverges HERE before it diverges at a driver running a
different DuckDB build.

Usage: python tools/oracle_selfcheck.py [--json OUT.json] [sf_dir] [query ...]
Exit 1 on any divergence.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from citation_graph_spark.compare import table_hash  # noqa: E402
from citation_graph_spark.tables import TABLE_NAMES  # noqa: E402


def _connect(sf_dir: str, unoptimized: bool) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    if unoptimized:
        opts = [
            r[0]
            for r in con.execute(
                "SELECT name FROM duckdb_optimizers()"
            ).fetchall()
        ]
        con.execute(f"SET disabled_optimizers='{','.join(opts)}'")
        con.execute("SET threads=1")
    return con


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con_a = _connect(sf_dir, unoptimized=False)
    con_b = _connect(sf_dir, unoptimized=True)

    records: dict[str, dict] = {}
    failures = []
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            ra = con_a.sql(sql)
            cols_a = [d[0] for d in ra.description]
            rows_a = ra.fetchall()
            rb = con_b.sql(sql)
            cols_b = [d[0] for d in rb.description]
            rows_b = rb.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            records[name] = {"match": False, "err": str(exc).splitlines()[0]}
            print(f"FAIL  {name}: {str(exc).splitlines()[0]}")
            continue
        ha = table_hash(rows_a, cols_a)
        hb = table_hash(rows_b, cols_b)
        ok = ha == hb and len(rows_a) == len(rows_b)
        records[name] = {
            "match": ok,
            "rows": len(rows_a),
            "rows_unopt": len(rows_b),
            "err": None,
        }
        wall = time.monotonic() - t0
        if ok:
            print(f"PASS  {name}: rows={len(rows_a)} [{wall:.1f}s]")
        else:
            failures.append(name)
            print(
                f"FAIL  {name}: default={ha}/{len(rows_a)}r "
                f"unoptimized={hb}/{len(rows_b)}r [{wall:.1f}s]"
            )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1)
        print(f"wrote {json_out} ({len(records)} oracles)")
    if failures:
        print(f"{len(failures)} DIVERGENT: {failures}")
        return 1
    print("all oracles plan-shape-independent")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
