"""Order-insensitive result comparison — the exact semantics of the
driver's correctness gate (row count, column-name set, value hash with
columns sorted by name and float normalization), shared by
tools/check_correctness.py and the high-dim fixture tests so "matches
the oracle" means one thing everywhere."""

from __future__ import annotations

import hashlib


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def raw_val(v):
    """Driver-hasher model: raw stringification, NO float
    normalization. The round-4 driver gate hashed HUGEINT-sourced
    float64s as '1666.0' while Spark emitted 1666 — norm_val masked
    the divergence locally. Strict mode hashes with raw_val as well,
    so any value whose cross-engine equality depends on normalization
    fails HERE first, not at the driver."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash_raw(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(raw_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def compare_results(rows, cols, orows, ocols) -> list[str]:
    """Gate-shaped diff: returns [] when the two result sets match."""
    problems = []
    if len(rows) != len(orows):
        problems.append(f"rowcount spark={len(rows)} duck={len(orows)}")
    if sorted(cols) != sorted(ocols):
        problems.append(f"cols spark={sorted(cols)} duck={sorted(ocols)}")
    if not problems:
        hs, hd = table_hash(rows, cols), table_hash(orows, ocols)
        if hs != hd:
            problems.append(f"valuehash spark={hs} duck={hd}")
    return problems
