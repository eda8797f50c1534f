"""Reference scalar-function library as pure column expressions.

Exact re-expressions of the reference's row-at-a-time Python string/
date helpers (SURVEY §2.8 F1-F14) as Catalyst column algebra — each one
whole-stage-codegen'd JVM-side, no UDFs. Unit-tested for behavioral
parity in tests/test_functions.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_title(col: Column) -> Column:
    """F1 — reference utils.py:76-98: keep alphabetic chars only, drop
    whitespace entirely, lowercase, truncate to 30. Used as an
    equi-join key for entity resolution (combine_serp.py:239-245)."""
    return F.lower(F.substring(F.regexp_replace(col, "[^A-Za-z]", ""), 1, 30))


def generate_uid(col: Column) -> Column:
    """F2 — reference utils.py:56-73: sha256(name)[:8] fallback id."""
    return F.substring(F.sha2(col, 256), 1, 8)


def lenient_date(col: Column) -> Column:
    """F3 — reference utils.py:109-137: bare 4-digit year → Jan 1 of
    that year; else standard parse; unparseable → null. Out-of-range
    days are repaired by clamping to the month's last day (reference
    orcid.py:98-103 calendar.monthrange), e.g. 2021-02-30 → 2021-02-28;
    invalid months/zero days still null out."""
    full = r"^(\d{4})-(\d{1,2})-(\d{1,2})$"
    y = F.regexp_extract(col, full, 1).cast("int")
    m = F.regexp_extract(col, full, 2).cast("int")
    d = F.regexp_extract(col, full, 3).cast("int")
    # month length in pure column algebra (null for invalid months, so
    # make_date below only ever sees valid parts — ANSI-safe)
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    month_end = (
        F.when(m == 2, F.lit(28) + leap.cast("int"))
        .when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
        .when(m.isin(4, 6, 9, 11), 30)
    )
    repaired = F.when(
        month_end.isNotNull() & (d >= 1),
        F.make_date(y, m, F.least(d, month_end)),
    )
    return (
        F.when(
            col.rlike(r"^\d{4}$"),
            F.make_date(col.cast("int"), F.lit(1), F.lit(1)),
        )
        .when(col.rlike(r"^\d{4}-\d{1,2}-\d{1,2}$"), repaired)
        .otherwise(F.try_to_date(col))  # try_: unparseable → null, not ANSI error
    )


def strip_quotes(col: Column) -> Column:
    """F4 — reference gather_articles.py:246-251: remove single/double
    quotes (title/abstract cleaning before CSV write)."""
    return F.translate(col, "\"'", "")


def normalize_author_name(col: Column) -> Column:
    """F5 — reference combine_serp.py:43-48: lowercase, strip
    non-alpha-space, collapse runs of spaces, trim."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), "[^a-z ]", ""), " +", " ")
    )


def initials(col: Column) -> Column:
    """F5 — reference combine_serp.py:51-53: first letter of each
    whitespace-separated word, concatenated."""
    return F.array_join(
        F.transform(F.split(F.trim(col), r"\s+"), lambda w: F.substring(w, 1, 1)),
        "",
    )


def last_name(col: Column) -> Column:
    """F5 — reference combine_serp.py:56-58: last whitespace token."""
    return F.element_at(F.split(F.trim(col), r"\s+"), -1)


def char_bigrams(col: Column) -> Column:
    """Distinct character 2-grams — the similarity alphabet for the
    blocked fuzzy join (J7; stands in for rapidfuzz ratio,
    combine_serp.py:108-113, as portable column algebra).

    Guarded for length <= 1: Spark's sequence(1, 0) produces a
    DESCENDING [1, 0] (bogus grams) where DuckDB's generate_series(1, 0)
    is empty — short strings must yield [] on both engines."""
    return F.when(
        F.length(col) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(col) - 1),
                lambda i: col.substr(i, F.lit(2)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
