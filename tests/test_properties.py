"""Property-based tests (hypothesis) for the scalar-function library.

Each property generates a batch of adversarial inputs and evaluates
the column expression over the WHOLE batch in one Spark job (local
collect), comparing against a straightforward Python reference — the
SURVEY §5 oracle pattern, with hypothesis supplying the inputs instead
of hand-picked cases. max_examples is kept small because every example
is a full (tiny) Spark job; each example carries a 60-string batch so
the input coverage stays broad.
"""

from __future__ import annotations

import calendar
import datetime as dt
import re

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from citation_graph_spark import functions as cf

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _eval(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r["y"] for r in df.select(col_fn(F.col("x")).alias("y")).collect()]


def _lenient_date_ref(s: str):
    if s is None:
        return None
    if re.fullmatch(r"\d{4}", s):
        return dt.date(int(s), 1, 1)
    m = re.fullmatch(r"(\d{4})-(\d{1,2})-(\d{1,2})", s)
    if m:
        y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if 1 <= mo <= 12 and d >= 1:
            return dt.date(y, mo, min(d, calendar.monthrange(y, mo)[1]))
        return None
    try:
        return dt.date.fromisoformat(s)
    except ValueError:
        return None


_date_strings = st.one_of(
    st.from_regex(r"\A[0-9]{4}-[0-9]{1,2}-[0-9]{1,2}\Z"),
    st.from_regex(r"\A[0-9]{4}\Z"),
    st.text(
        alphabet="0123456789-/ab ", min_size=0, max_size=12
    ),
)


def _in_domain(s: str) -> bool:
    """The property covers the two explicit branches plus
    letter-containing garbage. Bare digit runs / yyyy-mm prefixes fall
    into Spark's lenient string→date CAST, whose extra accepted shapes
    are deliberately out of the reference function's contract. Year
    0000 differs between proleptic Spark dates and datetime.date."""
    if re.fullmatch(r"\d{4}", s) or re.fullmatch(r"\d{4}-\d{1,2}-\d{1,2}", s):
        return not s.startswith("0000")
    return "a" in s or "b" in s


@settings(**_SETTINGS)
@given(st.lists(_date_strings, min_size=1, max_size=60))
def test_lenient_date_matches_python_reference(spark, batch):
    batch = [s for s in batch if _in_domain(s)] or ["1999"]
    got = _eval(spark, cf.lenient_date, batch)
    want = [_lenient_date_ref(s) for s in batch]
    assert got == want, list(zip(batch, got, want))


def _bigrams_ref(s: str):
    if s is None or len(s) < 2:
        return []
    out, seen = [], set()
    for i in range(len(s) - 1):
        g = s[i : i + 2]
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet=st.characters(codec="ascii"), max_size=8),
        min_size=1,
        max_size=60,
    )
)
def test_char_bigrams_matches_python_reference(spark, batch):
    got = _eval(spark, cf.char_bigrams, batch)
    want = [_bigrams_ref(s) for s in batch]
    assert got == want, list(zip(batch, got, want))


def _norm_name_ref(s: str) -> str:
    s = re.sub(r"[^a-z ]", "", s.lower())
    return re.sub(r" +", " ", s).strip()


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet=st.characters(codec="ascii"), max_size=20),
        min_size=1,
        max_size=60,
    )
)
def test_normalize_author_name_matches_python_reference(spark, batch):
    got = _eval(spark, cf.normalize_author_name, batch)
    want = [_norm_name_ref(s) for s in batch]
    assert got == want, list(zip(batch, got, want))


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=60))
def test_split_col_total_and_deterministic(spark, ids):
    from citation_graph_spark.operators.sampling import split_col

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = df.select(
        "doc_id", split_col(F.col("doc_id")).alias("s")
    ).collect()
    # total: every key gets exactly one of the three labels
    assert all(r["s"] in ("train", "val", "test") for r in rows)
    # deterministic pure function of the key: duplicates agree
    seen: dict[int, str] = {}
    for r in rows:
        if r["doc_id"] in seen:
            assert seen[r["doc_id"]] == r["s"]
        seen[r["doc_id"]] = r["s"]
