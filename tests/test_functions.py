"""Behavioral parity tests for the scalar-function library
(citation_graph_spark.functions vs the reference's Python helpers —
SURVEY §2.8 F1-F5)."""

from __future__ import annotations

import pyspark.sql.functions as F

from citation_graph_spark import functions as cgf


def _one(spark, col, value):
    return (
        spark.createDataFrame([(value,)], "s string").select(col.alias("r")).collect()
    )[0]["r"]


def test_normalize_title(spark):
    # reference utils.py:76-98: alpha only, no spaces, lower, 30 chars
    assert _one(spark, cgf.normalize_title(F.col("s")), "The Blue-Brain  Project!") == (
        "thebluebrainproject"
    )
    long = "A" * 50
    assert _one(spark, cgf.normalize_title(F.col("s")), long) == "a" * 30


def test_generate_uid_is_8_hex(spark):
    uid = _one(spark, cgf.generate_uid(F.col("s")), "Jane Doe")
    assert len(uid) == 8 and all(c in "0123456789abcdef" for c in uid)
    assert uid != _one(spark, cgf.generate_uid(F.col("s")), "John Doe")


def test_lenient_date(spark):
    # reference utils.py:109-137: bare year → Jan 1
    assert str(_one(spark, cgf.lenient_date(F.col("s")), "2021")) == "2021-01-01"
    assert str(_one(spark, cgf.lenient_date(F.col("s")), "2021-07-15")) == "2021-07-15"
    assert _one(spark, cgf.lenient_date(F.col("s")), "not a date") is None


def test_lenient_date_day_repair(spark):
    # reference orcid.py:98-103: out-of-range day clamps to month end
    assert str(_one(spark, cgf.lenient_date(F.col("s")), "2021-02-30")) == "2021-02-28"
    assert str(_one(spark, cgf.lenient_date(F.col("s")), "2020-02-30")) == "2020-02-29"
    assert str(_one(spark, cgf.lenient_date(F.col("s")), "2021-04-31")) == "2021-04-30"
    assert str(_one(spark, cgf.lenient_date(F.col("s")), "2021-2-5")) == "2021-02-05"
    # invalid month / zero day are NOT repairable
    assert _one(spark, cgf.lenient_date(F.col("s")), "2021-13-01") is None
    assert _one(spark, cgf.lenient_date(F.col("s")), "2021-02-00") is None


def test_char_bigrams_short_strings(spark):
    # Spark sequence(1,0) descends; the guard must yield [] like DuckDB
    assert _one(spark, cgf.char_bigrams(F.col("s")), "a") == []
    assert _one(spark, cgf.char_bigrams(F.col("s")), "") == []
    assert _one(spark, cgf.char_bigrams(F.col("s")), "ab") == ["ab"]


def test_strip_quotes(spark):
    assert _one(spark, cgf.strip_quotes(F.col("s")), "\"it's\" quoted") == "its quoted"


def test_author_name_helpers(spark):
    assert (
        _one(spark, cgf.normalize_author_name(F.col("s")), "  Jean-Luc   PICARD ")
        == "jeanluc picard"
    )
    assert _one(spark, cgf.initials(F.col("s")), "Jean Luc Picard") == "JLP"
    assert _one(spark, cgf.last_name(F.col("s")), "Jean Luc Picard") == "Picard"


def test_char_bigrams(spark):
    grams = _one(spark, cgf.char_bigrams(F.col("s")), "abca")
    assert sorted(grams) == ["ab", "bc", "ca"]


def test_split_col_fractions_and_stability(spark):
    from citation_graph_spark.operators.sampling import split_col
    import pyspark.sql.functions as F

    ids = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    counts = {
        r["split"]: r["n"]
        for r in ids.withColumn("split", split_col(F.col("doc_id")))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = 20_000
    assert abs(counts["train"] / n - 204 / 256) < 0.01
    assert abs(counts["val"] / n - 26 / 256) < 0.01
    assert abs(counts["test"] / n - 26 / 256) < 0.01
    # assignment is a pure function of the key: partitioning-invariant
    a = ids.withColumn("split", split_col(F.col("doc_id"))).collect()
    b = (
        ids.repartition(17)
        .withColumn("split", split_col(F.col("doc_id")))
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
