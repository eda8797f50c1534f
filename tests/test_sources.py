"""Round-trip tests for the sources/sinks module (SURVEY §2.1)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from citation_graph_spark import sources


def test_csv_roundtrip_sorted(spark, tmp_path):
    df = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b")], "id int, name string"
    )
    out = str(tmp_path / "csv_out")
    sources.write_sorted_csv(df, out, ["id"])
    back = sources.read_csv(spark, out, "id int, name string")
    assert [tuple(r) for r in back.collect()] == [(1, "a"), (2, "b"), (3, "c")]


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])], "uid int, vec array<double>"
    )
    out = str(tmp_path / "jsonl_out")
    sources.write_jsonl(df, out, ["uid"])
    back = sources.read_jsonl(spark, out, "uid int, vec array<double>")
    rows = {r["uid"]: r["vec"] for r in back.collect()}
    assert rows == {1: [0.1, 0.2], 2: [0.3, 0.4]}


def test_json_dir_filename_is_key(spark, tmp_path):
    d = tmp_path / "entities"
    d.mkdir()
    for key, val in [("alpha", 1), ("beta", 2)]:
        (d / f"{key}.json").write_text(json.dumps({"v": val}))
    df = sources.read_json_dir(spark, str(d), "v int")
    rows = {r["entity_key"]: r["v"] for r in df.collect()}
    assert rows == {"alpha": 1, "beta": 2}


def test_binary_dir(spark, tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "x.bin").write_bytes(b"\x00\x01\x02")
    df = sources.read_binary_dir(spark, str(d), "*.bin")
    r = df.collect()[0]
    assert r["length"] == 3 and bytes(r["content"]) == b"\x00\x01\x02"


def test_upsert_partitioned_is_idempotent_merge(spark, tmp_path):
    out = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 10)], "part string, v int"
    )
    base.write.partitionBy("part").parquet(out)
    # upsert replaces only partition 'a'; 'b' untouched
    up = spark.createDataFrame([("a", 99)], "part string, v int")
    sources.upsert_partitioned(up, out, "part")
    rows = sorted(
        tuple(r) for r in spark.read.parquet(out).select("part", "v").collect()
    )
    assert rows == [("a", 99), ("b", 10)]
    # re-running the same batch is a no-op (MERGE property)
    sources.upsert_partitioned(up, out, "part")
    rows2 = sorted(
        tuple(r) for r in spark.read.parquet(out).select("part", "v").collect()
    )
    assert rows2 == rows


def test_bucketed_tables_join_without_exchange(spark):
    """Two tables bucketed on the join key with equal bucket counts →
    the equi-join plans with ZERO Exchange (co-located sort-merge
    join). The 100 TB posture: shuffle the fact table once at write
    time, never again per query."""
    import io
    import contextlib

    left = spark.range(0, 10_000).selectExpr(
        "id AS k", "id * 2 AS a"
    )
    right = spark.range(0, 10_000).selectExpr(
        "id AS k", "id * 3 AS b"
    )
    sources.write_bucketed(left, "t_bleft", ["k"], 8, sort_cols=["k"])
    sources.write_bucketed(right, "t_bright", ["k"], 8, sort_cols=["k"])
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("t_bleft").join(spark.table("t_bright"), "k")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            total = joined.selectExpr("sum(a + b) AS s").collect()[0]["s"]
            assert total == sum(i * 5 for i in range(10_000))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    import io
    import contextlib

    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(100)],
        "id int, name string, score double",
    )
    out = str(tmp_path / "orc_out")
    sources.write_orc(df, out, ["id"])
    back = sources.read_orc(spark, out, "id int, name string, score double")
    assert back.count() == 100
    assert [tuple(r) for r in back.orderBy("id").limit(2).collect()] == [
        (0, "name0", 0.0),
        (1, "name1", 1.5),
    ]
    # filters reach the ORC scan just like parquet
    q = back.filter(F.col("id") > 90).select("id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "id" in plan, plan
    assert q.count() == 9
