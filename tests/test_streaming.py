"""Streaming layer: AvailableNow landing ingestion + sessionization."""

from __future__ import annotations

import datetime

from datawarehouseproject_spark.sources.landing import (
    LANDING_SCHEMA,
    latest_landing_path,
    read_landing_csv,
)
from datawarehouseproject_spark.streaming.landing_stream import (
    landing_to_staging_stream,
)
from datawarehouseproject_spark.streaming.windows import (
    sessionize_batch,
    windowed_event_counts,
)

CSV_HEADER = "ID,TEN,LINK,LINK_ANH,GIA_CU,GIA_MOI,KICH_THUOC_MAN_HINH,RAM,BO_NHO,NGAY,ID_CONFIG"


def _write_csv(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        f.write(CSV_HEADER + "\n")
        for r in rows:
            f.write(r + "\n")


def test_landing_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "products_raw_2024_01_01.csv"
    _write_csv(p, ['1,iPhone,link1,img1,"34.990.000đ","33.000.000đ",6.9 inches,8 GB,256 GB,2024-01-01 10:00:00,1'])
    df = read_landing_csv(spark, str(p))
    row = df.collect()[0]
    assert row["TEN"] == "iPhone" and row["ID_CONFIG"] == 1
    assert latest_landing_path(str(tmp_path)).endswith("2024_01_01.csv")


def test_csv_sink_roundtrip(spark, tmp_path):
    from datawarehouseproject_spark.sources.landing import write_landing_csv

    df = spark.createDataFrame([(1, "iPhone", "34.990.000đ")], ["ID", "TEN", "GIA_CU"])
    out = str(tmp_path / "csv_out")
    write_landing_csv(df, out, single_file=True)
    back = spark.read.option("header", True).csv(out)
    row = back.collect()[0]
    assert row["TEN"] == "iPhone" and row["GIA_CU"] == "34.990.000đ"


def test_availablenow_incremental_ingest(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    _write_csv(landing / "products_raw_2024_01_01.csv",
               ["1,A,l1,i1,100,90,6.9,8GB,256GB,2024-01-01 10:00:00,1"])
    landing_to_staging_stream(spark, str(landing), staging, ckpt)
    assert spark.read.parquet(staging).count() == 1

    # second run: only NEW files ingested (idempotency via checkpoint)
    _write_csv(landing / "products_raw_2024_01_02.csv",
               ["2,B,l2,i2,200,180,6.1,12GB,512GB,2024-01-02 10:00:00,1"])
    landing_to_staging_stream(spark, str(landing), staging, ckpt)
    got = spark.read.parquet(staging)
    assert got.count() == 2
    # third run with nothing new: no-op
    landing_to_staging_stream(spark, str(landing), staging, ckpt)
    assert spark.read.parquet(staging).count() == 2


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_sessionize_batch_gap_split(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(59)), (2, _ts(5))],
        "user_id long, ts timestamp",
    )
    out = {(r["user_id"], r["n_events"]) for r in
           sessionize_batch(ev, gap_seconds=1200).collect()}
    # user 1: events at :00/:10 in one session, :59 alone (gap 49 min)
    assert out == {(1, 2), (1, 1), (2, 1)}


def test_windowed_event_counts_batch(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0), "click", 1.0), (2, _ts(30), "click", 2.0),
         (3, datetime.datetime(2024, 1, 1, 1, 30), "view", 3.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    out = {(r["event_type"], r["n_events"]) for r in
           windowed_event_counts(ev, "1 hour").collect()}
    assert out == {("click", 2), ("view", 1)}


def test_stream_hll_maintenance_incremental_and_idempotent(spark, tmp_path):
    """Daily files fold into a persisted <=2^p-row register table;
    the live estimate equals the batch sketch over all data, and
    re-running with the same checkpoint is a no-op (max-merge +
    exactly-once batches)."""
    from pyspark.sql import types as T

    from datawarehouseproject_spark.operators.sketches import (
        hll_distinct,
        hll_estimate,
    )
    from datawarehouseproject_spark.streaming.upsert_stream import (
        stream_hll_maintenance,
    )

    schema = T.StructType([T.StructField("user_id", T.LongType())])
    src = tmp_path / "src"
    src.mkdir()
    day1 = spark.range(0, 3000).selectExpr("id AS user_id")
    day2 = spark.range(2000, 6000).selectExpr("id AS user_id")
    day1.write.parquet(str(src / "d1"))
    sketch_path = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")

    stream_hll_maintenance(
        spark, str(src) + "/*", schema, sketch_path, ckpt, "user_id", p=8
    )
    est1 = hll_estimate(spark.read.parquet(sketch_path), p=8).collect()[0]
    day2.write.parquet(str(src / "d2"))
    stream_hll_maintenance(
        spark, str(src) + "/*", schema, sketch_path, ckpt, "user_id", p=8
    )
    est2 = hll_estimate(spark.read.parquet(sketch_path), p=8).collect()[0]

    # live estimate == one-shot batch sketch over the union
    both = day1.unionByName(day2)
    batch = hll_distinct(both, "user_id", p=8).collect()[0]
    assert est2["hll_estimate"] == batch["hll_estimate"]
    assert est2["buckets_used"] == batch["buckets_used"]
    assert est2["hll_estimate"] > est1["hll_estimate"]  # day 2 grew it

    # replay with the same checkpoint: no new batches, sketch unchanged
    stream_hll_maintenance(
        spark, str(src) + "/*", schema, sketch_path, ckpt, "user_id", p=8
    )
    est3 = hll_estimate(spark.read.parquet(sketch_path), p=8).collect()[0]
    assert est3 == est2
