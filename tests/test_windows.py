"""Event-time windowed aggregation (watermark/late-data semantics) and the
stateful first_seen operator."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.streaming.windows import first_seen, windowed_event_stats

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _ev(i, minute, etype="view", value=1.0, second=0):
    return (i, datetime(2024, 1, 1, minute // 60, minute % 60, second), etype, value)


def test_windowed_stats_batch(spark):
    rows = [_ev(1, 1), _ev(2, 14), _ev(3, 16), _ev(4, 16, "click", 2.5)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r["window_start"].minute, r["event_type"]): r
        for r in windowed_event_stats(df, window="15 minutes").collect()
    }
    assert out[(0, "view")]["n_events"] == 2
    assert out[(15, "view")]["n_events"] == 1
    assert out[(15, "click")]["sum_value"] == 2.5
    assert all(
        (r["window_end"] - r["window_start"]).total_seconds() == 900 for r in out.values()
    )


def test_windowed_stream_finalizes_and_drops_late(spark, tmp_path_factory):
    """Pins the REAL watermark contract, not the folklore one: a late row is
    guaranteed dropped only once its window's state has been evicted (the
    watermark guarantees keeping on-time data, it does not guarantee
    dropping same-batch stragglers). So the late row arrives one batch
    AFTER the eviction-triggering advancer."""
    src = str(tmp_path_factory.mktemp("wsrc"))
    ckpt = str(tmp_path_factory.mktemp("wckpt"))
    # batch 0: on-time rows in windows [00:00,00:15) and [00:15,00:30)
    b1 = spark.createDataFrame([_ev(1, 1), _ev(2, 5), _ev(3, 20), _ev(4, 29)], SCHEMA)
    # batch 1: advancer at 02:00 -> watermark becomes 01:50 after this
    # batch; both early windows are finalized, emitted, state evicted
    b2 = spark.createDataFrame([_ev(5, 120)], SCHEMA)
    # batch 2: a LATE row at 00:05 (far behind watermark 01:50, state gone)
    # must be dropped, NOT re-emit or corrupt the finalized window
    b3 = spark.createDataFrame([_ev(6, 5, "view", 99.0), _ev(7, 125)], SCHEMA)
    import time

    for name, b in [("f1", b1), ("f2", b2), ("f3", b3)]:
        b.coalesce(1).write.parquet(os.path.join(src, name))
        time.sleep(1.1)  # file-source batch order is by modification time

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    agg = windowed_event_stats(stream, window="15 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1  # exactly the late row

    got = {r["window_start"].strftime("%H:%M"): r for r in spark.sql("SELECT * FROM win_sink").collect()}
    assert got["00:00"]["n_events"] == 2  # late row 6 absent
    assert got["00:00"]["sum_value"] == 2.0  # 99.0 never folded in
    assert got["00:15"]["n_events"] == 2
    # windows past the final watermark stay open — append mode never emits them
    assert "02:00" not in got and "02:15" not in got


def test_first_seen_across_batches(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("fsrc"))
    ckpt = str(tmp_path_factory.mktemp("fckpt"))
    s = "doc_id long, fp long, batch int"
    b1 = spark.createDataFrame([(1, 100, 1), (2, 100, 1), (3, 200, 1)], s)
    b2 = spark.createDataFrame([(4, 100, 2), (5, 300, 2)], s)
    b1.coalesce(1).write.parquet(os.path.join(src, "f1"))
    import time

    time.sleep(1.1)
    b2.coalesce(1).write.parquet(os.path.join(src, "f2"))

    stream = spark.readStream.schema(s).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    q = (
        first_seen(stream, "fp")
        .writeStream.format("memory")
        .queryName("fs_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.sql("SELECT * FROM fs_sink").collect()
    by_fp = {}
    for r in rows:
        by_fp.setdefault(r["fp"], []).append(r)
    # exactly one row per distinct key across the whole stream
    assert sorted(by_fp) == [100, 200, 300]
    assert all(len(v) == 1 for v in by_fp.values())
    # a key seen in both batches surfaces from its FIRST batch
    assert by_fp[100][0]["batch"] == 1
    assert by_fp[300][0]["batch"] == 2
