"""Bucketized range join."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.operators.ranges import range_join


def _t(minute, second=0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second)


@pytest.fixture(scope="module")
def data(spark):
    points = spark.createDataFrame(
        [(1, "u1", _t(5)), (2, "u1", _t(35)), (3, "u1", _t(90)), (4, "u2", _t(5))],
        "pid long, user string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", _t(0), _t(30), "a"),    # contains p1
            ("u1", _t(30), _t(60), "b"),   # contains p2 (start-inclusive)
            ("u2", _t(0), _t(30), "c"),    # contains p4 (other key)
        ],
        "user string, start timestamp, end timestamp, tag string",
    )
    return points, intervals


def test_range_join_containment_and_boundaries(spark, data):
    points, intervals = data
    out = {r["pid"]: r for r in range_join(points, intervals, by=("user",), bucket_seconds=600).collect()}
    assert out[1]["tag"] == "a"
    assert out[2]["tag"] == "b"  # ts == start: half-open includes it
    assert out[4]["tag"] == "c"  # keyed: u2's point never sees u1 intervals
    assert 3 not in out  # inner: uncovered point dropped


def test_range_join_left_keeps_unmatched(spark, data):
    points, intervals = data
    out = {r["pid"]: r for r in range_join(points, intervals, by=("user",), how="left").collect()}
    assert len(out) == 4
    assert out[3]["tag"] is None and out[3]["start"] is None


def test_range_join_spanning_multiple_buckets(spark, data):
    points, intervals = data
    # tiny buckets force every interval across many buckets; result is
    # identical (the exact predicate dedupes nothing — each point maps to
    # ONE bucket, so no duplicate matches are possible by construction)
    a = sorted((r["pid"], r["tag"]) for r in range_join(points, intervals, by=("user",), bucket_seconds=60).collect())
    b = sorted((r["pid"], r["tag"]) for r in range_join(points, intervals, by=("user",), bucket_seconds=3600).collect())
    assert a == b


def test_range_join_end_exclusive(spark):
    points = spark.createDataFrame([(1, _t(30))], "pid long, ts timestamp")
    intervals = spark.createDataFrame([(_t(0), _t(30), "x")], "start timestamp, end timestamp, tag string")
    assert range_join(points, intervals).count() == 0


def test_range_join_rejects_pathological_interval(spark):
    points = spark.createDataFrame([(1, _t(0))], "pid long, ts timestamp")
    wide = spark.createDataFrame(
        [(datetime(2000, 1, 1), datetime(2030, 1, 1), "w")],
        "start timestamp, end timestamp, tag string",
    )
    with pytest.raises(ValueError, match="buckets"):
        range_join(points, wide, bucket_seconds=60, max_buckets_per_interval=1000)


def test_range_join_fractional_second_end_on_bucket_boundary(spark):
    # end = 00:30:00.000123 truncates to the 1800s bucket boundary under
    # second-resolution bucketing, so the interval's final bucket would never
    # be exploded and the point at exactly 00:30:00 (inside [start, end))
    # would silently miss. Microsecond bucketing must find it.
    end = datetime(2024, 1, 1, 0, 30, 0, 123)
    points = spark.createDataFrame([(1, datetime(2024, 1, 1, 0, 30, 0))], "pid long, ts timestamp")
    intervals = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0, 0), end, "x")],
        "start timestamp, end timestamp, tag string",
    )
    out = range_join(points, intervals, bucket_seconds=1800).collect()
    assert [(r.pid, r.tag) for r in out] == [(1, "x")]


def test_range_join_left_null_column_not_duplicated(spark, data):
    # a matched point row carrying a NULL must appear exactly once — a
    # null-unsafe anti-join would never match it against itself and emit it
    # again with null interval columns
    _, intervals = data
    points = spark.createDataFrame(
        [(1, "u1", _t(5), None), (3, "u1", _t(90), None)],
        "pid long, user string, ts timestamp, note string",
    )
    rows = range_join(points, intervals, by=("user",), how="left").collect()
    assert len(rows) == 2
    by_pid = {r.pid: r for r in rows}
    assert by_pid[1].tag == "a" and by_pid[3].tag is None


def test_range_join_matches_duckdb(spark, data):
    duckdb = pytest.importorskip("duckdb")
    points, intervals = data
    got = sorted(
        (r["pid"], r["tag"])
        for r in range_join(points, intervals, by=("user",)).collect()
    )
    con = duckdb.connect()
    con.register("p", points.toPandas())
    con.register("i", intervals.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT p.pid, i.tag FROM p JOIN i ON p.user = i.user "
            "AND p.ts >= i.start AND p.ts < i.end"
        ).fetchall()
    )
    assert got == want
