"""As-of join (union + window formulation) and session-window stats."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.operators.asof import asof_join
from nhse_probabilistic_linkage_spark.streaming.windows import session_stats


def _t(minute):
    return datetime(2024, 1, 1, minute // 60, minute % 60, 0)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _t(10), 100.0),
            (2, "A", _t(20), 101.0),
            (3, "A", _t(5), 99.0),   # before any quote
            (4, "B", _t(10), 50.0),
            (5, "B", _t(200), 51.0),  # quote long stale
        ],
        "trade_id long, sym string, ts timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _t(8), 99.5),
            ("A", _t(10), 100.5),  # tie with trade 1 -> matches
            ("A", _t(15), 100.9),
            ("B", _t(9), 49.9),
        ],
        "sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_basic_and_ties(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {r["trade_id"]: r for r in asof_join(trades, quotes, on="ts", by=("sym",)).collect()}
    assert len(out) == 5  # left join: every trade kept
    assert out[1]["asof_bid"] == 100.5  # equal timestamp matches
    assert out[2]["asof_bid"] == 100.9  # most recent earlier quote
    assert out[3]["asof_bid"] is None and out[3]["asof_ts"] is None  # nothing before
    assert out[4]["asof_bid"] == 49.9
    assert out[5]["asof_bid"] == 49.9  # no tolerance -> stale still matches
    # left columns pass through untouched
    assert out[2]["px"] == 101.0 and out[2]["sym"] == "A"


def test_asof_tolerance_nulls_stale(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade_id"]: r
        for r in asof_join(trades, quotes, on="ts", by=("sym",), tolerance="30 minutes").collect()
    }
    assert out[4]["asof_bid"] == 49.9  # 1 minute old: within tolerance
    assert out[5]["asof_bid"] is None  # 191 minutes old: nulled, row kept
    assert len(out) == 5


def test_asof_matches_duckdb_asof_join(spark, trades_quotes):
    """Cross-engine contract: same result as DuckDB's native ASOF JOIN."""
    duckdb = pytest.importorskip("duckdb")
    trades, quotes = trades_quotes
    got = sorted(
        (r["trade_id"], r["asof_bid"])
        for r in asof_join(trades, quotes, on="ts", by=("sym",)).collect()
    )
    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    want = sorted(
        (tid, bid)
        for tid, bid in con.execute(
            "SELECT t.trade_id, q.bid FROM trades t "
            "ASOF LEFT JOIN quotes q ON t.sym = q.sym AND t.ts >= q.ts"
        ).fetchall()
    )
    assert got == want


def test_asof_null_value_is_not_stitched(spark):
    """The matched right row is atomic: a NULL value in the newest matching
    right row must surface as NULL, not be backfilled from an older row
    (per-column ignorenulls carries would stitch fields from different
    rows)."""
    left = spark.createDataFrame([(1, "A", _t(6))], "trade_id long, sym string, ts timestamp")
    right = spark.createDataFrame(
        [("A", _t(0), 49.9), ("A", _t(5), None)], "sym string, ts timestamp, bid double"
    )
    r = asof_join(left, right, on="ts", by=("sym",)).collect()[0]
    assert r["asof_ts"] == _t(5)
    assert r["asof_bid"] is None  # the 10:05 row's NULL, not 10:00's 49.9


def test_asof_duplicate_right_ts_is_deterministic(spark):
    left = spark.createDataFrame([(1, "A", _t(6))], "trade_id long, sym string, ts timestamp")
    right = spark.createDataFrame(
        [("A", _t(5), 1.0), ("A", _t(5), 2.0)], "sym string, ts timestamp, bid double"
    )
    picks = {
        asof_join(left, right.repartition(n), on="ts", by=("sym",)).collect()[0]["asof_bid"]
        for n in (1, 3, 7)
    }
    assert len(picks) == 1  # same winner under any partitioning


def test_asof_plan_is_single_shuffle_no_join(spark, trades_quotes):
    trades, quotes = trades_quotes
    plan = (
        asof_join(trades, quotes, on="ts", by=("sym",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan[:3000]
    assert plan.count("Exchange") <= 2  # union sides feed ONE window exchange


def test_session_stats_batch(spark):
    rows = [
        (1, _t(0), 1.0),
        (1, _t(20), 1.0),   # within 30m of previous -> same session
        (1, _t(60), 2.0),   # 40m silence -> new session
        (2, _t(0), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sorted(
        session_stats(df, gap="30 minutes").collect(),
        key=lambda r: (r["user_id"], r["session_start"]),
    )
    assert [(r["user_id"], r["n_events"], r["sum_value"]) for r in out] == [
        (1, 2, 2.0),
        (1, 1, 2.0),
        (2, 1, 5.0),
    ]
    s0 = out[0]
    assert s0["session_start"] == _t(0)
    assert s0["session_end"] == _t(50)  # last event 00:20 + 30m gap


def test_asof_bucketed_equals_plain(spark, trades_quotes):
    """The hot-key mitigation must be a pure physical rewrite: identical
    output to asof_join for every bucket width, including cross-bucket
    matches (trade 5 matches a quote ~3 buckets earlier at 60s buckets),
    equal-timestamp ties, no-match rows, and tolerance nulling."""
    from nhse_probabilistic_linkage_spark.operators.asof import asof_join_bucketed

    trades, quotes = trades_quotes
    for tol in (None, "30 minutes"):
        want = sorted(
            tuple(r) for r in asof_join(trades, quotes, on="ts", by=("sym",), tolerance=tol).collect()
        )
        for bucket_seconds in (60, 600, 86400):
            got = sorted(
                tuple(r)
                for r in asof_join_bucketed(
                    trades, quotes, on="ts", by=("sym",), tolerance=tol,
                    bucket_seconds=bucket_seconds,
                ).collect()
            )
            assert got == want, (tol, bucket_seconds)


def test_asof_bucketed_randomized(spark):
    """Property check on a bigger random instance: bucketed == plain."""
    from nhse_probabilistic_linkage_spark.operators.asof import asof_join_bucketed

    left = spark.range(500).select(
        F.col("id").alias("lid"),
        F.pmod("id", F.lit(3)).alias("k"),
        F.timestamp_seconds(F.pmod(F.xxhash64("id"), F.lit(100_000))).alias("ts"),
    )
    right = spark.range(200).select(
        F.pmod("id", F.lit(3)).alias("k"),
        F.timestamp_seconds(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100_000))).alias("ts"),
        (F.col("id") * 2).alias("v"),
    )
    want = sorted(tuple(r) for r in asof_join(left, right, on="ts", by=("k",)).collect())
    got = sorted(
        tuple(r)
        for r in asof_join_bucketed(left, right, on="ts", by=("k",), bucket_seconds=3600).collect()
    )
    assert got == want and len(want) == 500


def test_asof_bucketed_null_timestamps(spark):
    """NULL timestamps behave as 'before everything' in asof_join (asc
    nulls-first window order); the bucketed rewrite must preserve that —
    a NULL-ts right row seeds every later bucket, a NULL-ts left row sees
    only NULL-ts right rows."""
    from nhse_probabilistic_linkage_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame(
        [(1, "A", _t(10)), (2, "A", None), (3, "B", _t(10))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", None, 42.0), ("B", None, 7.0), ("B", _t(5), 8.0)],
        "k string, ts timestamp, v double",
    )
    want = sorted(tuple(r) for r in asof_join(left, right, on="ts", by=("k",)).collect())
    got = sorted(
        tuple(r)
        for r in asof_join_bucketed(left, right, on="ts", by=("k",), bucket_seconds=60).collect()
    )
    assert got == want
    by_lid = {r[0]: r for r in got}
    assert by_lid[1][-1] == 42.0  # NULL-ts right row attaches (ts stays NULL)
    assert by_lid[2][-1] == 42.0  # NULL-ts left row matches NULL-ts right
    assert by_lid[3][-1] == 8.0   # real row beats the NULL-ts one


def test_asof_reserved_column_collision_raises(spark):
    # caller columns named like the operator's internal working columns must
    # fail loudly instead of being overwritten/dropped (ADVICE r3 finding)
    from nhse_probabilistic_linkage_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame(
        [(1, datetime(2025, 1, 1), 5)], "k int, ts timestamp, __asof_bucket int"
    )
    right = spark.createDataFrame([(1, datetime(2025, 1, 1), 1.0)], "k int, ts timestamp, v double")
    with pytest.raises(ValueError, match="__asof_bucket"):
        asof_join_bucketed(left, right, on="ts", by=("k",))
    bad_left = spark.createDataFrame(
        [(1, datetime(2025, 1, 1), 0)], "k int, ts timestamp, __asof_side int"
    )
    with pytest.raises(ValueError, match="__asof_side"):
        asof_join(bad_left, right, on="ts", by=("k",))
    # an output-name collision (left already has asof_ts) is also loud
    bad_out = spark.createDataFrame(
        [(1, datetime(2025, 1, 1), datetime(2025, 1, 1))], "k int, ts timestamp, asof_ts timestamp"
    )
    with pytest.raises(ValueError, match="asof_ts"):
        asof_join(bad_out, right, on="ts", by=("k",))
