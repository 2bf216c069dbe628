"""Bucketized range join: points to containing intervals, at scale.

Spark's only native plan for `p.t BETWEEN i.start AND i.end` with no
equality key is BroadcastNestedLoopJoin — O(|P|x|I|) and driver-broadcast,
dead at corpus scale. The standard fix (what Databricks' range-join hint
does under the hood) is bucketization: slice time into fixed-width buckets,
explode each interval to the buckets it covers, map each point to its one
bucket, equi-join on (keys..., bucket) — a plain shuffled hash join — and
re-check the exact predicate to discard same-bucket near-misses.

Choosing the bucket width: ~the median interval length. Too wide -> many
false candidates per bucket (filtered after the join, but shuffled);
too narrow -> long intervals explode to many rows. The explosion is
size(interval)/W rows per interval — for intervals whose span is bounded
(sessions, maintenance windows, DHCP leases) this is a small constant. A
pathological unbounded interval (a row spanning the whole corpus timeline)
explodes to timeline/W rows; `max_buckets_per_interval` fails fast instead
of silently materializing it — split such intervals upstream or raise W.

Semantics: half-open [start, end) containment, one output row per
(point, matching interval); points matching nothing are dropped (inner) or
kept with nulls (how='left').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: tuple[str, ...] = (),
    bucket_seconds: int = 1800,
    how: str = "inner",
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Join each point row to the interval rows containing it.

    Output: all point columns + the interval's columns (minus the `by`
    duplicates). Timestamps are bucketed via their epoch seconds; the exact
    half-open containment predicate is re-applied after the equi-join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    # Bucketize on MICROSECOND epochs: unix_timestamp() truncates fractional
    # seconds, so an `end` like 10:30:00.000123 would truncate onto the bucket
    # boundary and the interval's final bucket would never be exploded —
    # points in [10:30:00, end) would silently miss their interval.
    w = F.lit(int(bucket_seconds) * 1_000_000)
    # cast("timestamp") first: unix_micros rejects TIMESTAMP_NTZ (which
    # session_window/window aggregations emit); the cast interprets NTZ in
    # the session timezone — the same conversion Spark applies when the
    # exact predicate below compares NTZ and LTZ columns, so buckets and
    # predicate stay consistent
    def _micros(col_name: str):
        return F.unix_micros(F.col(col_name).cast("timestamp"))

    p_bucket = F.floor(_micros(point_col) / w)
    i_first = F.floor(_micros(start_col) / w)
    # end is exclusive: a zero-length or sub-bucket interval still covers
    # its start bucket, so the sequence is over [first, last_inclusive]
    i_last = F.floor((_micros(end_col) - 1) / w)
    n_buckets = i_last - i_first + 1

    guarded = intervals.withColumn("_nb", n_buckets)
    # fail fast on pathological intervals rather than exploding them
    too_wide = guarded.where(F.col("_nb") > max_buckets_per_interval)
    if not too_wide.isEmpty():
        worst = too_wide.agg(F.max("_nb")).collect()[0][0]
        raise ValueError(
            f"interval spans {worst} buckets (> {max_buckets_per_interval}); "
            f"raise bucket_seconds or split the interval upstream"
        )
    exploded = guarded.drop("_nb").withColumn(
        "_bucket", F.explode(F.sequence(i_first, F.greatest(i_last, i_first)))
    )
    tagged_points = points.withColumn("_bucket", p_bucket)

    exact = (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    if how == "inner":
        out = tagged_points.join(exploded, [*by, "_bucket"]).where(exact)
        return out.drop("_bucket")
    # left: inner-match first, then add unmatched points with null interval
    # columns — cheaper than a true outer join on the exploded side
    matched = tagged_points.join(exploded, [*by, "_bucket"]).where(exact).drop("_bucket")
    icols = [c for c in exploded.columns if c not in (*by, "_bucket")]
    # null-safe (<=>) anti-join: a USING/equality anti-join would never match
    # a point row carrying a NULL against itself, emitting it twice (matched
    # AND unmatched-with-null-intervals)
    probe = matched.select(*points.columns).distinct().alias("_m")
    base = points.alias("_p")
    anti_cond = None
    for c in points.columns:
        term = F.col(f"_p.{c}").eqNullSafe(F.col(f"_m.{c}"))
        anti_cond = term if anti_cond is None else (anti_cond & term)
    unmatched = (
        base.join(probe, anti_cond, "left_anti")
        .select("*", *[F.lit(None).cast(exploded.schema[c].dataType).alias(c) for c in icols])
    )
    return matched.unionByName(unmatched)
