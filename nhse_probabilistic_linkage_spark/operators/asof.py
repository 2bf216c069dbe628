"""As-of join: attach the most recent right-side row at or before each left
row's timestamp, per key — the time-series enrichment join Spark lacks as a
primitive (DuckDB/Pandas expose it as ASOF JOIN / merge_asof).

Spark-first formulation — NO join operator at all: tag and union both
sides, then one window pass per key ordered by (time, side) carries the
last-seen right-side values forward onto each left row. That is a single
shuffle on the key columns and a sort within each partition, which is
strictly cheaper than the naive alternatives (a range self-join explodes to
O(|L|x|R|) per key before filtering; a broadcast of the right side dies when
the right side is a fact table). Window frames are rows-based and
whole-stage-codegen'd; no Python anywhere.

Semantics (tie rule): a right row with EXACTLY the left row's timestamp
matches (right rows sort before left rows at equal times). With `tolerance`
set, matches older than the tolerance are nulled out — the row is kept,
like a left join, so downstream accounting still sees every left row.

Skew note: the shuffle key is `by`; a single hot key (one user with 10^8
events) serializes into one task's sort. At that shape, pre-bucket the hot
keys by coarse time range and as-of join within buckets, carrying the
previous bucket's last right row as a seed row — same operator, applied per
bucket.

Reference analog: the reference's event-history alignment joins records to
the latest preceding demographic snapshot via window ranking
(utils/dataset_ingestion_utils.py history handling); this generalizes that
idiom to any (key, time) pair of tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = (),
    value_cols: tuple[str, ...] | None = None,
    tolerance: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + (`{prefix}{on}`, `{prefix}{col}` for each value col) from
    the most recent right row with right.on <= left.on within the same `by`
    group; nulls when no such row (or none within `tolerance`, an interval
    literal like '2 hours').
    """
    if value_cols is None:
        value_cols = tuple(c for c in right.columns if c not in (*by, on))
    lcols = list(left.columns)

    # The matched right row is carried as ONE struct, not per-column lasts:
    # per-column last(..., ignorenulls) would conflate "not a right row"
    # with "right row whose value IS NULL" and stitch together fields from
    # DIFFERENT right rows (the timestamp from the newest, the value from
    # the newest with a non-null value). One struct, one last() — the match
    # is atomic and legitimate NULL values survive.
    rrow_t = f"struct<t:{right.schema[on].dataType.simpleString()}," + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
    ) + ">"
    tagged_left = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c not in by and c != on],
        F.col(on),
        F.lit(None).cast(rrow_t).alias("_rrow"),
    )
    tagged_right = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != on],
        F.lit(None).cast(left.schema[on].dataType).alias(on),
        F.struct(
            F.col(on).alias("t"), *[F.col(c).alias(c) for c in value_cols]
        ).alias("_rrow"),
    )

    # Tie rules: right rows sort before left rows at equal times (equal
    # timestamps match); duplicate right rows at the same (by, on) are
    # broken by a value hash — arbitrary but a pure function of the data,
    # so the pick is stable under repartitioning (same determinism policy
    # as sampling.stratified_cap).
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.xxhash64("_rrow").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        F.last("_rrow", ignorenulls=True).over(w).alias("_m"),
    )
    out = carried.where(F.col("_side") == 1)
    if tolerance is not None:
        in_tol = F.col("_m.t") >= F.col("_t") - F.expr(f"INTERVAL {tolerance}")
    else:
        in_tol = F.lit(True)
    keep = F.col("_m").isNotNull() & in_tol
    return out.select(
        *[F.col(c) for c in lcols],
        F.when(keep, F.col("_m.t")).alias(f"{prefix}{on}"),
        *[F.when(keep, F.col(f"_m.{c}")).alias(f"{prefix}{c}") for c in value_cols],
    )
