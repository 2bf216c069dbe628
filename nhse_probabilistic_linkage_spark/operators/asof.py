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
events) serializes into one task's sort. `asof_join_bucketed` below is the
mitigation: pre-bucket both sides by coarse time range so the shuffle key
becomes (by, bucket), and seed each bucket with the previous buckets' last
right row (computed by running the same as-of over the tiny per-bucket
summary table) — identical output, hot-key work spread across
timeline/bucket_seconds tasks.

Reference analog: the reference's event-history alignment joins records to
the latest preceding demographic snapshot via window ranking
(utils/dataset_ingestion_utils.py history handling); this generalizes that
idiom to any (key, time) pair of tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Internal working columns use an improbable __asof_ prefix AND are guarded:
# silently overwriting (or dropping) a caller column of the same name would
# corrupt data with no error — the guard turns that into a loud ValueError.
_T, _SIDE, _RROW, _M = "__asof_t", "__asof_side", "__asof_rrow", "__asof_m"
_BUCKET, _RN, _PRESENT = "__asof_bucket", "__asof_rn", "__asof_present"
_SEED = "__asof_seed_"


def _guard_columns(df: DataFrame, names: tuple[str, ...], op: str) -> None:
    clash = sorted(set(df.columns) & set(names))
    if clash:
        raise ValueError(
            f"{op}: input column(s) {clash} collide with reserved internal/"
            "output names; rename them before calling"
        )


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
    _guard_columns(left, (_T, _SIDE, _RROW, _M), "asof_join")
    _guard_columns(right, (_T, _SIDE, _RROW, _M), "asof_join")
    out_names = tuple(f"{prefix}{c}" for c in (on, *value_cols))
    _guard_columns(left, out_names, "asof_join (output columns)")

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
        F.col(on).alias(_T),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in lcols if c not in by and c != on],
        F.col(on),
        F.lit(None).cast(rrow_t).alias(_RROW),
    )
    tagged_right = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias(_T),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != on],
        F.lit(None).cast(left.schema[on].dataType).alias(on),
        F.struct(
            F.col(on).alias("t"), *[F.col(c).alias(c) for c in value_cols]
        ).alias(_RROW),
    )

    # Tie rules: right rows sort before left rows at equal times (equal
    # timestamps match); duplicate right rows at the same (by, on) are
    # broken by a value hash — arbitrary but a pure function of the data,
    # so the pick is stable under repartitioning (same determinism policy
    # as sampling.stratified_cap).
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(F.col(_T).asc(), F.col(_SIDE).asc(), F.xxhash64(_RROW).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        F.last(_RROW, ignorenulls=True).over(w).alias(_M),
    )
    out = carried.where(F.col(_SIDE) == 1)
    if tolerance is not None:
        in_tol = F.col(f"{_M}.t") >= F.col(_T) - F.expr(f"INTERVAL {tolerance}")
    else:
        in_tol = F.lit(True)
    keep = F.col(_M).isNotNull() & in_tol
    return out.select(
        *[F.col(c) for c in lcols],
        F.when(keep, F.col(f"{_M}.t")).alias(f"{prefix}{on}"),
        *[F.when(keep, F.col(f"{_M}.{c}")).alias(f"{prefix}{c}") for c in value_cols],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = (),
    value_cols: tuple[str, ...] | None = None,
    tolerance: str | None = None,
    prefix: str = "asof_",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """asof_join with hot-key mitigation: identical output, but the window
    shuffle key is (by, time-bucket) instead of `by`, so a single hot key's
    sort is spread over timeline/bucket_seconds tasks instead of one.

    Mechanics: both sides are bucketed by floor(epoch/W); a left row whose
    match lives in an EARLIER bucket finds it via a seed row — the latest
    right row of all preceding buckets, computed by running the same as-of
    operator over the per-(by, bucket) summary table (one row per key per
    bucket, so that inner pass is small and skew-free by construction) and
    injected into the bucket with its original timestamp/values. Tie rule,
    tolerance, and NULL semantics are inherited from asof_join.
    """
    if value_cols is None:
        value_cols = tuple(c for c in right.columns if c not in (*by, on))
    _guard_columns(left, (_BUCKET, _RN, _PRESENT), "asof_join_bucketed")
    _guard_columns(right, (_BUCKET, _RN, _PRESENT), "asof_join_bucketed")
    w_us = F.lit(int(bucket_seconds) * 1_000_000)

    def bucket_of(col: str) -> F.Column:
        # NULL timestamps sort FIRST in asof_join's window (asc nulls
        # first), i.e. they behave as "before everything" — route them to an
        # extreme low bucket so the bucketed rewrite preserves that: a NULL
        # right row seeds all later buckets, a NULL left row sees only NULL
        # right rows. A bare floor() would group them under a NULL bucket
        # key that matches nothing.
        return F.coalesce(
            F.floor(F.unix_micros(F.col(col).cast("timestamp")) / w_us),
            F.lit(-(1 << 62)),
        )

    lb = left.withColumn(_BUCKET, bucket_of(on))
    rb = right.select(*by, on, *value_cols).withColumn(_BUCKET, bucket_of(on))

    # latest right row per (by, bucket) — same tie rule as the main pass:
    # greatest (t, xxhash64(values)) wins
    rstruct = F.struct(F.col(on).alias("t"), *[F.col(c) for c in value_cols])
    rn_w = (
        Window.partitionBy(*by, _BUCKET)
        .orderBy(F.col(on).desc(), F.xxhash64(rstruct).desc())
    )
    bucket_last = (
        rb.withColumn(_RN, F.row_number().over(rn_w))
        .where(F.col(_RN) == 1)
        .drop(_RN)
    )

    # seed lookup: for each left bucket B, the latest right row of any bucket
    # < B. This is ITSELF an as-of join, run over the tiny summary tables
    # (one row per key per occupied bucket) keyed on bucket number — the
    # right summary's effective bucket is shifted +1 so only strictly earlier
    # buckets match (rows within B are handled by the main pass directly).
    left_buckets = lb.select(*by, _BUCKET).distinct()
    # the _present marker distinguishes "no earlier bucket had a right row"
    # from a legitimate seed whose timestamp/value IS NULL — filtering on the
    # seed's timestamp would drop NULL-ts right rows that plain asof_join
    # happily attaches
    seeds_src = bucket_last.withColumn(_BUCKET, F.col(_BUCKET) + 1).withColumn(
        _PRESENT, F.lit(1)
    )
    matched = asof_join(
        left_buckets,
        seeds_src,
        on=_BUCKET,
        by=by,
        value_cols=(on, *value_cols, _PRESENT),
        prefix=_SEED,
    )
    seeds = (
        matched.where(F.col(f"{_SEED}{_PRESENT}").isNotNull())
        .select(
            *by,
            F.col(f"{_SEED}{on}").alias(on),
            *[F.col(f"{_SEED}{c}").alias(c) for c in value_cols],
            _BUCKET,
        )
    )

    out = asof_join(
        lb,
        rb.unionByName(seeds),
        on=on,
        by=(*by, _BUCKET),
        value_cols=value_cols,
        tolerance=tolerance,
        prefix=prefix,
    )
    return out.drop(_BUCKET)
