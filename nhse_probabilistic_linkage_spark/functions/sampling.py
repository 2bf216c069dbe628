"""Seeded, reproducible sampling operators.

Reference analogs (SURVEY.md §2.6 rows 34-35 — the training-data selection
paths):
  - deterministic 1/k subsample via rand(seed) bucketing:
    withColumn('random', F.rand(seed=42)) + floor(random*k)==1
    (/root/reference/notebooks_dedupe/select_training_data_dedupe.py:58-65)
  - random n-row sample via orderBy(F.rand(seed)).limit(n)
    (/root/reference/notebooks_linking/select_training_data_linking.py:146-148)
  - fraction sample via df.sample(False, fraction)
    (/root/reference/utils/test_utils.py:26,59)
  - u-probability estimation over a random-pair sample (Splink's
    estimate_u_using_random_sampling(max_pairs=1e8),
    notebooks_dedupe/training_dedupe.py:105).

Engine policy: sampling must be DETERMINISTIC ACROSS RUNS AND PARTITIONINGS,
which rand(seed) is not (its stream is seeded per partition — repartition the
input and membership changes). Keying on a hash of a stable column gives the
same sample on any cluster layout, makes resume/retry consistent, and costs
one codegen expression. rand-based helpers are still provided for parity
where per-run randomness is acceptable; the global sort in
orderBy(rand()).limit(n) is deliberately NOT reproduced (at corpus scale a
total sort for a sample is the anti-pattern — see SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def hash_bucket_expr(key, k: int, seed: int = 42) -> Column:
    """Deterministic bucket id in [0, k) from a stable key column."""
    key = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(k))


def hash_bucket_sample(df: DataFrame, key: str, k: int, bucket: int = 0, seed: int = 42) -> DataFrame:
    """Keep ~1/k of rows: those whose key hashes into `bucket`.

    The scale-path analog of the reference's rand(seed=42) 1/k bucketing,
    but stable under repartitioning and resume (membership is a pure
    function of the key). Filter is a codegen expression -> pushes through
    projections and runs in the scan stage."""
    if not (0 <= bucket < k):
        raise ValueError(f"bucket ({bucket}) must be in [0, {k})")
    return df.where(hash_bucket_expr(key, k, seed) == bucket)


def affine_bucket_expr(key, k: int, mult: int = 40503, offset: int = 17) -> Column:
    """Bucket id from modular affine hashing of an INTEGER key — weaker
    mixing than xxhash64 but bit-reproducible in any ANSI SQL engine
    (used by the DuckDB oracle queries; xxhash64 exists only in Spark).
    Inputs are reduced mod 2^20 first so the multiply never overflows ANSI
    bigint arithmetic."""
    key = F.col(key) if isinstance(key, str) else key
    reduced = F.pmod(key.cast("long"), F.lit(1 << 20))
    return F.pmod(reduced * F.lit(mult) + F.lit(offset), F.lit(k))


def affine_bucket_sql(key_sql: str, k: int, mult: int = 40503, offset: int = 17) -> str:
    """The exact same bucketing as affine_bucket_expr, as ANSI SQL text."""
    return f"(((({key_sql}) % {1 << 20} + {1 << 20}) % {1 << 20}) * {mult} + {offset}) % {k}"


def rand_bucket_sample(df: DataFrame, k: int, bucket: int = 1, seed: int = 42) -> DataFrame:
    """Faithful port of the reference's rand(seed) bucketing
    (select_training_data_dedupe.py:58-65): seeded per RUN, not per key —
    use hash_bucket_sample when cross-run stability matters."""
    return (
        df.withColumn("_rnd", F.rand(seed=seed))
        .where(F.floor(F.col("_rnd") * k) == bucket)
        .drop("_rnd")
    )


def seeded_fraction_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """df.sample wrapper (test_utils.py:26,59 analog) — one scan, no sort.
    Never orderBy(rand()).limit(n): that is a full global sort of the corpus
    for a sample (reference anti-pattern, SURVEY §4)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def stratified_cap(
    df: DataFrame,
    strata_col: str,
    quota: int,
    order_col: str | None = None,
    key_col: str | None = None,
    descending: bool = True,
    tiebreak: Column | None = None,
) -> DataFrame:
    """Keep at most `quota` rows per stratum, deterministically.

    The training-data idiom "cap documents per domain/source" — rank rows
    within each stratum (by `order_col`, e.g. a quality score, best first)
    and keep the top `quota`. Ties and the unordered case are broken by
    xxhash64 of `key_col` so the selection is a pure function of the data —
    stable under repartitioning, resume, and cluster layout (same policy as
    hash_bucket_sample; the reference's rand(seed) selections are not).
    Pass an explicit `tiebreak` column to override the hash tiebreak (e.g.
    a plain unique id, when an external engine must replay the selection).

    One shuffle on the stratum key; row_number needs no global sort. Skewed
    strata (one domain = half the corpus) rank in a single task — for those,
    pre-filter with hash_bucket_sample to ~quota-scale before ranking, which
    preserves determinism (composition of two pure functions of the key).

    Reference analog: per-group top-k via row_number over a window —
    the get_best_match ranking idiom (/root/reference/utils/eval_utils.py
    best-candidate selection) applied to selection instead of linkage.
    """
    if quota < 1:
        raise ValueError(f"quota ({quota}) must be >= 1")
    from pyspark.sql import Window

    if tiebreak is None:
        tiebreak = F.xxhash64(F.col(key_col)) if key_col else F.xxhash64(*[F.col(c) for c in df.columns])
    ordering = []
    if order_col is not None:
        c = F.col(order_col)
        ordering.append(c.desc_nulls_last() if descending else c.asc_nulls_last())
    ordering.append(tiebreak.asc())
    w = Window.partitionBy(strata_col).orderBy(*ordering)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )


def sample_pairs(
    df: DataFrame,
    key: str,
    k_per_side: int,
    id_col: str | None = None,
    seed: int = 42,
    method: str = "xxhash",
) -> DataFrame:
    """Deterministic random-pair sample for u-style calibration: hash-sample
    each side to ~1/k_per_side, then join the two small samples (~1/k² of
    all pairs) with id_l < id_r. The reference's Splink u-estimation samples
    pairs the same way conceptually (bounded random pair budget); doing it
    as two thin samples + a join of the SAMPLES means the full pair space is
    never materialized. The two sides use decorrelated hash streams.

    method='xxhash' (default) is the scale path; method='affine' uses the
    SQL-reproducible bucketing (integer keys only) so an external engine can
    replay the exact sample (oracle parity)."""
    idc = id_col or key
    if method == "affine":
        left_cond = affine_bucket_expr(key, k_per_side, offset=17) == 0
        right_cond = affine_bucket_expr(key, k_per_side, offset=18) == 0
    elif method == "xxhash":
        left_cond = hash_bucket_expr(key, k_per_side, seed) == 0
        right_cond = hash_bucket_expr(key, k_per_side, seed + 1) == 0
    else:
        raise ValueError(f"unknown sampling method: {method!r}")
    left = df.where(left_cond).select(F.col(idc).alias("id_l"))
    right = df.where(right_cond).select(F.col(idc).alias("id_r"))
    return left.crossJoin(right).where(F.col("id_l") < F.col("id_r"))
