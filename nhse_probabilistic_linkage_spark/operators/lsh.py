"""MinHash-LSH banding and candidate-pair generation.

This is the engine's answer to the reference's blocking stage: a UNION of 17
selective equi-self-joins tagged with a `match_key` rule index
(/root/reference/parameters_dedupe.py:26-44, executed by Splink at
predict_dedupe.py:93). Here every band is one "blocking rule": two docs are
candidates iff some band of their MinHash signatures hashes identically, and
`match_key` records the first band that fired.

Scale notes (the parts Catalyst cannot do for us):
- The band self-join shuffles on band_key; AQE skew-join splitting handles
  moderate skew, but pathological bands (boilerplate pages that hash
  identically in some band) generate O(size^2) pairs. Those are removed by an
  explicit band-size cap BEFORE the join, with the dropped mass counted and
  returned — documented recall accounting, never silent (reference analog:
  per-rule comparison counts, notebooks_dedupe/blocking_evaluation_dedupe.py:
  154-175).
- The cap list is tiny (it is the >cap tail of the band-size histogram), so
  it broadcast-anti-joins against the exploded band table.
- Pair dedup across bands is a groupBy (map-side combinable) rather than
  dropDuplicates on the raw join output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 32,
    rows_per_band: int = 4,
) -> DataFrame:
    """Explode a signature column into (id, band_id, band_key) rows.

    band_key = xxhash64(band_id, signature slice) — computed natively inside
    a transform() lambda so the whole fanout stays in codegen.
    """
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.xxhash64(i, F.slice(F.col(sig_col), i * F.lit(rows_per_band) + 1, F.lit(rows_per_band))),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(band_arr).alias("band_id", "band_key"),
    )


def oversized_bands(bands_df: DataFrame, band_cap: int) -> DataFrame:
    """Band keys whose member count exceeds the cap (tiny by construction)."""
    return (
        bands_df.groupBy("band_key")
        .agg(F.count("*").alias("band_size"))
        .filter(F.col("band_size") > band_cap)
    )


def _self_join_pairs(bands: DataFrame, id_col: str) -> DataFrame:
    left = bands.select("band_key", "band_id", F.col(id_col).alias("id_l"))
    right = bands.select("band_key", F.col(id_col).alias("id_r"))
    return left.join(right, "band_key").where(F.col("id_l") < F.col("id_r"))


def _salted_self_join_pairs(bands: DataFrame, id_col: str, salt_groups: int) -> DataFrame:
    """Skew-breaking self-join for hot bands: split a band of m members into
    g salt groups; the left side carries its group id, the right side is
    replicated to every group, and the join key becomes (band_key, gid) — so
    the single O(m^2) task becomes g tasks of O(m^2/g) each. Every unordered
    pair survives exactly once: pair (a, b) with a < b matches only where
    left = a (right's replica tagged gid(a)); the mirrored row fails
    id_l < id_r. Replication cost is g x right rows, paid only for hot bands.
    """
    g = F.lit(salt_groups)
    left = bands.select(
        "band_key",
        "band_id",
        F.col(id_col).alias("id_l"),
        F.pmod(F.xxhash64(id_col), g).alias("gid"),
    )
    right = bands.select(
        "band_key",
        F.col(id_col).alias("id_r"),
        F.explode(F.sequence(F.lit(0), g - 1)).alias("gid"),
    )
    return left.join(right, ["band_key", "gid"]).where(F.col("id_l") < F.col("id_r")).drop("gid")


def semi_join_bands(
    bands_df: DataFrame, keys: DataFrame, broadcast_key_limit: int = 2_000_000
) -> DataFrame:
    """bands left-semi keys(band_key), with an EXPLICIT broadcast decision.

    AQE cannot turn this into a broadcast on its own: the key list is a
    filter over the CACHED size histogram (no shuffle boundary => no runtime
    stats), and its static estimate inherits the full cache size. The count
    is one cheap job over cached data; below the limit the semi join
    broadcasts (no shuffle of the band table at all), above it — the
    10^12-doc regime — it stays a shuffle semi-join, which still beats
    shuffling every singleton row through the self-join."""
    n_keys = keys.count()
    build = F.broadcast(keys) if n_keys <= broadcast_key_limit else keys
    return bands_df.join(build, "band_key", "left_semi")


def candidate_pairs(
    bands_df: DataFrame,
    id_col: str = "doc_id",
    band_cap: int | None = 5000,
    salt_threshold: int | None = 500,
    salt_groups: int = 8,
    persist_bands: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Self-join band table -> unique candidate pairs (id_l < id_r, match_key).

    Skew handling, in escalating order (north-rule requirement — "skew from
    hot LSH bands handled explicitly via salted band keys [and] band-size
    caps with documented recall accounting"):
      size <= salt_threshold   plain self-join on band_key (AQE coalesces);
      size in (salt_threshold, band_cap]   salted join — all pairs kept, the
                               hot band's work spread over salt_groups tasks;
      size > band_cap          dropped entirely, returned in the accounting
                               table (band_key, band_size) — NEVER silent.

    The size histogram is one map-side-combinable groupBy; the hot/dropped
    key lists are tiny by construction, so they broadcast.
    """
    spark = bands_df.sparkSession
    # The band table is scanned by the histogram AND each join branch; the
    # histogram feeds the cap AND salt routing. persist_bands=True caches the
    # exploded band table so an EXPENSIVE lineage (e.g. a signature UDF not
    # yet checkpointed) executes once (measured 25s vs 6s at 40k docs x 32
    # bands with the UDF in the lineage). When the caller's band lineage is
    # already a cheap codegen fanout over a checkpointed signature table —
    # every engine path after round 2 — pass persist_bands=False: pumping
    # 32x-exploded rows through the block store costs more memory bandwidth
    # than recomputing the fanout per scan, and bandwidth is the scarce
    # resource on wide-row stages (see BENCH.md saturation notes).
    if persist_bands:
        bands_df = bands_df.persist(StorageLevel.MEMORY_AND_DISK)
    # the size histogram is small (one row per distinct band key) and feeds
    # two broadcast key lists + the accounting table — always worth caching
    sizes = (
        bands_df.groupBy("band_key")
        .agg(F.count("*").alias("band_size"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Eligibility is decided on the SIZE HISTOGRAM, not the band table:
    # singleton bands — the overwhelming majority of keys once signatures are
    # selective (measured 94.7% at 240k docs) — cannot produce a pair, so the
    # self-join's shuffle shrinks ~10x by semi-joining bands against the
    # multi-member key list first. The key lists are orders of magnitude
    # smaller than the band table (histogram tail), so AQE turns these
    # semi-joins into broadcasts at small scale and falls back to a shuffle
    # semi-join at corpus scale — both strictly cheaper than shuffling every
    # singleton band row through the self-join twice.
    if band_cap is not None:
        dropped = sizes.filter(F.col("band_size") > band_cap)
        upper = F.col("band_size") <= band_cap
    else:
        dropped = spark.createDataFrame([], "band_key bigint, band_size bigint")
        upper = F.lit(True)
    eligible = sizes.filter((F.col("band_size") >= 2) & upper)

    if salt_threshold is not None:
        hot_keys = eligible.filter(F.col("band_size") > salt_threshold).select("band_key")
        cold_keys = eligible.filter(F.col("band_size") <= salt_threshold).select("band_key")
        raw = _self_join_pairs(semi_join_bands(bands_df, cold_keys), id_col).unionByName(
            _salted_self_join_pairs(bands_df.join(F.broadcast(hot_keys), "band_key", "left_semi"),
                                    id_col, salt_groups)
        )
    else:
        raw = _self_join_pairs(semi_join_bands(bands_df, eligible.select("band_key")), id_col)

    # Materialize the (narrow) pair table eagerly, then release the wide band
    # table: every downstream consumer (verify's semi-join + join, counts,
    # CC edges) scans `pairs` more than once, and without the cut the band
    # self-join would re-execute per scan. Eager checkpoint also lets this
    # function own its persist scope — callers in long-lived sessions
    # (streaming micro-batches) never accumulate leaked cache blocks.
    pairs = (
        raw.groupBy("id_l", "id_r")
        .agg(F.min("band_id").alias("match_key"))
        .localCheckpoint(eager=True)
    )
    dropped = dropped.localCheckpoint(eager=True)  # tiny by construction
    sizes.unpersist()
    if persist_bands:
        bands_df.unpersist()
    return pairs, dropped
