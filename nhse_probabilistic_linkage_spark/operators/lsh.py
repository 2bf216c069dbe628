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


def candidate_pairs(
    bands_df: DataFrame,
    id_col: str = "doc_id",
    band_cap: int | None = 5000,
) -> tuple[DataFrame, DataFrame]:
    """Self-join band table -> unique candidate pairs (id_l < id_r, match_key).

    Returns (pairs, dropped_bands) where dropped_bands is the capped-band
    accounting table (band_key, band_size) — empty when no band exceeded the
    cap. Callers log/persist it; recall loss is only ever explicit.
    """
    dropped = (
        oversized_bands(bands_df, band_cap)
        if band_cap is not None
        else bands_df.sparkSession.createDataFrame([], "band_key bigint, band_size bigint")
    )
    kept = bands_df.join(F.broadcast(dropped.select("band_key")), "band_key", "left_anti")

    left = kept.select(
        F.col("band_key"),
        F.col("band_id"),
        F.col(id_col).alias("id_l"),
    )
    right = kept.select(
        F.col("band_key"),
        F.col(id_col).alias("id_r"),
    )
    pairs = (
        left.join(right, "band_key")
        .where(F.col("id_l") < F.col("id_r"))
        .groupBy("id_l", "id_r")
        .agg(F.min("band_id").alias("match_key"))
    )
    return pairs, dropped
