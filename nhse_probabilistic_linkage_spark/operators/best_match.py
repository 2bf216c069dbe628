"""Canonical-document election and close-match flags.

Reference analog: `get_best_match` (/root/reference/utils/model_utils.py:
194-254) — per input record, keep the single best-scoring candidate via a
row_number window, plus a `close_match` flag when another candidate scores
within CLOSE_MATCHES_THRESHOLD of the max (parameters_dedupe.py:23-24).

Ours operates per duplicate cluster: elect one canonical document
(deterministic tie-break), and per-pair, flag close matches within a jaccard
window of the per-doc max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def elect_canonical(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    prefer_col: str | None = None,
) -> DataFrame:
    """One row per doc: (doc_id, cluster_id, canonical_id, is_canonical).

    Canonical = max(prefer_col) then min(doc_id) within the cluster — a pure
    window argmax, no driver loop. prefer_col defaults to nothing (min id).
    """
    joined = clusters.join(docs.select(id_col, *( [prefer_col] if prefer_col else [] )), id_col)
    order = (
        [F.col(prefer_col).desc_nulls_last(), F.col(id_col).asc()]
        if prefer_col
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy(cluster_col).orderBy(*order)
    ranked = joined.withColumn("_rn", F.row_number().over(w))
    canon = Window.partitionBy(cluster_col)
    return (
        ranked.withColumn(
            "canonical_id", F.min(F.when(F.col("_rn") == 1, F.col(id_col))).over(canon)
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))
        .drop("_rn")
    )


def best_match_per_doc(
    scored_pairs: DataFrame,
    score_col: str = "jaccard",
    close_window: float = 0.05,
) -> DataFrame:
    """Per left doc: its best-scoring partner plus a close_match flag when a
    DIFFERENT partner scores within `close_window` of the max — the
    splink_close_match semantics (utils/model_utils.py:218-236)."""
    both = scored_pairs.select(
        F.col("id_l").alias("id"), F.col("id_r").alias("partner"), F.col(score_col).alias("score")
    ).union(
        scored_pairs.select(
            F.col("id_r").alias("id"), F.col("id_l").alias("partner"), F.col(score_col).alias("score")
        )
    )
    w = Window.partitionBy("id")
    ranked = (
        both.withColumn("max_score", F.max("score").over(w))
        .withColumn(
            "n_close",
            F.sum(
                F.when(F.col("score") >= F.col("max_score") - close_window, F.lit(1)).otherwise(F.lit(0))
            ).over(w),
        )
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("partner").asc())),
        )
    )
    return (
        ranked.where(F.col("_rn") == 1)
        .select(
            "id",
            F.col("partner").alias("best_partner"),
            F.col("score").alias("best_score"),
            (F.col("n_close") > 1).alias("close_match"),
        )
    )
