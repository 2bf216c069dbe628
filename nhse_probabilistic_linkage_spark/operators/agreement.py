"""Detector-agreement vectors: which detectors found each candidate pair.

Reference analog: the agreement pattern — all gamma_* ordinals concatenated
into one string key per pair for error analysis
(/root/reference/utils/eval_utils.py:207-215). Ours is per-detector instead
of per-field: every pair found by ANY detector gets a boolean flag per
detector plus the same concatenated pattern string, so disagreements (e.g. a
pair SimHash finds but MinHash misses) are directly queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agreement_vectors(detector_pairs: dict[str, DataFrame]) -> DataFrame:
    """{detector_name: pairs(id_l, id_r, ...)} -> one row per distinct pair:
    (id_l, id_r, <name>_found flags..., agreement_pattern, n_detectors).

    Single full-outer merge tree over deduped flag tables; the pattern string
    concatenates flags in sorted detector-name order (deterministic).
    """
    if not detector_pairs:
        raise ValueError("at least one detector pair table required")
    names = sorted(detector_pairs)
    merged: DataFrame | None = None
    for name in names:
        flags = (
            detector_pairs[name]
            .select("id_l", "id_r")
            .distinct()
            .withColumn(f"{name}_found", F.lit(True))
        )
        merged = flags if merged is None else merged.join(flags, ["id_l", "id_r"], "full_outer")
    for name in names:
        merged = merged.withColumn(f"{name}_found", F.coalesce(F.col(f"{name}_found"), F.lit(False)))
    pattern = F.concat_ws(
        "", *[F.when(F.col(f"{n}_found"), F.lit("1")).otherwise(F.lit("0")) for n in names]
    )
    n_found = sum(F.col(f"{n}_found").cast("int") for n in names)
    return merged.withColumn("agreement_pattern", pattern).withColumn(
        "n_detectors", n_found.cast("int")
    )


def agreement_histogram(vectors: DataFrame) -> DataFrame:
    """Pattern -> pair count (the reference's agreement-pattern histogram,
    notebooks_dedupe/evaluation_dedupe.py:112-126 analog)."""
    return vectors.groupBy("agreement_pattern").agg(F.count("*").alias("n_pairs")).orderBy(
        F.col("n_pairs").desc()
    )
