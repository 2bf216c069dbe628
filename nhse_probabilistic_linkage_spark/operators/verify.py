"""Exact-Jaccard verification of candidate pairs.

Reference analog: Splink's comparison levels — tiered CASE WHENs per feature
producing gamma ordinals and a Fellegi-Sunter match weight
(/root/reference/utils/parameter_lists.py, utils/eval_utils.py:188-199).
For shingle dedup the directly-calibrated score is exact Jaccard of the
5-gram shingle sets, computed with native array functions (array_intersect /
array_union) — no Python in the pair loop.

The pair->shingles joins shuffle by doc id; both sides are pre-projected to
(id, shingles) so only the needed columns move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_expr(left: str | F.Column, right: str | F.Column) -> F.Column:
    l = F.col(left) if isinstance(left, str) else left
    r = F.col(right) if isinstance(right, str) else right
    inter = F.size(F.array_intersect(l, r))
    union = F.size(F.array_union(l, r))
    return F.when(union > 0, inter / union).otherwise(F.lit(1.0))


def verify_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingles",
    threshold: float | None = None,
) -> DataFrame:
    """Attach exact jaccard to candidate pairs; optionally filter >= threshold.

    Output: (id_l, id_r, match_key?, jaccard). Gamma-style similarity buckets
    can be derived downstream with a single when-chain.
    """
    slim = docs.select(F.col(id_col), F.col(shingle_col))
    out = (
        pairs.join(
            slim.select(F.col(id_col).alias("id_l"), F.col(shingle_col).alias("_sh_l")),
            "id_l",
        )
        .join(
            slim.select(F.col(id_col).alias("id_r"), F.col(shingle_col).alias("_sh_r")),
            "id_r",
        )
        .withColumn("jaccard", jaccard_expr("_sh_l", "_sh_r"))
        .drop("_sh_l", "_sh_r")
    )
    if threshold is not None:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def similarity_buckets(df: DataFrame, jaccard_col: str = "jaccard") -> DataFrame:
    """Ordinal similarity level per pair — the gamma analog
    (reference: NAME has 7 CASE-WHEN levels, utils/parameter_lists.py:2-60)."""
    j = F.col(jaccard_col)
    return df.withColumn(
        "sim_level",
        F.when(j >= 0.95, F.lit(3))
        .when(j >= 0.85, F.lit(2))
        .when(j >= 0.7, F.lit(1))
        .otherwise(F.lit(0)),
    )
