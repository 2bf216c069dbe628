"""Evaluation harness: recall with candidate-miss accounting, candidate-count
histograms, single-pass threshold confusion.

Reference analogs:
- missed_duplicate / blocking-miss accounting: utils/eval_utils.py:451-481
  (expected pairs outer-joined to predicted pairs; a true pair Splink never
  blocked is flagged separately from one it scored low);
- candidate-count histogram: notebooks_dedupe/blocking_evaluation_dedupe.py:
  91-117 (candidates-per-record binned 0,1,2,5,...,1000);
- per-threshold confusion: utils/eval_utils.py:485-520 runs 4 filtered
  count() jobs PER threshold ("~40 minutes"); ours computes the whole sweep
  in ONE grouped pass with conditional sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.operators.verify import jaccard_expr

HISTOGRAM_BINS = [0, 1, 2, 5, 10, 20, 50, 100, 200, 500, 1000]


def truth_pairs(truth: DataFrame, id_col: str = "doc_id", cluster_col: str = "cluster_id") -> DataFrame:
    """All within-cluster pairs (id_l < id_r) from a planted-label table."""
    l = truth.select(F.col(cluster_col), F.col(id_col).alias("id_l"))
    r = truth.select(F.col(cluster_col), F.col(id_col).alias("id_r"))
    return l.join(r, cluster_col).where(F.col("id_l") < F.col("id_r")).select("id_l", "id_r")


def pair_recall_report(
    expected: DataFrame,
    candidates: DataFrame,
    verified: DataFrame,
) -> DataFrame:
    """One-row report decomposing misses: expected pairs vs candidate pairs vs
    verified pairs. A miss is either a candidate-generation (band) miss — the
    pair never collided in any band — or a verification miss (collided, but
    scored under threshold). Single job, conditional aggregation."""
    e = expected.select("id_l", "id_r").distinct()
    c = candidates.select("id_l", "id_r").distinct().withColumn("_cand", F.lit(1))
    v = verified.select("id_l", "id_r").distinct().withColumn("_ver", F.lit(1))
    flagged = (
        e.join(c, ["id_l", "id_r"], "left")
        .join(v, ["id_l", "id_r"], "left")
        .select(
            F.coalesce("_cand", F.lit(0)).alias("cand"),
            F.coalesce("_ver", F.lit(0)).alias("ver"),
        )
    )
    return flagged.agg(
        F.count("*").alias("expected_pairs"),
        F.sum("cand").alias("candidate_hits"),
        F.sum("ver").alias("verified_hits"),
        F.sum(F.when(F.col("cand") == 0, 1).otherwise(0)).alias("band_misses"),
        F.sum(F.when((F.col("cand") == 1) & (F.col("ver") == 0), 1).otherwise(0)).alias("verify_misses"),
        (F.sum("ver") / F.count("*")).alias("recall"),
    )


def expected_pairs_at_threshold(
    truth: DataFrame,
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    shingle_col: str = "shingles",
) -> DataFrame:
    """Planted within-cluster pairs whose TRUE (brute-force) jaccard clears
    the threshold — the honest recall denominator: mutation can push a
    planted copy below the dedup threshold, and those are not detector
    misses (reference analog: eval only counts pairs Splink was expected to
    score, utils/eval_utils.py:466-481)."""
    tp = truth_pairs(truth, id_col=id_col, cluster_col=cluster_col)
    slim = docs.select(F.col(id_col), F.col(shingle_col))
    return (
        tp.join(slim.select(F.col(id_col).alias("id_l"), F.col(shingle_col).alias("_l")), "id_l")
        .join(slim.select(F.col(id_col).alias("id_r"), F.col(shingle_col).alias("_r")), "id_r")
        .withColumn("true_jaccard", jaccard_expr("_l", "_r"))
        .where(F.col("true_jaccard") >= threshold)
        .select("id_l", "id_r", "true_jaccard")
    )


def candidate_count_histogram(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidates-per-doc binned like the reference's blocking evaluation
    (bins 0,1,2,5,...,1000; notebooks_dedupe/blocking_evaluation_dedupe.py:
    95-107), including zero-candidate docs via a left join."""
    per_doc = (
        candidates.select(F.col("id_l").alias(id_col))
        .union(candidates.select(F.col("id_r").alias(id_col)))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_candidates"))
    )
    counts = docs.select(id_col).join(per_doc, id_col, "left").fillna(0, "n_candidates")
    bin_expr = F.coalesce(
        *[
            F.when(F.col("n_candidates") <= b, F.lit(b))
            for b in HISTOGRAM_BINS
        ],
        F.lit(HISTOGRAM_BINS[-1]),
    )
    return (
        counts.withColumn("bin", bin_expr)
        .groupBy("bin")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bin")
    )


def threshold_confusion(
    scored_pairs: DataFrame,
    expected: DataFrame,
    thresholds: list[float],
    score_col: str = "jaccard",
) -> DataFrame:
    """Full precision/recall sweep in ONE aggregation pass (vs the
    reference's 4 count() jobs per threshold, utils/eval_utils.py:485-520).

    scored_pairs: (id_l, id_r, score) — ALL scored candidates (unthresholded).
    expected: (id_l, id_r) ground-truth duplicate pairs.
    """
    s = scored_pairs.select("id_l", "id_r", F.col(score_col).alias("score"))
    e = expected.select("id_l", "id_r").distinct().withColumn("_true", F.lit(1))
    j = s.join(e, ["id_l", "id_r"], "full_outer").select(
        F.coalesce("score", F.lit(-1.0)).alias("score"),
        F.coalesce("_true", F.lit(0)).alias("is_true"),
    )
    aggs = []
    for t in thresholds:
        pred = F.col("score") >= t
        truth = F.col("is_true") == 1
        aggs += [
            F.sum(F.when(pred & truth, 1).otherwise(0)).alias(f"tp_{t}"),
            F.sum(F.when(pred & ~truth, 1).otherwise(0)).alias(f"fp_{t}"),
            F.sum(F.when(~pred & truth, 1).otherwise(0)).alias(f"fn_{t}"),
        ]
    row = j.agg(*aggs).collect()[0]
    out = []
    for t in thresholds:
        tp, fp, fn = row[f"tp_{t}"], row[f"fp_{t}"], row[f"fn_{t}"]
        prec = tp / (tp + fp) if tp + fp else None
        rec = tp / (tp + fn) if tp + fn else None
        out.append((float(t), int(tp), int(fp), int(fn), prec, rec))
    return scored_pairs.sparkSession.createDataFrame(
        out, "threshold double, tp long, fp long, fn long, precision double, recall double"
    )
