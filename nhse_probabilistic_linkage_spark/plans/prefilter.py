"""Corpus prefilter: drop junk BEFORE the expensive signature stages.

Reference analog: the ingest's record filtering — confidential rows are
dropped and superseded records anti-joined away before any blocking happens
(/root/reference/utils/dataset_ingestion_utils.py:27-34,54-62). For a web
corpus the equivalent hygiene is: collapse trivially-variant URLs of the
same page, then drop documents that fail quality/repetition gates. Every
row removed here never gets normalized, shingled, MinHashed, banded or
verified — at 10^12 docs the prefilter is the cheapest compute the pipeline
ever saves.

Physical shape: ONE pass computes every gate flag (URL dedup needs a single
window; the text gates are scan-stage expressions), the flagged table is cut
once, and both the kept rows and the per-reason drop accounting read from
that cut — two jobs total, not one per gate. Drops are COUNTED per reason
(first-failing-gate attribution) and returned, never silent — the same
accounting contract as the band caps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.functions import textstats as TS
from nhse_probabilistic_linkage_spark.functions.urls import url_key


def prefilter_pages(
    df: DataFrame,
    url_col: str | None = "url",
    text_col: str = "text",
    min_quality: float | None = None,
    repetition: bool = True,
    url_dedup: bool = True,
    max_dup_line_ratio: float = 0.3,
    max_top_token_ratio: float = 0.2,
) -> tuple[DataFrame, DataFrame]:
    """Returns (kept_pages, drop_metrics).

    Gates (a row is attributed to the FIRST gate it fails):
      url_dup     not the canonical row for its normalize_url key (min url
                  tie-break — deterministic, never rand); needs url_col.
      repetition  Gopher-style duplicate-line / top-token limits.
      low_quality composite quality_score < min_quality.

    drop_metrics: (reason, n_dropped), one row per enabled gate.
    """
    spark = df.sparkSession
    reasons: list[str] = []
    cur = df

    if url_dedup and url_col is not None and url_col in df.columns:
        w = Window.partitionBy(url_key(F.col(url_col))).orderBy(F.col(url_col).asc())
        cur = cur.withColumn("_f_url_dup", F.row_number().over(w) > 1)
        reasons.append("url_dup")
    else:
        cur = cur.withColumn("_f_url_dup", F.lit(False))
    # one tokenization feeds every token-derived gate (materialized
    # projection; lambda exprs are opaque to subexpression elimination —
    # see textstats.with_textstats)
    from nhse_probabilistic_linkage_spark.functions.text import tokenize

    cur = cur.withColumn("_pf_toks", tokenize(F.col(text_col)))
    toks = F.col("_pf_toks")
    if repetition:
        cur = cur.withColumn(
            "_f_repetition",
            ~TS.repetition_flags(
                F.col(text_col),
                max_dup_line_ratio=max_dup_line_ratio,
                max_top_token_ratio=max_top_token_ratio,
                tokens=toks,
            ),
        )
        reasons.append("repetition")
    else:
        cur = cur.withColumn("_f_repetition", F.lit(False))
    if min_quality is not None:
        cur = cur.withColumn(
            "_f_low_quality", TS.quality_score(F.col(text_col), tokens=toks) < min_quality
        )
        reasons.append("low_quality")
    else:
        cur = cur.withColumn("_f_low_quality", F.lit(False))
    cur = cur.drop("_pf_toks")

    flagged = cur.localCheckpoint(eager=True)
    kept = flagged.where(
        ~F.col("_f_url_dup") & ~F.col("_f_repetition") & ~F.col("_f_low_quality")
    ).drop("_f_url_dup", "_f_repetition", "_f_low_quality")

    # first-failing-gate attribution, all reasons in one aggregate
    attribution = {
        "url_dup": F.col("_f_url_dup"),
        "repetition": ~F.col("_f_url_dup") & F.col("_f_repetition"),
        "low_quality": ~F.col("_f_url_dup") & ~F.col("_f_repetition") & F.col("_f_low_quality"),
    }
    if reasons:
        row = flagged.agg(
            *[F.sum(attribution[r].cast("long")).alias(r) for r in reasons]
        ).collect()[0]
        metrics = [(r, int(row[r])) for r in reasons]
    else:
        metrics = [("none", 0)]
    return kept, spark.createDataFrame(metrics, "reason string, n_dropped long")
