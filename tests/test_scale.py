"""Marked-scale acceptance gates (`pytest -m scale`): pin the north-star
recall at a size where the LSH S-curve tail is actually observable.

At 240k docs the synthetic corpus plants ~31.8k true pairs at or above the
0.7 verify threshold; the b=32, r=4 banding predicts ~1 band miss in that
many draws (sum of 1-(1-s^4)^32 tails), so the gate asserts recall >= 0.999
with zero verify misses — a regression in the banding/winnowing math cannot
hide inside that margin. Runtime budget: ~3-6 min at local[4] (documented
in pytest.ini); the default suite excludes it via addopts.
"""

import pytest
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.config import DedupConfig
from nhse_probabilistic_linkage_spark.plans.evaluate import (
    expected_pairs_at_threshold,
    pair_recall_report,
)
from nhse_probabilistic_linkage_spark.plans.pipeline import DedupPipeline
from nhse_probabilistic_linkage_spark.sources.pages import synth_pages


@pytest.mark.scale
def test_recall_gate_long_docs_20k(spark):
    """Web-realistic doc lengths (600-1200 tokens) with the MinHash-estimate
    verify gate FORCED ON — the engine's one lossy feature, exercised at the
    doc lengths it exists for. Pins (a) end-to-end recall >= 0.999, (b) the
    gate's never-silent accounting present and arithmetically consistent,
    (c) gate losses within the documented ~1e-4/true-pair 3-sigma budget
    (they surface as verify_misses: the pair was banded, then gated before
    exact verification). Runtime ~1-2 min at local[4]."""
    pages, truth = synth_pages(spark, 20_000, seed=42, min_tokens=600, max_tokens=1200)
    pages = pages.select("url", "text").localCheckpoint(eager=True)
    pipe = DedupPipeline(spark, DedupConfig(verify_estimate_gate=True))
    out = pipe.run(pages)
    gated = {m.stage: m for m in pipe.metrics}["verified.gated_pairs"]
    assert gated.rows >= 0 and gated.extra["pairs_in"] >= gated.rows
    ids = truth.withColumn("doc_id", F.xxhash64("url")).select("doc_id", "cluster_id")
    expected = expected_pairs_at_threshold(ids, out["prepared"], threshold=0.7)
    rep = pair_recall_report(expected, out["pairs"], out["verified"]).collect()[0]
    recall = rep["verified_hits"] / max(rep["expected_pairs"], 1)
    assert rep["expected_pairs"] > 2_000  # the corpus planted a real tail
    assert rep["verify_misses"] <= 3, dict(rep.asDict())  # gate budget
    assert recall >= 0.999, dict(rep.asDict())


@pytest.mark.scale
def test_recall_gate_240k(spark):
    pages, truth = synth_pages(spark, 240_000, seed=42)
    pages = pages.select("url", "text").localCheckpoint(eager=True)
    out = DedupPipeline(spark, DedupConfig()).run(pages)
    ids = truth.withColumn("doc_id", F.xxhash64("url")).select("doc_id", "cluster_id")
    expected = expected_pairs_at_threshold(ids, out["prepared"], threshold=0.7)
    rep = pair_recall_report(expected, out["pairs"], out["verified"]).collect()[0]
    recall = rep["verified_hits"] / max(rep["expected_pairs"], 1)
    assert rep["expected_pairs"] > 25_000  # the corpus really planted the tail
    assert rep["verify_misses"] == 0  # exact verify never loses a banded pair
    assert recall >= 0.999, dict(rep.asDict())
