"""Detector-agreement vectors over the three detectors on a planted corpus."""

import pytest
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.config import DedupConfig
from nhse_probabilistic_linkage_spark.operators.agreement import (
    agreement_histogram,
    agreement_vectors,
)
from nhse_probabilistic_linkage_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_pairs,
    substring_dedup_pairs,
)
from nhse_probabilistic_linkage_spark.sources.pages import synth_pages


def test_agreement_vectors_merge(spark):
    a = spark.createDataFrame([(1, 2), (1, 3)], "id_l long, id_r long")
    b = spark.createDataFrame([(1, 2), (4, 5)], "id_l long, id_r long")
    out = {(r["id_l"], r["id_r"]): r for r in agreement_vectors({"mh": a, "sh": b}).collect()}
    assert out[(1, 2)]["agreement_pattern"] == "11" and out[(1, 2)]["n_detectors"] == 2
    assert out[(1, 3)]["agreement_pattern"] == "10"
    assert out[(4, 5)]["agreement_pattern"] == "01"
    assert len(out) == 3


def test_agreement_on_planted_corpus(spark):
    pages, _ = synth_pages(spark, 300, seed=31, partitions=4)
    docs = pages.select(F.xxhash64("url").alias("doc_id"), "text").cache()
    cfg = DedupConfig(jaccard_threshold=0.7)
    mh, _ = minhash_lsh_pairs(docs, cfg)
    sh = simhash_pairs(docs, cfg)
    ss, _ = substring_dedup_pairs(docs, cfg)
    vectors = agreement_vectors({"minhash": mh, "simhash": sh, "substring": ss}).cache()

    n = vectors.count()
    assert n > 0
    # every minhash-verified pair must also be found by the substring pass:
    # planted dups share long exact spans, and winnowing recall is 1.0 there
    mh_only_missing_ss = vectors.where("minhash_found AND NOT substring_found").count()
    assert mh_only_missing_ss == 0
    hist = {r["agreement_pattern"]: r["n_pairs"] for r in agreement_histogram(vectors).collect()}
    assert sum(hist.values()) == n
    assert all(len(p) == 3 for p in hist)
