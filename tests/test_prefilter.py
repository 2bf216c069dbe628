"""Corpus prefilter: URL-variant collapse, repetition/quality gates, and
first-failing-gate drop accounting (same contract as band-cap accounting)."""

from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.plans.prefilter import prefilter_pages


def _corpus(spark):
    good = "a genuinely varied document with many different words in it today and more"
    rows = [
        # three URL variants of ONE page -> keep exactly one
        ("http://a.example.com/p1", good),
        ("https://www.a.example.com/p1/", good),
        ("http://a.example.com/p1?utm_source=x", good),
        # repetitive page -> dropped by the repetition gate
        ("http://b.example.com/p2", "spam spam spam spam spam spam spam spam one"),
        # ordinary keeper
        ("http://c.example.com/p3", good + " entirely distinct tail content"),
        # empty text -> dropped only by the quality gate (when enabled)
        ("http://d.example.com/p4", ""),
    ]
    return spark.createDataFrame(rows, "url string, text string")


def test_prefilter_gates_and_accounting(spark):
    kept, drops = prefilter_pages(_corpus(spark), min_quality=0.2)
    urls = sorted(r["url"] for r in kept.collect())
    # one of the three p1 variants (min url ordering -> the bare one), p3
    assert urls == ["http://a.example.com/p1", "http://c.example.com/p3"]
    got = {r["reason"]: r["n_dropped"] for r in drops.collect()}
    assert got == {"url_dup": 2, "repetition": 1, "low_quality": 1}
    # drops + kept reconcile
    assert sum(got.values()) + kept.count() == 6


def test_prefilter_gates_optional(spark):
    kept, drops = prefilter_pages(_corpus(spark), url_dedup=False, repetition=False)
    assert kept.count() == 6  # no quality threshold, nothing drops
    assert {r["reason"] for r in drops.collect()} == {"none"}
    # flags never leak into the output schema
    assert not [c for c in kept.columns if c.startswith("_f_")]
