"""Decontamination, stratified quota cap, and PII redaction."""

import pytest
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.functions.redact import pii_counts, redact_pii
from nhse_probabilistic_linkage_spark.functions.sampling import stratified_cap
from nhse_probabilistic_linkage_spark.operators.decontaminate import (
    contamination_hits,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "a completely unrelated document about spark shuffle partitions and joins"),
        # contains the benchmark's exact 5-gram run
        (3, "prefix words then the quick brown fox jumps over and trailing text"),
        (4, "another clean document with nothing shared at all in any window"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over everything")],
        "bench_id long, text string",
    )


def test_contamination_hits_finds_overlap(spark, corpus, bench_set):
    hits = {r["doc_id"]: r for r in contamination_hits(corpus, bench_set).collect()}
    assert 1 in hits and 3 in hits  # both contain "the quick brown fox jumps"
    assert 2 not in hits and 4 not in hits
    assert hits[1]["n_hits"] >= 1
    assert 0 < hits[1]["hit_ratio"] <= 1


def test_decontaminate_drops_only_contaminated(spark, corpus, bench_set):
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, bench_set).collect())
    assert kept == [2, 4]
    # a min_hits above the overlap keeps everything
    kept_all = decontaminate(corpus, bench_set, min_hits=10_000).count()
    assert kept_all == 4


def test_decontaminate_empty_benchmark_keeps_all(spark, corpus):
    empty = corpus.sparkSession.createDataFrame([], "bench_id long, text string")
    assert decontaminate(corpus, empty).count() == corpus.count()


def test_stratified_cap_quota_and_determinism(spark):
    rows = [(i, f"s{i % 3}", float(i % 7)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    capped = stratified_cap(df, "source", quota=5, order_col="score", key_col="doc_id")
    per = {r["source"]: r["n"] for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"s0": 5, "s1": 5, "s2": 5}
    # top-quota by score: every kept row's score >= every dropped row's score per stratum
    kept_min = {r["source"]: r["m"] for r in capped.groupBy("source").agg(F.min("score").alias("m")).collect()}
    assert all(m >= 5.0 for m in kept_min.values())
    # deterministic under repartitioning
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_cap(df.repartition(13), "source", quota=5, order_col="score", key_col="doc_id").collect()
    )
    assert a == b
    # strata smaller than the quota are kept whole
    assert stratified_cap(df.where("doc_id < 4"), "source", quota=5, key_col="doc_id").count() == 4


def test_stratified_cap_rejects_bad_quota(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        stratified_cap(df, "source", quota=0)


def test_redact_pii_counts_and_replacement(spark):
    rows = [
        (1, "reach me at john.doe+spam@example.co.uk or 10.1.2.3 ref 123456789012"),
        (2, "no pii here just the year 2026 and a count of 42"),
        (3, "two mails a@b.io c@d.org and ip 192.168.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (out[1]["pii_email"], out[1]["pii_ipv4"], out[1]["pii_digitrun"]) == (1, 1, 1)
    assert (out[2]["pii_email"], out[2]["pii_ipv4"], out[2]["pii_digitrun"]) == (0, 0, 0)
    assert (out[3]["pii_email"], out[3]["pii_ipv4"]) == (2, 1)
    assert out[2]["text_redacted"] == out[2]["text"]  # clean text untouched
    red = out[1]["text_redacted"]
    assert "@" not in red and "10.1.2.3" not in red and "123456789012" not in red
    assert red.count("<PII>") == 3


def test_redaction_matches_duckdb_oracle(spark):
    """The exact patterns replay in RE2 (DuckDB) — the cross-engine contract
    the driver oracle for q75/q76 relies on."""
    duckdb = pytest.importorskip("duckdb")
    from nhse_probabilistic_linkage_spark.functions.redact import PII_PATTERNS

    texts = [
        "mail x_1%a@sub.domain.net then 8.8.8.8 and 999888777666555",
        "edge: a@b.cd 1.2.3.4.5 12345678 123456789",
        "nothing",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: {k: r[k] for k in ("pii_email", "pii_ipv4", "pii_digitrun")}
        for r in df.select("i", *[e.alias(n) for n, e in pii_counts("text").items()]).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        for kind, pat in PII_PATTERNS.items():
            n = con.execute("SELECT len(regexp_extract_all(?, ?))", [t, pat]).fetchone()[0]
            assert got[i][f"pii_{kind}"] == n, (i, kind, t)
