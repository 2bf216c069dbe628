"""Golden tests for normalization/shingling — operator-level fixture style
mirrors the reference's FunctionTestSuite golden comparisons
(/root/reference/tests/function_test_suite.py:172-193)."""

from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.functions.text import (
    normalize_text,
    shingles,
    tokenize,
    prepare_docs,
)


def test_normalize_golden(spark):
    rows = [
        ("Hello,  World!!",),
        ("  MixedCASE\tand\nnewlines ",),
        ("unicode: Ünïcôdé—dash",),
        ("",),
        ("123-456",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r[0] for r in df.select(normalize_text("text")).collect()]
    assert got == [
        "hello world",
        "mixedcase and newlines",
        "unicode ünïcôdé dash",
        "",
        "123 456",
    ]


def test_tokenize_no_empty_tokens(spark):
    df = spark.createDataFrame([("  a  b ",), ("",)], "text string")
    got = [r[0] for r in df.select(tokenize("text")).collect()]
    assert got == [["a", "b"], []]


def test_shingles_golden(spark):
    df = spark.createDataFrame([("a b c d e f",)], "text string")
    got = df.select(shingles(tokenize("text"), 5).alias("s")).collect()[0]["s"]
    assert got == ["a b c d e", "b c d e f"]


def test_shingles_short_and_empty_docs(spark):
    df = spark.createDataFrame([("a b",), ("",)], "text string")
    got = [r["s"] for r in df.select(shingles(tokenize("text"), 5).alias("s")).collect()]
    assert got == [["a b"], []]


def test_shingles_distinct(spark):
    # repeated windows collapse (array_distinct)
    df = spark.createDataFrame([("x y x y x y x y",)], "text string")
    got = df.select(shingles(tokenize("text"), 2).alias("s")).collect()[0]["s"]
    assert sorted(got) == ["x y", "y x"]


def test_shingle_hashes_deterministic_across_partitionings(spark):
    rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} w{i+5}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = prepare_docs(df.repartition(1)).select("doc_id", "shingles")
    b = prepare_docs(df.repartition(7)).select("doc_id", "shingles")
    assert sorted(map(tuple, ((r.doc_id, tuple(r.shingles)) for r in a.collect()))) == sorted(
        map(tuple, ((r.doc_id, tuple(r.shingles)) for r in b.collect()))
    )
