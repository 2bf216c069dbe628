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


# ------------------------------------------------------------ urls
def test_normalize_url_variants(spark):
    from nhse_probabilistic_linkage_spark.functions.urls import normalize_url, url_host, url_key

    rows = [
        ("http://site.example.com/page/1",),                                  # already canonical
        ("https://www.site.example.com/page/1/",),                            # scheme/www/slash
        ("HTTP://SITE.EXAMPLE.COM/page/1#section-2",),                        # case + fragment
        ("site.example.com/page/1?utm_source=x",),                            # schemeless + tracking
        ("http://site.example.com/page/1?a=1&utm_campaign=c&b=2",),           # mid-query tracking
        ("http://site.example.com/page/1?utm_a=1&b=2",),                      # leading tracking
        ("http://site.example.com/page/1?utm_a=1&utm_b=2",),                  # only tracking
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [r[0] for r in df.select(normalize_url("url")).collect()]
    assert got == [
        "http://site.example.com/page/1",
        "http://site.example.com/page/1",
        "http://site.example.com/page/1",
        "http://site.example.com/page/1",
        "http://site.example.com/page/1?a=1&b=2",
        "http://site.example.com/page/1?b=2",
        "http://site.example.com/page/1",
    ]
    hosts = {r[0] for r in df.select(url_host("url")).collect()}
    assert hosts == {"site.example.com"}
    # all variants WITHOUT distinct query params share one dedup key
    keys = [r[0] for r in df.select(url_key("url")).collect()]
    assert len({keys[0], keys[1], keys[2], keys[3], keys[6]}) == 1


def test_repetition_signals(spark):
    from nhse_probabilistic_linkage_spark.functions.textstats import (
        duplicate_line_ratio,
        repetition_flags,
        top_token_ratio,
    )

    rows = [
        (1, "accept cookies\nmenu home about\naccept cookies\naccept cookies\n\n"),
        (2, "a genuinely varied document with many different words in it today"),
        (3, "spam spam spam spam spam only one other word"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (round(r["dlr"], 4), round(r["ttr"], 4), r["ok"])
        for r in df.select(
            "doc_id",
            duplicate_line_ratio("text").alias("dlr"),
            top_token_ratio("text").alias("ttr"),
            repetition_flags("text").alias("ok"),
        ).collect()
    }
    assert got[1][0] == round(2 / 4, 4)      # 4 non-empty lines, 2 repeats
    assert got[1][2] is False                # fails dup-line filter
    assert got[2] == (0.0, round(1 / 11, 4), True)
    assert got[3][1] == round(5 / 9, 4)      # 'spam' 5 of 9 tokens
    assert got[3][2] is False                # fails top-token filter
    assert got[4] == (0.0, 0.0, True)


def test_top_token_ratio_caps_pathological_doc(spark):
    """A book-sized doc with ~200k distinct tokens would cost O(n*distinct)
    ~4e10 comparisons uncapped; the in-function token cap bounds the scan to
    the first 10k tokens, so this completes in seconds and the ratio is
    computed over the capped prefix (all-distinct -> 1/10000)."""
    import time

    df = spark.range(1).select(
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(199_999)),
                lambda i: F.concat(F.lit("tok"), i.cast("string")),
            ),
        ).alias("text")
    )
    from nhse_probabilistic_linkage_spark.functions.textstats import top_token_ratio

    t0 = time.monotonic()
    r = df.select(top_token_ratio("text").alias("ttr")).collect()[0]
    assert time.monotonic() - t0 < 60
    assert abs(r.ttr - 1.0 / 10_000) < 1e-9


def test_shingle_kernel_bit_identical_to_native(spark):
    """The numpy shingle kernel (r6) must equal the native
    windowed_shingle_hashes expression bit-for-bit: same values, same
    (first-occurrence) order — adversarial corpus incl. empty/short/
    repeated-token/unicode docs plus a long doc spanning fold chunks."""
    from nhse_probabilistic_linkage_spark.functions.text import windowed_shingle_hashes

    rows = [
        ("",),
        (None,),
        ("one",),
        ("a b",),
        ("a b c d",),  # k-1 tokens -> single whole-array shingle
        ("a b c d e",),  # exactly k
        ("a b c d e f g h i j",),
        ("x x x x x x x x x x x x",),  # all-identical tokens -> 1 distinct
        ("Ünïcôdé tokens mixed 123 456 with ünïcôdé repeats 123 456 tokens",),
        (" ".join(f"t{i % 17}" for i in range(3000)),),  # long, collisions
    ]
    df = spark.createDataFrame(rows, "text string")
    native = (
        df.withColumn("_toks", tokenize(F.col("text")))
        .withColumn("_th", F.transform(F.col("_toks"), lambda t: F.xxhash64(t)))
        .select(windowed_shingle_hashes(F.col("_th"), 5).alias("s"))
        .collect()
    )
    kernel = prepare_docs(df, k=5).select("shingles").collect()
    for n, u in zip(native, kernel):
        assert list(n["s"]) == list(u["shingles"])


def test_shingle_kernel_batch_invariant(spark):
    """Kernel output is a pure per-row function: repartitioning (different
    Arrow batch packing) must not change any document's shingles."""
    texts = [(" ".join(f"w{(i * j) % 23}" for j in range(5 + i % 40)),) for i in range(300)]
    df = spark.createDataFrame(texts, "text string").withColumn(
        "doc_id", F.xxhash64("text")
    )
    a = {
        r["doc_id"]: list(r["shingles"])
        for r in prepare_docs(df.repartition(1)).select("doc_id", "shingles").collect()
    }
    b = {
        r["doc_id"]: list(r["shingles"])
        for r in prepare_docs(df.repartition(7)).select("doc_id", "shingles").collect()
    }
    assert a == b


def test_shingle_kernel_group_budget_invariant():
    """Group packing (the memory bound for long-doc batches) must not change
    values: a tiny _GROUP_ROWS forces many groups; results must equal the
    single-group run. Driver-side kernel call — a Spark round-trip would
    not see the monkeypatch on executor workers."""
    import numpy as np

    from nhse_probabilistic_linkage_spark.functions import shingle_kernel as SK

    rng = np.random.default_rng(5)
    arrs = [
        rng.integers(-(2**62), 2**62, size=int(rng.integers(0, 40)), dtype=np.int64)
        for _ in range(150)
    ]
    base = SK.shingle_hashes_batch(arrs, 5)
    orig = SK._GROUP_ROWS
    try:
        SK._GROUP_ROWS = 16
        tiny = SK.shingle_hashes_batch(arrs, 5)
    finally:
        SK._GROUP_ROWS = orig
    for a, b in zip(base, tiny):
        assert list(a) == list(b)
