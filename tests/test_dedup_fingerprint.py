"""The 128-bit exact-dedup fingerprint must be two INDEPENDENT 64-bit halves.

Spark's xxhash64 folds its arguments left-to-right from the fixed seed, so
``xxhash64(key, salt)`` is a deterministic function of ``xxhash64(key)`` (the
accumulator state after folding the text is exactly fp_a; the salt is folded
after). Any fp_a collision would then imply an fp_b collision and the second
half would add zero entropy — the "128-bit" key would false-merge at the
64-bit birthday rate. Folding the salt FIRST hashes the text from a salted
accumulator state: a genuinely different hash function of the text.
"""

from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.operators.dedup import exact_dedup

SALT = 0x5F3759DF  # 1598505439


def test_salt_order_changes_the_hash_function(spark):
    df = spark.range(64).select(F.concat(F.lit("doc "), F.col("id")).alias("t"))
    rows = df.select(
        F.xxhash64(F.lit(SALT), F.col("t")).alias("salt_first"),
        F.xxhash64(F.col("t"), F.lit(SALT)).alias("salt_last"),
        F.xxhash64(F.col("t")).alias("plain"),
    ).collect()
    # if fold order were irrelevant the fix would be a no-op; pin that the
    # three are pairwise-distinct hash functions on every sample
    for r in rows:
        assert r.salt_first != r.salt_last
        assert r.salt_first != r.plain
        assert r.salt_last != r.plain


def test_exact_dedup_second_half_is_salt_first(spark):
    # regression pin on the implementation: fp_b must fold the salt literal
    # BEFORE the text expression. In the analyzed plan the buggy form renders
    # as xxhash64(<text>, 1598505439, 42) and the fixed form as
    # xxhash64(1598505439, <text>, 42).
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    plan = exact_dedup(df)._jdf.queryExecution().analyzed().toString()
    assert f"xxhash64({SALT}," in plan


def test_exact_dedup_groups_and_separates(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.rep_id, r.group_size) for r in exact_dedup(df).collect()}
    assert out[1] == (1, 2) and out[2] == (1, 2)
    assert out[3] == (3, 1)


def test_ngram_grouped_branch_matches_join_branch(spark):
    """The large-corpus grouped shape of ngram_jaccard_pairs must produce
    the identical pair set as the broadcast self-join shape (the branch is
    picked driver-side, so forcing the module threshold covers it)."""
    from pyspark.sql import functions as F

    from nhse_probabilistic_linkage_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def rows(df):
        return sorted(
            (r["id_l"], r["id_r"], round(r["jaccard"], 9))
            for r in df.select("id_l", "id_r", "jaccard").collect()
        )

    join_shape = rows(D.ngram_jaccard_pairs(docs, k=5, threshold=0.3))
    orig = D.NGRAM_JOIN_MAX_POSTINGS
    try:
        D.NGRAM_JOIN_MAX_POSTINGS = 0  # force the grouped branch
        grouped_shape = rows(D.ngram_jaccard_pairs(docs, k=5, threshold=0.3))
    finally:
        D.NGRAM_JOIN_MAX_POSTINGS = orig
    assert join_shape == grouped_shape and len(join_shape) > 0
