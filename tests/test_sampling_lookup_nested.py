"""Round-2 operators: seeded sampling, lookup-replace/enrich, and
array<struct> history explode + outer recombination.

Reference test analog: tiny explicit createDataFrame fixtures with golden
expectations (tests/preprocessing_tests.py style); nested-schema explode
tests mirror tests/dataset_ingestion_tests.py:247-518.
"""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from nhse_probabilistic_linkage_spark.functions.sampling import (
    affine_bucket_expr,
    hash_bucket_sample,
    rand_bucket_sample,
    sample_pairs,
    seeded_fraction_sample,
)
from nhse_probabilistic_linkage_spark.operators.lookup import (
    lookup_enrich_array,
    lookup_replace,
)
from nhse_probabilistic_linkage_spark.operators.nested import (
    explode_history,
    recombine_histories,
)


# ------------------------------------------------------------- sampling
def test_hash_bucket_sample_stable_across_partitionings(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in hash_bucket_sample(df.repartition(1), "k", 50).collect())
    b = sorted(r.k for r in hash_bucket_sample(df.repartition(17), "k", 50).collect())
    assert a == b
    # ~1/50 of 5000 = 100, loose bounds
    assert 50 <= len(a) <= 160
    # disjoint buckets partition the input
    n_all = sum(
        hash_bucket_sample(df, "k", 50, bucket=i).count() for i in range(50)
    )
    assert n_all == 5000


def test_rand_bucket_sample_fraction(spark):
    df = spark.range(0, 5000)
    got = rand_bucket_sample(df, k=50, seed=42).count()
    assert 50 <= got <= 160


def test_seeded_fraction_sample_deterministic_same_layout(spark):
    df = spark.range(0, 5000).localCheckpoint(eager=True)
    a = sorted(r.id for r in seeded_fraction_sample(df, 0.02, seed=9).collect())
    b = sorted(r.id for r in seeded_fraction_sample(df, 0.02, seed=9).collect())
    assert a == b and 40 <= len(a) <= 170


def test_affine_bucket_matches_duckdb(spark):
    """The oracle-reproducible bucketing really is engine-independent."""
    import duckdb

    from nhse_probabilistic_linkage_spark.functions.sampling import affine_bucket_sql

    df = spark.range(-100, 3000).withColumnRenamed("id", "k")
    got = sorted(
        r.k for r in df.where(affine_bucket_expr("k", 13) == 5).collect()
    )
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT k FROM range(-100, 3000) t(k) WHERE {affine_bucket_sql('k', 13)} = 5 ORDER BY k"
        ).fetchall()
    ]
    assert got == want and len(got) > 100


def test_sample_pairs_shape_and_determinism(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    p1 = sorted((r.id_l, r.id_r) for r in sample_pairs(df, "k", 10).collect())
    p2 = sorted((r.id_l, r.id_r) for r in sample_pairs(df, "k", 10).collect())
    assert p1 == p2
    assert all(l < r for l, r in p1)
    # ~ (2000/10)^2 / 2 = 20000 pairs, very loose
    assert 5000 <= len(p1) <= 40000


# ------------------------------------------------------------- lookup
def test_lookup_replace_supersession(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, code string")
    mapping = spark.createDataFrame([("b", "B2"), ("zz", "never")], "old string, new string")
    got = {
        r.id: r.code
        for r in lookup_replace(df, mapping, "code", "old", "new").collect()
    }
    assert got == {1: "a", 2: "B2", 3: "c"}


def test_lookup_replace_broadcasts(spark):
    df = spark.range(0, 1000).withColumn("code", F.col("id").cast("string"))
    mapping = spark.createDataFrame([("5", "five")], "old string, new string")
    out = lookup_replace(df, mapping, "code", "old", "new")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lookup_enrich_array_nicknames(spark):
    df = spark.createDataFrame([(1, "robert"), (2, "xavier")], "id long, name string")
    nick = spark.createDataFrame(
        [("robert", ["bob", "rob"])],
        StructType(
            [
                StructField("name", StringType()),
                StructField("nicknames", ArrayType(StringType())),
            ]
        ),
    )
    got = {
        r.id: r.all_names
        for r in lookup_enrich_array(df, nick, "name", "name", "nicknames", "all_names").collect()
    }
    assert got[1] == ["robert", "bob", "rob"]
    assert got[2] == ["xavier"]  # miss -> key only (empty-array default)


# ------------------------------------------------------------- nested
def _history_df(spark):
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField(
                "name_history",
                ArrayType(
                    StructType(
                        [
                            StructField("name", StringType()),
                            StructField("since", StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
    rows = [
        (1, [("ann", "2001"), ("ann", "2001"), ("anne", "2005"), None]),
        (2, [None]),   # only-null history -> keeps one null row
        (3, None),     # null array -> keeps one null row
        (4, [("bo", "1999")]),
    ]
    return spark.createDataFrame(rows, schema)


def test_explode_history_reference_semantics(spark):
    got = {
        (r.id, r.h_name, r.h_since)
        for r in explode_history(_history_df(spark), "id", "name_history", prefix="h_").collect()
    }
    assert got == {
        (1, "ann", "2001"),   # deduped
        (1, "anne", "2005"),
        (2, None, None),      # null row kept: no non-null sibling
        (3, None, None),
        (4, "bo", "1999"),
    }


def test_recombine_histories_outer_cartesian(spark):
    a = spark.createDataFrame([(1, "x1"), (1, "x2"), (2, "x3")], "id long, a string")
    b = spark.createDataFrame([(1, "y1"), (1, "y2"), (3, "y3")], "id long, b string")
    got = {
        (r.id, r.a, r.b) for r in recombine_histories([a, b], "id").collect()
    }
    assert got == {
        (1, "x1", "y1"), (1, "x1", "y2"), (1, "x2", "y1"), (1, "x2", "y2"),
        (2, "x3", None),
        (3, None, "y3"),
    }
