"""Similarity search: exact brute-force vs the two approximate scale paths
(hyperplane LSH pairs, IVF top-k), plus TableIO round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    ivf_topk,
    train_centroids,
)
from nhse_probabilistic_linkage_spark.sources.tables import TableIO

DIM = 16
N_CLUSTERS = 8


@pytest.fixture(scope="module")
def vectors(spark):
    """Clustered synthetic vectors: N_CLUSTERS well-separated centers, 50
    points each with small noise — deterministic."""
    rng = np.random.default_rng(123)
    centers = rng.standard_normal((N_CLUSTERS, DIM)) * 5
    rows = []
    vid = 0
    for ci in range(N_CLUSTERS):
        for _ in range(50):
            v = centers[ci] + rng.standard_normal(DIM) * 0.3
            rows.append((vid, ci, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, true_cluster int, embedding array<double>").cache()


def test_ivf_topk_recall_vs_bruteforce(spark, vectors):
    queries = vectors.limit(20).select(F.col("vec_id").alias("query_id"), "embedding")
    corpus = vectors
    exact = brute_force_topk(corpus, queries, k=10)
    centroids = train_centroids(corpus, n_centroids=N_CLUSTERS, iterations=2, seed=7)
    approx = ivf_topk(corpus, queries, centroids, k=10, n_probe=2)

    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall


def test_ivf_deterministic(spark, vectors):
    c1 = train_centroids(vectors, n_centroids=N_CLUSTERS, iterations=1, seed=7)
    c2 = train_centroids(vectors, n_centroids=N_CLUSTERS, iterations=1, seed=7)
    assert np.array_equal(c1, c2)


def test_lsh_neardup_finds_planted_neighbors(spark, vectors):
    # points within a cluster are near-duplicates by construction
    exact = embedding_neardup_pairs(vectors, threshold=0.95, exact=True)
    approx = embedding_neardup_pairs(vectors, threshold=0.95, exact=False, dim=DIM, n_planes=8)
    ne, na = exact.count(), approx.count()
    assert ne > 100
    # LSH is a subset of exact (verification is exact cosine) with high recall
    assert na <= ne
    assert na / ne >= 0.7, (na, ne)


def test_lsh_hot_bucket_capped_with_accounting(spark):
    """10k identical embeddings (degenerate boilerplate vectors) must NOT
    emit O(m^2) bucket-join rows: the bucket routes through candidate_pairs'
    cap machinery — dropped past band_cap with (band_key, band_size)
    accounting, never silently (same contract as hot MinHash bands)."""
    rng = np.random.default_rng(7)
    base = [float(x) for x in rng.standard_normal(DIM)]
    df = spark.createDataFrame(
        [(i, base) for i in range(10_000)], "vec_id long, embedding array<double>"
    )
    pairs, dropped = embedding_neardup_pairs(
        df, threshold=0.95, exact=False, dim=DIM, n_planes=8, n_tables=2,
        band_cap=1000, with_accounting=True,
    )
    assert pairs.count() == 0  # every bucket over-cap -> zero pair emission
    d = dropped.collect()
    assert len(d) == 2  # one hot bucket per hash table
    assert all(r["band_size"] == 10_000 for r in d)


def test_lsh_hot_bucket_salted_keeps_all_pairs(spark):
    """Buckets between salt_threshold and band_cap keep EVERY pair — the
    salted self-join only spreads the emission across tasks."""
    rng = np.random.default_rng(11)
    base = [float(x) for x in rng.standard_normal(DIM)]
    df = spark.createDataFrame(
        [(i, base) for i in range(200)], "vec_id long, embedding array<double>"
    )
    pairs, dropped = embedding_neardup_pairs(
        df, threshold=0.95, exact=False, dim=DIM, n_planes=8, n_tables=1,
        band_cap=5000, salt_threshold=50, salt_groups=4, with_accounting=True,
    )
    assert pairs.count() == 200 * 199 // 2
    assert dropped.count() == 0


def test_tableio_roundtrip(spark, vectors, tmp_path):
    io = TableIO(spark, warehouse=str(tmp_path))
    io.write(vectors.select("vec_id", "true_cluster"), "vecs")
    assert io.exists("vecs")
    assert not io.exists("missing")
    back = io.read("vecs")
    assert back.count() == vectors.count()
    io.write(vectors.select("vec_id").limit(5), "vecs", mode="overwrite")
    assert io.read("vecs").count() == 5


def test_tableio_scheme_prefixed_warehouse(spark, vectors, tmp_path):
    """The parquet fallback must work on scheme-prefixed URIs: path probing
    goes through the Hadoop FS client (os.path would only see the driver's
    local disk and mangle the scheme)."""
    io = TableIO(spark, warehouse=f"file:{tmp_path}")
    io.write(vectors.select("vec_id"), "vecs")
    assert io.exists("vecs")
    assert not io.exists("missing")
    assert io.read("vecs").count() == vectors.count()


def test_suggest_n_centroids_scaling():
    from nhse_probabilistic_linkage_spark.operators.similarity import suggest_n_centroids

    assert suggest_n_centroids(0) == 64
    assert suggest_n_centroids(10_000) == 100
    assert suggest_n_centroids(1_000_000) == 1000
    assert suggest_n_centroids(10**12) == 1_000_000
