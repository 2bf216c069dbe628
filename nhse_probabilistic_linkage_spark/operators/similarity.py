"""Embedding similarity: exact cosine top-k plus a hyperplane-LSH scale path.

The engine treats embeddings as array<float> columns. Cosine math is native
(zip_with + aggregate stay in codegen — no Python per pair); the
candidate-generation trick for scale is the same band-join shape as MinHash:
random-hyperplane signatures bucket similar vectors, buckets self/cross-join,
exact cosine verifies. Reference analog: blocking keys prune the O(n^2)
comparison space before the expensive scorer (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def dot_expr(a, b) -> F.Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a) -> F.Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a, b) -> F.Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries is expected small -> broadcast cross join; the per-pair cosine is
    a codegen expression, the top-k a ranking window per query. This is the
    correctness baseline; use lsh_topk for large query sets.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"), norm_expr(vec_col).alias("_qnorm")
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cvec"), norm_expr(vec_col).alias("_cnorm")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        (dot_expr("_qvec", "_cvec") / (F.col("_qnorm") * F.col("_cnorm"))).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def make_hyperplane_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """array<float> -> int64 bucket: sign bits of dots with fixed random
    hyperplanes (vectorized: one matmul per Arrow batch)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float64)

    @pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes) > 0
        weights = (1 << np.arange(n_planes, dtype=np.uint64))
        vals = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pd.Series(vals.astype(np.int64))

    return bucket


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_planes: int = 12,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Pairs (id_l, id_r, cosine >= threshold).

    exact=True: all-pairs self-join (small corpora / oracle parity).
    exact=False: hyperplane-LSH buckets prune candidates first — vectors in
    the same bucket (expected collision prob (1 - theta/pi)^n_planes) join;
    misses are possible, so exact mode is the auditable baseline.
    """
    slim = df.select(F.col(id_col), F.col(vec_col), norm_expr(vec_col).alias("_n"))
    if not exact:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        bucket = make_hyperplane_udf(dim, n_planes=n_planes, seed=seed)
        slim = slim.withColumn("_bkt", bucket(vec_col))
        join_keys = ["_bkt"]
        l = slim.select(
            F.col("_bkt"), F.col(id_col).alias("id_l"), F.col(vec_col).alias("_vl"), F.col("_n").alias("_nl")
        )
        r = slim.select(
            F.col("_bkt"), F.col(id_col).alias("id_r"), F.col(vec_col).alias("_vr"), F.col("_n").alias("_nr")
        )
        cand = l.join(r, join_keys).where(F.col("id_l") < F.col("id_r"))
    else:
        l = slim.select(F.col(id_col).alias("id_l"), F.col(vec_col).alias("_vl"), F.col("_n").alias("_nl"))
        r = slim.select(F.col(id_col).alias("id_r"), F.col(vec_col).alias("_vr"), F.col("_n").alias("_nr"))
        cand = l.crossJoin(r).where(F.col("id_l") < F.col("id_r"))
    return (
        cand.withColumn("cosine", dot_expr("_vl", "_vr") / (F.col("_nl") * F.col("_nr")))
        .where(F.col("cosine") >= threshold)
        .select("id_l", "id_r", "cosine")
    )
