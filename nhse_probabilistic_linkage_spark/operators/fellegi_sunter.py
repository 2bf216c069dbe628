"""Fellegi–Sunter m/u estimation, DataFrame-native where the data is big.

Reference analog: the reference trains its linkage model with Splink —
``estimate_u_using_random_sampling(max_pairs=1e8)`` then one
expectation-maximisation pass per training blocking rule, averaging the m
values across rules (/root/reference/notebooks_dedupe/training_dedupe.py:
105-150). This module re-expresses that training loop Spark-first:

- the only O(pairs) work is building binary agreement vectors (two joins)
  and one groupBy that collapses them to an agreement-PATTERN contingency
  table of at most 2**k rows (k = number of compared columns). That one
  shuffle is the whole distributed cost — at 10^12 pairs the output is
  still ≤ 2**k rows.
- EM itself then runs driver-side over that tiny table (:func:`em_mu`) —
  the same bounded-local-finish reasoning as
  ``connected_components.local_finish_edges``: collecting ≤ 2**k
  (pattern, count) rows is not a scale hazard. The loop is deliberately
  plain Python floats in a fixed (sorted) order: reproducible to the bit,
  and arithmetically identical to the q90 oracle's generated SQL
  iterations, which is what lets the EM be cross-engine-verified at all.
- u probabilities come from the deterministic random-pair sampler
  (``functions.sampling.sample_pairs``) exactly like Splink's
  random-sampling u estimate: agreement rates among random pairs, which
  are overwhelmingly non-matches at corpus scale.

Weights follow the standard Fellegi–Sunter form: agreement weight
log2(m/u), disagreement weight log2((1-m)/(1-u)).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sampling import sample_pairs


def gamma_vectors(
    pairs: DataFrame,
    attrs: DataFrame,
    id_col: str,
    cols: Sequence[str],
    keep_values: Sequence[str] = (),
) -> DataFrame:
    """(id_l, id_r) pairs -> binary agreement vector per compared column.

    gamma_<col> = 1 iff both sides are non-null and equal (Splink's null
    handling folded to the conservative binary case: a null never agrees).
    Two joins against the projected attribute table; with a broadcastable
    attrs side Catalyst picks broadcast-hash automatically. The joins are
    INNER: a pair whose id is absent from attrs contributes nothing —
    matching Splink, which only scores pairs both of whose records exist
    in the training frame.

    keep_values: columns whose (shared) value should ride along as
    val_<col> — needed by TF adjustment, which must know WHICH value a
    pair agreed on. Agreeing pairs share the value by definition, so the
    left side's copy is kept (null when the pair disagrees).
    """
    proj = attrs.select(id_col, *cols)
    left = proj.select(
        F.col(id_col).alias("id_l"), *[F.col(c).alias(f"_l_{c}") for c in cols]
    )
    right = proj.select(
        F.col(id_col).alias("id_r"), *[F.col(c).alias(f"_r_{c}") for c in cols]
    )
    out = pairs.select("id_l", "id_r").join(left, "id_l").join(right, "id_r")
    extra = []
    for c in cols:
        agree = (
            F.col(f"_l_{c}").isNotNull()
            & F.col(f"_r_{c}").isNotNull()
            & (F.col(f"_l_{c}") == F.col(f"_r_{c}"))
        )
        out = out.withColumn(f"gamma_{c}", agree.cast("int"))
        if c in keep_values:
            out = out.withColumn(f"val_{c}", F.when(agree, F.col(f"_l_{c}")))
            extra.append(f"val_{c}")
    return out.select("id_l", "id_r", *[f"gamma_{c}" for c in cols], *extra)


def pattern_counts(gammas: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Collapse pairs to the agreement-pattern contingency table — the one
    shuffle of the whole estimation; output is ≤ 2**len(cols) rows."""
    gcols = [f"gamma_{c}" for c in cols]
    return gammas.groupBy(*gcols).agg(F.count("*").alias("n_pairs"))


def em_mu(
    patterns: Iterable[tuple[Sequence[int], int]],
    n_iter: int = 20,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.1,
    fix_u: Sequence[float] | None = None,
) -> tuple[float, list[float], list[float]]:
    """EM over (pattern, count) rows. Returns (lambda, m[k], u[k]).

    Pure driver-side arithmetic on the ≤ 2**k-row contingency table;
    patterns are sorted first so summation order (and therefore the float
    result) is reproducible bit-for-bit.

    fix_u: Splink's standard flow estimates u from random sampling FIRST
    and holds it fixed while EM trains m and λ
    (training_dedupe.py:105-129); pass the sampled u values here to get
    that behavior — they are used from iteration one and never updated.
    """
    rows = sorted((tuple(int(g) for g in gs), int(n)) for gs, n in patterns)
    if not rows:
        raise ValueError("empty pattern table")
    k = len(rows[0][0])
    if any(len(gs) != k for gs, _ in rows):
        raise ValueError("ragged agreement patterns")
    if fix_u is not None and len(fix_u) != k:
        raise ValueError("fix_u length does not match pattern width")
    lam = float(init_lambda)
    m = [float(init_m)] * k
    u = [float(x) for x in fix_u] if fix_u is not None else [float(init_u)] * k
    for _ in range(n_iter):
        sum_c = sum_r = 0.0
        num_m = [0.0] * k
        num_u = [0.0] * k
        for gs, n in rows:
            pm = lam
            pu = 1.0 - lam
            for j, g in enumerate(gs):
                pm *= m[j] if g else (1.0 - m[j])
                pu *= u[j] if g else (1.0 - u[j])
            r = pm / (pm + pu)
            sum_c += n
            sum_r += n * r
            for j, g in enumerate(gs):
                if g:
                    num_m[j] += n * r
                    num_u[j] += n * (1.0 - r)
        lam = sum_r / sum_c
        m = [_clip(x / sum_r) for x in num_m]
        if fix_u is None:
            u = [_clip(x / (sum_c - sum_r)) for x in num_u]
    return lam, m, u


def _clip(p: float, eps: float = 1e-9) -> float:
    return min(max(p, eps), 1.0 - eps)


def estimate_mu(
    gammas: DataFrame,
    cols: Sequence[str],
    n_iter: int = 20,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.1,
    fix_u: Sequence[float] | None = None,
) -> DataFrame:
    """Full estimation: pattern shuffle -> driver EM -> params DataFrame
    (column, m, u, agree_weight, disagree_weight)."""
    spark = gammas.sparkSession
    counted = pattern_counts(gammas, cols).collect()  # ≤ 2**k rows by construction
    pats = [
        (tuple(row[f"gamma_{c}"] for c in cols), row["n_pairs"]) for row in counted
    ]
    lam, m, u = em_mu(
        pats,
        n_iter=n_iter,
        init_m=init_m,
        init_u=init_u,
        init_lambda=init_lambda,
        fix_u=fix_u,
    )
    return params_dataframe(spark, cols, m, u, lam)


def params_dataframe(
    spark: SparkSession,
    cols: Sequence[str],
    m: Sequence[float],
    u: Sequence[float],
    lam: float | None = None,
) -> DataFrame:
    rows = [
        (
            c,
            float(mj),
            float(uj),
            math.log2(mj / uj),
            math.log2((1.0 - mj) / (1.0 - uj)),
            float(lam) if lam is not None else None,
        )
        for c, mj, uj in zip(cols, m, u)
    ]
    return spark.createDataFrame(
        rows, "column string, m double, u double, agree_weight double, "
        "disagree_weight double, lambda_prior double"
    )


def estimate_u_random_pairs(
    df: DataFrame,
    id_col: str,
    cols: Sequence[str],
    k_per_side: int = 100,
    seed: int = 42,
    method: str = "xxhash",
) -> dict[str, float]:
    """Splink-style u estimation: agreement rate per column among a
    deterministic random pair sample (training_dedupe.py:105 analog).
    One thin sample join + one scalar aggregate; never materializes the
    full pair space."""
    pairs = sample_pairs(df, key=id_col, k_per_side=k_per_side, seed=seed, method=method)
    g = gamma_vectors(pairs, df, id_col, cols)
    aggs = [F.avg(F.col(f"gamma_{c}").cast("double")).alias(c) for c in cols]
    row = g.agg(*aggs).collect()[0]
    return {c: _clip(float(row[c])) for c in cols}


def average_m(param_rows: Sequence[dict[str, float]]) -> dict[str, float]:
    """The reference trains one EM per blocking rule then averages the m
    values (training_dedupe.py:136-150); same fold here over
    {column: m} dicts from repeated estimate_mu runs."""
    if not param_rows:
        raise ValueError("no parameter sets to average")
    keys = set(param_rows[0])
    if any(set(p) != keys for p in param_rows):
        raise ValueError("parameter sets disagree on columns")
    return {c: sum(p[c] for p in param_rows) / len(param_rows) for c in keys}


def score_pairs(
    gammas: DataFrame,
    cols: Sequence[str],
    m: dict[str, float],
    u: dict[str, float],
) -> DataFrame:
    """Attach the Fellegi–Sunter match weight and probability to each pair —
    pure column arithmetic (whole-stage codegen), no UDFs, no shuffle."""
    weight = F.lit(0.0)
    for c in cols:
        aw = math.log2(m[c] / u[c])
        dw = math.log2((1.0 - m[c]) / (1.0 - u[c]))
        weight = weight + F.when(F.col(f"gamma_{c}") == 1, F.lit(aw)).otherwise(
            F.lit(dw)
        )
    bf = F.pow(F.lit(2.0), weight)
    return gammas.withColumn("match_weight", weight).withColumn(
        "match_probability", bf / (F.lit(1.0) + bf)
    )


def term_frequencies(attrs: DataFrame, col: str) -> DataFrame:
    """Relative frequency per value of `col` (nulls excluded): the Splink
    term-frequency table behind tf_adjustment_column
    (/root/reference/utils/parameter_lists.py:11-13). One groupBy; the
    total rides along via a window-free scalar join."""
    counts = attrs.where(F.col(col).isNotNull()).groupBy(
        F.col(col).alias(f"val_{col}")
    ).agg(F.count("*").alias("_n"))
    total = counts.agg(F.sum("_n").alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        f"val_{col}", (F.col("_n") / F.col("_total")).alias(f"tf_{col}")
    )


def tf_adjusted_scores(
    gammas: DataFrame,
    cols: Sequence[str],
    m: dict[str, float],
    u: dict[str, float],
    tf_tables: dict[str, DataFrame],
    tf_weight: dict[str, float] | None = None,
    tf_minimum_u: float = 0.001,
) -> DataFrame:
    """FS scoring with Splink's term-frequency adjustment
    (tf_adjustment_column / tf_adjustment_weight / tf_minimum_u_value,
    /root/reference/utils/parameter_lists.py:11-13): agreeing on a RARE
    value is stronger evidence than agreeing on a common one, so for an
    agreement on value v the column's generic u is replaced by
    max(tf(v), tf_minimum_u), i.e. the weight gains
    tf_weight * log2(u / max(tf(v), tf_minimum_u)).

    gammas must carry val_<col> for every TF column (gamma_vectors
    keep_values). TF tables join per column — distinct-value tables, so
    Catalyst/AQE broadcasts them when small; a high-cardinality TF table
    degrades to a hash join, never a driver collect.
    """
    tf_weight = tf_weight or {}
    scored = score_pairs(gammas, cols, m, u)
    adj_cols = []
    for c, tf in tf_tables.items():
        if c not in u:
            raise ValueError(f"TF column {c!r} has no u probability")
        if f"val_{c}" not in scored.columns:
            raise ValueError(
                f"gammas lack val_{c} — build them with gamma_vectors(..., "
                f"keep_values=[{c!r}]) so the TF join knows the agreed value"
            )
        w = float(tf_weight.get(c, 1.0))
        adj = F.lit(w) * F.log2(
            F.lit(u[c]) / F.greatest(F.col(f"tf_{c}"), F.lit(tf_minimum_u))
        )
        scored = (
            scored.join(tf, f"val_{c}", "left")
            .withColumn(
                f"_adj_{c}",
                # adjustment applies only when the pair agreed (tf joined)
                F.when(
                    (F.col(f"gamma_{c}") == 1) & F.col(f"tf_{c}").isNotNull(), adj
                ).otherwise(F.lit(0.0)),
            )
            .drop(f"tf_{c}")
        )
        adj_cols.append(f"_adj_{c}")
    weight = F.col("match_weight")
    for a in adj_cols:
        weight = weight + F.col(a)
    scored = scored.withColumn("match_weight", weight)
    bf = F.pow(F.lit(2.0), F.col("match_weight"))
    return scored.withColumn("match_probability", bf / (F.lit(1.0) + bf)).drop(
        *adj_cols
    )
