"""Fellegi–Sunter m/u estimation + phonetic blocking keys.

Mirrors the reference's training/blocking surface
(notebooks_dedupe/training_dedupe.py:105-150, utils/preprocessing_utils.py:
211,427-433) with the engine's Spark-first replacements.
"""

import math
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.functions.phonetics import (
    _CLASS_STEPS,
    phonetic_key,
    soundex_key,
)
from nhse_probabilistic_linkage_spark.operators.fellegi_sunter import (
    average_m,
    em_mu,
    estimate_mu,
    estimate_u_random_pairs,
    gamma_vectors,
    pattern_counts,
    score_pairs,
    term_frequencies,
    tf_adjusted_scores,
)

# ---------------------------------------------------------------------------
# phonetics


def _py_phonetic_key(s, length=4):
    """Independent pure-Python rendering of the phonetic_key spec."""
    if s is None:
        return None
    letters = re.sub("[^A-Z]", "", s.upper())
    if not letters:
        return None
    tail = letters[1:]
    for pat, repl in _CLASS_STEPS:
        tail = re.sub(pat, repl, tail)
    return (letters[0] + tail + "0" * length)[:length]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(st.characters(min_codepoint=32, max_codepoint=255), max_size=24)),
        min_size=1,
        max_size=20,
    )
)
def test_phonetic_key_matches_python_spec(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r["k"] for r in df.select(phonetic_key("s").alias("k")).collect()]
    want = [_py_phonetic_key(v) for v in values]
    assert got == want


def test_phonetic_key_groups_homophones(spark):
    df = spark.createDataFrame(
        [("Smith",), ("Smyth",), ("smeeth",), ("Jones",)], "s string"
    )
    keys = {r["s"]: r["k"] for r in df.select("s", phonetic_key("s").alias("k")).collect()}
    assert keys["Smith"] == keys["Smyth"] == keys["smeeth"]
    assert keys["Jones"] != keys["Smith"]


def test_soundex_key_known_values_and_null_discipline(spark):
    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("  12/34 ",), ("",), (None,)], "s string"
    )
    got = [r["k"] for r in df.select(soundex_key("s").alias("k")).collect()]
    # ANSI soundex: Robert and Rupert both code to R163; junk/empty/null -> NULL
    assert got == ["R163", "R163", None, None, None]


# ---------------------------------------------------------------------------
# EM on the pattern contingency table


def _expected_pattern_counts(lam, m, u, total):
    """Exact expected (pattern, count) rows under the FS mixture."""
    k = len(m)
    rows = []
    for p in range(1 << k):
        gs = tuple((p >> j) & 1 for j in range(k))
        pm = lam
        pu = 1.0 - lam
        for j, g in enumerate(gs):
            pm *= m[j] if g else 1.0 - m[j]
            pu *= u[j] if g else 1.0 - u[j]
        rows.append((gs, round(total * (pm + pu))))
    return rows


def test_em_recovers_planted_parameters():
    lam, m, u = 0.2, [0.95, 0.8, 0.6], [0.05, 0.2, 0.3]
    pats = _expected_pattern_counts(lam, m, u, total=10_000_000)
    got_lam, got_m, got_u = em_mu(pats, n_iter=300)
    assert abs(got_lam - lam) < 0.02
    for a, b in zip(got_m, m):
        assert abs(a - b) < 0.02
    for a, b in zip(got_u, u):
        assert abs(a - b) < 0.02


def test_em_is_deterministic_under_input_order():
    pats = _expected_pattern_counts(0.3, [0.9, 0.7], [0.1, 0.4], total=100_000)
    a = em_mu(pats, n_iter=25)
    b = em_mu(list(reversed(pats)), n_iter=25)
    assert a == b  # bit-identical: rows are sorted before the float loop


def test_em_rejects_bad_input():
    with pytest.raises(ValueError):
        em_mu([])
    with pytest.raises(ValueError):
        em_mu([((1, 0), 5), ((1,), 3)])


# ---------------------------------------------------------------------------
# DataFrame plumbing


def test_gamma_vectors_null_never_agrees(spark):
    attrs = spark.createDataFrame(
        [(1, "x", None), (2, "x", None), (3, None, 5)],
        "id bigint, a string, b int",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_l bigint, id_r bigint")
    rows = {
        (r["id_l"], r["id_r"]): (r["gamma_a"], r["gamma_b"])
        for r in gamma_vectors(pairs, attrs, "id", ["a", "b"]).collect()
    }
    assert rows[(1, 2)] == (1, 0)  # both-null b never agrees
    assert rows[(1, 3)] == (0, 0)


def test_estimate_mu_matches_driver_em(spark):
    attrs = spark.createDataFrame(
        [(i, i % 2, i % 3) for i in range(40)], "id bigint, a int, b int"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "id_l bigint, id_r bigint"
    )
    g = gamma_vectors(pairs, attrs, "id", ["a", "b"])
    pc = {
        (r["gamma_a"], r["gamma_b"]): r["n_pairs"]
        for r in pattern_counts(g, ["a", "b"]).collect()
    }
    lam, m, u = em_mu(list(pc.items()), n_iter=7)
    got = {r["column"]: r for r in estimate_mu(g, ["a", "b"], n_iter=7).collect()}
    assert got["a"]["m"] == m[0] and got["a"]["u"] == u[0]
    assert got["b"]["m"] == m[1] and got["b"]["u"] == u[1]
    assert got["a"]["lambda_prior"] == lam
    assert got["a"]["agree_weight"] == pytest.approx(math.log2(m[0] / u[0]))


def test_estimate_u_random_pairs_bounds(spark):
    df = spark.createDataFrame(
        [(i, "const", i) for i in range(2000)], "id bigint, a string, b bigint"
    )
    u = estimate_u_random_pairs(df, "id", ["a", "b"], k_per_side=10, seed=7)
    assert u["a"] > 0.999999  # constant column agrees on every random pair
    assert u["b"] < 1e-6  # unique column never agrees (clipped floor)


def test_score_pairs_arithmetic(spark):
    m = {"a": 0.9, "b": 0.8}
    u = {"a": 0.1, "b": 0.4}
    g = spark.createDataFrame(
        [(1, 2, 1, 0)], "id_l bigint, id_r bigint, gamma_a int, gamma_b int"
    )
    row = score_pairs(g, ["a", "b"], m, u).collect()[0]
    want = math.log2(0.9 / 0.1) + math.log2(0.2 / 0.6)
    assert row["match_weight"] == pytest.approx(want)
    bf = 2.0**want
    assert row["match_probability"] == pytest.approx(bf / (1 + bf))


def test_term_frequency_adjustment(spark):
    # 10 rows: value "rare" once, "common" 9 times -> tf 0.1 / 0.9
    attrs = spark.createDataFrame(
        [(i, "common" if i else "rare") for i in range(10)], "id bigint, a string"
    )
    tf = {r["val_a"]: r["tf_a"] for r in term_frequencies(attrs, "a").collect()}
    assert tf == {"rare": pytest.approx(0.1), "common": pytest.approx(0.9)}

    pairs = spark.createDataFrame(
        [(0, 10), (1, 2), (1, 3)], "id_l bigint, id_r bigint"
    )
    attrs2 = spark.createDataFrame(
        [(0, "rare"), (10, "rare"), (1, "common"), (2, "common"), (3, "other")],
        "id bigint, a string",
    )
    g = gamma_vectors(pairs, attrs2, "id", ["a"], keep_values=["a"])
    m, u = {"a": 0.9}, {"a": 0.2}
    base = {
        (r["id_l"], r["id_r"]): r["match_weight"]
        for r in score_pairs(g, ["a"], m, u).collect()
    }
    out = {
        (r["id_l"], r["id_r"]): r["match_weight"]
        for r in tf_adjusted_scores(
            g, ["a"], m, u, {"a": term_frequencies(attrs, "a")}, tf_minimum_u=0.001
        ).collect()
    }
    # agreeing on the rare value gains log2(u/tf_rare); on the common value
    # the adjustment is negative (tf > u); a disagreeing pair is untouched
    assert out[(0, 10)] == pytest.approx(base[(0, 10)] + math.log2(0.2 / 0.1))
    assert out[(1, 2)] == pytest.approx(base[(1, 2)] + math.log2(0.2 / 0.9))
    assert out[(1, 3)] == pytest.approx(base[(1, 3)])
    # tf_weight damps the adjustment; tf_minimum_u floors a vanishing tf
    half = {
        (r["id_l"], r["id_r"]): r["match_weight"]
        for r in tf_adjusted_scores(
            g, ["a"], m, u, {"a": term_frequencies(attrs, "a")},
            tf_weight={"a": 0.5},
        ).collect()
    }
    assert half[(0, 10)] == pytest.approx(base[(0, 10)] + 0.5 * math.log2(0.2 / 0.1))
    floored = {
        (r["id_l"], r["id_r"]): r["match_weight"]
        for r in tf_adjusted_scores(
            g, ["a"], m, u, {"a": term_frequencies(attrs, "a")}, tf_minimum_u=0.5
        ).collect()
    }
    assert floored[(0, 10)] == pytest.approx(base[(0, 10)] + math.log2(0.2 / 0.5))
    with pytest.raises(ValueError):
        tf_adjusted_scores(g, ["a"], m, u, {"b": term_frequencies(attrs, "a")})


def test_average_m_folds_training_runs():
    runs = [{"a": 0.9, "b": 0.6}, {"a": 0.7, "b": 0.8}]
    assert average_m(runs) == {"a": pytest.approx(0.8), "b": pytest.approx(0.7)}
    with pytest.raises(ValueError):
        average_m([])
    with pytest.raises(ValueError):
        average_m([{"a": 0.5}, {"b": 0.5}])
