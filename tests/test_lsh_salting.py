"""Salted band self-join: identical pair sets with salting on/off, hot-band
routing, and cap accounting interplay.

Reference analog: blocking rules are hand-tuned for selectivity and their
per-rule pair counts are audited (notebooks_dedupe/blocking_evaluation_dedupe
.py:154-175); ours must keep pair-set semantics invariant under the skew
mitigation."""

import pytest
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.operators.lsh import candidate_pairs


def _bands(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, band_id int, band_key long")


@pytest.fixture(scope="module")
def skewed_bands(spark):
    rows = []
    # hot band 100: 40 members -> 780 pairs
    rows += [(i, 0, 100) for i in range(40)]
    # cold band 200: 3 members
    rows += [(50, 1, 200), (51, 1, 200), (52, 1, 200)]
    # mega band 300: 60 members, to be capped
    rows += [(1000 + i, 2, 300) for i in range(60)]
    return _bands(spark, rows)


def _pairset(df):
    return {(r["id_l"], r["id_r"], r["match_key"]) for r in df.collect()}


def test_salted_equals_unsalted(spark, skewed_bands):
    plain, _ = candidate_pairs(skewed_bands, band_cap=None, salt_threshold=None)
    salted, _ = candidate_pairs(skewed_bands, band_cap=None, salt_threshold=10, salt_groups=4)
    assert _pairset(plain) == _pairset(salted)
    # 40*39/2 + 3 + 60*59/2 pairs
    assert plain.count() == 780 + 3 + 1770


def test_salting_with_cap(spark, skewed_bands):
    pairs, dropped = candidate_pairs(skewed_bands, band_cap=50, salt_threshold=10, salt_groups=4)
    # band 300 (60 members) dropped; band 100 salted; band 200 plain
    assert {(r["band_key"], r["band_size"]) for r in dropped.collect()} == {(300, 60)}
    assert pairs.count() == 780 + 3
    ids = pairs.select("id_l").union(pairs.select("id_r")).distinct()
    assert ids.filter(F.col("id_l") >= 1000).count() == 0


def test_salting_cross_band_dedup(spark):
    # same pair found in two bands -> one row, match_key = min band_id;
    # one band hot (salted), one cold
    rows = [(i, 0, 1) for i in range(20)] + [(0, 1, 2), (1, 1, 2)]
    pairs, _ = candidate_pairs(_bands(spark, rows), band_cap=None, salt_threshold=5, salt_groups=3)
    got = {(r["id_l"], r["id_r"]): r["match_key"] for r in pairs.collect()}
    assert got[(0, 1)] == 0
    assert len(got) == 190


def test_salt_groups_one_is_identity(spark, skewed_bands):
    one, _ = candidate_pairs(skewed_bands, band_cap=None, salt_threshold=1, salt_groups=1)
    plain, _ = candidate_pairs(skewed_bands, band_cap=None, salt_threshold=None)
    assert _pairset(one) == _pairset(plain)
