"""Token-budget shard packing: coverage, budget bound, determinism."""

import pytest
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.functions.packing import pack_token_shards


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(900)) + 100).alias("n_tokens"),  # 100..999
    )


def test_every_row_in_exactly_one_shard(spark, docs):
    out = pack_token_shards(docs, shard_tokens=4096, writers=4)
    assert out.count() == 1000
    assert out.select("doc_id").distinct().count() == 1000
    assert out.where(F.col("writer_id").isNull() | F.col("shard_seq").isNull()).count() == 0


def test_shard_totals_bounded(spark, docs):
    budget = 4096
    out = pack_token_shards(docs, shard_tokens=budget, writers=4)
    max_tok = docs.agg(F.max("n_tokens")).collect()[0][0]
    totals = out.groupBy("writer_id", "shard_seq").agg(F.sum("n_tokens").alias("tot"))
    worst = totals.agg(F.max("tot")).collect()[0][0]
    # next-fit-by-offset guarantee
    assert worst <= budget + max_tok - 1
    # and shards are well-filled: all but each writer's last shard hold
    # >= budget - max_tok + 1 tokens (a row that would leave more slack
    # would have started in the earlier shard)
    last = out.groupBy("writer_id").agg(F.max("shard_seq").alias("last_seq"))
    non_last = totals.join(
        last, (totals["writer_id"] == last["writer_id"]) & (totals["shard_seq"] == last["last_seq"]), "left_anti"
    )
    assert non_last.agg(F.min("tot")).collect()[0][0] >= budget - max_tok + 1


def test_offsets_and_positions_consistent(spark, docs):
    out = pack_token_shards(docs, shard_tokens=4096, writers=4)
    # shard_offset is within [0, budget) and shard_pos counts 1..n per shard
    assert out.where((F.col("shard_offset") < 0) | (F.col("shard_offset") >= 4096)).count() == 0
    per = out.groupBy("writer_id", "shard_seq").agg(
        F.count("*").alias("n"), F.max("shard_pos").alias("mx"), F.min("shard_pos").alias("mn")
    )
    assert per.where((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count() == 0


def test_packing_deterministic_across_partitionings(spark, docs):
    a = pack_token_shards(docs.repartition(1), shard_tokens=4096, writers=4)
    b = pack_token_shards(docs.repartition(13), shard_tokens=4096, writers=4)
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_b = sorted(tuple(r) for r in b.collect())
    assert rows_a == rows_b


def test_oversized_row_gets_own_budget_span(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 10_000), (3, 100)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r for r in pack_token_shards(docs, shard_tokens=4096, writers=1).collect()}
    # rows never split; the oversized row occupies its span and the next row
    # starts in a LATER shard
    order = sorted(out.values(), key=lambda r: (r.shard_seq, r.shard_pos))
    seqs = [r.shard_seq for r in order]
    assert seqs == sorted(seqs)
    big = out[2]
    after = [r for r in order if (r.shard_seq, r.shard_pos) > (big.shard_seq, big.shard_pos)]
    for r in after:
        assert r.shard_seq > big.shard_seq


def test_reserved_column_collision_raises(spark):
    # a caller column named like an output/working column must fail loudly,
    # not be silently overwritten/dropped (ADVICE r3 finding)
    docs = spark.createDataFrame(
        [(1, 100, 7)], "doc_id long, n_tokens long, writer_id int"
    )
    with pytest.raises(ValueError, match="writer_id"):
        pack_token_shards(docs, shard_tokens=4096, writers=2)
