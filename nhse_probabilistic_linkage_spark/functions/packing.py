"""Token-budget shard packing for training-data export.

The last mile of a corpus pipeline: deduplicated/filtered documents (or the
chunks from functions.chunking) must land in fixed token-budget shards —
files a trainer streams sequentially — in pseudo-random order, with every
row assigned to exactly one shard and per-shard token totals bounded.

Spark-first formulation: greedy bin packing is inherently sequential, so a
single global packer would serialize the corpus through one task. Instead
rows hash-partition across `writers` independent packers (the same move a
multi-writer export makes anyway), and WITHIN each writer a running token
sum over one window pass assigns shards by start offset:

    shard_seq = floor((cumsum - n_tokens) / shard_tokens)

i.e. a row starts a new shard when its start offset crosses a budget
boundary. Per-shard totals are bounded by shard_tokens + max_row_tokens - 1
(the classic next-fit guarantee); rows larger than the budget get a shard
of their own. One shuffle (by writer), one sort, all codegen — no Python,
no driver loop; each writer's sort spills rather than OOMs. The writer
count is a CONFIG value (not the live cluster's parallelism): it shapes the
deterministic output, so it must be pinned per export — raise it for bigger
corpora the same way shard_tokens is chosen, not per cluster.

Determinism: both the writer assignment and the within-writer order are
pure functions of a stable key (xxhash64 by default, or any caller-supplied
SQL-replayable expression — see sampling.affine_bucket_expr for the oracle
pattern), so the packing is identical across runs, partitionings, and
resume/retry — the same policy as every sampler in functions.sampling.

Reference analog: the reference exports its selected training records via
rand(seed)-ordered writes (select_training_data_dedupe.py:58-65); this is
that idea made deterministic and budget-aware.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# improbable internal names + a guard: silently overwriting a caller column
# named writer_id (or dropping one named like a working column) would corrupt
# the export with no error
_ORD, _START = "__pack_ord", "__pack_start"
_OUT_COLS = ("writer_id", "shard_seq", "shard_pos", "shard_offset")


def pack_token_shards(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    shard_tokens: int = 1 << 22,
    writers: int | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    order_expr: Column | None = None,
    writer_expr: Column | None = None,
) -> DataFrame:
    """Assign every row to a fixed token-budget shard.

    Output: input columns + (writer_id, shard_seq, shard_pos, shard_offset):
      writer_id     which independent packer the row hashed to, [0, writers)
      shard_seq     the writer's shard number (0, 1, ...)
      shard_pos     1-based position of the row within its shard
      shard_offset  token offset of the row's start within the shard

    A (writer_id, shard_seq) pair names one shard file; per-shard token
    totals are <= shard_tokens + max(row tokens) - 1 (next-fit by offset: a
    row too big for the remaining budget still STARTS in the current shard;
    shards never split rows).

    `order_expr` / `writer_expr` override the pseudo-random within-writer
    order and the writer assignment (defaults: xxhash64 of the id); pass
    ANSI-SQL-replayable expressions (e.g. sampling.affine_bucket_expr) when
    the packing must be reproduced by an external SQL engine.

    `writers` defaults to a FIXED constant, not the cluster's parallelism:
    writer assignment is part of the deterministic output (shard membership,
    order, offsets), so a retry on a different-sized cluster must not
    repack differently. Set it explicitly — once, as part of the export's
    config — to scale packing parallelism with the job.
    """
    if writers is None:
        writers = 64
    clash = sorted(set(df.columns) & {*_OUT_COLS, _ORD, _START})
    if clash:
        raise ValueError(
            f"pack_token_shards: input column(s) {clash} collide with the "
            "operator's output/working columns; rename them before packing"
        )
    n_tok = F.col(tokens_col).cast("long")
    order_key = (
        order_expr if order_expr is not None else F.xxhash64(F.col(id_col), F.lit(seed))
    )
    writer_key = (
        writer_expr
        if writer_expr is not None
        else F.pmod(F.xxhash64(F.col(id_col), F.lit(seed ^ 0x517C)), F.lit(writers))
    )
    tagged = df.withColumn("writer_id", writer_key.cast("int")).withColumn(_ORD, order_key)
    # one window pass: running token sum in the writer's deterministic order
    # (id_col tiebreak makes the order total, so cumsum is reproducible)
    w = (
        Window.partitionBy("writer_id")
        .orderBy(F.col(_ORD).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tok).over(w)
    out = tagged.withColumn(_START, cum - n_tok).withColumn(
        "shard_seq", F.floor(F.col(_START) / F.lit(shard_tokens)).cast("int")
    )
    # position/offset within the shard reuse the SAME (writer) partitioning —
    # the second window adds no exchange, only a re-sort Catalyst elides
    # (identical partition + identical prefix ordering)
    ws = (
        Window.partitionBy("writer_id", "shard_seq")
        .orderBy(F.col(_ORD).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        out.withColumn("shard_pos", F.count("*").over(ws).cast("int"))
        .withColumn(
            "shard_offset", (F.col(_START) - F.col("shard_seq").cast("long") * F.lit(shard_tokens)).cast("long")
        )
        .drop(_ORD, _START)
    )
