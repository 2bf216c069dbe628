"""Token-window chunking: split documents into fixed-size overlapping
chunks for training-data export.

The standard pretraining prep step after dedup/filter: each document becomes
ceil((n - overlap) / stride) chunks of `chunk_tokens` whitespace tokens with
`overlap` tokens shared between neighbors, each chunk tagged with its index
and token span so provenance survives into the training shards.

All native: tokenize (split/filter), window starts (sequence with step),
chunk text (array_join of slice), one generator explode. Runs inside the
corpus scan — no shuffle, no Python. The reference's analog is the history
explode (one input row -> N typed rows with positional provenance,
/root/reference/utils/dataset_ingestion_utils.py:358-404); chunking is the
same explode shape applied to token windows instead of struct arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.functions.text import tokenize


def chunk_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Output: (id_col, chunk_id, tok_start, n_tokens, chunk_text). Windows
    start every (chunk_tokens - overlap) tokens; the final window is the
    ragged tail, which always contributes at least one token NOT covered by
    the previous chunk (no fully-redundant tail). Empty documents produce
    no rows — the same
    null-discipline as explode (not explode_outer), because a chunk with no
    text has nothing to train on.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be in [0, chunk_tokens ({chunk_tokens}))")
    stride = chunk_tokens - overlap
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # 0-based window starts: 0, stride, 2*stride, ...; the last start must
    # be < n - overlap (inclusive bound max(n - overlap - 1, 0)) — a start
    # inside the final overlap region would emit a tail chunk whose tokens
    # are entirely contained in the previous chunk (pure duplication in a
    # training export). Exactly ceil((n - overlap) / stride) chunks result.
    starts = F.when(
        n > 0, F.sequence(F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(F.col(id_col), toks.alias("_toks"), starts.alias("_starts"))
        .select(id_col, "_toks", F.posexplode("_starts").alias("chunk_id", "tok_start"))
        .select(
            id_col,
            "chunk_id",
            "tok_start",
            F.slice("_toks", F.col("tok_start") + 1, chunk_tokens).alias("_chunk_toks"),
        )
        .select(
            id_col,
            "chunk_id",
            "tok_start",
            F.size("_chunk_toks").alias("n_tokens"),
            F.array_join("_chunk_toks", " ").alias("chunk_text"),
        )
    )
