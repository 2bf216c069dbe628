"""SimHash Hamming-ball candidate lookup via pigeonhole block tables.

Detector #2. For max Hamming distance d, split the 64-bit signature into
d+1 disjoint blocks: any pair within distance d agrees exactly on at least
one block (pigeonhole). So the candidate join is a UNION of d+1 equi-self-
joins on (block_id, block_value) — the same shape as the reference's UNION
of blocking rules (/root/reference/parameters_dedupe.py:26-44), and the same
shape as the MinHash band join, so it reuses candidate_pairs' skew handling.

Verification is native: bit_count(sig_l ^ sig_r) <= d — stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash_block_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    bits: int = 64,
) -> DataFrame:
    """Explode signatures into (id, band_id, band_key) pigeonhole blocks.

    Output schema matches lsh.band_keys so candidate_pairs() is shared.
    """
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    # unsigned-shift then mask: block i = bits [i*width, (i+1)*width); the
    # last block absorbs the remainder bits. n_blocks is tiny (d+1), so the
    # array literal is built driver-side — still one codegen expression.
    def _block(i: int) -> F.Column:
        shifted = F.shiftrightunsigned(F.col(sig_col), i * width)
        if i == n_blocks - 1:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    blocks = F.array(*[F.xxhash64(F.lit(i), _block(i)) for i in range(n_blocks)])
    return df.select(F.col(id_col), F.posexplode(blocks).alias("band_id", "band_key"))


def verify_hamming(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Attach hamming distance to candidate pairs and keep <= max_hamming."""
    from nhse_probabilistic_linkage_spark.operators.verify import spread_pairs

    pairs = spread_pairs(pairs)
    slim = docs.select(F.col(id_col), F.col(sig_col))
    return (
        pairs.join(slim.select(F.col(id_col).alias("id_l"), F.col(sig_col).alias("_s_l")), "id_l")
        .join(slim.select(F.col(id_col).alias("id_r"), F.col(sig_col).alias("_s_r")), "id_r")
        .withColumn("hamming", F.bit_count(F.col("_s_l").bitwiseXOR(F.col("_s_r"))))
        .drop("_s_l", "_s_r")
        .where(F.col("hamming") <= max_hamming)
    )
