"""128-perm MinHash signatures as a vectorized Arrow (pandas) UDF.

Replaces the reference's phonetic-encoding blocking keys (soundex /
double-metaphone scalar UDFs, /root/reference/utils/preprocessing_utils.py:
211-260) with signature-based keys; the kernel is numpy over Arrow batches —
no per-row Python, per the input hint.

Math: universal hashing h_i(x) = (a_i * x + b_i) mod p with p = 2^31 - 1
(Mersenne). Input shingle hashes are 64-bit xxhash64 values reduced mod p
first so products fit in int64 (a,x < 2^31 => a*x + b < 2^62). Permutation
constants derive from a fixed seed so signatures are stable across runs and
partition counts — required for the two-parallelism scaling bench.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

MERSENNE_P = (1 << 31) - 1


def perm_constants(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_perms, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_perms, dtype=np.int64)
    return a, b


def minhash_batch(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Signature of one document's shingle-hash array. Empty docs get the
    all-p sentinel signature (never collides with a real band)."""
    if hashes.size == 0:
        return np.full(a.shape[0], MERSENNE_P, dtype=np.int64)
    x = (hashes.astype(np.uint64) % np.uint64(MERSENNE_P)).astype(np.int64)
    # (n_shingles, num_perms) -> column-min. Chunk very large shingle sets to
    # bound the temporary at ~8MB.
    if x.size > 8192:
        sig = np.full(a.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
        for lo in range(0, x.size, 8192):
            part = (x[lo : lo + 8192, None] * a[None, :] + b[None, :]) % MERSENNE_P
            np.minimum(sig, part.min(axis=0), out=sig)
        return sig
    return ((x[:, None] * a[None, :] + b[None, :]) % MERSENNE_P).min(axis=0)


def make_minhash_udf(num_perms: int = 128, seed: int = 42):
    """Returns a pandas UDF: array<bigint> shingle hashes -> array<bigint>
    signature of length num_perms."""
    a, b = perm_constants(num_perms, seed)

    @pandas_udf(ArrayType(LongType()))
    def minhash(shingle_hashes: pd.Series) -> pd.Series:
        out = [
            minhash_batch(
                np.asarray(arr if arr is not None else [], dtype=np.int64), a, b
            )
            for arr in shingle_hashes
        ]
        return pd.Series(out)

    return minhash


def with_minhash(df, shingle_col: str = "shingles", out_col: str = "minhash",
                 num_perms: int = 128, seed: int = 42):
    udf = make_minhash_udf(num_perms=num_perms, seed=seed)
    return df.withColumn(out_col, udf(shingle_col))
