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


_SLAB_ROWS = 8192


def minhash_slab(arrs: list, a: np.ndarray, b: np.ndarray) -> list:
    """Signatures for a whole batch of documents, vectorized ACROSS docs.

    The per-doc formulation (minhash_batch called in a Python loop) pays
    ~10 numpy-dispatch overheads per document — at 400k short docs that
    overhead dominates the actual arithmetic (r6 measurement: signatures
    stage 3.3s at sf1.0, mostly dispatch). Here consecutive docs are packed
    into ~_SLAB_ROWS-row slabs, each slab does ONE (rows x num_perms)
    multiply-mod, and per-doc column-minima come from np.minimum.reduceat
    over the doc-boundary offsets. Identical values to minhash_batch by
    construction (same (x*a+b) % p rows, same per-doc min; pinned in
    tests/test_signatures.py). Oversized docs fall back to the chunked
    per-doc kernel so the temporary stays bounded; empty docs get the all-p
    sentinel."""
    n = len(arrs)
    out: list = [None] * n
    sentinel = np.full(a.shape[0], MERSENNE_P, dtype=np.int64)
    group: list[int] = []
    group_rows = 0

    def flush() -> None:
        nonlocal group, group_rows
        if not group:
            return
        x = np.concatenate([arrs[j] for j in group])
        x = (x.astype(np.uint64) % np.uint64(MERSENNE_P)).astype(np.int64)
        part = (x[:, None] * a[None, :] + b[None, :]) % MERSENNE_P
        starts = np.zeros(len(group), dtype=np.int64)
        np.cumsum([arrs[j].size for j in group[:-1]], out=starts[1:])
        mins = np.minimum.reduceat(part, starts, axis=0)
        for k, j in enumerate(group):
            out[j] = mins[k]
        group, group_rows = [], 0

    for i in range(n):
        sz = arrs[i].size
        if sz == 0:
            out[i] = sentinel
        elif sz > _SLAB_ROWS:
            out[i] = minhash_batch(arrs[i], a, b)
        else:
            group.append(i)
            group_rows += sz
            if group_rows >= _SLAB_ROWS:
                flush()
    flush()
    return out


def make_minhash_udf(num_perms: int = 128, seed: int = 42):
    """Returns a pandas UDF: array<bigint> shingle hashes -> array<bigint>
    signature of length num_perms."""
    a, b = perm_constants(num_perms, seed)

    @pandas_udf(ArrayType(LongType()))
    def minhash(shingle_hashes: pd.Series) -> pd.Series:
        arrs = [
            np.asarray(arr if arr is not None else [], dtype=np.int64)
            for arr in shingle_hashes
        ]
        return pd.Series(minhash_slab(arrs, a, b))

    return minhash


def with_minhash(df, shingle_col: str = "shingles", out_col: str = "minhash",
                 num_perms: int = 128, seed: int = 42):
    udf = make_minhash_udf(num_perms=num_perms, seed=seed)
    return df.withColumn(out_col, udf(shingle_col))
