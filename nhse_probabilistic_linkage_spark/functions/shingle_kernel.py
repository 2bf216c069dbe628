"""Vectorized shingle-hash kernel: bit-exact numpy replication of the native
`windowed_shingle_hashes` expression (functions/text.py).

Why: the native formulation evaluates, per k-gram window, an array slice
allocation plus an xxhash64 over that 5-long array — measured (r6, guide
§1.4 noop isolation) at 7.6s of the 8.6s prepare stage for 400k short docs
and 24s of 26s for 20k long docs at sf1.0, against 0.7s/1.7s for the
tokenize+token-hash part. Here the whole Arrow batch's token-hash arrays are
concatenated once and every window's hash chain is computed in ~5 vectorized
uint64 passes (guide §4.2: hand whole batches to vectorized native code).

Exactness: Spark's XxHash64 over an array<bigint> folds
`h = hashLong(elem, h)` left-to-right from the seed, where hashLong is the
full (finalized) XXH64 of one 8-byte value. `xxh64_long` below reproduces
that arithmetic in wraparound uint64; tests/test_text.py pins the kernel
bit-identical to the native expression (values AND order — array_distinct's
first-occurrence order is replicated) over real and adversarial corpora.
Changing either side is a SHINGLE_HASH_VERSION bump.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SEED = np.uint64(42)  # Spark's fixed xxhash64 seed

# fold chunk: bounds the (rows,) uint64 temporaries at ~8MB per pass
_CHUNK_ROWS = 1 << 20
# concatenated-group budget (tokens): bounds the cat/H arrays at ~32MB each
_GROUP_ROWS = 1 << 22


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxh64_long(value: np.ndarray, seed) -> np.ndarray:
    """Vectorized XXH64 of a single 8-byte (long) input per row — exactly
    Spark's XxHash64Function.hashLong (seed may be scalar or per-row)."""
    with np.errstate(over="ignore"):
        h = seed + _P5 + np.uint64(8)
        k1 = _rotl(value * _P2, 31) * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
        # finalization avalanche
        h = h ^ (h >> np.uint64(33))
        h = h * _P2
        h = h ^ (h >> np.uint64(29))
        h = h * _P3
        h = h ^ (h >> np.uint64(32))
        return h


def _fold_chain(mat: np.ndarray) -> np.ndarray:
    """(rows, k) uint64 -> chained xxh64 per row, left-to-right from _SEED —
    the array<bigint> hashing order of Spark's xxhash64."""
    h: np.ndarray | np.uint64 = _SEED
    for j in range(mat.shape[1]):
        h = xxh64_long(mat[:, j], h)
    return h


def _distinct_first(h: np.ndarray) -> np.ndarray:
    """array_distinct semantics: unique values in FIRST-OCCURRENCE order."""
    _, idx = np.unique(h, return_index=True)
    idx.sort()
    return h[idx]


def shingle_hashes_batch(arrs: list, k: int) -> list:
    """Per-doc distinct windowed shingle hashes for a batch of token-hash
    arrays (int64). Pure per-row function of each doc's tokens — batch
    packing only amortizes numpy dispatch, it never changes values."""
    n_docs = len(arrs)
    out: list = [None] * n_docs
    empty = np.empty(0, dtype=np.int64)

    def run_group(big: list) -> None:
        cat = np.concatenate([arrs[i] for i in big]).view(np.uint64)
        sw = np.lib.stride_tricks.sliding_window_view(cat, k)
        n_win = sw.shape[0]
        H = np.empty(n_win, dtype=np.uint64)
        for lo in range(0, n_win, _CHUNK_ROWS):
            hi = min(lo + _CHUNK_ROWS, n_win)
            H[lo:hi] = _fold_chain(sw[lo:hi])
        Hs = H.view(np.int64)
        s = 0
        for i in big:
            sz = arrs[i].size
            # valid window starts for this doc: s .. s+sz-k (inclusive);
            # windows crossing into the next doc are simply never sliced
            out[i] = _distinct_first(Hs[s : s + sz - k + 1])
            s += sz

    # concatenated groups are bounded at ~_GROUP_ROWS tokens so an Arrow
    # batch of very long documents never materializes a multi-GB cat/H
    # pair; grouping only amortizes dispatch, values are per-doc
    group: list = []
    group_rows = 0
    for i in range(n_docs):
        if arrs[i].size < k:
            continue
        group.append(i)
        group_rows += arrs[i].size
        if group_rows >= _GROUP_ROWS:
            run_group(group)
            group, group_rows = [], 0
    if group:
        run_group(group)

    # short docs (0 < n < k): one shingle = chain over the whole array;
    # grouped by length so each group is a single vectorized fold
    by_len: dict[int, list[int]] = {}
    for i in range(n_docs):
        sz = arrs[i].size
        if sz == 0:
            out[i] = empty
        elif sz < k:
            by_len.setdefault(sz, []).append(i)
    for sz, idxs in by_len.items():
        mat = np.stack([arrs[i] for i in idxs]).view(np.uint64)
        h = np.atleast_1d(_fold_chain(mat)).view(np.int64)
        for j, i in enumerate(idxs):
            out[i] = h[j : j + 1].copy()
    return out


def make_shingle_udf(k: int = 5):
    """pandas UDF: array<bigint> token hashes -> array<bigint> distinct
    k-gram shingle hashes, bit-identical to the native
    windowed_shingle_hashes expression."""

    @pandas_udf(ArrayType(LongType()))
    def shingle(token_hashes: pd.Series) -> pd.Series:
        arrs = [
            np.asarray(v if v is not None else [], dtype=np.int64)
            for v in token_hashes
        ]
        return pd.Series(shingle_hashes_batch(arrs, k))

    return shingle
