"""Winnowing fingerprints for substring-duplicate candidate generation.

Detector #3 of the north star (the "suffix-array substring-duplicate pass
for long shared spans") needs candidate pairs that share a long character
span. Fixed-stride window hashing cannot find them (the two documents'
strides are not aligned); content-defined selection can. This module
implements the winnowing scheme of Schleimer, Wilkerson & Aiken (SIGMOD
2003): hash every k-gram of the text, then in every window of W consecutive
k-gram hashes select the rightmost minimum.

Published guarantee (Winnowing paper, §4): any common substring of length
>= t = W + k - 1 produces at least one common selected fingerprint in both
documents. So the candidate join on fingerprint hashes has recall 1.0 for
spans >= min_span when W = min_span - k + 1 — a *deterministic* blocking
rule, unlike the MinHash bands (reference analog: the 17 hand-tuned
equi-join blocking rules, /root/reference/parameters_dedupe.py:26-44, which
are likewise deterministic-recall by construction).

All kernels are numpy over Arrow batches (no per-row Python in the hot
loop); rolling k-gram hashes use uint64 wraparound polynomial hashing and
the window argmin is chunked so the temporary stays ~4MB regardless of
document length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# Polynomial rolling-hash base (odd, large; uint64 wraparound is the modulus).
_HASH_BASE = np.uint64(0x9E3779B97F4A7C15)
_ARGMIN_CHUNK = 8192


def kgram_hashes(codepoints: np.ndarray, k: int) -> np.ndarray:
    """uint64 polynomial hashes of every k-gram: h[i] = sum c[i+j]*B^(k-1-j).

    Wraparound arithmetic in uint64 is the (deterministic) modulus. Returns
    an empty array when the text is shorter than k.
    """
    n = codepoints.shape[0]
    if n < k:
        return np.empty(0, dtype=np.uint64)
    c = codepoints.astype(np.uint64)
    powers = np.empty(k, dtype=np.uint64)
    p, base, mask = 1, int(_HASH_BASE), (1 << 64) - 1
    for j in range(k - 1, -1, -1):
        powers[j] = p
        p = (p * base) & mask
    # chunked (chunk x k) multiply-sum keeps the temporary ~1MB regardless of n
    out = np.empty(n - k + 1, dtype=np.uint64)
    sw = np.lib.stride_tricks.sliding_window_view(c, k)
    for lo in range(0, n - k + 1, _ARGMIN_CHUNK):
        hi = min(lo + _ARGMIN_CHUNK, n - k + 1)
        out[lo:hi] = (sw[lo:hi] * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def winnow_select(hashes: np.ndarray, window: int) -> np.ndarray:
    """Selected fingerprint values: rightmost-minimum of every length-`window`
    window of k-gram hashes (deduplicated). Texts with fewer than `window`
    k-grams contribute their single global minimum so short docs still
    participate."""
    m = hashes.shape[0]
    if m == 0:
        return hashes
    if m < window:
        return np.array([hashes.min()], dtype=np.uint64)
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    n_win = sw.shape[0]
    positions = np.empty(n_win, dtype=np.int64)
    for lo in range(0, n_win, _ARGMIN_CHUNK):
        hi = min(lo + _ARGMIN_CHUNK, n_win)
        block = sw[lo:hi]
        # rightmost argmin = (window-1) - argmin of the reversed row
        am = (window - 1) - np.argmin(block[:, ::-1], axis=1)
        positions[lo:hi] = np.arange(lo, hi) + am
    return hashes[np.unique(positions)]


def winnow_fingerprints(text: str, k: int, window: int) -> np.ndarray:
    """Winnowing fingerprints of one text as int64 (sign-cast of uint64)."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    return winnow_select(kgram_hashes(cps, k), window).astype(np.int64)


def make_winnow_udf(k: int = 16, window: int = 49):
    """pandas UDF: normalized text -> array<bigint> winnowing fingerprints.

    Guarantee threshold t = window + k - 1 characters: any pair of documents
    sharing a span of >= t normalized characters shares >= 1 fingerprint.
    """

    @pandas_udf(ArrayType(LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [winnow_fingerprints(t if t is not None else "", k, window) for t in texts]
        )

    return winnow


def with_fingerprints(
    df: DataFrame,
    text_col: str = "norm_text",
    out_col: str = "fingerprints",
    k: int = 16,
    window: int = 49,
) -> DataFrame:
    return df.withColumn(out_col, make_winnow_udf(k=k, window=window)(F.col(text_col)))
