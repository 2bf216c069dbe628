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


# ---------------------------------------------------------------------------
# Batched O(n) rolling-hash kernel (r6).
#
# The per-doc kernel above pays O(n*k) window arithmetic plus ~30 numpy
# dispatches per document (the k-long powers loop alone is k scalar ops) —
# measured 8s of q57's 12.8s at sf1.0 for 50k short docs. The batch kernel
# concatenates a group of docs and computes every k-gram hash from ONE
# prefix sum: with B odd (invertible mod 2^64), let
#   T[i] = sum_{j<i} c[j] * Binv^j        (cumsum, wraparound uint64)
# then
#   H_k[i] = (T[i+k] - T[i]) * B^(i+k-1) = sum_{j=i}^{i+k-1} c[j]*B^(i+k-1-j)
# which is EXACTLY kgram_hashes' polynomial (bit-identical — modular algebra
# is exact; pinned in tests/test_substring.py), position-invariant, so the
# global concatenated index works and per-doc slices never cross boundaries.
# The same prefix sum yields the span-gram hashes (k = min_span) used by the
# exact-prescreen in operators/substring.py for free.
# ---------------------------------------------------------------------------

_GROUP_CHARS = 1 << 22  # ~4M chars per concatenated group bounds temporaries


def _inv_pow_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(B^m, Binv^m) for m in [0, n] as uint64 cumprods."""
    base = _HASH_BASE
    binv = np.uint64(pow(int(base), -1, 1 << 64))
    with np.errstate(over="ignore"):
        bpow = np.ones(n + 1, dtype=np.uint64)
        bpow[1:] = base
        np.cumprod(bpow, out=bpow)
        bipow = np.ones(n + 1, dtype=np.uint64)
        bipow[1:] = binv
        np.cumprod(bipow, out=bipow)
    return bpow, bipow


def _group_hashes(cat: np.ndarray, ks: tuple[int, ...]) -> dict[int, np.ndarray]:
    """All k-gram hashes of the concatenated codepoint array, for each k in
    ks, from one shared prefix sum. Returns {k: H_k} with
    H_k[i] = polynomial hash of cat[i:i+k] (same values as kgram_hashes)."""
    n = cat.shape[0]
    bpow, bipow = _inv_pow_tables(n)
    with np.errstate(over="ignore"):
        t = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(cat.astype(np.uint64) * bipow[:n], out=t[1:])
        out = {}
        for k in ks:
            if n < k:
                out[k] = np.empty(0, dtype=np.uint64)
                continue
            out[k] = (t[k:] - t[:-k]) * bpow[k - 1 : n]
    return out


def winnow_batch(
    texts: list, k: int, window: int, span: int | None = None
) -> tuple[list, list]:
    """(fingerprints, span_grams) per text. fingerprints are identical to
    winnow_fingerprints(text, k, window); span_grams (when `span` is set)
    are the sorted distinct `span`-gram rolling hashes used as an exact
    necessary condition for a shared span >= `span` chars."""
    cps = [
        np.frombuffer((t if t is not None else "").encode("utf-32-le"), dtype=np.uint32)
        for t in texts
    ]
    n_docs = len(cps)
    fps: list = [None] * n_docs
    grams: list = [None] * n_docs
    empty = np.empty(0, dtype=np.int64)
    empty_i32 = np.empty(0, dtype=np.int32)
    ks = (k,) if span is None else (k, span)

    group: list[int] = []
    group_chars = 0

    def finish_doc(i: int, hk: np.ndarray, hspan: np.ndarray | None) -> None:
        fps[i] = (
            winnow_select(hk, window).astype(np.int64) if hk.size else empty
        )
        if span is not None:
            if hspan is not None and hspan.size:
                # high 32 bits only (4x smaller prescreen arrays — the
                # broadcast size was the verify stage's real cost, r6):
                # truncation is a function of the hash, so equal spans
                # still collide (zero false negatives); the ~n^2/2^32
                # extra collision pairs fall through to the exact LCS
                grams[i] = np.unique(
                    (hspan >> np.uint64(32)).astype(np.uint32)
                ).view(np.int32)
            else:
                grams[i] = empty_i32

    def flush() -> None:
        nonlocal group, group_chars
        if not group:
            return
        cat = np.concatenate([cps[i] for i in group])
        hs = _group_hashes(cat, ks)
        s = 0
        for i in group:
            sz = cps[i].size
            m = sz - k + 1
            hk = hs[k][s : s + m] if m > 0 else hs[k][:0]
            hspan = None
            if span is not None:
                msp = sz - span + 1
                hspan = hs[span][s : s + msp] if msp > 0 else hs[span][:0]
            finish_doc(i, hk, hspan)
            s += sz
        group, group_chars = [], 0

    for i in range(n_docs):
        if cps[i].size >= _GROUP_CHARS:
            # a single doc past the group budget would make _group_hashes'
            # power tables O(doc_len) — fall back to the windowed-dot
            # reference kernel (identical values: the prefix-sum method
            # replicates kgram_hashes exactly), whose temporaries are
            # chunk-bounded regardless of length
            finish_doc(
                i,
                kgram_hashes(cps[i], k),
                kgram_hashes(cps[i], span) if span is not None else None,
            )
            continue
        group.append(i)
        group_chars += cps[i].size
        if group_chars >= _GROUP_CHARS:
            flush()
    flush()
    return fps, grams


def make_winnow_udf(k: int = 16, window: int = 49):
    """pandas UDF: normalized text -> array<bigint> winnowing fingerprints.

    Guarantee threshold t = window + k - 1 characters: any pair of documents
    sharing a span of >= t normalized characters shares >= 1 fingerprint.
    """

    @pandas_udf(ArrayType(LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        fps, _ = winnow_batch(list(texts), k, window)
        return pd.Series(fps)

    return winnow


def make_winnow_span_udf(k: int, window: int, span: int):
    """pandas UDF: normalized text -> struct(fingerprints, span_grams) —
    winnowing fingerprints plus the distinct `span`-gram rolling hashes
    (exact prescreen keys: two docs can share a span of >= `span` chars
    ONLY if their span_grams overlap)."""

    @pandas_udf("struct<fingerprints: array<bigint>, span_grams: array<int>>")
    def winnow_span(texts: pd.Series) -> pd.DataFrame:
        fps, grams = winnow_batch(list(texts), k, window, span=span)
        return pd.DataFrame({"fingerprints": fps, "span_grams": grams})

    return winnow_span


def with_fingerprints(
    df: DataFrame,
    text_col: str = "norm_text",
    out_col: str = "fingerprints",
    k: int = 16,
    window: int = 49,
    span: int | None = None,
) -> DataFrame:
    """Attach winnowing fingerprints (and, when `span` is set, the
    span-gram prescreen column `span_grams`)."""
    if span is None:
        return df.withColumn(out_col, make_winnow_udf(k=k, window=window)(F.col(text_col)))
    both = make_winnow_span_udf(k, window, span)(F.col(text_col))
    return (
        df.withColumn("_w", both)
        .withColumn(out_col, F.col("_w.fingerprints"))
        .withColumn("span_grams", F.col("_w.span_grams"))
        .drop("_w")
    )
