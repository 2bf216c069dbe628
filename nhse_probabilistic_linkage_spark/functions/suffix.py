"""Suffix-array longest-common-substring kernel (numpy, per candidate pair).

The exact-verification half of detector #3: given a candidate pair that
shares a winnowing fingerprint, compute the exact length of the longest
character span the two normalized texts share. Algorithm: build a suffix
array of `a + SEP + b` by vectorized prefix doubling (O(n log n), all numpy),
compute adjacent-suffix LCPs with Kasai's algorithm, and take the maximum
LCP between two suffixes that start on opposite sides of the separator.

Reference analog: the pairwise scoring stage — Splink's comparison levels
evaluated per blocked pair (/root/reference/utils/parameter_lists.py) — here
the "score" is an exact span length instead of a probabilistic match weight.

Per-pair cost is O((|a|+|b|) log) with numpy vectorization; pairs are
independent so Spark parallelizes across them. For 100TB-scale inputs the
candidate stage has already reduced the workload to pairs that provably
share a fingerprint, and texts can be length-capped upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def suffix_array_with_levels(s: np.ndarray) -> tuple[np.ndarray, list]:
    """Suffix array via prefix doubling (numpy-vectorized), plus the rank
    snapshot of every doubling level: levels = [(k, rank_k), ...] where
    rank_k[i] == rank_k[j] iff suffixes i and j share their first k
    characters (truncation-aware via the -1 sentinel). The snapshots turn
    LCP queries into log(n) vectorized passes (see lcp_of_pairs) — no
    scalar Python loop anywhere in the kernel."""
    n = s.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64), []
    # initial ranks from single characters
    _, rank = np.unique(s, return_inverse=True)
    rank = rank.astype(np.int64)
    levels = [(1, rank.astype(np.int32))]
    k = 1
    order = np.arange(n, dtype=np.int64)
    while True:
        # sort by (rank[i], rank[i+k]); -1 = past the end (sorts first)
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        # new ranks: increment where the (rank, key2) tuple changed
        r_ord, k_ord = rank[order], key2[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (r_ord[1:] != r_ord[:-1]) | (k_ord[1:] != k_ord[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed)
        rank = new_rank
        k *= 2
        levels.append((k, rank.astype(np.int32)))
        if rank[order[-1]] == n - 1 or k >= n:
            return order, levels


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array via prefix doubling (numpy-vectorized)."""
    return suffix_array_with_levels(s)[0]


def lcp_of_pairs(levels: list, i: np.ndarray, j: np.ndarray, n: int) -> np.ndarray:
    """Vectorized LCP of arbitrary suffix pairs (i[k], j[k]) from the
    doubling-rank snapshots: walk the levels largest-first, consuming a step
    of size k wherever the two suffixes' length-k prefixes agree. Any lcp
    value is a sum of distinct available powers of two, and the steps are
    length-guarded so truncated suffix ranks never overcount. O(log n)
    numpy passes over the pair arrays — replaces the per-pair scalar Kasai
    walk that stalled a task on pathological long texts."""
    i = i.astype(np.int64).copy()
    j = j.astype(np.int64).copy()
    h = np.zeros(i.shape[0], dtype=np.int64)
    for k, rank in reversed(levels):
        ok = (i + k <= n) & (j + k <= n)
        ii = np.minimum(i, n - 1)
        jj = np.minimum(j, n - 1)
        step = (ok & (rank[ii] == rank[jj])).astype(np.int64) * k
        h += step
        i += step
        j += step
    return h


def kasai_lcp(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array: lcp[i] = common-prefix length of suffixes sa[i-1], sa[i].
    Kasai's O(n) algorithm. Scalar Python loop — kept as the independent
    oracle for the vectorized lcp_of_pairs in tests; the production kernel
    (longest_common_substring) no longer calls it.
    """
    n = s.shape[0]
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    inv = np.empty(n, dtype=np.int64)
    inv[sa] = np.arange(n, dtype=np.int64)
    sl = s.tolist()
    sal = sa.tolist()
    invl = inv.tolist()
    h = 0
    for i in range(n):
        r = invl[i]
        if r > 0:
            j = sal[r - 1]
            while i + h < n and j + h < n and sl[i + h] == sl[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: str, b: str) -> int:
    """Exact longest common substring length of two strings.

    Max LCP over suffix-array-adjacent suffixes that start on opposite sides
    of the separator (the classic reduction); the LCPs come from the
    vectorized doubling-rank walk, computed only for the cross-boundary
    adjacent pairs."""
    if not a or not b:
        return 0
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    # separator below any valid codepoint so it never extends a match
    sep = np.array([-1], dtype=np.int64)
    s = np.concatenate([ca, sep, cb])
    sa, levels = suffix_array_with_levels(s)
    na = ca.shape[0]
    from_a = sa < na  # suffixes starting in a (separator suffix counts as b-side)
    cross = from_a[1:] != from_a[:-1]
    if not cross.any():
        return 0
    lcp = lcp_of_pairs(levels, sa[:-1][cross], sa[1:][cross], s.shape[0])
    return int(lcp.max())


def make_lcs_udf():
    """pandas UDF: (text_l, text_r) -> exact longest-common-substring length."""

    @pandas_udf(LongType())
    def lcs_len(left: pd.Series, right: pd.Series) -> pd.Series:
        return pd.Series(
            [
                longest_common_substring(l if l is not None else "", r if r is not None else "")
                for l, r in zip(left, right)
            ],
            dtype="int64",
        )

    return lcs_len
