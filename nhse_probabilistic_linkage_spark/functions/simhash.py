"""64-bit SimHash as a vectorized Arrow (pandas) UDF.

Detector #2 of the north star: each shingle hash votes on all 64 bit
positions; the signature's bit j is 1 iff more than half the shingles have
bit j set. Near-duplicates land within a small Hamming ball; candidate lookup
uses pigeonhole block tables (operators/simhash_lsh.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_BIT_RANGE = np.arange(64, dtype=np.uint64)


def simhash64(hashes: np.ndarray) -> int:
    """Signed-int64 SimHash of one document's shingle-hash array (0 for
    empty docs). Ties (exactly half the votes) resolve to bit=0."""
    if hashes.size == 0:
        return 0
    h = hashes.astype(np.uint64)
    counts = ((h[:, None] >> _BIT_RANGE[None, :]) & np.uint64(1)).sum(axis=0)
    bits = (counts * 2 > h.size).astype(np.uint64)
    packed = int((bits << _BIT_RANGE).sum(dtype=np.uint64))
    return packed - (1 << 64) if packed >= (1 << 63) else packed


def make_simhash_udf():
    @pandas_udf(LongType())
    def simhash(shingle_hashes: pd.Series) -> pd.Series:
        return pd.Series(
            [
                simhash64(np.asarray(arr if arr is not None else [], dtype=np.int64))
                for arr in shingle_hashes
            ],
            dtype="int64",
        )

    return simhash


def with_simhash(df, shingle_col: str = "shingles", out_col: str = "simhash"):
    return df.withColumn(out_col, make_simhash_udf()(shingle_col))
