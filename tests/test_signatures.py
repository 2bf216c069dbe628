"""MinHash/SimHash kernel tests: estimator quality (numpy-level, no Spark)
plus Spark-level determinism and collision behavior."""

import numpy as np
import pytest

from nhse_probabilistic_linkage_spark.functions.minhash import (
    MERSENNE_P,
    minhash_batch,
    perm_constants,
)
from nhse_probabilistic_linkage_spark.functions.simhash import simhash64
from nhse_probabilistic_linkage_spark.functions.minhash import with_minhash
from nhse_probabilistic_linkage_spark.functions.text import prepare_docs


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


def test_minhash_matches_bruteforce_permutation_min():
    a, b = perm_constants(8, seed=7)
    h = np.array([11, 222, 3333, 44444], dtype=np.int64)
    sig = minhash_batch(h, a, b)
    x = h.astype(np.uint64) % np.uint64(MERSENNE_P)
    expected = [min((int(xi) * int(ai) + int(bi)) % MERSENNE_P for xi in x) for ai, bi in zip(a, b)]
    assert sig.tolist() == expected


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    a, b = perm_constants(128, seed=42)
    base = rng.integers(0, 2**63, size=200, dtype=np.int64)
    for overlap in (1.0, 0.8, 0.5, 0.2):
        other = base.copy()
        n_replace = int((1 - overlap) * len(base))
        if n_replace:
            other[:n_replace] = rng.integers(0, 2**63, size=n_replace, dtype=np.int64)
        true_j = _jaccard(set(base.tolist()), set(other.tolist()))
        est = (minhash_batch(base, a, b) == minhash_batch(other, a, b)).mean()
        assert abs(est - true_j) < 0.13, (overlap, true_j, est)


def test_minhash_empty_doc_sentinel():
    a, b = perm_constants(16, seed=1)
    sig = minhash_batch(np.array([], dtype=np.int64), a, b)
    assert (sig == MERSENNE_P).all()


def test_minhash_chunked_path_consistent():
    a, b = perm_constants(32, seed=3)
    rng = np.random.default_rng(1)
    h = rng.integers(0, 2**63, size=9000, dtype=np.int64)
    full = minhash_batch(h, a, b)
    parts = np.minimum(minhash_batch(h[:5000], a, b), minhash_batch(h[5000:], a, b))
    assert (full == parts).all()


def test_simhash_properties():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 2**63, size=300, dtype=np.int64)
    assert simhash64(base) == simhash64(base.copy())
    near = base.copy()
    near[:10] = rng.integers(0, 2**63, size=10, dtype=np.int64)
    far = rng.integers(0, 2**63, size=300, dtype=np.int64)
    d_near = bin(simhash64(base) ^ simhash64(near) & (2**64 - 1)).count("1")
    d_far = bin((simhash64(base) ^ simhash64(far)) & (2**64 - 1)).count("1")
    assert d_near < d_far
    assert simhash64(np.array([], dtype=np.int64)) == 0


def test_minhash_spark_deterministic_across_partitionings(spark):
    rows = [(i, " ".join(f"tok{(i * 7 + j) % 23}" for j in range(30))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = []
    for n in (1, 5):
        d = with_minhash(prepare_docs(df.repartition(n)))
        sigs.append(sorted((r.doc_id, tuple(r.minhash)) for r in d.select("doc_id", "minhash").collect()))
    assert sigs[0] == sigs[1]
    assert all(len(s[1]) == 128 for s in sigs[0])


def test_minhash_slab_matches_per_doc_kernel():
    """The r6 batch-vectorized slab kernel (np.minimum.reduceat across doc
    boundaries) must equal the per-doc kernel exactly — incl. empty docs,
    docs larger than the slab, and slab-boundary packing."""
    import numpy as np

    from nhse_probabilistic_linkage_spark.functions.minhash import (
        MERSENNE_P,
        minhash_batch,
        minhash_slab,
        perm_constants,
    )

    rng = np.random.default_rng(3)
    a, b = perm_constants(16, 42)
    arrs = []
    for i in range(200):
        n = int(rng.integers(0, 50))
        arrs.append(rng.integers(-(2**62), 2**62, size=n, dtype=np.int64))
    arrs[7] = np.empty(0, dtype=np.int64)
    arrs[11] = rng.integers(-(2**62), 2**62, size=9000, dtype=np.int64)  # > slab
    got = minhash_slab(arrs, a, b)
    for arr, sig in zip(arrs, got):
        if arr.size == 0:
            assert (sig == MERSENNE_P).all()
        else:
            assert (sig == minhash_batch(arr, a, b)).all()
