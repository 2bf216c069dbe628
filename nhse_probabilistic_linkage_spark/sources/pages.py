"""Deterministic synthetic Common-Crawl-style page corpus.

Input contract (BASELINE.json input_hint): table of
(url string, warc_ts timestamp, html binary, text string, lang string).

Generation is distributed via mapInPandas over spark.range(n) and — the
load-bearing property — **seeded per doc id**, so the corpus is byte-identical
for any partition count or executor layout (required by the two-parallelism
scaling bench, and the per-row invariant test). Reference precedent for
seeded determinism: F.rand(seed=42) bucketing,
/root/reference/notebooks_dedupe/select_training_data_dedupe.py:58-65.

Cluster planting: consecutive ids form blocks of BLOCK docs. A block-seeded
rng picks k in [1, BLOCK]; the first k docs of the block are edit-mutated
copies of the block template (ground-truth cluster = block's first id), the
rest are singletons with their own text. Mutation = token substitutions /
deletions / insertions at a per-doc rate drawn from [0, max_mutation].
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
TRUTH_SCHEMA = "url string, doc_seq long, cluster_id long"

_VOCAB = np.array(
    (
        "the quick brown fox jumps over lazy dog spark shuffle partition join scan "
        "filter window merge sort hash table query plan data batch stream row column "
        "key value small large fast slow index cache memory disk network node cluster "
        "page crawl web text token shingle signature band bucket verify exact near "
        "duplicate content extract parse render script style header footer nav body"
    ).split()
)
_LANGS = np.array(["en", "en", "en", "de", "fr", "es", "zh"])
_BASE_TS = np.datetime64("2025-01-01T00:00:00")


def _rng(*keys: int) -> np.random.Generator:
    """Stable rng from a tuple of integer keys (independent of numpy's global
    state and of Spark partitioning)."""
    h = hashlib.sha256(("|".join(str(k) for k in keys)).encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


def _template_tokens(seed: int, block: int, min_tokens: int, max_tokens: int) -> np.ndarray:
    rng = _rng(seed, block, 0)
    n = int(rng.integers(min_tokens, max_tokens))
    return _VOCAB[rng.integers(0, len(_VOCAB), size=n)]


def _mutate(tokens: np.ndarray, rng: np.random.Generator, rate: float) -> np.ndarray:
    toks = list(tokens)
    n_edits = int(np.ceil(rate * len(toks))) if rate > 0 else 0
    for _ in range(n_edits):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, len(toks)))
        word = str(_VOCAB[rng.integers(0, len(_VOCAB))])
        if op == 0:
            toks[pos] = word
        elif op == 1 and len(toks) > 10:
            del toks[pos]
        else:
            toks.insert(pos, word)
    return np.array(toks)


def _gen_one(i: int, seed: int, block_size: int, dup_blocks_frac: float, max_mutation: float,
             min_tokens: int, max_tokens: int):
    block, offset = divmod(i, block_size)
    brng = _rng(seed, block, 1)
    is_dup_block = brng.random() < dup_blocks_frac
    k = int(brng.integers(2, block_size + 1)) if is_dup_block else 1
    drng = _rng(seed, i, 2)
    if offset < k:
        base = _template_tokens(seed, block, min_tokens, max_tokens)
        rate = 0.0 if offset == 0 else float(drng.uniform(0.005, max_mutation))
        toks = _mutate(base, drng, rate)
        cluster = block * block_size
    else:
        toks = _template_tokens(seed, i + (1 << 40), min_tokens, max_tokens)  # unique singleton text
        cluster = i
    text = " ".join(toks.tolist())
    url = f"https://synth.example.com/{seed}/{i:012d}"
    ts = _BASE_TS + np.timedelta64(i % 86_400_000, "s")
    lang = str(_LANGS[int(_rng(seed, i, 3).integers(0, len(_LANGS)))])
    html = (f"<html><head><title>doc {i}</title></head><body><p>{text}</p></body></html>").encode()
    return url, pd.Timestamp(ts), html, text, lang, i, cluster


def synth_pages(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    block_size: int = 8,
    dup_blocks_frac: float = 0.3,
    max_mutation: float = 0.05,
    partitions: int | None = None,
    min_tokens: int = 40,
    max_tokens: int = 120,
) -> tuple[DataFrame, DataFrame]:
    """Returns (pages, truth). pages has the input_hint schema; truth maps
    url -> planted cluster_id (block-template id for planted dups, own seq
    for singletons)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _gen_one(int(i), seed, block_size, dup_blocks_frac, max_mutation,
                         min_tokens, max_tokens)
                for i in pdf["id"]
            ]
            out = pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "text", "lang", "doc_seq", "cluster_id"],
            )
            yield out

    rng_df = spark.range(n_docs, numPartitions=partitions)
    full = rng_df.mapInPandas(
        gen,
        schema=PAGES_SCHEMA + ", doc_seq long, cluster_id long",
    )
    pages = full.select("url", "warc_ts", "html", "text", "lang")
    truth = full.select("url", "doc_seq", "cluster_id")
    return pages, truth


def extract_text(pages: DataFrame) -> DataFrame:
    """Deterministic html -> text extraction.

    The synthetic corpus carries ground-truth `text`; for html-only inputs
    this strips tags with native regexp ops (pure Catalyst, byte-stable).
    Real-world extractors (trafilatura etc.) are not in this sandbox; the
    contract — a pure deterministic function of html bytes, byte-identical
    per url across runs — is what the per-row invariant test pins.
    """
    from pyspark.sql import functions as F

    raw = F.col("html").cast("string")
    no_head = F.regexp_replace(raw, r"(?is)<head[^>]*>.*?</head>", " ")
    no_script = F.regexp_replace(no_head, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    no_tags = F.regexp_replace(no_script, r"(?s)<[^>]+>", " ")
    cleaned = F.trim(F.regexp_replace(no_tags, r"\s+", " "))
    return pages.withColumn("extracted_text", cleaned)
