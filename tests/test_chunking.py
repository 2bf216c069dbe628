"""Token-window chunking for training-data export."""

import pytest
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.functions.chunking import chunk_docs


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(100))),  # 100 tokens
        (2, "only three tokens"),  # shorter than one chunk
        (3, ""),  # empty -> no chunks
        (4, " ".join(f"t{i}" for i in range(10))),  # exactly one stride + tail
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_overlap(spark, docs):
    out = chunk_docs(docs, chunk_tokens=8, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["chunk_id"])

    # doc 1: 100 tokens, stride 6 -> starts 0,6,...,96 = 17 chunks
    d1 = by_doc[1]
    assert len(d1) == 17
    assert [r["tok_start"] for r in d1] == list(range(0, 100, 6))
    assert all(r["n_tokens"] == 8 for r in d1[:-1])
    assert d1[-1]["n_tokens"] == 4  # ragged tail: tokens 96..99
    # neighbor overlap: last 2 tokens of chunk i == first 2 of chunk i+1
    t0, t1 = d1[0]["chunk_text"].split(" "), d1[1]["chunk_text"].split(" ")
    assert t0[-2:] == t1[:2]
    # full coverage: union of chunk tokens (dedup) reconstructs the doc
    seen = []
    for r in d1:
        toks = r["chunk_text"].split(" ")
        seen.extend(toks[2:] if r["chunk_id"] > 0 else toks)
    assert seen == [f"w{i}" for i in range(100)]

    # doc 2: 3 tokens -> one short chunk
    assert len(by_doc[2]) == 1
    assert by_doc[2][0]["n_tokens"] == 3
    assert by_doc[2][0]["chunk_text"] == "only three tokens"

    # doc 3: empty -> absent
    assert 3 not in by_doc

    # doc 4: 10 tokens, stride 6 -> starts 0, 6
    assert [r["n_tokens"] for r in by_doc[4]] == [8, 4]


def test_chunk_zero_overlap_partitions_exactly(spark, docs):
    out = chunk_docs(docs.where("doc_id = 1"), chunk_tokens=10, overlap=0).collect()
    out.sort(key=lambda r: r["chunk_id"])
    assert len(out) == 10
    assert all(r["n_tokens"] == 10 for r in out)
    joined = " ".join(r["chunk_text"] for r in out)
    assert joined == " ".join(f"w{i}" for i in range(100))


def test_chunk_no_redundant_tail(spark):
    # 13 tokens, chunk 8, overlap 2 (stride 6): a start at 12 would emit a
    # 1-token chunk fully contained in the previous chunk (tokens 7-13) —
    # the start sequence must stop before n - overlap
    df = spark.createDataFrame([(1, " ".join(f"w{i}" for i in range(13)))], "doc_id long, text string")
    out = sorted(chunk_docs(df, chunk_tokens=8, overlap=2).collect(), key=lambda r: r["chunk_id"])
    assert [r["tok_start"] for r in out] == [0, 6]  # ceil((13-2)/6) == 2 chunks
    assert out[-1]["n_tokens"] == 7  # tokens 6..12 — ends at the doc end
    # every chunk contributes at least one token beyond the previous chunk
    prev_end = 0
    for r in out:
        assert r["tok_start"] + r["n_tokens"] > prev_end
        prev_end = r["tok_start"] + r["n_tokens"]


def test_chunk_rejects_bad_overlap(spark, docs):
    with pytest.raises(ValueError):
        chunk_docs(docs, chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_docs(docs, chunk_tokens=8, overlap=-1)


def test_chunk_plan_is_scan_side(spark, docs):
    # no shuffle: chunking must run inside the corpus scan
    plan = chunk_docs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
