"""Phase-isolation benchmarks (guide §1.4): split the expensive headline
queries into their component eager jobs and time each with the noop sink,
so optimization targets the real cost instead of the aggregate wall.

NOT part of the driver contract — bench.py is frozen; numbers from here are
cited in OPTIMIZATION_r06.md.

Usage: python bench_extra.py [sf_dir] [what,what,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.config import DedupConfig
from nhse_probabilistic_linkage_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


class T:
    def __init__(self):
        self.phases = {}
        self._t0 = time.monotonic()

    def mark(self, name):
        t = time.monotonic()
        self.phases[name] = round(t - self._t0, 3)
        self._t0 = t


def q52_phases(spark, sf_dir):
    from nhse_probabilistic_linkage_spark.functions.minhash import with_minhash
    from nhse_probabilistic_linkage_spark.functions.text import prepare_docs
    from nhse_probabilistic_linkage_spark.operators.lsh import band_keys, candidate_pairs
    from nhse_probabilistic_linkage_spark.operators.verify import verify_pairs
    from nhse_probabilistic_linkage_spark.sources.tables import load_table

    from nhse_probabilistic_linkage_spark.sources.tables import spread_input

    cfg = DedupConfig(jaccard_threshold=0.8)
    t = T()
    df = load_table(spark, sf_dir, "documents")
    docs = prepare_docs(
        spread_input(df.select("doc_id", "text")), text_col="text", k=cfg.shingle_k
    )
    spark.sparkContext.setJobDescription("q52: prepare (noop)")
    noop(docs.select("doc_id", "shingles"))
    t.mark("prepare_noop")
    docs = with_minhash(
        docs.select("doc_id", "shingles"), num_perms=cfg.num_perms, seed=cfg.minhash_seed
    ).localCheckpoint(eager=True)
    t.mark("prepare+minhash_checkpoint")
    bands = band_keys(docs, id_col="doc_id", bands=cfg.bands, rows_per_band=cfg.rows_per_band)
    cands, dropped = candidate_pairs(
        bands, id_col="doc_id", band_cap=cfg.band_cap,
        salt_threshold=cfg.salt_threshold, salt_groups=cfg.salt_groups,
    )
    t.mark("candidate_pairs_eager")
    verified = verify_pairs(cands, docs, id_col="doc_id", threshold=cfg.jaccard_threshold)
    noop(verified.select("id_l", "id_r", F.round("jaccard", 6).alias("jaccard")))
    t.mark("verify_noop")
    return t.phases


def q51_phases(spark, sf_dir):
    from nhse_probabilistic_linkage_spark.operators.dedup import ngram_jaccard_pairs
    from nhse_probabilistic_linkage_spark.sources.tables import load_table

    t = T()
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, k=5, threshold=0.5)
    noop(pairs.select("id_l", "id_r", F.round("jaccard", 6).alias("jaccard")))
    t.mark("all")
    return t.phases


def q57_phases(spark, sf_dir):
    from nhse_probabilistic_linkage_spark.operators.dedup import substring_dedup_pairs
    from nhse_probabilistic_linkage_spark.sources.tables import load_table

    t = T()
    df = load_table(spark, sf_dir, "documents")
    pairs, _dropped = substring_dedup_pairs(df, DedupConfig())
    t.mark("construct_eager")  # winnow checkpoint + candidate_pairs
    noop(pairs.select("id_l", "id_r"))
    t.mark("verify_noop")  # span-gram prescreen + LCS on survivors
    return t.phases


def q60_phases(spark, sf_dir):
    from nhse_probabilistic_linkage_spark.operators.similarity import (
        embedding_neardup_pairs,
    )
    from nhse_probabilistic_linkage_spark.sources.tables import load_table

    t = T()
    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pairs = embedding_neardup_pairs(em, threshold=0.9, exact=False)
    t.mark("construct_eager")
    noop(pairs)
    t.mark("verify_noop")
    return t.phases


def q70_phases(spark, sf_dir):
    from nhse_probabilistic_linkage_spark.functions import textstats as TS
    from nhse_probabilistic_linkage_spark.sources.tables import load_table

    t = T()
    docs = load_table(spark, sf_dir, "documents")
    out = TS.with_textstats(docs).select(
        "doc_id", "ws_tokens", "bpe_tokens", "mean_tok_len", "alpha_ratio", "quality"
    )
    noop(out)
    t.mark("all")
    return t.phases


def pipeline_phases(spark, sf_dir, n_docs):
    from nhse_probabilistic_linkage_spark.plans.pipeline import DedupPipeline
    from nhse_probabilistic_linkage_spark.sources.pages import synth_pages

    pages, _ = synth_pages(spark, n_docs, seed=42, min_tokens=40, max_tokens=120)
    pages = pages.select("url", "text").localCheckpoint(eager=True)
    t = T()
    pipe = DedupPipeline(spark, DedupConfig())
    out = pipe.run(pages)
    t.mark("run_construct")
    n = out["canonical"].where("is_canonical").count()
    t.mark("final_count")
    ph = {m.stage: round(m.seconds, 2) for m in pipe.metrics}
    ph.update(t.phases)
    ph["n_clusters"] = n
    return ph


WHAT = {
    "q51": q51_phases,
    "q52": q52_phases,
    "q57": q57_phases,
    "q60": q60_phases,
    "q70": q70_phases,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    what = (sys.argv[2] if len(sys.argv) > 2 else "q51,q52,q57,q60,q70,pipeline").split(",")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).selectExpr("sum(id)").collect()

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or -1)
    n_docs = max(2000, int(400_000 * sf)) if sf > 0 else 40_000

    out = {}
    for rep in range(repeats):
        for w in what:
            if w == "pipeline":
                ph = pipeline_phases(spark, sf_dir, n_docs)
            else:
                ph = WHAT[w](spark, sf_dir)
            prev = out.get(w)
            if prev is None:
                out[w] = ph
            else:
                out[w] = {
                    k: min(v, prev.get(k, v)) if isinstance(v, float) else v
                    for k, v in ph.items()
                }
            spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "phases": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
