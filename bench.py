"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set:
  - dedup_pipeline_synth: full near-dup pipeline (shingle -> minhash -> LSH ->
    verify -> CC -> canonical) over a deterministic synthetic page corpus
    sized to the scale factor (the north-star workload; docs/sec derived);
  - dedup_pipeline_documents: same over the driver's documents table;
  - representative analytics queries from __spark_entry__ (joins, windows,
    jaccard pairs, embeddings) at the sf dir.

Each query is materialized with the noop sink (full execution, no driver
collect). Scaling protocol (N vs 4N cores) lives in tools/bench_scaling.py.

Noise protocol (r4): this host's wall times swing 2-6x in hour-long
degradation windows (BENCH.md), so single samples routinely record noise as
the round's number. The recorded artifact is therefore BEST-OF-K with the
repeats INTERLEAVED (round-robin over the whole query set, K full rounds):
a noise burst lands on one round of everything rather than all samples of
one query. K = $SPARK_GRAFT_REPEATS (default 3) for the headline queries,
$SPARK_GRAFT_PIPE_REPEATS (default 3) for the pipeline/cascade blocks.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nhse_probabilistic_linkage_spark.config import DedupConfig
from nhse_probabilistic_linkage_spark.plans.pipeline import DedupPipeline
from nhse_probabilistic_linkage_spark.session import get_spark
from nhse_probabilistic_linkage_spark.sources.pages import synth_pages

SYNTH_DOCS_PER_SF = 400_000  # sf0.1 -> 40k docs


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_dedup_synth(
    spark,
    n_docs: int,
    repeats: int = 1,
    min_tokens: int = 40,
    max_tokens: int = 120,
) -> dict:
    pages, _truth = synth_pages(
        spark, n_docs, seed=42, min_tokens=min_tokens, max_tokens=max_tokens
    )
    pages = pages.select("url", "text").localCheckpoint(eager=True)  # corpus gen excluded from timing
    best = None
    for _ in range(max(1, repeats)):
        t0 = time.monotonic()
        pipe = DedupPipeline(spark, DedupConfig())
        out = pipe.run(pages)
        n_clusters = out["canonical"].where("is_canonical").count()
        elapsed = time.monotonic() - t0
        by_stage = {m.stage: m for m in pipe.metrics}
        res = {
            "seconds": elapsed,
            "docs": n_docs,
            "docs_per_sec": n_docs / elapsed,
            "clusters": n_clusters,
            "stage_seconds": {m.stage: round(m.seconds, 2) for m in pipe.metrics},
            # the lossy-gate accounting rides the artifact: whether the
            # adaptive gate fired (rows of the decision metric) and how many
            # candidate pairs it rejected before the exact verify
            "estimate_gate": by_stage["verified.estimate_gate"].rows
            if "verified.estimate_gate" in by_stage
            else None,
            "gated_pairs": by_stage["verified.gated_pairs"].rows
            if "verified.gated_pairs" in by_stage
            else 0,
        }
        if best is None or res["seconds"] < best["seconds"]:
            best = res
        spark.catalog.clearCache()
    return best


def run_cascade_synth(spark, n_docs: int, repeats: int = 1,
                      collect_metrics: bool = True) -> dict:
    """The deployment shape: tiered exact -> near -> semantic cascade
    (plans/tiers.py) over the same synthetic corpus, with per-tier wall
    seconds and drop accounting. collect_metrics=False runs the FUSED
    production plan (no per-tier barriers; tier_seconds are 0.0 by
    construction) — used by tools/bench_weak.py for the cascade
    weak-scaling rows."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from nhse_probabilistic_linkage_spark.functions.text import tokenize
    from nhse_probabilistic_linkage_spark.plans.tiers import tiered_dedup

    pages, _truth = synth_pages(spark, n_docs, seed=42)
    docs = (
        pages.select(F.xxhash64("url").alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    # deterministic stand-in embeddings: a hash-derived pseudo-random unit
    # direction per 30-token PREFIX of the doc. Docs sharing a long prefix
    # (tail-edited near-dups) get identical vectors -> semantic drops with
    # realistic selectivity; unrelated docs get independent directions ->
    # cosine far below threshold. (A byte-histogram feature would NOT work
    # here: English letter frequencies make every doc near-collinear and the
    # tier degenerates to all-pairs.)
    # 32 dims, not fewer: random 16-dim unit vectors clear cosine 0.98 by
    # chance at ~5e-5/pair (3.9 sigma), which at 40k docs is tens of
    # thousands of spurious candidates; at 32 dims the tail is ~2e-8/pair.
    # The prefix is bound as a LAMBDA VARIABLE (transform over a 1-element
    # array): a withColumn alias referenced once does NOT survive
    # CollapseProject, so the tokenize+concat was being inlined into the
    # inner lambda and re-evaluated 32x per row — measured ~23 s hiding
    # inside the semantic tier's emb2 checkpoint at 40k docs (the r3
    # artifact's "noisy" 67 s semantic wall was mostly THIS, not host noise).
    prefix = F.concat_ws(" ", F.slice(tokenize(F.col("text")), 1, 30))
    emb = docs.select(
        "doc_id",
        F.transform(
            F.array(prefix),
            lambda p: F.transform(
                F.sequence(F.lit(1), F.lit(32)),
                lambda i: (F.pmod(F.xxhash64(p, i), F.lit(2001)) - 1000).cast("double") / 1000.0,
            ),
        )[0].alias("embedding"),
        # like the page corpus, the embedding table is an INPUT in the
        # deployment shape (produced by an embedding model, read from
        # storage) — its one-time derivation sits outside the cascade wall
    ).localCheckpoint(eager=True)
    best = None
    for _ in range(max(1, repeats)):
        t0 = time.monotonic()
        out = tiered_dedup(docs, DedupConfig(), embeddings=emb, cosine_threshold=0.98,
                           collect_metrics=collect_metrics)
        n_kept = out["status"].where("tier = 'kept'").count()
        elapsed = time.monotonic() - t0
        res = {
            "seconds": elapsed,
            "docs": n_docs,
            "docs_per_sec": n_docs / elapsed,
            "kept": n_kept,
            "tier_seconds": {m.tier: round(m.seconds, 2) for m in out["metrics"]},
            "tier_dropped": {m.tier: m.n_dropped for m in out["metrics"]},
        }
        if best is None or res["seconds"] < best["seconds"]:
            best = res
        spark.catalog.clearCache()
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    synth_docs = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", max(2000, int(SYNTH_DOCS_PER_SF * sf)) if sf > 0 else 40_000))

    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + Arrow + python workers
    spark.range(10_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    headline = [
        "q01_pricing_summary",
        "q03_join3_revenue",
        "q05_nation_revenue",
        "q20_top3_orders_per_customer",
        "q21_running_user_value",
        "q51_ngram_jaccard_pairs",
        "q52_minhash_lsh_pairs",
        "q53_cc_clusters",
        "q57_substring_pairs",
        "q61_ann_topk",
        "q70_textstats",
    ]

    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    pipe_repeats = int(os.environ.get("SPARK_GRAFT_PIPE_REPEATS", "3"))

    # embedding near-dup is benched on the SCALE path (multi-table hyperplane
    # LSH + exact verify, recall/precision cross-checked by q63's oracle) —
    # NOT the O(n^2) all-pairs join that the q60 correctness oracle uses.
    # Threshold 0.9 = the near-duplicate regime this path is built for: at
    # high cosine the collision model gives selective buckets (12 planes);
    # at low thresholds (<~0.6) hyperplane LSH degenerates toward all-pairs
    # and the exact join is the right plan (q60/q63 cover that regime for
    # correctness at small scale).
    def _q60_lsh(spark, sf_dir):
        from pyspark.sql import functions as F  # noqa: PLC0415

        from nhse_probabilistic_linkage_spark.operators.similarity import (
            embedding_neardup_pairs,
        )
        from nhse_probabilistic_linkage_spark.sources.tables import load_table

        em = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        return embedding_neardup_pairs(em, threshold=0.9, exact=False)

    # interleaved best-of-K: each round runs EVERY query once, so an
    # episodic host-noise burst degrades one round of everything instead of
    # permanently inflating whichever query it happened to land on
    timings: dict[str, float] = {}
    for _rep in range(max(1, repeats)):
        for name in headline:
            t0 = time.monotonic()
            _materialize(qs[name](spark, sf_dir))
            sec = round(time.monotonic() - t0, 3)
            timings[name] = min(sec, timings.get(name, sec))
            spark.catalog.clearCache()  # queries are independent; no cross-talk
        t0 = time.monotonic()
        _materialize(_q60_lsh(spark, sf_dir))
        sec = round(time.monotonic() - t0, 3)
        timings["q60_embedding_neardup_lsh"] = min(
            sec, timings.get("q60_embedding_neardup_lsh", sec)
        )
        spark.catalog.clearCache()

    synth = run_dedup_synth(spark, synth_docs, repeats=pipe_repeats)
    timings["dedup_pipeline_synth"] = round(synth["seconds"], 3)
    spark.catalog.clearCache()

    # web-realistic long docs (~5k tokens; mean shingles/doc >= the adaptive
    # threshold) so the MinHash-estimate verify gate's behavior is IN the
    # recorded artifact: estimate_gate=1 and the gated-pair accounting.
    # Sized to ~1/20th of the doc count so token volume stays comparable.
    synth_long = run_dedup_synth(
        spark,
        max(500, synth_docs // 20),
        repeats=pipe_repeats,
        min_tokens=4500,
        max_tokens=6000,
    )
    spark.catalog.clearCache()

    # the cascade is reported as its own top-level block, NOT summed into
    # the headline total: the total's query set is held fixed across rounds
    # so round-over-round comparisons stay apples-to-apples
    cascade = run_cascade_synth(spark, synth_docs, repeats=pipe_repeats)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "repeats": {"queries": repeats, "pipelines": pipe_repeats, "record": "best"},
        "dedup_synth": {
            "docs": synth["docs"],
            "docs_per_sec": round(synth["docs_per_sec"], 1),
            "clusters": synth["clusters"],
            "stage_seconds": synth["stage_seconds"],
        },
        "dedup_synth_long": {
            "seconds": round(synth_long["seconds"], 3),
            "docs": synth_long["docs"],
            "docs_per_sec": round(synth_long["docs_per_sec"], 1),
            "clusters": synth_long["clusters"],
            "stage_seconds": synth_long["stage_seconds"],
            "estimate_gate": synth_long["estimate_gate"],
            "gated_pairs": synth_long["gated_pairs"],
        },
        "dedup_cascade": {
            "seconds": round(cascade["seconds"], 3),
            "docs": cascade["docs"],
            "docs_per_sec": round(cascade["docs_per_sec"], 1),
            "kept": cascade["kept"],
            "tier_seconds": cascade["tier_seconds"],
            "tier_dropped": cascade["tier_dropped"],
        },
        "cpus": cpus,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
