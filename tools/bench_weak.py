"""Weak-scaling datapoint: the full dedup pipeline at a given corpus size
and thread count, in either engine shape.

Produces the rows of BENCH.md's "Weak scaling: throughput vs corpus size"
table (e.g. the 4M fused row: 293.6 s / 13,622 docs/s, identical clusters
to the metered row). Corpus generation is excluded from timing via an eager
localCheckpoint, mirroring tools/bench_scaling.py so numbers are comparable
across both protocols.

Usage: python tools/bench_weak.py [n_docs=4000000] [cpus=32] [shape=fused]
       (shape: fused = production, no per-stage barriers; metered = eager
        per-stage barriers + stage metrics, printed when present;
        cascade_fused / cascade_metered = the tiered exact->near->semantic
        cascade via bench.run_cascade_synth — metered reports per-tier
        seconds, fused is the production plan; kept-counts must match
        across the two shapes)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    shape = sys.argv[3] if len(sys.argv) > 3 else "fused"
    assert shape in ("fused", "metered", "cascade_fused", "cascade_metered"), shape

    from nhse_probabilistic_linkage_spark.config import DedupConfig
    from nhse_probabilistic_linkage_spark.plans.pipeline import DedupPipeline
    from nhse_probabilistic_linkage_spark.session import get_spark
    from nhse_probabilistic_linkage_spark.sources.pages import synth_pages

    spark = get_spark(
        app_name="bench_weak",
        master=f"local[{cpus}]",
        shuffle_partitions=max(4, 2 * cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).selectExpr("count(xxhash64(id))").collect()  # JVM warm

    if shape.startswith("cascade_"):
        import bench

        res = bench.run_cascade_synth(
            spark, n_docs, repeats=1,
            collect_metrics=shape == "cascade_metered",
        )
        print(json.dumps({
            "shape": shape,
            "cpus": cpus,
            "docs": n_docs,
            "seconds": round(res["seconds"], 1),
            "docs_per_sec": round(res["docs_per_sec"], 1),
            "kept": res["kept"],
            "tier_seconds": res["tier_seconds"],
            "tier_dropped": res["tier_dropped"],
        }))
        spark.stop()
        return

    pages, _ = synth_pages(
        spark, n_docs, seed=42, partitions=64, min_tokens=40, max_tokens=120
    )
    pages = pages.select("url", "text").localCheckpoint(eager=True)

    t0 = time.monotonic()
    pipe = DedupPipeline(spark, DedupConfig(), collect_metrics=(shape == "metered"))
    out = pipe.run(pages)
    n_clusters = out["canonical"].where("is_canonical").count()
    el = time.monotonic() - t0

    result = {
        "shape": shape,
        "cpus": cpus,
        "docs": n_docs,
        "seconds": round(el, 1),
        "docs_per_sec": round(n_docs / el, 1),
        "clusters": n_clusters,
    }
    if shape == "metered":
        result["stage_seconds"] = {m.stage: round(m.seconds, 2) for m in pipe.metrics}
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
