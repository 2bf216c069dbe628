"""Two-parallelism scaling bench (sandbox protocol for the north rule's
N -> 4N executor criterion; see BASELINE.md).

Runs the identical dedup job at local[N] and local[4N] on the same input in
separate subprocesses (one JVM each), reports docs/sec at both plus
efficiency = (throughput_4N / throughput_N) / 4.

Usage: python tools/bench_scaling.py [n_docs] [N]

Docs are realistic Common-Crawl length (400-1600 tokens). The JVM heap scales
with the core count (session.py default) exactly as executor memory would on
a real cluster: comparing a 4-thread and a 16-thread run inside one
fixed-size heap measures the GC wall, not the engine. Default N=4 so that
4N=16 task threads plus their Arrow Python workers still fit the 32-vCPU
sandbox without oversubscription.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys, time, json
sys.path.insert(0, {repo!r})
from nhse_probabilistic_linkage_spark.config import DedupConfig
from nhse_probabilistic_linkage_spark.plans.pipeline import DedupPipeline
from nhse_probabilistic_linkage_spark.session import get_spark
from nhse_probabilistic_linkage_spark.sources.pages import synth_pages
cpus = {cpus}
spark = get_spark(app_name="scaling", master=f"local[{{cpus}}]", shuffle_partitions=2*cpus)
spark.sparkContext.setLogLevel("ERROR")
spark.range(10000).selectExpr("sum(id)").collect()
pages, _ = synth_pages(spark, {n_docs}, seed=42, min_tokens=400, max_tokens=1600, partitions=64)
pages = pages.select("url", "text").localCheckpoint(eager=True)
t0 = time.monotonic()
out = DedupPipeline(spark, DedupConfig()).run(pages)
n = out["clusters"].count()
el = time.monotonic() - t0
print("RESULT " + json.dumps({{"cpus": cpus, "seconds": el, "docs": {n_docs}, "docs_per_sec": {n_docs}/el, "rows": n}}))
spark.stop()
"""


def run_at(cpus: int, n_docs: int, repeats: int = 3) -> dict:
    """Best-of-N runs: the sandbox is a shared microVM whose host noise
    (CPU steal spikes) can inflate a run several-fold; the minimum wall time
    is the faithful estimate of the engine's cost at each parallelism."""
    best = None
    times = []
    for _ in range(repeats):
        code = _CHILD.format(repo=REPO, cpus=cpus, n_docs=n_docs)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
        )
        result = None
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                result = json.loads(line[len("RESULT "):])
        if result is None:
            raise RuntimeError(f"no RESULT from local[{cpus}]: {proc.stderr[-2000:]}")
        times.append(round(result["seconds"], 2))
        if best is None or result["seconds"] < best["seconds"]:
            best = result
    best["all_runs_seconds"] = times
    return best


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    lo = run_at(n, n_docs)
    hi = run_at(4 * n, n_docs)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4
    print(json.dumps({
        "protocol": f"identical job at local[{n}] and local[{4*n}], same input, best of 3 (host-noise robust)",
        "n_docs": n_docs,
        f"local[{n}]": {"seconds": round(lo["seconds"], 2), "docs_per_sec": round(lo["docs_per_sec"], 1),
                        "all_runs_seconds": lo["all_runs_seconds"]},
        f"local[{4*n}]": {"seconds": round(hi["seconds"], 2), "docs_per_sec": round(hi["docs_per_sec"], 1),
                          "all_runs_seconds": hi["all_runs_seconds"]},
        "scaling_efficiency": round(eff, 3),
    }, indent=2))


if __name__ == "__main__":
    main()
