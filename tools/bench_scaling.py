"""Two-parallelism scaling bench (sandbox protocol for the north rule's
N -> 4N executor criterion; see BASELINE.md).

Runs the identical dedup job at local[N] and local[4N] on the same input in
separate subprocesses (one JVM each), reports docs/sec at both plus
efficiency = (throughput_4N / throughput_N) / 4.

Usage: python tools/bench_scaling.py [n_docs] [N]
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
pages, _ = synth_pages(spark, {n_docs}, seed=42)
pages = pages.select("url", "text").localCheckpoint(eager=True)
t0 = time.monotonic()
out = DedupPipeline(spark, DedupConfig()).run(pages)
n = out["clusters"].count()
el = time.monotonic() - t0
print("RESULT " + json.dumps({{"cpus": cpus, "seconds": el, "docs": {n_docs}, "docs_per_sec": {n_docs}/el, "rows": n}}))
spark.stop()
"""


def run_at(cpus: int, n_docs: int) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, n_docs=n_docs)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from local[{cpus}]: {proc.stderr[-2000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo = run_at(n, n_docs)
    hi = run_at(4 * n, n_docs)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4
    print(json.dumps({
        "protocol": f"identical job at local[{n}] and local[{4*n}], same input",
        "n_docs": n_docs,
        f"local[{n}]": {"seconds": round(lo["seconds"], 2), "docs_per_sec": round(lo["docs_per_sec"], 1)},
        f"local[{4*n}]": {"seconds": round(hi["seconds"], 2), "docs_per_sec": round(hi["docs_per_sec"], 1)},
        "scaling_efficiency": round(eff, 3),
    }, indent=2))


if __name__ == "__main__":
    main()
