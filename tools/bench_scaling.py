"""Two-parallelism scaling bench (sandbox protocol for the north rule's
N -> 4N executor criterion; see BASELINE.md / BENCH.md).

Runs the identical dedup job at local[N] and local[4N] on the same input in
separate subprocesses (one JVM each) and reports docs/sec at both plus
efficiency = (throughput_4N / throughput_N) / 4.

Protocol notes (measured, see BENCH.md for the full ladder):
- Default N=1 -> 4N=4: the sandbox is ONE 32-vCPU host, so thread-mode
  parallelism shares a single memory subsystem; beyond ~8 task threads the
  wide-row shuffle stages saturate memory bandwidth (a resource a real 4N-
  executor cluster scales along with cores). N=1->4 measures the engine, not
  the host ceiling.
- Equal heap per run (16g) — conservative: the 4N side gets 4x LESS memory
  per core than a real cluster would grant it.
- Best-of-K (default 3): the host shows episodic CPU-steal spikes that
  inflate identical runs several-fold; min wall time is the faithful cost.
- Corpus: 240k docs default — large enough that the ~8s of serial stage
  barriers (checkpoint/count/manifest) amortize.

Usage: python tools/bench_scaling.py [n_docs] [N] [repeats]
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
spark = get_spark(app_name="scaling", master=f"local[{{cpus}}]", shuffle_partitions=max(4, 2*cpus))
spark.sparkContext.setLogLevel("ERROR")
spark.range(10000).selectExpr("count(xxhash64(id))").collect()
pages, _ = synth_pages(spark, {n_docs}, seed=42, partitions=64, min_tokens={min_tokens}, max_tokens={max_tokens})
pages = pages.select("url", "text").localCheckpoint(eager=True)
t0 = time.monotonic()
out = DedupPipeline(spark, DedupConfig(), collect_metrics={metered!r} == "metered").run(pages)
# canonical is the final stage; counting it materializes the whole chain in
# BOTH modes (in fused mode nothing upstream was eagerly forced)
n = out["canonical"].count()
el = time.monotonic() - t0
print("RESULT " + json.dumps({{"cpus": cpus, "seconds": el, "docs": {n_docs}, "docs_per_sec": {n_docs}/el, "rows": n}}))
spark.stop()
"""


def run_once(cpus: int, n_docs: int, min_tokens: int, max_tokens: int,
             mode: str = "metered") -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEMORY="16g")  # equal heap per run
    code = _CHILD.format(repo=REPO, cpus=cpus, n_docs=n_docs,
                         min_tokens=min_tokens, max_tokens=max_tokens, metered=mode)
    # Hang guard only, NOT part of the measurement protocol: sized so that
    # even a host-degraded run (documented 2-6x swings) finishes — 1800s was
    # fine up to 1.92M docs but a bad serial run at 3.84M+ would blow it and
    # lose the whole interleaved window.
    cap = max(1800, int(n_docs / 500))
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=cap, env=env
    )
    result = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    if result is None:
        raise RuntimeError(f"no RESULT from local[{cpus}]: {proc.stderr[-2000:]}")
    return result


def run_pair(n: int, n_docs: int, repeats: int, min_tokens: int, max_tokens: int,
             mode: str = "metered"):
    """INTERLEAVED best-of-N: host noise arrives in episodic windows, so the
    two parallelism levels alternate run-for-run (A,B,A,B,...) — a noise
    burst then lands on both sides instead of one. Best (min) wall per side
    is the faithful cost estimate."""
    lo = {"all_runs_seconds": []}
    hi = {"all_runs_seconds": []}
    for rep in range(repeats):
        for cpus, slot in ((n, lo), (4 * n, hi)):
            r = run_once(cpus, n_docs, min_tokens, max_tokens, mode=mode)
            slot["all_runs_seconds"].append(round(r["seconds"], 2))
            if "seconds" not in slot or r["seconds"] < slot["seconds"]:
                slot.update({k: v for k, v in r.items()})
            # Incremental recording: long windows (3.84M+ docs) outlive
            # sandbox restarts; a per-run line means any completed run
            # survives a crash instead of vanishing with the window. Emitted
            # on STDERR so stdout stays a clean one-JSON-document channel
            # (json.loads/jq-safe), and self-describing (n_docs + mode) so a
            # crash-recovered line is interpretable without the invocation
            # args (r5 ADVICE).
            print("RUN " + json.dumps({"rep": rep, "cpus": cpus,
                                       "n_docs": n_docs, "mode": mode,
                                       "seconds": round(r["seconds"], 2),
                                       "docs_per_sec": round(r["docs_per_sec"], 1)}),
                  file=sys.stderr, flush=True)
    return lo, hi


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    min_tokens = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    max_tokens = int(sys.argv[5]) if len(sys.argv) > 5 else 120
    # "metered" = evaluation shape (eager per-stage barriers + count/lineage
    # jobs; comparable with all pre-round-4 windows); "fused" = production
    # shape (DedupPipeline collect_metrics=False: lazy stage cuts, no per-
    # stage scans — the shape a 100 TB deployment runs, test-pinned to
    # identical output). Windows must be compared within one mode.
    mode = sys.argv[6] if len(sys.argv) > 6 else "metered"
    assert mode in ("metered", "fused"), mode
    lo, hi = run_pair(n, n_docs, repeats, min_tokens, max_tokens, mode=mode)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4
    print(json.dumps({
        "protocol": (
            f"identical job at local[{n}] and local[{4*n}], same input, equal 16g heap, "
            f"interleaved best of {repeats} (host-noise robust), {mode} pipeline shape"
        ),
        "n_docs": n_docs,
        "tokens_per_doc": [min_tokens, max_tokens],
        f"local[{n}]": {"seconds": round(lo["seconds"], 2), "docs_per_sec": round(lo["docs_per_sec"], 1),
                        "all_runs_seconds": lo["all_runs_seconds"]},
        f"local[{4*n}]": {"seconds": round(hi["seconds"], 2), "docs_per_sec": round(hi["docs_per_sec"], 1),
                          "all_runs_seconds": hi["all_runs_seconds"]},
        "scaling_efficiency": round(eff, 3),
    }, indent=2))


if __name__ == "__main__":
    main()
