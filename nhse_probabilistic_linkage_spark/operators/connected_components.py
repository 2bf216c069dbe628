"""Distributed connected components: alternating large-star / small-star.

Replaces the reference's driver-side BFS over a collect()ed edge list
(`find_connected_ids`, /root/reference/utils/dataset_ingestion_utils.py:
487-540 — O(all edges) in driver memory) with the Kiveris et al.
"Connected Components in MapReduce and Beyond" algorithm expressed purely as
DataFrame ops, so it scales to 10^12-node graphs:

  large-star: every node connects its LARGER neighbors to the minimum of its
              closed neighborhood;
  small-star: every node connects its SMALLER-or-equal neighbors (and itself)
              to the minimum of those.

Alternating the two converges in O(log^2 n) rounds to a forest of stars
centered at each component's minimum id. Each round is two shuffles
(groupBy min + join); lineage is cut per round with an eager
localCheckpoint() — the reference's `break_lineage_method` lesson
(predict_dedupe.py:63-69) applied to an iterative loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Orient big->small, drop self-loops, dedup."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    nbrs = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (
        nbrs.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", F.col("src")).alias("mn"))
    )
    return (
        nbrs.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    e = _canonical(edges)
    mins = e.groupBy("src").agg(F.min("dst").alias("mn"))
    joined = e.join(mins, "src")
    out = joined.select(F.col("dst").alias("u"), F.col("mn")).union(
        mins.select(F.col("src").alias("u"), F.col("mn"))
    )
    return (
        out.where(F.col("u") != F.col("mn"))
        .select(F.col("u").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _local_finish(edges: DataFrame) -> DataFrame:
    """Finish a small frontier with a driver-side union-find.

    Star rounds shrink the frontier geometrically, so the LAST few rounds of
    the distributed loop run over a tiny edge set where each round's cost is
    pure job-scheduling latency (measured: CC is the only pipeline stage
    under 2x T1->T4 scaling, entirely from these tail rounds). Once the
    frontier fits comfortably on the driver we collapse the remaining
    O(log n) rounds into one collect + union-find. Both star operations
    preserve the node set and the component partition, so the union-find over
    an intermediate frontier yields exactly the same (id, component=min id)
    assignment the distributed loop converges to.

    Driver memory is bounded by the caller's `local_finish_edges` threshold
    (16 bytes/edge + the node dict — the 1M default is ~50 MB transient),
    and the path is disabled with local_finish_edges=0."""
    import pandas as pd

    pdf = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).toPandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            # union by min id: the root of every tree stays the set minimum,
            # so find(x) IS the component id the star algorithm converges to
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd

    out = pd.DataFrame(
        {"id": list(parent.keys()), "component": [find(n) for n in list(parent.keys())]},
        dtype="int64",
    )
    return edges.sparkSession.createDataFrame(out, "id bigint, component bigint")


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
    local_finish_edges: int = 1_000_000,
) -> DataFrame:
    """(src,dst) undirected edge DataFrame -> (id, component) assignment where
    component = min node id in the component. Only nodes that appear in an
    edge are returned; callers union isolated nodes back (see
    assign_components).

    `local_finish_edges`: once the (always-counted) frontier has at most this
    many edges, the remaining rounds collapse into one driver-side union-find
    (see _local_finish) — identical output, minus the scheduling-latency-bound
    tail rounds. 0 disables the fast path (pure distributed loop). At
    10^12-node scale the early rounds still run fully distributed; the
    threshold only bounds what the driver is ever asked to hold (~16 B/edge).

    Frontier durability: by default each round is cut with an eager
    localCheckpoint — fast, but executor-LOCAL (an executor loss kills the
    job and pins executor memory for the run). When `checkpoint_dir` is set,
    rounds stage to parquet under it instead (round files alternate between
    two slots, so disk use is bounded at 2x the frontier): any-FS durable,
    survives executor loss, and doubles as a mid-CC resume point for very
    large graphs. Use the dir on multi-executor clusters; local mode is fine
    without."""

    def _cut(df: DataFrame, rnd: int) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=True)
        from nhse_probabilistic_linkage_spark.sources import fs

        path = fs.join(checkpoint_dir, f"cc_round_{rnd % 2}")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)

    cur = _canonical(edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")))
    cur = _cut(cur, 0)
    prev_sig = _checksum(cur)
    if prev_sig[0] == 0:
        return cur.sparkSession.createDataFrame([], "id bigint, component bigint")

    for i in range(max_iterations):
        if 0 < local_finish_edges and prev_sig[0] <= local_finish_edges:
            return _local_finish(cur)
        cur = _cut(_small_star(_large_star(cur)), i + 1)
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")

    # Converged: star edges (node -> component min). Roots map to themselves.
    members = cur.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("id"), F.col("dst").alias("component")).distinct()
    return members.union(roots).groupBy("id").agg(F.min("component").alias("component"))


def assign_components(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    out_col: str = "cluster_id",
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
    local_finish_edges: int = 1_000_000,
) -> DataFrame:
    """Cluster assignment for every doc: connected-component min id for docs
    with at least one duplicate edge, own id for singletons."""
    comps = connected_components(
        edges,
        max_iterations=max_iterations,
        checkpoint_dir=checkpoint_dir,
        local_finish_edges=local_finish_edges,
    )
    return (
        docs.select(F.col(id_col).cast("long").alias(id_col))
        .join(comps.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias(out_col),
        )
    )
