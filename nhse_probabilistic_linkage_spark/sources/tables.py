"""Table IO abstraction: Iceberg when a catalog is configured, parquet
fallback otherwise.

The reference reads/writes everything through a Hive metastore of Delta
tables (`spark.table(...)` at utils/dataset_ingestion_utils.py:473,
`saveAsTable` at utils/model_utils.py:118-125). The north star targets
Iceberg; this sandbox has no Iceberg runtime JAR, so the same call sites go
through this module and a path-based parquet catalog — documented fallback
(SURVEY.md §7.4.5). Swapping `TableIO(catalog="iceberg_cat")` in makes every
read/write go through `spark.read.table` / `writeTo(...).append()` with
partition transforms.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from nhse_probabilistic_linkage_spark.sources import fs


def _has_catalog(spark: SparkSession, catalog: str) -> bool:
    try:
        return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None
    except Exception:
        return False


class TableIO:
    """Minimal table catalog: name -> Iceberg table or parquet dir."""

    def __init__(self, spark: SparkSession, warehouse: str, catalog: str | None = None):
        self.spark = spark
        self.warehouse = warehouse
        self.catalog = catalog if catalog and _has_catalog(spark, catalog) else None

    def _path(self, name: str) -> str:
        # fs.join, not os.path.join: the warehouse may be a scheme-prefixed
        # URI (s3a://..., hdfs://..., file:/...) that os.path would mangle
        # on non-POSIX hosts and that only the Hadoop FS client can probe
        return fs.join(self.warehouse, name)

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
        if self.catalog:
            writer = df.writeTo(f"{self.catalog}.{name}")
            if mode == "append":
                writer.append()
            else:
                writer.createOrReplace()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        # probe through the Hadoop FS API: os.path.isdir/os.listdir only see
        # the driver's local disk, so with warehouse=s3a://... and no Iceberg
        # catalog they would silently answer "absent" for every table
        p = self._path(name)
        names = fs.list_names(self.spark, p)
        return any(n.endswith(".parquet") or n == "_SUCCESS" for n in names)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver-provided benchmark tables."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread_input(df: DataFrame, factor: int = 2, key_col: str | None = None) -> DataFrame:
    """Scale-adaptive parallelism floor for compute-dense per-row stages.

    A single-file parquet input with one row group cannot be split below one
    scan task no matter how small maxPartitionBytes is (parquet splits at
    row-group granularity), so a small-file table arrives in 1-2 partitions
    and every downstream kernel — shingle/minhash/winnow Arrow UDFs, cosine
    folds — runs nearly serial (r6 measurement: the fused shingle+minhash
    job was 2-task-bound at sf1.0, 6.8s for work that takes ~1.5s wide).
    When the input has fewer partitions than the session parallelism,
    hash-repartition on `key_col` (default: the first column — every caller
    passes an id-first projection) to factor x parallelism: a trivial
    shuffle of the narrow input next to the per-row compute it feeds (guide
    §2.5 input skew: "repartition immediately after the read"). Hash, NOT
    keyless round-robin: a keyless repartition first pays a local sort of
    ALL columns (sortBeforeRepartition, guide §2.5) — measured 27s on a
    20k-row array<double> table vs sub-second hashed. xxhash64 of the key
    spreads unique ids evenly over the target partition count. Inputs that
    already arrive wide — any real at-scale table — pass through untouched,
    so this is structurally a no-op at cluster scale, not a local tuning
    constant.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    from pyspark.sql import functions as F

    key_col = key_col if key_col is not None else df.columns[0]
    return df.repartition(factor * target, F.xxhash64(F.col(key_col)))


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)
