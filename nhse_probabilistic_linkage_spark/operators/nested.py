"""Nested array<struct> history columns: explode, prune, recombine.

Reference analog: the core PDS ingest. One person row carries arrays of
historical name/address structs; `explode_pds` explodes each history to one
row per historical value, null-strips, dedups, prunes null rows that have a
non-null sibling, and finally recombines the exploded histories with a
multi-way OUTER join on the record key — the cartesian product of historical
variants per record (/root/reference/utils/dataset_ingestion_utils.py:
191-259 explode_historical_values, :346-351 null-prune window, :433-437 the
3-way outer recombination; nested input schema at
tests/dataset_ingestion_tests.py:254-271).

Web-page metadata has exactly this shape (WARC header lists, outlink
structs), so the engine keeps the operator general: any array<struct>
column, any subset of fields.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_history(
    df: DataFrame,
    id_col: str,
    arr_col: str,
    fields: list[str] | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """array<struct> -> one row per (id, history entry), reference-faithful:

      1. null-strip the array (array_except vs [null] — the reference's
         null-strip idiom, dataset_ingestion_utils.py:230,310-312);
      2. explode_outer, so ids with an empty/null history keep ONE null row;
      3. project struct fields to flat columns;
      4. dropDuplicates (pre-recombination dedup shrinks the outer-join
         cartesian, the reference's own optimization, :257,342);
      5. window-count null-prune: drop the null row when a non-null sibling
         exists for the same id (:346-351).

    Output: (id_col, <prefix><field>...) — flat, ready for recombination.
    """
    stripped = F.array_except(F.col(arr_col), F.array(F.lit(None)))
    exploded = df.select(F.col(id_col), F.explode_outer(stripped).alias("_h"))
    if fields is None:
        fields = [f.name for f in df.schema[arr_col].dataType.elementType.fields]
    pfx = prefix if prefix is not None else ""
    flat = exploded.select(
        F.col(id_col), *[F.col(f"_h.{f}").alias(f"{pfx}{f}") for f in fields]
    ).dropDuplicates()
    w = Window.partitionBy(id_col)
    first_field = f"{pfx}{fields[0]}"
    return (
        flat.withColumn("_n_nonnull", F.count(first_field).over(w))
        .where(F.col(first_field).isNotNull() | (F.col("_n_nonnull") == 0))
        .drop("_n_nonnull")
    )


def recombine_histories(histories: list[DataFrame], id_col: str) -> DataFrame:
    """Multi-way OUTER join of exploded histories on the record key — every
    combination of historical variants per record survives (the reference's
    3-way outer cartesian, dataset_ingestion_utils.py:433-437). The key is
    coalesced across sides so records present in only some histories keep
    their id."""
    def join2(a: DataFrame, b: DataFrame) -> DataFrame:
        al, bl = a.alias("_l"), b.alias("_r")
        joined = al.join(bl, F.col(f"_l.{id_col}") == F.col(f"_r.{id_col}"), "full_outer")
        keep = [F.coalesce(F.col(f"_l.{id_col}"), F.col(f"_r.{id_col}")).alias(id_col)]
        keep += [F.col(f"_l.{c}") for c in a.columns if c != id_col]
        keep += [F.col(f"_r.{c}") for c in b.columns if c != id_col]
        return joined.select(*keep)

    return reduce(join2, histories)
