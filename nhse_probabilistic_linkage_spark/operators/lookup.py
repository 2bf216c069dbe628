"""Broadcast lookup-and-replace / lookup-and-enrich joins.

Reference analogs:
  - supersession replace: left join records to the replaced_by map, then
    when(isNotNull(replacement), replacement).otherwise(original)
    (/root/reference/utils/dataset_ingestion_utils.py:87-103);
  - nicknames enrich: left join each name token to a (name -> array<string>)
    lookup, defaulting misses to an empty array, then concat the arrays
    (/root/reference/utils/preprocessing_utils.py:508-540).

Both are broadcast joins by construction — the lookup side is a reference
table (supersession map, nicknames dictionary), orders of magnitude smaller
than the fact side, so the fact table never shuffles. The broadcast hint is
explicit: Catalyst's size estimate usually gets this right, but a lookup
read through a view/filter can lose its statistics and fall back to a
sort-merge join that shuffles the whole fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_replace(
    df: DataFrame,
    mapping: DataFrame,
    key_col: str,
    map_key: str,
    map_value: str,
    out_col: str | None = None,
) -> DataFrame:
    """Replace df[key_col] with mapping[map_value] where a mapping row
    matches; keep the original otherwise (supersession semantics). Output
    column defaults to key_col (in-place replace)."""
    out = out_col or key_col
    m = F.broadcast(
        mapping.select(F.col(map_key).alias("_lk_key"), F.col(map_value).alias("_lk_val"))
    )
    joined = df.join(m, df[key_col] == F.col("_lk_key"), "left")
    return joined.withColumn(out, F.coalesce("_lk_val", F.col(key_col))).drop(
        "_lk_key", "_lk_val"
    )


def lookup_enrich_array(
    df: DataFrame,
    mapping: DataFrame,
    key_col: str,
    map_key: str,
    map_values: str,
    out_col: str,
    include_key: bool = True,
) -> DataFrame:
    """Attach mapping[map_values] (an array) for each df[key_col]; misses get
    an empty array (the reference's nicknames default,
    preprocessing_utils.py:532-534). include_key prepends the key itself so
    the output is 'key + its aliases' — the shape the nickname expansion
    feeds into comparison levels."""
    m = F.broadcast(
        mapping.select(F.col(map_key).alias("_lk_key"), F.col(map_values).alias("_lk_vals"))
    )
    joined = df.join(m, df[key_col] == F.col("_lk_key"), "left")
    vals = F.coalesce(F.col("_lk_vals"), F.array().cast("array<string>"))
    if include_key:
        vals = F.array_distinct(F.concat(F.array(F.col(key_col).cast("string")), vals))
    return joined.withColumn(out_col, vals).drop("_lk_key", "_lk_vals")
