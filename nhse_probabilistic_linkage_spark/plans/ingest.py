"""Record ingest: the reference's full `explode_pds` lifecycle as one
composable plan.

Reference (/root/reference/utils/dataset_ingestion_utils.py):
  :27-34   drop confidential records (negated isin on a flag, null-keeps);
  :54-103  supersession — records whose key was replaced are removed, and
           references to old keys are rewritten via a lookup join;
  :191-354 per-history explode (null-strip -> explode_outer -> dedup ->
           window null-prune);
  :433-437 multi-way OUTER join on the record key = cartesian product of
           historical variants;
  :440-450 canonical rename + surrogate key (the reference uses
           monotonically_increasing_id — unstable across runs; ours derives
           the key from a stable column with xxhash64).

Each step is one of the engine's standalone operators (lookup.py,
nested.py); this module is the composition, so a user of the reference's
`load_pds_full_or_exploded` has a single equivalent call. Everything is
native DataFrame ops — the plan fuses into ordinary scans/joins and the
explodes stay Catalyst generators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nhse_probabilistic_linkage_spark.operators.lookup import lookup_replace
from nhse_probabilistic_linkage_spark.operators.nested import (
    explode_history,
    recombine_histories,
)


def ingest_history_records(
    df: DataFrame,
    id_col: str,
    drop_where: Column | None = None,
    supersession: DataFrame | None = None,
    supersession_old: str = "old_key",
    supersession_new: str = "new_key",
    supersession_rewrite_cols: tuple[str, ...] = (),
    history_cols: dict[str, list[str] | None] | None = None,
    renames: dict[str, str] | None = None,
    surrogate_from: str | None = None,
    surrogate_col: str = "record_key",
) -> DataFrame:
    """Reference-shaped ingest over a table with array<struct> histories.

    Steps (all optional, applied in reference order):
      1. drop rows matching `drop_where` (confidentiality filter analog —
         pass the POSITIVE "drop this" condition; null never matches, so
         null-flagged rows are kept, same as the reference's isNull escape);
      2. supersession: rows whose id appears as a superseded OLD key are
         removed (left_anti); columns named in `supersession_rewrite_cols`
         (cross-references to other records, e.g. "replaced_by" /
         "linked_key" — NOT the id itself, which the anti-join just
         filtered) are rewritten old->new via broadcast lookup-replace;
      3. each history col in `history_cols` ({col: fields or None}) explodes
         via explode_history (prefix = "<col>_");
      4. the exploded histories recombine with a multi-way OUTER join on the
         id — one row per combination of historical variants;
      5. `renames` applied, then a stable surrogate key from
         xxhash64(surrogate_from) (never monotonically_increasing_id).
    """
    cur = df
    if drop_where is not None:
        # keep rows where the drop condition is FALSE or NULL
        cur = cur.where(~F.coalesce(drop_where, F.lit(False)))
    if supersession is not None:
        superseded_keys = supersession.select(F.col(supersession_old).alias(id_col))
        cur = cur.join(F.broadcast(superseded_keys), id_col, "left_anti")
        # rewriting id_col itself would be a no-op (the anti-join above just
        # removed every row whose id matches an old key), so the rewrite
        # applies only to caller-named reference columns
        for ref_col in supersession_rewrite_cols:
            cur = lookup_replace(cur, supersession, ref_col, supersession_old, supersession_new)

    history_cols = history_cols or {}
    if history_cols:
        base_cols = [c for c in cur.columns if c not in history_cols]
        base = cur.select(*base_cols)
        exploded = [
            explode_history(cur, id_col, arr_col, fields=fields, prefix=f"{arr_col}_")
            for arr_col, fields in history_cols.items()
        ]
        combined = recombine_histories(exploded, id_col)
        cur = base.join(combined, id_col, "left")

    for old, new in (renames or {}).items():
        cur = cur.withColumnRenamed(old, new)
    if surrogate_from is not None:
        cur = cur.withColumn(surrogate_col, F.xxhash64(F.col(surrogate_from)))
    return cur
