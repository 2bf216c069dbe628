"""ingest_history_records: the reference's explode_pds lifecycle end-to-end
on a nested fixture mirroring the reference's test schema shape
(/root/reference/tests/dataset_ingestion_tests.py:254-282)."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from nhse_probabilistic_linkage_spark.plans.ingest import ingest_history_records


def _fixture(spark):
    schema = StructType(
        [
            StructField("rec_id", LongType()),
            StructField("flag", StringType()),
            StructField(
                "name_history",
                ArrayType(StructType([StructField("name", StringType())])),
            ),
            StructField(
                "addr_history",
                ArrayType(StructType([StructField("addr", StringType())])),
            ),
        ]
    )
    rows = [
        (1, None, [("ann",), ("anne",)], [("x st",), ("y rd",)]),   # 2x2 combos
        (2, "S", [("bob",)], [("z ln",)]),                           # confidential -> dropped
        (3, None, [("cy",)], None),                                  # null addr history
        (4, None, [("dee",)], [("w ave",)]),                         # superseded -> removed
        (5, None, None, None),                                       # empty histories survive
    ]
    return spark.createDataFrame(rows, schema)


def test_ingest_full_lifecycle(spark):
    df = _fixture(spark)
    supersession = spark.createDataFrame([(4, 1)], "old_key long, new_key long")
    out = ingest_history_records(
        df,
        id_col="rec_id",
        drop_where=F.col("flag").isin("I", "S", "Y"),
        supersession=supersession,
        history_cols={"name_history": ["name"], "addr_history": ["addr"]},
        renames={"name_history_name": "GIVEN_NAME", "addr_history_addr": "ADDRESS"},
        surrogate_from="rec_id",
    )
    rows = {(r.rec_id, r.GIVEN_NAME, r.ADDRESS) for r in out.collect()}
    assert rows == {
        (1, "ann", "x st"), (1, "ann", "y rd"), (1, "anne", "x st"), (1, "anne", "y rd"),
        (3, "cy", None),
        (5, None, None),
    }
    # record 2 dropped (confidential), record 4 removed (superseded)
    assert {r.rec_id for r in out.collect()} == {1, 3, 5}
    # surrogate key is stable + derived from the id, never a row-order id
    keyed = {r.rec_id: r.record_key for r in out.select("rec_id", "record_key").distinct().collect()}
    expect = {
        r.rec_id: r.k
        for r in spark.createDataFrame([(1,), (3,), (5,)], "rec_id long")
        .select("rec_id", F.xxhash64("rec_id").alias("k"))
        .collect()
    }
    assert keyed == expect


def test_ingest_supersession_rewrites_references(spark):
    """A record pointing AT a superseded key gets its reference column
    rewritten (the reference's lookup-and-replace on referencing columns,
    dataset_ingestion_utils.py:87-103) while the superseded record itself is
    anti-joined away. The id column is never rewritten — the anti-join
    already removed every row whose id matched an old key."""
    df = spark.createDataFrame(
        [(4, None, "old self"), (9, 4, "points at superseded"), (7, 9, "points at live")],
        "rec_id long, linked_to long, note string",
    )
    supersession = spark.createDataFrame([(4, 1)], "old_key long, new_key long")
    out = ingest_history_records(
        df, id_col="rec_id", supersession=supersession,
        supersession_rewrite_cols=("linked_to",),
    )
    assert {(r.rec_id, r.linked_to) for r in out.collect()} == {(9, 1), (7, 9)}
    # removal-only when no rewrite columns are named
    plain = ingest_history_records(df, id_col="rec_id", supersession=supersession)
    assert {(r.rec_id, r.linked_to) for r in plain.collect()} == {(9, 4), (7, 9)}
