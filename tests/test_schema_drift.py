"""Schema-drift gate tests (SURVEY.md §7.3 / FIXTURES.md §3 variants 4-5):
compatible widening flows through; incompatible STRING→STRUCT drift
quarantines the offending file without poisoning the curated table."""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import types as T

from datalakejson_spark.plans.ingest import discover, ingest_batch, read_curated
from datalakejson_spark.plans.ledger import Ledger, LedgerStatus
from datalakejson_spark.plans.schema_evolution import (
    compatible,
    incompatible_columns,
    merge_schemas,
)
from tests.conftest import good_record, write_ndjson


def test_compatible_rules():
    assert compatible(T.LongType(), T.DoubleType())  # widening
    assert compatible(T.DoubleType(), T.LongType())
    assert compatible(T.StringType(), T.StringType())
    assert not compatible(T.StringType(), T.StructType([]))  # the §7.3 case
    assert not compatible(
        T.ArrayType(T.StringType()), T.StringType()
    )
    # struct compat recurses on shared fields only
    old = T.StructType([T.StructField("a", T.LongType())])
    new_ok = T.StructType(
        [T.StructField("a", T.DoubleType()), T.StructField("b", T.StringType())]
    )
    new_bad = T.StructType([T.StructField("a", T.StructType([]))])
    assert compatible(old, new_ok)
    assert not compatible(old, new_bad)


def test_merge_widens_and_unions():
    old = T.StructType(
        [T.StructField("x", T.LongType()), T.StructField("keep", T.StringType())]
    )
    new = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("extra", T.BooleanType())]
    )
    merged = merge_schemas(old, new)
    by_name = {f.name: f.dataType for f in merged.fields}
    assert by_name["x"] == T.DoubleType()
    assert set(by_name) == {"x", "keep", "extra"}


def test_incompatible_drift_quarantines_file_only(spark, ingest_conf):
    # batch 1 establishes the landing contract (payload is a struct)
    discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)
    curated_before = read_curated(spark, ingest_conf.curated_dir)
    rows_before = curated_before.count()
    assert "transaction_items" in curated_before.columns

    # batch 2: one drifted file (payload became a string) + one good file
    week = Path(ingest_conf.landing_dir) / "2024" / "week08"
    write_ndjson(
        week / "drift_incompatible.json",
        [
            '{"id": "bad-1", "event_timestamp": "2024-02-20T00:00:00Z", '
            '"MODE": "train", "payload": "oops-now-a-string"}'
        ],
    )
    write_ndjson(
        week / "still_good.json",
        [good_record(500, ts="2024-02-20T01:00:00Z")],
    )
    discover(spark, ingest_conf)
    res = ingest_batch(spark, ingest_conf)

    drifted = str(week / "drift_incompatible.json")
    assert drifted in res.drifted_files
    assert any(col == "payload" for col, _, _ in res.drifted_files[drifted])
    assert [Path(p).name for p in res.succeeded_files] == ["still_good.json"]

    # curated table grew by exactly the good file's rows; payload-derived
    # columns keep their struct-derived types
    curated = read_curated(spark, ingest_conf.curated_dir)
    assert curated.count() == rows_before + 1
    assert curated.filter(F.col("record_id") == "rec-500").count() == 1

    # ledger: drifted file QUARANTINED with a drift message; still in landing
    row = (
        Ledger(spark, ingest_conf.ledger_dir)
        .read()
        .filter(F.col("s3_key") == drifted)
        .first()
    )
    assert row.status == LedgerStatus.QUARANTINED
    assert "schema drift" in row.error_message
    assert Path(drifted).exists()


def test_widening_drift_flows_through(spark, ingest_conf):
    """FIXTURES.md variant 4: an int field later arriving as float widens the
    union schema instead of quarantining."""
    discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)
    week = Path(ingest_conf.landing_dir) / "2024" / "week09"
    write_ndjson(
        week / "qty_int.json",
        [good_record(600, ts="2024-02-21T00:00:00Z", amount=5)],
    )
    discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)
    write_ndjson(
        week / "qty_float.json",
        [good_record(601, ts="2024-02-22T00:00:00Z", amount=5.5)],
    )
    discover(spark, ingest_conf)
    res = ingest_batch(spark, ingest_conf)
    assert res.drifted_files == {}
    assert len(res.succeeded_files) == 1
    curated = read_curated(spark, ingest_conf.curated_dir)
    vals = {
        r.amount
        for r in curated.filter(F.col("amount").isNotNull()).select("amount").collect()
    }
    assert vals == {5.0, 5.5}


def test_merge_widens_map_value_types():
    """ADVICE r01: map value types must merge recursively — map<string,int> +
    map<string,double> widens to map<string,double>, not silently narrow."""
    from pyspark.sql import types as T

    from datalakejson_spark.plans.schema_evolution import merge_schemas

    old = T.StructType([T.StructField("m", T.MapType(T.StringType(), T.LongType()))])
    new = T.StructType([T.StructField("m", T.MapType(T.StringType(), T.DoubleType()))])
    merged = merge_schemas(old, new)
    assert merged["m"].dataType == T.MapType(T.StringType(), T.DoubleType())
    # nested: map values that are structs merge field-wise
    old2 = T.StructType(
        [T.StructField("m", T.MapType(T.StringType(), T.StructType(
            [T.StructField("a", T.LongType())])))]
    )
    new2 = T.StructType(
        [T.StructField("m", T.MapType(T.StringType(), T.StructType(
            [T.StructField("a", T.DoubleType()), T.StructField("b", T.StringType())])))]
    )
    merged2 = merge_schemas(old2, new2)
    vt = merged2["m"].dataType.valueType
    assert vt["a"].dataType == T.DoubleType() and vt["b"].dataType == T.StringType()
