"""VARIANT-mode ingestion + query surface (functions/variant.py,
plans/variant_ingest.py): schema-free scan, corrupt split, parquet
roundtrip, drift observability, and plan hygiene."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from datalakejson_spark.plans.variant_ingest import (
    LINEAGE_COL,
    RAW_COL,
    curate_variant,
    drift_report,
    scan_json_as_variant,
    split_corrupt,
)


def _write_landing(tmp_path, name: str, lines: list[str]):
    land = tmp_path / "landing"
    land.mkdir(parents=True, exist_ok=True)
    (land / name).write_text("\n".join(lines) + "\n")
    return land


def test_variant_curate_roundtrip_and_dlq(spark, tmp_path):
    """Good records land as variant parquet partitioned by a field extracted
    from the variant itself; malformed lines land verbatim in the DLQ."""
    good = [
        json.dumps({"MODE": "train", "x": i, "nested": {"deep": [i, i + 1]}})
        for i in range(10)
    ] + [json.dumps({"MODE": "test", "x": 99})]
    bad = ['{"MODE": "train", "x": 1', "not json at all"]
    land = _write_landing(tmp_path, "batch1.json", good + bad)

    counts = curate_variant(
        spark, str(land), str(tmp_path / "curated"), str(tmp_path / "dlq")
    )
    assert counts == {"good_rows": 11, "corrupt_rows": 2}

    # DLQ keeps the raw line for replay (the reference's _corrupt_record).
    dlq = spark.read.json(str(tmp_path / "dlq"))
    raws = {r[RAW_COL] for r in dlq.select(RAW_COL).collect()}
    assert raws == set(bad)
    assert LINEAGE_COL in dlq.columns

    # Roundtrip: variant survives parquet; typed deep-path extraction works
    # after read-back, and the partition column came from inside the variant.
    back = spark.read.parquet(str(tmp_path / "curated"))
    assert back.schema["record"].dataType.typeName() == "variant"
    got = {
        r.x: r.d1
        for r in back.select(
            F.variant_get("record", "$.x", "bigint").alias("x"),
            F.variant_get("record", "$.nested.deep[1]", "bigint").alias("d1"),
        ).collect()
    }
    assert got[3] == 4 and got[99] is None
    modes = {r.mode for r in back.select("mode").distinct().collect()}
    assert modes == {"train", "test"}
    # Partition pruning: the mode predicate lands in the scan's
    # PartitionFilters (directory-level pruning, not a post-scan filter).
    plan = (
        back.filter(F.col("mode") == "test")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "= test)" in pf


def test_variant_drift_is_observable_not_fatal(spark, tmp_path):
    """A second batch with a brand-new field needs no schema evolution: old
    readers keep working, the new field is addressable immediately, and
    drift_report surfaces the widened schema per source file."""
    land = _write_landing(
        tmp_path, "b1.json", [json.dumps({"MODE": "train", "x": i}) for i in range(5)]
    )
    out = dict(
        curated_dir=str(tmp_path / "curated"), dlq_dir=str(tmp_path / "dlq")
    )
    curate_variant(spark, str(land), **out)
    (land / "b1.json").unlink()
    (land / "b2.json").write_text(
        "\n".join(
            json.dumps({"MODE": "train", "x": i, "new_field": {"units": "ms"}})
            for i in range(5, 8)
        )
        + "\n"
    )
    curate_variant(spark, str(land), **out)

    back = spark.read.parquet(str(tmp_path / "curated"))
    assert back.count() == 8
    # New field: NULL for old rows, typed value for new rows — no re-infer,
    # no unionByName, no table rewrite.
    units = back.select(
        F.variant_get("record", "$.x", "bigint").alias("x"),
        F.variant_get("record", "$.new_field.units", "string").alias("u"),
    ).collect()
    by_x = {r.x: r.u for r in units}
    assert by_x[0] is None and by_x[6] == "ms"

    rep = {r[LINEAGE_COL]: r.merged_schema for r in drift_report(back).collect()}
    b1 = next(v for k, v in rep.items() if "b1.json" in k)
    b2 = next(v for k, v in rep.items() if "b2.json" in k)
    assert "new_field" not in b1 and "new_field" in b2


def test_variant_scan_split_semantics(spark, tmp_path):
    """Blank lines are neither data nor corrupt; corrupt rows keep raw text
    and lineage; good rows drop the raw text (the variant IS the record)."""
    land = _write_landing(
        tmp_path, "b.json", ['{"a": 1}', "", "   ", "oops", '{"a": 2}']
    )
    good, corrupt = split_corrupt(scan_json_as_variant(spark, str(land)))
    assert good.columns == ["record", LINEAGE_COL]
    assert corrupt.columns == [RAW_COL, LINEAGE_COL]
    assert good.count() == 2 and corrupt.count() == 1
    assert corrupt.collect()[0][RAW_COL] == "oops"


def test_variant_queries_stay_jvm_side(spark):
    """The registered variant queries compile to pure codegen plans — no
    Python evaluation nodes (the whole point of variant over a parse UDF)."""
    from datalakejson_spark.registry import all_specs

    specs = all_specs()
    for name in (
        "f9_variant_extraction",
        "f9b_variant_nested_paths",
        "f9c_variant_malformed_audit",
    ):
        df = specs[name].fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert df.count() > 0


def test_streaming_variant_ingest_incremental(spark, tmp_path):
    """AvailableNow drain of a variant landing zone: first drain curates
    batch 1 (good + DLQ), a second drain with the same checkpoint picks up
    ONLY the newly arrived file (the checkpoint is the per-file claim)."""
    from datalakejson_spark.streaming.variant_stream import streaming_variant_ingest

    land = tmp_path / "landing"
    land.mkdir()
    (land / "a.json").write_text(
        '{"MODE": "train", "x": 1}\n{"MODE": "train", "x": 2}\nBROKEN\n'
    )
    args = dict(
        landing_dir=str(land),
        curated_dir=str(tmp_path / "curated"),
        dlq_dir=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    streaming_variant_ingest(spark, **args).awaitTermination()
    back = spark.read.parquet(args["curated_dir"])
    assert back.count() == 2
    assert spark.read.json(args["dlq_dir"] + "/batch-0").count() == 1

    (land / "b.json").write_text('{"MODE": "test", "x": 3, "fresh": true}\n')
    streaming_variant_ingest(spark, **args).awaitTermination()
    back = spark.read.parquet(args["curated_dir"])
    assert back.count() == 3  # a.json NOT reprocessed
    fresh = back.filter(
        F.variant_get("record", "$.fresh", "boolean") == True  # noqa: E712
    )
    assert fresh.count() == 1 and fresh.collect()[0]["mode"] == "test"


def test_variant_stream_replay_resolution(spark, tmp_path):
    """T2 parity for the variant drain: a simulated crash-replay (same
    source file appended under an older and a newer run stamp) resolves to
    the newest attempt's rows only — and run stamps are present on streamed
    output to make that possible."""
    from datalakejson_spark.plans.variant_ingest import RUN_COL, resolve_replays
    from datalakejson_spark.streaming.variant_stream import streaming_variant_ingest

    land = tmp_path / "landing"
    land.mkdir()
    (land / "a.json").write_text('{"MODE": "train", "x": 1}\n')
    args = dict(
        landing_dir=str(land),
        curated_dir=str(tmp_path / "curated"),
        dlq_dir=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    streaming_variant_ingest(spark, **args).awaitTermination()
    cur = spark.read.parquet(args["curated_dir"])
    assert RUN_COL in cur.columns

    # Simulate the crash-replay: re-append the same file's rows under a
    # strictly LARGER stamp (what a re-attempt of the same batch id gets).
    replay = cur.withColumn(RUN_COL, F.concat(F.col(RUN_COL), F.lit("~replay")))
    replay.write.mode("append").partitionBy("mode").parquet(args["curated_dir"])

    doubled = spark.read.parquet(args["curated_dir"])
    assert doubled.count() == 2
    resolved = resolve_replays(doubled)
    assert resolved.count() == 1
    assert resolved.collect()[0][RUN_COL].endswith("~replay")  # newest wins


def test_variant_stream_crash_replay_exactly_once(spark, tmp_path):
    """REAL crash-replay soak (VERDICT r5 #6): kill the drain in the T2
    window — after the parquet append, before the checkpoint commit — then
    restart against the same checkpoint. The batch must replay (the data
    appears under TWO run stamps) and resolve_replays must deliver each
    source row exactly once, keeping the newest attempt."""
    import pytest

    from datalakejson_spark.plans.variant_ingest import (
        LINEAGE_COL,
        RUN_COL,
        resolve_replays,
    )
    from datalakejson_spark.streaming.variant_stream import streaming_variant_ingest

    land = tmp_path / "landing"
    land.mkdir()
    (land / "a.json").write_text('{"MODE": "train", "x": 1}\n{"MODE": "test", "x": 2}\n')
    args = dict(
        landing_dir=str(land),
        curated_dir=str(tmp_path / "curated"),
        dlq_dir=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    def crash(batch_id: int) -> None:
        raise RuntimeError(f"injected crash after append, batch {batch_id}")

    q = streaming_variant_ingest(spark, **args, after_append_hook=crash)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    # The T2 window state: data IS on disk, the claim is NOT committed.
    first = spark.read.parquet(args["curated_dir"])
    assert first.count() == 2

    # Restart without the fault: the uncommitted batch replays.
    streaming_variant_ingest(spark, **args).awaitTermination()
    doubled = spark.read.parquet(args["curated_dir"])
    assert doubled.count() == 4  # two attempts of the same two rows
    assert doubled.select(RUN_COL).distinct().count() == 2

    resolved = resolve_replays(doubled)
    assert resolved.count() == 2  # exactly-once after resolution
    # the surviving attempt is the NEWER stamp for every row
    newest = doubled.groupBy(LINEAGE_COL).agg(F.max(RUN_COL).alias(RUN_COL))
    assert (
        resolved.join(newest, [LINEAGE_COL, RUN_COL], "left_anti").count() == 0
    )
    # values intact through the crash+replay
    xs = sorted(
        r.x for r in resolved.select(
            F.variant_get("record", "$.x", "bigint").alias("x")
        ).collect()
    )
    assert xs == [1, 2]

    # A third drain is a no-op: the replayed batch IS now committed.
    streaming_variant_ingest(spark, **args).awaitTermination()
    assert spark.read.parquet(args["curated_dir"]).count() == 4
