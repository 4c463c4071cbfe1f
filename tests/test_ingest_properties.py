"""Ingest-plane invariants (SURVEY.md §5.2 step 3): conservation and
schema-union invariants of the ingest plane, plus F8 misc functions."""

from __future__ import annotations

import pyspark.sql.functions as F

from datalakejson_spark.plans.ingest import discover, ingest_batch, read_curated
from datalakejson_spark.plans.ledger import Ledger


def test_row_conservation(spark, ingest_conf):
    """corrupt_rows + good_rows == total parseable input lines (E1 invariant:
    PERMISSIVE never drops a line — every line is good or corrupt)."""
    import json as _json
    from pathlib import Path

    total_lines = sum(
        1
        for p in Path(ingest_conf.landing_dir).rglob("*.json")
        for _line in open(p)
    )
    discover(spark, ingest_conf)
    res = ingest_batch(spark, ingest_conf)
    assert res.good_rows + res.corrupt_rows == total_lines


def test_curated_schema_is_union_of_file_schemas(spark, ingest_conf, tmp_path):
    """union-of-schemas property (diagram3:110): the merged curated schema
    contains every top-level key any input file introduced."""
    from tests.conftest import good_record, write_ndjson
    from pathlib import Path

    write_ndjson(
        Path(ingest_conf.landing_dir) / "2024" / "week07" / "extra_cols.json",
        [good_record(900, ts="2024-02-15T00:00:00Z", colA=1),
         good_record(901, ts="2024-02-15T00:00:00Z", colB="x")],
    )
    discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)
    cols = set(read_curated(spark, ingest_conf.curated_dir).columns)
    # keys from the standard files AND both drift files
    assert {"record_id", "extra_key", "colA", "colB"} <= cols


def test_ledger_is_exhaustive_and_exclusive(spark, ingest_conf):
    """Every discovered file ends in exactly one terminal state; ledger row
    count equals discovered file count (audit-trail completeness,
    diagram3.mmd:22-23)."""
    n = discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)
    ledger = Ledger(spark, ingest_conf.ledger_dir).read()
    assert ledger.count() == n
    assert ledger.groupBy("s3_key").count().filter(F.col("count") > 1).count() == 0
    states = {r[0] for r in ledger.select("status").distinct().collect()}
    assert states <= {"SUCCEEDED", "QUARANTINED", "FAILED"}


def test_move_survives_mid_copy_crash(tmp_path, monkeypatch):
    """A crash DURING the archive copy must not let the re-run delete the
    only complete copy: dst existing implies a complete copy (temp+replace)."""
    import shutil as _shutil

    import datalakejson_spark.plans.ingest as ing

    src = tmp_path / "landing" / "f.json"
    dst = tmp_path / "archive" / "f.json"
    src.parent.mkdir()
    src.write_text("x" * 1000)

    real_copy = _shutil.copy2

    def truncating_copy(s, d, **kw):
        real_copy(s, d, **kw)
        with open(d, "w") as f:
            f.write("TRUNC")  # simulate partial flush...
        raise OSError("simulated crash mid-copy")

    monkeypatch.setattr(ing.shutil, "copy2", truncating_copy)
    try:
        ing._move_idempotent(str(src), str(dst))
    except OSError:
        pass
    monkeypatch.undo()
    # crash left no dst (only a temp); src intact; re-run completes the move
    assert src.exists() and not dst.exists()
    ing._move_idempotent(str(src), str(dst))
    assert dst.read_text() == "x" * 1000 and not src.exists()
    # and a further re-run is a no-op
    ing._move_idempotent(str(src), str(dst))
    assert dst.read_text() == "x" * 1000


def test_ingest_does_not_mutate_caller_schema(spark, ingest_conf):
    """conf.schema must come back untouched (StructType.add mutates in
    place; ingest must copy before pinning _corrupt_record)."""
    from pyspark.sql import types as T

    user_schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("event_timestamp", T.StringType()),
            T.StructField("MODE", T.StringType()),
            T.StructField("extra_key", T.StringType()),
        ]
    )
    n_fields_before = len(user_schema.fields)
    ingest_conf.schema = user_schema
    discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)
    assert len(user_schema.fields) == n_fields_before


def test_empty_file_quarantined_not_retried(spark, ingest_conf):
    """Zero-byte files terminal-quarantine instead of FAILED-looping."""
    from pathlib import Path

    empty = Path(ingest_conf.landing_dir) / "all_historical_files" / "empty.json"
    empty.write_text("")
    discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)
    ledger = Ledger(spark, ingest_conf.ledger_dir).read()
    row = ledger.filter(F.col("s3_key") == str(empty)).first()
    assert row.status == "QUARANTINED"
    # second run claims nothing new for it
    res2 = ingest_batch(spark, ingest_conf)
    assert str(empty) not in [p for p in res2.lost_files + res2.quarantined_files]


def test_fuzzed_records_conserved(spark, tmp_path):
    """Seeded fuzz: random nested records with hostile keys/values plus
    garbage lines — ingest must conserve every line into good or corrupt and
    never throw."""
    import json as _json
    import random

    from datalakejson_spark.plans.ingest import IngestConfig
    from tests.conftest import write_ndjson

    rng = random.Random(7)
    weird_keys = ["key with space", "UPPER", "ключ", "键", "dot.key", "0num"]

    def rand_value(depth=0):
        kind = rng.randint(0, 6 if depth < 2 else 4)
        if kind == 0:
            return rng.randint(-(10**12), 10**12)
        if kind == 1:
            return rng.random() * 1e6
        if kind == 2:
            return rng.choice(["", "x", "多语言", "line\nbreak", "\"quoted\""])
        if kind == 3:
            return None
        if kind == 4:
            return rng.random() < 0.5
        if kind == 5:
            return [rand_value(depth + 1) for _ in range(rng.randint(0, 3))]
        return {rng.choice(weird_keys): rand_value(depth + 1)}

    lines, n_lines = [], 0
    for i in range(120):
        if rng.random() < 0.15:
            lines.append(rng.choice(['{"broken": ', "not json", "[1,2", "}"]))
        else:
            rec = {
                "id": f"f-{i}",
                "event_timestamp": "2024-03-01T00:00:00Z",
                "MODE": rng.choice(["train", None]),
                rng.choice(weird_keys): rand_value(),
            }
            lines.append(_json.dumps(rec, ensure_ascii=False))
        n_lines += 1

    landing = tmp_path / "fuzz_landing"
    write_ndjson(landing / "fuzz_a.json", lines[:60])
    write_ndjson(landing / "fuzz_b.json", lines[60:])
    conf = IngestConfig(
        landing_dir=str(landing),
        curated_dir=str(tmp_path / "fc"),
        dlq_dir=str(tmp_path / "fd"),
        archive_dir=str(tmp_path / "fa"),
        ledger_dir=str(tmp_path / "fl"),
    )
    discover(spark, conf)
    res = ingest_batch(spark, conf)
    assert res.good_rows + res.corrupt_rows == n_lines
    if res.good_rows:
        assert read_curated(spark, conf.curated_dir).count() == res.good_rows


def test_f8_monotonic_id_unique(spark):
    """F8: monotonically_increasing_id yields unique surrogate keys across
    partitions (ledger SERIAL analogue, sudo_code.txt:27)."""
    df = spark.range(0, 10000).repartition(8).withColumn(
        "sid", F.monotonically_increasing_id()
    )
    assert df.select("sid").distinct().count() == 10000
