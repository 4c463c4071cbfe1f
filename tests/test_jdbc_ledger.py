"""S5: JDBC-backed ledger (embedded Derby) — same contract as the snapshot
ledger: idempotent registration, SKIP-LOCKED-equivalent claims, lease
reclaim, run_id commit fencing, and a full ingest_batch e2e on the JDBC
backend."""

from __future__ import annotations

from pathlib import Path

import pytest

from datalakejson_spark.plans.ingest import (
    IngestConfig,
    discover,
    ingest_batch,
    read_curated,
)
from datalakejson_spark.plans.jdbc_ledger import JdbcLedger
from datalakejson_spark.plans.ledger import LedgerStatus
from tests.conftest import good_record, write_ndjson


@pytest.fixture()
def jdbc_url(tmp_path: Path) -> str:
    return f"jdbc:derby:{tmp_path}/ledgerdb;create=true"


def _register(spark, led, keys):
    led.register(
        spark.createDataFrame([(k, 10) for k in keys], "s3_key string, file_size_bytes long")
    )


def test_jdbc_register_idempotent(spark, jdbc_url):
    led = JdbcLedger(spark, jdbc_url)
    df = spark.createDataFrame(
        [("/a.json", 10), ("/b.json", 20)], "s3_key string, file_size_bytes long"
    )
    assert led.register(df) == 2
    assert led.register(df) == 0  # ON CONFLICT DO NOTHING
    assert led.counts() == {LedgerStatus.PENDING: 2}


def test_jdbc_claim_skip_locked_and_reclaim(spark, jdbc_url):
    led = JdbcLedger(spark, jdbc_url)
    _register(spark, led, [f"/f{i}.json" for i in range(4)])

    a = led.claim_batch(3, "run-a")
    assert len(a) == 3
    # concurrent runner skips a's PROCESSING rows, takes the remainder
    b = led.claim_batch(3, "run-b")
    assert len(b) == 1 and not set(a) & set(b)
    assert led.counts() == {LedgerStatus.PROCESSING: 4}
    # fresh leases are not claimable; expired ones are (crash reclaim)
    assert led.claim_batch(10, "run-c") == []
    reclaimed = led.claim_batch(10, "run-c", stale_lease_s=0)
    assert sorted(reclaimed) == sorted(a + b)
    rows = {r.s3_key: r for r in led.read().collect()}
    assert all(r.run_id == "run-c" and r.retry_count == 2 for r in rows.values())


def test_jdbc_commit_fencing(spark, jdbc_url):
    led = JdbcLedger(spark, jdbc_url)
    _register(spark, led, ["/x.json", "/y.json"])
    a = led.claim_batch(10, "run-a")
    b = led.claim_batch(10, "run-b", stale_lease_s=0)  # B reclaims everything
    assert sorted(b) == sorted(a)

    fenced = led.apply_outcomes([(a, LedgerStatus.SUCCEEDED, None)], run_id="run-a")
    assert sorted(fenced) == sorted(a)  # A lost every claim
    assert led.counts() == {LedgerStatus.PROCESSING: 2}  # B's state intact
    assert led.owned_by(a, "run-b") == set(a)
    assert led.apply_outcomes([(b, LedgerStatus.SUCCEEDED, None)], run_id="run-b") == []
    assert led.counts() == {LedgerStatus.SUCCEEDED: 2}


def test_ingest_e2e_on_jdbc_ledger(spark, tmp_path, jdbc_url):
    """The full batch pipeline with the ledger in a JDBC database — the
    reference's actual deployment shape (JDBC_URL, sudo_code.txt:74)."""
    land = tmp_path / "landing"
    for i in range(3):
        write_ndjson(land / f"f{i}.json", [good_record(300 + i * 10 + j) for j in range(2)])
    conf = IngestConfig(
        landing_dir=str(land),
        curated_dir=str(tmp_path / "curated"),
        dlq_dir=str(tmp_path / "dlq"),
        archive_dir=str(tmp_path / "archive"),
        ledger_dir=str(tmp_path / "ledger-unused"),
        jdbc_url=jdbc_url,
    )
    assert discover(spark, conf) == 3
    res = ingest_batch(spark, conf)
    assert len(res.succeeded_files) == 3 and res.good_rows == 6
    assert res.lost_claims == []
    led = JdbcLedger(spark, jdbc_url)
    assert led.counts() == {LedgerStatus.SUCCEEDED: 3}
    # snapshot-ledger directory untouched; archive + curated both real
    assert not any(Path(conf.ledger_dir).glob("v*"))
    assert read_curated(spark, conf.curated_dir).count() == 6
    assert len(list((tmp_path / "archive").rglob("*.json"))) == 3
    # idempotent re-run: nothing claimable
    res2 = ingest_batch(spark, conf)
    assert res2.claimed == 0


def test_jdbc_concurrent_runners_no_double_claim(spark, jdbc_url):
    """Two threads claiming from the same Derby ledger: guarded updates give
    SKIP LOCKED semantics — every file claimed exactly once across runners."""
    import threading

    led = JdbcLedger(spark, jdbc_url)
    _register(spark, led, [f"/c{i:03d}.json" for i in range(40)])

    claims: dict[str, list[str]] = {"a": [], "b": []}
    errors: list[BaseException] = []

    def runner(name: str) -> None:
        try:
            own = JdbcLedger(spark, jdbc_url)  # own connections per thread
            while True:
                got = own.claim_batch(3, f"run-{name}")
                if not got:
                    return
                claims[name].extend(got)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    ta = threading.Thread(target=runner, args=("a",))
    tb = threading.Thread(target=runner, args=("b",))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errors, errors
    assert set(claims["a"]) & set(claims["b"]) == set()
    assert len(claims["a"]) + len(claims["b"]) == 40
    assert led.counts() == {LedgerStatus.PROCESSING: 40}


def test_jdbc_two_runner_claim_process_commit_soak(spark, jdbc_url):
    """X5 closure: TWO runners loop full claim→process→commit cycles against
    one Derby ledger until it drains. The SKIP-LOCKED-equivalent guarded
    claims plus run-id commit fencing must give exactly-once processing:
    no file committed by both runners, none lost, every row SUCCEEDED with
    retry_count == 1 (claimed exactly once — fresh leases mean no reclaim
    pressure in this soak; see the contended variant below)."""
    import threading

    n_files = 120
    led = JdbcLedger(spark, jdbc_url)
    _register(spark, led, [f"/s{i:04d}.json" for i in range(n_files)])

    committed: dict[str, list[str]] = {"a": [], "b": []}
    fenced_out: dict[str, list[str]] = {"a": [], "b": []}
    errors: list[BaseException] = []

    def runner(name: str) -> None:
        try:
            own = JdbcLedger(spark, jdbc_url)
            run_id = f"run-{name}"
            while True:
                got = own.claim_batch(7, run_id)
                if not got:
                    return
                lost = own.apply_outcomes(
                    [(got, LedgerStatus.SUCCEEDED, None)], run_id=run_id
                )
                fenced_out[name].extend(lost)
                committed[name].extend(k for k in got if k not in set(lost))
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    ta = threading.Thread(target=runner, args=("a",))
    tb = threading.Thread(target=runner, args=("b",))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errors, errors
    assert fenced_out == {"a": [], "b": []}  # fresh leases: no interference
    assert set(committed["a"]) & set(committed["b"]) == set()
    assert len(committed["a"]) + len(committed["b"]) == n_files
    assert led.counts() == {LedgerStatus.SUCCEEDED: n_files}
    rows = led.read().collect()
    assert all(r.retry_count == 1 for r in rows)
    # Which runner wins each batch is scheduler-dependent (one side may even
    # drain everything); only the owner set's bounds are deterministic.
    assert {r.run_id for r in rows} <= {"run-a", "run-b"}


def test_jdbc_two_runner_soak_under_reclaim_contention(spark, jdbc_url):
    """The hostile variant: stale_lease_s=0 makes every PROCESSING row
    instantly reclaimable, so the runners continuously steal each other's
    in-flight claims. Fencing must convert every race into a lost claim for
    exactly one side — the union of successfully-committed files is still
    exactly-once (each file SUCCEEDED once, by whichever runner held the
    final claim), no file is lost, and no commit double-fires."""
    import threading

    n_files = 60
    led = JdbcLedger(spark, jdbc_url)
    _register(spark, led, [f"/h{i:04d}.json" for i in range(n_files)])

    committed: dict[str, list[str]] = {"a": [], "b": []}
    errors: list[BaseException] = []

    def runner(name: str) -> None:
        try:
            own = JdbcLedger(spark, jdbc_url)
            run_id = f"run-{name}"
            idle = 0
            while idle < 3:  # a few empty rounds: the other side may still hold claims
                got = own.claim_batch(5, run_id, stale_lease_s=0)
                if not got:
                    idle += 1
                    continue
                idle = 0
                lost = own.apply_outcomes(
                    [(got, LedgerStatus.SUCCEEDED, None)], run_id=run_id
                )
                committed[name].extend(k for k in got if k not in set(lost))
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    ta = threading.Thread(target=runner, args=("a",))
    tb = threading.Thread(target=runner, args=("b",))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errors, errors
    assert set(committed["a"]) & set(committed["b"]) == set()
    assert len(committed["a"]) + len(committed["b"]) == n_files
    assert led.counts() == {LedgerStatus.SUCCEEDED: n_files}
    # Under contention retries can exceed 1, but must stay bounded by the
    # number of steal rounds, and every row ends with SOME final owner.
    rows = led.read().collect()
    assert all(r.retry_count >= 1 and r.run_id in ("run-a", "run-b") for r in rows)


def test_jdbc_insert_dialect_selection():
    """PostgreSQL URLs get the native race-free ON CONFLICT DO NOTHING;
    everything else (Derby) gets the guarded NOT-EXISTS form."""
    from datalakejson_spark.plans.jdbc_ledger import _insert_sql

    pg = _insert_sql("jdbc:postgresql://db.example/ledger")
    assert "ON CONFLICT (s3_key) DO NOTHING" in pg
    assert "NOT EXISTS" not in pg
    derby = _insert_sql("jdbc:derby:/tmp/x;create=true")
    assert "NOT EXISTS" in derby and "ON CONFLICT" not in derby


def test_jdbc_register_survives_duplicate_key_race(spark, jdbc_url, monkeypatch):
    """The register/register race: both discoverers pass NOT EXISTS for the
    same new key; the loser's PK violation (SQLState 23505) must be an
    idempotent skip, and the other rows in its transaction must survive.
    Forced deterministically by stripping the NOT-EXISTS guard, so every
    duplicate insert takes the 23505 recovery path."""
    from datalakejson_spark.plans import jdbc_ledger as jl

    led = JdbcLedger(spark, jdbc_url)
    _register(spark, led, ["/dup.json"])

    unguarded = (
        f"INSERT INTO {jl._TABLE} (s3_key, file_size_bytes, status, "
        "retry_count, first_discovered_at, last_updated_at) "
        "SELECT ?, ?, ?, 0, CURRENT_TIMESTAMP, CURRENT_TIMESTAMP "
        "FROM SYSIBM.SYSDUMMY1 WHERE ? IS NOT NULL"
    )
    monkeypatch.setattr(jl, "_insert_sql", lambda url: unguarded)
    n = led.register(
        spark.createDataFrame(
            [("/dup.json", 10), ("/new1.json", 11), ("/new2.json", 12)],
            "s3_key string, file_size_bytes long",
        )
    )
    assert n == 2  # duplicate skipped, the rest of the batch committed
    assert led.counts() == {LedgerStatus.PENDING: 3}


def test_jdbc_concurrent_register_same_keys(spark, jdbc_url):
    """Two discoverers registering overlapping key sets concurrently: the
    union registers exactly once, neither raises."""
    import threading

    led = JdbcLedger(spark, jdbc_url)
    keys = [f"/r{i:03d}.json" for i in range(30)]
    new_counts: dict[str, int] = {}
    errors: list[BaseException] = []

    def runner(name: str, subset: list[str]) -> None:
        try:
            own = JdbcLedger(spark, jdbc_url)
            df = spark.createDataFrame(
                [(k, 10) for k in subset], "s3_key string, file_size_bytes long"
            )
            new_counts[name] = own.register(df)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    ta = threading.Thread(target=runner, args=("a", keys[:20]))
    tb = threading.Thread(target=runner, args=("b", keys[10:]))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errors, errors
    assert new_counts["a"] + new_counts["b"] == 30
    assert led.counts() == {LedgerStatus.PENDING: 30}
