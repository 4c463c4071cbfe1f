"""File-processing ledger: a row-per-file state machine.

Reference parity: the PostgreSQL ``file_processing_status`` table
(/root/reference/sudo_code.txt:25-49) with status enum PENDING → PROCESSING →
SUCCEEDED | FAILED (sudo_code.txt:35), ``retry_count`` incremented per claim
(sudo_code.txt:141), idempotent registration via ``ON CONFLICT (s3_key) DO
NOTHING`` (sudo_code.txt:90), and batch claims ``status IN
('PENDING','FAILED') ORDER BY created_at LIMIT n`` (sudo_code.txt:132).

RDS-free redesign (SURVEY.md §7.0): the ledger is a directory of immutable
parquet snapshots plus a ``_LATEST`` pointer file. Updates write a new
snapshot and atomically swap the pointer (single-file os.replace — POSIX
atomic), so a crash mid-update leaves the previous snapshot intact: the
reference's transactional UPDATE+COMMIT becomes snapshot-and-swap. Ledger
DataFrame ops (anti-join registration, claim, status upsert) are plain Spark;
at reference scale (~10^6 files, sudo_code.txt:7) a snapshot is a few MB —
at 10^9 files, partition snapshots by status so claims read only
PENDING/FAILED (the reference's ``idx_processing_status``, sudo_code.txt:49).

Multi-runner semantics: the reference serializes concurrent claims with
``FOR UPDATE SKIP LOCKED`` (psuedo_code.txt:170-181). The filesystem analogue
here is a lock file (O_CREAT|O_EXCL — atomic on POSIX and NFSv4+) held only
for the duration of each ledger read-modify-write: a claim marks its files
PROCESSING before releasing the lock, so a second runner's claim sees them
and skips them — exactly SKIP LOCKED. Locks abandoned by a dead runner are
broken after ``LOCK_STALE_S``. Files orphaned in PROCESSING by a hard crash
(SIGKILL between claim and commit) are reclaimed at claim time once their
``last_updated_at`` is older than the processing lease.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import time
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class LedgerStatus:
    PENDING = "PENDING"
    PROCESSING = "PROCESSING"
    SUCCEEDED = "SUCCEEDED"
    FAILED = "FAILED"
    # Declared in the reference's enum (sudo_code.txt:35) for rows whose file
    # was corrupt in its entirety and routed to the DLQ.
    QUARANTINED = "QUARANTINED"


# Mirrors sudo_code.txt:25-49 minus DB-isms (SERIAL id -> none needed;
# TIMESTAMP WITH TIME ZONE -> TimestampType, session tz pinned UTC).
LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("s3_key", T.StringType(), False),
        T.StructField("file_size_bytes", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("first_discovered_at", T.TimestampType(), False),
        T.StructField("last_updated_at", T.TimestampType(), False),
        T.StructField("run_id", T.StringType(), True),
    ]
)


# A runner that dies holding the lock must not wedge the fleet: locks older
# than this are broken. Ledger ops hold the lock for seconds, so 120 s of
# lock age means the holder is gone.
LOCK_STALE_S = 120.0

# PROCESSING rows whose last_updated_at is older than this are considered
# orphaned by a crashed runner and become claimable again (the reference's
# crash story relies on its DB transaction rollback; a snapshot ledger needs
# an explicit lease).
PROCESSING_LEASE_S = 1800.0


class Ledger:
    """Parquet-snapshot ledger with atomic pointer swap and a lock-file mutex
    serializing concurrent runners' read-modify-write cycles."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- multi-runner mutex --------------------------------------------------
    @property
    def _lockfile(self) -> Path:
        return self.root / "_LOCK"

    @contextlib.contextmanager
    def _mutex(self, timeout_s: float = 60.0):
        """Exclusive inter-process lock around a ledger read-modify-write.
        O_CREAT|O_EXCL is the atomic primitive; a stale lock (holder died) is
        broken after LOCK_STALE_S."""
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(self._lockfile, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, f"pid={os.getpid()} t={time.time()}".encode())
                os.close(fd)
                break
            except FileExistsError:
                try:
                    age = time.time() - self._lockfile.stat().st_mtime
                    if age > LOCK_STALE_S:
                        self._lockfile.unlink(missing_ok=True)  # break stale lock
                        continue
                except FileNotFoundError:
                    continue  # holder released between open and stat — retry now
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"ledger lock {self._lockfile} held for >{timeout_s}s"
                    ) from None
                time.sleep(0.05)
        try:
            yield
        finally:
            self._lockfile.unlink(missing_ok=True)

    # -- snapshot plumbing --------------------------------------------------
    @property
    def _pointer(self) -> Path:
        return self.root / "_LATEST"

    def _current_version(self) -> str | None:
        try:
            return self._pointer.read_text().strip() or None
        except FileNotFoundError:
            return None

    def read(self) -> DataFrame:
        version = self._current_version()
        if version is None:
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        return self.spark.read.schema(LEDGER_SCHEMA).parquet(str(self.root / version))

    def overwrite(self, df: DataFrame) -> None:
        """Write a new snapshot, atomically swap the pointer, prune old ones."""
        version = f"v{time.time_ns()}"
        out = self.root / version
        df.select([f.name for f in LEDGER_SCHEMA.fields]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(out))
        tmp = self.root / "_LATEST.tmp"
        tmp.write_text(version)
        os.replace(tmp, self._pointer)  # atomic commit point
        self._prune(keep=3, current=version)

    def _prune(self, keep: int, current: str) -> None:
        snaps = sorted(
            (p for p in self.root.iterdir() if p.is_dir() and p.name.startswith("v")),
            key=lambda p: p.name,
        )
        for stale in snaps[:-keep]:
            if stale.name != current:
                shutil.rmtree(stale, ignore_errors=True)

    # -- reference operations ----------------------------------------------
    def register(self, discovered: DataFrame) -> int:
        """Idempotent insert of (s3_key, file_size_bytes) rows as PENDING —
        the ``ON CONFLICT DO NOTHING`` anti-join (J1; sudo_code.txt:90).
        Returns the number of newly registered files."""
        with self._mutex():
            current = self.read()
            now = F.current_timestamp()
            fresh = (
                discovered.select("s3_key", "file_size_bytes")
                .dropDuplicates(["s3_key"])
                .join(current.select("s3_key"), "s3_key", "left_anti")
                .withColumn("status", F.lit(LedgerStatus.PENDING))
                .withColumn("retry_count", F.lit(0))
                .withColumn("error_message", F.lit(None).cast("string"))
                .withColumn("first_discovered_at", now)
                .withColumn("last_updated_at", now)
                .withColumn("run_id", F.lit(None).cast("string"))
            )
            fresh = fresh.persist()  # count + overwrite: one anti-join execution
            try:
                n_new = fresh.count()
                if n_new:
                    self.overwrite(current.unionByName(fresh))
            finally:
                fresh.unpersist()
            return n_new

    def claim_batch(
        self,
        batch_size: int,
        run_id: str,
        stale_lease_s: float = PROCESSING_LEASE_S,
    ) -> list[str]:
        """Claim up to ``batch_size`` claimable files oldest-first and mark
        them PROCESSING with retry_count+1 (sudo_code.txt:132,141).
        Returns the claimed paths (driver-side list, bounded by batch_size —
        the same bounded collect the reference does).

        SKIP LOCKED semantics (psuedo_code.txt:170-181): select-and-mark runs
        under the ledger mutex, so a concurrent runner's claim sees this
        batch already PROCESSING and takes the next files instead. PROCESSING
        rows whose lease expired (runner died between claim and commit) are
        claimable again — nothing is stranded by a SIGKILL."""
        with self._mutex():
            current = self.read()
            stale = (F.col("status") == LedgerStatus.PROCESSING) & (
                F.col("last_updated_at")
                < F.current_timestamp() - F.expr(f"INTERVAL {int(stale_lease_s)} SECONDS")
            )
            claimable = (
                current.filter(
                    F.col("status").isin(LedgerStatus.PENDING, LedgerStatus.FAILED)
                    | stale
                )
                .orderBy("first_discovered_at", "s3_key")
                .limit(batch_size)
            )
            paths = [r.s3_key for r in claimable.select("s3_key").collect()]
            if paths:
                self._set_status_unlocked(
                    paths,
                    LedgerStatus.PROCESSING,
                    run_id=run_id,
                    increment_retry=True,
                )
            return paths

    def set_status(
        self,
        paths: list[str] | DataFrame,
        status: str,
        error_message: str | None = None,
        run_id: str | None = None,
        increment_retry: bool = False,
    ) -> None:
        """Transition the given files to ``status`` (sudo_code.txt:141,
        psuedo_code.txt:207,241)."""
        with self._mutex():
            self._set_status_unlocked(
                paths,
                status,
                error_message=error_message,
                run_id=run_id,
                increment_retry=increment_retry,
            )

    def _set_status_unlocked(
        self,
        paths: list[str] | DataFrame,
        status: str,
        error_message: str | None = None,
        run_id: str | None = None,
        increment_retry: bool = False,
    ) -> None:
        current = self.read()
        if isinstance(paths, DataFrame):
            keys = paths.select(F.col(paths.columns[0]).alias("s3_key"))
        else:
            keys = self.spark.createDataFrame(
                [(p,) for p in paths], "s3_key string"
            )
        hit = F.col("_hit").isNotNull()
        updated = (
            current.join(
                F.broadcast(keys.withColumn("_hit", F.lit(1))), "s3_key", "left"
            )
            .withColumn(
                "status", F.when(hit, F.lit(status)).otherwise(F.col("status"))
            )
            .withColumn(
                "retry_count",
                F.when(hit & F.lit(increment_retry), F.col("retry_count") + 1).otherwise(
                    F.col("retry_count")
                ),
            )
            .withColumn(
                "error_message",
                F.when(hit, F.lit(error_message)).otherwise(F.col("error_message")),
            )
            .withColumn(
                "last_updated_at",
                F.when(hit, F.current_timestamp()).otherwise(F.col("last_updated_at")),
            )
            .withColumn(
                "run_id",
                F.when(hit & F.lit(run_id is not None), F.lit(run_id)).otherwise(
                    F.col("run_id")
                ),
            )
            .drop("_hit")
        )
        self.overwrite(updated)

    def apply_outcomes(
        self, outcomes: list[tuple[list[str], str, str | None]], run_id: str
    ) -> None:
        """Apply several status transitions in ONE snapshot write:
        ``outcomes`` is [(paths, status, error_message), ...]. A batch's
        commit touches the ledger once instead of once per status group —
        the ledger write amplification is O(1) per batch, not O(states)."""
        rows = [
            (p, status, msg)
            for paths, status, msg in outcomes
            for p in paths
        ]
        if not rows:
            return
        updates = self.spark.createDataFrame(
            rows, "s3_key string, new_status string, new_error string"
        ).dropDuplicates(["s3_key"])
        with self._mutex():
            self._apply_updates_unlocked(updates, run_id)

    def _apply_updates_unlocked(self, updates: DataFrame, run_id: str) -> None:
        current = self.read()
        hit = F.col("new_status").isNotNull()
        merged = (
            current.join(F.broadcast(updates), "s3_key", "left")
            .withColumn(
                "status", F.when(hit, F.col("new_status")).otherwise(F.col("status"))
            )
            .withColumn(
                "error_message",
                F.when(hit, F.col("new_error")).otherwise(F.col("error_message")),
            )
            .withColumn(
                "last_updated_at",
                F.when(hit, F.current_timestamp()).otherwise(F.col("last_updated_at")),
            )
            .withColumn(
                "run_id", F.when(hit, F.lit(run_id)).otherwise(F.col("run_id"))
            )
            .drop("new_status", "new_error")
        )
        self.overwrite(merged)

    def counts(self) -> dict[str, int]:
        return {
            r["status"]: r["n"]
            for r in self.read().groupBy("status").agg(F.count("*").alias("n")).collect()
        }
