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
DataFrame ops (anti-join registration, claim, status upsert) are plain Spark.

Status-partitioned snapshot (round 8 — the measured fix for the ~4x10^6-file
crossover in SCALE.md's ledger curve): the state is split into an ACTIVE part
(PENDING/PROCESSING/FAILED — the working set, fully rewritten per batch) and
append-only TERMINAL segments (SUCCEEDED/QUARANTINED — the steady-state
majority, written once when a row completes and never rewritten). The
``_LATEST`` pointer names both parts in one JSON line, so the swap is still a
single atomic os.replace. A steady batch therefore writes O(active)+O(batch)
instead of O(all files); claims read ONLY the active part (the reference's
``idx_processing_status``, sudo_code.txt:49). The rare operational move of a
key OUT of a terminal segment (e.g. re-enqueueing a SUCCEEDED file as FAILED)
falls back to one full compaction write; segment count is bounded by
compaction at MAX_TERMINAL_SEGMENTS. Legacy single-snapshot pointers are read
transparently and migrate to the split layout on their next write.

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
import json
import os
import shutil
import threading
import time
import uuid
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.session import local_df
from pyspark.sql import types as T


class LedgerStatus:
    PENDING = "PENDING"
    PROCESSING = "PROCESSING"
    SUCCEEDED = "SUCCEEDED"
    FAILED = "FAILED"
    # Declared in the reference's enum (sudo_code.txt:35) for rows whose file
    # was corrupt in its entirety and routed to the DLQ.
    QUARANTINED = "QUARANTINED"


# Snapshot split: the working set (rewritten per batch) vs completed rows
# (append-only segments, never rewritten in steady state).
ACTIVE_STATUSES = (
    LedgerStatus.PENDING,
    LedgerStatus.PROCESSING,
    LedgerStatus.FAILED,
)
TERMINAL_STATUSES = (LedgerStatus.SUCCEEDED, LedgerStatus.QUARANTINED)

# One terminal segment is appended per completing batch; above this many the
# next write folds them into one (amortized O(terminal/64) per batch).
MAX_TERMINAL_SEGMENTS = 64

# Adaptive split deferral (round 9 — the backfill-phase fix): while terminal
# rows are at most this fraction of the active dir, a commit keeps them IN
# the active part (one plain write, exactly the legacy cost model) instead of
# paying the two-pass split + segment append + probe machinery. The
# reference's opening act is an all-PENDING backfill where the terminal
# fraction is ~0 and the split bought nothing (r8: 9.0 vs legacy 6.7 s at
# 10^6); once deferred terminal rows reach the threshold — or the working
# set shrinks toward the terminal-majority steady state, where each batch's
# completions easily exceed it — the next commit splits ALL accumulated
# terminal rows out in one segment write and the active part returns to the
# pure working set. Write amplification of deferral is bounded by the
# threshold itself (each deferred rewrite carries <= 5% extra rows).
TERMINAL_SPLIT_MIN_FRAC = 0.05


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


# A runner that dies holding the lock must not wedge the fleet: locks whose
# mtime is older than this are broken. A LIVE holder heartbeats the lockfile
# mtime every LOCK_HEARTBEAT_S from a daemon thread, so lock age is decoupled
# from how long the critical section runs (a ledger snapshot write is a full
# Spark job and can far exceed any fixed budget under GC/FS stalls) — only a
# dead process stops touching its lock. 600 s therefore means "no heartbeat
# for 10 minutes", not "critical section slower than 10 minutes".
LOCK_STALE_S = 600.0
LOCK_HEARTBEAT_S = 5.0

# PROCESSING rows whose last_updated_at is older than this are considered
# orphaned by a crashed runner and become claimable again (the reference's
# crash story relies on its DB transaction rollback; a snapshot ledger needs
# an explicit lease).
PROCESSING_LEASE_S = 1800.0


class LedgerLockLost(RuntimeError):
    """The mutex token vanished mid-critical-section: a stale-break racer
    renamed our fresh lock away and its restore lost to a new acquirer
    (see ``_break_if_stale``). ``overwrite`` raises this BEFORE the pointer
    swap — nothing was published — and the public operations retry their
    whole read-modify-write under a fresh acquisition."""


class Ledger:
    """Parquet-snapshot ledger with atomic pointer swap and a lock-file mutex
    serializing concurrent runners' read-modify-write cycles."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._held = threading.local()  # token while inside _mutex, per thread

    # -- multi-runner mutex --------------------------------------------------
    @property
    def _lockfile(self) -> Path:
        return self.root / "_LOCK"

    @contextlib.contextmanager
    def _mutex(self, timeout_s: float = 60.0):
        """Exclusive inter-process lock around a ledger read-modify-write.

        O_CREAT|O_EXCL is the atomic acquisition primitive. Three hardenings
        over a naive lockfile (each closes a real race):

        - **Ownership token**: the lockfile body is a unique token. Release
          unlinks only if the body still matches (``_unlink_if_owner``), so a
          holder whose lock was broken while it ran can never delete the NEW
          holder's lock from its ``finally``.
        - **Heartbeat**: while held, a daemon thread touches the lockfile
          mtime every LOCK_HEARTBEAT_S. A live-but-slow holder (long Spark
          job, GC pause) therefore never looks stale; only a dead process
          goes quiet for LOCK_STALE_S.
        - **Atomic stale-break**: a waiter that observes a stale lock breaks
          it by ``os.rename()`` to a unique name, re-verifies staleness on
          the renamed inode, then unlinks THAT file. Rename captures exactly
          one inode — when two waiters race, the loser's rename fails ENOENT
          instead of blindly unlinking the path (which could by then hold the
          winner's brand-new lock)."""
        token = f"pid={os.getpid()} token={uuid.uuid4().hex}"
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(self._lockfile, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode())
                os.close(fd)
                break
            except FileExistsError:
                if self._break_if_stale():
                    continue  # lock broken (or vanished) — retry immediately
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"ledger lock {self._lockfile} held for >{timeout_s}s"
                    ) from None
                time.sleep(0.05)
        stop = threading.Event()
        beat = threading.Thread(
            target=self._heartbeat, args=(stop, token), daemon=True
        )
        beat.start()
        self._held.token = token
        try:
            yield
        finally:
            self._held.token = None
            stop.set()
            beat.join(timeout=2 * LOCK_HEARTBEAT_S)
            self._unlink_if_owner(token)

    def _break_if_stale(self) -> bool:
        """Break the current lock iff its heartbeat stopped LOCK_STALE_S ago.
        Returns True when the caller should retry acquisition right away
        (lock broken or already gone)."""
        try:
            age = time.time() - self._lockfile.stat().st_mtime
        except FileNotFoundError:
            return True  # holder released between open and stat
        if age <= LOCK_STALE_S:
            return False
        wreck = self.root / f"_LOCK.stale.{uuid.uuid4().hex[:12]}"
        try:
            os.rename(self._lockfile, wreck)  # atomic: captures ONE inode
        except FileNotFoundError:
            return True  # another breaker (or the holder) got there first
        try:
            still_stale = time.time() - wreck.stat().st_mtime > LOCK_STALE_S
        except FileNotFoundError:
            return True
        if still_stale:
            wreck.unlink(missing_ok=True)  # confirmed dead — bury it
            return True
        # Rare race: the path held a FRESH lock by rename time (old holder
        # released and a new one acquired between our stat and rename).
        # Restore it atomically; link() fails EEXIST rather than clobbering
        # if yet another acquirer already took the slot.
        try:
            os.link(wreck, self._lockfile)
        except (FileExistsError, OSError):
            pass
        wreck.unlink(missing_ok=True)
        return False

    def _heartbeat(self, stop: threading.Event, token: str) -> None:
        """Touch the lockfile mtime while the critical section runs, so a
        live holder never ages past LOCK_STALE_S. Stops heartbeating if the
        lock no longer carries our token (stolen/broken) — run_id fencing at
        commit is the data-integrity guard for that case."""
        while not stop.wait(LOCK_HEARTBEAT_S):
            try:
                if self._lockfile.read_text() != token:
                    return  # not ours anymore — never touch someone else's lock
                os.utime(self._lockfile)
            except OSError:
                continue  # transiently renamed by a staleness probe — retry

    def _unlink_if_owner(self, token: str) -> None:
        """Release only a lock we still own. If the body is not our token,
        the lock was broken and re-acquired by someone else — leave it."""
        try:
            if self._lockfile.read_text() == token:
                self._lockfile.unlink(missing_ok=True)
        except OSError:
            pass

    # -- snapshot plumbing --------------------------------------------------
    @property
    def _pointer(self) -> Path:
        return self.root / "_LATEST"

    def _pointer_meta(self) -> dict | None:
        """The split-format pointer dict, or None (missing/legacy)."""
        try:
            txt = self._pointer.read_text().strip()
        except FileNotFoundError:
            return None
        if txt.startswith("{"):
            return json.loads(txt)
        return None

    def _current_parts(self) -> tuple[str | None, list[str], bool]:
        """(active_version, terminal_segments, is_legacy). A legacy pointer
        (pre-split: one bare version name) reads as the active part holding
        ALL rows — including terminal ones — and migrates to the split
        layout on its next write."""
        try:
            txt = self._pointer.read_text().strip()
        except FileNotFoundError:
            return None, [], False
        if not txt:
            return None, [], False
        if txt.startswith("{"):
            d = json.loads(txt)
            return d.get("active"), list(d.get("terminal", [])), False
        return txt, [], True

    def _deferred_terminal(self) -> int | None:
        """Terminal rows currently riding in the active dir (an UPPER bound
        — see _commit_active_update), or None when unknowable (legacy
        pointer). Pre-round-9 split pointers lack the field and never
        deferred, so 0 is exact for them."""
        d = self._pointer_meta()
        if d is None:
            return None if self._pointer.exists() else 0
        return int(d.get("deferred_terminal", 0))

    def _active_row_count(self) -> int | None:
        """Row count of the active dir from parquet FOOTER metadata — a
        driver-side file-stat, no Spark job. None when unavailable (the
        caller falls back to counting)."""
        active, _segs, legacy = self._current_parts()
        if not active or legacy:
            return None
        try:
            import pyarrow.parquet as pq

            return sum(
                pq.ParquetFile(str(f)).metadata.num_rows
                for f in (self.root / active).glob("*.parquet")
            )
        except Exception:  # noqa: BLE001 — advisory fast path only
            return None

    def _read_dirs(self, names: list[str]) -> DataFrame:
        paths = [str(self.root / n) for n in names]
        if not paths:
            return local_df(self.spark, [], LEDGER_SCHEMA)
        return self.spark.read.schema(LEDGER_SCHEMA).parquet(*paths)

    def read(self) -> DataFrame:
        active, segs, _legacy = self._current_parts()
        return self._read_dirs(([active] if active else []) + segs)

    # -- per-segment key-range sidecars (round 9) ----------------------------
    # Written INSIDE the segment dir as ``_RANGE.json`` (the leading
    # underscore makes Spark's parquet reader treat it as metadata), so the
    # sidecar travels with the segment through folds and prunes. Advisory:
    # a missing/corrupt sidecar merely means the probe must include that
    # segment (legacy segments keep working). This is the reference's
    # ``idx_processing_status``+pkey analogue for the terminal majority: a
    # commit-path probe over 10^8 terminal rows touches only segments whose
    # [min,max] s3_key range can contain a batch key, so probe cost tracks
    # batch locality instead of total history.
    def _write_seg_range(self, seg: str, kmin: str | None, kmax: str | None) -> None:
        if kmin is None or kmax is None:
            return  # empty segment (never published in practice) — no sidecar
        from datalakejson_spark.fsutil import atomic_write_json

        try:
            atomic_write_json(
                str(self.root / seg / "_RANGE.json"),
                {"min": kmin, "max": kmax},
            )
        except OSError:
            pass  # advisory — probe stays conservative

    def _seg_range(self, seg: str) -> tuple[str, str] | None:
        try:
            d = json.loads((self.root / seg / "_RANGE.json").read_text())
            return str(d["min"]), str(d["max"])
        except (OSError, ValueError, KeyError, TypeError):
            # TypeError covers valid-but-non-dict JSON (null/list/scalar):
            # ANY unreadable sidecar degrades to a conservative scan.
            return None

    def _dir_key_stats(self, dirname: str) -> tuple[str, str] | None:
        """min/max s3_key of a written parquet dir from FOOTER column
        statistics — driver-side, no Spark job (the _active_row_count
        pattern). Parquet stat truncation keeps the bounds conservative: a
        truncated min is a prefix (<= true min) and a truncated max has its
        last byte incremented (>= true max). None when any file lacks
        usable stats (caller falls back to an aggregation job)."""
        try:
            import pyarrow.parquet as pq

            mins: list[str] = []
            maxs: list[str] = []
            for f in (self.root / dirname).glob("*.parquet"):
                md = pq.ParquetFile(str(f)).metadata
                for rg in range(md.num_row_groups):
                    for ci in range(md.num_columns):
                        col = md.row_group(rg).column(ci)
                        if col.path_in_schema != "s3_key":
                            continue
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            return None
                        mins.append(str(st.min))
                        maxs.append(str(st.max))
            if not mins:
                return None
            return min(mins), max(maxs)
        except Exception:  # noqa: BLE001 — advisory fast path only
            return None

    def _key_bounds(self, keys: DataFrame) -> tuple[str | None, str | None]:
        row = keys.agg(
            F.min("s3_key").alias("kmin"), F.max("s3_key").alias("kmax")
        ).first()
        return (row.kmin, row.kmax) if row else (None, None)

    def _segs_for_keys(
        self, segs: list[str], kmin: str | None, kmax: str | None
    ) -> list[str]:
        """Segments whose key range can intersect [kmin, kmax]; segments
        without a sidecar are conservatively included."""
        if kmin is None or kmax is None:
            return []  # no keys — nothing can hit
        out = []
        for s in segs:
            r = self._seg_range(s)
            if r is None or (r[0] <= kmax and kmin <= r[1]):
                out.append(s)
        return out

    def _active_part(self) -> DataFrame:
        """Contents of the active DIR (unfiltered: under a legacy pointer it
        still holds terminal rows until the next write migrates them)."""
        active, _segs, _legacy = self._current_parts()
        return self._read_dirs([active] if active else [])

    def _owns_lock(self) -> bool:
        """Does the lockfile still carry this thread's mutex token? Outside a
        mutex (direct overwrite in tests/tools) there is nothing to verify."""
        token = getattr(self._held, "token", None)
        if token is None:
            return True
        try:
            return self._lockfile.read_text() == token
        except OSError:
            return False  # renamed/unlinked — dispossessed either way

    def overwrite(self, df: DataFrame) -> None:
        """Full-state last-writer-wins write (kept public; used by the rare
        paths — terminal re-enqueue compaction, tools). Splits ``df`` by
        status group into a fresh active part + ONE terminal segment: this
        is also what compacts legacy layouts and folds accumulated
        segments. A state with zero terminal rows publishes no segment
        (ADVICE r8: never create empty segment dirs)."""
        df = df.persist()
        try:
            terminal = df.filter(F.col("status").isin(*TERMINAL_STATUSES))
            self._publish(
                df.filter(F.col("status").isin(*ACTIVE_STATUSES)),
                [],
                terminal if terminal.limit(1).count() else None,
                deferred_terminal=0,  # active part is status-filtered
            )
        finally:
            df.unpersist()

    def _publish(
        self,
        active_df: DataFrame,
        segments: list[str],
        new_segment_df: DataFrame | None = None,
        deferred_terminal: int | None = None,
    ) -> None:
        """Write the active part (and optionally one appended terminal
        segment), fold segments when over MAX_TERMINAL_SEGMENTS, then
        atomically swap the pointer and prune unreferenced dirs.

        Dispossession guard (the _break_if_stale restore race): immediately
        before the pointer swap, re-verify the lockfile still carries our
        token. A holder whose fresh lock was renamed away by a staleness
        probe and lost to a new acquirer must NOT publish — its snapshot is
        last-writer-wins and would erase the new holder's transitions.
        Raising here (nothing published yet; the orphan directories are
        pruned by later publishes) lets the operation retry its whole
        read-modify-write under a fresh acquisition."""
        ns = time.time_ns()
        version = f"v{ns}"
        cols = [f.name for f in LEDGER_SCHEMA.fields]
        active_df.select(cols).repartition(1).write.mode("overwrite").parquet(
            str(self.root / version)
        )
        segs = list(segments)
        if new_segment_df is not None:
            seg = f"t{ns}"
            new_segment_df.select(cols).repartition(1).write.mode(
                "overwrite"
            ).parquet(str(self.root / seg))
            # Sidecar bounds come from the just-written file's footer stats
            # (driver-side, no job); the aggregation is only the fallback.
            self._write_seg_range(
                seg,
                *(self._dir_key_stats(seg) or self._key_bounds(new_segment_df)),
            )
            segs.append(seg)
        if len(segs) > MAX_TERMINAL_SEGMENTS:
            merged = f"t{ns}c"
            folded = self._read_dirs(segs)
            folded.select(cols).repartition(1).write.mode(
                "overwrite"
            ).parquet(str(self.root / merged))
            # Fold the sidecars driver-side when every input has one; a
            # legacy (pre-sidecar) segment falls back to the merged file's
            # own footer stats, then to a re-scan.
            ranges = [self._seg_range(s) for s in segs]
            if all(r is not None for r in ranges):
                self._write_seg_range(
                    merged,
                    min(r[0] for r in ranges),
                    max(r[1] for r in ranges),
                )
            else:
                self._write_seg_range(
                    merged,
                    *(self._dir_key_stats(merged) or self._key_bounds(folded)),
                )
            segs = [merged]
        if not self._owns_lock():
            raise LedgerLockLost(
                f"ledger lock {self._lockfile} stolen mid-write; snapshot "
                f"{version} aborted before publish"
            )
        if deferred_terminal is None:
            # Preserve the current deferral bookkeeping (writes that cannot
            # change the active dir's terminal content: register, claim).
            deferred_terminal = self._deferred_terminal() or 0
        # Monotonic publish counter: read-increment under the mutex, so it
        # advances by exactly one per publish REGARDLESS of which machine's
        # clock minted the version name — the retirement grace counts these,
        # never wall-clock-derived names (see _prune).
        meta = self._pointer_meta() or {}
        seq = int(meta.get("publish_seq", 0)) + 1
        from datalakejson_spark.fsutil import unique_tmp

        tmp = self.root / unique_tmp("_LATEST")
        tmp.write_text(
            json.dumps(
                {
                    "active": version,
                    "terminal": segs,
                    "deferred_terminal": deferred_terminal,
                    "publish_seq": seq,
                }
            )
        )
        os.replace(tmp, self._pointer)  # atomic commit point
        self._prune(keep=3, current=version, segments=segs, seq=seq)

    def _retrying(self, body, attempts: int = 5):
        """Run ``body`` inside the mutex, retrying the whole read-modify-write
        when the lock was stolen mid-flight (LedgerLockLost aborts before any
        state is published, so a retry is a clean re-application on whatever
        the winning holder committed)."""
        last: LedgerLockLost | None = None
        for _ in range(attempts):
            try:
                with self._mutex():
                    return body()
            except LedgerLockLost as exc:
                last = exc
        raise last

    def _prune(
        self, keep: int, current: str, segments: list[str], seq: int
    ) -> None:
        """Delete old active versions (keep the newest ``keep`` so lock-free
        readers holding a slightly stale pointer never lose their dirs) and
        RETIRED terminal segments after the same grace window.

        A segment's own timestamp says when it was CREATED, not when it was
        dropped from the pointer (a fold retires segments that are many
        publishes old), so deletion-by-age would yank dirs out from under a
        lock-free reader holding the immediately-previous pointer
        (monitor counts, owned_by, _finish_interrupted_archives). Instead,
        an unreferenced segment is first recorded in the advisory
        ``_RETIRED`` journal with the pointer's ``publish_seq`` at
        retirement, and deleted only once at least ``keep`` further
        publishes have happened — the identical grace the active versions
        get. The counter is incremented read-modify-write under the mutex,
        so the grace is genuinely publish-COUNT-based: version names are
        minted by whichever runner machine publishes, and under
        cross-machine clock skew a name-comparison grace (the first cut of
        this fix) could still collapse to one publish — a skewed-behind
        runner's version name sorts below every kept name immediately. A
        monotonic counter has no such failure mode. The journal is advisory
        (corruption → grace restarts, segments merely linger) and written
        atomically (tmp + os.replace) so a crash mid-write can never
        truncate it."""
        snaps = sorted(
            (p for p in self.root.iterdir() if p.is_dir() and p.name.startswith("v")),
            key=lambda p: p.name,
        )
        for stale in snaps[:-keep]:
            if stale.name != current:
                shutil.rmtree(stale, ignore_errors=True)
        referenced = set(segments)
        retired_path = self.root / "_RETIRED"
        try:
            retired: dict[str, object] = json.loads(retired_path.read_text())
        except (FileNotFoundError, ValueError):
            retired = {}
        changed = False
        live = set()
        for p in self.root.iterdir():
            if not (p.is_dir() and p.name.startswith("t")):
                continue
            live.add(p.name)
            if p.name in referenced:
                if p.name in retired:  # defensive: re-referenced
                    retired.pop(p.name)
                    changed = True
                continue
            stamp = retired.get(p.name)
            stamp_seq = stamp.get("seq") if isinstance(stamp, dict) else None
            if not isinstance(stamp_seq, int):
                # New retirement — or a legacy entry (r8 timestamp int / r9.0
                # version-name string), whose grace restarts under the
                # counter scheme (advisory: the segment merely lingers a few
                # more publishes).
                retired[p.name] = {"seq": seq}  # grace starts at retirement
                changed = True
            elif seq - stamp_seq >= keep:
                # >= ``keep`` publishes since retirement: no lock-free
                # reader can still hold a pointer naming this segment.
                shutil.rmtree(p, ignore_errors=True)
                retired.pop(p.name)
                changed = True
        for name in list(retired):  # drop entries whose dir is gone
            if name not in live:
                retired.pop(name)
                changed = True
        if changed:
            from datalakejson_spark.fsutil import atomic_write_json

            atomic_write_json(str(retired_path), retired)

    # -- reference operations ----------------------------------------------
    def register(self, discovered: DataFrame) -> int:
        """Idempotent insert of (s3_key, file_size_bytes) rows as PENDING —
        the ``ON CONFLICT DO NOTHING`` anti-join (J1; sudo_code.txt:90).
        Returns the number of newly registered files."""

        def body() -> int:
            # The anti-join reads ALL keys (active + terminal — a completed
            # file must not re-register), column-pruned to s3_key; the WRITE
            # touches only the active part (new rows are all PENDING).
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
            ).persist()  # count + publish: one anti-join execution
            try:
                n_new = fresh.count()
                if n_new:
                    _active, segs, legacy = self._current_parts()
                    if legacy:
                        self.overwrite(current.unionByName(fresh))
                    else:
                        self._publish(
                            self._active_part().unionByName(fresh), segs
                        )
            finally:
                fresh.unpersist()
            return n_new

        return self._retrying(body)

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
        claimable again — nothing is stranded by a SIGKILL.

        Reads ONLY the active part of the split snapshot — the terminal
        majority never participates in a claim (the reference's
        ``idx_processing_status`` index, sudo_code.txt:49)."""
        with self._mutex():
            current = self._active_part()
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
                    _keys_known_active=True,  # picked from the active part
                )
            return paths

    def set_status(
        self,
        paths: list[str] | DataFrame,
        status: str,
        error_message: str | None = None,
        run_id: str | None = None,
        increment_retry: bool = False,
        fence_run_id: str | None = None,
    ) -> list[str]:
        """Transition the given files to ``status`` (sudo_code.txt:141,
        psuedo_code.txt:207,241).

        ``fence_run_id``: when set, a row transitions ONLY if its current
        ``run_id`` equals the fence — the snapshot-ledger analogue of the
        reference's transactional ``UPDATE ... WHERE id = ?`` inside the
        claim's DB transaction. A slow runner whose PROCESSING lease expired
        and whose files were reclaimed by another runner is fenced out here
        instead of silently overwriting the new owner's state. Returns the
        fenced-out (lost-claim) paths; empty when not fencing."""
        with self._mutex():
            return self._set_status_unlocked(
                paths,
                status,
                error_message=error_message,
                run_id=run_id,
                increment_retry=increment_retry,
                fence_run_id=fence_run_id,
            )

    def _terminal_hit(
        self,
        segs: list[str],
        keys: DataFrame,
        fence_run_id: str | None,
        key_bounds: tuple[str | None, str | None] | None = None,
    ) -> bool:
        """Does any requested key currently live in a terminal segment AND
        could its transition actually apply? Read-only key-pruned probe;
        True routes the operation to the rare full-compaction path (a
        terminal row is genuinely being transitioned). Under a fence only
        terminal rows CARRYING the fence run_id can transition — a row
        reclaimed-and-completed by another runner carries that runner's id,
        is fenced out untouched, and must NOT trigger a spurious O(N)
        rewrite (a routine lease-expiry race, not an operator action).

        Range-pruned (round 9): only segments whose ``_RANGE.json`` sidecar
        can contain a batch key are scanned, so the probe cost tracks batch
        key locality, not total terminal history."""
        if not segs:
            return False
        if key_bounds is None:
            key_bounds = self._key_bounds(keys)
        segs = self._segs_for_keys(segs, *key_bounds)
        if not segs:
            return False
        term = self._read_dirs(segs).join(
            F.broadcast(keys.select("s3_key")), "s3_key", "left_semi"
        )
        if fence_run_id is not None:
            term = term.filter(F.col("run_id") == F.lit(fence_run_id))
        return term.limit(1).count() > 0

    def _fenced_out(
        self,
        keys: DataFrame,
        fence_run_id: str,
        key_bounds: tuple[str | None, str | None] | None = None,
    ) -> list[str]:
        """Requested keys whose current row does NOT carry the fence run_id
        (lost claims). Bounded by the batch's key list; reads the active
        part plus only the terminal segments whose key range can contain a
        batch key (a reclaimed row may already sit in a terminal segment,
        but the ``_RANGE.json`` sidecars exclude the segments that cannot
        hold one — the commit path stays O(active + touched segments), not
        O(all history)."""
        active, segs, _legacy = self._current_parts()
        if key_bounds is None:
            key_bounds = self._key_bounds(keys)
        segs = self._segs_for_keys(segs, *key_bounds)
        state = self._read_dirs(([active] if active else []) + segs)
        return [
            r.s3_key
            for r in state
            .join(F.broadcast(keys.select("s3_key")), "s3_key", "left_semi")
            .filter(
                F.col("run_id").isNull()
                | (F.col("run_id") != F.lit(fence_run_id))
            )
            .select("s3_key")
            .collect()
        ]

    def _route_update(
        self,
        keys: DataFrame,
        transform,
        fence_run_id: str | None,
        may_move: bool,
        skip_probe: bool = False,
        batch_terminal_bound: int | None = None,
        key_bounds: tuple[str | None, str | None] | None = None,
    ) -> None:
        """Shared routing tail of the two update paths (set_status /
        apply_outcomes): fast active-part publish, or the rare full
        compaction when a terminal row is genuinely being transitioned.
        ``batch_terminal_bound``: driver-side upper bound on how many rows
        this update can move to a terminal status (enables the no-persist
        deferral fast path in _commit_active_update). ``key_bounds``:
        driver-side (min, max) of the batch keys where known — saves the
        probe its aggregation job."""
        _active, segs, legacy = self._current_parts()
        if (
            not skip_probe
            and not legacy
            and self._terminal_hit(segs, keys, fence_run_id, key_bounds)
        ):
            self.overwrite(transform(self.read()))
            return
        self._commit_active_update(
            transform(self._active_part()),
            segs,
            may_move or legacy,
            batch_terminal_bound=None if legacy else batch_terminal_bound,
        )

    def _set_status_unlocked(
        self,
        paths: list[str] | DataFrame,
        status: str,
        error_message: str | None = None,
        run_id: str | None = None,
        increment_retry: bool = False,
        fence_run_id: str | None = None,
        _keys_known_active: bool = False,
    ) -> list[str]:
        if isinstance(paths, DataFrame):
            keys = paths.select(F.col(paths.columns[0]).alias("s3_key"))
            kb = None  # computed (once) by the consumers that need it
        else:
            keys = local_df(
                self.spark, [(p,) for p in paths], "s3_key string"
            )
            # Driver-side bounds: the probe and fenced-out check need no
            # aggregation job at all for list-keyed transitions.
            kb = (min(paths), max(paths)) if paths else (None, None)
        hit = F.col("_hit").isNotNull()
        fenced_out: list[str] = []
        if fence_run_id is not None:
            hit = hit & (F.col("run_id") == F.lit(fence_run_id))
            fenced_out = self._fenced_out(keys, fence_run_id, key_bounds=kb)

        def transform(df: DataFrame) -> DataFrame:
            return (
                df.join(
                    F.broadcast(keys.withColumn("_hit", F.lit(1))),
                    "s3_key",
                    "left",
                )
                .withColumn(
                    "status",
                    F.when(hit, F.lit(status)).otherwise(F.col("status")),
                )
                .withColumn(
                    "retry_count",
                    F.when(
                        hit & F.lit(increment_retry), F.col("retry_count") + 1
                    ).otherwise(F.col("retry_count")),
                )
                .withColumn(
                    "error_message",
                    F.when(hit, F.lit(error_message)).otherwise(
                        F.col("error_message")
                    ),
                )
                .withColumn(
                    "last_updated_at",
                    F.when(hit, F.current_timestamp()).otherwise(
                        F.col("last_updated_at")
                    ),
                )
                .withColumn(
                    "run_id",
                    F.when(
                        hit & F.lit(run_id is not None), F.lit(run_id)
                    ).otherwise(F.col("run_id")),
                )
                .drop("_hit")
            )

        self._route_update(
            keys,
            transform,
            fence_run_id,
            # Rows can land in terminal only when this transition targets a
            # terminal status (legacy migration is handled by the router).
            may_move=status in TERMINAL_STATUSES,
            skip_probe=_keys_known_active,
            # Driver-side terminal bound: exact for list-keyed transitions;
            # unknown (fallback split path) for DataFrame-keyed bulk flips.
            batch_terminal_bound=(
                len(paths)
                if status in TERMINAL_STATUSES and not isinstance(paths, DataFrame)
                else (None if status in TERMINAL_STATUSES else 0)
            ),
            key_bounds=kb,
        )
        return fenced_out

    def _commit_active_update(
        self,
        updated: DataFrame,
        segs: list[str],
        may_move: bool,
        batch_terminal_bound: int | None = None,
    ) -> None:
        """Publish an updated ACTIVE part: rows whose new status is terminal
        move to an appended segment; the rest rewrite the active part.
        ``may_move=False`` (statically no terminal-bound rows — e.g. a
        claim's PROCESSING flip) skips the segment write entirely. The
        persist keeps the two filtered writes consistent (one evaluation of
        current_timestamp).

        Adaptive deferral (round 9): even when terminal-bound rows are
        possible, the split is paid only once they exceed
        TERMINAL_SPLIT_MIN_FRAC of the active dir. Below that — the
        all-PENDING backfill phase, or a fully fenced-out / no-match commit
        whose terminal delta is ZERO rows (ADVICE r8: such a commit used to
        append an EMPTY segment per batch, burning segment slots) — the
        commit is one plain legacy-cost write and terminal rows simply ride
        along in the active part until the fraction crosses the threshold,
        at which point one segment write drains them all.

        The defer decision is DRIVER-SIDE metadata, not a Spark job: the
        pointer tracks an upper bound on deferred terminal rows, callers
        pass the batch's terminal-bound row count, and the active dir size
        comes from parquet footers — so the deferred path is exactly ONE
        write (no persist, no counts; measured: persist+counts alone held
        the 10^6 all-PENDING batch at ~9 s vs legacy 6.7). The bound only
        ever overcounts (fenced-out/no-match rows never actually move), so
        the worst case is a slightly-early split, after which the recorded
        count resets to exact zero."""
        if not may_move:
            self._publish(updated, segs)
            return
        is_terminal = F.col("status").isin(*TERMINAL_STATUSES)
        deferred = self._deferred_terminal()
        n_active = self._active_row_count()
        if (
            deferred is not None
            and batch_terminal_bound is not None
            and n_active is not None
        ):
            est_term = deferred + batch_terminal_bound
            if n_active == 0 or est_term <= TERMINAL_SPLIT_MIN_FRAC * n_active:
                self._publish(updated, segs, deferred_terminal=est_term)
                return
        # Split (or fall back where driver-side metadata is unavailable —
        # legacy pointers, DataFrame-keyed bulk transitions): one persist,
        # two filtered writes, and the deferral bookkeeping resets to the
        # truth (zero terminal rows remain in the active part).
        updated = updated.persist()
        try:
            terminal = updated.filter(is_terminal)
            if terminal.limit(1).count() == 0:
                # Nothing actually transitioned (fully fenced-out commit) and
                # nothing was deferred: never append an empty segment.
                self._publish(updated, segs, deferred_terminal=0)
            else:
                self._publish(
                    updated.filter(~is_terminal),
                    segs,
                    terminal,
                    deferred_terminal=0,
                )
        finally:
            updated.unpersist()

    def apply_outcomes(
        self,
        outcomes: list[tuple[list[str], str, str | None]],
        run_id: str,
        fence: bool = True,
    ) -> list[str]:
        """Apply several status transitions in ONE snapshot write:
        ``outcomes`` is [(paths, status, error_message), ...]. A batch's
        commit touches the ledger once instead of once per status group —
        the ledger write amplification is O(1) per batch, not O(states).

        ``fence=True`` (default): each transition applies only where the
        row's current ``run_id`` equals ``run_id`` — i.e. this runner still
        owns the claim. Reclaimed rows (lease expired, another runner took
        over) are left untouched and returned as lost-claim paths so the
        caller can abort their side effects (see ingest_batch)."""
        rows = [
            (p, status, msg)
            for paths, status, msg in outcomes
            for p in paths
        ]
        if not rows:
            return []
        updates = local_df(
            self.spark, rows, "s3_key string, new_status string, new_error string"
        ).dropDuplicates(["s3_key"])
        with self._mutex():
            return self._apply_updates_unlocked(
                updates,
                run_id,
                fence_run_id=run_id if fence else None,
                # Statuses are known driver-side: a commit carrying only
                # active outcomes (e.g. all-FAILED retry batch) must not
                # append an empty terminal segment per batch.
                may_move=any(
                    paths and status in TERMINAL_STATUSES
                    for paths, status, _ in outcomes
                ),
                batch_terminal_bound=len(
                    {
                        p
                        for paths, status, _ in outcomes
                        if status in TERMINAL_STATUSES
                        for p in paths
                    }
                ),
                key_bounds=(
                    min(r[0] for r in rows),
                    max(r[0] for r in rows),
                ),
            )

    def _apply_updates_unlocked(
        self,
        updates: DataFrame,
        run_id: str,
        fence_run_id: str | None = None,
        may_move: bool = True,
        batch_terminal_bound: int | None = None,
        key_bounds: tuple[str | None, str | None] | None = None,
    ) -> list[str]:
        hit = F.col("new_status").isNotNull()
        fenced_out: list[str] = []
        if fence_run_id is not None:
            hit = hit & (F.col("run_id") == F.lit(fence_run_id))
            fenced_out = self._fenced_out(updates, fence_run_id, key_bounds)

        def transform(df: DataFrame) -> DataFrame:
            return (
                df.join(F.broadcast(updates), "s3_key", "left")
                .withColumn(
                    "status",
                    F.when(hit, F.col("new_status")).otherwise(F.col("status")),
                )
                .withColumn(
                    "error_message",
                    F.when(hit, F.col("new_error")).otherwise(
                        F.col("error_message")
                    ),
                )
                .withColumn(
                    "last_updated_at",
                    F.when(hit, F.current_timestamp()).otherwise(
                        F.col("last_updated_at")
                    ),
                )
                .withColumn(
                    "run_id",
                    F.when(hit, F.lit(run_id)).otherwise(F.col("run_id")),
                )
                .drop("new_status", "new_error")
            )

        self._route_update(
            updates,
            transform,
            fence_run_id,
            may_move,
            batch_terminal_bound=batch_terminal_bound,
            key_bounds=key_bounds,
        )
        return fenced_out

    def owned_by(self, paths: list[str], run_id: str) -> set[str]:
        """The subset of ``paths`` whose ledger row currently carries
        ``run_id`` — i.e. claims this runner still holds. Read-only (no
        mutex needed: the authoritative check re-runs inside the fenced
        commit); used to skip side effects for already-reclaimed files."""
        if not paths:
            return set()
        keys = local_df(self.spark, [(p,) for p in paths], "s3_key string")
        return {
            r.s3_key
            for r in self.read()
            .join(F.broadcast(keys), "s3_key", "left_semi")
            .filter(F.col("run_id") == F.lit(run_id))
            .select("s3_key")
            .collect()
        }

    def counts(self) -> dict[str, int]:
        return {
            r["status"]: r["n"]
            for r in self.read().groupBy("status").agg(F.count("*").alias("n")).collect()
        }
