"""Scale smoke: execute EVERY registered query against a scaled tier.

``python tools/scale_smoke.py [sf_dir]`` (default the cached sf1 tier,
generating it if missing) runs every registered query end-to-end via the
noop sink and reports per-query wall time and any failure. The oracle
verifies correctness at sf0.01; this proves the whole registry *executes*
one decade up — no plan blows up, no operator hits a size cliff — and
prints the slowest tail for perf attention. (It caught l2f's quadratic
banding in round 6: 115 s against an 8 s field.)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    from make_scaled_sf import make_scaled_sf

    from datalakejson_spark.registry import all_specs
    from datalakejson_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/datalakejson_sf1"
    if not Path(sf_dir).exists():
        make_scaled_sf("/root/testdata/sf0.1", sf_dir, 10)
    # Session recycling: one long-lived 8 GB driver JVM running the whole
    # registry back-to-back at sf10 accumulates driver-heap state faster
    # than the ContextCleaner reclaims it (broadcast/TorrentBroadcast blocks
    # pend on GC) — at 147 queries the heap finally OOM'd ~130 queries in,
    # taking the py4j gateway and every later query with it, even though
    # each query passes alone. A fresh session every SESSION_RECYCLE
    # queries bounds the accumulation; each query's own execution is
    # unchanged (and per-query times remain comparable — session start is
    # excluded from timings).
    SESSION_RECYCLE = 40

    def fresh_session():
        # a dead JVM leaves a zombie singleton SparkContext behind;
        # getOrCreate would hand it back — clear it first
        from pyspark import SparkContext
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            try:
                active.stop()
            except Exception:  # noqa: BLE001 — stopping a dead JVM
                pass
        SparkContext._active_spark_context = None
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
        return get_spark("scale-smoke")

    def gateway_dead(exc: Exception) -> bool:
        text = f"{type(exc).__name__}: {exc}"
        return any(
            m in text
            for m in (
                "ConnectionRefused",
                "Connection reset",
                "Java gateway process",
                "Answer from Java side is empty",
                "Py4JNetworkError",
            )
        )

    spark = fresh_session()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for i, (name, spec) in enumerate(sorted(all_specs().items())):
        if i and i % SESSION_RECYCLE == 0:
            spark = fresh_session()
        t0 = time.time()
        try:
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 2)
            print(f"  ok {name} {timings[name]}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — report, keep smoking
            failures[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:120]}"
            print(f"  FAILED {name}: {failures[name]}", flush=True)
            if gateway_dead(exc):
                # an executor OOM in local mode kills the WHOLE JVM — without
                # an immediate rebuild every later query false-fails on the
                # dead gateway and the report is useless (round 12)
                spark = fresh_session()
    total = round(sum(timings.values()), 1)
    print(f"{len(timings)} ok / {len(failures)} failed, total {total}s")
    for name, t in sorted(timings.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  slowest: {name} {t}s")
    for name, err in failures.items():
        print(f"  FAILED: {name}: {err}")
    try:
        spark.stop()
    except Exception:  # noqa: BLE001 — summary is out; exit code must hold
        pass
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
