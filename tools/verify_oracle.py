"""Local mimic of the driver's t2 correctness gate.

Runs every registered query at sf0.01 on Spark AND its DuckDB oracle SQL,
then compares row count, column-name sets, and (order-insensitively) values.
Floats are compared bit-exactly first, then with 1e-9 relative tolerance so
we can see *how* close a mismatch is.

Usage: python tools/verify_oracle.py [name_filter ...]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Override to run the full cross-engine gate at another tier, e.g. the
# generated sf1 (SPARK_GRAFT_VERIFY_SF=/tmp/datalakejson_sf1) — correctness
# at scale, not just execution.
import os  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
        elif df[col].dtype == object:
            df[col] = df[col].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for col in s.columns:
        # Driver-hash mimic: float-vs-int dtype drift hashes differently on
        # the driver (15000.0 != 15000) even when values compare equal here.
        s_f, d_f = pd.api.types.is_float_dtype(s[col]), pd.api.types.is_float_dtype(d[col])
        if s_f != d_f:
            problems.append(
                f"col {col}: DTYPE drift spark={s[col].dtype} duck={d[col].dtype} "
                "(driver hash would fail)"
            )
    for col in s.columns:
        sv, dv = s[col], d[col]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sa = sv.astype(float).to_numpy()
            da = dv.astype(float).to_numpy()
            both_nan = np.isnan(sa) & np.isnan(da)
            exact = (sa == da) | both_nan
            if not exact.all():
                close = np.isclose(sa, da, rtol=1e-9, atol=1e-12) | both_nan
                n_bad = int((~exact).sum())
                if close.all():
                    problems.append(f"col {col}: {n_bad} rows differ but within 1e-9 rtol")
                else:
                    idx = int(np.argmax(~close))
                    problems.append(
                        f"col {col}: {int((~close).sum())} rows beyond tolerance, "
                        f"e.g. spark={sa[idx]!r} duck={da[idx]!r}"
                    )
        else:
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                idx = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"col {col}: {int((~eq).sum())} rows differ, "
                    f"e.g. spark={sv.iloc[idx]!r} duck={dv.iloc[idx]!r}"
                )
    return problems


def main() -> int:
    import os

    from datalakejson_spark.registry import all_specs
    from datalakejson_spark.session import get_spark

    filters = sys.argv[1:]
    specs = all_specs()
    if filters:
        specs = {k: v for k, v in specs.items() if any(f in k for f in filters)}

    if os.environ.get("SPARK_GRAFT_PLAIN"):
        # Driver-simulation mode: a deliberately unconfigured session (default
        # 200 shuffle partitions, none of our runtime confs pre-set) — queries
        # must self-configure via load_table/configure_runtime.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("verify-plain")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("verify-oracle")
    # Decade-2 posture (sf10 sweeps): an EXPLICIT memory limit makes DuckDB
    # raise a catchable OutOfMemoryException instead of hard-aborting the
    # whole sweep on an OS-level failed allocation (seen at sf10: l20's
    # window+string_agg oracle killed the process with rc=134, losing every
    # result after it alphabetically); the temp directory lets spillable
    # operators spill instead of dying; and each query gets a FRESH
    # connection because buffer-pool state left by one big oracle was seen
    # to push the NEXT one over the limit (l20 passed standalone at sf10 but
    # OOM'd mid-sweep right after l19/l15's large plans).
    spill = Path(tempfile.mkdtemp(prefix="duck_spill_"))

    def fresh_con() -> "duckdb.DuckDBPyConnection":
        c = duckdb.connect()
        c.execute("SET memory_limit='48GB'")
        c.execute(f"SET temp_directory='{spill}'")
        # The compare() sorts rows anyway; dropping insertion-order
        # preservation lets big oracles stream instead of materializing
        # (l20's window+string_agg at sf10 sat right at the memory edge).
        c.execute("SET preserve_insertion_order=false")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet"
                + ("/*.parquet')" if Path(f"{SF_DIR}/{t}.parquet").is_dir() else "')")
            )
        return c

    try:
        return _sweep(spark, specs, fresh_con)
    finally:
        import shutil

        shutil.rmtree(spill, ignore_errors=True)


def _sweep(spark, specs, fresh_con) -> int:
    n_pass = n_soft = n_fail = n_rows_only = 0
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        try:
            spark_pdf = spec.fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if spec.sql is None:
            print(f"rows  {name}: rows-only, {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            con = fresh_con()
            try:
                duck_pdf = con.execute(spec.sql).fetchdf()
            finally:
                con.close()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        hard = [p for p in problems if "within" not in p]
        if not problems:
            print(f"PASS  {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        elif not hard:
            print(f"soft  {name}: {problems}")
            n_soft += 1
        else:
            print(f"FAIL  {name}: {problems}")
            n_fail += 1
    print(
        f"\n{n_pass} exact-pass, {n_soft} soft (float-tolerance), "
        f"{n_fail} fail, {n_rows_only} rows-only"
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
