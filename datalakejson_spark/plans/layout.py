"""Multi-dimensional clustered layout (Z-order) for data-skipping at scale.

Parquet scans skip row groups (and whole files) whose min/max statistics
exclude the pushed predicate. How much gets skipped is decided at WRITE
time: a table appended in arrival order has every file spanning nearly the
full range of every column, so a selective filter still touches every file.
At 100 TB, the difference between "scan 2 files" and "scan 2,000 files" is
the layout, not the query.

For one filter column, ``repartitionByRange + sortWithinPartitions`` gives
each file a disjoint range — optimal. For predicates over SEVERAL columns
no single sort order works; the standard fix (Delta OPTIMIZE ZORDER BY,
Iceberg sort orders) is to sort by a space-filling curve: interleave the
bits of the rank-normalized dimensions so points close in N-space stay
close in the 1-D sort, and every file covers a small hyper-rectangle
instead of a full-range slab.

Everything here is expression-level (div/mod bit extraction — identical
semantics in any SQL engine, used verbatim by the oracle query) and
plan-level (range partition + in-partition sort = one shuffle, no global
sort bottleneck). The skipping claim is not asserted by vibes: the test
reads the written parquet footers with pyarrow and measures the fraction of
row groups a point-range predicate can prune, clustered vs arrival-order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _bit_interleave_sql(cols: list[str], bits: int) -> str:
    """Portable SQL for the Z-value of pre-bucketized int columns in
    ``[0, 2**bits)``: bit ``i`` of column ``k`` lands at output position
    ``i * n_cols + k``. Uses only floor-div/mod/multiply/add so the exact
    text evaluates identically in Spark SQL and DuckDB (no dialect-specific
    shift operators)."""
    n = len(cols)
    terms = [
        f"((CAST(floor({c} / {1 << i}) AS BIGINT) % 2) * {1 << (i * n + k)})"
        for i in range(bits)
        for k, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12
) -> tuple[DataFrame, Column]:
    """Return (df, zkey_column) where zkey interleaves min/max-normalized
    ``cols``. Normalization bounds come from ONE tiny aggregate (2 numbers
    per column to the driver — metadata, not data); bucketization and
    interleaving are pure map-side expressions after that."""
    # try_cast, not cast: under ANSI mode (Spark 4 default) casting a
    # non-numeric string column to double THROWS mid-job; try_cast yields
    # NULL and the bounds check below turns that into a clear error.
    bounds = df.agg(
        *[F.min(F.expr(f"try_cast({c} AS DOUBLE)")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.expr(f"try_cast({c} AS DOUBLE)")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    # Fail fast, before any rewrite: a non-numeric column casts to all-NULL
    # and an empty/all-NULL input has no bounds — either would otherwise
    # surface as an opaque 'None - None' TypeError mid-compaction, after
    # some partitions were already rewritten (optimize_table loop).
    bad = [c for c in cols if bounds[f"mn_{c}"] is None]
    if bad:
        raise ValueError(
            f"zorder_key: no numeric bounds for column(s) {bad} — "
            "non-numeric type, all NULL, or empty input; Z-order cluster "
            "columns must be numeric/timestamp with at least one non-NULL row"
        )
    cells = 1 << bits
    bucket_names = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        span = (mx - mn) or 1.0
        b = F.least(
            F.lit(cells - 1),
            F.floor(
                (F.expr(f"try_cast({c} AS DOUBLE)") - F.lit(mn))
                / F.lit(span)
                * cells
            ),
        ).cast("bigint")
        name = f"_zb_{c}"
        df = df.withColumn(name, b)
        bucket_names.append(name)
    z = F.expr(_bit_interleave_sql(bucket_names, bits))
    return df, z


def cluster_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 12,
) -> None:
    """Write ``df`` as ``n_files`` parquet files Z-clustered on ``cols``:
    range-partition on the Z-value (each output file owns a contiguous curve
    segment ⇒ a small hyper-rectangle of the key space), then sort within
    partitions so row groups inside each file are tight too. One shuffle
    total; no single-task global sort."""
    zdf, z = zorder_key(df, cols, bits)
    (
        zdf.withColumn("_zkey", z)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"_zb_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-row-group min/max stats for ``cols`` straight from the parquet
    footers (what a scan's skipping logic sees). Driver-side metadata read —
    footers only, no data pages."""
    import pyarrow.parquet as pq

    out = []
    ds = pq.ParquetDataset(path)
    for frag in ds.fragments:
        md = frag.metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            stats = {}
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    stats[name] = (col.statistics.min, col.statistics.max)
            out.append({"file": frag.path, "row_group": rg, "stats": stats})
    return out


def prunable_fraction(
    groups: list[dict], predicates: list[dict[str, tuple]]
) -> float:
    """Average fraction of row groups a min/max-pruning reader skips for the
    given AND-of-range predicates ({col: (lo, hi)}). This is the layout's
    figure of merit: identical data, identical query — only the clustering
    changes it."""
    total = 0
    skipped = 0
    for pred in predicates:
        for g in groups:
            total += 1
            for c, (lo, hi) in pred.items():
                gmin, gmax = g["stats"].get(c) or (None, None)
                if gmin is None or gmax is None:
                    continue  # no stats ⇒ conservatively unprunable
                if gmax < lo or gmin > hi:  # disjoint ⇒ row group pruned
                    skipped += 1
                    break
    return skipped / total if total else 0.0


# --------------------------------------------------------------------------
# Registered oracle query: the Z-curve math itself, cross-engine
# --------------------------------------------------------------------------
def _s12_sql() -> str:
    cells = _bit_interleave_sql(["a", "b"], 4)
    return f"""
    WITH cells AS (
        SELECT CAST(user_id % 16 AS BIGINT) AS a,
               CAST(CAST(abs(floor(value)) AS BIGINT) % 16 AS BIGINT) AS b
        FROM events
    )
    SELECT {cells} AS zcell, COUNT(*) AS n_rows
    FROM cells
    GROUP BY 1
    """


def _register_s12():
    from datalakejson_spark.registry import register
    from datalakejson_spark.sources.tables import load_table

    @register(
        "s12_zorder_curve_cells",
        survey="S6,F4,G3",
        extended=True,
        sql=_s12_sql(),
    )
    def s12_zorder_curve_cells(spark, sf_dir: str) -> DataFrame:
        """The Z-value computation cluster_write sorts by, verified
        cross-engine: both engines interleave the bits of a 16×16 grid over
        (user_id, value) with the identical div/mod expression and count
        rows per curve cell. If the curve math drifted by one bit the cell
        histogram would not match."""
        load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
        return spark.sql(_s12_sql())

    return s12_zorder_curve_cells


s12_zorder_curve_cells = _register_s12()
