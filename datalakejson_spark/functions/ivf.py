"""IVF (inverted-file) approximate nearest-neighbor search (SURVEY.md §2.12
L3 scale path, complementing the hyperplane LSH in similarity.py).

Classic IVF: a coarse k-means quantizer partitions the vector space into
cells; each vector is assigned to its nearest centroid (the "inverted
list"). A query probes only the ``nprobe`` cells whose centroids are closest,
then exact-reranks. Search cost drops from O(n) to O(n · nprobe / k).

Spark mapping, designed for the 100 TB shape:

- The coarse quantizer is a driver-side seeded numpy Lloyd's over a bounded
  deterministic sample (a coarse quantizer needs rough cells, not a converged
  clustering — FAISS trains IVF quantizers on samples too). This replaced a
  pyspark.ml KMeans fit that cost ~10 s of JVM/ML overhead per index build at
  sf0.01 while producing equivalent cells.
- Cell assignment is a pure JVM-side expression: argmin over the k centroid
  literals via array_min of (distance, cell) structs — embarrassingly
  parallel, NO shuffle, no Python in the executor path. At 16 cells × 64 dims
  this stays inside whole-stage codegen.
- The probe is a broadcast of (query × nprobe cells); candidates are joined
  on cell id, then exact-reranked within the probed cells only.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import IntegerType, StructField, StructType

from datalakejson_spark.functions.similarity import (
    TOP_K,
    cosine_expr,
    cosine_np,
    stack_embeddings,
)
from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table
from datalakejson_spark.session import local_df

N_CELLS = 16
N_PROBE = 4
_SAMPLE_CAP = 4096  # quantizer training sample (driver-side, bounded)


#: hard ceiling on the quantizer training sample regardless of nlist — at
#: dim 64 float64 this is ~134 MB on the driver, the bound that keeps the
#: one collect() in the IVF build safe at any corpus size.
_SAMPLE_MAX = 262_144


def train_quantizer(
    emb: DataFrame,
    k: int = N_CELLS,
    seed: int = 42,
    iters: int = 10,
    sample_cap: int | None = None,
) -> list[list[float]]:
    """Seeded Lloyd's k-means on a bounded deterministic sample, driver-side.

    The sample is the md5-prefix trick (engine-portable determinism, same as
    o3_deterministic_sample) capped at ``sample_cap`` rows (default: enough
    for ~32 training points per requested cell, floored at ``_SAMPLE_CAP``
    and ceilinged at ``_SAMPLE_MAX``) — at any data scale this collects
    thousands of small vectors, never the table. FAISS trains IVF coarse
    quantizers on samples of the same order.
    """
    if sample_cap is None:
        sample_cap = min(max(_SAMPLE_CAP, 32 * k), _SAMPLE_MAX)
    frac_col = F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10)
    sample = (
        emb.select("vec_id", "embedding", frac_col.cast("long").alias("h"))
        .orderBy("h", "vec_id")
        .limit(sample_cap)
        .select("embedding")
        .collect()
    )
    x = np.array([r[0] for r in sample], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        # assign: (n, k) squared distances via ||x||^2 - 2 x.c + ||c||^2
        d2 = ((x**2).sum(1)[:, None] - 2 * x @ cents.T + (cents**2).sum(1)[None, :])
        labels = d2.argmin(1)
        # scatter-add means: O(n·d) per iteration regardless of k — the
        # per-cell boolean-mask loop this replaced was O(k·n) and dominated
        # the nlist=1024 build (round 12)
        sums = np.zeros_like(cents)
        np.add.at(sums, labels, x)
        counts = np.bincount(labels, minlength=len(cents))
        nonempty = counts > 0
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
    return [[float(v) for v in c] for c in cents]


def _dist2_to_literal(centroid: list[float]):
    """Squared euclidean distance from the ``embedding`` column to a centroid
    literal — JVM-side zip_with/aggregate, no UDF."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(
            "embedding", lit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_cells(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add the ``cell`` column: argmin over centroid distances, computed as
    array_min over (distance, cell) structs. Pure map-side expression — the
    inverted-list build shuffles nothing."""
    cell = F.array_min(
        F.array(
            *[
                F.struct(_dist2_to_literal(c).alias("d"), F.lit(i).alias("cell"))
                for i, c in enumerate(centroids)
            ]
        )
    )["cell"]
    return emb.withColumn("cell", cell)


def assign_cells_np(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Vectorized cell assignment for large nlist (round 12).

    The expression form above unrolls one zip_with/aggregate PER CENTROID
    into the plan — at nlist = 16 that stays inside a small interpreted
    expression; at nlist ≈ √n (1000+ cells) the plan itself becomes the
    bottleneck (64k+ literal nodes, O(k·d) interpreted ops per row). Here
    the centroid matrix ships once per worker and each Arrow batch is a
    single ||x||²-2xCᵀ+||c||² BLAS argmin. Still a pure map — no shuffle."""
    cmat = np.array(centroids, dtype=np.float64)
    c2 = (cmat**2).sum(axis=1)
    out_schema = StructType(
        list(emb.schema.fields) + [StructField("cell", IntegerType())]
    )
    cols = [f.name for f in emb.schema.fields]

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = stack_embeddings(pdf["embedding"])
            d2 = (x**2).sum(axis=1)[:, None] - 2.0 * (x @ cmat.T) + c2[None, :]
            out = pdf[cols].copy()
            out["cell"] = d2.argmin(axis=1).astype(np.int32)
            yield out

    return emb.mapInPandas(run, out_schema)


#: past this many cells the per-centroid expression unrolling costs more
#: than the Arrow round-trip — ivf_topk switches to assign_cells_np.
_VECTORIZE_CELLS_ABOVE = 32


def default_nprobe(n_cells: int) -> int:
    """The ONE spelling of the nprobe default: probe ~1/16 of cells,
    floored at 4 — nprobe must scale WITH nlist (at nlist=1024, recall@5
    falls 1.0 → 0.984 → 0.596 across nprobe 64 → 4 → 1; SCALE.md,
    tools/ann_recall_curve_r12.jsonl). Both autotune_ivf and the
    persisted-index probe derive from here so they can never drift apart
    (ADVICE r12 — the two-spellings-of-one-default trap)."""
    return max(4, n_cells // 16)


def autotune_ivf(n_vectors: int) -> tuple[int, int]:
    """(n_cells, nprobe) for a corpus of ``n_vectors`` (round 12).

    nlist ∝ √n (the classic IVF balance point: cell scan cost n/nlist vs
    probe-selection cost nlist), snapped to a power of two and clamped to
    [16, 65536]; nprobe = max(4, nlist/16), i.e. probe ~6% of cells.
    Measured (tools/ann_recall_curve_r12.jsonl, SCALE.md): on clustered
    corpora the autotuned setting holds recall@5 = 1.0 at BOTH 10^5
    ((256, 16)) and 10^6 ((1024, 64)) while scanning ~6% of rows; dropping
    nprobe matters more as nlist grows — at nlist=1024 recall falls
    1.0 → 0.984 → 0.596 across nprobe 64 → 4 → 1 — which is why nprobe
    scales WITH nlist here instead of being a constant. The floor is
    regression-pinned in tests/test_tierc.py::test_ann_recall_floor_at_1e5."""
    nlist = 1 << max(4, min(16, round(math.log2(max(1.0, math.sqrt(n_vectors))))))
    return nlist, default_nprobe(nlist)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    n_cells: int = N_CELLS,
    nprobe: int = N_PROBE,
    vectorized: bool | None = None,
) -> DataFrame:
    """Approximate top-k neighbors for each query vector.

    ``queries`` must be a subset of ``emb`` rows (vec_id, embedding).
    ``vectorized=None`` auto-selects the assignment path (expressions for
    small nlist, Arrow/BLAS above ``_VECTORIZE_CELLS_ABOVE``).
    Output: (query_id, neighbor_id, cosine, rn).
    """
    centroids = train_quantizer(emb, k=n_cells)
    if vectorized is None:
        vectorized = n_cells > _VECTORIZE_CELLS_ABOVE
    assigner = assign_cells_np if vectorized else assign_cells
    assigned = assigner(emb, centroids)
    return ivf_probe_topk(
        assigned, centroids, queries, k=k, nprobe=nprobe,
        vectorized_score=vectorized,
    )


def probe_cells(
    queries: DataFrame, centroids: list[list[float]], nprobe: int = N_PROBE
) -> DataFrame:
    """(query_id, q_emb, cell) — each query's ``nprobe`` nearest cells by
    euclidean centroid distance. The centroid set is tiny (≤65536 by
    autotune's clamp) → broadcast crossJoin, one row per (query, probed
    cell); everything downstream joins or prunes on these rows."""
    spark = queries.sparkSession
    cent_df = local_df(
        spark,
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    dist2 = F.aggregate(
        F.zip_with(
            "q_emb",
            "centroid",
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    probe_w = Window.partitionBy("query_id").orderBy("cell_dist", "cell")
    return (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("cell_dist", dist2)
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_emb", "cell")
    )


def ivf_probe_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = TOP_K,
    nprobe: int = N_PROBE,
    vectorized_score: bool = False,
    probes: DataFrame | None = None,
) -> DataFrame:
    """Probe + exact-rerank over a pre-assigned inverted file — factored out
    so an index built once (train + assign are the expensive passes) can be
    probed at many nprobe settings (the recall-curve sweep does exactly
    that). ``vectorized_score`` swaps the interpreted cosine expression for
    the Arrow/einsum pandas UDF — same 6-dp rounding, same ranking; use it
    when the probed candidate set is large (nlist small relative to n or
    nprobe high). ``probes`` lets a caller that already computed (and maybe
    collected) the probe table reuse it instead of re-planning it."""
    if probes is None:
        probes = probe_cells(queries, centroids, nprobe)
    cands = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"), "cell"
    )
    score = (
        cosine_np("q_emb", "c_emb")
        if vectorized_score
        else F.round(cosine_expr("q_emb", "c_emb"), 6)
    )
    scored = (
        F.broadcast(probes)
        .join(cands, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", score)
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


@register(
    "l3c_ann_ivf_topk",
    survey="L3",
    sql="""
    -- The ANN result set is approximation-defined, so the checkable contract
    -- is RECALL: the Spark side joins the IVF top-k against the exact
    -- brute-force top-k and emits, per query, whether the index recovered at
    -- least one true nearest neighbor; the oracle asserts that holds for
    -- every query. (Overall recall >= 0.4 is separately asserted in
    -- tests/test_tierc.py.)
    SELECT CAST(vec_id AS BIGINT) AS query_id, true AS found_true_neighbor
    FROM embeddings
    WHERE vec_id < 8
    """,
)
def l3c_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN for the first 8 query vectors, verified against the exact
    baseline inside the query: emits (query_id, found_true_neighbor) so the
    index's recall contract is oracle-checkable."""
    from datalakejson_spark.functions.similarity import ann_recall_check

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return ann_recall_check(ivf_topk(emb, queries), emb, queries)


# --------------------------------------------------------------------------
# Persisted IVF index (round 12): the inverted file as a CELL-PARTITIONED
# parquet table. In-memory ivf_topk rebuilds quantizer + assignment per
# session — fine for one-off queries, wrong for a serving corpus. Persisted,
# the expensive passes run once (build) or per-delta (append), and a probe
# becomes a PARTITION-PRUNED scan: the reader lists only the nprobe cell
# directories each query needs, so probe I/O is n x nprobe / nlist rows no
# matter how big the corpus grows — the same "touch only what the key can
# reach" posture as the dedup index's range sidecars, expressed through
# Spark's native partition pruning instead of custom sidecars.
# --------------------------------------------------------------------------
_IVF_META = "_IVF.json"


def _write_ivf_meta(index_dir: str, meta: dict) -> None:
    import json
    import os

    tmp = os.path.join(index_dir, _IVF_META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(index_dir, _IVF_META))


def load_ivf_meta(index_dir: str) -> dict:
    import json
    import os

    path = os.path.join(index_dir, _IVF_META)
    try:
        with open(path) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no IVF index at {index_dir} ({_IVF_META} missing) — build one "
            "with build_ivf_index(emb, index_dir)"
        ) from None


def build_ivf_index(
    emb: DataFrame,
    index_dir: str,
    n_cells: int | None = None,
    seed: int = 42,
) -> dict:
    """Train the quantizer, assign every vector, and persist the inverted
    file under ``index_dir`` as parquet PARTITIONED BY cell (one file per
    cell: the frame is hash-repartitioned on cell first, so each cell lands
    wholly in one task — without that, partitionBy fans out tasks x cells
    small files). ``n_cells=None`` autotunes nlist from the corpus count.
    The centroid matrix + layout knobs persist in ``_IVF.json`` (atomic
    write), so probes and appends across sessions share one quantizer.
    Returns the meta dict."""
    import os

    n = emb.count()
    if n_cells is None:
        n_cells, _ = autotune_ivf(n)
    centroids = train_quantizer(emb, k=n_cells, seed=seed)
    assigner = (
        assign_cells_np if n_cells > _VECTORIZE_CELLS_ABOVE else assign_cells
    )
    (
        assigner(emb, centroids)
        .repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(os.path.join(index_dir, "cells"))
    )
    meta = {
        "n_cells": n_cells,
        "seed": seed,
        "n_vectors": n,
        "dim": len(centroids[0]) if centroids else 0,
        # appends must match the persisted parquet type exactly: a float
        # index appended with array<double> rows fails every later read
        # with PARQUET_COLUMN_DATA_TYPE_MISMATCH (parquet never merges
        # element types) — the append path casts deltas to this
        "embedding_type": emb.schema["embedding"].dataType.simpleString(),
        "centroids": centroids,
    }
    _write_ivf_meta(index_dir, meta)
    return meta


def ivf_index_append(spark: SparkSession, new_emb: DataFrame, index_dir: str) -> int:
    """Assign a delta against the EXISTING quantizer and append it into the
    cell partitions — the classic IVF posture (cells stay fixed between
    retrains; drifting data degrades recall gradually, measured by the same
    recall checks, and a rebuild is just build_ivf_index again). The parquet
    append rides Spark's job-commit protocol (all-or-nothing per job); the
    meta row count is advisory observability, refreshed after the append.
    Returns rows appended."""
    import os

    meta = load_ivf_meta(index_dir)
    if "embedding_type" in meta:
        new_emb = new_emb.withColumn(
            "embedding", F.col("embedding").cast(meta["embedding_type"])
        )
    n_new = new_emb.count()
    assigner = (
        assign_cells_np
        if meta["n_cells"] > _VECTORIZE_CELLS_ABOVE
        else assign_cells
    )
    (
        assigner(new_emb, meta["centroids"])
        .repartition("cell")
        .write.partitionBy("cell")
        .mode("append")
        .parquet(os.path.join(index_dir, "cells"))
    )
    meta["n_vectors"] = meta["n_vectors"] + n_new
    _write_ivf_meta(index_dir, meta)
    # Known maintenance gap (STATUS.md round-13 candidates): each append
    # job adds one file per touched cell, so a long append cadence
    # accumulates small files per cell — the dedup index's disease; the
    # cure is the same tiered fold, or simply rebuilding (build_ivf_index
    # is a full compaction by construction). Probes stay CORRECT either
    # way; only per-file open overhead grows.
    return n_new


def ivf_index_topk(
    spark: SparkSession,
    queries: DataFrame,
    index_dir: str,
    k: int = TOP_K,
    nprobe: int | None = None,
) -> DataFrame:
    """Approximate top-k against a persisted index. The probed cell ids are
    collected (bounded: ≤ queries x nprobe ints) and pushed into the scan as
    a partition filter — `.explain` shows them under PartitionFilters, and
    only those cell directories are read. ``nprobe=None`` applies the
    autotune rule to the persisted nlist. Output:
    (query_id, neighbor_id, cosine, rn)."""
    import os

    meta = load_ivf_meta(index_dir)
    if nprobe is None:
        nprobe = default_nprobe(meta["n_cells"])
    probes = probe_cells(queries, meta["centroids"], nprobe).localCheckpoint(
        eager=True  # computed once: feeds the cell collect AND the join
    )
    cells = sorted(r[0] for r in probes.select("cell").distinct().collect())
    inverted = spark.read.parquet(os.path.join(index_dir, "cells")).filter(
        F.col("cell").isin(cells)
    )
    return ivf_probe_topk(
        inverted,
        meta["centroids"],
        queries,
        k=k,
        nprobe=nprobe,
        vectorized_score=True,
        probes=probes,
    )


@register(
    "l3e_ann_ivf_persisted",
    survey="L3,S6,X1",
    extended=True,
    sql="""
    -- Same recall contract as l3c: the persisted-index probe must recover,
    -- for every query, at least one true nearest neighbor from the exact
    -- brute-force top-k; the oracle asserts the boolean per query. The
    -- persistence layer (cell-partitioned parquet + partition-pruned probe
    -- + cross-session quantizer meta) is what this adds over l3c; parity
    -- with the in-memory path is pinned row-for-row in
    -- tests/test_ivf_index.py.
    SELECT CAST(vec_id AS BIGINT) AS query_id, true AS found_true_neighbor
    FROM embeddings
    WHERE vec_id < 8
    """,
)
def l3e_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a persisted cell-partitioned IVF index in a scratch dir, probe
    it with partition pruning, and verify recall against the exact baseline
    — the end-to-end serving shape (build once / probe many) of L3.

    The scratch index is removed before returning (ADVICE r12: mkdtemp
    with no cleanup leaked one index copy per sweep/bench/plan-walk
    invocation): the probe result is eagerly materialized with
    localCheckpoint — bounded at queries x k rows — so the returned plan
    no longer reads the deleted directory."""
    import shutil
    import tempfile

    from datalakejson_spark.functions.similarity import ann_recall_check

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    idx = tempfile.mkdtemp(prefix="l3e_ivf_")
    try:
        build_ivf_index(emb, idx, n_cells=N_CELLS)
        ann = ivf_index_topk(spark, queries, idx, nprobe=N_PROBE).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return ann_recall_check(ann, emb, queries)
