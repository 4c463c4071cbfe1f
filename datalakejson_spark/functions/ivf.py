"""IVF (inverted-file) approximate nearest-neighbor search (SURVEY.md §2.12
L3 scale path, complementing the hyperplane LSH in similarity.py).

Classic IVF: a coarse k-means quantizer partitions the vector space into
cells; each vector is assigned to its nearest centroid (the "inverted
list"). A query probes only the ``nprobe`` cells whose centroids are closest,
then exact-reranks. Search cost drops from O(n) to O(n · nprobe / k).

Spark mapping: the quantizer is ``pyspark.ml.clustering.KMeans`` (seeded →
reproducible); cell assignment is its transform; the probe is a broadcast
join query×top-nprobe-cells → candidates co-partitioned by cell id. The
index (centroids + assignments) is a DataFrame that persists like any table —
rebuilding is one ML fit, incremental inserts are one transform.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datalakejson_spark.functions.similarity import TOP_K, cosine_expr
from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table

N_CELLS = 16
N_PROBE = 4


def build_ivf_index(emb: DataFrame, k: int = N_CELLS, seed: int = 42):
    """Fit the coarse quantizer and assign every vector to a cell.
    Returns (assigned_df with ``cell`` column, fitted KMeansModel)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.withColumn("features", array_to_vector("embedding"))
    # maxIter=5: a coarse quantizer needs rough cells, not converged ones —
    # recall is governed by nprobe, and fit time is the index build cost
    model = KMeans(k=k, seed=seed, maxIter=5, featuresCol="features").fit(vecs)
    assigned = model.transform(vecs).withColumnRenamed("prediction", "cell").drop(
        "features"
    )
    return assigned, model


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    n_cells: int = N_CELLS,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Approximate top-k neighbors for each query vector.

    ``queries`` must be a subset of ``emb`` rows (vec_id, embedding).
    Output: (query_id, neighbor_id, cosine, rn).
    """
    assigned, model = build_ivf_index(emb, k=n_cells)
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    # per-query nprobe nearest cells (euclidean to centroid); centroid set is
    # tiny → broadcast, one row per (query, probed cell)
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    dist2 = F.aggregate(
        F.zip_with(
            "q_emb", "centroid", lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    probe_w = Window.partitionBy("query_id").orderBy("cell_dist", "cell")
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("cell_dist", dist2)
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_emb", "cell")
    )
    cands = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"), "cell"
    )
    scored = (
        F.broadcast(probes)
        .join(cands, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr("q_emb", "c_emb"), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


@register("l3c_ann_ivf_topk", survey="L3", sql=None)
def l3c_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k for the first 8 query vectors (rows-only check;
    recall vs. the exact baseline asserted in tests/test_tierc.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 8))
