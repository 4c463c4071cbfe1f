"""UDF / UDAF / UDTF surface (SURVEY.md §2.11 D1-D5).

Reference evidence: "Complex feature engineering" integrating PyTorch/
TensorFlow via Petastorm/Dask/Ray (diagram3:135), "Distributed feature
engineering / DataFrame processing" (diagram3.mmd:53). These are the Spark
escape hatches for logic built-ins can't express — ordered by preference:

1. Don't: built-in functions (everything in operators/ and functions/).
2. ``@pandas_udf`` scalar (D2): Arrow-batched, vectorized — 10-100× faster
   than row UDFs; the default when Python is unavoidable.
3. ``applyInPandas`` (D4) / grouped-agg pandas UDF (D3): per-group pandas
   frames — model scoring, per-entity fits.
4. ``mapInPandas`` (D5): partition-wise iterator of batches — streaming
   feature extraction, UDTF-style expansion with bounded memory.
5. Row-at-a-time ``F.udf`` (D1): only for tiny dimension-table transforms.

Each helper here is exercised by tests/test_udfs.py and kept deliberately
small: they are the *patterns* a feature engineer copies, wired to the
fixture tables.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T


# --------------------------------------------------------------------------
# D1: row-at-a-time scalar UDF (the slow path — kept for API parity)
# --------------------------------------------------------------------------
def classify_priority_udf():
    @F.udf(returnType=T.StringType())
    def classify(priority: str) -> str:
        return "rush" if priority and priority.startswith(("1", "2")) else "standard"

    return classify


# --------------------------------------------------------------------------
# D2: vectorized scalar pandas UDF
# --------------------------------------------------------------------------
@pandas_udf(T.DoubleType())
def discounted_charge(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Arrow-batched arithmetic (same math as the flagship's sum_charge)."""
    return price * (1.0 - discount) * (1.0 + tax)


@pandas_udf(T.DoubleType())
def zscore_clip(v: pd.Series) -> pd.Series:
    """Batch-local normalize+clip — the shape of a featurization UDF."""
    std = v.std(ddof=0)
    if not std or pd.isna(std):
        return v * 0.0
    return ((v - v.mean()) / std).clip(-3.0, 3.0)


# --------------------------------------------------------------------------
# D3: grouped-aggregate pandas UDF
# --------------------------------------------------------------------------
@pandas_udf(T.DoubleType())
def interquartile_range(v: pd.Series) -> float:
    """Per-group IQR — an aggregate built-ins don't ship."""
    return float(v.quantile(0.75) - v.quantile(0.25))


# --------------------------------------------------------------------------
# D4: grouped-map transform (applyInPandas)
# --------------------------------------------------------------------------
def add_group_minmax_scaled(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-group min-max scaling of ``value`` — returns the input columns
    plus ``scaled``. One shuffle on ``key``; each group must fit in one
    executor's memory (use salting or a windowed formulation for giant
    groups)."""
    schema = T.StructType(
        df.schema.fields + [T.StructField("scaled", T.DoubleType())]
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf[value].min(), pdf[value].max()
        span = (hi - lo) or 1.0
        return pdf.assign(scaled=(pdf[value] - lo) / span)

    return df.groupBy(key).applyInPandas(scale, schema=schema)


# --------------------------------------------------------------------------
# D5: mapInPandas (partition-wise iterator; UDTF-style)
# --------------------------------------------------------------------------
def tokenize_mapinpandas(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode documents into (doc_id, token, position) rows via an
    Arrow-batch iterator — bounded memory regardless of document size."""
    out_schema = f"{id_col} long, token string, position int"

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf[text_col].str.split(" ")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].repeat(toks.str.len()),
                    "token": [t for doc in toks for t in doc],
                    "position": [i for doc in toks for i in range(len(doc))],
                }
            )

    return df.select(id_col, text_col).mapInPandas(expand, schema=out_schema)
