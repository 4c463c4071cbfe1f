"""Text analysis & quality filtering (SURVEY.md §2.12 L4/L6): token stats,
language profiling, heuristic language-ID, quality scoring, document
fingerprinting. All built-in-function compositions — no Python in the hot
path; the per-row work is O(tokens) inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# L4: per-document token statistics
# --------------------------------------------------------------------------
@register(
    "l4_token_stats",
    survey="L4,F5",
    extended=True,  # L4/F5 covered in the driver tier by l4/l4c/l6
    sql="""
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           length(text) AS text_len,
           length(replace(text, ' ', '')) AS n_nonspace_chars
    FROM documents
    """,
)
def l4_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts, vocabulary size, character counts — the
    per-doc feature vector for quality filtering and cost estimation
    (token counting for LLM budgets)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length("text").alias("text_len"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias(
            "n_nonspace_chars"
        ),
    )


# --------------------------------------------------------------------------
# L4: corpus language profile
# --------------------------------------------------------------------------
@register(
    "l4_language_profile",
    survey="L4,G3",
    # demoted r15 (seat rotation, VERDICT r14 #7: an over-represented G3
    # carrier; L4 keeps driver seats via l22_quality_gate + l8_token_shards)
    extended=True,
    sql="""
    SELECT lang,
           count(*) AS n_docs,
           avg(CAST(n_chars AS DOUBLE)) AS avg_chars,
           avg(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avg_tokens
    FROM documents
    GROUP BY 1
    """,
)
def l4_language_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by language — the first report any multilingual
    training-data pipeline needs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
        F.avg(F.size(F.split("text", " ")).cast("double")).alias("avg_tokens"),
    )


# --------------------------------------------------------------------------
# L6: heuristic quality filter
# --------------------------------------------------------------------------
@register(
    "l6_quality_filter",
    survey="L6",
    sql="""
    SELECT doc_id, lang, n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1) AS avg_word_len
    FROM documents
    WHERE n_chars >= 100
      AND len(string_split(text, ' ')) >= 20
      AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
              / greatest(len(string_split(text, ' ')), 1) BETWEEN 2.0 AND 12.0
    """,
)
def l6_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate (Gopher/C4-style length + word-shape rules):
    minimum size, minimum token count, sane mean word length. Pure predicates
    → fully pushed into the scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    avg_word_len = F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    ).cast("double") / F.greatest(n_tokens, F.lit(1))
    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("avg_word_len", avg_word_len)
        .filter(
            (F.col("n_chars") >= 100)
            & (F.col("n_tokens") >= 20)
            & F.col("avg_word_len").between(2.0, 12.0)
        )
        .select("doc_id", "lang", "n_chars", "n_tokens", "avg_word_len")
    )


# --------------------------------------------------------------------------
# L4: heuristic language ID (rows-only; the lang column is the test oracle)
# --------------------------------------------------------------------------
def langid_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-class profile used by the n-gram-free heuristic language ID:
    ASCII ratio, CJK ratio, Cyrillic ratio, accented-latin ratio."""
    text = F.col(text_col)
    total = F.greatest(F.length(text), F.lit(1)).cast("double")

    def ratio(pattern: str):
        stripped = F.regexp_replace(text, pattern, "")
        return (F.length(text) - F.length(stripped)).cast("double") / total

    return df.withColumn("ascii_ratio", ratio(r"[A-Za-z]")).withColumn(
        "cjk_ratio", ratio(r"[一-鿿぀-ヿ]")
    ).withColumn("cyrillic_ratio", ratio(r"[Ѐ-ӿ]")).withColumn(
        "accent_ratio", ratio(r"[À-ɏ]")
    )


def predict_lang(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language family prediction from character-class ratios."""
    feat = langid_features(df, text_col)
    return feat.withColumn(
        "pred_lang",
        F.when(F.col("cjk_ratio") > 0.1, "zh")
        .when(F.col("cyrillic_ratio") > 0.1, "ru")
        .when(F.col("accent_ratio") > 0.02, "latin-accented")
        .otherwise("en-like"),
    )


@register("l4b_langid_heuristic", survey="L4", extended=True, sql=None)
def l4b_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class language-ID features + prediction (rows-only check;
    the heuristic itself is engine-defined, asserted in tests)."""
    docs = load_table(spark, sf_dir, "documents")
    return predict_lang(docs).select(
        "doc_id", "lang", "pred_lang", "ascii_ratio", "cjk_ratio"
    )


# --------------------------------------------------------------------------
# L4: rolling-hash document fingerprint
# --------------------------------------------------------------------------
@register(
    "l4c_fingerprint",
    survey="L4,L1",
    extended=True,  # L4 driver coverage via l4_language_profile; L1 via l1_exact_dedup
    sql="""
    SELECT doc_id,
           substr(md5(text), 1, 16) AS fp64,
           substr(md5(concat(lang, ':', text)), 1, 8) AS fp_lang
    FROM documents
    """,
)
def l4c_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact content fingerprints (64-bit and lang-scoped 32-bit) for
    cross-corpus contamination checks — join training vs. eval sets on fp64
    instead of full text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fp64"),
        F.substring(F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("text"))), 1, 8).alias(
            "fp_lang"
        ),
    )
