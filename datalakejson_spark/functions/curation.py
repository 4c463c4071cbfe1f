"""Corpus curation operators for training-data pipelines: deterministic
splits, domain mixing, PII redaction, vocabulary statistics, repetition
scoring.

The reference's curated lake feeds model training (diagram3:135-143); these
are the standard curation passes a large-scale pipeline runs between the
dedup/quality stages (functions/dedup.py, functions/text.py) and shard
packing (functions/llm_pipeline.py). All are built-in-function compositions
(whole-stage codegen, no Python in the hot path) and all derive randomness
from ``md5`` of stable keys, so results are reproducible row-by-row across
runs, partitionings, and engines — which is also what makes them
oracle-checkable against DuckDB.

Scale notes (100 TB posture):
- Split/mixture assignment is a pure row-local expression: no shuffle, no
  state, trivially parallel at any scale.
- Vocabulary DF is one explode + one aggregate: the shuffle carries
  (token, 1) pairs with map-side partial aggregation, and the top-k is a
  TakeOrderedAndProject, never a global sort.
- Top-token-share shuffles (doc_id, token) pairs once; at 100 TB the skew
  ceiling is bounded by document length, not corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table, spread_scan

# Split fractions encoded as thresholds over the first byte of md5(doc_id):
# hex strings compare lexicographically identically in Spark and DuckDB
# ('0'..'9' < 'a'..'f'), so `substr(md5, 1, 2) < 'cd'` keeps exactly
# 0xcd/0x100 = 205/256 ≈ 80.1% of a uniform hash — deterministic, seedable
# (prefix the key), and engine-agnostic.
TRAIN_MAX_HEX = "cd"  # [00, cd) → 205/256 ≈ 80.1% train
VAL_MAX_HEX = "e6"  # [cd, e6) →  25/256 ≈  9.8% val; [e6, ff] test

# Source-mixture weights: hash-threshold over md5 bytes 3-4 (independent of
# the split bytes 1-2). 'g0' sorts above every hex byte → keep-all.
MIX_FULL_HEX = "g0"  # weight 1.0
MIX_HALF_HEX = "80"  # weight 0.5  (128/256)
MIX_QUARTER_HEX = "40"  # weight 0.25 ( 64/256)

EMAIL_RE = r"[A-Za-z0-9+._-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _doc_hash(prefix: int, length: int = 2):
    """First ``length`` hex chars of md5(doc_id), offset ``prefix`` (1-based):
    independent uniform bytes per use-site from one stable key."""
    return F.substring(F.md5(F.col("doc_id").cast("string")), prefix, length)


def assign_split(docs: DataFrame) -> DataFrame:
    """Add a deterministic ``split`` column (train/val/test ≈ 80/10/10).

    Library form: row-local, no shuffle; any engine hashing md5 the same way
    assigns the same rows to the same split — the property that lets a
    training run be resumed or audited byte-for-byte."""
    h = _doc_hash(1)
    return docs.withColumn(
        "split",
        F.when(h < TRAIN_MAX_HEX, "train")
        .when(h < VAL_MAX_HEX, "val")
        .otherwise("test"),
    )


@register(
    "l9_train_split",
    survey="L6,G3",
    extended=True,
    sql=f"""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TRAIN_MAX_HEX}'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{VAL_MAX_HEX}'
                THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def l9_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratification report for the deterministic train/val/test split:
    docs and tokens per (split, language). The assignment itself is
    :func:`assign_split`; integer token sums keep the report exact (no
    float aggregation → partition-order-independent)."""
    docs = assign_split(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )


@register(
    "l10_source_mixture",
    survey="L6,G3,F7",
    extended=True,
    sql=f"""
    WITH weighted AS (
        SELECT source,
               substr(md5(CAST(doc_id AS VARCHAR)), 3, 2) AS h,
               CASE WHEN CAST(replace(source, 'src', '') AS INT) < 5
                    THEN '{MIX_FULL_HEX}'
                    WHEN CAST(replace(source, 'src', '') AS INT) < 10
                    THEN '{MIX_HALF_HEX}'
                    ELSE '{MIX_QUARTER_HEX}' END AS thr
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN h < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM weighted
    GROUP BY 1
    """,
)
def l10_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture downsampling: per-source keep-weights applied as a
    deterministic hash threshold (sources 0-4 weight 1.0, 5-9 weight 0.5,
    rest 0.25 — the stand-in for a real mixture config). Reports kept vs
    total per source. Row-local decision → no shuffle beyond the final
    bounded aggregate; rerunning yields the identical subset, which is what
    makes mixture experiments comparable."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.replace(F.col("source"), F.lit("src"), F.lit("")).cast("int")
    thr = (
        F.when(src_num < 5, MIX_FULL_HEX)
        .when(src_num < 10, MIX_HALF_HEX)
        .otherwise(MIX_QUARTER_HEX)
    )
    kept = (_doc_hash(3) < thr).cast("int")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(kept).alias("n_kept"),
    )


@register(
    "l11_pii_redaction",
    survey="L6,F2",
    extended=True,
    sql=f"""
    WITH contactful AS (
        SELECT doc_id,
               concat(text, ' contact ', source, '+', CAST(doc_id AS VARCHAR),
                      '@example.com') AS text
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_redacted,
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS redacted
    FROM contactful
    WHERE len(regexp_extract_all(text, '{EMAIL_RE}')) > 0
    """,
)
def l11_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: redact email addresses, report per-doc match counts.

    The fixture corpus is synthetic word-soup with no PII, so the query
    plants a contact string per row first — the redaction path itself
    (`regexp_extract_all` count + `regexp_replace` rewrite, both inside
    codegen) is exactly what runs on real data, and the oracle checks the
    rewritten text byte-for-byte. The pattern avoids lookarounds so RE2
    (DuckDB) and Java regex (Spark) agree."""
    docs = load_table(spark, sf_dir, "documents")
    contactful = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact "),
            F.col("source"),
            F.lit("+"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ).alias("text"),
    )
    n = F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), F.lit(0)))
    return (
        contactful.select(
            "doc_id",
            n.alias("n_redacted"),
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>").alias("redacted"),
        )
        .filter(F.col("n_redacted") > 0)
    )


@register(
    "l12_vocab_top_df",
    survey="L4,G3,O1",
    extended=True,
    sql="""
    SELECT token,
           count(*) AS doc_freq
    FROM (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents
    )
    GROUP BY token
    ORDER BY doc_freq DESC, token
    LIMIT 20
    """,
)
def l12_vocab_top_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head by document frequency: the top-20 tokens by how many
    documents contain them (the input to stopword lists and BPE seeding).
    One explode → one partial-aggregated shuffle of (token) keys; the final
    top-k is TakeOrderedAndProject (no global sort materialization). Tie-break
    on token keeps the result total-ordered for the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
        )
        .groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "token")
        .limit(20)
    )


@register(
    "l13_top_token_share",
    survey="L4,L6,G3,W5",
    extended=True,
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    counts AS (
        SELECT doc_id, token, count(*) AS c
        FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           max(c) AS top_token_count,
           CAST(max(c) AS DOUBLE) / sum(c) AS top_share,
           CAST(max(c) AS DOUBLE) / sum(c) > 0.2 AS repetitive
    FROM counts
    GROUP BY doc_id
    """,
)
def l13_top_token_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (C4/Gopher-style): the share of a document
    taken by its single most frequent token; docs above 20% flag as
    repetitive. Two exact-integer aggregates — (doc, token) then (doc) — so
    the only float is a final row-local division (deterministic). The
    shuffle key includes doc_id, so skew is bounded by per-document
    vocabulary, not corpus frequency."""
    docs = load_table(spark, sf_dir, "documents")
    per_token = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    top = F.max("c")
    total = F.sum("c")
    return per_token.groupBy("doc_id").agg(
        total.alias("n_tokens"),
        top.alias("top_token_count"),
        (top.cast("double") / total).alias("top_share"),
        (top.cast("double") / total > 0.2).alias("repetitive"),
    )


# --------------------------------------------------------------------------
# L7b: embedding-based benchmark decontamination
# --------------------------------------------------------------------------
DECON_COSINE_THRESHOLD = 0.90

#: Fixed-size eval-suite bound for the l7b/l7c harnesses: a real benchmark
#: suite is a few MBs while the corpus grows without bound. Binds nothing at
#: driver scales (max vec_id 1999 at sf0.1); keeps the harness linear in
#: corpus at sf1/sf10 (the unbounded slice measured decade-2 exponent 1.64).
#: Interpolated into BOTH engines' queries — edit here only.
EVAL_MAX_VEC_ID = 2000

_EMB_DOT = (
    "list_aggregate([CAST(c.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) "
    "for i in range(1, len(c.embedding) + 1)], 'sum')"
)
_EMB_NORM_C = (
    "sqrt(list_aggregate([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) "
    "for x in c.embedding], 'sum'))"
)
_EMB_NORM_E = (
    "sqrt(list_aggregate([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) "
    "for x in e.embedding], 'sum'))"
)

_L7B_SQL = f"""
    -- eval suite bounded at vec_id < 2000: a real benchmark suite is a
    -- FIXED few MBs while the corpus grows without bound. The cap binds
    -- nothing at driver scales (max vec_id 1999 at sf0.1) and keeps the
    -- harness linear-in-corpus at sf1/sf10 instead of O(n^2/97).
    WITH ev AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 97 = 0 AND vec_id < {EVAL_MAX_VEC_ID}
    ),
    corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 <> 0
    )
    SELECT c.vec_id,
           max(round({_EMB_DOT} / ({_EMB_NORM_C} * {_EMB_NORM_E}), 6))
               AS max_eval_cosine,
           max(round({_EMB_DOT} / ({_EMB_NORM_C} * {_EMB_NORM_E}), 6))
               >= {DECON_COSINE_THRESHOLD} AS contaminated
    FROM corpus c CROSS JOIN ev e
    GROUP BY c.vec_id
"""


@register("l7b_embedding_decontamination", survey="L7,L3,G3", extended=True, sql=_L7B_SQL)
def l7b_embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic benchmark decontamination: flag corpus items whose embedding
    is near-identical (cosine >= 0.90) to any evaluation-set item — catches
    paraphrased leakage that l7's exact n-gram overlap misses.

    Scale shape mirrors l7 (llm_pipeline.py): the eval side is tiny and
    BROADCAST, the corpus is scanned once and never shuffled; per-corpus-row
    work is |eval| x O(dim) inside codegen (zip_with/aggregate dot products,
    no UDF). The pseudo eval slice (vec_id % 97) keeps the oracle
    self-contained; production passes a real eval embedding table the same
    way l7 takes ``bench_docs``."""
    from datalakejson_spark.functions.similarity import cosine_expr

    emb = load_table(spark, sf_dir, "embeddings")
    # fixed-size eval suite (see _L7B_SQL note): cap binds nothing at
    # driver scales, keeps the harness linear-in-corpus at sf1/sf10
    ev = emb.filter(
        (F.col("vec_id") % 97 == 0) & (F.col("vec_id") < EVAL_MAX_VEC_ID)
    ).select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("e_emb")
    )
    corpus = emb.filter(F.col("vec_id") % 97 != 0).select(
        "vec_id", F.col("embedding").alias("c_emb")
    )
    cos = F.round(cosine_expr("c_emb", "e_emb"), 6)
    return (
        corpus.crossJoin(F.broadcast(ev))
        .select("vec_id", cos.alias("cos"))
        .groupBy("vec_id")
        .agg(
            F.max("cos").alias("max_eval_cosine"),
            (F.max("cos") >= DECON_COSINE_THRESHOLD).alias("contaminated"),
        )
    )


def decontaminate_semantic_lsh(
    corpus_emb: DataFrame, eval_emb: DataFrame
) -> DataFrame:
    """The 100 TB shape of l7b: corpus rows score cosine ONLY against eval
    items sharing a random-hyperplane LSH bucket in at least one table
    (similarity.lsh_bucket — the l3b machinery), instead of |corpus|×|eval|
    brute force. For the contamination regime (cosine ≥ 0.9 ⇒ angle ≤ 26°)
    per-plane collision ≈ 0.86, so 4 tables × 3 planes give ≈ 0.98 recall
    while pruning the candidate space ≈ 8× per table. Returns
    (vec_id, max_eval_cosine) for FLAGGED rows only — at scale the clean
    rows (the overwhelming majority) never score a single pair. Both
    inputs must carry (vec_id, embedding)."""
    from datalakejson_spark.functions.similarity import cosine_expr, lsh_bucket

    ev_b = lsh_bucket(eval_emb).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("e_emb"),
        "table",
        "bucket",
    )
    corpus_b = lsh_bucket(corpus_emb).select(
        "vec_id", F.col("embedding").alias("c_emb"), "table", "bucket"
    )
    cos = F.round(cosine_expr("c_emb", "e_emb"), 6)
    return (
        corpus_b.join(F.broadcast(ev_b), ["table", "bucket"])
        # score map-side, shuffle only (vec_id, cos): a pair colliding in
        # several tables is scored n_tables× redundantly, but max() is
        # duplicate-invariant so results are identical — and the redundant
        # O(dim) multiplies are CHEAPER than the alternative (dedupe pairs
        # first), which shuffles both embedding arrays per colliding pair.
        # Measured at sf1: 13.0s vs 18.4s best-of-3 for the dedupe-first
        # form. (Differs from _lsh_ann_topk, where the downstream top-k
        # needs the deduped pair rows themselves.)
        .select("vec_id", cos.alias("cos"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_eval_cosine"))
        .filter(F.col("max_eval_cosine") >= DECON_COSINE_THRESHOLD)
    )


_L7C_SQL = f"""
    -- The LSH-bucketed result is approximation-defined, so the checkable
    -- contract is RECALL over the exact answer (the l3b pattern), scoped
    -- to what the mechanism GUARANTEES: every VERBATIM-leaked row (cosine
    -- 1.0 — identical vectors share every bucket, recall exactly 1 on any
    -- fixture). Paraphrase-level recall is probabilistic (~0.98) and is
    -- asserted as a fraction in tests/test_curation.py, not here.
    -- Leakage scenario: the corpus CONTAINS the benchmark slice. The eval
    -- suite is bounded at vec_id < 2000 (fixed-size benchmark realism; no
    -- effect at driver scales where max vec_id is 1999).
    WITH ev AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 97 = 0 AND vec_id < {EVAL_MAX_VEC_ID}
    ),
    corpus AS (
        SELECT vec_id, embedding FROM embeddings
    )
    SELECT c.vec_id, true AS caught_by_lsh
    FROM corpus c CROSS JOIN ev e
    GROUP BY c.vec_id
    HAVING max(round({_EMB_DOT} / ({_EMB_NORM_C} * {_EMB_NORM_E}), 6))
           >= 0.999999
"""


@register(
    "l7c_decontamination_lsh", survey="L7,L3", extended=True, sql=_L7C_SQL
)
def l7c_decontamination_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall contract of the LSH-bucketed semantic decontamination
    (decontaminate_semantic_lsh): every VERBATIM-leaked corpus row (cosine
    1.0 against some benchmark item) must be flagged by the bucketed path.
    The contract is scoped to what the mechanism GUARANTEES — identical
    vectors share every bucket, so verbatim recall is exactly 1 on any
    fixture; paraphrase-level recall (~0.98 in the cos≥0.9 regime) is a
    probabilistic property and is asserted as a fraction in
    tests/test_curation.py instead, the l3b split. The leakage scenario
    keeps the benchmark slice INSIDE the corpus. The registered query IS
    the verification harness (the exact pipeline runs inside, like l3b);
    production calls decontaminate_semantic_lsh alone — that path never
    goes all-pairs."""
    from datalakejson_spark.functions.similarity import cosine_expr as _cos

    emb = load_table(spark, sf_dir, "embeddings")
    # fixed-size eval suite (see _L7C_SQL note): the round-7 sf10 sweep
    # measured the UNBOUNDED eval slice at decade-2 exponent 1.64 (741 s) —
    # both sides growing makes the exact-oracle crossJoin AND the bucket
    # collisions O(n²/97). A real benchmark suite is fixed-size; the cap
    # binds nothing at driver scales.
    ev = emb.filter(
        (F.col("vec_id") % 97 == 0) & (F.col("vec_id") < EVAL_MAX_VEC_ID)
    )
    corpus = emb  # leakage scenario: benchmark rows live in the corpus
    exact = (
        corpus.select("vec_id", F.col("embedding").alias("c_emb"))
        .crossJoin(
            F.broadcast(
                ev.select(F.col("vec_id").alias("eval_id"),
                          F.col("embedding").alias("e_emb"))
            )
        )
        .select("vec_id", F.round(_cos("c_emb", "e_emb"), 6).alias("cos"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_cos"))
        .filter(F.col("max_cos") >= 0.999999)  # verbatim: guaranteed recall
    )
    flagged = decontaminate_semantic_lsh(corpus, ev)
    # A miss drops the row from the semi join ⇒ fewer rows than the oracle's
    # exact contaminated set ⇒ the driver's rows_match fails. Catching all ⇒
    # exact parity.
    return (
        exact.select("vec_id")
        .join(flagged.select("vec_id"), "vec_id", "leftsemi")
        .select("vec_id", F.lit(True).alias("caught_by_lsh"))
    )


# --------------------------------------------------------------------------
# L14: unigram surprisal (LM-proxy quality signal)
# --------------------------------------------------------------------------
_L14_SQL = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    freq AS (
        SELECT token, count(*) AS c FROM tok GROUP BY 1
    ),
    tot AS (
        SELECT count(*) AS n FROM tok
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           (CAST(sum(CAST(round(-ln(CAST(f.c AS DOUBLE) / tot.n) * 10000.0)
                          AS BIGINT)) AS DOUBLE) / 10000.0) / count(*)
               AS avg_surprisal
    FROM tok t JOIN freq f USING (token) CROSS JOIN tot
    GROUP BY t.doc_id
"""


@register("l14_unigram_surprisal", survey="L4,L6,J3,G3", extended=True, sql=_L14_SQL)
def l14_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal (-ln p(token) under the corpus
    unigram model) — the cheap stand-in for CCNet-style LM-perplexity quality
    filtering: word-soup and boilerplate score low, rare-token noise scores
    high.

    Two-pass shape: corpus unigram counts (one partially-aggregated shuffle
    of token keys), then a broadcast join of that frequency table back onto
    the exploded tokens (vocab << corpus; Zipf head carries no skew penalty
    because the join side is broadcast, not shuffled). Per-token surprisal is
    quantized to 4 dp BEFORE the sum (scaled-integer accumulation,
    operators/deterministic.py) so the per-doc mean is bit-stable across
    partitionings and engines; the grid is deliberately coarse because
    ln() carries one ULP of cross-engine noise and a fine grid lands
    tokens on rounding half-boundaries (seen at sf1).

    The mean itself is emitted UNROUNDED: the two integer inputs make the
    double division chain bit-identical cross-engine (IEEE divisions are
    correctly rounded), while a final decimal round(x, 6) is the thing that
    BREAKS parity — Spark rounds the exact binary expansion via BigDecimal,
    DuckDB rounds via float multiply, and they disagree whenever the
    quotient's decimal expansion sits on a half-boundary at digit 7, which
    real integer ratios hit regularly (caught by the sf10 oracle sweep:
    spark=8.003938 vs duck=8.003937 on ~1500 docs)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("c"))
    # corpus token total as a broadcast 1-row aggregate: stays in the plan
    # (no eager driver-side action), reuses the freq aggregate's input.
    total = freq.agg(F.sum("c").alias("n"))
    surprisal = -F.log(F.col("c").cast("double") / F.col("n").cast("double"))
    # 1e4 grid, not 1e6: ln() differs by one ULP across engines, and at sf1
    # vocabulary sizes a 1e-6 grid put ~10 tokens exactly on a rounding
    # half-boundary (caught by the sf1 oracle tier). The coarser grid makes a
    # boundary hit ~100x rarer while keeping the quality signal intact.
    scaled = F.round(surprisal * 10000.0).cast("bigint")
    return (
        tok.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            ((F.sum(scaled).cast("double") / 10000.0) / F.count("*")).alias(
                "avg_surprisal"
            ),
        )
    )


# --------------------------------------------------------------------------
# L16: epoch-weighted source re-sampling (fractional up/down-sampling)
# --------------------------------------------------------------------------
_L16_SQL = """
    WITH planned AS (
        SELECT doc_id, source,
               CASE WHEN CAST(replace(source, 'src', '') AS INT) < 5 THEN 1
                    WHEN CAST(replace(source, 'src', '') AS INT) < 10 THEN 2
                    ELSE 0 END
               + CASE WHEN CAST(replace(source, 'src', '') AS INT) >= 5
                           AND substr(md5(CAST(doc_id AS VARCHAR)), 5, 2) < '80'
                      THEN 1 ELSE 0 END AS copies
        FROM documents
    ),
    emitted AS (
        SELECT doc_id, source, unnest(generate_series(1, copies)) AS copy_n
        FROM planned WHERE copies >= 1
    )
    SELECT source,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_emitted
    FROM emitted
    GROUP BY 1
"""


@register("l16_source_epochs", survey="L6,F5,G3", extended=True, sql=_L16_SQL)
def l16_source_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted mixture resampling — the upsampling half of data
    mixing (l10 covers keep/drop downsampling): each source gets a
    fractional epoch count (here: sources 0-4 → 1.0, 5-9 → 2.5, rest →
    0.5), realized as floor(e) full copies plus one extra copy for a
    deterministic hash-fraction of documents. Replication is a map-side
    ``explode(sequence(1, copies))`` — no shuffle to duplicate rows, and the
    same document always gets the same copy count (resumable runs). The
    fractional byte (md5 offset 5) is independent of the split (offset 1)
    and mixture (offset 3) bytes. Guard: rows with 0 copies are filtered
    BEFORE the explode — Spark's ``sequence(1, 0)`` yields a DESCENDING
    [1, 0], not empty (DuckDB's generate_series(1,0) IS empty)."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.replace(F.col("source"), F.lit("src"), F.lit("")).cast("int")
    base = F.when(src_num < 5, 1).when(src_num < 10, 2).otherwise(0)
    extra = (
        (src_num >= 5) & (_doc_hash(5) < F.lit(MIX_HALF_HEX))
    ).cast("int")
    planned = docs.select(
        "doc_id", "source", (base + extra).alias("copies")
    ).filter(F.col("copies") >= 1)
    emitted = planned.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("copy_n"),
    )
    return emitted.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_emitted"),
    )


# --------------------------------------------------------------------------
# L19: C4-style cross-document line-level boilerplate removal (round 7)
# --------------------------------------------------------------------------
#: words per synthesized line (the fixture corpus has no newlines; real
#: corpora pass their own line split) and the C4 threshold: a normalized
#: line occurring in >= 3 DISTINCT documents is boilerplate (document
#: frequency, not raw occurrences — a refrain repeated inside one document
#: is l20's territory, not cross-corpus chrome)
LINE_WORDS = 4
BOILER_MIN_DOCS = 3


def line_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = LINE_WORDS,
    newlines: bool = False,
) -> DataFrame:
    """(id, line_no, line) — one row per line; NULL and empty texts yield
    ZERO rows (phantom empty lines must not participate in corpus-wide
    counting), and callers that need every document re-join onto the doc
    table. The explode is over the EXPRESSION, not a projected column, so
    Catalyst's InferFiltersFromGenerate cannot duplicate the split pipeline
    at the scan (the l2 round-6 trap).

    ``newlines=True`` is the real-corpus mode: lines are the text split on
    ``\\n`` (empty lines — e.g. blank separators between paragraphs — are
    excluded from counting AND from reassembly, like C4's rule which
    operates on non-empty lines only). The default synthesizes fixed
    ``line_words``-word windows because the fixture corpus has no newlines;
    the downstream counting/removal is line-source-agnostic."""
    if newlines:
        # \r?\n, not bare \n: CRLF corpora would otherwise leave a trailing
        # \r on every line, so identical lines with mixed endings fail to
        # match in boilerplate/dedup counting and survivors rejoin with
        # stray \r characters. Survivors are rejoined with \n (LF-normalized
        # output is the documented contract).
        lines_expr = F.split(F.col(text_col), "\r?\n")
    else:
        lines_expr = F.expr(
            f"transform(sequence(0, cast(ceil(size(split({text_col}, ' ')) /"
            f" {line_words}.0) as int) - 1),"
            f" g -> array_join(slice(split({text_col}, ' '),"
            f" g * {line_words} + 1, {line_words}), ' '))"
        )
    return docs.select(
        F.col(id_col), F.posexplode(lines_expr).alias("line_no", "line")
    ).filter(F.col("line") != "")


def _reassemble_kept(tagged: DataFrame, id_col: str, keep: "F.Column",
                     boiler_count_col: str, sep: str = " ") -> DataFrame:
    """Shared per-document reassembly for the two line rules: count lines,
    count dropped ones, and rejoin the kept lines in original order with
    ``sep`` (space for the synthesized word-window mode, newline for real
    corpora). ``keep`` is the boolean keep-predicate column; cleaned_text is
    NULL when nothing survives (matches the oracle's
    string_agg-over-no-rows)."""
    kept_struct = F.when(keep, F.struct("line_no", "line"))
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum((~keep).cast("long")).alias(boiler_count_col),
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
        )
        .select(
            id_col,
            "n_lines",
            boiler_count_col,
            F.when(F.size("_kept") == 0, F.lit(None).cast("string"))
            .otherwise(
                F.array_join(F.expr("transform(_kept, x -> x.line)"), sep)
            )
            .alias("cleaned_text"),
        )
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = LINE_WORDS,
    min_docs: int = BOILER_MIN_DOCS,
    newlines: bool = False,
) -> DataFrame:
    """C4's line-wise dedup rule (also RefinedWeb): drop every line that
    occurs in ``min_docs``+ DISTINCT documents (navigation chrome, cookie
    banners, license footers), keeping survivors in document order. A line
    repeated only WITHIN one document does not qualify — that is
    :func:`dedup_lines_within_doc`'s rule. Returns one row per input
    document — (id, n_lines, n_boiler_lines, cleaned_text) — including
    NULL/empty-text documents (n_lines=0, cleaned_text NULL).

    100 TB shape: the classic TWO-PASS design (C4's own): pass 1 scans +
    explodes to count per-line document frequency (the count side is
    pruned to the 32-byte ``md5(line)`` key + doc id, distinct'd with
    map-side partial aggregation); pass 2 scans + explodes again and joins
    the counts back. Two corpus scans by design — the single-scan
    alternative would persist the exploded line table (larger than the
    input) across both consumers. The boilerplate set is NOT broadcastable
    at scale (it grows with the corpus); the count-join is a plain shuffle
    join whose skew ceiling is the hottest line's frequency — AQE
    skew-split territory, same posture as l13. Exact integer counts +
    array_sort on (line_no) keep the result engine-deterministic.

    ``newlines=True`` splits on real ``\\n``s and rejoins survivors with
    ``\\n`` (blank separator lines are dropped — see line_table)."""
    lines = line_table(docs, text_col, id_col, line_words, newlines).withColumn(
        "line_hash", F.md5("line")
    )
    doc_freq = (
        lines.select("line_hash", id_col)
        .distinct()
        .groupBy("line_hash")
        .agg(F.count("*").alias("n_docs"))
    )
    tagged = lines.join(doc_freq, "line_hash")
    per_doc = _reassemble_kept(
        tagged, id_col, F.col("n_docs") < min_docs, "n_boiler_lines",
        sep="\n" if newlines else " ",
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("n_boiler_lines", F.lit(0)).alias("n_boiler_lines"),
        "cleaned_text",
    )


_L19_SQL = f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    lines AS (
        SELECT doc_id, g,
               array_to_string(
                   w[(g * {LINE_WORDS} + 1):(g * {LINE_WORDS} + {LINE_WORDS})],
                   ' ') AS line
        FROM tok,
             UNNEST(range(CAST(ceil(len(w) / {LINE_WORDS}.0) AS BIGINT))) AS t(g)
    ),
    nonempty AS (SELECT * FROM lines WHERE line <> ''),
    doc_freq AS (
        SELECT md5(line) AS lh, count(DISTINCT doc_id) AS n_docs
        FROM nonempty GROUP BY 1
    ),
    per_doc AS (
        SELECT l.doc_id,
               count(*) AS n_lines,
               CAST(sum(CASE WHEN f.n_docs >= {BOILER_MIN_DOCS} THEN 1
                             ELSE 0 END) AS BIGINT) AS n_boiler_lines,
               string_agg(CASE WHEN f.n_docs < {BOILER_MIN_DOCS} THEN l.line
                          END, ' ' ORDER BY l.g) AS cleaned_text
        FROM nonempty l JOIN doc_freq f ON md5(l.line) = f.lh
        GROUP BY l.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_lines, 0) AS n_lines,
           COALESCE(p.n_boiler_lines, 0) AS n_boiler_lines,
           p.cleaned_text
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


@register("l19_line_boilerplate", survey="L6,L2,G3", extended=True, sql=_L19_SQL)
def l19_line_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-wise boilerplate removal over the documents table:
    per-document line counts, boilerplate counts (corpus-wide DOCUMENT
    frequency >= 3), and the cleaned text with survivors rejoined in
    order. The fixture corpus has no newlines, so lines are synthesized as
    fixed 4-word windows — the counting/removal pipeline is identical to
    the real-newline case (line_table's docstring)."""
    return remove_boilerplate_lines(
        spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    )


def dedup_lines_within_doc(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = LINE_WORDS,
    newlines: bool = False,
) -> DataFrame:
    """Gopher/RefinedWeb's WITHIN-document rule (the complement of
    remove_boilerplate_lines' cross-corpus rule): drop repeated lines
    inside a single document, keeping each line's FIRST occurrence in
    order. Returns one row per input document —
    (id, n_lines, n_dup_lines, cleaned_text) — including NULL/empty-text
    documents (n_lines=0, cleaned_text NULL).

    100 TB shape: entirely document-local — the only shuffle keys are
    (id, line_hash) and then id, so parallelism is document count and no
    global state exists at all; the corpus-frequency pass of the
    cross-corpus rule is what this variant deliberately avoids.

    ``newlines=True`` splits on real ``\\n``s and rejoins survivors with
    ``\\n`` (blank separator lines are dropped — see line_table)."""
    lines = line_table(docs, text_col, id_col, line_words, newlines).withColumn(
        "line_hash", F.md5("line")
    )
    first = F.min("line_no").over(Window.partitionBy(id_col, "line_hash"))
    tagged = lines.withColumn("_first", first)
    per_doc = _reassemble_kept(
        tagged, id_col, F.col("line_no") == F.col("_first"), "n_dup_lines",
        sep="\n" if newlines else " ",
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("n_dup_lines", F.lit(0)).alias("n_dup_lines"),
        "cleaned_text",
    )


_L20_SQL = f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    lines AS (
        SELECT doc_id, g,
               array_to_string(
                   w[(g * {LINE_WORDS} + 1):(g * {LINE_WORDS} + {LINE_WORDS})],
                   ' ') AS line
        FROM tok,
             UNNEST(range(CAST(ceil(len(w) / {LINE_WORDS}.0) AS BIGINT))) AS t(g)
    ),
    nonempty AS (SELECT * FROM lines WHERE line <> ''),
    tagged AS (
        SELECT doc_id, g, line,
               g = min(g) OVER (PARTITION BY doc_id, md5(line)) AS is_first
        FROM nonempty
    ),
    per_doc AS (
        SELECT doc_id,
               count(*) AS n_lines,
               CAST(sum(CASE WHEN is_first THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_dup_lines,
               string_agg(CASE WHEN is_first THEN line END, ' ' ORDER BY g)
                   AS cleaned_text
        FROM tagged
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_lines, 0) AS n_lines,
           COALESCE(p.n_dup_lines, 0) AS n_dup_lines,
           p.cleaned_text
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


@register("l20_within_doc_line_dedup", survey="L6,L2,W1", extended=True, sql=_L20_SQL)
def l20_within_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-line removal (Gopher rule) over the
    documents table: keep each line's first occurrence, report dup counts.
    Document-local window — no global state, parallelism = documents."""
    return dedup_lines_within_doc(
        spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    )


# --------------------------------------------------------------------------
# L21: Gopher repetition-signal battery
# --------------------------------------------------------------------------
_L21_SQL = f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    lines AS (
        SELECT doc_id, g,
               array_to_string(
                   w[(g * {LINE_WORDS} + 1):(g * {LINE_WORDS} + {LINE_WORDS})],
                   ' ') AS line
        FROM tok,
             UNNEST(range(CAST(ceil(len(w) / {LINE_WORDS}.0) AS BIGINT))) AS t(g)
    ),
    nonempty AS (SELECT * FROM lines WHERE line <> ''),
    per_line AS (
        SELECT doc_id, line, count(*) AS c, len(line) AS chars,
               CASE WHEN regexp_matches(line, '^[-*•]') THEN 1 ELSE 0 END
                   AS bullet,
               CASE WHEN regexp_matches(line, '(\\.\\.\\.|…)$') THEN 1 ELSE 0 END
                   AS ellipsis
        FROM nonempty GROUP BY doc_id, line
    ),
    line_stats AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_lines,
               CAST(sum(c - 1) AS BIGINT) AS n_dup_lines,
               CAST(sum(c * chars) AS BIGINT) AS n_chars,
               CAST(sum((c - 1) * chars) AS BIGINT) AS n_dup_chars,
               CAST(sum(c * bullet) AS BIGINT) AS n_bullet,
               CAST(sum(c * ellipsis) AS BIGINT) AS n_ellipsis
        FROM per_line GROUP BY doc_id
    ),
    g2 AS (
        SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram, count(*) AS c
        FROM tok, UNNEST(range(1, len(w))) AS t(i)
        GROUP BY doc_id, gram
    ),
    g2_stats AS (
        SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_2gram_share
        FROM g2 GROUP BY doc_id
    ),
    g3 AS (
        SELECT doc_id, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram,
               count(*) AS c
        FROM tok, UNNEST(range(1, len(w) - 1)) AS t(i)
        GROUP BY doc_id, gram
    ),
    g3_stats AS (
        SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_3gram_share
        FROM g3 GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(l.n_lines, 0) AS n_lines,
           COALESCE(l.n_dup_lines, 0) AS n_dup_lines,
           CAST(l.n_dup_lines AS DOUBLE) / l.n_lines AS dup_line_frac,
           CAST(l.n_dup_chars AS DOUBLE) / l.n_chars AS dup_char_frac,
           g2s.top_2gram_share,
           g3s.top_3gram_share,
           CAST(l.n_bullet AS DOUBLE) / l.n_lines AS bullet_line_frac,
           CAST(l.n_ellipsis AS DOUBLE) / l.n_lines AS ellipsis_line_frac
    FROM documents d
    LEFT JOIN line_stats l USING (doc_id)
    LEFT JOIN g2_stats g2s USING (doc_id)
    LEFT JOIN g3_stats g3s USING (doc_id)
"""


# --- row-local signal machinery (r15 optimization) -------------------------
# Every l21 signal is a PER-DOCUMENT statistic, so the whole battery can be
# computed row-locally with array expressions: no explode, no shuffle, no
# join. The previous relational form ran three explode→aggregate legs and
# two joins — at 100 TB that shuffles every word 2-/3-gram as a string
# (~10-20× the corpus bytes); this form moves nothing and parallelizes as
# the scan (measured 4.5-5× at sf0.1, 1.9-2.7× at sf1, results
# bit-identical — integer counts and the same final IEEE divisions).
#
# Let-binding: ``transform(array(X), x -> body)[0]`` evaluates X exactly
# once however many times ``x`` appears in body — the SQL-expression
# equivalent of a let. Without it, CollapseProject inlines each derived
# array into every consumer and the tokenize work runs once per signal.
# The single evaluation of the whole struct per ROW is then guaranteed by
# the caller's ``explode(array(struct))`` Generate barrier, which the
# optimizer does not collapse through (field extraction on the generated
# attribute cannot duplicate the struct expression).


def _words_sql(text: str, newlines: bool) -> str:
    """The word-stream expression (same definition the relational form and
    the oracle use): newline mode treats \n/\r as separators and drops
    empties; window mode is a plain space split."""
    if newlines:
        return f"filter(split({text}, '[ \\n\\r]'), x -> x != '')"
    return f"split({text}, ' ')"


def _lines_sql(text: str, newlines: bool, line_words: int) -> str:
    """Per-doc NON-EMPTY line array — exactly line_table's rows, as an
    array: \r?\n split in newline mode, synthesized ``line_words``-word
    windows otherwise (empty lines filtered, mirroring line_table's
    ``line != ''``)."""
    if newlines:
        return f"filter(split({text}, '\\r?\\n'), l -> l != '')"
    w = f"split({text}, ' ')"
    return (
        f"filter(transform(sequence(0, cast(ceil(size({w}) / {line_words}.0)"
        f" as int) - 1), g -> array_join(slice({w}, g * {line_words} + 1,"
        f" {line_words}), ' ')), l -> l != '')"
    )


def _maxrun_sql(arr: str) -> str:
    """Exact max occurrence count of any element of ``arr``: sort, then a
    run-length fold (struct accumulator). Equals ``max(c)`` of the old
    per-gram COUNT aggregate."""
    return (
        f"aggregate(array_sort({arr}),"
        f" named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),"
        f" (acc, x) -> named_struct("
        f"   'prev', x,"
        f"   'run', if(acc.prev <=> x, acc.run + 1L, 1L),"
        f"   'best', greatest(acc.best, if(acc.prev <=> x, acc.run + 1L, 1L))),"
        f" acc -> acc.best)"
    )


def _grams_sql(w: str, n: int) -> str:
    return (
        f"transform(sequence(0, size({w}) - {n}),"
        f" i -> array_join(slice({w}, i + 1, {n}), ' '))"
    )


def _signals_struct_sql(text: str, newlines: bool, line_words: int) -> str:
    """All eight l21 signals as ONE let-bound struct expression. NULL
    semantics mirror the relational form's left-join misses: a doc with no
    non-empty lines gets counts 0 / fractions NULL; a doc too short to form
    an n-gram gets a NULL share. Gram share = max count / total count, with
    total = size(w) - n + 1 (what SUM(c) equaled)."""
    w_e = _words_sql(text, newlines)
    ln_e = _lines_sql(text, newlines, line_words)
    body = f"""named_struct(
      'n_lines', coalesce(CASE WHEN size(ln) > 0 THEN cast(size(ln) as bigint) END, 0L),
      'n_dup_lines', coalesce(CASE WHEN size(ln) > 0 THEN cast(size(ln) - size(dl) as bigint) END, 0L),
      'dup_line_frac', CASE WHEN size(ln) > 0 THEN cast(size(ln) - size(dl) as double) / size(ln) END,
      'dup_char_frac', CASE WHEN size(ln) > 0 THEN
          cast(aggregate(ln, 0L, (a, l) -> a + length(l)) - aggregate(dl, 0L, (a, l) -> a + length(l)) as double)
          / aggregate(ln, 0L, (a, l) -> a + length(l)) END,
      'top_2gram_share', CASE WHEN w IS NOT NULL AND size(w) >= 2 THEN
          cast({_maxrun_sql(_grams_sql('w', 2))} as double) / (size(w) - 1) END,
      'top_3gram_share', CASE WHEN w IS NOT NULL AND size(w) >= 3 THEN
          cast({_maxrun_sql(_grams_sql('w', 3))} as double) / (size(w) - 2) END,
      'bullet_line_frac', CASE WHEN size(ln) > 0 THEN
          cast(size(filter(ln, l -> l rlike '^[-*•]')) as double) / size(ln) END,
      'ellipsis_line_frac', CASE WHEN size(ln) > 0 THEN
          cast(size(filter(ln, l -> l rlike '(\\\\.\\\\.\\\\.|…)$')) as double) / size(ln) END
    )"""
    return (
        f"transform(array({w_e}), w -> "
        f"transform(array({ln_e}), ln -> "
        f"transform(array(array_distinct(ln)), dl -> {body})[0])[0])[0]"
    )


_SIGNAL_COLS = (
    "n_lines",
    "n_dup_lines",
    "dup_line_frac",
    "dup_char_frac",
    "top_2gram_share",
    "top_3gram_share",
    "bullet_line_frac",
    "ellipsis_line_frac",
)


def repetition_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = LINE_WORDS,
    newlines: bool = False,
) -> DataFrame:
    """Gopher's repetition-signal battery (the *fraction* signals real
    pipelines threshold on, complementing l19/l20's removal rules): per
    document —

    - ``dup_line_frac`` / ``dup_char_frac``: fraction of line occurrences
      (and of line CHARACTERS) beyond each distinct line's first occurrence
      (Gopher filters docs with >30% duplicate-line chars);
    - ``top_2gram_share`` / ``top_3gram_share``: share of all word 2-/3-gram
      occurrences taken by the most frequent one (NULL when the doc is too
      short to form a gram);
    - ``bullet_line_frac`` / ``ellipsis_line_frac``: fraction of lines
      starting with a bullet (-, *, •) or ending in an ellipsis (... or …).

    NULL/empty docs stay in the output (counts 0, fractions NULL).

    100 TB shape (r15): every signal is a per-document statistic, so the
    battery is computed ROW-LOCALLY with array expressions — one scan, zero
    shuffles, zero joins, O(doc) memory per row. The previous form ran
    three explode→aggregate legs joined back on the id, shuffling every
    2-/3-gram as a string (~10-20× the corpus bytes at scale). Duplicate
    counting uses total−distinct identities (sum(c−1) == size − distinct
    size; sum((c−1)·len) == chars − distinct chars) and the top-gram count
    is an exact sorted run-length fold — all integer math, with the same
    final IEEE divisions, so results are bit-identical (oracle-verified).
    The ``explode(array(struct))`` is a one-row Generate barrier that
    guarantees the struct evaluates once per row (see the let-binding note
    above)."""
    s = _signals_struct_sql(text_col, newlines, line_words)
    return docs.select(
        F.col(id_col), F.explode(F.array(F.expr(s))).alias("_s")
    ).select(id_col, *[F.col(f"_s.{c}").alias(c) for c in _SIGNAL_COLS])


@register("l21_repetition_signals", survey="L6,L4,G3", extended=True, sql=_L21_SQL)
def l21_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-signal battery over the documents table: duplicate
    line/char fractions, top 2-/3-gram shares, bullet/ellipsis line
    fractions (see :func:`repetition_signals`). Lines are the synthesized
    4-word windows (fixture corpus has no newlines); the signal math is
    line-source-agnostic."""
    return repetition_signals(
        spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    )


# --------------------------------------------------------------------------
# L19b/L21b: the line rules in REAL newline mode, oracle-registered (round 9)
# --------------------------------------------------------------------------
# The fixture corpus has no newlines, so the registered l19/l20/l21 oracles
# only ever exercised the synthesized 4-word-window mode; the real-\n path
# was pytest-proven but never cross-engine-verified (VERDICT r8 "what's
# missing #3"). These variants DERIVE a multi-line text inside the query —
# the same regexp_replace in both engines inserts a \n after every 4th word
# — and then run the newlines=True path end-to-end, so the \r?\n split,
# empty-line exclusion, \n-rejoin, and across-line gram tokenization are all
# value-compared against DuckDB. The derivation regex uses only \S and a
# literal space, which Java regex and RE2 match identically (ASCII-only \s
# in both defaults).
_NEWLINE_DERIVE_RE = r"(\S+ \S+ \S+ \S+) "
_NEWLINE_DERIVE_SQL = (
    "regexp_replace(text, '(\\S+ \\S+ \\S+ \\S+) ', '\\1' || chr(10), 'g')"
)


def _derived_newline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread BEFORE deriving (ADVICE r15): spread_scan sizes the frame via
    # df.rdd, and a derived frame pays a fresh analyze+physical-plan pass
    # per call (the memo only helps the shared load_table frames) — spread
    # the scan-rooted frame, then derive above the exchange, which also
    # parallelizes the regexp itself on a starved local scan.
    return spread_scan(load_table(spark, sf_dir, "documents"), "doc_id").withColumn(
        "text", F.regexp_replace("text", _NEWLINE_DERIVE_RE, "$1\n")
    )


_L19B_SQL = f"""
    WITH derived AS (
        SELECT doc_id, {_NEWLINE_DERIVE_SQL} AS text FROM documents
    ),
    tok AS (
        SELECT doc_id, string_split(text, chr(10)) AS ln FROM derived
    ),
    lines AS (
        SELECT doc_id, g, ln[g + 1] AS line
        FROM tok, UNNEST(range(len(ln))) AS t(g)
    ),
    nonempty AS (SELECT * FROM lines WHERE line <> ''),
    doc_freq AS (
        SELECT md5(line) AS lh, count(DISTINCT doc_id) AS n_docs
        FROM nonempty GROUP BY 1
    ),
    per_doc AS (
        SELECT l.doc_id,
               count(*) AS n_lines,
               CAST(sum(CASE WHEN f.n_docs >= {BOILER_MIN_DOCS} THEN 1
                             ELSE 0 END) AS BIGINT) AS n_boiler_lines,
               string_agg(CASE WHEN f.n_docs < {BOILER_MIN_DOCS} THEN l.line
                          END, chr(10) ORDER BY l.g) AS cleaned_text
        FROM nonempty l JOIN doc_freq f ON md5(l.line) = f.lh
        GROUP BY l.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_lines, 0) AS n_lines,
           COALESCE(p.n_boiler_lines, 0) AS n_boiler_lines,
           p.cleaned_text
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


@register("l19b_line_boilerplate_newlines", survey="L6,L2,G3", extended=True,
          sql=_L19B_SQL)
def l19b_line_boilerplate_newlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal in REAL newline mode: text derived by
    inserting \\n after every 4th word (identically in both engines), then
    the ``newlines=True`` path — split on \\r?\\n, blank lines excluded,
    survivors rejoined with \\n."""
    return remove_boilerplate_lines(
        _derived_newline_docs(spark, sf_dir), newlines=True
    )


_L21B_SQL = f"""
    WITH derived AS (
        SELECT doc_id, {_NEWLINE_DERIVE_SQL} AS text FROM documents
    ),
    ltok AS (
        SELECT doc_id, string_split(text, chr(10)) AS ln FROM derived
    ),
    lines AS (
        SELECT doc_id, g, ln[g + 1] AS line
        FROM ltok, UNNEST(range(len(ln))) AS t(g)
    ),
    nonempty AS (SELECT * FROM lines WHERE line <> ''),
    per_line AS (
        SELECT doc_id, line, count(*) AS c, len(line) AS chars,
               CASE WHEN regexp_matches(line, '^[-*•]') THEN 1 ELSE 0 END
                   AS bullet,
               CASE WHEN regexp_matches(line, '(\\.\\.\\.|…)$') THEN 1 ELSE 0 END
                   AS ellipsis
        FROM nonempty GROUP BY doc_id, line
    ),
    line_stats AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_lines,
               CAST(sum(c - 1) AS BIGINT) AS n_dup_lines,
               CAST(sum(c * chars) AS BIGINT) AS n_chars,
               CAST(sum((c - 1) * chars) AS BIGINT) AS n_dup_chars,
               CAST(sum(c * bullet) AS BIGINT) AS n_bullet,
               CAST(sum(c * ellipsis) AS BIGINT) AS n_ellipsis
        FROM per_line GROUP BY doc_id
    ),
    wtok AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '[ \\n\\r]'),
                           x -> x <> '') AS w
        FROM derived
    ),
    g2 AS (
        SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram, count(*) AS c
        FROM wtok, UNNEST(range(1, len(w))) AS t(i)
        GROUP BY doc_id, gram
    ),
    g2_stats AS (
        SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_2gram_share
        FROM g2 GROUP BY doc_id
    ),
    g3 AS (
        SELECT doc_id, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram,
               count(*) AS c
        FROM wtok, UNNEST(range(1, len(w) - 1)) AS t(i)
        GROUP BY doc_id, gram
    ),
    g3_stats AS (
        SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_3gram_share
        FROM g3 GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(l.n_lines, 0) AS n_lines,
           COALESCE(l.n_dup_lines, 0) AS n_dup_lines,
           CAST(l.n_dup_lines AS DOUBLE) / l.n_lines AS dup_line_frac,
           CAST(l.n_dup_chars AS DOUBLE) / l.n_chars AS dup_char_frac,
           g2s.top_2gram_share,
           g3s.top_3gram_share,
           CAST(l.n_bullet AS DOUBLE) / l.n_lines AS bullet_line_frac,
           CAST(l.n_ellipsis AS DOUBLE) / l.n_lines AS ellipsis_line_frac
    FROM documents d
    LEFT JOIN line_stats l USING (doc_id)
    LEFT JOIN g2_stats g2s USING (doc_id)
    LEFT JOIN g3_stats g3s USING (doc_id)
"""


@register("l21b_repetition_signals_newlines", survey="L6,L4,G3", extended=True,
          sql=_L21B_SQL)
def l21b_repetition_signals_newlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals in REAL newline mode (derived multi-line
    text, see l19b): lines from the \\r?\\n split, words tokenized ACROSS
    newlines with empties dropped — the whole newline code path
    cross-engine-verified, not just pytest-pinned."""
    return repetition_signals(
        _derived_newline_docs(spark, sf_dir), newlines=True
    )


# --------------------------------------------------------------------------
# L22: composite quality gate — the actual keep/drop verdict (round 9)
# --------------------------------------------------------------------------
# Published Gopher repetition cutoffs (Rae et al. 2021, table A1) plus the
# l6 shape rules; each failed rule sets one bit in a reason-code bitmask so
# downstream audits can ask "WHY was this dropped" without re-running the
# signals. A doc is kept iff no rule fires.
QG_MIN_CHARS = 100  # l6: minimum document size
QG_MIN_TOKENS = 20  # l6: minimum token count
QG_WORD_LEN_LO = 2.0  # l6: sane mean word length band
QG_WORD_LEN_HI = 12.0
QG_DUP_LINE_FRAC = 0.30  # Gopher: duplicate-line fraction
QG_DUP_CHAR_FRAC = 0.20  # Gopher: duplicate-line CHARACTER fraction
QG_TOP_2GRAM = 0.20  # Gopher: top 2-gram share
QG_TOP_3GRAM = 0.18  # Gopher: top 3-gram share
QG_BULLET_FRAC = 0.90  # Gopher: bullet-point line fraction
QG_ELLIPSIS_FRAC = 0.30  # Gopher: ellipsis line fraction

#: reason-code bit assignments (stable public contract — append, never
#: renumber: stored bitmasks in curated outputs must stay decodable)
QG_REASONS = {
    "too_short": 1 << 0,
    "too_few_tokens": 1 << 1,
    "word_len": 1 << 2,
    "dup_lines": 1 << 3,
    "dup_chars": 1 << 4,
    "top_2gram": 1 << 5,
    "top_3gram": 1 << 6,
    "bullets": 1 << 7,
    "ellipsis": 1 << 8,
}


def quality_gate(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    newlines: bool = False,
) -> DataFrame:
    """Per-document keep/drop verdict with a reason-code bitmask: combines
    the l6 shape rules (size, token count, mean word length) with Gopher's
    published repetition cutoffs over the :func:`repetition_signals` math.
    NULL signal values (doc too short to form a gram, NULL text) never fire
    a repetition rule — the shape rules are what reject degenerate docs.

    100 TB shape (r15): ONE row-local pass — the signal struct (see
    repetition_signals) and the shape columns are computed in a single
    projection and the verdict is arithmetic over them. No join, no
    shuffle, no aggregate: the gate scans the corpus once and parallelizes
    as the scan. (The previous form joined a shape pass onto a 3-leg
    relational signals pass — two extra scans, three shuffles and a join,
    and at scale the gram-string shuffle dominated.)

    ``newlines=True`` keeps the shape rules on the SAME token definition as
    the repetition signals (words split across ``\n``/``\r`` with empties
    dropped, newline bytes excluded from character counts) — one bitmask
    must never mix two tokenizations.

    Id contract (ADVICE r15): ids must be UNIQUE and NON-NULL. The Spark
    side is row-local (a duplicate id would yield one verdict row per input
    row, a NULL id would pass through), but the REGISTERED DuckDB oracle
    (_qg_sql) still joins its signals and shape CTEs on doc_id — on a
    corpus with duplicate or NULL ids the two engines would diverge, so the
    join-era id contract stays documented and binding until the oracle is
    rewritten row-locally too."""
    text = F.col(text_col)
    if newlines:
        n_tokens = F.when(text.isNull(), F.lit(0)).otherwise(
            F.size(
                F.expr(f"filter(split({text_col}, '[ \\n\\r]'), w -> w != '')")
            )
        )
        stripped = F.length(F.regexp_replace(text, "[ \n\r]", ""))
    else:
        n_tokens = F.when(text.isNull(), F.lit(0)).otherwise(
            F.size(F.split(text, " "))
        )
        stripped = F.length(F.replace(text, F.lit(" "), F.lit("")))
    avg_word_len = F.coalesce(stripped, F.lit(0)).cast(
        "double"
    ) / F.greatest(n_tokens, F.lit(1))
    sig = _signals_struct_sql(text_col, newlines, LINE_WORDS)
    j = docs.select(
        F.col(id_col),
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_word_len.alias("avg_word_len"),
        # one-row Generate barrier: the struct evaluates once per row even
        # though the reason bits below reference six of its fields
        F.explode(F.array(F.expr(sig))).alias("_s"),
    )

    def bit(cond, name: str):
        return F.when(
            F.coalesce(cond, F.lit(False)), F.lit(QG_REASONS[name])
        ).otherwise(F.lit(0))

    reasons = (
        bit(F.col("n_chars") < QG_MIN_CHARS, "too_short")
        + bit(F.col("n_tokens") < QG_MIN_TOKENS, "too_few_tokens")
        + bit(
            ~F.col("avg_word_len").between(QG_WORD_LEN_LO, QG_WORD_LEN_HI),
            "word_len",
        )
        + bit(F.col("_s.dup_line_frac") > QG_DUP_LINE_FRAC, "dup_lines")
        + bit(F.col("_s.dup_char_frac") > QG_DUP_CHAR_FRAC, "dup_chars")
        + bit(F.col("_s.top_2gram_share") > QG_TOP_2GRAM, "top_2gram")
        + bit(F.col("_s.top_3gram_share") > QG_TOP_3GRAM, "top_3gram")
        + bit(F.col("_s.bullet_line_frac") > QG_BULLET_FRAC, "bullets")
        + bit(F.col("_s.ellipsis_line_frac") > QG_ELLIPSIS_FRAC, "ellipsis")
    ).cast("long")
    return j.select(
        id_col,
        reasons.alias("reasons"),
        (reasons == 0).alias("keep"),
        F.bit_count(reasons).cast("long").alias("n_reasons"),
    )


def _qg_sql(sig_sql: str, shaped_body: str) -> str:
    """The l22 verdict SQL over any (signals CTE, shaped CTE) pair — one
    CASE-per-reason block shared by the window-mode and newline-mode
    registrations so the two oracles can never drift apart."""
    return f"""
    WITH sig AS ({sig_sql}),
    shaped AS ({shaped_body}),
    verdict AS (
        SELECT s.doc_id,
               CAST(
                 CASE WHEN s.n_chars < {QG_MIN_CHARS}
                      THEN {QG_REASONS['too_short']} ELSE 0 END
               + CASE WHEN s.n_tokens < {QG_MIN_TOKENS}
                      THEN {QG_REASONS['too_few_tokens']} ELSE 0 END
               + CASE WHEN s.avg_word_len NOT BETWEEN {QG_WORD_LEN_LO}
                           AND {QG_WORD_LEN_HI}
                      THEN {QG_REASONS['word_len']} ELSE 0 END
               + CASE WHEN COALESCE(g.dup_line_frac > {QG_DUP_LINE_FRAC},
                                    FALSE)
                      THEN {QG_REASONS['dup_lines']} ELSE 0 END
               + CASE WHEN COALESCE(g.dup_char_frac > {QG_DUP_CHAR_FRAC},
                                    FALSE)
                      THEN {QG_REASONS['dup_chars']} ELSE 0 END
               + CASE WHEN COALESCE(g.top_2gram_share > {QG_TOP_2GRAM}, FALSE)
                      THEN {QG_REASONS['top_2gram']} ELSE 0 END
               + CASE WHEN COALESCE(g.top_3gram_share > {QG_TOP_3GRAM}, FALSE)
                      THEN {QG_REASONS['top_3gram']} ELSE 0 END
               + CASE WHEN COALESCE(g.bullet_line_frac > {QG_BULLET_FRAC},
                                    FALSE)
                      THEN {QG_REASONS['bullets']} ELSE 0 END
               + CASE WHEN COALESCE(g.ellipsis_line_frac > {QG_ELLIPSIS_FRAC},
                                    FALSE)
                      THEN {QG_REASONS['ellipsis']} ELSE 0 END
               AS BIGINT) AS reasons
        FROM shaped s JOIN sig g USING (doc_id)
    )
    SELECT doc_id, reasons, reasons = 0 AS keep,
           CAST(bit_count(reasons) AS BIGINT) AS n_reasons
    FROM verdict
"""


_L22_SQL = _qg_sql(
    _L21_SQL,
    """
        SELECT doc_id,
               COALESCE(n_chars, 0) AS n_chars,
               CASE WHEN text IS NULL THEN 0
                    ELSE len(string_split(text, ' ')) END AS n_tokens,
               CAST(COALESCE(length(replace(text, ' ', '')), 0) AS DOUBLE)
                   / greatest(CASE WHEN text IS NULL THEN 0
                              ELSE len(string_split(text, ' ')) END, 1)
                   AS avg_word_len
        FROM documents
    """,
)


# driver tier since r14 (seat rotation): the curation family's composite
# quality gate gets a driver seat; sq2_not_in_anti rotated to extended
# (J6 keeps driver rows via j2 + sq1)
@register("l22_quality_gate", survey="L6,L4,F7", sql=_L22_SQL)
def l22_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite keep/drop quality verdict over the documents table: l6
    shape rules + Gopher repetition cutoffs, each failure a bit in a
    reason-code bitmask (see :data:`QG_REASONS`). The decision real
    pipelines actually make from the l21 signal battery."""
    return quality_gate(
        spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    )


_L22B_SQL = _qg_sql(
    _L21B_SQL,
    f"""
        SELECT doc_id,
               COALESCE(n_chars, 0) AS n_chars,
               CASE WHEN text IS NULL THEN 0
                    ELSE len(list_filter(
                             string_split_regex({_NEWLINE_DERIVE_SQL},
                                                '[ \\n\\r]'),
                             x -> x <> '')) END AS n_tokens,
               CAST(COALESCE(length(regexp_replace({_NEWLINE_DERIVE_SQL},
                                                   '[ \\n\\r]', '', 'g')),
                             0) AS DOUBLE)
                   / greatest(CASE WHEN text IS NULL THEN 0
                              ELSE len(list_filter(
                                       string_split_regex(
                                           {_NEWLINE_DERIVE_SQL}, '[ \\n\\r]'),
                                       x -> x <> '')) END, 1)
                   AS avg_word_len
        FROM documents
    """,
)


@register("l22b_quality_gate_newlines", survey="L6,L4,F7", extended=True,
          sql=_L22B_SQL)
def l22b_quality_gate_newlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite quality gate in REAL newline mode (derived multi-line
    text, see l19b): repetition signals over \\r?\\n lines, shape rules on
    the same across-newline tokenization, one reason-code bitmask — the
    whole newline verdict path cross-engine-verified."""
    return quality_gate(
        _derived_newline_docs(spark, sf_dir), newlines=True
    )


# --------------------------------------------------------------------------
# L23: deterministic text normalization (round 9)
# --------------------------------------------------------------------------
# The standard pre-dedup/pre-tokenize pass: typography unification, control
# stripping, casefold, whitespace collapse. The casefold is deliberately
# ASCII-ONLY: full Unicode lowercasing is ENGINE-DEPENDENT (measured: Java
# lowers 'İ' to 'i'+combining-dot where DuckDB yields bare 'i', and Java
# applies the Greek final-sigma rule ΣΟΣ→σος where DuckDB gives σοσ), so a
# deterministic cross-engine contract must not include it — document the
# scope instead of shipping a rule that flips per engine.
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_TYPO_FROM = "“”‘’—–\u00a0"  # curly quotes, em/en dash, NBSP (explicit escape: editors mangle raw NBSP)
_TYPO_TO = "\"\"''-- "
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def normalize_text(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, norm_text, n_chars_norm, changed): typography → ASCII
    equivalents (curly quotes, en/em dashes, NBSP; the … ellipsis expands
    to '...' so the l21 ellipsis rule still fires on normalized text),
    control characters stripped, ASCII casefold, whitespace runs collapsed
    to single spaces, ends trimmed. NULL text rows pass through (NULL
    norm_text, changed false). Pure row-local expressions — no shuffle, no
    UDF, identical in any engine."""
    text = F.col(text_col)
    norm = F.translate(text, _TYPO_FROM, _TYPO_TO)
    norm = F.regexp_replace(norm, "…", "...")
    norm = F.regexp_replace(norm, _CTRL_RE, "")
    norm = F.translate(norm, _ASCII_UPPER, _ASCII_LOWER)
    norm = F.trim(F.regexp_replace(norm, "[ \t\n\r]+", " "))
    return docs.select(
        id_col,
        norm.alias("norm_text"),
        F.coalesce(F.length(norm), F.lit(0)).alias("n_chars_norm"),
        F.coalesce(norm != text, F.lit(False)).alias("changed"),
    )


_L23_SQL = """
    WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 AND text IS NOT NULL THEN
                   concat(chr(8220), text, chr(8221), ' ', chr(8212), ' ',
                          chr(8230), chr(9), 'TAIL', chr(1))
               ELSE text END AS text
        FROM documents
    ),
    norm AS (
        SELECT doc_id,
               trim(regexp_replace(
                   translate(
                       regexp_replace(
                           regexp_replace(
                               translate(text,
                                         chr(8220) || chr(8221) || chr(8216) ||
                                         chr(8217) || chr(8212) || chr(8211) ||
                                         chr(160),
                                         '""' || chr(39) || chr(39) || '-- '),
                               chr(8230), '...', 'g'),
                           '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
                       'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                       'abcdefghijklmnopqrstuvwxyz'),
                   '[ \\t\\n\\r]+', ' ', 'g')) AS norm_text,
               text
        FROM planted
    )
    SELECT doc_id,
           norm_text,
           COALESCE(length(norm_text), 0) AS n_chars_norm,
           COALESCE(norm_text <> text, FALSE) AS changed
    FROM norm
"""


@register("l23_normalize_text", survey="L6,F2", extended=True, sql=_L23_SQL)
def l23_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic normalization over the documents table. The fixture
    corpus is already clean ASCII, so every 7th doc is planted (identically
    in both engines) with curly quotes, an em-dash, an ellipsis char, a tab
    and a control byte — the transformations all fire and the oracle
    value-compares the normalized text byte-for-byte. NULL-text docs are
    never planted (guarded identically in both engines — Spark's concat
    returns NULL on any NULL argument while DuckDB's skips NULLs, so an
    unguarded plant would diverge on a NULL-text row)."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    planted = docs.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 7 == 0) & F.col("text").isNotNull(),
            F.concat(
                F.lit("“"), F.col("text"), F.lit("” — …"),
                F.lit("\tTAIL\x01"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return normalize_text(planted)
