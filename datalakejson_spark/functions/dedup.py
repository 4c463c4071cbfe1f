"""Deduplication operators (SURVEY.md §2.12 L1/L2): exact, MinHash-LSH,
SimHash. Tier C — the LLM-training-data extensions mandated by
BASELINE.json:6; the reference's own dedup is file-level idempotency
(``ON CONFLICT DO NOTHING``, sudo_code.txt:90), re-expressed at row level.

Cross-engine determinism: all hashing is md5-over-strings (identical in Spark
and DuckDB), never engine-native hash functions. The portable expressions are
generated once in Python and used verbatim on both sides.

Scale notes:
- Exact dedup groups on md5(text) — the shuffle key is 32 bytes regardless of
  document size, and the full text never moves unless it's the keeper.
- MinHash-LSH is the standard shingle → k-minhash → band-bucket pipeline: the
  only shuffle of the wide explode is the per-doc signature aggregation;
  candidate generation joins on (band, band_hash) buckets, never all-pairs.
- SimHash: l2b keeps the compact 16-bit signature demo; the PAIRING path
  (l2f) uses a 64-bit signature as four 16-bit md5 lanes, banded by lane —
  65536 bucket values per band keeps candidate pairs O(collisions) as the
  corpus grows (the 16-bit/4-bit-nibble banding went quadratic: 115 s at
  sf1, caught by tools/scale_smoke.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table, spread_scan

NUM_HASHES = 8  # minhash permutations
BAND_ROWS = 2  # rows per LSH band → NUM_HASHES/BAND_ROWS = 4 bands
NUM_BANDS = NUM_HASHES // BAND_ROWS
#: Hex chars per minhash lane. Round 10 widened 4 → 8 (16 → 32 bits): with
#: 16-bit lanes a 2-row band carries only 32 bits of identity, and because
#: minhash MINIMUMS concentrate near zero the likely band-value region
#: saturates as the corpus grows — measured ~1.6% of ALL-NOVEL documents
#: false-positived as near-dups at a 10^5-doc index and ~10-12% at 10^6
#: (tools/dedup_index_curve.py; silent data loss for a training pipeline).
#: 32-bit lanes give a 64-bit band identity: chance collisions stay
#: negligible past 10^10 documents. Lanes 0-3 are disjoint chunks of
#: md5(shingle); lanes 4-7 of md5(md5(shingle)) — the second derived hash
#: keeps the one-hash-per-shingle pipeline (both engines compute it
#: identically) at the cost of one extra md5 per shingle row.
LANE_HEX = 8
LANES_PER_MD5 = 32 // LANE_HEX
SHINGLE = 3  # 3-word shingles
SIMHASH_BITS = 16


def _hex4_to_int(expr: str, offset: int = 0) -> str:
    """Portable SQL: hex chars [offset+1, offset+4] of md5 ``expr`` -> int
    in [0, 65535]. Same text parses in Spark SQL and DuckDB (instr/substr
    are shared). Disjoint offsets give independent 16-bit hashes from one
    md5 — the lane trick MinHash uses (with wider 32-bit lanes since round
    10), reused here for the wide SimHash, where 16-bit vote lanes are fine
    (SimHash compares bit-distance, not bucket identity)."""
    digits = []
    for i in range(offset + 1, offset + 5):
        digits.append(
            f"(instr('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1)"
        )
    return (
        f"((({digits[0]}) * 4096) + (({digits[1]}) * 256) "
        f"+ (({digits[2]}) * 16) + ({digits[3]}))"
    )


# --------------------------------------------------------------------------
# L1: exact dedup via content hash
# --------------------------------------------------------------------------
@register(
    "l1_exact_dedup",
    survey="L1,G2",
    sql="""
    SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keeper_id
    FROM documents
    GROUP BY 1
    """,
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest doc_id. Hash-first
    so the shuffle key is fixed-width — at 100 TB the text column is pruned
    from the exchange entirely."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_id")
    )


def keep_first_distinct(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Library form of L1: return the deduplicated corpus (keeper rows only)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(text_col)).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --------------------------------------------------------------------------
# L2: MinHash signatures + LSH band candidate pairs
# --------------------------------------------------------------------------

# Shingle expression (3-word shingles) over a pre-split words column ``w``.
# Referencing a column (not split(text) inline) matters: an inline split would
# be re-evaluated per lambda element, turning shingling O(words) → O(words²).
_SPARK_SHINGLES = (
    f"transform(sequence(1, greatest(size(w) - {SHINGLE - 1}, 1)), "
    f"i -> concat_ws(' ', slice(w, i, {SHINGLE})))"
)
_DUCK_SHINGLES = (
    f"[array_to_string(w[i:i+{SHINGLE - 1}], ' ') "
    f"for i in range(1, greatest(len(w) - {SHINGLE - 2}, 2))]"
)

# One md5 per shingle (+ one derived md5 for the upper lanes); the 8 minhash
# lanes are disjoint LANE_HEX-char chunks (one-permutation-hashing flavor:
# far cheaper than 8 salted hashes, and min over fixed-width lowercase hex
# is the same as numeric min). Lane source/offset math mirrors
# _min_lane_signatures exactly — one definition per engine, same constants.
def _lane_src_sql(lane: int) -> str:
    return "h" if lane < LANES_PER_MD5 else "md5(h)"


_MINHASH_AGGS = ",\n           ".join(
    f"min(substr({_lane_src_sql(lane)}, "
    f"{1 + LANE_HEX * (lane % LANES_PER_MD5)}, {LANE_HEX})) AS mh{lane}"
    for lane in range(NUM_HASHES)
)
_BAND_EXPRS = [
    (
        band,
        "md5(concat("
        + ", ".join(f"mh{band * BAND_ROWS + r}" for r in range(BAND_ROWS))
        + "))",
    )
    for band in range(NUM_BANDS)
]
_DUCK_BANDS_UNION = "\n        UNION ALL\n        ".join(
    f"SELECT doc_id, {band} AS band, {expr} AS band_hash FROM sigs"
    for band, expr in _BAND_EXPRS
)

_L2_SQL = f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    shingled AS (
        SELECT doc_id, unnest(list_distinct({_DUCK_SHINGLES})) AS shingle
        FROM tok
    ),
    hashed AS (
        SELECT doc_id, md5(shingle) AS h FROM shingled
    ),
    sigs AS (
        SELECT doc_id,
           {_MINHASH_AGGS}
        FROM hashed
        GROUP BY doc_id
    ),
    bands AS (
        {_DUCK_BANDS_UNION}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, shingles) — deduped shingle arrays (``array_distinct`` BEFORE
    any explode, map-side). The shared projection minhash signatures AND the
    exact-Jaccard verify stage both derive from."""
    tok = df.select(F.col(id_col), F.split(text_col, " ").alias("w"))
    return tok.select(
        F.col(id_col), F.array_distinct(F.expr(_SPARK_SHINGLES)).alias("shingles")
    )


#: all NUM_HASHES lane mins as ONE parsed struct expression (r16, guide §5):
#: the per-lane F.expr(...).alias(...) list cost ~2 py4j round-trips per
#: lane per query build; a single struct parses in one trip and the
#: aggregate planner extracts the min()s exactly as before (partial
#: aggregation unchanged, values identical — verified plan-pinned).
_MINHASH_STRUCT_AGG = (
    "struct("
    + ", ".join(
        f"min(substr({'h' if lane < LANES_PER_MD5 else 'h2'}, "
        f"{1 + LANE_HEX * (lane % LANES_PER_MD5)}, {LANE_HEX})) AS mh{lane}"
        for lane in range(NUM_HASHES)
    )
    + ")"
)


def _min_lane_signatures(hashed: DataFrame, id_col: str) -> DataFrame:
    """(id, mh0..mhK) from an (id, h) md5-per-shingle frame: NUM_HASHES
    min-aggregates over disjoint LANE_HEX-char lanes — lanes 0..3 of ``h``,
    lanes 4..7 of the derived ``md5(h)`` (projected once per row, not
    re-hashed per aggregate). The ONE definition of the lane math — every
    signature producer funnels through here, so a lane-width or hash change
    can never make the generate and verify stages disagree; the DuckDB
    mirror is _MINHASH_AGGS, generated from the same constants."""
    hashed = hashed.selectExpr(id_col, "h", "md5(h) AS h2")
    return (
        hashed.groupBy(id_col)
        .agg(F.expr(_MINHASH_STRUCT_AGG).alias("_s"))
        .select(id_col, "_s.*")
    )


def signatures_from_shingle_sets(sets_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, mh0..mhK) from an already-materialized shingle_sets frame.

    Use this ONLY when the shingle arrays genuinely exist as data (e.g. read
    back from a table). When deriving straight from text, call
    minhash_signatures instead: exploding a *column* makes Catalyst's
    InferFiltersFromGenerate infer ``size(shingles) > 0`` and push it
    through the defining projection, re-evaluating the whole shingle
    pipeline a second time per row at the scan (measured 2× on the l2
    bench). The filter is pure waste here — ``greatest(size(w)-2, 1)``
    guarantees the array is never empty."""
    hashed = sets_df.select(
        F.col(id_col), F.explode("shingles").alias("shingle")
    ).select(F.col(id_col), F.md5("shingle").alias("h"))
    return _min_lane_signatures(hashed, id_col)


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, mh0..mhK) MinHash signature table.

    Shape: explode deduped shingles (``array_distinct`` BEFORE the explode —
    map-side) → md5 once per shingle → 8 min-aggregates. The explode input
    is the shingle EXPRESSION, not a projected column: an attribute input
    would trip InferFiltersFromGenerate into duplicating the shingle
    computation at the scan (see signatures_from_shingle_sets). The groupBy
    looks like avoidable work next to a pure map-side ``array_min``
    formulation, but it is deliberately kept: downstream LSH banding
    self-joins the signature table, and the aggregate's shuffle is an
    Exchange that Spark's ReuseExchange deduplicates across the two join
    sides — provided both sides reference ALL signature columns identically
    (see lsh_candidate_pairs: a per-band union would let column pruning
    specialize each branch's aggregate and defeat the reuse, which is
    exactly the 8×-recompute bug round 1 shipped)."""
    hashed = (
        df.selectExpr(id_col, f"split({text_col}, ' ') AS w")
        .selectExpr(
            id_col, f"explode(array_distinct({_SPARK_SHINGLES})) AS shingle"
        )
        .selectExpr(id_col, "md5(shingle) AS h")
    )
    return _min_lane_signatures(hashed, id_col)


def band_table(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_hash) LSH band table from a signature table — one row
    per doc per band, built with a single explode(array(struct...)) so the
    signature pipeline upstream is never duplicated (see lsh_candidate_pairs
    for why that matters). This is also the persisted-index format for
    incremental dedup (functions/incremental_dedup.py)."""
    band_array = (
        "array("
        + ", ".join(
            f"named_struct('band', {band}, 'band_hash', {expr})"
            for band, expr in _BAND_EXPRS
        )
        + ")"
    )
    return sigs.selectExpr(id_col, f"explode({band_array}) AS bb").selectExpr(
        id_col, "bb.band AS band", "bb.band_hash AS band_hash"
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band the signatures and emit candidate near-dup pairs (id_a < id_b).

    The join key is (band, band_hash): docs only meet if a whole band of
    minhashes agrees — the LSH guarantee that keeps this O(collisions), not
    O(n²), at scale.

    Plan shape (the round-1 lesson): all bands come from ONE
    explode(array(struct(band, band_hash)...)) over the signature table, so
    the expensive shingle→md5→aggregate pipeline appears exactly once per
    self-join side — and because both sides then reference identical columns,
    the aggregate's Exchange is deduplicated by ReuseExchange and the
    pipeline executes ONCE per run. (Round 1 built bands as a 4-way union of
    per-band selects; column pruning specialized each branch's partial
    aggregate to its 2 mh lanes, the 8 Exchanges stopped being equal, and the
    scan+shingle+aggregate ran 8×. Verified fixed via executedPlan:
    tests/test_plans.py asserts a single documents scan and a ReusedExchange
    in the executed l2 plan.)
    """
    bands = band_table(sigs, id_col)
    # hint("merge"): without it Spark broadcasts one side (bands is small at
    # test sf), and a BroadcastExchange can never reuse the other side's
    # shuffle Exchange → the pipeline would run twice. With a sort-merge join
    # both sides need the same hashpartitioning(band, band_hash) Exchange,
    # ReuseExchange deduplicates them, and the pipeline runs ONCE. At 100 TB
    # broadcast would be wrong anyway: the band table is 4× the corpus row
    # count.
    a = bands.alias("a").hint("merge")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


@register(
    "l2_minhash_lsh_pairs",
    survey="L2",
    extended=True,  # seat rotation r14: L2 keeps its driver row via
    # l7_decontamination; this stays local-sweep-verified, bench-headline,
    # and plan-pinned (tests/test_plans.py minhash suite)
    sql=_L2_SQL,
)
def l2_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs: 3-word shingles → 8 md5-minhashes → 4 LSH
    bands of 2 → bucket join. Both engines run the byte-identical md5
    pipeline, so the candidate set matches exactly.

    spread_scan (r15): the fixture corpus is one parquet row group, so the
    whole shingle→md5 pipeline would execute on ONE task regardless of core
    count (guide §2.5 unsplittable input). The adaptive repartition is a
    no-op whenever the scan already feeds the cores — i.e. at any real
    corpus size (measured 1.67× on the bench; exchange count unchanged at
    scale)."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    return lsh_candidate_pairs(minhash_signatures(docs))


# --------------------------------------------------------------------------
# L2b: SimHash signatures
# --------------------------------------------------------------------------
SIMHASH_LANES = 4  # 4 x 16-bit lane signatures = one 64-bit wide SimHash


def _simhash_sigs_sql(lanes: int) -> str:
    """words -> hashed -> votes -> sigs CTE chain for a ``lanes`` x 16-bit
    SimHash — THE one definition of the hash/vote/combine math on the
    DuckDB side. l2b is the 1-lane instance, l2f the 4-lane one; an edit
    here changes both formulations in lockstep (the _min_lane_signatures
    single-definition rule, applied to SimHash)."""
    lane_hashes = ",\n           ".join(
        f"{_hex4_to_int('word', 4 * k)} AS h{k}" for k in range(lanes)
    )
    votes = ",\n           ".join(
        f"sum(CASE WHEN (h{k} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{k}_{i}"
        for k in range(lanes)
        for i in range(SIMHASH_BITS)
    )
    combine = ",\n           ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN v{k}_{i} > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(SIMHASH_BITS)
        )
        + f" AS BIGINT) AS s{k}"
        for k in range(lanes)
    )
    return f"""words AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
           {lane_hashes}
        FROM words
    ),
    votes AS (
        SELECT doc_id,
           {votes}
        FROM hashed
        GROUP BY doc_id
    ),
    sigs AS (
        SELECT doc_id,
           {combine}
        FROM votes
    )"""


def simhash_wide_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lanes: int = SIMHASH_LANES,
) -> DataFrame:
    """(id, s0..s{lanes-1}) — a SimHash of ``lanes`` independent 16-bit lane
    signatures, each from a disjoint md5 hex lane of the word hash (the
    same lane trick as MinHash). THE one Spark-side definition (l2b = the
    1-lane instance). Kept as one column per lane because the lanes ARE the
    LSH bands: hamming <= lanes-1 over the full signature leaves at least
    one lane untouched (pigeonhole), and 16-bit lane equality gives 65536
    bucket values per band — bucket sizes stay O(n / 65536), so candidate
    pairs scale near-linearly. (The narrow 16-bit signature banded into
    4-bit nibbles has only 16 bucket values: buckets grow with n and pairs
    quadratically — measured 115 s at sf1 vs ~4 s for this scheme.)"""
    words = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(text_col, " "))).alias("word")
    )
    hashed = words.select(
        F.col(id_col),
        *[F.expr(_hex4_to_int("word", 4 * k)).alias(f"h{k}") for k in range(lanes)],
    )
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"h{k}"), i).bitwiseAND(1) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{k}_{i}")
            for k in range(lanes)
            for i in range(SIMHASH_BITS)
        ]
    )
    combines = [
        F.expr(
            " + ".join(
                f"(CASE WHEN v{k}_{i} > 0 THEN {1 << i} ELSE 0 END)"
                for i in range(SIMHASH_BITS)
            )
        ).cast("bigint").alias(f"s{k}")
        for k in range(lanes)
    ]
    return votes.select(F.col(id_col), *combines)


_L2B_SQL = f"""
    WITH {_simhash_sigs_sql(1)}
    SELECT doc_id, s0 AS simhash FROM sigs
"""


@register("l2b_simhash_signatures", survey="L2", sql=_L2B_SQL, extended=True)
# extended: L2 driver coverage via l2_minhash_lsh_pairs/l2c/l2d/l2e
def l2b_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (the 1-lane instance of
    simhash_wide_signatures): per-bit ±1 votes over md5 word hashes,
    sign-combined. Compact signature demo; the PAIRING path is l2f's
    4-lane form."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    return simhash_wide_signatures(docs, lanes=1).select(
        "doc_id", F.col("s0").alias("simhash")
    )


_WIDE_HAMMING = " + ".join(
    f"bit_count(xor(a.s{k}, b.s{k}))" for k in range(SIMHASH_LANES)
)
_LANE_COLS = ", ".join(f"s{k}" for k in range(SIMHASH_LANES))

_L2F_SQL = f"""
    WITH {_simhash_sigs_sql(SIMHASH_LANES)},
    bands AS (
        SELECT doc_id, {_LANE_COLS}, i AS band,
               CASE i WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END
                   AS band_val
        FROM sigs, unnest([0, 1, 2, 3]) AS t(i)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({_WIDE_HAMMING} AS INT) AS hamming
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                AND a.doc_id < b.doc_id
    WHERE {_WIDE_HAMMING} <= 3
"""


@register("l2f_simhash_pairs", survey="L2", sql=_L2F_SQL, extended=True)
def l2f_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming distance <= 3 over a 64-bit
    signature, banded by its four 16-bit lanes: the pigeonhole bound makes
    the band join COMPLETE for the threshold, and 65536 bucket values per
    band keep it O(collisions) as the corpus grows. This replaces the
    16-bit/4-bit-nibble formulation, whose 16 bucket values made candidate
    pairs quadratic in corpus size (the sf1 scale smoke caught it: 115 s
    at 50k docs; this shape runs the same tier in ~4 s). The self-join is
    hinted sort-merge for the same reason as lsh_candidate_pairs: a
    broadcast side could never ReuseExchange against the other side's
    shuffle, and the 64-vote signature aggregate would execute twice."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    sigs = simhash_wide_signatures(docs)
    lane_cols = [f"s{k}" for k in range(SIMHASH_LANES)]
    band_structs = F.array(
        *[
            F.struct(F.lit(k).alias("band"), F.col(f"s{k}").alias("band_val"))
            for k in range(SIMHASH_LANES)
        ]
    )
    bands = sigs.select(
        "doc_id", *lane_cols, F.explode(band_structs).alias("bb")
    ).select(
        "doc_id",
        *lane_cols,
        F.col("bb.band").alias("band"),
        F.col("bb.band_val").alias("band_val"),
    )
    a, b = bands.alias("a"), bands.hint("merge").alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.s{k}").bitwiseXOR(F.col(f"b.s{k}")))
        for k in range(SIMHASH_LANES)
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


# --------------------------------------------------------------------------
# L2g: two-stage near-dup — LSH candidates VERIFIED by exact Jaccard
# --------------------------------------------------------------------------
JACCARD_DUP_THRESHOLD = 0.6

_L2G_SQL = f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    shingle_sets AS (
        SELECT doc_id, list_distinct({_DUCK_SHINGLES}) AS shingles FROM tok
    ),
    shingled AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM shingle_sets
    ),
    hashed AS (
        SELECT doc_id, md5(shingle) AS h FROM shingled
    ),
    sigs AS (
        SELECT doc_id,
           {_MINHASH_AGGS}
        FROM hashed
        GROUP BY doc_id
    ),
    bands AS (
        {_DUCK_BANDS_UNION}
    ),
    candidates AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / greatest(len(list_distinct(sa.shingles || sb.shingles)), 1),
                 6) AS jaccard
    FROM candidates
    JOIN shingle_sets sa ON sa.doc_id = doc_a
    JOIN shingle_sets sb ON sb.doc_id = doc_b
    WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          / greatest(len(list_distinct(sa.shingles || sb.shingles)), 1)
          >= {JACCARD_DUP_THRESHOLD}
"""


@register("l2g_verified_neardup_pairs", survey="L2,J3,F5", extended=True, sql=_L2G_SQL)
def l2g_verified_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete two-stage near-dup pipeline: LSH bucket collisions
    GENERATE candidates (O(collisions), whole corpus), exact shingle-set
    Jaccard VERIFIES each candidate and drops the false positives the bands
    let through. The verify join touches only candidate pairs — at 100 TB
    the shingle arrays move for the ~0.1 % of pairs that collided, never
    all-pairs (this is the composition l2c's docstring promises). The
    candidate stage derives signatures straight from text
    (minhash_signatures) rather than from the sets projection — exploding
    the projected column would double-evaluate the shingle pipeline at the
    scan (InferFiltersFromGenerate, see signatures_from_shingle_sets); the
    lane math is shared either way."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    sets = shingle_sets(docs)
    candidates = lsh_candidate_pairs(minhash_signatures(docs))
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)).cast(
        "double"
    )
    jac = inter / union
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_DUP_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
