"""Curation operators (functions/curation.py): deterministic splits, domain
mixing, PII redaction, vocabulary stats, repetition scoring. Oracle parity is
covered by tools/verify_oracle.py; these tests pin the library-level
semantics the oracle can't see (determinism across runs, partition
invariance, plan shape)."""

from __future__ import annotations

import pyspark.sql.functions as F

from datalakejson_spark.functions.curation import (
    assign_split,
    l10_source_mixture,
    l12_vocab_top_df,
    l13_top_token_share,
)
from datalakejson_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_split_partition_and_fractions(spark):
    """Every doc lands in exactly one split, and fractions track the hash
    thresholds (80.1/9.8/10.1 ±5pp at 500 docs)."""
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    split = assign_split(docs)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n
    assert abs(counts["train"] / n - 205 / 256) < 0.05
    assert abs(counts["val"] / n - 25 / 256) < 0.05
    assert abs(counts["test"] / n - 26 / 256) < 0.05


def test_split_deterministic_under_repartition(spark):
    """The assignment is a pure function of doc_id: identical for the same
    doc across runs and partitionings (the resume/audit property)."""
    docs = load_table(spark, SF, "documents")
    a = {r.doc_id: r.split for r in assign_split(docs).select("doc_id", "split").collect()}
    b = {
        r.doc_id: r.split
        for r in assign_split(docs.repartition(17, "lang")).select("doc_id", "split").collect()
    }
    assert a == b


def test_mixture_weights_honored(spark):
    """Full-weight sources keep every doc; sampled sources keep a subset
    near their weight (binomial at n=25 → wide tolerance, but exact
    determinism is asserted by the oracle hash, not here)."""
    rows = l10_source_mixture(spark, SF).collect()
    by_src = {r.source: r for r in rows}
    for i in range(5):  # weight 1.0
        r = by_src[f"src{i}"]
        assert r.n_kept == r.n_docs
    sampled = [by_src[f"src{i}"] for i in range(10, 20)]  # weight 0.25
    frac = sum(r.n_kept for r in sampled) / sum(r.n_docs for r in sampled)
    assert 0.1 < frac < 0.45


def test_vocab_topk_plan_uses_take_ordered(spark):
    """The top-20 must be TakeOrderedAndProject (bounded heap per partition),
    never a global Sort materialization — the 100 TB shape."""
    df = l12_vocab_top_df(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_top_token_share_bounds(spark):
    """top_share is a valid share; the repetitive flag matches the 0.2
    threshold row-by-row."""
    rows = l13_top_token_share(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.top_share <= 1
        assert r.top_token_count <= r.n_tokens
        assert r.repetitive == (r.top_share > 0.2)


def test_lsh_decontamination_recall(spark):
    """The probabilistic half of l7c's contract: verbatim leaks (cos 1.0)
    are caught with certainty, and paraphrase-level contaminated rows
    (0.9 <= cos < 1) at a high fraction — the 4-table x 3-plane recall the
    decontaminate_semantic_lsh docstring claims (~0.98 in this regime)."""
    import pyspark.sql.functions as F

    from datalakejson_spark.functions.curation import (
        DECON_COSINE_THRESHOLD,
        decontaminate_semantic_lsh,
    )
    from datalakejson_spark.functions.similarity import cosine_expr
    from datalakejson_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    ev = emb.filter(F.col("vec_id") % 97 == 0)
    exact = (
        emb.select("vec_id", F.col("embedding").alias("c_emb"))
        .crossJoin(
            F.broadcast(ev.select(F.col("embedding").alias("e_emb")))
        )
        .select("vec_id", F.round(cosine_expr("c_emb", "e_emb"), 6).alias("cos"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_cos"))
        .filter(F.col("max_cos") >= DECON_COSINE_THRESHOLD)
    )
    flagged = {r.vec_id for r in decontaminate_semantic_lsh(emb, ev).collect()}
    verbatim = {r.vec_id for r in exact.filter("max_cos >= 0.999999").collect()}
    near = {r.vec_id for r in exact.filter("max_cos < 0.999999").collect()}
    assert verbatim, "fixture must contain verbatim leaks (eval ⊂ corpus)"
    assert verbatim <= flagged  # guaranteed: identical vectors, all buckets
    if near:  # probabilistic tier: hold the docstring's recall claim
        recall = len(near & flagged) / len(near)
        assert recall >= 0.9, (recall, len(near))


def test_boilerplate_removal_semantic(spark):
    """Planted-banner semantics for the C4 line rule: a 4-word banner
    repeated across >= 3 docs is stripped from every doc; unique content
    survives in order; a doc that is ALL banner cleans to NULL."""
    from datalakejson_spark.functions.curation import remove_boilerplate_lines

    banner = "accept all cookies now"
    rows = [
        (1, f"{banner} alpha bravo charlie delta"),
        (2, f"{banner} echo foxtrot golf hotel"),
        (3, f"{banner} india juliet kilo lima"),
        (4, "mike november oscar papa quebec romeo sierra tango"),
        (5, banner),  # all-boilerplate doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(docs, line_words=4).collect()
    }
    assert out[1].cleaned_text == "alpha bravo charlie delta"
    assert out[2].cleaned_text == "echo foxtrot golf hotel"
    assert out[3].cleaned_text == "india juliet kilo lima"
    assert out[1].n_boiler_lines == 1 and out[1].n_lines == 2
    # untouched doc: both lines unique, text preserved in order
    assert out[4].cleaned_text == rows[3][1]
    assert out[4].n_boiler_lines == 0
    # all-boilerplate doc cleans to NULL (matches the SQL oracle's
    # string_agg-over-no-rows semantics)
    assert out[5].cleaned_text is None and out[5].n_boiler_lines == 1


def test_within_doc_line_dedup_semantic(spark):
    """Gopher's within-document rule: a paragraph repeated INSIDE one doc
    collapses to its first occurrence; the same paragraph in ANOTHER doc is
    untouched (no cross-document state, unlike remove_boilerplate_lines)."""
    from datalakejson_spark.functions.curation import dedup_lines_within_doc

    para = "one two three four"
    rows = [
        (1, f"{para} alpha bravo charlie delta {para}"),  # internal repeat
        (2, f"{para} echo foxtrot golf hotel"),  # same para, other doc: kept
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r for r in dedup_lines_within_doc(docs, line_words=4).collect()
    }
    assert out[1].cleaned_text == f"{para} alpha bravo charlie delta"
    assert out[1].n_dup_lines == 1 and out[1].n_lines == 3
    assert out[2].cleaned_text == rows[1][1]
    assert out[2].n_dup_lines == 0


def test_boilerplate_is_document_frequency_not_occurrences(spark):
    """The cross-corpus rule counts DISTINCT documents: a refrain repeated
    3x inside ONE doc is not chrome and must survive l19 (it is l20's rule
    to collapse); NULL/empty-text docs still appear in the output."""
    from datalakejson_spark.functions.curation import (
        dedup_lines_within_doc,
        remove_boilerplate_lines,
    )

    refrain = "row row row boat"
    rows = [
        (1, f"{refrain} {refrain} {refrain}"),  # internal-only repetition
        (2, "unique words here friend"),
        (3, None),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_boilerplate_lines(docs).collect()}
    assert set(out) == {1, 2, 3, 4}  # every doc present, incl. null/empty
    assert out[1].n_boiler_lines == 0  # doc-frequency 1 < 3: kept
    assert out[1].cleaned_text == rows[0][1]
    assert out[3].n_lines == 0 and out[3].cleaned_text is None
    assert out[4].n_lines == 0 and out[4].cleaned_text is None
    # ...and l20 is the rule that collapses the internal refrain
    within = {r.doc_id: r for r in dedup_lines_within_doc(docs).collect()}
    assert within[1].cleaned_text == refrain and within[1].n_dup_lines == 2
    assert set(within) == {1, 2, 3, 4}


def test_line_rules_real_newlines_end_to_end(spark):
    """The real-corpus path (VERDICT r7 'what's wrong #2'): documents with
    actual \n-separated lines, a banner repeated across >= 3 docs, an
    internal refrain inside one doc, and blank separator lines between
    paragraphs. l19's rule (newlines=True) drops ONLY the cross-document
    banner, rejoins survivors with \n, and blank lines never count; l20's
    rule collapses ONLY the internal refrain to its first occurrence."""
    from datalakejson_spark.functions.curation import (
        dedup_lines_within_doc,
        remove_boilerplate_lines,
    )

    banner = "Accept all cookies to continue"
    refrain = "chorus line repeats here"
    rows = [
        (1, f"{banner}\nalpha paragraph one\n\nbeta paragraph two"),
        (2, f"{banner}\ngamma unique content"),
        (3, f"{banner}\n\n\ndelta after blanks"),
        # internal refrain 3x in ONE doc: not cross-corpus chrome
        (4, f"{refrain}\nmiddle verse text\n{refrain}\n\n{refrain}"),
        (5, banner),  # all-banner doc
        (6, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(docs, newlines=True).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # banner stripped, survivors rejoined with \n, blank lines not counted
    assert out[1].cleaned_text == "alpha paragraph one\nbeta paragraph two"
    assert out[1].n_lines == 3 and out[1].n_boiler_lines == 1
    assert out[2].cleaned_text == "gamma unique content"
    assert out[3].cleaned_text == "delta after blanks"
    assert out[3].n_lines == 2  # the three blank lines never participate
    # the internal refrain is NOT boilerplate (document frequency 1)
    assert out[4].n_boiler_lines == 0
    assert out[4].cleaned_text == f"{refrain}\nmiddle verse text\n{refrain}\n{refrain}"
    assert out[5].cleaned_text is None and out[5].n_boiler_lines == 1
    assert out[6].n_lines == 0 and out[6].cleaned_text is None

    within = {
        r.doc_id: r
        for r in dedup_lines_within_doc(docs, newlines=True).collect()
    }
    # only the internal refrain collapses; first occurrence kept in order
    assert within[4].cleaned_text == f"{refrain}\nmiddle verse text"
    assert within[4].n_dup_lines == 2 and within[4].n_lines == 4
    # the cross-document banner is untouched by the within-doc rule
    assert within[1].cleaned_text == f"{banner}\nalpha paragraph one\nbeta paragraph two"
    assert within[1].n_dup_lines == 0
    assert within[6].n_lines == 0 and within[6].cleaned_text is None


def test_repetition_signals_semantic(spark):
    """Hand-computed Gopher signals on planted docs: duplicate-line char
    fraction, top-gram shares, bullet/ellipsis fractions, NULL handling."""
    from datalakejson_spark.functions.curation import repetition_signals

    rows = [
        # doc 1 (newline mode): line A (5 chars) x3, line B (7 chars) x1
        # dup_line_frac = 2/4; dup_char_frac = 10/22
        (1, "aa bb\naa bb\naa bb\ncc dd e"),
        # doc 2: bullets + ellipsis: 2 of 3 lines bullet, 1 of 3 ellipsis
        (2, "- first item\n* second item\nwait for it..."),
        # doc 3: "x y" bigram appears 3x of 4 bigrams -> top_2gram_share .75
        (3, "x y x y x"),
        # doc 4: one word: no bigram -> NULL shares
        (4, "solo"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r for r in repetition_signals(docs, newlines=True).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1].n_lines == 4 and out[1].n_dup_lines == 2
    assert abs(out[1].dup_line_frac - 0.5) < 1e-12
    assert abs(out[1].dup_char_frac - 10 / 22) < 1e-12
    # grams tokenize ACROSS newlines (\n is a word separator): doc 1's
    # words are [aa bb aa bb aa bb cc dd e] -> 8 bigrams, top "aa bb" x3
    assert abs(out[1].top_2gram_share - 3 / 8) < 1e-12
    assert abs(out[2].bullet_line_frac - 2 / 3) < 1e-12
    assert abs(out[2].ellipsis_line_frac - 1 / 3) < 1e-12
    assert out[1].bullet_line_frac == 0.0 and out[1].ellipsis_line_frac == 0.0
    # doc 3 bigrams: "x y","y x","x y","y x" -> wait: "x y x y x" has 4
    # bigrams: (x y)(y x)(x y)(y x) -> top share 2/4; trigrams: (x y x)
    # (y x y)(x y x) -> 2/3
    assert abs(out[3].top_2gram_share - 0.5) < 1e-12
    assert abs(out[3].top_3gram_share - 2 / 3) < 1e-12
    assert out[4].top_2gram_share is None and out[4].top_3gram_share is None
    assert out[5].n_lines == 0 and out[5].dup_line_frac is None


def test_crlf_corpora_match_lf(spark):
    """CRLF corpora (ADVICE r8): a \\r\\n-separated document must behave
    identically to its \\n twin — same line identities (so cross-document
    boilerplate matching works across mixed line endings), no stray \\r in
    survivors, and identical repetition signals. Output is LF-normalized."""
    from datalakejson_spark.functions.curation import (
        dedup_lines_within_doc,
        remove_boilerplate_lines,
        repetition_signals,
    )

    banner = "Accept all cookies to continue"
    # Same banner in 3 docs, but with mixed line endings: the CRLF copies
    # must count toward the same document frequency as the LF one.
    rows = [
        (1, f"{banner}\r\nalpha windows text\r\n\r\nbeta tail"),
        (2, f"{banner}\nunix sibling here"),
        (3, f"{banner}\r\ngamma after crlf"),
        (4, "refrain r r\r\nmiddle\r\nrefrain r r"),  # within-doc dup, CRLF
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r.doc_id: r for r in remove_boilerplate_lines(docs, newlines=True).collect()}
    # banner reaches doc-frequency 3 across mixed endings -> stripped everywhere
    assert out[1].n_boiler_lines == 1
    assert out[1].cleaned_text == "alpha windows text\nbeta tail"  # LF-normalized, no \r
    assert out[2].cleaned_text == "unix sibling here"
    assert out[3].cleaned_text == "gamma after crlf"
    assert "\r" not in (out[1].cleaned_text or "")

    within = {r.doc_id: r for r in dedup_lines_within_doc(docs, newlines=True).collect()}
    assert within[4].n_dup_lines == 1
    assert within[4].cleaned_text == "refrain r r\nmiddle"

    # repetition signals identical for CRLF vs LF twins
    twins = spark.createDataFrame(
        [(1, "aa bb\r\naa bb\r\ncc dd"), (2, "aa bb\naa bb\ncc dd")],
        "doc_id long, text string",
    )
    sig = {r.doc_id: r for r in repetition_signals(twins, newlines=True).collect()}
    for col in ("n_lines", "n_dup_lines", "dup_line_frac", "dup_char_frac",
                "top_2gram_share", "top_3gram_share"):
        assert getattr(sig[1], col) == getattr(sig[2], col), col


def test_quality_gate_reason_codes_fire(spark):
    """Each QG reason bit fires on a doc planted to violate exactly that
    rule (or a known superset for the inherently-coupled repetition rules);
    the clean doc passes with reasons == 0."""
    from datalakejson_spark.functions.curation import QG_REASONS, quality_gate

    def doc(i, text):
        return (i, text, len(text) if text is not None else None)

    rows = [
        # 0: clean — 25 distinct 5-char words: 149 chars, awl 5, no repetition
        doc(0, " ".join(f"w{i:03d}x" for i in range(25))),
        # 1: too_short only — 25 distinct 2-char words = 74 chars, awl 2.0
        doc(1, " ".join(f"{c}{d}" for c in "abcde" for d in "fghij")),
        # 2: too_few_tokens only — 10 distinct 10-char words = 109 chars
        doc(2, " ".join(f"word{i:06d}" for i in range(10))),
        # 3: word_len only — 25 distinct 15-char words, awl 15 > 12
        doc(3, " ".join(f"verylongword{i:03d}" for i in range(25))),
        # 4: dup_lines + dup_chars — one 4-word line repeated 8x
        doc(4, " ".join(["quick brown foxes jumpy"] * 8)),
        # 5: top_2gram + top_3gram — two words alternating 16x
        doc(5, " ".join(["alpha beta"] * 16)),
        # 6: bullets — every 4-word window starts with '-'
        doc(6, " ".join(f"- item{i:02d}a item{i:02d}b item{i:02d}c" for i in range(8))),
        # 7: ellipsis — every 4-word window ends with '...'
        doc(7, " ".join(f"t{i}a t{i}b t{i}c t{i}d..." for i in range(8))),
        # 8: NULL text — shape rules reject it, repetition rules stay silent
        doc(8, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    out = {r.doc_id: r for r in quality_gate(docs).collect()}
    assert set(out) == set(range(9))

    R = QG_REASONS
    assert out[0].reasons == 0 and out[0].keep and out[0].n_reasons == 0
    assert out[1].reasons == R["too_short"]
    assert out[2].reasons == R["too_few_tokens"]
    assert out[3].reasons == R["word_len"]
    assert out[4].reasons & R["dup_lines"] and out[4].reasons & R["dup_chars"]
    assert out[5].reasons & R["top_2gram"] and out[5].reasons & R["top_3gram"]
    assert out[6].reasons & R["bullets"]
    assert out[7].reasons & R["ellipsis"]
    assert out[8].reasons == (
        R["too_short"] | R["too_few_tokens"] | R["word_len"]
    )
    for r in out.values():
        assert r.keep == (r.reasons == 0)
        assert r.n_reasons == bin(r.reasons).count("1")


def test_quality_gate_newline_mode_tokenization_consistent(spark):
    """In newlines=True mode the SHAPE rules must use the same token
    definition as the repetition signals (words split across \\n/\\r,
    newline bytes not counted as word characters): a clean multi-line doc
    and its single-line twin get identical verdicts."""
    from datalakejson_spark.functions.curation import quality_gate

    words = [f"w{i:03d}x" for i in range(25)]  # 25 distinct 5-char words
    flat = " ".join(words)
    multi = "\n".join(
        " ".join(words[i : i + 5]) for i in range(0, 25, 5)
    )  # same words, 5 real lines
    rows = [(1, flat, len(flat)), (2, multi, len(multi))]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    out = {r.doc_id: r for r in quality_gate(docs, newlines=True).collect()}
    # the multi-line doc is clean prose: no bit may fire (a space-only
    # tokenizer would glue words across \n, undercount tokens, and inflate
    # avg word length with newline bytes)
    assert out[2].reasons == 0 and out[2].keep
    assert out[1].reasons == out[2].reasons


def test_normalize_text_semantics(spark):
    """Each normalization rule fires on its planted input: typography to
    ASCII (incl. NBSP and the ellipsis char expanding to '...'), control
    strip, ASCII-only casefold (Unicode case left ALONE — it is
    engine-dependent and out of the deterministic contract), whitespace
    collapse + trim; NULL rows pass through."""
    from datalakejson_spark.functions.curation import normalize_text

    rows = [
        (1, "“Quoted” ‘single’ —em– dash"),
        (2, "a b…c"),  # NBSP + ellipsis char
        (3, "CTRL\x01\x02 here\x7f"),
        (4, "MiXeD CASE and ΣΟΣ İstanbul"),  # only ASCII letters fold
        (5, "  runs\t\tof\n\nspace  "),
        (6, None),
        (7, "already clean text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_text(docs).collect()}

    assert out[1].norm_text == "\"quoted\" 'single' -em- dash" and out[1].changed
    assert out[2].norm_text == "a b...c"
    assert out[3].norm_text == "ctrl here"
    assert out[4].norm_text == "mixed case and ΣΟΣ İstanbul"  # Unicode untouched
    assert out[5].norm_text == "runs of space" and out[5].changed
    assert out[6].norm_text is None and out[6].n_chars_norm == 0
    assert not out[6].changed
    assert out[7].norm_text == "already clean text" and not out[7].changed
    for r in out.values():
        if r.norm_text is not None:
            assert r.n_chars_norm == len(r.norm_text)
