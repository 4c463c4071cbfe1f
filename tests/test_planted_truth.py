"""Planted ground-truth tests for co-moving oracle constructions (round 11,
VERDICT r10 "what's wrong #2").

The cross-engine oracle proves Spark == DuckDB, but for engine-DEFINED
heuristics both legs derive from the same expression constants, so they can
move together: the 16-bit minhash lane saturation survived nine rounds of
green hashes exactly because both engines computed the same (wrong-at-scale)
band values. These tests pin each such family against a THIRD leg — a pure
Python (hashlib-only) reimplementation of the documented definition — on
PLANTED fixtures with hand-known semantics:

- identical documents MUST collide / have distance zero,
- documents with disjoint token/shingle sets MUST NOT collide (the exact
  class the 16-bit lanes violated: chance lane-value ties pairing all-novel
  documents),
- near-duplicates pair exactly when the reference's hash values say so, and
- hand-computed Z-order cells for known coordinates.

No DuckDB here on purpose: a defect in the shared SQL expression text shows
up as Spark disagreeing with the Python leg, which cross-engine equality
can never reveal.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from datalakejson_spark.functions.dedup import (
    BAND_ROWS,
    LANE_HEX,
    LANES_PER_MD5,
    NUM_BANDS,
    NUM_HASHES,
    SHINGLE,
    SIMHASH_BITS,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_wide_signatures,
)


# --------------------------------------------------------------------------
# Pure-Python third leg: MinHash / LSH bands per the documented definition
# (3-word shingles; 8 lanes = disjoint LANE_HEX-char chunks of md5(shingle)
# and md5(md5(shingle)); min per lane over lowercase hex; band hash = md5 of
# the concatenated BAND_ROWS lane minimums).
# --------------------------------------------------------------------------
def _py_shingles(text: str) -> set[str]:
    words = text.split(" ")
    if len(words) <= SHINGLE:
        return {" ".join(words)}
    return {
        " ".join(words[i : i + SHINGLE])
        for i in range(len(words) - SHINGLE + 1)
    }


def _py_minhash_sig(text: str) -> list[str]:
    lower = [hashlib.md5(s.encode()).hexdigest() for s in _py_shingles(text)]
    upper = [hashlib.md5(h.encode()).hexdigest() for h in lower]
    sig = []
    for lane in range(NUM_HASHES):
        src = lower if lane < LANES_PER_MD5 else upper
        off = LANE_HEX * (lane % LANES_PER_MD5)
        sig.append(min(h[off : off + LANE_HEX] for h in src))
    return sig


def _py_bands(text: str) -> set[tuple[int, str]]:
    sig = _py_minhash_sig(text)
    return {
        (
            band,
            hashlib.md5(
                "".join(
                    sig[band * BAND_ROWS + r] for r in range(BAND_ROWS)
                ).encode()
            ).hexdigest(),
        )
        for band in range(NUM_BANDS)
    }


def _py_candidate_pairs(docs: dict[int, str]) -> set[tuple[int, int]]:
    bands = {i: _py_bands(t) for i, t in docs.items()}
    ids = sorted(docs)
    return {
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if bands[a] & bands[b]
    }


def _far_text(i: int, n_words: int = 20) -> str:
    """Token streams with no cross-document overlap: every word embeds the
    doc id, so shingle sets of different docs are provably disjoint."""
    return " ".join(
        "t" + hashlib.md5(f"{i}/{j}".encode()).hexdigest()[:10]
        for j in range(n_words)
    )


def test_minhash_lsh_planted_truth(spark):
    """400 mutually-disjoint docs + planted identical and near pairs.
    Ground truth: the identical pair must collide (identical text ⇒
    identical bands), NO disjoint pair may collide (disjoint shingle sets
    can only pair via lane-value ties — the saturated-band-space class the
    16-bit lanes shipped), and the full Spark candidate set equals the
    Python reference's, pair for pair."""
    near_base = " ".join(f"shared word{k} token" for k in range(20))
    docs = {i: _far_text(i) for i in range(400)}
    docs[1000] = near_base + " ending alpha"
    docs[1001] = near_base + " ending alpha"  # identical to 1000
    docs[1002] = near_base + " ending omega"  # near: differs in last word
    expected = _py_candidate_pairs(docs)

    # Hand-knowable facts, asserted on the REFERENCE first (if these fail,
    # the planted fixture itself is wrong):
    assert (1000, 1001) in expected
    assert (1000, 1002) in expected and (1001, 1002) in expected
    far_pairs = {p for p in expected if p[0] < 400 and p[1] < 400}
    assert far_pairs == set(), (
        "disjoint-shingle docs paired in the PYTHON leg - lane identity "
        f"saturated again: {sorted(far_pairs)[:5]}"
    )

    df = spark.createDataFrame(
        sorted(docs.items()), "doc_id bigint, text string"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(minhash_signatures(df)).collect()
    }
    assert got == expected


def test_minhash_signature_values_match_python_leg(spark):
    """Lane-by-lane signature equality against the hashlib reference for a
    mixed planted set — the value-level pin under the pair-level test."""
    docs = {i: _far_text(i, 6) for i in range(10)}
    docs[50] = "exactly three words"
    docs[51] = "two words"
    docs[52] = "one"
    df = spark.createDataFrame(sorted(docs.items()), "doc_id bigint, text string")
    rows = {r.doc_id: r for r in minhash_signatures(df).collect()}
    assert set(rows) == set(docs)
    for i, text in docs.items():
        expect = _py_minhash_sig(text)
        got = [rows[i][f"mh{lane}"] for lane in range(NUM_HASHES)]
        assert got == expect, (i, text)


# --------------------------------------------------------------------------
# SimHash third leg
# --------------------------------------------------------------------------
def _py_simhash(text: str, lanes: int) -> list[int]:
    words = set(text.split(" "))
    sig = []
    for k in range(lanes):
        votes = [0] * SIMHASH_BITS
        for w in words:
            h = int(hashlib.md5(w.encode()).hexdigest()[4 * k : 4 * k + 4], 16)
            for i in range(SIMHASH_BITS):
                votes[i] += 1 if (h >> i) & 1 else -1
        sig.append(sum(1 << i for i in range(SIMHASH_BITS) if votes[i] > 0))
    return sig


def _hamming64(a: list[int], b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_simhash_planted_truth(spark):
    """Identical docs ⇒ identical 4-lane signatures (distance 0); docs with
    DISJOINT vocabularies land far apart in hamming space; and every Spark
    signature equals the hashlib reference value-for-value."""
    docs = {i: _far_text(i, 24) for i in range(50)}
    docs[100] = "replicated content about broadcast joins and shuffles"
    docs[101] = docs[100]
    df = spark.createDataFrame(sorted(docs.items()), "doc_id bigint, text string")
    rows = {
        r.doc_id: [r.s0, r.s1, r.s2, r.s3]
        for r in simhash_wide_signatures(df, lanes=4).collect()
    }
    for i, text in docs.items():
        assert rows[i] == _py_simhash(text, 4), i
    assert _hamming64(rows[100], rows[101]) == 0
    ids = list(range(50))
    dists = [
        _hamming64(rows[a], rows[b])
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
    ]
    # Disjoint vocab ⇒ independent 64-bit-ish signatures: nothing may look
    # like a near-dup. (Deterministic fixture: this is a fixed fact, not a
    # probabilistic one.)
    assert min(dists) > 10, min(dists)


# --------------------------------------------------------------------------
# Z-order cells: Spark leg vs hand-computed Morton codes
# --------------------------------------------------------------------------
def test_zorder_cells_planted_truth(spark):
    """zorder_key through SPARK (the existing property tests pin only the
    DuckDB leg of the shared expression) against hand-computed Morton
    codes. Bounds are planted as exactly [0, 255] so the rank bucketization
    is the identity and the expected z-values are pure bit interleaves."""
    from datalakejson_spark.plans.layout import zorder_key

    def morton2(x: int, y: int) -> int:
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    # Hand-checked anchors (x bits at even positions, y at odd):
    assert morton2(3, 5) == 0b100111 == 39
    assert morton2(1, 0) == 1 and morton2(0, 1) == 2

    pts = [(0, 0), (255, 255), (1, 0), (0, 1), (3, 5), (128, 64), (200, 17)]
    # plant the [0,255] bounds via the corner points already present
    df = spark.createDataFrame(pts, "x int, y int")
    zdf, z = zorder_key(df, ["x", "y"], bits=8)
    got = {
        (r.x, r.y): r.z for r in zdf.withColumn("z", z).select("x", "y", "z").collect()
    }
    for x, y in pts:
        assert got[(x, y)] == morton2(x, y), (x, y, got[(x, y)])
