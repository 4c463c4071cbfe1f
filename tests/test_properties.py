"""Property-based tests (hypothesis) for the portable SQL expressions the
cross-engine oracle checks depend on.

The oracle suite proves Spark == DuckDB on the fixture data; these properties
pin the DuckDB leg against independent Python reference implementations over
RANDOM inputs, so the shared expression text can't be subtly wrong in a way
both engines agree on for the fixtures but diverge from the intended
semantics elsewhere. DuckDB evaluates each example in-process (no Spark
session), keeping hundreds of examples cheap.
"""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from datalakejson_spark.functions.dedup import SHINGLE, _hex4_to_int
from datalakejson_spark.plans.layout import _bit_interleave_sql


# --------------------------------------------------------------------------
# Z-order bit interleave: matches the Morton-code reference, and is a
# bijection on the grid (distinct cells -> distinct curve positions).
# --------------------------------------------------------------------------
def _morton_ref(coords: list[int], bits: int) -> int:
    z = 0
    n = len(coords)
    for i in range(bits):
        for k, c in enumerate(coords):
            z |= ((c >> i) & 1) << (i * n + k)
    return z


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=255), min_size=2, max_size=4
    )
)
def test_interleave_matches_morton_reference(coords):
    bits = 8
    names = [f"c{k}" for k in range(len(coords))]
    sel = ", ".join(f"{v} AS {n}" for n, v in zip(names, coords))
    expr = _bit_interleave_sql(names, bits)
    got = duckdb.sql(f"SELECT {expr} FROM (SELECT {sel})").fetchone()[0]
    assert got == _morton_ref(coords, bits)


@settings(max_examples=50, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_interleave_is_injective(points):
    zs = {_morton_ref(list(p), 8) for p in points}
    assert len(zs) == len(points)  # distinct cells never share a curve slot


# --------------------------------------------------------------------------
# The minhash lane extractor: first 4 md5 hex chars -> int, the expression
# SimHash builds its bit votes from (dedup.py).
# --------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            blacklist_characters="\x00", blacklist_categories=("Cs",)
        ),
        min_size=0,
        max_size=80,
    )
)
def test_hex4_matches_python_md5(s):
    expr = _hex4_to_int("s")
    got = duckdb.sql(
        f"SELECT {expr} FROM (SELECT ? AS s)", params=[s]
    ).fetchone()[0]
    expect = int(hashlib.md5(s.encode()).hexdigest()[:4], 16)
    assert got == expect


# --------------------------------------------------------------------------
# Shingling: the DuckDB comprehension must produce exactly the Python
# reference 3-word shingle set (order-insensitive; list_distinct upstream).
# --------------------------------------------------------------------------
def _shingles_ref(words: list[str]) -> list[str]:
    if len(words) <= SHINGLE:
        return [" ".join(words)]
    return [
        " ".join(words[i : i + SHINGLE]) for i in range(len(words) - SHINGLE + 1)
    ]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_duck_shingles_match_reference(words):
    from datalakejson_spark.functions.dedup import _DUCK_SHINGLES

    text = " ".join(words)
    rows = duckdb.sql(
        "WITH tok AS (SELECT string_split(?, ' ') AS w) "
        f"SELECT unnest({_DUCK_SHINGLES}) FROM tok",
        params=[text],
    ).fetchall()
    assert sorted(r[0] for r in rows) == sorted(_shingles_ref(words))
