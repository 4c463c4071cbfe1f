"""Invariants of the sf-scaling generator (tools/make_scaled_sf.py) — the
bench's sf1 tier is only meaningful if the scaled data keeps the 1× shape:
aligned join keys, identical physical schemas, non-near-dup replicas."""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from make_scaled_sf import DIM_TABLES, FACT_OFFSETS, make_scaled_sf  # noqa: E402

SRC = "/root/testdata/sf0.001"
FACTOR = 3


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("scaled") / "sfX")
    make_scaled_sf(SRC, out, FACTOR)
    return out


def test_row_counts_and_schema_fidelity(scaled_dir):
    for t in list(FACT_OFFSETS) + list(DIM_TABLES):
        src = pq.read_table(f"{SRC}/{t}.parquet")
        dst = pq.read_table(f"{scaled_dir}/{t}.parquet")
        mult = FACTOR if t in FACT_OFFSETS else 1
        assert dst.num_rows == src.num_rows * mult, t
        # physical schema byte-identical — events must stay TIMESTAMP(NANOS)
        assert dst.schema.equals(src.schema), t


def test_fact_fact_join_keys_stay_aligned(scaled_dir):
    """The review finding: orders and lineitem share the orderkey DOMAIN, so
    every replica's lineitems must join that replica's orders even if one
    side's max key differs in the source."""
    ok = set(pq.read_table(f"{scaled_dir}/orders.parquet")["o_orderkey"].to_pylist())
    lk = set(pq.read_table(f"{scaled_dir}/lineitem.parquet")["l_orderkey"].to_pylist())
    assert lk <= ok
    # and the join fans out exactly FACTOR-fold
    src_lk = pq.read_table(f"{SRC}/lineitem.parquet")["l_orderkey"].to_pylist()
    assert len(lk) == len(set(src_lk)) * FACTOR


def test_replica_keys_are_disjoint(scaled_dir):
    docs = pq.read_table(f"{scaled_dir}/documents.parquet")["doc_id"].to_pylist()
    assert len(docs) == len(set(docs))  # offsets never collide
    ev = pq.read_table(f"{scaled_dir}/events.parquet")["event_id"].to_pylist()
    assert len(ev) == len(set(ev))


def test_document_replicas_are_not_near_dups(scaled_dir):
    """Replica texts are word-tagged: a replica shares NO 3-word shingle with
    its source doc, so the scaled dedup workload keeps the 1× dup-rate
    character instead of 10-way dup groups."""
    src = pq.read_table(f"{SRC}/documents.parquet")
    dst = pq.read_table(f"{scaled_dir}/documents.parquet")
    n = src.num_rows
    base_text = src["text"][0].as_py()
    # replica 1 identified by its doc_id window — text-prefix matching would
    # also catch r10+ tags at factor >= 11, or source docs starting with "r1"
    off = max(src["doc_id"].to_pylist()) + 1
    rep_texts = [
        t.as_py()
        for t, d in zip(dst["text"], dst["doc_id"].to_pylist())
        if off <= d < 2 * off
    ]
    assert len(rep_texts) == n  # replica 1 fully present

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))}

    rep1_of_base = "r1" + base_text.replace(" ", " r1")
    assert rep1_of_base in rep_texts
    assert not (shingles(base_text) & shingles(rep1_of_base))
    # n_chars refreshed to the tagged text
    lens = {t.as_py(): n_ for t, n_ in zip(dst["text"], dst["n_chars"].to_pylist())}
    assert all(len(t) == n_ for t, n_ in lens.items())


def test_generation_is_idempotent(scaled_dir):
    """Re-running against an existing dst is a no-op (bench caches the tier)."""
    before = pq.read_table(f"{scaled_dir}/documents.parquet").num_rows
    make_scaled_sf(SRC, scaled_dir, FACTOR)
    assert pq.read_table(f"{scaled_dir}/documents.parquet").num_rows == before
