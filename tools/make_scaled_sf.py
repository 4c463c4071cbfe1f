"""Generate a scaled-up copy of a fixture scale-factor directory.

``python tools/make_scaled_sf.py [src_dir] [dst_dir] [factor]`` replicates
the FACT tables (orders, lineitem, events, documents, embeddings) ``factor``
times with disjoint key spaces and copies the dimension tables as-is — the
shape a real 10× data growth has (more facts, same dims). Used by bench.py
to measure per-query scaling exponents across one decade of data size
(SCALE.md); the oracle never runs here, only wall-time does.

Fidelity rules, so the scaled tier exercises the *identical* read path:

- pyarrow in/out, preserving physical schemas byte-for-byte — in particular
  ``events.ts`` stays parquet TIMESTAMP(NANOS), which load_table must keep
  handling via the nanosAsLong conversion (sources/tables.py:41).
- Key columns are offset per replica by (max+1), so intra-fact joins
  (orders↔lineitem on o_orderkey) fan out exactly as at 1×: every replica
  joins only within itself.
- ``documents.text`` gets every word prefixed with a replica tag (``r3the``)
  for replicas > 0: replicas are NOT near-duplicates of each other (3-word
  shingles share nothing across replicas), so the dedup workload keeps the
  1× duplicate-rate character instead of degenerating into 10-way dup
  groups whose LSH buckets explode quadratically.
- Each replica lands as one row-group-aligned file inside ``{table}.parquet/``
  — a directory of ``factor`` files, so the scan parallelizes the same way
  a multi-file lake does.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIM_TABLES = ("region", "nation", "customer", "supplier", "part")
# fact table -> {column: key domain}. Columns sharing a DOMAIN (the
# orders↔lineitem join key) get ONE offset computed over every member's
# max, so replica i's facts keep joining each other even if one side's max
# differs (an order with no lineitems would otherwise silently misalign
# every replica's join).
FACT_OFFSETS = {
    "orders": {"o_orderkey": "orderkey"},
    "lineitem": {"l_orderkey": "orderkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}


def _retag_documents(tab: pa.Table, replica: int) -> pa.Table:
    """Prefix every word of ``text`` with the replica tag and refresh
    ``n_chars``; replica 0 is the original."""
    if replica == 0:
        return tab
    tag = f"r{replica}"
    texts = [
        " ".join(tag + w for w in (t or "").split(" "))
        for t in tab.column("text").to_pylist()
    ]
    cols = {}
    for name in tab.column_names:
        if name == "text":
            cols[name] = pa.array(texts, type=tab.schema.field("text").type)
        elif name == "n_chars":
            cols[name] = pa.array(
                [len(t) for t in texts], type=tab.schema.field("n_chars").type
            )
        else:
            cols[name] = tab.column(name)
    return pa.table(cols, schema=tab.schema)


def _replica(tab: pa.Table, name: str, replica: int, offsets: dict) -> pa.Table:
    out = tab
    for col, off in offsets.items():
        idx = out.column_names.index(col)
        field = out.schema.field(col)
        shifted = pc.add(out.column(col), pa.scalar(off * replica, type=field.type))
        out = out.set_column(idx, field, shifted.cast(field.type))
    if name == "documents":
        out = _retag_documents(out, replica)
    return out


def make_scaled_sf(src_dir: str, dst_dir: str, factor: int = 10) -> None:
    src, dst = Path(src_dir), Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    for t in DIM_TABLES:
        target = dst / f"{t}.parquet"
        if not target.exists():
            shutil.copy2(src / f"{t}.parquet", target)
    # One offset per key DOMAIN: max over every (table, column) in the domain
    domain_off: dict[str, int] = {}
    tables: dict[str, pa.Table] = {}
    for t, key_cols in FACT_OFFSETS.items():
        tables[t] = pq.read_table(src / f"{t}.parquet")
        for c, dom in key_cols.items():
            m = pc.max(tables[t].column(c)).as_py() + 1
            domain_off[dom] = max(domain_off.get(dom, 0), m)
    for t, key_cols in FACT_OFFSETS.items():
        out_dir = dst / f"{t}.parquet"
        if out_dir.exists():
            continue
        tab = tables[t]
        offsets = {c: domain_off[dom] for c, dom in key_cols.items()}
        tmp = dst / f".{t}.parquet.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        tmp.mkdir(parents=True)
        for i in range(factor):
            pq.write_table(_replica(tab, t, i, offsets), tmp / f"part-{i:02d}.parquet")
        tmp.rename(out_dir)  # atomic publish: readers never see a partial dir


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/datalakejson_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_scaled_sf(src, dst, factor)
    print(f"scaled {src} x{factor} -> {dst}")
