"""WebDataset-style tar-shard export for multimodal training data.

The reference's ML consumption plane (diagram3:135-143) feeds PyTorch/
TensorFlow training; for large-scale MULTIMODAL training the de-facto
interchange is the WebDataset convention (public format: a POSIX tar whose
entries share a basename per sample — ``{key}.jpg`` + ``{key}.txt`` +
``{key}.json`` — consumed sequentially for streaming I/O). This module
materializes a curated DataFrame as such shards, Spark-first:

- Shard assignment is ``pmod(xxhash64(key), n_shards)`` — deterministic,
  key-stable, and one hash shuffle regardless of corpus size (no global
  row-numbering, which would serialize through one task at 100 TB).
- Each shard's tar is written INSIDE its ``applyInPandas`` group task —
  the driver never sees payload bytes, and 1000 shards write on however
  many executors the cluster has. Rows are sorted by key within the shard
  and tar metadata (mtime/uid/gid) is zeroed, so shard bytes are
  bit-reproducible run to run.
- The return value is the write's manifest (shard_id, n_samples, n_bytes,
  path) — the small table a training launcher actually needs.

Scale note: ``samples_per_shard`` is advisory sizing — pick ``n_shards ≈
corpus / samples_per_shard`` upstream. A skewed key space skews shards no
worse than the hash (uniform for distinct keys).
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MANIFEST_SCHEMA = "shard_id int, n_samples long, n_bytes long, path string"

#: column-name suffix → tar entry extension; anything else defaults by type
_DEFAULT_EXT = {"text": "txt", "caption": "txt", "meta": "json", "json": "json"}


def _entry_ext(col: str, value) -> str:
    if col in _DEFAULT_EXT:
        return _DEFAULT_EXT[col]
    if isinstance(value, (bytes, bytearray)):
        return "bin"
    return "txt"


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    n_shards: int,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as ``out_dir/shard-%06d.tar`` WebDataset shards and
    return the materialized manifest DataFrame.

    Every row becomes one sample: for each payload column, a tar entry
    ``{key}.{ext}`` (bytes columns verbatim; everything else UTF-8 text).
    Keys must be unique — duplicate keys would silently merge samples, so
    the writer raises inside the task if a shard sees a repeated key.

    ``out_dir`` must be visible to every executor (a shared filesystem /
    fuse-mounted object store): each shard tar streams to disk INSIDE its
    task — on a cluster, a node-local path would scatter shards across
    machines. The task creates the directory itself, so a fresh shared
    mount needs no driver-side preparation."""
    cols = payload_cols or [c for c in df.columns if c != key_col]

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf[key_col].isnull().any():
            # xxhash64(NULL) returns the hash seed, so a null key lands in a
            # real shard and — without this guard — astype(str) silently
            # writes it into the tar as the literal key "None"; name the
            # contract instead of corrupting the shard
            raise ValueError(
                f"write_webdataset_shards: null {key_col!r} key(s) in input — "
                "every sample needs a non-null key"
            )
        shard_id = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key_col, kind="mergesort")
        keys = pdf[key_col].astype(str)
        if keys.duplicated().any():
            dup = keys[keys.duplicated()].iloc[0]
            raise ValueError(f"duplicate sample key {dup!r} in shard {shard_id}")
        os.makedirs(out_dir, exist_ok=True)  # task-side: runs where it writes
        path = os.path.join(out_dir, f"shard-{shard_id:06d}.tar")
        # stream the tar straight to the file — no second in-memory copy of
        # a potentially-GB shard
        with tarfile.open(path, mode="w") as tar:
            for _, row in pdf.iterrows():
                for col in cols:
                    value = row[col]
                    if value is None:
                        continue
                    data = (
                        bytes(value)
                        if isinstance(value, (bytes, bytearray))
                        else str(value).encode("utf-8")
                    )
                    info = tarfile.TarInfo(
                        name=f"{row[key_col]}.{_entry_ext(col, value)}"
                    )
                    info.size = len(data)
                    info.mtime = 0  # zeroed metadata → reproducible bytes
                    tar.addfile(info, io.BytesIO(data))
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "n_samples": [len(pdf)],
                "n_bytes": [os.path.getsize(path)],
                "path": [path],
            }
        )

    sharded = df.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    )
    manifest = sharded.groupBy("_shard").applyInPandas(
        write_shard, schema=MANIFEST_SCHEMA
    )
    # materialize: the write happens inside the tasks; localCheckpoint-free
    # collect of the TINY manifest, re-parallelized so callers get a DataFrame
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(rows, MANIFEST_SCHEMA)


def read_webdataset(spark, shards_dir: str) -> "DataFrame":
    """Ingest WebDataset shards INTO Spark: a binaryFile scan over
    ``shard-*.tar`` plus a mapInPandas tar parse, one output row per sample
    ``(shard_path, key, exts: map<string, binary>)``. This is how a corpus
    published in the WebDataset convention (the common public multimodal
    training format) enters the curated lake: each tar parses wholly inside
    its scan task, samples are rows, payload entries stay binary until a
    codec tier (functions/multimodal.py) runs downstream. Scale posture:
    parallelism = number of shards, no shuffle until the caller adds one.

    Externally published corpora contain corrupt/truncated tars; one bad
    shard must never fail the batch (same contract as every codec tier), so
    a shard whose tar parse raises yields ONE marker row — ``key`` null,
    ``exts`` null, ``shard_path`` set — and the good shards' samples flow
    through. Filter ``key IS NULL`` to audit or drop the failures."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"shard_path": [], "key": [], "exts": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows = []
                    with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                        for key, sample in _iter_tar_samples(tar):
                            rows.append((key, sample))
                except (tarfile.TarError, OSError, EOFError):
                    # parse-failed marker row; never fail the whole scan task
                    out["shard_path"].append(path)
                    out["key"].append(None)
                    out["exts"].append(None)
                    continue
                for key, sample in rows:
                    out["shard_path"].append(path)
                    out["key"].append(key)
                    out["exts"].append(sample)
            yield pd.DataFrame(out, columns=["shard_path", "key", "exts"])

    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.tar")
        .load(shards_dir)
        .select("path", "content")
    )
    return scan.mapInPandas(
        run, schema="shard_path string, key string, exts map<string, binary>"
    ).withColumn("n_entries", F.size("exts"))


def _iter_tar_samples(tar) -> Iterator[tuple[str, dict[str, bytes]]]:
    """Group a tar's file members by basename into ``(key, {ext: bytes})``
    samples, in tar (= key) order — the single grouping implementation
    shared by the Spark re-ingest and the per-tar reader."""
    current_key: str | None = None
    sample: dict[str, bytes] = {}
    for member in tar:
        if not member.isfile():
            continue
        base, _, ext = member.name.rpartition(".")
        if current_key is not None and base != current_key:
            yield current_key, sample
            sample = {}
        current_key = base
        sample[ext] = tar.extractfile(member).read()
    if current_key is not None:
        yield current_key, sample


def read_webdataset_samples(path: str) -> Iterator[tuple[str, dict[str, bytes]]]:
    """Stream samples back from one shard tar: yields ``(key, {ext: bytes})``
    with entries grouped by basename, in tar (= key) order. Pure-Python —
    this is the consumer-side contract check, mirroring what a WebDataset
    loader does; training loops should mount the tars directly."""
    with tarfile.open(path, mode="r") as tar:
        yield from _iter_tar_samples(tar)
