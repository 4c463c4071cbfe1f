"""WebDataset tar-shard export tests (consumption plane, r6).

The format contract is public: a POSIX tar whose entries share a basename
per sample. Pinned here: byte-exact payload roundtrip through a real tar
reader (stdlib tarfile, independent of the writer's buffer path),
hash-shard disjointness/exhaustiveness, bit-reproducible shard bytes, and
the duplicate-key guard.
"""

from __future__ import annotations

import hashlib
import os
import tarfile

import pytest

from datalakejson_spark.consumption.webdataset import (
    read_webdataset_samples,
    write_webdataset_shards,
)


def _corpus(spark, n=40):
    from datalakejson_spark.functions.imagecodecs import encode_png
    import numpy as np

    rows = []
    for i in range(n):
        img = (np.arange(48, dtype=np.int64) + i).astype(np.uint8).reshape(4, 4, 3)
        rows.append((f"doc{i:04d}", encode_png(img), f"caption number {i}"))
    return spark.createDataFrame(rows, "key string, image binary, caption string")


def test_roundtrip_byte_exact_and_manifest(spark, tmp_path):
    corpus = _corpus(spark)
    out = str(tmp_path / "wds")
    manifest = write_webdataset_shards(corpus, out, "key", n_shards=4)
    rows = manifest.collect()
    assert sum(r.n_samples for r in rows) == 40
    assert {r.shard_id for r in rows} <= set(range(4))

    expected = {
        r.key: (bytes(r.image), r.caption.encode()) for r in corpus.collect()
    }
    seen = {}
    for r in rows:
        for key, sample in read_webdataset_samples(r.path):
            assert key not in seen, "key appears in two shards"
            seen[key] = (sample["bin"], sample["txt"])
    assert seen == expected  # disjoint + exhaustive + byte-exact


def test_shards_are_bit_reproducible(spark, tmp_path):
    corpus = _corpus(spark, n=20)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = {r.shard_id: r.path for r in write_webdataset_shards(corpus, d1, "key", 3).collect()}
    m2 = {r.shard_id: r.path for r in write_webdataset_shards(corpus, d2, "key", 3).collect()}
    assert m1.keys() == m2.keys()
    for sid, p1 in m1.items():
        h1 = hashlib.sha256(open(p1, "rb").read()).hexdigest()
        h2 = hashlib.sha256(open(m2[sid], "rb").read()).hexdigest()
        assert h1 == h2, f"shard {sid} bytes differ between identical writes"


def test_samples_ordered_by_key_within_shard(spark, tmp_path):
    corpus = _corpus(spark, n=30)
    out = str(tmp_path / "wds")
    for r in write_webdataset_shards(corpus, out, "key", 2).collect():
        keys = [k for k, _ in read_webdataset_samples(r.path)]
        assert keys == sorted(keys)


def test_null_payload_column_skipped(spark, tmp_path):
    corpus = spark.createDataFrame(
        [("k1", b"\x01\x02", None), ("k2", None, "hello")],
        "key string, image binary, caption string",
    )
    out = str(tmp_path / "wds")
    paths = [r.path for r in write_webdataset_shards(corpus, out, "key", 1).collect()]
    samples = dict(s for p in paths for s in read_webdataset_samples(p))
    assert samples["k1"] == {"bin": b"\x01\x02"}
    assert samples["k2"] == {"txt": b"hello"}


def test_duplicate_keys_raise(spark, tmp_path):
    corpus = spark.createDataFrame(
        [("same", "a"), ("same", "b")], "key string, caption string"
    )
    with pytest.raises(Exception, match="duplicate sample key"):
        write_webdataset_shards(corpus, str(tmp_path / "wds"), "key", 1)


def test_tar_metadata_zeroed(spark, tmp_path):
    """mtime/uid/gid must be zero or the 'bit-reproducible' claim is a lie
    that only holds within one second."""
    corpus = _corpus(spark, n=5)
    out = str(tmp_path / "wds")
    for r in write_webdataset_shards(corpus, out, "key", 1).collect():
        with tarfile.open(r.path) as tar:
            for m in tar:
                assert (m.mtime, m.uid, m.gid) == (0, 0, 0)
    assert os.path.basename(r.path) == "shard-000000.tar"


def test_read_webdataset_back_into_spark(spark, tmp_path):
    """Full Spark roundtrip: export shards, re-ingest with read_webdataset,
    and recover every sample byte-exactly — the LAION-style ingestion path."""
    from datalakejson_spark.consumption.webdataset import read_webdataset

    corpus = _corpus(spark, n=25)
    out = str(tmp_path / "wds")
    write_webdataset_shards(corpus, out, "key", n_shards=3)
    back = read_webdataset(spark, out)
    rows = back.collect()
    assert len(rows) == 25
    expected = {r.key: (bytes(r.image), r.caption.encode()) for r in corpus.collect()}
    for r in rows:
        assert r.n_entries == 2
        assert (bytes(r.exts["bin"]), bytes(r.exts["txt"])) == expected[r.key]


def test_read_webdataset_corrupt_shard_marker_row(spark, tmp_path):
    """One corrupt/truncated tar must not fail the scan (externally
    published corpora contain them): the bad shard yields a single
    key-null marker row; every good shard's samples still flow through."""
    from datalakejson_spark.consumption.webdataset import read_webdataset

    corpus = _corpus(spark, n=25)
    out = str(tmp_path / "wds")
    write_webdataset_shards(corpus, out, "key", n_shards=3)
    victim = os.path.join(out, "shard-000001.tar")
    with open(victim, "rb") as f:
        blob = f.read()
    with open(victim, "wb") as f:
        f.write(b"\x00garbage" + blob[: len(blob) // 3])
    rows = read_webdataset(spark, out).collect()
    bad = [r for r in rows if r.key is None]
    good = [r for r in rows if r.key is not None]
    assert len(bad) == 1 and bad[0].shard_path.endswith("shard-000001.tar")
    assert bad[0].exts is None
    assert len(good) > 0 and all(r.n_entries == 2 for r in good)


def test_write_webdataset_null_key_raises_descriptive(spark, tmp_path):
    """A null key hashes to a null shard; the writer must name the
    contract instead of dying with an opaque int(NaN) TypeError."""
    df = spark.createDataFrame(
        [("a", "x"), (None, "y")], "key string, caption string"
    )
    with pytest.raises(Exception, match="null 'key'"):
        write_webdataset_shards(df, str(tmp_path / "w"), "key", n_shards=2)
