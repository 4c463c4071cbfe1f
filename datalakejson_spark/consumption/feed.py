"""ML batch-feeding over the curated lake: shard export + Arrow batch feed.

Reference capability (diagram3:138-143): "Reads large datasets in batches
from `curated-data-lake/` (leveraging S3, Parquet, and partitioning) ...
Supports distributed training for models larger than single instance
memory"; diagram3:135 names the PyTorch/TensorFlow feeder role (Petastorm /
Ray Data style). Spark-first design:

- :func:`export_shards` materializes a packed corpus (the output shape of
  ``l8_token_shards`` / ``prepare_training_corpus``: one ``shard_id`` column
  plus payload) as a shard-partitioned parquet lake with EXACTLY one file
  per shard and deterministic row order inside each file. One shuffle
  (hash on ``shard_id``), no driver data movement: ``repartition`` puts each
  shard wholly inside one task, ``sortWithinPartitions`` pre-satisfies the
  dynamic-partition writer's required ordering so no second sort runs.
- :class:`ShardFeed` hands a training loop deterministic, partition-pruned
  Arrow record batches. Shard selection prunes at the parquet source
  (``PartitionFilters`` — asserted in tests/test_consumption.py), column
  selection prunes the ``ReadSchema``, and memory is bounded by the fetch
  window (``shards_per_fetch`` token-budget-bounded shards per Spark job),
  never the corpus. ``rank``/``world_size`` give each distributed-training
  worker a disjoint, deterministic shard slice — the "distributed training"
  half of the declared capability.

At 100 TB the feed's unit of work is the shard (size-bounded by the packing
budget), so a 1000-worker job maps to 1000 disjoint ``ShardFeed``s, each
issuing partition-pruned scans that list and read only its own shard
directories.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from pathlib import Path
from typing import Any

import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.functions.llm_pipeline import SHARD_TOKEN_BUDGET
from datalakejson_spark.registry import register

SHARD_COL = "shard_id"


def export_shards(
    corpus: DataFrame,
    out_dir: str,
    order_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Write ``corpus`` (must carry ``shard_id``) as a shard-partitioned
    parquet lake: ``out_dir/shard_id=N/part-*.parquet``, exactly one file
    per shard, rows inside each file in ``order_col`` order.

    ``repartition(shard_id)`` hash-clusters every shard into a single task
    (several small shards may share a task; a shard never splits), so the
    dynamic-partition write emits one file per shard directory. The explicit
    ``sortWithinPartitions(shard_id, order_col)`` already satisfies the
    writer's partition-column ordering requirement, so the write adds no
    extra sort, and makes the within-file row order deterministic."""
    cols = corpus.columns
    if SHARD_COL not in cols or order_col not in cols:
        raise ValueError(f"corpus must carry '{SHARD_COL}' and '{order_col}' columns")
    (
        corpus.repartition(SHARD_COL)
        .sortWithinPartitions(SHARD_COL, order_col)
        .write.mode(mode)
        .partitionBy(SHARD_COL)
        .parquet(out_dir)
    )


def shard_manifest(spark: SparkSession, shard_dir: str) -> DataFrame:
    """Per-shard accounting over an exported lake: (shard_id, n_docs,
    n_tokens, first_doc, last_doc). Reads only the pruned columns."""
    df = spark.read.parquet(shard_dir)
    aggs = [
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    ]
    if "n_tokens" in df.columns:
        aggs.insert(1, F.sum("n_tokens").alias("n_tokens"))
    return df.groupBy(SHARD_COL).agg(*aggs).orderBy(SHARD_COL)


class ShardFeed:
    """Deterministic, partition-pruned Arrow batch iterator over an exported
    shard lake — the object a torch-style DataLoader wraps.

    Parameters
    ----------
    shards: explicit shard ids to read (default: all, discovered from the
        partition directory names — an O(#shards) metadata listing, never a
        data scan).
    columns: payload columns to read (``shard_id`` + ``order_col`` are always
        included); drives parquet column pruning.
    batch_rows: max rows per yielded ``pyarrow.RecordBatch``.
    shards_per_fetch: shards materialized per Spark job — the memory bound.
        Each fetch runs one partition-pruned, ordered scan of just that
        window's directories.
    rank / world_size: this worker's slice for distributed training; shard
        ids are split round-robin after sorting, so every worker's stream is
        deterministic and the union over workers is exactly the selection.
    """

    def __init__(
        self,
        spark: SparkSession,
        shard_dir: str,
        shards: list[int] | None = None,
        columns: list[str] | None = None,
        batch_rows: int = 1024,
        shards_per_fetch: int = 16,
        order_col: str = "doc_id",
        rank: int = 0,
        world_size: int = 1,
    ) -> None:
        if not 0 <= rank < world_size:
            raise ValueError(f"rank {rank} outside world_size {world_size}")
        self.spark = spark
        self.shard_dir = shard_dir
        self.columns = columns
        self.batch_rows = batch_rows
        self.shards_per_fetch = max(1, shards_per_fetch)
        self.order_col = order_col
        # One reader for the feed's lifetime: its InMemoryFileIndex lists the
        # shard directories ONCE; every fetch window prunes from that cached
        # index instead of re-listing the lake per job.
        self._base = spark.read.parquet(shard_dir)
        available = self._discover_shard_ids()
        if shards is not None:
            missing = sorted(set(shards) - set(available))
            if missing:
                raise ValueError(f"shards not present in {shard_dir}: {missing}")
            available = sorted(set(shards))
        self.shard_ids: list[int] = available[rank::world_size]

    def _discover_shard_ids(self) -> list[int]:
        ids = []
        for p in Path(self.shard_dir).iterdir():
            m = re.fullmatch(rf"{SHARD_COL}=(-?\d+)", p.name)
            if m and p.is_dir():
                ids.append(int(m.group(1)))
        if not ids:
            raise FileNotFoundError(f"no {SHARD_COL}=* partitions under {self.shard_dir}")
        return sorted(ids)

    def window_plan(self, window: list[int]) -> DataFrame:
        """The (lazy) pruned scan for one fetch window of shard ids.
        Exposed so tests can assert ``PartitionFilters`` and ``ReadSchema``
        on the exact plan the feed executes. Deliberately UNsorted: export
        wrote each shard as one file already ascending by ``order_col``, so
        ordering is restored on the bounded collected window (below) instead
        of paying a Spark sort exchange per fetch."""
        df = self._base.where(F.col(SHARD_COL).isin([int(s) for s in window]))
        if self.columns is not None:
            keep = list(dict.fromkeys([SHARD_COL, self.order_col, *self.columns]))
            df = df.select(*keep)
        return df

    def batches(self) -> Iterator[pa.RecordBatch]:
        """Yield ``pyarrow.RecordBatch``es of ≤ ``batch_rows`` rows, in
        (shard_id, order_col) order, memory bounded by one fetch window.

        The per-window sort happens on the collected Arrow table — the
        window is ``shards_per_fetch`` token-budget-bounded shards, so this
        is a bounded in-memory sort on a total key (``order_col`` is unique
        per row: doc ids), never a corpus-wide shuffle."""
        for i in range(0, len(self.shard_ids), self.shards_per_fetch):
            window = self.shard_ids[i : i + self.shards_per_fetch]
            table = self.window_plan(window).toArrow()
            table = table.sort_by(
                [(SHARD_COL, "ascending"), (self.order_col, "ascending")]
            )
            yield from table.to_batches(max_chunksize=self.batch_rows)

    def rows(self) -> Iterator[dict[str, Any]]:
        """Row-dict stream over :meth:`batches` — directly usable as the
        iterator of a ``torch.utils.data.IterableDataset``."""
        for batch in self.batches():
            yield from batch.to_pylist()

    def arrow_rows(self) -> Iterator[dict[str, Any]]:
        """Spark-FREE row stream over this feed's shard slice: reads each
        shard's parquet file directly with pyarrow, in the same global
        (shard_id, order_col) order as :meth:`rows`.

        This is the path for forked DataLoader worker processes: a fork
        inherits the parent's py4j socket, so a worker driving Spark jobs
        would interleave protocol bytes with the parent (hangs/corruption).
        Each shard is one file, already sorted by export — the read is a
        plain local/object-store parquet fetch, safe in any process. The
        memory bound is one shard (the packing budget), tighter than the
        Spark path's fetch window."""
        import pyarrow.parquet as pq

        cols = None
        if self.columns is not None:
            cols = list(dict.fromkeys([self.order_col, *self.columns]))
        for sid in self.shard_ids:
            table = pq.read_table(
                str(Path(self.shard_dir) / f"{SHARD_COL}={sid}"), columns=cols
            )
            table = table.sort_by([(self.order_col, "ascending")])
            for batch in table.to_batches(max_chunksize=self.batch_rows):
                for row in batch.to_pylist():
                    row[SHARD_COL] = sid  # partition value, not in the file
                    yield row

    def subfeed(self, worker_id: int, num_workers: int) -> "ShardFeed":
        """This feed restricted to the ``worker_id``-th round-robin slice of
        its shard ids — the second sharding level, for parallel loader
        workers WITHIN one training rank (torch DataLoader ``num_workers``,
        Petastorm-style). Composes with ``rank``/``world_size``: the lake is
        split rank → worker, and the union over all (rank, worker) pairs is
        exactly the full selection with no duplicates. Cheap view: shares
        the parent's reader (and its already-listed file index), no
        re-listing."""
        import copy

        if not 0 <= worker_id < num_workers:
            raise ValueError(f"worker_id {worker_id} outside num_workers {num_workers}")
        clone = copy.copy(self)
        clone.shard_ids = self.shard_ids[worker_id::num_workers]
        return clone

    def torch_dataset(self):
        """An ``IterableDataset`` over :meth:`rows` when torch is importable
        (it is not in this container — the gate keeps the Spark-side feed
        testable everywhere and lights up automatically in training envs).

        Worker-aware: with DataLoader ``num_workers > 0`` each worker
        process gets a disjoint :meth:`subfeed` slice — without this split a
        multi-worker DataLoader over an IterableDataset silently duplicates
        every row ``num_workers`` times. Worker processes stream via
        :meth:`arrow_rows` (direct parquet reads), never through the
        parent's forked py4j gateway — driving Spark from a forked worker
        corrupts the shared gateway socket."""
        try:
            from torch.utils.data import IterableDataset
        except ImportError as exc:  # pragma: no cover - torch not in container
            raise ImportError(
                "torch is not installed; wrap ShardFeed.rows() in your own "
                "IterableDataset"
            ) from exc

        feed = self

        class _ShardIterable(IterableDataset):  # pragma: no cover - needs torch
            def __iter__(self):
                from torch.utils.data import get_worker_info

                info = get_worker_info()
                if info is None:
                    return feed.rows()  # main process: Spark path is fine
                if info.num_workers <= 1:
                    return feed.arrow_rows()
                return feed.subfeed(info.id, info.num_workers).arrow_rows()

        return _ShardIterable()


_L9_SQL = f"""
    WITH packed AS (
        SELECT doc_id, n_tokens,
               CAST(floor(
                   coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / {SHARD_TOKEN_BUDGET}.0
               ) AS BIGINT) AS shard_id
        FROM (
            SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        )
    )
    SELECT shard_id,
           count(*) AS n_docs,
           -- DuckDB sum(BIGINT) is HUGEINT (pandas float64); Spark's is BIGINT
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM packed
    GROUP BY shard_id
"""


@register(
    "l9_shard_manifest",
    survey="L4,G3,O2",
    sql=_L9_SQL,
    extended=True,
)
def l9_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumption plane's accounting face: pack the documents table
    into token-budget shards (L8) and aggregate the per-shard manifest the
    feed exposes — doc count, token total, doc-id span. Exact integer
    aggregates, so the oracle check is bit-exact."""
    from datalakejson_spark.functions.llm_pipeline import l8_token_shards

    packed = l8_token_shards(spark, sf_dir)
    return packed.groupBy(SHARD_COL).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
