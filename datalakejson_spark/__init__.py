"""datalakejson_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of the
reference design `akhileshbangera/DataLakeJson` (a ledger-driven JSON->Parquet
curated-lake ELT pipeline plus a SQL/DataFrame consumption surface; see
/root/reference/sudo_code.txt and psuedo_code.txt), re-expressed Spark-first:

- ``sources``    — JSON/Parquet readers & writers with the PERMISSIVE
                   corrupt-record contract (SURVEY.md §2.1).
- ``operators``  — the relational operator library (projections, joins,
                   aggregates, windows, sorts, set ops, scalar functions),
                   each registered as an oracle-checked query (SURVEY.md §2.2-2.8).
- ``functions``  — LLM-data-pipeline extensions: dedup, similarity search,
                   text analysis, multimodal column plumbing (SURVEY.md §2.12).
- ``plans``      — the ingest plane: discovery, ledger state machine,
                   batch ELT with DLQ + archive (SURVEY.md §3.1-3.2).
- ``streaming``  — incremental ingest via Structured Streaming and
                   event-time windowed aggregation (SURVEY.md §2.10).

Everything is DataFrame/SQL-first: plans are declared via the PySpark
DataFrame API and optimized by Catalyst (predicate pushdown, column pruning,
partition pruning, AQE). No custom Catalyst rules are needed (SURVEY.md §4).
"""

from datalakejson_spark.session import get_spark, configure_runtime
from datalakejson_spark.registry import all_specs, register, QuerySpec

__version__ = "0.1.0"

__all__ = ["get_spark", "configure_runtime", "all_specs", "register", "QuerySpec"]
