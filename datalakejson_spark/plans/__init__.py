# Ingest plane (SURVEY.md §3.1-3.2): discovery, ledger state machine,
# batch ELT with DLQ + archive, schema-evolving curated appends.
from datalakejson_spark.plans.ledger import Ledger, LedgerStatus
from datalakejson_spark.plans.ingest import IngestConfig, discover, ingest_batch, run_until_drained

__all__ = [
    "Ledger",
    "LedgerStatus",
    "IngestConfig",
    "discover",
    "ingest_batch",
    "run_until_drained",
]
