# Streaming/incremental plane (SURVEY.md §2.10): batch-expressible window
# queries register here; the Structured Streaming ingest lives in
# ingest_stream.py and is exercised by tests.
