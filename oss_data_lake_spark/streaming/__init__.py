"""Structured Streaming layer (EXT — the reference has no streaming at all;
its ingest is a manually-triggered batch DAG, reference
dags/yfinance_to_minio.py:99 ``schedule_interval=None``)."""
