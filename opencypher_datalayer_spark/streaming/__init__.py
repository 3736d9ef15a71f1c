"""Structured Streaming operators: windowed aggregation with watermarks,
and continuous incremental graph sync via foreachBatch."""
