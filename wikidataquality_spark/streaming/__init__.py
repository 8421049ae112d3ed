"""Structured Streaming surface (SURVEY.md §2C "Streaming").

Parity: the reference's incremental path — entity-edit hooks enqueueing
EvaluateConstraintReportJob for re-checking (ref≈includes/
EvaluateConstraintReportJob.php:~15-80) — becomes readStream + foreachBatch
incremental validation; the windowed aggregations are the streaming twins of
the batch events_* queries in plans/driver_queries.py.
"""
