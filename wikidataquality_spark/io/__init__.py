"""Table I/O: format abstraction + checkpoint/resume manifests.

The production target is Iceberg (BASELINE.json:6/14); this sandbox has no
iceberg-spark-runtime jar (SURVEY.md §7 M5), so catalog.py abstracts the
table format behind one interface with a parquet-directory + manifest-JSON
fallback that preserves the semantics the pipeline needs: partitioned append,
snapshot ids, and resume-from-checkpoint.
"""
