"""wikidataquality_spark — a from-scratch PySpark-native web-text quality-filter engine.

Recasts the per-row constraint-checking ethos of the WikidataQuality MediaWiki
extension (rule library → structured violation records → keep/drop decision →
violation statistics; see SURVEY.md §1-2) as a document validation DAG over
parquet/Iceberg tables of Common-Crawl-style pages, built Spark-first:
DataFrame/SQL expressions for every rule that can be one, vectorized
pandas/Arrow UDFs for model stages (language ID, perplexity), and explicit
partitioning/salting for the shuffle-heavy dedup stage.

Reference parity map (reconstructed public repo layout; ref≈ paths from
SURVEY.md §2A since /root/reference is empty in this sandbox):
  - rules/           ≈ includes/ConstraintCheck/Checker/*.php + DelegatingConstraintChecker.php
  - operators/       ≈ the graft pipeline stages mandated by BASELINE.json:6,14,15
  - io/              ≈ maintenance/Update*Table.php import jobs + violation store
  - pipeline.py      ≈ DelegatingConstraintChecker + EvaluateConstraintReportJob (batch path)
  - metrics.py       ≈ SpecialConstraintReport statistics summaries
"""

__version__ = "0.1.0"
