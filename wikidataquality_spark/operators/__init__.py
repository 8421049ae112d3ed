"""Pipeline operators: heuristics, model stages, scrub, extract, dedup, search.

Each module documents the reference component it recasts (SURVEY.md §2A/2B).
Design rule: pure Spark SQL Column expressions wherever the semantics allow
(whole-stage codegen), Arrow-vectorized pandas UDFs only for model inference
and multi-pattern regex passes — never row-at-a-time Python (BASELINE.json:15).
"""
