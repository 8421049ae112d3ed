"""Rule framework: config model, rule library, and the validation-DAG builder.

Parity: the reference's constraint system — dynamic constraint rows
(constraint_guid, pid, type, JSON params) loaded from `wbqc_constraints`
(ref≈includes/ConstraintReportFactory.php:~30-120) and dispatched per-statement
by DelegatingConstraintChecker (ref≈includes/ConstraintCheck/
DelegatingConstraintChecker.php:~40-200) to per-type checker classes, each
returning a CheckResult with status ∈ {compliance, violation, exception}
(ref≈includes/ConstraintCheck/Result/CheckResult.php:~20-90).

Here: a Rule dataclass (rule_id, rule_type, params map, severity), a library
of rule_type → Column-expression factories (rules/library.py), and a builder
that composes enabled rules into one `violations` array column plus a
`keep` decision (rules/builder.py). All checks are Catalyst Column
expressions — whole-stage-codegen'd, no Python in the row path.
"""

from wikidataquality_spark.rules.model import (  # noqa: F401
    COMPLIANCE,
    EXCEPTION,
    VIOLATION,
    CheckExpr,
    Rule,
    check_result_sql,
    violation_struct_type,
)
from wikidataquality_spark.rules.builder import apply_rules, decide  # noqa: F401
