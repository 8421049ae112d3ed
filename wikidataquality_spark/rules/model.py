"""Rule config + CheckResult data model.

Parity: Constraint = (constraint_guid, pid, constraint_type, parameters-map)
stored in `wbqc_constraints` and parsed at check time
(ref≈includes/ConstraintCheck/Helper/ConstraintParameterParser.php:~20-100);
CheckResult = (entity, claim, constraint, status, message)
(ref≈includes/ConstraintCheck/Result/CheckResult.php:~20-90).

Our Rule keeps the same dynamic shape: params is a plain str→str map parsed
inside the rule factory, exactly mirroring the reference's JSON-parameters
pattern (SURVEY.md §1.2). CheckResult becomes a struct column
(rule, status, score, detail); per-row results collect into an
array<struct> `violations` column.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Status vocabulary — same trio the reference uses
# (ref≈CheckResult.php: STATUS_COMPLIANCE / STATUS_VIOLATION / STATUS_EXCEPTION;
# we fold its 'not-applicable'/'todo' into EXCEPTION).
COMPLIANCE = "compliance"
VIOLATION = "violation"
EXCEPTION = "exception"

HARD = "hard"
SOFT = "soft"


@dataclass(frozen=True)
class Rule:
    """One row of the rule-config table (mirrors wbqc_constraints)."""

    rule_id: str
    rule_type: str
    params: dict[str, str] = field(default_factory=dict)
    severity: str = HARD

    def param(self, key: str, default: str | None = None) -> str | None:
        return self.params.get(key, default)

    def fparam(self, key: str, default: float | None = None) -> float | None:
        v = self.params.get(key)
        return float(v) if v is not None else default


def violation_struct_type() -> T.StructType:
    return T.StructType(
        [
            T.StructField("rule", T.StringType(), False),
            T.StructField("status", T.StringType(), False),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("detail", T.StringType(), True),
        ]
    )


def check_result(
    rule: Rule,
    passed: Column,
    score: Column | None = None,
    detail: Column | None = None,
    applicable: Column | None = None,
) -> Column:
    """Build one CheckResult struct column.

    passed: boolean Column — True → compliance, False → violation.
    applicable: boolean Column — False (or NULL input) → exception status,
    matching the reference's exception/not-applicable semantics for
    SomeValue/NoValue snaks (SURVEY.md §1.1).
    """
    status = F.when(passed, F.lit(COMPLIANCE)).otherwise(F.lit(VIOLATION))
    if applicable is not None:
        status = F.when(~applicable, F.lit(EXCEPTION)).otherwise(status)
    return F.struct(
        F.lit(rule.rule_id).alias("rule"),
        status.alias("status"),
        (score if score is not None else F.lit(None)).cast("double").alias("score"),
        (detail if detail is not None else F.lit(None)).cast("string").alias("detail"),
    )
