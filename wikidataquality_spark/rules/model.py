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


def sql_str(s: str) -> str:
    """SQL single-quoted string literal (Spark's default escaped-literal mode:
    backslashes must double so regex patterns like \\b survive the parser)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def sql_double(v: float) -> str:
    """SQL DOUBLE literal. Bare decimals parse as DECIMAL in Spark SQL and
    ±inf has no literal form, so everything goes through a string cast."""
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def sql_ident(name: str) -> str:
    """Backtick-quoted column reference with F.col's nested-field semantics.

    Rule configs wrote column params for ``F.col``, where a dot descends into
    a struct (``check.score`` = field ``score`` of column ``check``). Quoting
    the whole name as ONE identifier would silently re-interpret every dotted
    config as a literal column name and fail at plan time, so each
    dot-separated segment is quoted independently. A column whose name
    literally contains a dot was never reachable through these params under
    ``F.col`` either — no semantics are lost."""
    return ".".join(
        "`" + seg.replace("`", "``") + "`" for seg in name.split(".")
    )


@dataclass(frozen=True)
class CheckExpr:
    """One rule check as SQL fragments (plain Python strings).

    Why strings, not Columns: each pyspark Column operation is a py4j round
    trip (~0.3ms). The production rule set built this way cost ~7,400 round
    trips = ~1.3s of driver-serial time PER plan construction — a direct hit
    on the N→4N scaling-efficiency contract (serial fraction) and on every
    driver query. Composing the same expressions as strings is free; the
    builder hands Catalyst one `F.expr` per output column instead.

    status duplicates inside `struct`: the rules stage consumes statuses
    three ways (violations array / keep / violated_rules) and projection
    collapse would rebuild an array-of-structs per consumer, so the builder
    inlines the status CASE everywhere — string duplication costs nothing
    and Catalyst CSE shares the work at codegen time."""

    rule_id: str
    status: str  # CASE … END → 'compliance' | 'violation' | 'exception'
    struct: str  # named_struct('rule', …, 'status', …, 'score', …, 'detail', …)


def check_result_sql(
    rule: Rule,
    passed: str,
    score: str | None = None,
    detail: str | None = None,
    applicable: str | None = None,
) -> CheckExpr:
    """Build one CheckResult as SQL fragments (see CheckExpr).

    passed: boolean SQL — TRUE → compliance, anything else → violation.
    applicable: boolean SQL — FALSE (NULL input) → exception status, matching
    the reference's exception/not-applicable semantics (SURVEY.md §1.1).
    NULL-semantics parity with the Column path: `WHEN NOT (a) THEN` skips on
    NULL exactly like F.when(~a, …)."""
    status = f"CASE WHEN ({passed}) THEN 'compliance' ELSE 'violation' END"
    if applicable is not None:
        status = (
            f"CASE WHEN NOT ({applicable}) THEN 'exception' "
            f"WHEN ({passed}) THEN 'compliance' ELSE 'violation' END"
        )
    struct = (
        f"named_struct('rule', {sql_str(rule.rule_id)}, 'status', {status}, "
        f"'score', CAST({score if score is not None else 'NULL'} AS DOUBLE), "
        f"'detail', CAST({detail if detail is not None else 'NULL'} AS STRING))"
    )
    return CheckExpr(rule.rule_id, status, struct)
