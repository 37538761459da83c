"""Declarative rule IR.

Semantics mirror the reference validator catalog (cited per class from
/root/reference) but the representation is engine-agnostic: each rule is a
small frozen dataclass the compiler turns into a vectorized
``pyspark.sql.Column`` predicate or a dedicated distributed job
(uniqueness window / referential anti-join). No evaluation logic lives
here — that is ``sparkcheck.compile`` — so the IR can also be serialized
to / loaded from YAML (``sparkcheck.io.config``).

Null-handling contract (reference: ``field_validator/validator.py`` —
every executor except null_check starts with an explicit NULL skip):
all per-value rules *skip* NULL values; only ``NullCheckRule`` (and
``CompletenessRule``) evaluate NULL rows. ``UniqueRule`` exempts NULLs
from duplicate detection (``validator.py:431-461``).
"""

from __future__ import annotations

import enum
import hashlib
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence


class Severity(str, enum.Enum):
    """Mirrors business_rules/models.py:25-31 severity levels."""

    ERROR = "error"
    WARNING = "warning"
    INFO = "info"


@dataclass(frozen=True)
class Rule:
    """Base: every rule has a name, severity, and optional dependencies.

    ``depends_on`` feeds the driver-side DAG scheduler (the reference's
    topo-sort at business_rules/engine.py:699-747, kept as a thin
    driver-side ordering concern).
    """

    name: str
    severity: Severity = Severity.ERROR
    depends_on: tuple[str, ...] = ()
    enabled: bool = True
    # Thresholds from business_rules/engine.py:429-452: a rule may pass
    # with exactly `expected_violations`, or tolerate up to `max_violations`.
    expected_violations: int | None = None
    max_violations: int = 0

    @property
    def rule_id(self) -> str:
        return self.name

    def fingerprint(self) -> str:
        """Stable hash of the rule definition (checkpoint cache key)."""
        return hashlib.md5(repr(self).encode()).hexdigest()[:16]


@dataclass(frozen=True)
class FieldRule(Rule):
    """A rule over one column of one table."""

    column: str = ""


@dataclass(frozen=True)
class RegexRule(FieldRule):
    """Left-anchored regex match on str(value).

    Reference: validator.py:192-227 uses ``re.compile(p).match`` — match
    anchors at the string START only; the compiler prepends ``^`` (never
    appends ``$``) when translating to ``rlike`` (which is a search).
    """

    pattern: str = ""
    case_insensitive: bool = False


@dataclass(frozen=True)
class RangeRule(FieldRule):
    """min ≤ v ≤ max with inclusive flag; a non-numeric value is its own
    violation kind (reference validator.py:229-287: float() failure ⇒
    'not numeric' violation, not a skip)."""

    min_value: float | None = None
    max_value: float | None = None
    inclusive: bool = True


@dataclass(frozen=True)
class LengthRule(FieldRule):
    """len(str(v)) within [min_length, max_length] or == exact_length.

    Reference: validator.py:289-329.
    """

    min_length: int | None = None
    max_length: int | None = None
    exact_length: int | None = None


@dataclass(frozen=True)
class NullCheckRule(FieldRule):
    """v IS NOT NULL unless allow_null. The only rule that evaluates
    NULL rows (reference validator.py:331-356)."""

    allow_null: bool = False


@dataclass(frozen=True)
class EnumRule(FieldRule):
    """str(v) ∈ allowed_values, optional case-insensitive.

    Reference: validator.py:358-394.
    """

    allowed_values: tuple[str, ...] = ()
    case_sensitive: bool = True


@dataclass(frozen=True)
class CustomRule(FieldRule):
    """Arbitrary vectorized predicate — the ONLY rule class that runs
    Python, and it runs per Arrow batch (pandas Series → bool Series),
    never per row. Reference validator.py:396-429 is per-value; here the
    callable must be vectorized. Exceptions ⇒ all rows in batch fail
    (mirrors reference 'exception ⇒ fail')."""

    func: Callable[..., Any] | None = field(default=None, compare=False, hash=False)
    func_name: str = ""


@dataclass(frozen=True)
class DataTypeRule(FieldRule):
    """Cast-conformance: value castable to `expected_type` (and declared
    schema type matches at plan time). The reference declares this rule
    kind (field_validator/models.py:16-27) but never implemented an
    executor; we implement it as schema check + cast(t) IS NOT NULL."""

    expected_type: str = "string"  # spark SQL type name


@dataclass(frozen=True)
class UniqueRule(FieldRule):
    """All copies of a duplicated value are violations; NULLs exempt.

    Reference: validator.py:431-461 (``duplicated(keep=False)``).
    Compiles to a two-phase salted groupBy count at scale.
    """

    columns: tuple[str, ...] = ()  # multi-column uniqueness; falls back to `column`

    @property
    def key_columns(self) -> tuple[str, ...]:
        return self.columns if self.columns else (self.column,)


@dataclass(frozen=True)
class CompletenessRule(Rule):
    """Row fails when ANY required column is NULL.

    Reference template: business_rules/models.py:451-474.
    """

    required_columns: tuple[str, ...] = ()


@dataclass(frozen=True)
class ReferentialIntegrityRule(Rule):
    """Orphan check: child rows whose FK is non-null and absent from the
    parent key set. Reference template business_rules/models.py:384-415
    (LEFT JOIN ... WHERE parent.pk IS NULL) — compiled as a left_anti
    join, broadcast when the parent is dim-sized, salted under skew.
    """

    child_table: str = ""
    child_column: str = ""
    parent_table: str = ""
    parent_column: str = ""
    broadcast_parent: bool | None = None  # None = let AQE/size estimate decide


@dataclass(frozen=True)
class SqlRule(Rule):
    """Arbitrary SQL business rule with the reference's violation-row
    contract (business_rules/engine.py:516-574): each returned row is one
    violation; recognized columns violation_count / message / table_name /
    column_name; other columns become sample_values."""

    sql: str = ""


@dataclass(frozen=True)
class RuleSet:
    """Named collection of rules over one logical table.

    Mirrors ValidationRuleSet (field_validator/models.py:139-170) +
    RuleSet (business_rules/models.py:194-236).
    """

    name: str
    rules: tuple[Rule, ...] = ()
    description: str = ""
    fail_fast: bool = False
    max_concurrent: int = 4
    # logical table this set validates ("" = caller's default) — used by
    # run.orchestrate to bind each set in a multi-suite run to its input
    table: str = ""

    def enabled_rules(self) -> list[Rule]:
        return [r for r in self.rules if r.enabled]

    def fingerprint(self) -> str:
        h = hashlib.md5()
        for r in sorted(self.rules, key=lambda r: r.name):
            h.update(r.fingerprint().encode())
        return h.hexdigest()[:16]


# Pre-built rules — constants table mirroring field_validator/models.py:254-301.
# Patterns are the reference's, left-anchored by the compiler.
EMAIL_PATTERN = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"
PHONE_US_PATTERN = r"\+?1?[-.\s]?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}$"
SSN_PATTERN = r"\d{3}-\d{2}-\d{4}$"
ZIP_PATTERN = r"\d{5}(-\d{4})?$"
URL_PATTERN = r"https?://[^\s/$.?#].[^\s]*$"
UUID_PATTERN = r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"


def BUILTIN_RULES(column: str) -> dict[str, FieldRule]:
    """Factory for the reference's pre-built rule catalog on a column."""
    return {
        "email": RegexRule(name=f"email_{column}", column=column, pattern=EMAIL_PATTERN),
        "phone_us": RegexRule(name=f"phone_{column}", column=column, pattern=PHONE_US_PATTERN),
        "ssn": RegexRule(name=f"ssn_{column}", column=column, pattern=SSN_PATTERN),
        "zip": RegexRule(name=f"zip_{column}", column=column, pattern=ZIP_PATTERN),
        "url": RegexRule(name=f"url_{column}", column=column, pattern=URL_PATTERN),
        "uuid": RegexRule(name=f"uuid_{column}", column=column, pattern=UUID_PATTERN),
        "not_null": NullCheckRule(name=f"not_null_{column}", column=column),
        "positive_number": RangeRule(
            name=f"positive_{column}", column=column, min_value=0.0, inclusive=False
        ),
    }
