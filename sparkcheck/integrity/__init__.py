from sparkcheck.integrity.uniqueness import (
    distinct_count_by_key,
    duplicate_key_counts,
    duplicate_violation_rows,
    uniqueness_summary,
)
from sparkcheck.integrity.referential import (
    orphan_rows,
    orphan_summary,
)
from sparkcheck.integrity.fk import (
    fk_containment,
    infer_foreign_keys,
)

__all__ = [
    "distinct_count_by_key",
    "duplicate_key_counts",
    "duplicate_violation_rows",
    "uniqueness_summary",
    "orphan_rows",
    "orphan_summary",
    "fk_containment",
    "infer_foreign_keys",
]
