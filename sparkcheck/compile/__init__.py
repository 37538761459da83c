from sparkcheck.compile.compiler import (
    CompiledPredicate,
    compile_field_rule,
    fused_agg,
    summary_df,
    violation_rows,
    plan_time_check,
)

__all__ = [
    "CompiledPredicate",
    "compile_field_rule",
    "fused_agg",
    "summary_df",
    "violation_rows",
    "plan_time_check",
]
