from i3cols_spark.plans.checks import (
    explain_str,
    has_broadcast_hash_join,
    has_sort_merge_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_hash_join",
    "has_sort_merge_join",
]
