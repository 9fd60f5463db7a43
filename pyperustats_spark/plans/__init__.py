from pyperustats_spark.plans.checks import (  # noqa: F401
    broadcast_hint_count,
    count_exchanges,
    explain_str,
    global_sort_count,
    has_broadcast_hint,
    has_broadcast_join,
    has_python_eval,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_count,
)
