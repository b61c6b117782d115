from bigdata_logs_spark.functions.columns import (
    count_if,
    nonempty,
    null_if_empty,
    pushdown_barrier,
    sorted_distinct_string,
    spread_small_input,
    zorder_key,
    zorder_terms_sql,
)

__all__ = [
    "count_if",
    "nonempty",
    "null_if_empty",
    "pushdown_barrier",
    "sorted_distinct_string",
    "spread_small_input",
    "zorder_key",
    "zorder_terms_sql",
]
