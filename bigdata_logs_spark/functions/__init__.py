from bigdata_logs_spark.functions.columns import (
    count_if,
    nonempty,
    null_if_empty,
    sorted_distinct_string,
)

__all__ = ["count_if", "nonempty", "null_if_empty", "sorted_distinct_string"]
