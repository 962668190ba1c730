from firefox_public_data_report_etl_spark.operators.fanout import (
    explode_preserving_empty,
    with_total_group,
)
from firefox_public_data_report_etl_spark.operators.topk import (
    top_k_array,
    top_k_per_group,
)
from firefox_public_data_report_etl_spark.operators.collapse import collapse_buckets
from firefox_public_data_report_etl_spark.operators.asof import (
    asof_latest_broadcast,
    asof_latest_cogroup,
    asof_latest_union_window,
)

__all__ = [
    "asof_latest_broadcast",
    "asof_latest_cogroup",
    "asof_latest_union_window",
    "collapse_buckets",
    "explode_preserving_empty",
    "top_k_array",
    "top_k_per_group",
    "with_total_group",
]
