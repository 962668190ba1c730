from firefox_public_data_report_etl_spark.functions.core import (
    GPU_VENDOR_MAP,
    bitcount_lowest_7,
    cents,
    gpu_vendor_name,
    is_last_day_of_week,
    major_version,
    md5_int_sql,
    minhash_perm_sql,
    os_arch,
    pos_of_trailing_set_bit,
    safe_div,
    week_start,
)

__all__ = [
    "GPU_VENDOR_MAP",
    "bitcount_lowest_7",
    "cents",
    "gpu_vendor_name",
    "is_last_day_of_week",
    "major_version",
    "md5_int_sql",
    "minhash_perm_sql",
    "os_arch",
    "pos_of_trailing_set_bit",
    "safe_div",
    "week_start",
]
