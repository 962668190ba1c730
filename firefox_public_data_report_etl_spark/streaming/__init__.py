from firefox_public_data_report_etl_spark.streaming.budgetgate import (
    budget_gate_batch,
    read_accepted,
    stream_budget_gate,
)
from firefox_public_data_report_etl_spark.streaming.dedupe import (
    stream_dedup_events,
)
from firefox_public_data_report_etl_spark.streaming.driftgate import (
    drift_gate_batch,
    read_verdicts,
    reference_histogram,
    stream_drift_gate,
)
from firefox_public_data_report_etl_spark.streaming.joins import (
    click_purchase_attribution,
)
from firefox_public_data_report_etl_spark.streaming.leakgate import (
    leak_gate_batch,
    read_decisions,
    stream_leak_gate,
)
from firefox_public_data_report_etl_spark.streaming.tws import (
    running_user_totals_tws,
)
from firefox_public_data_report_etl_spark.streaming.embedgate import (
    embed_gate_batch,
    stream_embed_gate,
)
from firefox_public_data_report_etl_spark.streaming.mediagate import (
    media_gate_batch,
    stream_media_gate,
)
from firefox_public_data_report_etl_spark.streaming.neardup import (
    neardup_gate_batch,
    stream_neardup_gate,
)
from firefox_public_data_report_etl_spark.streaming.pitenrich import (
    pit_enrich_rows,
    pit_gate_batch,
    stream_pit_enrich,
)
from firefox_public_data_report_etl_spark.streaming.sketches import (
    stream_sketch_union,
    weekly_estimates,
)
from firefox_public_data_report_etl_spark.streaming.videogate import (
    stream_video_gate,
    video_gate_batch,
)
from firefox_public_data_report_etl_spark.streaming.upsert import (
    stream_upsert,
    upsert_batch,
)
from firefox_public_data_report_etl_spark.streaming.windows import (
    stream_events,
    tumbling_event_value,
)

__all__ = [
    "budget_gate_batch",
    "read_accepted",
    "stream_budget_gate",
    "click_purchase_attribution",
    "drift_gate_batch",
    "leak_gate_batch",
    "read_decisions",
    "stream_leak_gate",
    "read_verdicts",
    "reference_histogram",
    "stream_drift_gate",
    "embed_gate_batch",
    "stream_embed_gate",
    "media_gate_batch",
    "stream_media_gate",
    "neardup_gate_batch",
    "stream_neardup_gate",
    "pit_enrich_rows",
    "pit_gate_batch",
    "stream_pit_enrich",
    "stream_dedup_events",
    "running_user_totals_tws",
    "stream_events",
    "stream_sketch_union",
    "stream_upsert",
    "stream_video_gate",
    "video_gate_batch",
    "weekly_estimates",
    "tumbling_event_value",
    "upsert_batch",
]
