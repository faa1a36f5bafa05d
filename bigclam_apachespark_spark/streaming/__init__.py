from bigclam_apachespark_spark.streaming.events_stream import (
    read_events_stream,
    windowed_counts_stream,
    enriched_counts_stream,
    click_attribution_stream,
    dedup_within_watermark_stream,
    cms_users_windowed_stream,
    hll_users_windowed_stream,
    sessionize_stream,
    session_funnel_stream,
    session_window_stream,
    run_stream_to_memory,
)
from bigclam_apachespark_spark.streaming.cdc_stream import (
    cdc_upsert_stream,
)
from bigclam_apachespark_spark.streaming.docs_stream import (
    read_documents_stream,
    bloom_decontam_stream,
    dedup_stream,
    dense_bloom_words,
    minhash_band_stream,
    minhash_band_stream_watermark,
    with_arrival_time,
)

__all__ = [
    "read_events_stream",
    "windowed_counts_stream",
    "enriched_counts_stream",
    "click_attribution_stream",
    "dedup_within_watermark_stream",
    "cms_users_windowed_stream",
    "hll_users_windowed_stream",
    "sessionize_stream",
    "session_funnel_stream",
    "session_window_stream",
    "run_stream_to_memory",
    "cdc_upsert_stream",
    "read_documents_stream",
    "bloom_decontam_stream",
    "dedup_stream",
    "dense_bloom_words",
    "minhash_band_stream",
    "minhash_band_stream_watermark",
    "with_arrival_time",
]
