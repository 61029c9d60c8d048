from .pipeline import (  # noqa: F401
    compact_batches,
    run_pipeline_available_now,
    run_pipeline_to_kafka,
    run_pipeline_to_parquet,
    stream_cdc_dedup,
    stream_correlate,
    stream_dedup,
    stream_range_join,
    stream_sessionize,
    stream_windowed_counts,
    stream_windowed_distinct,
)
from .sink import from_kafka_records, to_kafka_records  # noqa: F401
