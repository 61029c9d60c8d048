from .pipeline import stream_correlate, run_pipeline_available_now  # noqa: F401
from .sink import from_kafka_records, to_kafka_records  # noqa: F401
