"""User-facing engine facade — the Spark-native equivalent of the reference
CLI's three modes (reference core.clj:499-517, SURVEY.md §3):

- file mode   (`hpi dump.pcap` -> H2 tables -> SQL shell):
    ``Engine.load_events(path).register_tables()`` then ``Engine.sql(...)``
- live mode   (NIC capture -> same tables):
    ``Engine.stream(source_dir)`` — Structured Streaming with the same
    operators; capture itself stays an external agent (pcap has no
    Spark-native source; SURVEY.md §2 A1).
- kafka mode  (`hpi --kafka servers/t1/t2?k=v`):
    ``Engine.kafka_records(spec)`` — JSON records routed by direction.

The four public tables (requests/responses/actions/results) are registered
as temp views, so the entire Spark SQL surface replaces the H2 prompt —
every query from the reference README (join on (client, port, call_id),
latency percentiles, hot tables...) runs verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.pipeline import build_tables
from .operators.reassembly import reassemble
from .schema import RPC_EVENT_SCHEMA, TCP_CHUNK_SCHEMA
from .session import tune_session
from .streaming.sink import parse_kafka_spec, to_kafka_records


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = tune_session(spark)
        self.tables: dict[str, DataFrame] = {}
        self._events: DataFrame | None = None

    # -- ingestion ------------------------------------------------------

    def load_events(self, source: str | DataFrame, fmt: str = "parquet") -> "Engine":
        """Load a decoded rpc_events stream (the engine ingestion format;
        raw pcap decode is an edge adapter, SURVEY.md §7)."""
        if isinstance(source, DataFrame):
            self._events = source
        elif fmt == "parquet":
            self._events = self.spark.read.schema(RPC_EVENT_SCHEMA).parquet(source)
        elif fmt == "json":
            self._events = self.spark.read.schema(RPC_EVENT_SCHEMA).json(source)
        else:
            raise ValueError(f"unsupported format: {fmt}")
        return self

    def load_tcp_chunks(self, source: str | DataFrame) -> DataFrame:
        """Raw TCP payload chunks -> framed messages (reassembly operator).
        Protobuf decode of the framed bytes is the pcap edge adapter's job."""
        chunks = (
            source
            if isinstance(source, DataFrame)
            else self.spark.read.schema(TCP_CHUNK_SCHEMA).parquet(source)
        )
        return reassemble(chunks)

    # -- file mode ------------------------------------------------------

    def register_tables(self, ttl_ms: int | None = None) -> "Engine":
        if self._events is None:
            raise RuntimeError("call load_events() first")
        kwargs = {} if ttl_ms is None else {"ttl_ms": ttl_ms}
        self.tables = build_tables(self._events, **kwargs)
        for name, df in self.tables.items():
            df.createOrReplaceTempView(name)
        return self

    def sql(self, query: str) -> DataFrame:
        """The H2-shell/web-console analog (reference db.clj:101-113) — the
        full Spark SQL surface over the four views."""
        return self.spark.sql(query)

    # -- live / kafka modes --------------------------------------------

    def stream(self, source_dir: str, sink_tables: dict[str, list]) -> None:
        from .streaming.pipeline import run_pipeline_available_now

        run_pipeline_available_now(self.spark, source_dir, sink_tables)

    def kafka_records(
        self, spec: str, df: DataFrame | None = None, hostname: str = "localhost"
    ) -> DataFrame:
        """(topic, value) records per the kafka spec; feed to
        ``writeStream.format('kafka')`` with compression gzip in a real
        deployment (reference kafka.clj:12-13)."""
        cfg = parse_kafka_spec(spec)
        src = df if df is not None else self._events
        if src is None:
            raise RuntimeError("no events loaded")
        drop = [c for c in ("actions", "results") if c in src.columns]
        return to_kafka_records(
            src.drop(*drop), cfg["topic1"], cfg["topic2"], cfg["extra"], hostname
        )
