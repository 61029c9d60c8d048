"""Kafka-style JSON sink (SURVEY.md §2 D9, reference kafka.clj:50-76):
JSON-serialized records with epoch-ms timestamps, hostname + user extra
pairs merged in, routed to a request/response topic by direction; an empty
topic name drops that side.

The transform is sink-agnostic: it returns (topic, value) columns, which a
deployment feeds to ``writeStream.format("kafka")`` (with
``kafka.compression.type=gzip`` per the reference) or any other sink; tests
validate the payload shape in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_kafka_spec(spec: str) -> dict:
    """``servers/topic1[/topic2][?k=v&...]`` -> routing config (reference
    core.clj:463-474 parse-kafka-spec). topic2 defaults to topic1."""
    extra: dict[str, str] = {}
    if "?" in spec:
        spec, qs = spec.split("?", 1)
        for pair in qs.split("&"):
            if pair:
                k, _, v = pair.partition("=")
                extra[k] = v
    parts = spec.split("/")
    if len(parts) < 2 or len(parts) > 3 or not parts[0]:
        # the reference regex admits exactly servers/topic1[/topic2]
        # (core.clj:462-470)
        raise ValueError(f"invalid kafka spec: {spec!r} (need servers/topic1)")
    servers, topic1 = parts[0], parts[1]
    topic2 = parts[2] if len(parts) > 2 else topic1
    if not topic1 and not topic2:
        # both sides empty would silently drop every record; the reference
        # raises IllegalArgumentException (core.clj:468-470)
        raise ValueError(f"invalid kafka spec: {spec!r} (both topics empty)")
    return {"servers": servers, "topic1": topic1, "topic2": topic2, "extra": extra}


def to_kafka_records(
    df: DataFrame,
    topic1: str,
    topic2: str,
    extra: dict[str, str] | None = None,
    hostname: str = "localhost",
) -> DataFrame:
    """Correlated event stream -> (topic, value[json]) rows.

    - ts -> epoch millis (kafka.clj:59-60)
    - hostname + extra pairs merged into every record (kafka.clj:55-61)
    - inbound -> topic1, outbound -> topic2; empty topic drops the side
      (kafka.clj:69-74)
    - null fields dropped from the JSON (sparse maps, §1.2)
    """
    payload_cols = [
        F.unix_millis("ts").alias("ts"),
        *[F.col(c) for c in df.columns if c != "ts"],
        F.lit(hostname).alias("hostname"),
        *[F.lit(v).alias(k) for k, v in (extra or {}).items()],
    ]
    out = df.select(
        F.when(F.col("inbound"), F.lit(topic1)).otherwise(F.lit(topic2)).alias("topic"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )
    return out.where((F.col("topic").isNotNull()) & (F.col("topic") != ""))


def from_kafka_records(values: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON record values (the ``to_kafka_records`` payload, or what a
    downstream consumer reads off the topics) -> rpc_events rows.

    The inverse of the sink transform: epoch-ms ``ts`` back to timestamp,
    enrichment fields (hostname + extra pairs) ignored, absent fields null
    (sparse JSON, §1.2). ``actions``/``results`` stay embedded arrays,
    exactly as the reference ships them (core.clj:272-280)."""
    from ..schema import RPC_EVENT_SCHEMA
    from pyspark.sql import types as T

    fields = [
        T.StructField("ts", T.LongType())
        if f.name == "ts"
        else f
        for f in RPC_EVENT_SCHEMA.fields
    ]
    parsed = values.select(
        F.from_json(F.col(value_col), T.StructType(fields)).alias("j")
    ).select("j.*")
    return parsed.withColumn("ts", F.timestamp_millis(F.col("ts")))
