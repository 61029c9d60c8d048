"""Streamed crawl-compliance deployment: the robots gate + politeness
scheduler run per micro-batch over an arriving frontier.

The batch operators (operators/web.py::robots_gate_rfc /
schedule_fetches) ARE the per-batch bodies — same plan, same verdicts,
which is the whole point: the compliance semantics a crawler was
calibrated on in batch apply unchanged to its live frontier feed (the
run_ingest_gate_stream contract, applied to the crawl loop).

Reference parity note: the reference engine has no crawl surface; this
module is part of the repo's LLM-data-pipeline extension alongside
streaming/ingest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.web import (
    parse_crawl_delays,
    parse_robots_rules,
    robots_gate_rfc,
    schedule_fetches,
)


def run_crawl_gate_stream(
    spark, urls_dir: str, robots_dir: str, out_dir: str, *,
    default_delay: float = 1.0,
    max_files_per_trigger: int | None = None,
) -> None:
    """Gate an arriving frontier against a standing robots snapshot and
    emit a timed fetch plan per micro-batch.

    ``urls_dir`` is a parquet drop directory of frontier batches (one
    ``url`` column at minimum); ``robots_dir`` is a parquet snapshot of
    (host, robots_txt) fetched robots files. The RFC rule table and the
    crawl-delay table derive ONCE at start (host-cardinality frames,
    persisted — robots refresh = restart the stream, which resumes from
    the checkpoint). Each micro-batch writes two idempotent partitions
    under ``out_dir``:

    - ``decisions/batch_id=N`` — (url, host, blocked) RFC verdicts;
    - ``plan/batch_id=N`` — schedule_fetches over the batch's ALLOWED
      rows, the decisions re-read from the just-committed partition so
      a replayed batch reproduces byte-identical output.

    Slots restart at 0 per micro-batch BY DESIGN: a micro-batch is one
    fetch cycle, so per-host pacing applies within the cycle and cycles
    are spaced by the trigger cadence. Trigger is availableNow — one
    call drains what's there and stops; re-running resumes from the
    checkpoint and processes only NEW files.

    Scale shape per batch: the standing tables are host-cardinality and
    reused; the gate is one host equi-join + verdict fold, the plan one
    more host join + a host-partitioned row_number — all batch-sized,
    nothing re-touches prior batches."""
    robots = spark.read.parquet(robots_dir)
    rules = parse_robots_rules(robots).persist()
    delays = parse_crawl_delays(robots).persist()
    rules.count(), delays.count()  # materialize once, before the loop

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        gated = robots_gate_rfc(batch_df, rules)
        dec_dir = f"{out_dir}/decisions/batch_id={batch_id}"
        gated.write.mode("overwrite").parquet(dec_dir)
        allowed = (
            spark.read.parquet(dec_dir)
            .where(~F.col("blocked"))
            .select("url", "host")
        )
        plan = schedule_fetches(allowed, delays,
                                default_delay=default_delay)
        plan.write.mode("overwrite").parquet(
            f"{out_dir}/plan/batch_id={batch_id}")

    schema = spark.read.parquet(urls_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    q = (
        reader.parquet(urls_dir)
        .writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .start()
    )
    q.awaitTermination()
