"""Streamed crawl-compliance deployment: the robots gate + politeness
scheduler run per micro-batch over an arriving frontier.

The batch operators (operators/web.py::robots_gate_rfc /
robots_gate_wildcards / schedule_fetches) ARE the per-batch bodies —
same plan, same verdicts, which is the whole point: the compliance
semantics a crawler was calibrated on in batch apply unchanged to its
live frontier feed (the run_ingest_gate_stream contract, applied to the
crawl loop).

Reference parity note: the reference engine has no crawl surface; this
module is part of the repo's LLM-data-pipeline extension alongside
streaming/ingest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..operators.web import (
    parse_crawl_delays,
    parse_robots_patterns,
    parse_robots_rules,
    recrawl_priority,
    robots_gate_rfc,
    robots_gate_wildcards,
    schedule_fetches,
    sitemap_to_urls,
)

_GATES = {
    "rfc": (parse_robots_rules, robots_gate_rfc),
    "wildcards": (parse_robots_patterns, robots_gate_wildcards),
}


class RobotsTables:
    """Standing robots rule/delay tables with cheap change detection —
    the per-stream state :func:`run_crawl_gate_stream` keeps so a
    robots re-snapshot lands WITHOUT a stream restart (and without
    losing the checkpoint).

    ``refresh()`` lists the snapshot directory's parquet files (a
    host-cardinality directory — robots.txt files are KB-sized, the
    listing is metadata-only) and re-derives + re-persists the rule and
    delay frames only when the file set changed; drop-directory
    semantics are append-new-files, so an unchanged listing means an
    unchanged snapshot. Returns True when it re-derived. The previous
    frames unpersist so executor memory holds one generation."""

    def __init__(self, spark, robots_dir: str, *, gate: str = "rfc"):
        self._spark = spark
        self._dir = robots_dir
        self._parse_rules, self.gate_fn = _GATES[gate]
        self._files: tuple[str, ...] | None = None
        self.rules: DataFrame | None = None
        self.delays: DataFrame | None = None
        self.refresh()

    def refresh(self) -> bool:
        robots = self._spark.read.parquet(self._dir)
        files = tuple(sorted(robots.inputFiles()))
        if files == self._files:
            return False
        for old in (self.rules, self.delays):
            if old is not None:
                old.unpersist()
        self.rules = self._parse_rules(robots).persist()
        self.delays = parse_crawl_delays(robots).persist()
        self.rules.count(), self.delays.count()  # materialize eagerly
        self._files = files
        return True


def run_crawl_gate_stream(
    spark, urls_dir: str, robots_dir: str, out_dir: str, *,
    default_delay: float = 1.0,
    max_files_per_trigger: int | None = None,
    url_schema: StructType | str | None = None,
    gate: str = "rfc",
    robots_refresh: bool = True,
) -> None:
    """Gate an arriving frontier against a standing robots snapshot and
    emit a timed fetch plan per micro-batch.

    ``urls_dir`` is a parquet drop directory of frontier batches (one
    ``url`` column at minimum); ``robots_dir`` is a parquet snapshot of
    (host, robots_txt) fetched robots files. The rule table and the
    crawl-delay table are standing host-cardinality frames
    (:class:`RobotsTables`): derived at start and — when
    ``robots_refresh`` — re-checked per micro-batch by directory
    listing, so dropping a new robots parquet into the snapshot
    directory takes effect on the NEXT batch without restarting the
    stream or touching the checkpoint. ``gate`` picks the resolution:
    ``"rfc"`` (conservative truncate/drop longest-match,
    robots_gate_rfc) or ``"wildcards"`` (full RFC 9309 ``*``/``$``
    patterns, robots_gate_wildcards). Each micro-batch writes two
    idempotent partitions under ``out_dir``:

    - ``decisions/batch_id=N`` — (url, host, blocked) verdicts;
    - ``plan/batch_id=N`` — schedule_fetches over the batch's ALLOWED
      rows, the decisions re-read from the just-committed partition so
      a replayed batch reproduces byte-identical output.

    ``url_schema`` (StructType or DDL string) lets the stream start
    against an EMPTY drop directory — the deployment mode, where the
    gate comes up before the first frontier batch lands; when omitted
    it is inferred from whatever is already in ``urls_dir``, falling
    back to the minimal ``url STRING`` when the directory has nothing
    to infer from.

    Slots restart at 0 per micro-batch BY DESIGN: a micro-batch is one
    fetch cycle, so per-host pacing applies within the cycle and cycles
    are spaced by the trigger cadence. Trigger is availableNow — one
    call drains what's there and stops; re-running resumes from the
    checkpoint and processes only NEW files.

    Scale shape per batch: the standing tables are host-cardinality and
    reused (the refresh listing is metadata-only); the gate is one host
    equi-join + verdict fold, the plan one more host join + a
    host-partitioned row_number — all batch-sized, nothing re-touches
    prior batches."""
    tables = RobotsTables(spark, robots_dir, gate=gate)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if robots_refresh:
            tables.refresh()
        gated = tables.gate_fn(batch_df, tables.rules)
        dec_dir = f"{out_dir}/decisions/batch_id={batch_id}"
        gated.write.mode("overwrite").parquet(dec_dir)
        allowed = (
            spark.read.parquet(dec_dir)
            .where(~F.col("blocked"))
            .select("url", "host")
        )
        plan = schedule_fetches(allowed, tables.delays,
                                default_delay=default_delay)
        plan.write.mode("overwrite").parquet(
            f"{out_dir}/plan/batch_id={batch_id}")

    if url_schema is None:
        try:
            url_schema = spark.read.parquet(urls_dir).schema
        except Exception:  # empty drop dir: nothing to infer from yet
            url_schema = StructType([StructField("url", StringType())])
    reader = spark.readStream.schema(url_schema)
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


def run_recrawl_stream(
    spark, sitemap_dir: str, frontier_path: str, out_dir: str, *,
    asof_date: str, fresh_days: int = 30, boost: float = 0.5,
    sitemap_schema=None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Streamed form of the re-crawl freshness loop: arriving fetched
    sitemap XML batches re-prioritize a standing frontier per
    micro-batch — the :func:`run_crawl_gate_stream` contract applied
    to :func:`~..operators.web.recrawl_priority` (the per-batch body
    IS the oracle-verified batch operator, so verdicts calibrated in
    batch apply unchanged to the live feed).

    ``sitemap_dir`` is a parquet drop directory of fetched sitemap
    bodies (``sitemap_url``/``body`` at minimum; ``sitemap_schema``
    lets the stream start against an empty directory, falling back to
    that minimal DDL); ``frontier_path`` is the standing frontier
    snapshot (host, priority, status — crawl_frontier output), a
    host-cardinality frame re-read per batch so a frontier refresh
    between cycles lands without a restart. Each micro-batch is one
    sitemap-refresh WAVE: its ``<loc>``/``<lastmod>`` entries roll
    into per-host freshness and the blended priority table writes to
    the idempotent partition ``priorities/batch_id=N`` — the table a
    scheduler consumes for the cycle that wave announced. Waves are
    deliberately independent (no cross-batch freshness state): a
    sitemap re-fetch SUPERSEDES the previous wave's evidence, so the
    latest partition is the current truth and replay reproduces it.

    Trigger is availableNow — one call drains what's there and stops;
    re-running resumes from the checkpoint and processes only NEW
    files.

    Scale shape per batch: entry rollup is one partial+final host
    aggregate over the wave, one host equi-join onto the
    host-cardinality frontier — nothing re-touches prior waves."""
    from pyspark.sql.types import StringType, StructField, StructType

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        frontier = spark.read.parquet(frontier_path)
        entries = sitemap_to_urls(batch_df)
        out = recrawl_priority(
            frontier, entries, asof_date=asof_date,
            fresh_days=fresh_days, boost=boost)
        out.write.mode("overwrite").parquet(
            f"{out_dir}/priorities/batch_id={batch_id}")

    if sitemap_schema is None:
        try:
            sitemap_schema = spark.read.parquet(sitemap_dir).schema
        except Exception:  # empty drop dir: nothing to infer from yet
            sitemap_schema = StructType([
                StructField("sitemap_url", StringType()),
                StructField("body", StringType()),
            ])
    reader = spark.readStream.schema(sitemap_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    q = (
        reader.parquet(sitemap_dir)
        .writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .start()
    )
    q.awaitTermination()
