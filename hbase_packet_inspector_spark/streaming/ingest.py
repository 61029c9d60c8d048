"""Streaming deployment of the composed ingest gate: the build-once/
probe-many LSH index (operators/dedup.py::save_lsh_index) driven as a
checkpointed Structured Streaming job with an idempotent parquet sink.

This is the production shape of the registered ``ingest_gate`` query —
the same gate body (operators/text.py::gate_decisions) run per
micro-batch under foreachBatch:

  arrivals (file source) ──▶ probe_lsh_index (persisted bucketed index,
  no corpus shuffle) ──▶ gate_decisions (near-dup evidence + quality
  verdict, one lazy plan) ──▶ decisions/batch_id=N + kept/batch_id=N
  (overwrite per batch = idempotent under replay) ──▶ append kept docs
  into the standing index (the corpus grows as the stream runs)

Exactly-once story (mirrors streaming/pipeline.py::run_pipeline_to_parquet):
the checkpoint makes micro-batch replay possible after a crash; both sinks
stay correct under replay because each batch OVERWRITES its own
``batch_id=N`` partition directory. The index append is the one
at-least-once edge: a replayed batch appends its kept rows twice. That is
benign by construction — gate_decisions collapses pairs per (d_new, d_old)
before counting, so duplicate index rows never change a verdict — and
compact_lsh_index drops the duplicate rows on its next fold, so the debris
is bounded by the time between compactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    append_lsh_index,
    compact_lsh_index,
    load_lsh_index,
    probe_lsh_index,
)
from ..operators.text import gate_decisions


def _index_root(spark, table: str) -> str:
    """The index's base directory, derived from the bands table location
    (save_lsh_index wrote ``<path>/bands``; compaction versions siblings
    under the same parent)."""
    loc = [
        r.data_type
        for r in spark.sql(f"DESCRIBE FORMATTED {table}_bands").collect()
        if r.col_name == "Location"
    ][0]
    return loc.removeprefix("file:").rsplit("/", 1)[0]


def _make_gate_sink(
    spark, out_dir: str, *, table: str,
    min_est: float, min_jaccard: float,
    append_accepted: bool, compact_every: int | None,
    index_path: str | None, prepare=None,
):
    """The per-micro-batch gate body shared by every streamed deployment
    (parquet firehose, WARC crawl drop, ...): optional ``prepare``
    transform (raw batch -> documents shape: doc_id, text[, n_chars]),
    probe the persisted index, write idempotent decisions/kept
    partitions, grow the index, fold on cadence. Returns the foreachBatch
    callable."""
    bands, sets = load_lsh_index(spark, table)
    root = index_path or (_index_root(spark, table) if compact_every else None)
    state = {"bands": bands, "sets": sets}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = prepare(batch_df) if prepare is not None else batch_df
        if "n_chars" not in batch.columns:
            batch = batch.withColumn("n_chars", F.length("text"))
        batch = batch.persist()
        sigs = None
        try:
            pairs, sigs = probe_lsh_index(
                state["bands"], state["sets"], batch,
                min_est=min_est, min_jaccard=min_jaccard,
                return_persisted=True,
            )
            decisions = gate_decisions(batch, pairs)
            dec_dir = f"{out_dir}/decisions/batch_id={batch_id}"
            decisions.write.mode("overwrite").parquet(dec_dir)
            # read the just-committed verdicts back (authoritative even
            # under replay) to carve the kept rows out of the batch
            kept_ids = (
                spark.read.parquet(dec_dir).where("keep").select("doc_id")
            )
            kept = batch.join(F.broadcast(kept_ids), "doc_id")
            kept.write.mode("overwrite").parquet(
                f"{out_dir}/kept/batch_id={batch_id}"
            )
            if append_accepted:
                kept_docs = spark.read.parquet(
                    f"{out_dir}/kept/batch_id={batch_id}"
                )
                if kept_docs.limit(1).count() > 0:
                    append_lsh_index(kept_docs, table=table)
            if compact_every and (batch_id + 1) % compact_every == 0:
                compact_lsh_index(spark, root, table=table)
                # the fold swapped the metastore entry to a fresh
                # location; re-resolve so later probes read the compacted
                # table (the pre-stream frames captured the old one)
                state["bands"], state["sets"] = load_lsh_index(spark, table)
        finally:
            batch.unpersist()
            # the probe persists the batch's minhash signatures (fed to
            # three consumers inside one batch); release per batch so an
            # always-on stream holds zero pinned frames between triggers
            if sigs is not None:
                sigs.unpersist()

    return _sink


def run_ingest_gate_stream(
    spark, source_dir: str, out_dir: str, *, table: str = "lsh_index",
    min_est: float = 0.5, min_jaccard: float = 0.45,
    max_files_per_trigger: int | None = None,
    append_accepted: bool = True,
    compact_every: int | None = None,
    index_path: str | None = None,
) -> None:
    """Gate a parquet firehose against the persisted corpus index.

    Reads ``source_dir`` as a file stream (schema inferred from the
    existing files), probes + quality-gates each micro-batch, writes
    per-batch ``decisions`` and ``kept`` parquet partitions under
    ``out_dir``, and — when ``append_accepted`` — folds the kept docs
    into the standing index so later arrivals are gated against them.
    Trigger is availableNow: one call drains everything currently in the
    source and stops; re-running resumes from the checkpoint and
    processes only NEW files (call it from cron, or swap in a
    processingTime trigger for an always-on deployment — the sink
    contract is identical).

    Per-batch cost is batch-sized everywhere: the batch is persisted once
    (it feeds the probe's two scans and the kept write), the index side
    is bucket-pruned reads with no Exchange, and the kept filter is a
    broadcast semi-join of the batch-sized decision frame. Nothing here
    re-touches the standing corpus.

    ``compact_every=N`` folds the index's append debris every N
    micro-batches (compact_lsh_index): an always-on gate accretes one
    file set per batch via insertInto, and without a cadence every probe
    eventually pays thousands of file opens. The fold is a metadata-only
    cut-over — a replayed or concurrent reader on the old file list
    finishes unharmed — and it also drops the duplicate rows an
    at-least-once replayed append left behind. The index root is derived
    from the bands table's location unless ``index_path`` overrides it.
    Cadence counts on batch_id, which Structured Streaming makes
    monotonic across restarts, so "every N batches" survives resume.
    """
    schema = spark.read.parquet(source_dir).schema
    sink = _make_gate_sink(
        spark, out_dir, table=table, min_est=min_est,
        min_jaccard=min_jaccard, append_accepted=append_accepted,
        compact_every=compact_every, index_path=index_path,
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .start()
    )
    q.awaitTermination()


def run_warc_ingest_stream(
    spark, crawl_dir: str, out_dir: str, *, table: str = "lsh_index",
    min_est: float = 0.5, min_jaccard: float = 0.45,
    min_age_seconds: float = 0,
    append_accepted: bool = True,
    compact_every: int | None = None,
    index_path: str | None = None,
    extract_html: bool = True,
) -> None:
    """The crawl front door as ONE streamed job: a WARC drop directory
    gated straight into the corpus.

      crawl_dir/*.warc[.gz] (streaming WARC DataSource, min_age /
      atomic-landing convention) ──▶ warc_to_documents(extract_html=True)
      (HTTP responses -> documents shape, html_to_text main-text
      extraction) ──▶ the shared gate body (probe persisted LSH index,
      near-dup + quality verdicts, idempotent decisions/kept partitions,
      index growth, compact_every fold cadence)

    Identical sink contract to :func:`run_ingest_gate_stream` — per-batch
    ``decisions/batch_id=N`` and ``kept/batch_id=N`` parquet, availableNow
    drain, checkpoint resume processes only newly-landed archives. The
    WARC source reads each archive incrementally (one record + one chunk
    peak memory) with one partition per file; ``min_age_seconds`` defers
    archives still being copied by non-atomic writers, so a late-landing
    file is simply picked up by the next drain, never half-read.

    The per-batch prepare is the SAME transform the batch composition
    uses (warc_to_documents + html_to_text), so batch and stream verdicts
    agree by construction — pinned by the end-to-end test that runs both
    over the same archives (test_warc.py).
    """
    from ..sources import warc as W
    from ..sources.warc import warc_to_documents

    W.register(spark)

    def _prepare(batch: DataFrame) -> DataFrame:
        docs = warc_to_documents(batch, extract_html=extract_html)
        # markup_frac rides into kept/ (it is a curation signal), but the
        # index stores the documents-table shape
        return docs

    sink = _make_gate_sink(
        spark, out_dir, table=table, min_est=min_est,
        min_jaccard=min_jaccard, append_accepted=append_accepted,
        compact_every=compact_every, index_path=index_path,
        prepare=_prepare,
    )
    reader = spark.readStream.format("warc")
    if min_age_seconds:
        reader = reader.option("min_age_seconds", str(min_age_seconds))
    q = (
        reader.load(crawl_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .start()
    )
    q.awaitTermination()
