"""Native-feeling pcap source via the Spark 4 Python DataSource API
(SURVEY.md §4 stretch goal): ``spark.read.format("pcap").load(glob)``.

Compared to the binaryFile+mapInPandas adapter (sources/pcap.py — still the
fallback), a registered DataSource gives the engine:

- planning-time file listing → one InputPartition per capture file, so
  Spark schedules, retries, and speculates per file like any other source;
- a real format name users can point existing ingestion configs at;
- lazy per-file iteration on executors (rows stream out of the parser —
  the whole file blob never materializes as a DataFrame row first).

Same parser, same PACKET_SCHEMA, same drop semantics as sources/pcap.py.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .pcap import PACKET_SCHEMA, _parse_capture_bytes


class PcapFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PcapDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("pcap source requires a path")

    def partitions(self):
        # planning-time listing: one partition per capture file (pcap
        # framing is sequential, files are the split unit — see SCALE.md)
        paths = sorted(_glob.glob(self._path)) if any(
            c in self._path for c in "*?[") else [self._path]
        if os.path.isdir(self._path):
            paths = sorted(
                os.path.join(self._path, f) for f in os.listdir(self._path)
            )
        if not paths:
            raise FileNotFoundError(self._path)
        return [PcapFilePartition(p) for p in paths]

    def read(self, partition: PcapFilePartition):
        with open(partition.path, "rb") as f:
            blob = f.read()
        for rec in _parse_capture_bytes(partition.path, blob):
            yield (
                rec["path"],
                rec["pkt_index"],
                rec["ts"].to_pydatetime(),
                rec["src_addr"],
                rec["src_port"],
                rec["dst_addr"],
                rec["dst_port"],
                rec["length"],
                rec["data"],
            )


class PcapDataSource(DataSource):
    """``spark.dataSource.register(PcapDataSource)`` then
    ``spark.read.format("pcap").load("captures/*.pcap")``."""

    @classmethod
    def name(cls) -> str:
        return "pcap"

    def schema(self):
        return PACKET_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return PcapDataSourceReader(self.options)


def register(spark) -> None:
    # the reader executes on Python workers, which re-import this module by
    # name — ship the package so registration works from any driver cwd
    from ..session import _ship_package

    _ship_package(spark)
    spark.dataSource.register(PcapDataSource)
