"""Custom connector via the Python Data Source API (Spark 4) — the
extension point that lets this engine host sources Spark has no built-in
for (vendor APIs, proprietary formats, synthetic generators) without
leaving Python or giving up partitioned parallelism.

The demonstration source is a DETERMINISTIC synthetic corpus: every row
is a pure function of ``doc_id`` (no RNG state, no wall clock), so the
source is (a) partition-layout independent — any partitioning yields the
same rows, (b) oracle-checkable — DuckDB reconstructs the identical
table from ``range()`` arithmetic, which is what upgrades this from a
demo to a hash-verified query (``s_python_datasource``).

Scale shape: ``partitions()`` splits the id range into ``num_partitions``
slices, each read independently by an executor-side Python worker —
the same planning contract a real connector would implement against a
remote system's shard/offset metadata. Filter pushdown for custom
sources arrives via ``pushFilters`` (left default here: Spark applies
residual filters after the scan).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LANGS = ["en", "de", "fr"]


def synthetic_row(doc_id: int) -> tuple[int, str, str, int]:
    """The row contract, shared with tests: (doc_id, text, lang, n_tokens)
    with n_tokens = 5 + doc_id % 7 and text = that many ``w<i>`` tokens."""
    n_tokens = 5 + doc_id % 7
    text = " ".join(f"w{(doc_id + j) % 11}" for j in range(n_tokens))
    return doc_id, text, LANGS[doc_id % 3], n_tokens


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numpartitions", 4))

    def partitions(self):
        per = max(1, -(-self.rows // self.num_partitions))  # ceil division
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield synthetic_row(doc_id)


class SyntheticCorpusStreamReader(SimpleDataSourceStreamReader):
    """STREAMING face of the same corpus: offsets are plain dicts persisted
    in the query checkpoint — ``read`` serves the next id slice and
    advances the offset, ``readBetweenOffsets`` replays a committed slice
    for recovery. This is the offset/commit contract a real queue or CDC
    connector implements; determinism of the row function makes replay
    byte-identical, so checkpointed restarts resume EXACTLY where the
    last commit left off (exercised by m10_python_stream_source, which
    drains the stream across several separate query restarts)."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.batch = int(options.get("batchsize", 300))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        cur = int(start["offset"])
        end = min(cur + self.batch, self.rows)
        return (
            iter([synthetic_row(i) for i in range(cur, end)]),
            {"offset": end},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [synthetic_row(i) for i in range(int(start["offset"]), int(end["offset"]))]
        )


class SyntheticCorpusDataSource(DataSource):
    """``spark.read.format("synthetic_corpus").option("rows", N).load()``
    (batch) or ``spark.readStream.format("synthetic_corpus")...`` (stream)
    after ``spark.dataSource.register(SyntheticCorpusDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, n_tokens int"

    def reader(self, schema) -> SyntheticCorpusReader:
        return SyntheticCorpusReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticCorpusStreamReader:
        return SyntheticCorpusStreamReader(self.options)
