"""Custom Spark data source: ``couchdb_changes`` (R1/R2 as a first-
class source, not file tailing).

The reference consumes the feed through a ChangesReader abstraction —
one long spool request, or repeated longpolls (reference
index.js:87-105, 143-170). Spark 4's Python Data Source API lets the
warehouse expose the same abstraction AS a format:

    spark.dataSource.register(ChangesFeedDataSource)
    spark.read.format("couchdb_changes").option("path", dir).load()
    spark.readStream.format("couchdb_changes").option("path", dir).load()

The transport here is a landing directory of immutable feed pages
(what the HTTP tailer writes); swapping ``_list_pages``/``_read_page``
for actual ``_changes`` HTTP calls turns this into a live CouchDB
source with the same offset contract. Offsets are (sorted) page
counts — pages are immutable once landed, so an offset identifies an
exact prefix of the feed; ``maxPagesPerBatch`` is the rate-limit knob
(R3 slow mode).

``doc`` is surfaced as a raw JSON string — the warehouse's frozen
per-type schema is the authority on structure (R7/R13), so the
source stays schema-free like the feed itself.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

ENVELOPE_DDL = "seq string, id string, deleted boolean, doc string"


def _list_pages(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(
        f for f in os.listdir(path)
        if not f.startswith(".") and not f.startswith("_")
    )


def _read_page(path: str, page: str):
    with open(os.path.join(path, page)) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            env = json.loads(line)
            doc = env.get("doc")
            yield (
                env.get("seq"),
                env.get("id"),
                bool(env.get("deleted", False)),
                json.dumps(doc) if doc is not None else None,
            )


class _PagePartition(InputPartition):
    def __init__(self, page: str):
        self.page = page


class ChangesFeedBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")

    def partitions(self):
        return [_PagePartition(p) for p in _list_pages(self.path)] or [
            _PagePartition("")
        ]

    def read(self, partition: _PagePartition):
        if not partition.page:
            return iter(())
        return _read_page(self.path, partition.page)


class ChangesFeedStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = number of landed pages consumed.

    ``latestOffset`` is the spool/longpoll probe (reference
    index.js:218-229); each micro-batch covers the newly landed pages,
    capped by ``maxPagesPerBatch`` (R3 backpressure).
    """

    def __init__(self, options):
        self.path = options.get("path")
        self.max_pages = int(options.get("maxpagesperbatch", 0) or 0)
        self._committed = 0

    def initialOffset(self):  # noqa: N802 (Spark API casing)
        return {"pages": 0}

    def latestOffset(self):  # noqa: N802
        n = len(_list_pages(self.path))
        if self.max_pages:
            n = min(n, self._committed + self.max_pages)
        return {"pages": n}

    def partitions(self, start, end):
        # Advance the rate-limit window from the PLANNED end: the
        # engine may not route commit() back to this instance, and a
        # planned batch either commits or is re-planned from the
        # checkpoint on restart — with the downstream merge idempotent
        # by seq, advancing here is safe (at-least-once at worst).
        self._committed = max(self._committed, end["pages"])
        pages = _list_pages(self.path)[start["pages"] : end["pages"]]
        return [_PagePartition(p) for p in pages]

    def read(self, partition: _PagePartition):
        return _read_page(self.path, partition.page)

    def commit(self, end):
        self._committed = max(self._committed, end["pages"])


class ChangesFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "couchdb_changes"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema):
        return ChangesFeedBatchReader(self.options)

    def streamReader(self, schema):
        return ChangesFeedStreamReader(self.options)
