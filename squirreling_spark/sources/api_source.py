"""Custom pushdown-negotiating data source — the reference's
``AsyncDataSource`` protocol on Spark's Python DataSource API.

Reference: hyparam/squirreling src/types.d.ts:89-109 —
``scan({columns, where, limit, offset}) → {rows(), appliedWhere, ...}``:
the engine OFFERS hints, the source reports what it applied, the engine
compensates for the rest. Spark's Python DataSource API (Spark 4+)
implements the same negotiation natively:

- column pruning: Spark passes only required columns to ``read`` via the
  pruned schema (automatic).
- filter pushdown: ``DataSourceReader.pushFilters(filters)`` returns the
  filters the source could NOT apply; Catalyst re-applies exactly those —
  the compensation path the reference hand-rolls
  (src/execute/execute.js:355-362).
- ``partitions()``: splits the source into parallel fetch units (pages) —
  each page is fetched by a different executor task, which is what makes a
  paginated REST/API source scale horizontally.

``PagedApiDataSource`` demonstrates the protocol with a deterministic
synthetic "API" (self-contained, no network): integer-keyed records served
in pages. Real REST sources subclass and replace ``_fetch_page``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class PagePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _row_for(i: int) -> tuple:
    """Deterministic fake API record for id ``i``."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    return (i, f"item-{h[:8]}", round(int(h[:6], 16) / 1e4, 4), i % 5)


class PagedApiReader(DataSourceReader):
    """Reader with filter pushdown on the ``id`` column (the 'API' supports
    key-range queries) — every other filter is declined and Spark
    compensates."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.num_rows = int(options.get("num_rows", 1000))
        self.page_size = int(options.get("page_size", 250))
        self.lo = 0
        self.hi = self.num_rows  # exclusive
        self.pushed: list[Filter] = []
        # Scan-negotiation limit/offset hints (reference src/types.d.ts:
        # 103-106). Spark's Python DataSource API has no pushLimit hook, so
        # these arrive as read options. The reference's invariant
        # (src/execute/execute.js:342-344): a source may apply limit/offset
        # ONLY when it applied the whole WHERE — otherwise post-filtering
        # would drop rows a larger fetch should have supplied. We mirror
        # that: the hints take effect only if pushFilters declined nothing.
        # They are fetch-reduction hints; the query's own .limit()/.offset()
        # still guarantees correctness on top.
        self.limit = int(options["limit"]) if "limit" in options else None
        self.offset = int(options.get("offset", 0))
        self.fully_pushed = True

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        unsupported = []
        for f in filters:
            applied = True
            if isinstance(f, EqualTo) and f.attribute == ("id",):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, GreaterThan) and f.attribute == ("id",):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("id",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan) and f.attribute == ("id",):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("id",):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                applied = False
                unsupported.append(f)
            if applied:
                self.pushed.append(f)
        self.fully_pushed = not unsupported
        return unsupported  # Spark re-applies these — compensation path

    def partitions(self) -> list[PagePartition]:
        lo, hi = self.lo, self.hi
        if self.limit is not None and self.fully_pushed:
            # Key-ordered API: offset skips ids, limit caps the fetch — the
            # difference between one page and all pages on a real API.
            lo = min(lo + self.offset, hi)
            hi = min(hi, lo + self.limit)
        pages = []
        start = lo
        while start < hi:
            end = min(start + self.page_size, hi)
            pages.append(PagePartition(start, end))
            start = end
        return pages or [PagePartition(0, 0)]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        yield from self._fetch_page(partition.start, partition.end)

    def _fetch_page(self, start: int, end: int) -> Iterator[tuple]:
        for i in range(start, end):
            yield _row_for(i)


class PagedApiStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same paged 'API': offsets are row ids;
    each batch serves up to ``batch_size`` new records. The streaming
    mirror of the reference's incremental pull-based row delivery — but
    with real exactly-once offset tracking."""

    def __init__(self, options: dict):
        self.num_rows = int(options.get("num_rows", 1000))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.batch_size, self.num_rows)
        rows = [_row_for(i) for i in range(pos, end)]
        return iter(rows), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(_row_for(i) for i in range(start["pos"], end["pos"]))


class PagedApiDataSource(DataSource):
    """``spark.read.format("paged_api")`` (batch) and
    ``spark.readStream.format("paged_api")`` (micro-batch stream)."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return "id BIGINT, name STRING, value DOUBLE, category BIGINT"

    def reader(self, schema: StructType) -> PagedApiReader:
        return PagedApiReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> PagedApiStreamReader:
        return PagedApiStreamReader(self.options)


def register(spark) -> None:
    # Python-source filter pushdown is gated off by default.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedApiDataSource)
