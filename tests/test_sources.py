"""Pushdown negotiation tests for the Python DataSource — the Spark
analogue of the reference's trackingSource tests
(test/execute/trackingSource.js: count what the source actually served)."""

from pyspark.sql import functions as F

from squirreling_spark.sources.api_source import register


def test_full_scan(spark):
    register(spark)
    df = spark.read.format("paged_api").option("num_rows", "100").load()
    assert df.count() == 100
    assert df.columns == ["id", "name", "value", "category"]


def test_filter_pushdown_range(spark):
    register(spark)
    df = (
        spark.read.format("paged_api")
        .option("num_rows", "1000")
        .option("page_size", "100")
        .load()
    )
    out = df.filter((F.col("id") >= 950) & (F.col("id") < 960))
    rows = out.collect()
    assert len(rows) == 10
    assert sorted(r["id"] for r in rows) == list(range(950, 960))


def test_unsupported_filter_compensated(spark):
    """Filters the source declines (category = 2) must still be applied —
    Spark's compensation mirrors reference execute.js:355-362."""
    register(spark)
    df = spark.read.format("paged_api").option("num_rows", "50").load()
    rows = df.filter((F.col("category") == 2) & (F.col("id") < 20)).collect()
    assert all(r["category"] == 2 and r["id"] < 20 for r in rows)
    assert {r["id"] for r in rows} == {2, 7, 12, 17}


def test_streaming_source_exactly_once(spark, tmp_path):
    """The same API served as a micro-batch stream: every record arrives
    exactly once across batches (offset tracking)."""
    register(spark)
    stream = (
        spark.readStream.format("paged_api")
        .option("num_rows", "350")
        .option("batch_size", "100")
        .load()
    )
    import time

    q = (
        stream.writeStream.format("memory")
        .queryName("api_stream_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT count(*) FROM api_stream_sink").collect()[0][0] >= 350:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.sql("SELECT id FROM api_stream_sink").collect()
    ids = sorted(r["id"] for r in rows)
    assert ids == list(range(350))  # all rows, no dupes, no gaps


def test_deterministic_rows(spark):
    register(spark)
    df = spark.read.format("paged_api").option("num_rows", "10").load()
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b


def test_limit_hint_fetches_fewer_pages():
    """Scan-negotiation limit/offset (reference src/types.d.ts:103-106):
    with all filters applied, the limit hint caps the page fetch; with a
    declined (compensated) filter it must NOT apply (reference invariant
    src/execute/execute.js:342-344)."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from squirreling_spark.sources.api_source import PagedApiReader

    # no filters: 1000 rows / 100-row pages = 10 pages; limit 150 -> 2
    r = PagedApiReader(None, {"num_rows": "1000", "page_size": "100"})
    assert len(r.partitions()) == 10
    r = PagedApiReader(
        None, {"num_rows": "1000", "page_size": "100", "limit": "150"}
    )
    assert len(r.partitions()) == 2
    # offset skips key-range pages too
    r = PagedApiReader(
        None,
        {"num_rows": "1000", "page_size": "100", "limit": "100",
         "offset": "500"},
    )
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].start == 500
    # pushed range filter composes with the limit
    r = PagedApiReader(
        None, {"num_rows": "1000", "page_size": "100", "limit": "150"}
    )
    rest = r.pushFilters([GreaterThanOrEqual(("id",), 700)])
    assert list(rest) == []
    assert [(p.start, p.end) for p in r.partitions()] == [(700, 800), (800, 850)]
    # declined filter -> limit hint must be ignored (Spark compensates the
    # filter AFTER the scan, so a capped fetch would drop matching rows)
    r = PagedApiReader(
        None, {"num_rows": "1000", "page_size": "100", "limit": "150"}
    )
    rest = r.pushFilters([EqualTo(("category",), 3)])
    assert len(list(rest)) == 1
    assert len(r.partitions()) == 10


def test_limit_hint_end_to_end(spark):
    """.option('limit') reduces rows fetched; the query's own .limit() on
    top keeps exact semantics."""
    from squirreling_spark.sources.api_source import register

    register(spark)
    df = (
        spark.read.format("paged_api")
        .option("num_rows", 1000)
        .option("page_size", 100)
        .option("limit", 150)
        .load()
    )
    assert df.count() == 150
    assert df.limit(120).count() == 120
