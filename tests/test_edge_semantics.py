"""Edge fixtures from the reference test suite (FIXTURES.md §1): empty
tables with declared schemas, all-NULL rows, empty aggregation inputs,
joins with no matches."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
    ]
)


def _empty(spark):
    return spark.createDataFrame([], SCHEMA)


def test_empty_table_ops(spark):
    e = _empty(spark)
    assert e.count() == 0
    assert e.filter(F.col("id") > 0).count() == 0
    assert e.select(F.upper("name").alias("u")).collect() == []
    assert e.distinct().count() == 0
    assert e.orderBy("id").limit(5).collect() == []


def test_empty_aggregate_semantics(spark):
    e = _empty(spark)
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("s"),
        F.avg("id").alias("a"),
        F.min("id").alias("mn"),
        F.max("id").alias("mx"),
    ).collect()[0]
    # SQL semantics: COUNT=0, every other aggregate NULL over empty input
    # (matches reference: empty SUM/AVG → NULL, evaluate.js:267-290)
    assert row["n"] == 0
    assert row["s"] is None and row["a"] is None
    assert row["mn"] is None and row["mx"] is None
    # GROUP BY over empty input → zero groups
    assert e.groupBy("name").count().collect() == []


def test_all_null_row_behavior(spark):
    df = spark.createDataFrame([(None, None), (1, "a")], SCHEMA)
    assert df.filter(F.col("id").isNull()).count() == 1
    # null group key forms its own group
    groups = {r["name"]: r["c"] for r in
              df.groupBy("name").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert groups == {None: 1, "a": 1}
    # DISTINCT treats NULLs as equal
    assert df.select("name").distinct().count() == 2


def test_join_null_keys_never_match(spark):
    """NULL join keys match nothing (reference src/execute/join.js:224-348;
    standard SQL equi-join semantics)."""
    a = spark.createDataFrame([(None, "x"), (1, "y")], SCHEMA.fieldNames())
    b = spark.createDataFrame([(None, "p"), (1, "q")], SCHEMA.fieldNames())
    inner = a.join(b, a["id"] == b["id"]).count()
    assert inner == 1  # only the 1=1 pair
    left = a.join(b, a["id"] == b["id"], "left").count()
    assert left == 2  # null-key row survives with null padding


def test_join_empty_side(spark):
    a = spark.createDataFrame([(1, "x")], SCHEMA.fieldNames())
    e = _empty(spark)
    assert a.join(e, a["id"] == e["id"]).count() == 0
    assert a.join(e, a["id"] == e["id"], "left").count() == 1
    assert e.join(a, e["id"] == a["id"], "right").count() == 1


def test_union_empty_and_set_ops(spark):
    a = spark.createDataFrame([(1, "x")], SCHEMA.fieldNames())
    e = _empty(spark)
    assert a.unionByName(e).count() == 1
    assert a.intersect(e).count() == 0
    assert a.subtract(e).count() == 1


def test_window_over_empty(spark):
    from pyspark.sql import Window

    e = _empty(spark)
    w = Window.partitionBy("name").orderBy("id")
    assert e.withColumn("rn", F.row_number().over(w)).collect() == []


def test_chunking_and_scrub_edge_inputs(spark):
    """Empty/short text through the round-2 text operators."""
    from squirreling_spark.pipeline.text import chunk_documents, scrub_pii

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "a@b.co https://x.y 555-123-4567")],
        ["doc_id", "text"],
    )
    chunks = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in chunk_documents(df, "text", "doc_id").collect()
    }
    # split('') -> [''] -> one (empty) chunk; never zero rows per doc
    assert chunks[(1, 0)] == "" and chunks[(2, 0)] == "one"

    scrubbed = {r["doc_id"]: r for r in scrub_pii(df, "text", "doc_id").collect()}
    assert scrubbed[1]["n_email"] == 0 and scrubbed[1]["scrubbed"] == ""
    s3 = scrubbed[3]
    assert s3["n_email"] == 1 and s3["n_url"] == 1 and s3["n_phone"] == 1
    assert "<EMAIL>" in s3["scrubbed"] and "@" not in s3["scrubbed"]


def test_hyperplane_lsh_self_consistency(spark):
    """Identical vectors share every band; orthogonal-ish random vectors
    mostly don't. Candidate set never contains self-pairs or dupes."""
    import random

    from squirreling_spark.pipeline.dedup import hyperplane_lsh_candidates

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    rows = [
        (1, base),
        (2, list(base)),                       # exact duplicate
        (3, [v + rng.uniform(-0.01, 0.01) for v in base]),  # near-dup
        (4, [rng.uniform(-1, 1) for _ in range(64)]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hyperplane_lsh_candidates(df, "embedding", "vec_id").collect()
    }
    assert (1, 2) in pairs          # identical -> all bands match
    assert (1, 3) in pairs          # tiny perturbation -> same signs
    assert all(a < b for a, b in pairs)


def test_positional_join_empty_side(spark):
    from squirreling_spark.operators.positional_join import positional_join

    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
    b = spark.createDataFrame([], "rid INT, w STRING")
    out = positional_join(a, b, ["id"], ["rid"]).collect()
    assert len(out) == 2 and all(r["w"] is None for r in out)
