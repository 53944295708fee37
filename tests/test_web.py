"""URL canonicalization (pipeline/web.py): the canonicalization spec,
the dedup keeper, and the plan shape (single projection + one shuffle)."""
import pytest
from pyspark.sql import functions as F

from squirreling_spark.pipeline.web import canonicalize_urls, host_stats


def _canon_map(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    rows = canonicalize_urls(df, "url", "id").collect()
    return {r["url"]: r for r in rows}


def test_canonical_equivalence_classes(spark):
    """Scheme/host case, www, default ports, fragments, tracking params,
    and param order all collapse to ONE canonical form."""
    variants = [
        "https://www.Example.com/a?b=2&a=1",
        "HTTPS://EXAMPLE.COM:443/a?a=1&b=2",
        "https://example.com/a?utm_source=news&b=2&a=1#section",
        "https://example.com/a?b=2&ref=home&a=1",
    ]
    m = _canon_map(spark, variants)
    canons = {m[u]["canon"] for u in variants}
    assert canons == {"https://example.com/a?a=1&b=2"}
    # exactly one keeper in the class
    assert sum(1 for u in variants if m[u]["keep"]) == 1
    assert m[variants[0]]["keep"]  # smallest id wins


def test_non_default_ports_and_paths_preserved(spark):
    m = _canon_map(
        spark,
        [
            "http://h.com:8080/x",
            "http://h.com:80/x",
            "https://h.com:80/x",   # :80 is NOT default for https
            "http://h.com",
        ],
    )
    assert m["http://h.com:8080/x"]["canon"] == "http://h.com:8080/x"
    assert m["http://h.com:80/x"]["canon"] == "http://h.com/x"
    assert m["https://h.com:80/x"]["canon"] == "https://h.com:80/x"
    assert m["http://h.com"]["canon"] == "http://h.com/"


def test_unparseable_urls_yield_null_canon(spark):
    m = _canon_map(spark, ["not a url", "ftp//missing.scheme"])
    assert all(v["canon"] is None for v in m.values())
    # NULL canons form ONE dedup group (oracle PARTITION BY semantics):
    # keep is a real boolean for every row, exactly one keeper.
    assert sorted(v["keep"] for v in m.values()) == [False, True]
    assert m["not a url"]["keep"]  # smallest id wins the null group


def test_host_stats(spark):
    df = spark.createDataFrame(
        [
            (0, "https://www.a.com/x"),
            (1, "https://a.com/x#frag"),
            (2, "https://a.com/y"),
            (3, "http://b.org/"),
        ],
        "id long, url string",
    )
    rows = {r["host"]: r for r in host_stats(df, "url", "id").collect()}
    assert rows["a.com"]["n_urls"] == 3
    assert rows["a.com"]["n_canonical"] == 2
    assert rows["a.com"]["n_kept"] == 2
    assert rows["b.org"]["n_urls"] == 1


def test_plan_single_shuffle(spark):
    """Parse+rebuild must stay one codegen projection; the only exchange
    is the keeper groupBy on the canonical string."""
    df = spark.createDataFrame([(0, "https://a.com/x")], "id long, url string")
    plan = (
        canonicalize_urls(df, "url", "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2  # keeper agg + its broadcast/join
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
