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


def test_robots_filter_rep_semantics(spark):
    from squirreling_spark.pipeline.web import robots_filter

    robots = spark.createDataFrame(
        [
            ("a.com",
             "User-agent: googlebot\nDisallow: /private\n\n"
             "User-agent: *\nAllow: /public/img\nDisallow: /public\n"
             "Disallow: /tmp\n# note\nUser-agent: other\nDisallow: /"),
            ("b.com", "User-agent: googlebot\nDisallow: /"),
            ("c.com",
             "User-agent: bingbot\nUser-agent: *\nDisallow: /docs\n"
             "Allow: /docs/readme"),
            ("d.com", "User-agent: *\nAllow: /x\nDisallow: /x"),
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://a.com/public/img/pic"),
            (2, "https://a.com/public/page"),
            (3, "https://a.com/tmp/cache"),
            (4, "https://a.com/ok"),
            (5, "https://b.com/anything"),
            (6, "https://c.com/docs/readme"),
            (7, "https://c.com/docs/secret"),
            (8, "https://d.com/x/tie"),
            (9, "https://nofile.com/y"),
            (10, "https://a.com/private"),
        ],
        "doc_id bigint, url string",
    )
    rows = {
        r.doc_id: r
        for r in robots_filter(urls, robots, "url", "doc_id").collect()
    }
    # longest match: Allow /public/img beats Disallow /public
    assert rows[1].allowed and rows[1].matched_prefix == "/public/img"
    assert not rows[2].allowed and rows[2].matched_prefix == "/public"
    assert not rows[3].allowed
    assert rows[4].allowed and rows[4].matched_prefix == ""
    # no '*' group -> default allow, zero rules
    assert rows[5].allowed and rows[5].n_rules == 0
    # consecutive UA lines form one group; Allow override via length
    assert rows[6].allowed and rows[6].matched_prefix == "/docs/readme"
    assert not rows[7].allowed
    # exact length tie -> Allow wins
    assert rows[8].allowed and rows[8].matched_prefix == "/x"
    # host without a robots file -> allowed
    assert rows[9].allowed and rows[9].n_rules == 0
    # googlebot-group rules never apply to '*' evaluation
    assert rows[10].allowed


def test_robots_fuzz_vs_python_reference(spark):
    """Seeded-random rule sets / paths, every verdict compared against
    an independent longest-match reference implementation."""
    import random

    from squirreling_spark.pipeline.web import robots_filter

    rng = random.Random(82)
    prefixes = ["/", "/a", "/a/b", "/ab", "/b", "/a/b/c", "/abc", "/b/x"]
    paths = ["/a/b/c", "/ab", "/abc/d", "/b/x", "/c", "/", "/a/bz"]
    robots_rows, url_rows, expected = [], [], {}

    def ref(path, rules):
        m = [(len(p), allow, p) for allow, p in rules if path.startswith(p)]
        if not m:
            return True, ""
        m.sort(key=lambda t: (-t[0], not t[1], t[2]))
        return m[0][1], m[0][2]

    uid = 0
    for h in range(30):
        host = f"h{h}.com"
        rules = [
            (rng.random() < 0.5, rng.choice(prefixes))
            for _ in range(rng.randint(0, 6))
        ]
        body = "User-agent: *\n" + "\n".join(
            ("Allow: " if a else "Disallow: ") + p for a, p in rules
        )
        robots_rows.append((host, body))
        for path in rng.sample(paths, 3):
            uid += 1
            url_rows.append((uid, f"https://{host}{path}"))
            expected[uid] = ref(path, rules)
    robots = spark.createDataFrame(robots_rows, "host string, robots_txt string")
    urls = spark.createDataFrame(url_rows, "doc_id bigint, url string")
    out = robots_filter(urls, robots, "url", "doc_id").collect()
    assert len(out) == len(expected)
    for r in out:
        want_allowed, want_prefix = expected[r.doc_id]
        assert r.allowed == want_allowed, (r.url, r.asDict())
        assert r.matched_prefix == want_prefix, (r.url, r.asDict())
