"""Nested data (SURVEY.md §2.1 TableFunction + §2.4 JSON/array packs):
UNNEST/EXPLODE (+ OUTER, + ordinality), JSON value extraction, JSON_EACH,
struct construction/dot-access, array function pack.

Reference: table functions src/execute/execute.js:153-242, JSON navigator
src/expression/evaluate.js:476-685, arrays :574-633, dot access :86-95.

DuckDB oracles avoid the DuckDB `json` extension (not guaranteed loaded in
the driver's connection) — the events ``props`` payloads are flat
``{"k": <int>}`` objects, so string/regex oracles express the same values.
Spark-side implementations use the real JSON machinery (from_json /
get_json_object), which is what runs at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from squirreling_spark.inventory import query
from squirreling_spark.operators.json_each import json_each
from squirreling_spark.qutil import t


@query(
    "unnest_array",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
    FROM part
    """,
)
def unnest_array(spark, sf):
    """UNNEST/EXPLODE array → rows (reference src/execute/execute.js:153-192)."""
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


@query(
    "unnest_ordinality",
    oracle="""
    SELECT s.p_partkey, u.pos, u.word
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part) s,
         LATERAL (SELECT generate_subscripts(s.words, 1) - 1 AS pos,
                         unnest(s.words) AS word) u
    """,
)
def unnest_ordinality(spark, sf):
    """POSEXPLODE — unnest with element position (0-based)."""
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    )


@query(
    "unnest_outer",
    oracle="""
    SELECT s.p_partkey, u.word
    FROM (SELECT p_partkey,
                 list_filter(string_split(p_name, ' '), w -> w LIKE '%z%') AS words
          FROM part) s
    LEFT JOIN LATERAL (SELECT unnest(s.words) AS word) u ON true
    """,
)
def unnest_outer(spark, sf):
    """LATERAL VIEW OUTER EXPLODE — empty arrays keep the parent row,
    null-padded (reference src/execute/join.js:126-167)."""
    p = t(spark, sf, "part")
    words = F.filter(F.split("p_name", " "), lambda w: w.like("%z%"))
    return p.select("p_partkey", words.alias("words")).select(
        "p_partkey", F.explode_outer("words").alias("word")
    )


@query(
    "array_funcs",
    oracle="""
    SELECT p_partkey,
           len(words) AS n_words,
           list_contains(words, 'green') AS has_green,
           list_position(words, 'red') AS red_pos,
           array_to_string(list_sort(words), '/') AS sorted_words,
           words[1] AS first_word,
           array_to_string(list_append(words, 'x'), '/') AS appended,
           array_to_string(list_concat(words, ['a', 'b']), '/') AS concatted,
           array_to_string(words[2:3], '/') AS sliced
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part) s
    """,
)
def array_funcs(spark, sf):
    """Array pack (reference src/expression/evaluate.js:574-633): LENGTH /
    CONTAINS / POSITION (1-based, 0 when absent — both engines agree) /
    SORT / subscript / APPEND / CONCAT / slice. Array-typed outputs are
    serialized with array_join: the driver's pandas canonicalizer cannot
    hash list-valued columns."""
    p = t(spark, sf, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_contains(words, "green").alias("has_green"),
        F.array_position(words, "red").alias("red_pos"),
        F.array_join(F.array_sort(words), "/").alias("sorted_words"),
        words[0].alias("first_word"),
        F.array_join(F.array_append(words, "x"), "/").alias("appended"),
        F.array_join(
            F.concat(words, F.array(F.lit("a"), F.lit("b"))), "/"
        ).alias("concatted"),
        F.array_join(F.slice(words, 2, 2), "/").alias("sliced"),
    )


@query(
    "json_value",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_val,
           length(props) AS props_len
    FROM events
    """,
)
def json_value(spark, sf):
    """JSON_VALUE / JSON_EXTRACT `$.k` path (reference JSON path navigator,
    src/expression/evaluate.js:635-685). Spark side uses the real JSON
    engine; the oracle mirrors values via regex to dodge the DuckDB json
    extension."""
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.length("props").alias("props_len"),
    )


@query(
    "json_each_q",
    oracle="""
    SELECT event_id, 'k' AS key,
           regexp_extract(props, '"k": ([0-9]+)', 1) AS value
    FROM events
    """,
)
def json_each_q(spark, sf):
    """JSON_EACH: object → (key, value) rows (reference
    src/execute/execute.js:193-242). Implemented generically over any JSON
    object via operators/json_each.py; the flat test payloads make the
    regex oracle exact."""
    ev = t(spark, sf, "events")
    return json_each(ev, "props", id_cols=["event_id"])


@query(
    "struct_access",
    oracle="""
    SELECT c_custkey,
           struct_pack(name := c_name, seg := c_mktsegment).name AS s_name,
           struct_pack(name := c_name, seg := c_mktsegment).seg AS s_seg,
           ['x', c_mktsegment][2] AS arr_second
    FROM customer
    """,
)
def struct_access(spark, sf):
    """Struct construction + dot access + array subscript (reference
    src/expression/evaluate.js:86-95,134-148; Spark subscripts are 0-based,
    DuckDB 1-based — the oracle indexes accordingly)."""
    c = t(spark, sf, "customer")
    st = F.named_struct(
        F.lit("name"), F.col("c_name"), F.lit("seg"), F.col("c_mktsegment")
    )
    arr = F.array(F.lit("x"), F.col("c_mktsegment"))
    return c.select(
        "c_custkey",
        st.getField("name").alias("s_name"),
        st.getField("seg").alias("s_seg"),
        arr[1].alias("arr_second"),
    )
