"""UDTF registration + file-format table sources (csv/jsonl) through the
executeSql façade."""

import json

from squirreling_spark.engine import execute_sql
from squirreling_spark.functions.registry import register_udtf


def test_udtf_in_from_clause(spark):
    class SplitWords:
        def eval(self, text: str, sep: str):
            for i, w in enumerate(text.split(sep)):
                yield (i, w)

    register_udtf(spark, "split_words", SplitWords, "pos INT, word STRING")
    rows = spark.sql(
        "SELECT pos, word FROM split_words('a-b-c', '-') ORDER BY pos"
    ).collect()
    assert [(r["pos"], r["word"]) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]


def test_udtf_lateral_join(spark):
    class SplitWords2:
        def eval(self, text: str):
            for w in text.split(" "):
                yield (w,)

    register_udtf(spark, "split_ws", SplitWords2, "word STRING")
    res = execute_sql(
        spark,
        """
        SELECT t.id, s.word
        FROM phrases t, LATERAL split_ws(t.phrase) s
        ORDER BY t.id, s.word
        """,
        tables={"phrases": [{"id": 1, "phrase": "x y"}, {"id": 2, "phrase": "z"}]},
    )
    assert [(r["id"], r["word"]) for r in res.collect()] == [
        (1, "x"), (1, "y"), (2, "z"),
    ]


def test_csv_table_source(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    res = execute_sql(
        spark,
        "SELECT count(*) AS n, max(b) AS mb FROM csvt",
        tables={"csvt": str(p)},
    )
    assert res.collect() == [{"n": 2, "mb": "y"}]


def test_jsonl_table_source(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(json.dumps({"a": i, "b": f"v{i}"}) for i in range(3)))
    res = execute_sql(
        spark,
        "SELECT sum(a) AS s FROM jt",
        tables={"jt": str(p)},
    )
    assert res.collect() == [{"s": 3}]
