"""Text primitive parity: the Catalyst expressions, the DuckDB SQL mirrors
and the Python reference (models.stub.rolling_hash) must agree exactly —
they are the shared vocabulary of every oracle-checked query."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fastembed_rs_spark.functions.text import (
    char_shingles,
    doc_fingerprint,
    duck_doc_fingerprint,
    duck_token_hash,
    duck_tokens,
    token_hash,
    tokens,
)
from fastembed_rs_spark.models.stub import rolling_hash

SAMPLES = [
    "Hello, World!",
    "the quick brown fox jumps over the lazy dog",
    "",
    "    ",
    "ALL CAPS 123 mixed-case_under",
    "punctuation!!! ... ???",
    "a",
    "répétition unicode's edge",  # non-ASCII chars split tokens
]


def _spark_vals(spark, col, samples=SAMPLES):
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    return [r[0] for r in df.select(col).collect()]


def _duck_vals(sql_expr, samples=SAMPLES):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in samples])
    return [r[0] for r in con.execute(f"SELECT {sql_expr} FROM t").fetchall()]


def test_tokens_spark_vs_duckdb(spark):
    assert _spark_vals(spark, tokens("s")) == _duck_vals(duck_tokens("s"))


def test_token_hash_three_way(spark):
    toks = ["hello", "a", "z9", "longertoken123", ""]
    spark_h = _spark_vals(spark, token_hash("s"), toks)
    duck_h = _duck_vals(duck_token_hash("s"), toks)
    py_h = [rolling_hash(t) for t in toks]
    assert spark_h == duck_h == py_h


def test_doc_fingerprint_spark_vs_duckdb(spark):
    assert _spark_vals(spark, doc_fingerprint("s")) == _duck_vals(duck_doc_fingerprint("s"))


def test_doc_fingerprint_whitespace_insensitive(spark):
    pairs = [("a b c", "a   b\tc"), ("Hello, world", "hello WORLD?")]
    flat = [s for p in pairs for s in p]
    vals = _spark_vals(spark, doc_fingerprint("s"), flat)
    for i in range(0, len(vals), 2):
        assert vals[i] == vals[i + 1]


def test_char_shingles_edges(spark):
    vals = _spark_vals(spark, char_shingles("s", 3), ["abcd", "abc", "ab", ""])
    assert vals[0] == ["abc", "bcd"]
    assert vals[1] == ["abc"]
    assert vals[2] == []
    assert vals[3] == []


@pytest.mark.parametrize("s,expected", [
    ("Hello, World!", ["hello", "world"]),
    ("", []),
    ("123-456", ["123", "456"]),
])
def test_tokens_examples(spark, s, expected):
    assert _spark_vals(spark, tokens("s"), [s]) == [expected]


def test_qwen3_query_formatting(spark):
    from fastembed_rs_spark.functions.text import (
        QWEN3_DEFAULT_TASK,
        format_qwen3_query,
        qwen3_query,
    )

    # exact string from tests/qwen3.rs:70-73 — note NO space after "Query:"
    assert format_qwen3_query("Explain gravity") == (
        "Instruct: Given a web search query, retrieve relevant passages "
        "that answer the query\nQuery:Explain gravity"
    )
    assert format_qwen3_query("x", task="T") == "Instruct: T\nQuery:x"
    row = (
        spark.createDataFrame([("Explain gravity",)], ["q"])
        .select(qwen3_query("q").alias("f"))
        .collect()[0]
    )
    assert row["f"] == format_qwen3_query("Explain gravity", QWEN3_DEFAULT_TASK)
