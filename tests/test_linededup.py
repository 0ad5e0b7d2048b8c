"""Corpus-level repeated-line removal (webtext/linededup.py)."""

from __future__ import annotations

from collections import Counter

from pandas_dq_spark.webtext.linededup import (
    frequent_lines,
    remove_repeated_lines,
)

BOILER = "Accept cookies to continue"
FOOTER = "(c) 2024 Example Site"


def _corpus():
    docs = []
    for i in range(10):
        body = [f"unique line {i} alpha", f"unique line {i} beta"]
        lines = [BOILER] + body + ([FOOTER] if i < 6 else [])
        docs.append((f"u{i}", "\n".join(lines)))
    docs.append(("u_blank", ""))
    docs.append(("u_only_boiler", BOILER + "\n" + FOOTER))
    docs.append(("u_none", None))
    return docs


def test_frequent_lines_counts(spark):
    df = spark.createDataFrame(_corpus(), "url string, text string")
    got = {r["line"]: r["n_docs"] for r in
           frequent_lines(df, min_docs=5).collect()}
    assert got == {BOILER: 11, FOOTER: 7}


def test_remove_repeated_lines_python_oracle(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "url string, text string")
    out = {r["url"]: r["clean_text"] for r in
           remove_repeated_lines(df, min_docs=5).collect()}

    # plain-python replay
    doc_lines = {u: (t or "").split("\n") for u, t in docs}
    freq = Counter()
    for ls in doc_lines.values():
        freq.update({l for l in ls if l.strip()})
    frequent = {l for l, c in freq.items() if c >= 5}
    exp = {
        u: "\n".join(l for l in ls if l not in frequent)
        for u, ls in doc_lines.items()
    }
    # blank lines inside text survive (only non-blank lines counted);
    # "" split gives [""] which is not frequent -> survives as ""
    assert out == exp
    assert out["u_only_boiler"] == ""
    assert out["u_none"] == ""
    assert "unique line 3 alpha" in out["u3"]
    assert BOILER not in out["u3"] and FOOTER not in out["u3"]


def test_remove_repeated_lines_reuses_freq(spark):
    df = spark.createDataFrame(_corpus(), "url string, text string")
    freq = frequent_lines(df, min_docs=5).persist()
    try:
        a = remove_repeated_lines(df, min_docs=5)
        b = remove_repeated_lines(df, freq=freq)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    finally:
        freq.unpersist()


def test_remove_repeated_lines_plan_shape(spark):
    df = spark.createDataFrame(_corpus(), "url string, text string")
    out = remove_repeated_lines(df, min_docs=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan          # reconstruction is an agg
    assert "BroadcastHashJoin" in plan   # frequent-line set broadcast
    assert "Expand" not in plan          # doc-frequency via two-level agg
