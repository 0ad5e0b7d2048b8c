"""Brute-force oracles for the non-SQL-expressible LSH queries
(VERDICT r03 item 4): the driver's DuckDB gate can't express
MinHash/SimHash, so scripts/oracle_check.py carries seeded
pure-python/numpy oracles — exact shingle Jaccard bounds for MinHash,
exact XXH64/bit-plane Hamming equality for SimHash — and this test
asserts them at both the unit SF and the driver's sf0.01 gate scale.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

from oracle_check import (  # noqa: E402
    _py_simhash,
    check_minhash_oracle,
    check_simhash_oracle,
)

SF001 = "/root/testdata/sf0.01"


def test_minhash_brute_force_oracle(spark, sf_dir):
    stats = check_minhash_oracle(spark, sf_dir)
    assert stats["n_docs"] > 0
    # the synthetic documents table plants near-dup clusters — the
    # oracle must actually exercise the flagged path, not pass vacuously
    assert stats["must_flag"] > 0
    assert stats["flagged"] >= stats["must_flag"]


def test_simhash_brute_force_oracle(spark, sf_dir):
    stats = check_simhash_oracle(spark, sf_dir)
    assert stats["n_docs"] > 0
    assert stats["expected"] > 0  # non-vacuous
    assert stats["flagged"] == stats["expected"]


@pytest.mark.skipif(not os.path.isdir(SF001), reason="sf0.01 data absent")
def test_lsh_oracles_at_driver_gate_scale(spark):
    m = check_minhash_oracle(spark, SF001)
    s = check_simhash_oracle(spark, SF001)
    assert m["must_flag"] > 0 and s["expected"] > 0


TEXTS = [
    "",
    "one",
    "the quick brown fox jumps over the lazy dog",
    "unicode tøkens über ångström 你好 世界",
    "repeat repeat repeat repeat",
    "  leading and trailing\twhitespace  \n mixed ",
    "a-token-longer-than-thirty-two-bytes-to-hit-the-xxh64-stripe-loop",
]


def test_py_xxhash64_matches_spark(spark):
    """The oracle's pure-python XXH64 must equal Spark's `xxhash64`
    expression byte-for-byte — this is what keeps the simhash oracle
    independent of the JVM kernel it verifies."""
    from oracle_check import py_xxhash64
    from pyspark.sql import functions as F

    words = sorted({w for t in TEXTS for w in t.split()} | {"", "abc", "1234567"})
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for w in words:
        assert got[w] == py_xxhash64(w.encode("utf-8")), repr(w)


def test_py_simhash_matches_vectorized_kernel(spark):
    """The plain-python oracle spec and the JVM-hash + numpy bit-plane
    kernel (r5: zero Python-rate work) must agree bit-for-bit —
    end-to-end through tokenization, hashing, and sign accumulation."""
    from pandas_dq_spark.operators.dedup import simhash_signatures

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    mask = (1 << 64) - 1
    got = {
        r["id"]: r["sh"] & mask
        for r in simhash_signatures(df, "doc_id").collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == (_py_simhash(t) & mask), repr(t)


def test_webtext_keep_stats_brute_force_oracle(spark, sf_dir):
    from oracle_check import check_webtext_oracle

    stats = check_webtext_oracle(spark, sf_dir)
    assert stats["n_docs"] > 0
    assert 0 < stats["n_keep"] < stats["n_docs"]  # both branches exercised


def test_mm_media_features_brute_force_oracle(spark, sf_dir):
    from oracle_check import check_mm_media_oracle

    stats = check_mm_media_oracle(spark, sf_dir)
    assert stats["kinds"] == 3 and stats["n_media"] == 60
