"""Brute-force oracles for the non-SQL-expressible LSH queries
(VERDICT r03 item 4): the driver's DuckDB gate can't express
MinHash/SimHash, so scripts/oracle_check.py carries seeded
pure-python/numpy oracles — exact shingle Jaccard bounds for MinHash,
exact FNV-1a/bit-plane Hamming equality for SimHash — and this test
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


def test_py_simhash_matches_vectorized_udf_spec():
    # the plain-python oracle and the numpy UDF must agree bit-for-bit
    import numpy as np
    import pandas as pd

    from pandas_dq_spark.operators.dedup import simhash_udf

    texts = [
        "",
        "one",
        "the quick brown fox jumps over the lazy dog",
        "unicode tøkens über ångström 你好 世界",
        "repeat repeat repeat repeat",
    ]
    kernel = simhash_udf.func  # unwrap the pandas_udf
    got = kernel(pd.Series(texts)).to_numpy().astype(np.uint64)
    exp = np.array([_py_simhash(t) for t in texts], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_webtext_keep_stats_brute_force_oracle(spark, sf_dir):
    from oracle_check import check_webtext_oracle

    stats = check_webtext_oracle(spark, sf_dir)
    assert stats["n_docs"] > 0
    assert 0 < stats["n_keep"] < stats["n_docs"]  # both branches exercised


def test_mm_media_features_brute_force_oracle(spark, sf_dir):
    from oracle_check import check_mm_media_oracle

    stats = check_mm_media_oracle(spark, sf_dir)
    assert stats["kinds"] == 3 and stats["n_media"] == 60
