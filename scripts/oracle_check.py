#!/usr/bin/env python
"""Self-check replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` DuckDB
equivalent on the same sf directory, compare row counts, column sets,
and an order-insensitive value hash (columns sorted by name, rows
sorted, floats rounded the way both sides already round).

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from pandas_dq_spark.session import get_spark

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (datetime.date, datetime.datetime)
            ):
                # Spark returns datetime.date where DuckDB returns a
                # midnight Timestamp — comparable once both are datetimes
                df[c] = pd.to_datetime(df[c])
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


# ---- non-DuckDB oracles for the LSH queries (VERDICT r03 item 4) ----
#
# The driver's gate is DuckDB-only, so m_minhash_near_dups and
# m_simhash_near_dups were `no_oracle`.  These seeded brute-force
# oracles close that: pure-python/numpy reimplementations (independent
# of the Spark operators' vectorized kernels) compute exact Jaccard
# over word-shingle sets and exact Hamming over driver-computed
# xxhash64/bit-plane simhashes, then bound what the LSH output may be.


def _py_word_shingles(text: str, n: int = 3) -> set:
    """Word n-gram shingles, mirroring dedup.word_shingles semantics
    (trim -> split on whitespace runs; < n words -> empty set)."""
    w = (text or "").strip().split()
    if len(w) < n:
        return set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


# Pure-python XXH64 (public algorithm, Yann Collet's xxHash spec) —
# the INDEPENDENT reimplementation of Spark's `xxhash64` expression
# (seed 42 over UTF-8 bytes) that keeps the simhash oracle free of the
# JVM kernel it verifies.  Pinned byte-for-byte against F.xxhash64 in
# tests/test_nonsql_oracles.py.
_XXM = (1 << 64) - 1
_XXP1, _XXP2, _XXP3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
_XXP4, _XXP5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _XXM


def py_xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64(data, seed) as a SIGNED 64-bit int, matching Spark's
    ``xxhash64`` output convention."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _XXM
        v2 = (seed + _XXP2) & _XXM
        v3 = seed & _XXM
        v4 = (seed - _XXP1) & _XXM
        while i + 32 <= n:
            v1 = (_rotl64((v1 + int.from_bytes(data[i : i + 8], "little") * _XXP2) & _XXM, 31) * _XXP1) & _XXM
            v2 = (_rotl64((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _XXP2) & _XXM, 31) * _XXP1) & _XXM
            v3 = (_rotl64((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _XXP2) & _XXM, 31) * _XXP1) & _XXM
            v4 = (_rotl64((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _XXP2) & _XXM, 31) * _XXP1) & _XXM
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _XXM
        for v in (v1, v2, v3, v4):
            h = (((h ^ ((_rotl64((v * _XXP2) & _XXM, 31) * _XXP1) & _XXM)) * _XXP1) + _XXP4) & _XXM
    else:
        h = (seed + _XXP5) & _XXM
    h = (h + n) & _XXM
    while i + 8 <= n:
        k = (_rotl64((int.from_bytes(data[i : i + 8], "little") * _XXP2) & _XXM, 31) * _XXP1) & _XXM
        h = ((_rotl64(h ^ k, 27) * _XXP1) + _XXP4) & _XXM
        i += 8
    if i + 4 <= n:
        h = ((_rotl64(h ^ ((int.from_bytes(data[i : i + 4], "little") * _XXP1) & _XXM), 23) * _XXP2) + _XXP3) & _XXM
        i += 4
    while i < n:
        h = (_rotl64(h ^ ((data[i] * _XXP5) & _XXM), 11) * _XXP1) & _XXM
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _XXM
    h ^= h >> 29
    h = (h * _XXP3) & _XXM
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _py_simhash(text: str) -> int:
    """64-bit SimHash: xxhash64 (pure-python XXH64 above, seed 42) per
    token, +/-1 per bit plane, sign -> bit (acc > 0 sets the bit).
    Tokenize = ASCII-``\\s+`` split with empties dropped, matching the
    JVM-side `split`/`filter` in dedup.simhash_signatures.  Plain-
    python spec the vectorized kernel must agree with bit-for-bit."""
    import re

    toks = [t for t in re.split(r"\s+", text or "", flags=re.ASCII) if t]
    if not toks:
        return 0
    counts = [0] * 64
    for tok in toks:
        h = py_xxhash64(tok.encode("utf-8")) & _XXM
        for b in range(64):
            counts[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if counts[b] > 0:
            sig |= 1 << b
    return sig


def check_minhash_oracle(
    spark, sf_dir: str, threshold: float = 0.6, margin: float = 0.25
) -> dict:
    """MinHash+LSH vs exact shingle Jaccard.

    With 64 hashes, Hoeffding gives P(|match_frac - J| >= margin)
    <= 2*exp(-2*64*margin^2) ~ 7e-4 per pair at margin 0.25, so on a
    fixed seed the flagged set must sit between
    {exists smaller-id pair with J >= threshold+margin}  (must flag)
    and
    {exists smaller-id pair with J >= threshold-margin}  (may flag).
    """
    from collections import defaultdict

    from pandas_dq_spark.operators.dedup import minhash_lsh_duplicates

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    sh = {int(r.doc_id): _py_word_shingles(r.text) for r in docs.itertuples()}

    # exact max-Jaccard vs any smaller id, via a shingle inverted
    # index (pairs sharing no shingle have J = 0 and are skipped)
    inv = defaultdict(list)
    for i in sorted(sh):
        for g in sh[i]:
            inv[g].append(i)
    cand = defaultdict(set)
    for members in inv.values():
        for ai, a in enumerate(members):
            for b in members[ai + 1 :]:
                cand[b].add(a)
    best: dict[int, float] = {}
    for b, aset in cand.items():
        sb = sh[b]
        for a in aset:
            sa = sh[a]
            j = len(sa & sb) / len(sa | sb)
            if j > best.get(b, 0.0):
                best[b] = j

    sdf = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = minhash_lsh_duplicates(sdf, "doc_id", threshold=threshold)
    actual = {int(r["doc_id"]) for r in out.filter("is_near_dup").collect()}

    must = {b for b, j in best.items() if j >= threshold + margin}
    allowed = {b for b, j in best.items() if j >= threshold - margin}
    missing = must - actual
    extra = actual - allowed
    assert not missing, f"minhash missed high-Jaccard dups: {sorted(missing)[:10]}"
    assert not extra, f"minhash flagged low-Jaccard docs: {sorted(extra)[:10]}"
    return {
        "n_docs": len(sh),
        "flagged": len(actual),
        "must_flag": len(must),
        "may_flag": len(allowed),
    }


def check_simhash_oracle(spark, sf_dir: str, max_hamming: int = 3) -> dict:
    """SimHash vs exact Hamming distance on driver-computed hashes.

    bands=4 pigeonholes every pair within hamming <= 3 into a shared
    band, and verification is an exact popcount, so with an uncapped
    bucket size the flagged set must EQUAL
    {b : exists a < b with hamming(h_a, h_b) <= max_hamming};
    with the default cap it must be a subset (star comparisons can
    only miss, never invent)."""
    import numpy as np

    from pandas_dq_spark.operators.dedup import simhash_duplicates

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    ids = docs["doc_id"].astype(int).to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    hs = np.array(
        [_py_simhash(t) for t in docs["text"].to_numpy()[order]],
        dtype=np.uint64,
    )
    n = len(ids)
    x = hs[:, None] ^ hs[None, :]
    pc = np.unpackbits(x.view(np.uint8).reshape(n, n, 8), axis=2).sum(axis=2)
    close = pc <= max_hamming
    expected = {
        int(ids[b]) for a in range(n) for b in range(a + 1, n) if close[a, b]
    }

    sdf = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = simhash_duplicates(
        sdf, "doc_id", max_hamming=max_hamming, max_bucket=10**9
    )
    actual_full = {int(r["doc_id"]) for r in full.filter("is_near_dup").collect()}
    assert actual_full == expected, (
        f"simhash mismatch: missed {sorted(expected - actual_full)[:10]}, "
        f"extra {sorted(actual_full - expected)[:10]}"
    )
    capped = simhash_duplicates(sdf, "doc_id", max_hamming=max_hamming)
    actual_capped = {
        int(r["doc_id"]) for r in capped.filter("is_near_dup").collect()
    }
    assert actual_capped <= expected, "capped simhash invented pairs"
    return {"n_docs": n, "flagged": len(actual_full), "expected": len(expected)}


def check_webtext_oracle(spark, sf_dir: str) -> dict:
    """w_webtext_keep_stats vs a driver-side plain-python
    recomputation of the ENTIRE pipeline: per-doc stats from the
    parity-tested python loop kernel (`loop_scores_frame`, the
    executable spec the Arrow kernel is hypothesis-tested against),
    quality rules re-expressed as plain comparisons, exact dedup as a
    min-url-per-text dict.  Cross-checks the distribution layer —
    Arrow batching, the dedup shuffle/join, the final aggregation —
    end to end; langid/ppl share the spec kernel by design (the
    reference labels for those are frozen goldens, fixture-only)."""
    from pandas_dq_spark.webtext.heuristics import QualityConfig
    from pandas_dq_spark.webtext.udfs import loop_scores_frame

    cfg = QualityConfig(min_words=20)
    docs = (
        pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    texts = docs["text"].fillna("")
    sc = loop_scores_frame(texts, frozenset(cfg.stopwords))
    urls = ["doc://" + str(int(i)).zfill(9) for i in docs["doc_id"]]

    # exact dedup: survivor = lexicographically smallest url per text
    min_url: dict[str, str] = {}
    for u, t in zip(urls, texts):
        if t not in min_url or u < min_url[t]:
            min_url[t] = u

    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])  # lang_pred -> [n, n_keep]
    for i, (u, t) in enumerate(zip(urls, texts)):
        r = sc.iloc[i]
        is_dup = min_url[t] != u
        drop = (
            (r["n_chars"] == 0 or r["n_words"] == 0)
            or (0 < r["n_words"] < cfg.min_words)
            or (r["n_words"] > cfg.max_words)
            or (
                r["n_words"] > 0
                and not (
                    cfg.min_mean_word_len
                    <= r["mean_word_len"]
                    <= cfg.max_mean_word_len
                )
            )
            or (r["symbol_ratio"] > cfg.max_symbol_ratio)
            or (r["n_words"] > 0 and r["stopword_frac"] < cfg.min_stopword_frac)
            or (r["repeated_line_frac"] > cfg.max_repeated_line_frac)
            or (r["ellipsis_line_frac"] > cfg.max_ellipsis_line_frac)
            or (r["non_alpha_word_frac"] > cfg.max_non_alpha_word_frac)
            or (
                r["lang_pred"] != cfg.target_lang
                or r["lang_score"] < cfg.min_lang_score
            )
            or (r["ppl"] > cfg.max_perplexity)
            or is_dup
        )
        a = agg[r["lang_pred"]]
        a[0] += 1
        a[1] += 0 if drop else 1

    import __spark_entry__ as entrymod

    got = {
        r["lang_pred"]: (r["n"], r["n_keep"])
        for r in entrymod.queries()["w_webtext_keep_stats"](spark, sf_dir).collect()
    }
    exp = {k: tuple(v) for k, v in agg.items()}
    assert got == exp, f"webtext keep stats mismatch: got {got}, expected {exp}"
    return {"langs": len(exp), "n_docs": len(urls),
            "n_keep": sum(v[1] for v in exp.values())}


def check_mm_media_oracle(spark, sf_dir: str) -> dict:
    """mm_media_features vs plain numpy on the collected payloads:
    per-kind counts and average byte sizes must match the mapInPandas
    aggregate exactly, and each per-media feature vector must equal
    the numpy byte histogram of its payload."""
    import numpy as np

    from pandas_dq_spark.operators.multimodal import (
        _byte_histogram,
        extract_features,
        media_fixture,
    )

    media = media_fixture(spark, 60)
    rows = media.select("media_id", "kind", "payload").collect()
    from collections import defaultdict

    sizes = defaultdict(list)
    for r in rows:
        sizes[r["kind"]].append(len(bytes(r["payload"] or b"")))
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(feats) == len(rows)
    for r in rows:
        exp = _byte_histogram(bytes(r["payload"] or b""), 32)
        got = np.asarray(feats[r["media_id"]]["features"], dtype=np.float32)
        assert np.allclose(got, exp, atol=1e-7), r["media_id"]

    import __spark_entry__ as entrymod

    out = {
        r["kind"]: (r["n"], r["avg_bytes"])
        for r in entrymod.queries()["mm_media_features"](spark, sf_dir).collect()
    }
    exp_agg = {
        k: (len(v), round(sum(v) / len(v), 4)) for k, v in sizes.items()
    }
    assert out == exp_agg, f"media agg mismatch: got {out}, expected {exp_agg}"
    return {"kinds": len(exp_agg), "n_media": len(rows)}


NONSQL_ORACLES = {
    "m_minhash_near_dups": check_minhash_oracle,
    "m_simhash_near_dups": check_simhash_oracle,
    "w_webtext_keep_stats": check_webtext_oracle,
    "mm_media_features": check_mm_media_oracle,
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle error {ex}")
            n_fail += 1
            continue
        a, b = norm(sdf), norm(odf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
                )
                ok_vals = True
            except AssertionError as ex:
                ok_vals = False
                detail = str(ex).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"pass {name}: {len(a)} rows")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: rows {len(a)}/{len(b)} cols_match={ok_cols} "
                f"vals_match={ok_vals}"
                + (f" [{detail}]" if not ok_vals and ok_rows and ok_cols else "")
            )
            if not ok_cols:
                print(f"  spark cols:  {list(a.columns)}")
                print(f"  oracle cols: {list(b.columns)}")
            n_fail += 1
    for name, check in NONSQL_ORACLES.items():
        if only and name not in only:
            continue
        try:
            stats = check(spark, sf)
            print(f"pass {name} [brute-force oracle]: {stats}")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name} [brute-force oracle]: {ex}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
