"""Dedup suite, similarity search, text stats, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_dq_spark.functions.textstats import (
    fingerprint,
    lang_guess_expr,
    quality_score,
    token_count,
)
from pandas_dq_spark.operators.dedup import (
    dedup_exact,
    embedding_near_duplicates,
    exact_duplicates,
    minhash_lsh_duplicates,
    ngram_jaccard_pairs,
    simhash_duplicates,
)
from pandas_dq_spark.operators.multimodal import (
    extract_features,
    media_fixture,
    sample_frames,
)
from pandas_dq_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    ivf_fit_centroids,
)
from pandas_dq_spark.webtext.lm import EN_STOPWORDS, LANG_POOLS


def _near_dup_corpus(spark, n_base=60, seed=5):
    """Docs 0..n-1 unique; each doc i has a near-dup copy (one word
    changed) at id i+1000 and an exact copy at id i+2000."""
    rng = np.random.default_rng(seed)
    pool = LANG_POOLS["en"]
    rows = []
    for i in range(n_base):
        words = [pool[int(rng.integers(0, len(pool)))] for _ in range(80)]
        text = " ".join(words)
        rows.append((i, text))
        near = words.copy()
        near[5] = "changedword"
        rows.append((i + 1000, " ".join(near)))
        rows.append((i + 2000, text))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(spark):
    df = _near_dup_corpus(spark)
    marked = exact_duplicates(df, "doc_id")
    assert marked.filter("is_dup").count() == 60  # the i+2000 copies
    kept = dedup_exact(df, "doc_id")
    assert kept.count() == 120
    # survivor is the smaller id
    assert kept.filter(F.col("doc_id") >= 2000).count() == 0


def test_minhash_lsh_finds_near_dups(spark):
    df = _near_dup_corpus(spark)
    out = minhash_lsh_duplicates(df, "doc_id", threshold=0.6)
    dup_ids = {r["doc_id"] for r in out.filter("is_near_dup").collect()}
    # every near/exact copy (ids >= 1000) should be flagged
    flagged_copies = {d for d in dup_ids if d >= 1000}
    assert len(flagged_copies) >= 0.95 * 120
    # no false positives among distinct base docs
    assert all(d >= 1000 for d in dup_ids)


def test_simhash_finds_near_dups(spark):
    df = _near_dup_corpus(spark)
    out = simhash_duplicates(df, "doc_id", max_hamming=4)
    dup_ids = {r["doc_id"] for r in out.filter("is_near_dup").collect()}
    assert {d for d in dup_ids if d >= 2000} == set(range(2000, 2060))
    assert sum(1 for d in dup_ids if 1000 <= d < 2000) >= 48  # 1-word edits
    assert all(d >= 1000 for d in dup_ids)


def test_ngram_jaccard_pairs(spark):
    df = _near_dup_corpus(spark, n_base=30)
    pairs = ngram_jaccard_pairs(df, "doc_id", threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact copies must appear with jaccard 1.0
    for i in range(30):
        assert (i, i + 2000) in got
    for r in pairs:
        if r["id_b"] == r["id_a"] + 2000:
            assert r["jaccard"] == pytest.approx(1.0)
    # exhaustive mode (recall exactly 1, the oracle path) must agree
    # with LSH-candidate mode on this fixture (candidates cover all
    # true pairs here), and is a superset guarantee in general
    exh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", threshold=0.5, exhaustive=True
        ).collect()
    }
    assert set(exh) == got
    for r in pairs:
        assert exh[(r["id_a"], r["id_b"])] == pytest.approx(r["jaccard"])


def test_minhash_hot_bucket_bounded(spark):
    # 1500 NEAR-identical docs (unique last word -> distinct signatures,
    # but most bands collide into one bucket) + 40 unrelated docs.
    # With max_bucket=50 the all-pairs join would be ~1500^2/2 pairs;
    # the star path keeps it O(B) and still flags every copy.
    pool = LANG_POOLS["en"]
    body = " ".join(pool[i % len(pool)] for i in range(80))
    rows = [(i, f"{body} unique{i}") for i in range(1500)]
    rng = np.random.default_rng(7)
    for j in range(40):
        words = [pool[int(rng.integers(0, len(pool)))] for _ in range(80)]
        rows.append((10_000 + j, " ".join(words)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = minhash_lsh_duplicates(df, "doc_id", threshold=0.6, max_bucket=50)
    dup_ids = {r["doc_id"] for r in out.filter("is_near_dup").collect()}
    # every non-min member of the hot cluster is flagged (star recall)
    assert len({d for d in dup_ids if d < 1500}) >= 0.99 * 1499
    assert 0 not in dup_ids  # representative survives
    assert all(d < 10_000 for d in dup_ids)  # no false positives


def test_hot_bucket_two_phase_stats(spark):
    # VERDICT r02 item 5 / ADVICE r02: the cap is two-phase (counts
    # first; star machinery only when hot buckets exist) and its
    # engagement is observable via the stats out-param
    pool = LANG_POOLS["en"]
    body = " ".join(pool[i % len(pool)] for i in range(60))
    hot_rows = [(i, f"{body} unique{i}") for i in range(300)]
    rng = np.random.default_rng(3)
    cold_rows = [
        (9000 + j, " ".join(pool[int(rng.integers(0, len(pool)))] for _ in range(60)))
        for j in range(30)
    ]
    df_hot = spark.createDataFrame(
        pd.DataFrame(hot_rows + cold_rows, columns=["doc_id", "text"])
    )
    st = {}
    minhash_lsh_duplicates(df_hot, "doc_id", threshold=0.6, max_bucket=20, stats=st).count()
    assert st["hot_buckets"] > 0
    # no hot buckets -> fast path, stats reports zero
    df_cold = spark.createDataFrame(
        pd.DataFrame(cold_rows, columns=["doc_id", "text"])
    )
    st2 = {}
    out = minhash_lsh_duplicates(
        df_cold, "doc_id", threshold=0.6, max_bucket=20, stats=st2
    )
    assert st2["hot_buckets"] == 0
    assert out.filter("is_near_dup").count() == 0
    # simhash exposes the same visibility hook
    st3 = {}
    simhash_duplicates(df_hot, "doc_id", max_bucket=20, stats=st3).count()
    assert st3["hot_buckets"] > 0


def test_identical_docs_flagged_both_modes(spark):
    # byte-identical doc floods must be fully flagged with bounded
    # work both via the star cap alone (default) and via the opt-in
    # pre-banding collapse (collapse_identical=True)
    rows = [(i, "the exact same document text repeated many times over") for i in range(800)]
    rows += [(5000, "a completely different and unrelated sentence here")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    for collapse in (False, True):
        out = minhash_lsh_duplicates(
            df, "doc_id", threshold=0.9, max_bucket=10, collapse_identical=collapse
        )
        dup_ids = {r["doc_id"] for r in out.filter("is_near_dup").collect()}
        assert dup_ids == set(range(1, 800)), collapse
        out2 = simhash_duplicates(
            df, "doc_id", max_bucket=10, collapse_identical=collapse
        )
        dup2 = {r["doc_id"] for r in out2.filter("is_near_dup").collect()}
        assert dup2 == set(range(1, 800)), collapse


def test_embedding_hot_bucket_star(spark):
    # 600 identical vectors in one hyperplane bucket with a low cap:
    # star comparisons yield exactly rep-vs-member pairs, all cos=1
    pdf = pd.DataFrame(
        {
            "vec_id": range(600),
            "embedding": [[0.5, 0.25, -0.75, 0.1]] * 600,
        }
    )
    df = spark.createDataFrame(pdf)
    pairs = embedding_near_duplicates(
        df, "vec_id", threshold=0.99, max_bucket=100, dim=4
    )
    rows = pairs.collect()
    assert len(rows) == 599
    assert all(r["id_a"] == 0 and r["cos"] == pytest.approx(1.0) for r in rows)


def test_embedding_near_duplicates(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # append jittered copies of the first 20 vectors
    base = emb.limit(20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(1e-4)).alias("embedding"),
        F.col("label"),
    )
    both = emb.unionByName(base)
    pairs = embedding_near_duplicates(both, "vec_id", threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    found = sum(1 for i in range(20) if (i, i + 100000) in got)
    assert found >= 18  # LSH recall on near-identical vectors


def test_cosine_topk_bruteforce_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pdf = emb.toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=float)
    q = X[0]
    sims = X @ q / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-sims, pdf["vec_id"]))[:10]
    exp = [int(v) for _, v in order]
    got = [r["vec_id"] for r in cosine_topk_bruteforce(emb, q, k=10).collect()]
    assert got == exp


def test_cosine_topk_lsh_recall_on_planted_neighbors(spark, sf_dir):
    """Hyperplane LSH is a near-neighbor structure: on uniform random
    vectors (no close neighbors — top-10 cosine is ~0.37 here) recall
    is necessarily near the scanned-fraction baseline, so the honest
    test plants true neighbors and measures their retrieval."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pdf = emb.toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=float)
    q = X[0]
    rng = np.random.default_rng(9)
    planted = [
        (10000 + j, (q + rng.normal(0, 0.02, q.shape)).astype(np.float32).tolist(), 0)
        for j in range(10)
    ]
    both = emb.unionByName(
        spark.createDataFrame(planted, emb.schema)
    ).cache()
    exact = {r["vec_id"] for r in cosine_topk_bruteforce(both, q, k=10).collect()}
    approx = {r["vec_id"] for r in cosine_topk_lsh(both, q, k=10).collect()}
    assert len(exact & approx) / 10 >= 0.8
    both.unpersist()


def test_ann_index_partition_pruned(spark, sf_dir, tmp_path):
    # VERDICT r02 item 6: the indexed probe must (a) return the same
    # rows as the scan-time LSH with identical params, and (b) execute
    # as a PARTITION-pruned scan — the probe predicate appears in the
    # FileScan's PartitionFilters, so non-probed buckets are never read
    from pandas_dq_spark.operators.similarity import (
        cosine_topk_lsh_indexed,
        write_ann_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pdf = emb.toPandas()
    q = np.array(pdf["embedding"].tolist(), dtype=float)[5]
    idx_path = str(tmp_path / "ann_idx")
    meta = write_ann_index(emb, idx_path, planes=8, seed=42)
    assert meta["dim"] == len(q)
    got = cosine_topk_lsh_indexed(spark, idx_path, q, k=10)
    scan_side = {
        r["vec_id"]
        for r in cosine_topk_lsh(emb, q, k=10, planes=8, seed=42).collect()
    }
    assert {r["vec_id"] for r in got.collect()} == scan_side
    plan = got._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert any(
        "PartitionFilters" in l and "bucket" in l.split("PartitionFilters")[1]
        for l in scan_lines
    ), plan


def test_cosine_topk_ivf(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    pdf = emb.toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=float)
    C = ivf_fit_centroids(emb, n_centroids=8, seed=1)
    q = X[3]
    exact = {r["vec_id"] for r in cosine_topk_bruteforce(emb, q, k=10).collect()}
    # n_probe=8 of 8 centroids scans everything -> must equal exact;
    # n_probe=4 is the approximate path
    full = {r["vec_id"] for r in cosine_topk_ivf(emb, q, C, k=10, n_probe=8).collect()}
    assert full == exact
    approx = {r["vec_id"] for r in cosine_topk_ivf(emb, q, C, k=10, n_probe=4).collect()}
    assert len(exact & approx) / 10 >= 0.4


def test_ivf_index_partition_pruned(spark, sf_dir, tmp_path):
    # IVF analogue of the hyperplane index: full-probe == exact, and
    # the probe is a partition filter
    from pandas_dq_spark.operators.similarity import (
        cosine_topk_ivf_indexed,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pdf = emb.toPandas()
    q = np.array(pdf["embedding"].tolist(), dtype=float)[7]
    idx = str(tmp_path / "ivf_idx")
    meta = write_ivf_index(emb, idx, n_centroids=8, seed=1)
    assert len(meta["centroids"]) <= 8
    exact = {r["vec_id"] for r in cosine_topk_bruteforce(emb, q, k=10).collect()}
    full = cosine_topk_ivf_indexed(spark, idx, q, k=10, n_probe=8)
    assert {r["vec_id"] for r in full.collect()} == exact
    plan = full._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert any(
        "PartitionFilters" in l and "cell" in l.split("PartitionFilters")[1]
        for l in scan_lines
    ), plan
    approx = {
        r["vec_id"]
        for r in cosine_topk_ivf_indexed(spark, idx, q, k=10, n_probe=4).collect()
    }
    assert len(exact & approx) / 10 >= 0.4


def test_textstats_expressions(spark):
    pdf = pd.DataFrame(
        {
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "",
                "der hund ist nicht ein katze und der vogel",
            ]
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = sdf.select(
        token_count(F.col("text")).alias("n"),
        lang_guess_expr(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
        quality_score(F.col("text"), EN_STOPWORDS).alias("q"),
    ).collect()
    assert out[0]["n"] == 9
    assert out[0]["lang"] == "en"
    assert out[2]["lang"] == "de"
    # fingerprint is whitespace-normalization invariant
    fp2 = (
        spark.createDataFrame(pd.DataFrame({"text": ["the  quick \n brown fox jumps over the lazy dog"]}))
        .select(fingerprint(F.col("text")).alias("fp"))
        .collect()[0]["fp"]
    )
    assert fp2 == out[0]["fp"]
    assert 0.0 <= out[1]["q"] <= 0.1  # empty doc scores ~0


def test_lang_guess_tie_break_matches_langid(spark):
    # equal marker hits across languages: both implementations must
    # resolve the tie to the EARLIEST pool (ADVICE r01 low)
    import pandas as pd
    from pandas_dq_spark.functions.textstats import lang_guess_expr
    from pandas_dq_spark.webtext.lm import LANG_MARKERS, langid_scores

    en_m = sorted(LANG_MARKERS["en"])[0]
    fr_m = sorted(LANG_MARKERS["fr"])[0]
    zz_m = sorted(LANG_MARKERS["zz"])[0]
    texts = [
        f"{en_m} {fr_m}",        # 1-1 tie -> en (pool order)
        f"{fr_m} {zz_m}",        # 1-1 tie -> fr
        f"{fr_m} {fr_m} {en_m}",  # fr strictly ahead
        "xqzzv bbnn",            # no markers -> und
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [r[0] for r in df.select(lang_guess_expr(F.col("text"))).collect()]
    exp = [langid_scores(t.split())[0] for t in texts]
    assert got == exp == ["en", "fr", "fr", "und"]


def test_multimodal_plumbing(spark):
    media = media_fixture(spark, 60)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows[:5]:
        assert len(r["features"]) == 32
        assert abs(sum(r["features"]) - 1.0) < 1e-5
    frames = sample_frames(media.filter("kind = 'video'"), n_frames=4)
    per_media = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per_media)
    # deterministic across runs
    again = extract_features(media).collect()
    assert [r["features"] for r in again[:5]] == [r["features"] for r in rows[:5]]


def test_bilinear_resize_kernel_analytic():
    # the resample math is REAL (only decode is faked): verify against
    # the analytic half-pixel-center expectation
    from pandas_dq_spark.operators.multimodal import resize_bilinear_np

    grad = np.zeros((1, 2, 3), dtype=np.uint8)
    grad[0, 1, :] = 255
    out = resize_bilinear_np(grad, 4, 1)
    # src_x = (j+0.5)*2/4 - 0.5 = -0.25, 0.25, 0.75, 1.25
    assert out[0, :, 0].tolist() == [0, 64, 191, 255]
    # identity resize returns the original pixels
    img = (np.arange(6 * 4 * 3) % 256).astype(np.uint8).reshape(4, 6, 3)
    assert np.array_equal(resize_bilinear_np(img, 6, 4), img)


def test_audio_feature_kernels_analytic():
    # pure sine at f0: spectral centroid ~ f0, ZCR ~ 2*f0/sr
    sr, f0, n = 16000, 1000.0, 16000
    t = np.arange(n) / sr
    w = np.sin(2 * np.pi * f0 * t)
    mag = np.abs(np.fft.rfft(w))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    sc = (freqs * mag).sum() / mag.sum()
    assert abs(sc - f0) < 1.0
    zcr = float(np.mean(np.signbit(w[1:]) != np.signbit(w[:-1])))
    assert abs(zcr - 2 * f0 / sr) < 1e-3


def test_multimodal_resize_and_audio_stages(spark):
    from pandas_dq_spark.operators.multimodal import (
        audio_features,
        resize_images,
    )

    media = media_fixture(spark, 30)
    imgs = media.filter("kind = 'image'")
    out = resize_images(imgs, 32, 24).collect()
    assert len(out) == imgs.count()
    for r in out:
        assert len(r["payload"]) == 32 * 24 * 3  # raw RGB24 at target size
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 24
    # deterministic
    again = resize_images(imgs, 32, 24).collect()
    assert [r["payload"] for r in again] == [r["payload"] for r in out]
    auds = media.filter("kind = 'audio'")
    feats = audio_features(auds).collect()
    assert len(feats) == auds.count()
    for r in feats:
        assert 0.0 <= r["zero_crossing_rate"] <= 1.0
        assert r["rms"] > 0.0
        assert 0.0 < r["spectral_centroid_hz"] < 8000.0  # below Nyquist
    import pytest as _pytest

    # real mode on payloads that aren't BMP/WAV: the NotImplementedError
    # now names the formats that truly need external libs (r04 item 5)
    with _pytest.raises(Exception, match="BMP and 8-bit PNG"):
        resize_images(imgs, 8, 8, decode_mode="real").collect()
    with _pytest.raises(Exception, match="WAV only"):
        audio_features(auds, decode_mode="real").collect()


def test_multimodal_real_mode_is_explicit_stub(spark):
    media = media_fixture(spark, 3)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        extract_features(media, decode_mode="real").collect()


# ---- real-mode codecs: dependency-free BMP/WAV (VERDICT r04 item 5) --


def test_bmp_codec_roundtrip_and_layout():
    from pandas_dq_spark.operators.codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    # width 5 forces 4-byte row padding (15 bytes -> 16)
    img = rng.integers(0, 256, (7, 5, 3)).astype(np.uint8)
    payload = encode_bmp(img)
    assert payload[:2] == b"BM"
    assert np.array_equal(decode_bmp(payload), img)
    # known 1x1 red pixel, hand-built header (bottom-up BGR)
    one = encode_bmp(np.array([[[255, 0, 0]]], dtype=np.uint8))
    import struct as _struct

    pix_off = _struct.unpack_from("<I", one, 10)[0]
    assert one[pix_off : pix_off + 3] == b"\x00\x00\xff"  # BGR


def test_wav_codec_roundtrip_and_stereo_downmix():
    from pandas_dq_spark.operators.codecs import decode_wav, encode_wav
    import struct as _struct

    sr, n = 8000, 800
    t = np.arange(n) / sr
    w = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    wave, got_sr = decode_wav(encode_wav(w, sr))
    assert got_sr == sr
    assert np.max(np.abs(wave - w)) < 1.0 / 32767  # 16-bit quantization
    # stereo 16-bit: channels averaged to mono
    stereo = np.stack([w, -w], axis=1).ravel()
    pcm = np.clip(np.round(stereo * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = _struct.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16)
    payload = (
        b"RIFF"
        + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    mono, _ = decode_wav(payload)
    assert np.max(np.abs(mono)) < 1.0 / 32767  # w + (-w) ≈ 0


def test_real_mode_resize_roundtrips_bmp(spark):
    from pandas_dq_spark.operators.codecs import decode_bmp, encode_bmp
    from pandas_dq_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_bilinear_np,
        resize_images,
    )

    rng = np.random.default_rng(5)
    rows, imgs = [], {}
    for i in range(6):
        w0, h0 = 8 + 4 * i, 6 + 2 * i
        img = rng.integers(0, 256, (h0, w0, 3)).astype(np.uint8)
        imgs[i] = img
        rows.append((i, "image", bytearray(encode_bmp(img)), (w0, h0, None, None)))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(df, 16, 12, decode_mode="real").collect()}
    assert len(out) == 6
    for i, img in imgs.items():
        got = decode_bmp(bytes(out[i]["payload"]))
        exp = resize_bilinear_np(img, 16, 12)
        assert np.array_equal(got, exp), i
        assert out[i]["meta"]["width"] == 16 and out[i]["meta"]["height"] == 12


def test_real_mode_audio_features_wav_analytic(spark):
    from pandas_dq_spark.operators.codecs import encode_wav
    from pandas_dq_spark.operators.multimodal import MEDIA_SCHEMA, audio_features

    sr, f0, n = 16000, 1000.0, 16000
    t = np.arange(n) / sr
    w = 0.25 * np.sin(2 * np.pi * f0 * t)
    # meta sample_rate deliberately WRONG (real mode must use the
    # file header's rate, not meta)
    rows = [(0, "audio", bytearray(encode_wav(w, sr)), (None, None, 999, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    r = audio_features(df, decode_mode="real").collect()[0]
    assert r["n_samples"] == n
    assert abs(r["rms"] - 0.25 / np.sqrt(2)) < 1e-3
    assert abs(r["spectral_centroid_hz"] - f0) < 2.0
    assert abs(r["zero_crossing_rate"] - 2 * f0 / sr) < 1e-3


def test_real_mode_extract_features_decoded_histogram(spark):
    from pandas_dq_spark.operators.codecs import encode_bmp, encode_wav
    from pandas_dq_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    # all-black image -> every decoded value in bin 0
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    # constant +1.0 waveform -> every sample in the TOP bin
    w = np.ones(100)
    rows = [
        (0, "image", bytearray(encode_bmp(img)), (4, 4, None, None)),
        (1, "audio", bytearray(encode_wav(w, 8000)), (None, None, 8000, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in
             extract_features(df, decode_mode="real").collect()}
    assert feats[0][0] == pytest.approx(1.0)
    assert feats[1][-1] == pytest.approx(1.0)


# ---- cache lifecycle for signature tables (VERDICT r04 item 7) -------


def test_default_path_releases_signature_caches(spark, monkeypatch):
    import pandas_dq_spark.operators.dedup as dd

    df = _near_dup_corpus(spark, n_base=15)
    captured = []
    orig_sig = dd.minhash_signatures

    def capturing(*a, **k):
        sig = orig_sig(*a, **k)
        captured.append(sig)
        return sig

    monkeypatch.setattr(dd, "minhash_signatures", capturing)
    dd.release_dedup_caches()
    before = len(dd._default_handle._tracked)

    out = dd.minhash_lsh_duplicates(df, "doc_id", threshold=0.6)
    # the O(corpus) signature table was unpersisted at call time...
    assert captured and captured[0].is_cached is False
    # ...and only the tiny dup-id residue is tracked for later release
    residue = dd._default_handle._tracked[before:]
    assert len(residue) == 1 and residue[0].is_cached
    assert out.filter("is_near_dup").count() > 0  # result still correct
    assert dd.release_dedup_caches() >= 1
    assert residue[0].is_cached is False

    # ngram: shingle base AND bucket signatures both freed eagerly
    captured.clear()
    pairs = dd.ngram_jaccard_pairs(df, "doc_id", threshold=0.5)
    assert captured and captured[0].is_cached is False
    assert pairs.count() > 0
    dd.release_dedup_caches()


def test_explicit_handle_keeps_then_releases(spark):
    from pandas_dq_spark.operators.dedup import (
        DedupCacheHandle,
        minhash_lsh_duplicates,
        simhash_duplicates,
    )

    df = _near_dup_corpus(spark, n_base=15)
    h = DedupCacheHandle()
    with h:
        out = minhash_lsh_duplicates(df, "doc_id", threshold=0.6, cache=h)
        out2 = simhash_duplicates(df, "doc_id", cache=h)
        tracked = list(h._tracked)
        assert tracked and all(d.is_cached for d in tracked)
        # lazily reusable across actions while the handle is open
        assert out.filter("is_near_dup").count() > 0
        assert out2.filter("is_near_dup").count() > 0
    assert all(not d.is_cached for d in tracked)
    assert h._tracked == []


def test_embedding_multiband_recovers_pair_in_hot_bucket(spark):
    """r5 (VERDICT r04 item 4): a similar pair buried in an OVERSIZED
    band-0 bucket — both members differing from the star
    representative — must still be found via the second independent
    hyperplane band.  Constructed deterministically against the seeded
    planes: the flood shares the pair's band-0 bucket (forcing the
    star cap) but not its band-1 bucket (where all-pairs verification
    runs)."""
    from pandas_dq_spark.operators.similarity import _hyperplanes

    planes, dim, seed = 3, 8, 42
    H0 = _hyperplanes(dim, planes, seed)  # band 0 planes
    H1 = _hyperplanes(dim, planes, seed + 7919)  # band 1 planes

    def bucket(v, H):
        return int(sum(1 << p for p in range(planes) if H[p] @ v > 0))

    rng = np.random.default_rng(123)
    v = rng.standard_normal(dim)
    v /= np.linalg.norm(v)
    w = v + 1e-3 * rng.standard_normal(dim)
    w /= np.linalg.norm(w)
    assert float(v @ w) >= 0.999
    b0, b1 = bucket(v, H0), bucket(v, H1)
    assert bucket(w, H0) == b0 and bucket(w, H1) == b1

    flood = []
    while len(flood) < 40:
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        if (
            bucket(u, H0) == b0
            and bucket(u, H1) != b1
            and abs(float(u @ v)) < 0.9
        ):
            flood.append(u)

    # flood ids 0..39 -> the band-0 star representative is id 0, and
    # the planted pair (ids 100, 101) differs from it
    rows = [(i, [float(x) for x in u]) for i, u in enumerate(flood)]
    rows += [(100, [float(x) for x in v]), (101, [float(x) for x in w])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # bands=1 reproduces the r4 caveat: the star comparison inside the
    # hot bucket only verifies rep-vs-member, so the pair is missed
    miss = embedding_near_duplicates(
        df, "vec_id", threshold=0.99, planes=planes, bands=1, seed=seed,
        dim=dim, max_bucket=20,
    )
    assert (100, 101) not in {(r["id_a"], r["id_b"]) for r in miss.collect()}

    # bands=2 (the default) recovers it through band 1's small bucket
    st = {}
    found = embedding_near_duplicates(
        df, "vec_id", threshold=0.99, planes=planes, bands=2, seed=seed,
        dim=dim, max_bucket=20, stats=st,
    )
    got = {(r["id_a"], r["id_b"]) for r in found.collect()}
    assert (100, 101) in got
    assert st.get("hot_buckets", 0) >= 1  # the cap really engaged


def test_real_mode_accepts_png(spark):
    """r5: decode_mode='real' handles 8-bit PNG end-to-end — features
    histogram decoded pixels, resize re-encodes in the PNG container."""
    from pandas_dq_spark.operators.codecs import decode_png, encode_png
    from pandas_dq_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_bilinear_np,
        resize_images,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (6, 8, 3)).astype(np.uint8)
    black = np.zeros((4, 4, 4), dtype=np.uint8)  # RGBA, all bin 0
    rows = [
        (0, "image", bytearray(encode_png(img, filter_type=2)), (8, 6, None, None)),
        (1, "image", bytearray(encode_png(black)), (4, 4, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r["media_id"]: r["features"] for r in
             extract_features(df, decode_mode="real").collect()}
    assert feats[1][0] == pytest.approx(1.0)
    exp_hist = np.histogram(
        img.ravel() / 255.0, bins=32, range=(0.0, 1.0 + 1e-9)
    )[0] / img.size
    assert np.allclose(np.asarray(feats[0]), exp_hist, atol=1e-7)

    out = {r["media_id"]: r for r in
           resize_images(df, 4, 3, decode_mode="real").collect()}
    got = decode_png(bytes(out[0]["payload"]))
    assert np.array_equal(got, resize_bilinear_np(img, 4, 3))
    # RGBA input comes back as RGB PNG (alpha dropped pre-resize)
    assert decode_png(bytes(out[1]["payload"])).shape == (3, 4, 3)


def test_near_dedup_end_to_end_clusters(spark):
    """r5: LSH pairs -> connected components -> min-id survivors.
    On the fixture (base i, near-copy i+1000, exact copy i+2000) every
    cluster resolves to the base doc: exact copies always drop, and
    whenever the near-copy is flagged it drops into the SAME component
    as the exact copy (transitive closure over the pair graph)."""
    from pandas_dq_spark.operators.dedup import near_dedup, release_dedup_caches

    df = _near_dup_corpus(spark)
    deduped, clusters = near_dedup(df, "doc_id", threshold=0.7)
    kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    comp = {r["doc_id"]: r["component"] for r in clusters.collect()}
    release_dedup_caches()

    assert set(range(60)) <= kept           # every base doc survives
    assert not kept & set(range(2000, 2060))  # exact copies all drop
    assert len({d for d in range(1000, 1060) if d not in kept}) >= 48
    # exact copies cluster to their base, transitively with the near
    # copy when it was flagged
    for i in range(60):
        assert comp.get(i + 2000) == i
        if i + 1000 in comp:
            assert comp[i + 1000] == i
    # survivors == docs whose component is themselves or unclustered
    all_ids = {*range(60), *range(1000, 1060), *range(2000, 2060)}
    assert kept == {d for d in all_ids if comp.get(d, d) == d}


def test_return_pairs_matches_marking(spark):
    """The pair surface and the marking surface agree: id_b of every
    verified pair == the is_near_dup flag set (one-pass min-id)."""
    from pandas_dq_spark.operators.dedup import (
        minhash_lsh_duplicates,
        release_dedup_caches,
        simhash_duplicates,
    )

    df = _near_dup_corpus(spark, n_base=30)
    for fn, kw in ((minhash_lsh_duplicates, {"threshold": 0.7}),
                   (simhash_duplicates, {"max_hamming": 4})):
        pairs = fn(df, "doc_id", return_pairs=True, **kw)
        prows = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert all(a < b for a, b in prows)
        flagged = {
            r["doc_id"]
            for r in fn(df, "doc_id", **kw).filter("is_near_dup").collect()
        }
        assert {b for _a, b in prows} == flagged
        release_dedup_caches()


def test_decontamination_flags_ngram_overlap(spark):
    """r5: docs sharing any 8-gram with the eval set are flagged;
    short docs and non-overlapping docs are not.  Python replay
    oracle over the same shingle definition."""
    from pandas_dq_spark.operators.dedup import decontaminate, mark_contaminated

    eval_rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "one two three four five six seven"),  # 7 words -> no 8-gram
    ]
    docs = [
        # contains eval 8-gram "alpha..theta" inside a longer doc
        (10, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"),
        # same words but one changed inside every window
        (11, "prefix words alpha beta gamma delta CHANGED zeta eta theta suffix"),
        # exact copy of the short eval doc: no 8-gram exists
        (12, "one two three four five six seven"),
        (13, "completely unrelated text " * 5),
        (14, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "eval_id long, text string")

    marked = mark_contaminated(df, ev, "doc_id")
    got = {r["doc_id"]: r["is_contaminated"] for r in marked.collect()}
    assert got == {10: True, 11: False, 12: False, 13: False, 14: False}

    plan = marked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # eval shingles broadcast

    clean = decontaminate(df, ev, "doc_id")
    assert {r["doc_id"] for r in clean.collect()} == {11, 12, 13, 14}


def test_decontamination_empty_eval_set(spark):
    from pandas_dq_spark.operators.dedup import mark_contaminated

    df = spark.createDataFrame(
        [(0, "some training document with plenty of words in it today")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([], "eval_id long, text string")
    got = mark_contaminated(df, ev, "doc_id").collect()
    assert [r["is_contaminated"] for r in got] == [False]
