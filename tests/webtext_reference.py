"""Reference label generator: the pandas_dq-semantics checks applied to
the pages fixture with plain pandas/python (FIXTURES.md §1: 'reference
keep/drop labels + scrubbed text are produced by running the
pandas_dq-semantics checks over the same rows collected to pandas').

This is the ORACLE the Spark pipeline's keep/drop F1 >= 0.99 target is
measured against (BASELINE.json).  The rule logic is written in the
reference's idiom — eager pandas column passes, ``duplicated(
keep='first')`` — independent of the Spark expressions; the langid /
perplexity / scrub expectations come from FROZEN golden files
(tests/golden/, written by scripts/freeze_webtext_golden.py), NOT from
the engine's live functions, so component drift breaks these tests
instead of silently moving the target with it (VERDICT r01 item 2).
"""

from __future__ import annotations

import os

import pandas as pd

from pandas_dq_spark.webtext.heuristics import QualityConfig

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def load_golden(n_docs: int) -> pd.DataFrame:
    path = os.path.join(GOLDEN_DIR, f"webtext_golden_{n_docs}.parquet")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing — generate with "
            f"`python scripts/freeze_webtext_golden.py {n_docs}` "
            "(only when the component behavior change is intentional)"
        )
    return pd.read_parquet(path)


def reference_labels(pdf: pd.DataFrame, cfg: QualityConfig | None = None) -> pd.DataFrame:
    cfg = cfg or QualityConfig()
    df = pdf.copy()
    stop = set(cfg.stopwords)
    golden = load_golden(len(df)).set_index("url")

    def doc_stats(url: str, text: str) -> dict:
        text = text or ""
        words = text.split()
        lines = text.split("\n")
        n_words = len(words)
        n_chars = len(text)
        n_sym = sum(
            1 for ch in text if not (ch.isalnum() or ch.isspace())
        )
        n_stop = sum(1 for w in words if w in stop)
        n_nonalpha = sum(1 for w in words if not any(c.isalpha() for c in w))
        n_ellipsis = sum(1 for l in lines if l.endswith("..."))
        g = golden.loc[url]
        return {
            "n_chars": n_chars,
            "n_words": n_words,
            "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
            "symbol_ratio": n_sym / n_chars if n_chars else 0.0,
            "stopword_frac": n_stop / n_words if n_words else 0.0,
            "non_alpha_word_frac": n_nonalpha / n_words if n_words else 0.0,
            "repeated_line_frac": (1 - len(set(lines)) / len(lines)) if lines else 0.0,
            "ellipsis_line_frac": n_ellipsis / len(lines) if lines else 0.0,
            "lang_pred": g["lang_pred"],
            "lang_score": g["lang_score"],
            "ppl": g["ppl"],
        }

    stats = pd.DataFrame(
        [doc_stats(u, t) for u, t in zip(df["url"], df["text"])], index=df.index
    )
    s = stats

    # duplicate rows, pandas-style: sort by url, keep first occurrence
    order = df.sort_values("url").index
    dup_sorted = df.loc[order, "text"].duplicated(keep="first")
    is_dup = dup_sorted.reindex(df.index)

    drop = (
        (s.n_chars == 0)
        | (s.n_words == 0)
        | ((s.n_words > 0) & (s.n_words < cfg.min_words))
        | (s.n_words > cfg.max_words)
        | (
            (s.n_words > 0)
            & (
                (s.mean_word_len < cfg.min_mean_word_len)
                | (s.mean_word_len > cfg.max_mean_word_len)
            )
        )
        | (s.symbol_ratio > cfg.max_symbol_ratio)
        | ((s.n_words > 0) & (s.stopword_frac < cfg.min_stopword_frac))
        | (s.repeated_line_frac > cfg.max_repeated_line_frac)
        | (s.ellipsis_line_frac > cfg.max_ellipsis_line_frac)
        | (s.non_alpha_word_frac > cfg.max_non_alpha_word_frac)
        | (s.lang_pred != cfg.target_lang)
        | (s.lang_score < cfg.min_lang_score)
        | (s.ppl > cfg.max_perplexity)
        | is_dup
    )
    out = df[["url"]].copy()
    out["ref_keep"] = ~drop
    out["ref_scrubbed"] = golden.loc[df["url"], "ref_scrubbed"].to_numpy()
    return out
