"""Reference label generator: the pandas_dq-semantics checks applied to
the pages fixture with plain pandas/python (FIXTURES.md §1: 'reference
keep/drop labels + scrubbed text are produced by running the
pandas_dq-semantics checks over the same rows collected to pandas').

This is the ORACLE the Spark pipeline's keep/drop F1 >= 0.99 target is
measured against (BASELINE.json).  It is written in the reference's
idiom — eager pandas column passes, ``duplicated(keep='first')``,
``isnull``-style emptiness checks — entirely independent of the Spark
expression implementations.
"""

from __future__ import annotations

import pandas as pd

from pandas_dq_spark.webtext.heuristics import QualityConfig
from pandas_dq_spark.webtext.lm import langid_scores, perplexity
from pandas_dq_spark.webtext.scrub import scrub_py


def reference_labels(pdf: pd.DataFrame, cfg: QualityConfig | None = None) -> pd.DataFrame:
    cfg = cfg or QualityConfig()
    df = pdf.copy()
    stop = set(cfg.stopwords)

    def doc_stats(text: str) -> dict:
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
        lang, score = langid_scores(words)
        return {
            "n_chars": n_chars,
            "n_words": n_words,
            "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
            "symbol_ratio": n_sym / n_chars if n_chars else 0.0,
            "stopword_frac": n_stop / n_words if n_words else 0.0,
            "non_alpha_word_frac": n_nonalpha / n_words if n_words else 0.0,
            "repeated_line_frac": (1 - len(set(lines)) / len(lines)) if lines else 0.0,
            "ellipsis_line_frac": n_ellipsis / len(lines) if lines else 0.0,
            "lang_pred": lang,
            "lang_score": score,
            "ppl": perplexity(words),
        }

    stats = pd.DataFrame([doc_stats(t) for t in df["text"]], index=df.index)
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
    out["ref_scrubbed"] = [scrub_py(t or "") for t in df["text"]]
    return out
