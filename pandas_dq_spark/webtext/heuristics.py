"""Gopher/C4-style heuristic statistics as pure Catalyst expressions
(SURVEY.md §2.8 'WT tokenish stats') — the Spark analogue of
pandas_dq's missing-value / outlier / high-cardinality / duplicate
checks, per the north rule.

Everything here is array functions + regex on the JVM: no UDFs, stays
inside whole-stage codegen, and Catalyst prunes the parquet scan to
(url, text) when only these stats are selected.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import EN_STOPWORDS


@dataclass(frozen=True)
class QualityConfig:
    """Fixed rule thresholds (Gopher: Rae et al. 2021 §A1.1; C4:
    Raffel et al. 2020 §2.2 — both public papers)."""

    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_len: float = 3.0
    max_mean_word_len: float = 10.0
    max_symbol_ratio: float = 0.10
    min_stopword_frac: float = 0.06
    max_repeated_line_frac: float = 0.30
    max_ellipsis_line_frac: float = 0.30
    max_non_alpha_word_frac: float = 0.40
    target_lang: str = "en"
    min_lang_score: float = 0.15
    max_perplexity: float = 1500.0
    n_buckets: int = 64
    stopwords: tuple = tuple(EN_STOPWORDS)
    # Gopher's duplicate-n-gram repetition rule — OPT-IN (None = off):
    # the default rule set is pinned by the keep/drop F1 parity suite
    # against the frozen reference labels, so new rules must not fire
    # unless explicitly configured
    max_dup_ngram_frac: float | None = None
    dup_ngram_n: int = 3


_WS = r"\s+"


def words_col(text: Column) -> Column:
    """Whitespace tokens, [] for empty/blank docs (python
    str.split() semantics)."""
    return F.when(
        F.trim(text) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), _WS))


def add_stats(df: DataFrame, cfg: QualityConfig, text_col: str = "text") -> DataFrame:
    """Char- and line-level statistics as Catalyst expressions —
    the STANDALONE variant for callers that want these stats without
    the fused Arrow pass.

    The pipeline itself (webtext.pipeline.quality_filter and the
    streaming adapter) computes the same statistics inside the single
    Arrow UDF pass (webtext.udfs) so the text is scanned exactly once
    for every per-document number; measured at 1M docs the expression
    versions of the token stats cost 66s (CollapseProject re-inlines
    split() into every consumer and array_contains linear-scans the
    stopword list per token) vs ~1s inside the pass already being paid
    for langid.  One semantic nuance: this variant counts symbols with
    the Java regex classes \\p{L}\\p{N}\\s while the kernel uses python
    isalnum()/isspace() (the reference-label semantics); the classes
    agree on all fixture text and differ only on exotica like
    \\u00a0 (java \\s is ASCII-only)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    # regexp_count of the complement class == length of the stripped
    # copy the old regexp_replace built, without allocating that copy
    n_symbols = F.regexp_count(t, F.lit(r"[^\p{L}\p{N}\s]"))
    # '...$' on split('\n') output is exactly endswith (lines carry no
    # newline); endswith is a memcmp, the per-line regex was not
    n_ellipsis_lines = F.size(F.filter(lines, lambda l: l.endswith("...")))
    n_distinct_lines = F.size(F.array_distinct(lines))

    # one select = one analysis pass (vs one per withColumn, r4)
    return df.select(
        "*",
        F.length(t).alias("n_chars"),
        F.when(F.length(t) > 0, n_symbols / F.length(t))
        .otherwise(F.lit(0.0))
        .alias("symbol_ratio"),
        F.when(n_lines > 0, 1.0 - n_distinct_lines / n_lines)
        .otherwise(F.lit(0.0))
        .alias("repeated_line_frac"),
        F.when(n_lines > 0, n_ellipsis_lines / n_lines)
        .otherwise(F.lit(0.0))
        .alias("ellipsis_line_frac"),
    )


# rule -> (predicate builder over the stats columns, severity, detail)
# Names deliberately mirror the pandas_dq check vocabulary
# (missing / outlier / rare category / duplicate / high cardinality).
def rule_exprs(cfg: QualityConfig) -> list[tuple[str, Column, str]]:
    from ..functions.textstats import duplicate_ngram_fraction

    c = F.col
    return [
        (
            "empty_doc",
            (c("n_chars") == 0) | (c("n_words") == 0),
            "Document is empty or whitespace-only (missing-value analogue).",
        ),
        (
            "too_short",
            (c("n_words") > 0) & (c("n_words") < cfg.min_words),
            f"Fewer than {cfg.min_words} words (Gopher min length).",
        ),
        (
            "too_long",
            c("n_words") > cfg.max_words,
            f"More than {cfg.max_words} words (Gopher max length).",
        ),
        (
            "word_length_outlier",
            (c("n_words") > 0)
            & (
                (c("mean_word_len") < cfg.min_mean_word_len)
                | (c("mean_word_len") > cfg.max_mean_word_len)
            ),
            f"Mean word length outside [{cfg.min_mean_word_len}, {cfg.max_mean_word_len}] (outlier analogue).",
        ),
        (
            "symbol_outlier",
            c("symbol_ratio") > cfg.max_symbol_ratio,
            f"Symbol-to-char ratio above {cfg.max_symbol_ratio} (outlier analogue).",
        ),
        (
            "low_stopword",
            (c("n_words") > 0) & (c("stopword_frac") < cfg.min_stopword_frac),
            f"Stopword fraction below {cfg.min_stopword_frac} (Gopher).",
        ),
        (
            "repeated_lines",
            c("repeated_line_frac") > cfg.max_repeated_line_frac,
            f"Repeated-line fraction above {cfg.max_repeated_line_frac} (duplicate analogue).",
        ),
        (
            "ellipsis_lines",
            c("ellipsis_line_frac") > cfg.max_ellipsis_line_frac,
            f"Ellipsis-line fraction above {cfg.max_ellipsis_line_frac} (C4).",
        ),
        (
            "non_alpha_words",
            c("non_alpha_word_frac") > cfg.max_non_alpha_word_frac,
            f"Non-alphabetic word fraction above {cfg.max_non_alpha_word_frac} (Gopher).",
        ),
        (
            "non_target_language",
            (c("lang_pred") != cfg.target_lang)
            | (c("lang_score") < cfg.min_lang_score),
            f"Predicted language is not '{cfg.target_lang}' with sufficient confidence (rare-category analogue).",
        ),
        (
            "high_perplexity",
            c("ppl") > cfg.max_perplexity,
            f"LM perplexity above {cfg.max_perplexity}.",
        ),
        (
            "exact_duplicate",
            c("is_dup"),
            "Exact duplicate of another document (duplicate-row analogue).",
        ),
    ] + (
        [
            (
                "repetitive_ngrams",
                # computed from the raw text (pure array expressions,
                # fuses into the same projection as the other rules)
                duplicate_ngram_fraction(c("text"), cfg.dup_ngram_n)
                > cfg.max_dup_ngram_frac,
                f"Duplicate {cfg.dup_ngram_n}-gram fraction above "
                f"{cfg.max_dup_ngram_frac} (Gopher repetition rule).",
            )
        ]
        if cfg.max_dup_ngram_frac is not None
        else []
    )
