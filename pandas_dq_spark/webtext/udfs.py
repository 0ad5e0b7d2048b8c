"""Vectorized pandas UDFs: language-ID + perplexity (the fastText /
KenLM stand-ins, BASELINE.json north_star).

These are the ONLY Python-on-executor stages in the whole pipeline
(input_hint: 'vectorized pandas/Arrow UDFs (no per-row Python)').
Both take one Arrow batch of text and return whole columns; the model
dicts are module-level constants shipped once per worker via the
closure, not per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lm import LANG_MARKERS, langid_scores, perplexity

_LANGID_SCHEMA = T.StructType(
    [
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_score", T.DoubleType()),
    ]
)


@F.pandas_udf(_LANGID_SCHEMA)
def langid_udf(texts: pd.Series) -> pd.DataFrame:
    preds, scores = [], []
    for t in texts:
        tokens = (t or "").split()
        lang, score = langid_scores(tokens)
        preds.append(lang)
        scores.append(score)
    return pd.DataFrame({"lang_pred": preds, "lang_score": scores})


@F.pandas_udf(T.DoubleType())
def perplexity_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([perplexity((t or "").split()) for t in texts])


# ---- fused token-stats + scores UDF (the pipeline's hot path) --------
#
# Measured at 1M docs / local[32]: token-level stats as Catalyst array
# expressions cost 66s — CollapseProject inlines split() into every
# consumer and array_contains linear-scans the stopword literal per
# token — while this single Arrow pass costs ~4s.  "UDFs are the slow
# path" loses to O(tokens x stopwords) JVM scans here, and langid+ppl
# already require the Python pass, so the marginal cost of the extra
# counters is near zero.

TEXT_SCORES_SCHEMA = T.StructType(
    [
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_score", T.DoubleType()),
        T.StructField("ppl", T.DoubleType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("mean_word_len", T.DoubleType()),
        T.StructField("stopword_frac", T.DoubleType()),
        T.StructField("non_alpha_word_frac", T.DoubleType()),
    ]
)

def make_text_scores_udf(stopwords: tuple, row_counter=None):
    """``row_counter`` (an optional Spark accumulator) counts rows the
    UDF actually processes — the pipeline tests use it to assert the
    Arrow pass runs exactly ONCE per row per run (no double compute)."""
    import math

    from .lm import LOG_BIGRAM, LOG_UNSEEN, LOG_UNSEEN_CTX, MARKER_LANG, _LANG_ORDER

    stop_set = frozenset(stopwords)
    # per-word memo (scoped to this UDF's stopword set): word ->
    # (len, is_stop_int, nonalpha_int, marker_lang_or_None); web text
    # repeats words heavily so this amortizes per-char isalpha()
    memo: dict[str, tuple] = {}

    def _word_props(w: str) -> tuple:
        p = (
            len(w),
            1 if w in stop_set else 0,
            0 if any(c.isalpha() for c in w) else 1,
            MARKER_LANG.get(w),
        )
        if len(memo) < 2_000_000:
            memo[w] = p
        return p

    @F.pandas_udf(TEXT_SCORES_SCHEMA)
    def text_scores_udf(texts: pd.Series) -> pd.DataFrame:
        # ONE fused per-token loop (token stats + langid counts +
        # precomputed-log perplexity): produces bit-identical numbers
        # to lm.langid_scores/lm.perplexity, ~3x fewer python ops
        if row_counter is not None:
            row_counter.add(len(texts))
        out = {f.name: [] for f in TEXT_SCORES_SCHEMA.fields}
        memo_get = memo.get
        lb_get, lu_get = LOG_BIGRAM.get, LOG_UNSEEN_CTX.get
        for t in texts:
            toks = (t or "").split()
            n = len(toks)
            if n == 0:
                out["lang_pred"].append("und")
                out["lang_score"].append(0.0)
                out["ppl"].append(float("inf"))
                out["n_words"].append(0)
                out["mean_word_len"].append(0.0)
                out["stopword_frac"].append(0.0)
                out["non_alpha_word_frac"].append(0.0)
                continue
            sum_len = n_stop = n_nonalpha = 0
            lang_counts: dict[str, int] = {}
            logp = 0.0
            prev = "<s>"
            for w in toks:
                p = memo_get(w)
                if p is None:
                    p = _word_props(w)
                sum_len += p[0]
                n_stop += p[1]
                n_nonalpha += p[2]
                ml = p[3]
                if ml is not None:
                    lang_counts[ml] = lang_counts.get(ml, 0) + 1
                v = lb_get((prev, w))
                if v is None:
                    v = lu_get(prev, LOG_UNSEEN)
                logp += v
                prev = w
            best_lang, best = "und", 0
            for lang in _LANG_ORDER:
                hits = lang_counts.get(lang, 0)
                if hits > best:
                    best, best_lang = hits, lang
            out["lang_pred"].append(best_lang)
            out["lang_score"].append(best / n)
            out["ppl"].append(math.exp(-logp / n))
            out["n_words"].append(n)
            out["mean_word_len"].append(sum_len / n)
            out["stopword_frac"].append(n_stop / n)
            out["non_alpha_word_frac"].append(n_nonalpha / n)
        return pd.DataFrame(out)

    return text_scores_udf
