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
