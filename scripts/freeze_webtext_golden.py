"""Freeze the webtext component goldens (langid / perplexity / scrub).

Runs the driver-side python implementations ONCE over the standard
pages fixture and writes the results to tests/golden/ as parquet.
The golden file — not the live functions — is what the keep/drop F1
and byte-identity tests compare against, so any behavioral drift in
``webtext.lm.langid_scores`` / ``perplexity`` / ``scrub.scrub_py``
breaks the tests instead of silently shifting the expectations with
them (VERDICT r01: the F1=1.00 was self-referential).

Usage: python scripts/freeze_webtext_golden.py [n_docs ...]
Regenerate ONLY when a component's behavior change is intentional,
and say so in the commit message.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_dq_spark.webtext.fixtures import pages_pdf
from pandas_dq_spark.webtext.lm import langid_scores, perplexity
from pandas_dq_spark.webtext.scrub import scrub_py

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
)


def freeze(n_docs: int) -> str:
    pdf = pages_pdf(n_docs)
    rows = []
    for url, text in zip(pdf["url"], pdf["text"]):
        words = (text or "").split()
        lang, score = langid_scores(words)
        rows.append(
            {
                "url": url,
                "lang_pred": lang,
                "lang_score": score,
                "ppl": perplexity(words),
                "ref_scrubbed": scrub_py(text or ""),
            }
        )
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"webtext_golden_{n_docs}.parquet")
    pd.DataFrame(rows).to_parquet(path, index=False)
    print(f"wrote {path} ({len(rows)} rows)")
    return path


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1200]
    for n in sizes:
        freeze(n)
