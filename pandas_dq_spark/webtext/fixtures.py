"""Deterministic Common-Crawl-style pages generator (FIXTURES.md §1).

Schema matches BASELINE.json input_hint exactly:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

The text mixture is engineered to trip every quality rule: empty docs
(missing-value analogue), symbol-heavy docs (outlier analogue), exact
duplicates and repeated-line docs (duplicate analogue), low-stopword
docs, short docs, non-target-language docs, PII patterns and toxicity
words for the scrub.  Hosts are Zipf-skewed over ~50 hosts to exercise
salted-partition skew handling.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from .lm import EN_STOPWORDS, LANG_POOLS

TOX_WORDS = ["frakking", "gorram", "smegging"]  # fictional lexicon


def _prose(rng, pool, n_words, stop_every=3, line_words=12):
    words = []
    for j in range(n_words):
        if j % stop_every == 0 and pool is LANG_POOLS["en"]:
            words.append(EN_STOPWORDS[int(rng.integers(0, len(EN_STOPWORDS)))])
        else:
            words.append(pool[int(rng.integers(0, len(pool)))])
    lines = [
        " ".join(words[i : i + line_words]) for i in range(0, len(words), line_words)
    ]
    return "\n".join(lines)


def pages_pdf(n: int = 2000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    hosts = [f"site{i:02d}.example" for i in range(50)]
    # Zipf-skew: host 0 gets a large share
    host_p = 1.0 / np.arange(1, 51) ** 1.2
    host_p /= host_p.sum()

    rows = []
    texts_so_far: list[str] = []
    base_ts = dt.datetime(2024, 1, 1)
    for i in range(n):
        host = hosts[int(rng.choice(50, p=host_p))]
        url = f"https://{host}/p/{i:07d}"
        ts = base_ts + dt.timedelta(minutes=int(rng.integers(0, 60 * 24 * 500)))
        kind = rng.random()
        lang = "en"
        if kind < 0.04:  # empty / whitespace
            text = "" if rng.random() < 0.5 else "   \n  "
        elif kind < 0.08:  # very short
            text = _prose(rng, LANG_POOLS["en"], int(rng.integers(3, 30)))
        elif kind < 0.12:  # symbol-heavy
            base = _prose(rng, LANG_POOLS["en"], 80)
            junk = "".join(rng.choice(list("#$%^&*{}[]<>|\\~`@!?"), 200))
            text = base + " " + junk
        elif kind < 0.16:  # low stopword fraction (content words only)
            content = [w for w in LANG_POOLS["en"] if w not in EN_STOPWORDS]
            text = _prose(rng, content, 120, stop_every=10**9)
        elif kind < 0.20:  # repeated lines
            line = " ".join(
                LANG_POOLS["en"][int(rng.integers(0, len(LANG_POOLS["en"])))]
                for _ in range(10)
            )
            text = "\n".join([line] * 15 + [_prose(rng, LANG_POOLS["en"], 30)])
        elif kind < 0.25 and texts_so_far:  # exact duplicate
            text = texts_so_far[int(rng.integers(0, len(texts_so_far)))]
        elif kind < 0.30:  # german
            lang = "de"
            text = _prose(rng, LANG_POOLS["de"], int(rng.integers(80, 200)))
        elif kind < 0.35:  # french
            lang = "fr"
            text = _prose(rng, LANG_POOLS["fr"], int(rng.integers(80, 200)))
        elif kind < 0.38:  # gibberish
            lang = "zz"
            text = _prose(rng, LANG_POOLS["zz"], int(rng.integers(80, 200)))
        else:  # normal english prose
            text = _prose(rng, LANG_POOLS["en"], int(rng.integers(60, 300)))

        # PII injection (~10%)
        if rng.random() < 0.10 and text.strip():
            pii = rng.random()
            if pii < 0.3:
                text += f"\ncontact me at user{i}@mail-example.com for details"
            elif pii < 0.55:
                text += f"\ncall 555-{int(rng.integers(100, 999))}-{int(rng.integers(1000, 9999))} now"
            elif pii < 0.8:
                text += f"\nssn {int(rng.integers(100, 999))}-{int(rng.integers(10, 99))}-{int(rng.integers(1000, 9999))}"
            else:
                text += f"\nserver at {int(rng.integers(1, 255))}.{int(rng.integers(0, 255))}.{int(rng.integers(0, 255))}.{int(rng.integers(1, 255))}"
        # toxicity (~4%)
        if rng.random() < 0.04 and text.strip():
            text += f"\nthis is {TOX_WORDS[int(rng.integers(0, len(TOX_WORDS)))]} terrible"

        texts_so_far.append(text)
        html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        rows.append((url, ts, html, text, lang))

    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark, n: int = 2000, seed: int = 42):
    return spark.createDataFrame(pages_pdf(n, seed), schema=PAGES_SCHEMA)
