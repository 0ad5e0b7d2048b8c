"""Deterministic build-time language models — no downloads, no wall
clock (FIXTURES.md: 'hash-based langid and a bigram perplexity table
trained on the seeded corpus itself').

These models are the stand-ins for fastText language-ID and a
KenLM-style n-gram scorer (BASELINE.json north_star).  They are small
python dicts created deterministically at import time; the pipeline
broadcasts them inside vectorized pandas UDFs.  The interfaces are the
real thing (batched text in -> scores out), so swapping in fastText /
KenLM binaries on a real cluster is a one-function change.
"""

from __future__ import annotations

import math

import numpy as np

# ---- word pools per language (deterministic vocabulary) -------------

EN_STOPWORDS = (
    "the of and to in a is that it was for on are as with his they at be "
    "this have from or had by not word but what some we can out other were "
    "all there when up use your how said an each she which do their time if"
).split()

_EN_CONTENT = (
    "data quality report column missing value table filter spark engine "
    "document text language model pipeline cluster partition shuffle join "
    "aggregate window function query plan optimizer scan parquet schema "
    "check clean duplicate outlier category threshold sample metric result "
    "system process network server storage memory compute batch stream "
    "record field index key hash sort merge group count distinct range"
).split()

_DE_WORDS = (
    "der die das und ist nicht ein eine mit von auf für den dem des im am "
    "zu aus bei nach über unter zwischen wenn aber oder doch nur auch noch "
    "daten qualität bericht spalte fehlend wert tabelle sprache modell "
    "verarbeitung rechner speicher netzwerk system prozess ergebnis anzahl"
).split()

_FR_WORDS = (
    "le la les et est ne pas un une avec de du des dans sur pour par au "
    "aux si mais ou donc car aussi encore données qualité rapport colonne "
    "manquant valeur tableau langue modèle traitement calcul mémoire "
    "réseau système processus résultat nombre requête jointure fenêtre"
).split()


def _zz_words(n: int = 120, seed: int = 7) -> list[str]:
    """Gibberish 'language' — consonant-heavy pseudo-words."""
    rng = np.random.default_rng(seed)
    letters = list("bcdfghjklmnpqrstvwxz")
    return [
        "".join(rng.choice(letters, int(rng.integers(4, 9))))
        for _ in range(n)
    ]


LANG_POOLS: dict[str, list[str]] = {
    "en": EN_STOPWORDS + _EN_CONTENT,
    "de": _DE_WORDS,
    "fr": _FR_WORDS,
    "zz": _zz_words(),
}

# marker sets: words unique to one language (dropping cross-language
# collisions keeps argmax scoring unambiguous)
_all_counts: dict[str, int] = {}
for _pool in LANG_POOLS.values():
    for _w in set(_pool):
        _all_counts[_w] = _all_counts.get(_w, 0) + 1
LANG_MARKERS: dict[str, frozenset] = {
    lang: frozenset(w for w in set(pool) if _all_counts[w] == 1)
    for lang, pool in LANG_POOLS.items()
}


# word -> owning language, single dict for one-pass scoring (markers
# are disjoint by construction, so this loses no information)
MARKER_LANG: dict[str, str] = {}
for _lang in LANG_POOLS:  # insertion order = tie-break order
    for _w in LANG_MARKERS[_lang]:
        MARKER_LANG[_w] = _lang

_LANG_ORDER = list(LANG_POOLS)


def langid_scores(tokens: list[str]) -> tuple[str, float]:
    """(best_lang, score) — score is the marker-hit fraction.

    Returns ("und", 0.0) for empty token lists.  Single pass over the
    tokens with one dict lookup each; argmax tie-break follows
    LANG_POOLS order with strict-greater comparison (first wins)."""
    if not tokens:
        return "und", 0.0
    counts: dict[str, int] = {}
    get = MARKER_LANG.get
    for t in tokens:
        lang = get(t)
        if lang is not None:
            counts[lang] = counts.get(lang, 0) + 1
    best_lang, best = "und", 0
    for lang in _LANG_ORDER:
        hits = counts.get(lang, 0)
        if hits > best:
            best, best_lang = hits, lang
    return best_lang, best / len(tokens)


# ---- bigram LM over the en pool (KenLM stand-in) ---------------------


def _train_bigram_lm(seed: int = 1234, n_sentences: int = 4000):
    """Deterministic training corpus: seeded sentences over the en pool
    with stopwords interleaved (mirrors the fixture generator's prose
    construction so in-domain text scores low perplexity)."""
    rng = np.random.default_rng(seed)
    vocab = LANG_POOLS["en"]
    unigrams: dict[str, int] = {}
    bigrams: dict[tuple[str, str], int] = {}
    for _ in range(n_sentences):
        length = int(rng.integers(6, 18))
        words = []
        for j in range(length):
            if j % 3 == 0:
                words.append(EN_STOPWORDS[int(rng.integers(0, len(EN_STOPWORDS)))])
            else:
                words.append(vocab[int(rng.integers(0, len(vocab)))])
        prev = "<s>"
        for w in words:
            unigrams[w] = unigrams.get(w, 0) + 1
            bigrams[(prev, w)] = bigrams.get((prev, w), 0) + 1
            prev = w
    total = sum(unigrams.values())
    v = len(unigrams) + 1
    return unigrams, bigrams, total, v


UNIGRAMS, BIGRAMS, _TOTAL, _V = _train_bigram_lm()
_CTX_TOTALS: dict[str, int] = {}
for (_a, _b), _c in BIGRAMS.items():
    _CTX_TOTALS[_a] = _CTX_TOTALS.get(_a, 0) + _c

# Precomputed log-probabilities: seen bigram -> log p; per-context
# fallback -> log(1/(ctx_total+V)); global fallback log(1/V).
# math.log is deterministic, so scoring through these tables is
# bit-identical to computing the logs inline per token — just faster.
LOG_BIGRAM: dict[tuple[str, str], float] = {
    (a, b): math.log((c + 1.0) / (_CTX_TOTALS[a] + _V))
    for (a, b), c in BIGRAMS.items()
}
LOG_UNSEEN_CTX: dict[str, float] = {
    a: math.log(1.0 / (t + _V)) for a, t in _CTX_TOTALS.items()
}
LOG_UNSEEN = math.log(1.0 / _V)


def perplexity(tokens: list[str]) -> float:
    """Bigram perplexity with Laplace smoothing; empty -> +inf."""
    if not tokens:
        return float("inf")
    logp = 0.0
    prev = "<s>"
    lb, lu = LOG_BIGRAM, LOG_UNSEEN_CTX
    for w in tokens:
        v = lb.get((prev, w))
        if v is None:
            v = lu.get(prev, LOG_UNSEEN)
        logp += v
        prev = w
    return math.exp(-logp / len(tokens))


# ---- dense tables for the vectorized scoring kernel ------------------
#
# The dict-based scorers above look up log p(w | prev) token by token.
# The vectorized kernel (webtext.udfs) instead maps every word to a
# (row, col) pair and gathers from ONE dense matrix:
#
#   logp(prev, w) = LM_FLAT[row_base(prev) + col(w)]
#
# row_base: known contexts get their own row (filled with the context
# fallback log(1/(ctx_total+V)), seen-bigram cells overridden); any
# word never seen as a context shares the last row, which is LOG_UNSEEN
# everywhere.  col: words never seen as a bigram successor share the
# last column, which every row fills with its own fallback — so the
# gather reproduces exactly the dict logic
#   LOG_BIGRAM.get((prev, w), LOG_UNSEEN_CTX.get(prev, LOG_UNSEEN)).
# Cell values are the identical floats; only the per-document SUM of
# them may differ from the sequential loop in the last ulp (numpy
# pairwise summation) — see webtext.udfs for why that is acceptable.

CTX_ROW: dict[str, int] = {c: i for i, c in enumerate(_CTX_TOTALS)}
NEXT_COL: dict[str, int] = {
    w: j for j, w in enumerate(sorted({b for (_, b) in LOG_BIGRAM}))
}
LM_COLS = len(NEXT_COL) + 1  # +1 unknown-successor column
LM_UNK_COL = len(NEXT_COL)
LM_UNK_ROW_BASE = len(CTX_ROW) * LM_COLS

_M = np.full((len(CTX_ROW) + 1, LM_COLS), LOG_UNSEEN, dtype=np.float64)
for _c, _i in CTX_ROW.items():
    _M[_i, :] = LOG_UNSEEN_CTX[_c]
for (_a, _b), _v in LOG_BIGRAM.items():
    _M[CTX_ROW[_a], NEXT_COL[_b]] = _v
LM_FLAT = np.ascontiguousarray(_M.ravel())
# "<s>" is always a context (every training sentence starts there),
# but guard anyway so an empty LM degrades to LOG_UNSEEN
LM_START_ROW_BASE = CTX_ROW.get("<s>", len(CTX_ROW)) * LM_COLS

# language markers as small ints (0 = not a marker) for bincount-based
# per-document language scoring
LANG_INDEX: dict[str, int] = {l: i for i, l in enumerate(_LANG_ORDER)}
MARKER_ID: dict[str, int] = {
    w: LANG_INDEX[l] + 1 for w, l in MARKER_LANG.items()
}
