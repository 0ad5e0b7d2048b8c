"""Semantic column classifier — Spark port of ``classify_columns``
(pandas_dq.py:1364-1625).

The reference makes per-column pandas passes (``value_counts`` loops,
``map(len)`` scans, ``pd.to_datetime`` probes).  Here all statistics
come from ONE fused aggregation (:func:`plans.profile.profile`); the
decision cascade itself is driver-side Python over the collected
ProfileState — O(n_columns), no extra jobs.

Faithful quirks reproduced (with reference line numbers):
- string stats are computed after ``fillna('  ')`` (1428): missing
  values count as length-2 strings and as one extra distinct value.
- int columns whose min/max fall inside [1900, 2050] are classified as
  date vars because ``pd.to_datetime`` accepts any integer (1470-1493).
- float64 columns with 3..15 distinct values are first marked
  categorical (float_limit, 1511-1523) and then moved back to
  continuous by the ``dtype == float`` fixup (1528-1541/1546-1560);
  only float32 columns can end up categorical.
- mixed-dtype detection (1391-1394) cannot fire on a Spark DataFrame
  (columns are single-typed); the engine-mode analogue (values parsing
  into >1 class) lives in :mod:`operators.mixed_types`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.profile import ProfileState, profile

CAT_LIMIT = 35  # pandas_dq.py:1380
FLOAT_LIMIT = 15  # pandas_dq.py:1381
NLP_MAX_CHAR = 30  # pandas_dq.py:1377 (max_nlp_char_size)

ROLE_KEYS = [
    "cols_delete",
    "string_bool_vars",
    "num_bool_vars",
    "nlp_vars",
    "discrete_string_vars",
    "factor_vars",
    "int_vars",
    "date_vars",
    "id_vars",
    "cat_vars",
    "continuous_vars",
]


def _all_unique(cp, n: int, extra: int = 0) -> bool:
    """distinct(+extra) == n — the all-unique/ID condition.  Exact
    equality in parity mode; in engine mode ``n_distinct`` is an HLL
    estimate (rsd 0.01), so equality is widened to the 2-sigma band
    (same convention as ``ColumnProfile.is_id_like``)."""
    nvc = cp.n_distinct + extra
    if cp.exact:
        return nvc == n
    return n > 0 and nvc >= int(0.98 * n)


def classify_from_profile(state: ProfileState) -> dict[str, list[str]]:
    n = state.n_rows
    cols = list(state.columns)
    p = state.columns

    out: dict[str, list[str]] = {k: [] for k in ROLE_KEYS}

    # --- cols_delete: single-value or >=90% missing (1388-1389) + inf cols (1390)
    cols_delete = [
        c
        for c in cols
        if p[c].n_distinct == 1 or (n > 0 and p[c].n_missing / n >= 0.90)
    ]
    inf_cols = [c for c in cols if p[c].kind == "float" and p[c].n_inf > 0]
    cols_delete += [c for c in inf_cols if c not in cols_delete]
    remaining = [c for c in cols if c not in cols_delete]
    out["cols_delete"] = cols_delete

    # --- boolean-ish (1401-1411)
    string_bool = [
        c
        for c in remaining
        if p[c].kind in ("bool", "string") and p[c].n_distinct == 2
    ]
    num_bool = [
        c
        for c in remaining
        if p[c].kind in ("int", "float") and p[c].n_distinct == 2
    ]
    out["string_bool_vars"] = string_bool
    out["num_bool_vars"] = num_bool

    # --- string columns -> nlp / discrete / id / cat (1413-1443)
    nlp, discrete, cat, id_vars = [], [], [], []
    for c in remaining:
        if p[c].kind != "string" or c in string_bool:
            continue
        miss = p[c].n_missing
        # post-fillna('  ') adjusted stats (reference 1428)
        nvc = p[c].n_distinct + (1 if miss > 0 else 0)
        maxlen = max(p[c].max_len or 0, 2 if miss > 0 else 0)
        nonnull = n - miss
        meanlen = ((p[c].avg_len or 0.0) * nonnull + 2.0 * miss) / n if n else 0.0
        if maxlen >= 50 and nvc >= int(0.9 * n):
            nlp.append(c)
        elif meanlen >= NLP_MAX_CHAR and maxlen < 50 and nvc <= int(0.9 * n):
            discrete.append(c)
        elif nvc > CAT_LIMIT and nvc <= int(0.9 * n):
            discrete.append(c)
        elif nvc > CAT_LIMIT and _all_unique(p[c], n, 1 if miss > 0 else 0):
            id_vars.append(c)
        else:
            cat.append(c)

    # --- factor vars: pandas 'category' dtype has no Spark analogue (1451-1454)
    out["factor_vars"] = []

    # --- int columns -> id / int / date (1456-1493)
    int_vars, date_vars = [], []
    for c in remaining:
        if p[c].kind == "date":
            date_vars.append(c)
    for c in remaining:
        if p[c].kind != "int" or c in num_bool:
            continue
        mn, mx = p[c].min_val, p[c].max_val
        out_of_range = mn is None or mn < 1900 or (mx is not None and mx > 2050)
        if _all_unique(p[c], n):
            if out_of_range:
                id_vars.append(c)
            else:
                date_vars.append(c)  # pd.to_datetime(int) always parses (quirk)
        else:
            if out_of_range:
                int_vars.append(c)
            else:
                date_vars.append(c)

    # --- float columns -> cat / continuous (1511-1523) + float64 fixup (1546-1560)
    continuous = []
    for c in remaining:
        if p[c].kind != "float":
            continue
        nvc = p[c].n_distinct
        if 2 < nvc <= FLOAT_LIMIT and nvc <= n:
            if p[c].dtype == "double":
                # marked cat then moved back by the dtype==float fixup
                continuous.append(c)
            else:
                cat.append(c)
        elif c not in num_bool:
            continuous.append(c)

    # --- cat fixup: all-unique cat col becomes id (1557-1560)
    for c in list(cat):
        if _all_unique(p[c], n):
            cat.remove(c)
            id_vars.append(c)

    # --- discrete re-bucket on cardinality (1570-1578), post-fillna counts
    for c in list(discrete):
        nvc = p[c].n_distinct + (1 if p[c].n_missing > 0 else 0)
        if nvc >= 1000:
            discrete.remove(c)
            nlp.append(c)
        elif nvc <= 100:
            discrete.remove(c)
            cat.append(c)

    out["nlp_vars"] = nlp
    out["discrete_string_vars"] = discrete
    out["cat_vars"] = cat
    out["int_vars"] = int_vars
    out["date_vars"] = date_vars
    out["id_vars"] = id_vars
    out["continuous_vars"] = continuous
    return out


def classify_columns(
    df: DataFrame,
    verbose: int = 0,
    state: ProfileState | None = None,
    exact: bool | None = None,
) -> dict[str, list[str]]:
    """Drop-in for the reference entry point (pandas_dq.py:1364).

    One Spark job (the fused profile agg) regardless of column count.

    ``exact`` mirrors :func:`dq_report`'s flag (r5): ``True`` = parity
    profile (exact ``count(DISTINCT)`` — Expand plan); ``False`` =
    engine profile (``approx_count_distinct``, no Expand — the plan
    that survives a 10^12-row table; the all-unique/ID cascades then
    use the HLL 2-sigma band, see ``ColumnProfile.is_id_like``).
    ``None`` auto-selects by row count with the same bounded ``limit``
    probe and >=1M threshold as ``dq_report``.  Ignored when a
    precomputed ``state`` is passed.
    """
    if state is None:
        if exact is None:
            from .dq_report import SAMPLE_CAP_ROWS, _at_least_rows

            exact = not _at_least_rows(df, SAMPLE_CAP_ROWS)
            if not exact:
                print(
                    f"Alert: Detected dataframe size >= {SAMPLE_CAP_ROWS} "
                    "rows. classify_columns profiling in scale-safe "
                    "engine mode (pass exact=True for parity plans)."
                )
        state = profile(df, exact_distinct=exact)
    roles = classify_from_profile(state)
    if verbose >= 1:
        print("    Number of Numeric Columns = ", len(roles["continuous_vars"]))
        print("    Number of Integer-Categorical Columns = ", len(roles["int_vars"]))
        print("    Number of String-Categorical Columns = ", len(roles["cat_vars"]))
        print("    Number of Factor-Categorical Columns = ", len(roles["factor_vars"]))
        print("    Number of String-Boolean Columns = ", len(roles["string_bool_vars"]))
        print("    Number of Numeric-Boolean Columns = ", len(roles["num_bool_vars"]))
        print("    Number of Discrete String Columns = ", len(roles["discrete_string_vars"]))
        print("    Number of NLP String Columns = ", len(roles["nlp_vars"]))
        print("    Number of Date Time Columns = ", len(roles["date_vars"]))
        print("    Number of ID Columns = ", len(roles["id_vars"]))
        print("    Number of Columns to Delete = ", len(roles["cols_delete"]))
    return roles
