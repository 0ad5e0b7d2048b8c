"""Distributed ``dq_report`` (reference: pandas_dq.py:51-542).

The reference makes >=12 eager full-table pandas passes; this engine
runs exactly FOUR Spark jobs regardless of column count:

  1. duplicate-row count (A4) — one shuffle on the row hash;
  2. ONE fused aggregation (profile + exact quantiles + all-pairs
     correlation in a single scan — SURVEY.md §3.1);
  3. outlier counts (needs the quantile results; one conditional agg);
  4. rare-category value counts (one small groupBy per cat column —
     cat columns are by definition low-cardinality, so each is a
     map-side partial agg with a tiny shuffle).

The findings table itself is O(n_columns) and assembled on the driver,
reproducing the reference's issue strings byte-for-byte (the
``first_comma`` comma-append protocol at pandas_dq.py:145-146/234-235).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dtypes import pandas_dtype_name
from ..plans.profile import (
    ProfileState,
    duplicate_row_count,
    null_or_nan,
    profile,
    rare_categories_fused,
    value_counts,
)
from .classify import classify_from_profile

RARE_THRESHOLD = 0.01  # pandas_dq.py:318
CORRELATION_THRESHOLD = 0.8  # pandas_dq.py:71
LEAKAGE_THRESHOLD = 0.8  # pandas_dq.py:72
IMBALANCE_THRESHOLD = 0.1  # pandas_dq.py:475

GOOD = "The Good News"
BAD = "The Bad News"

FINDINGS_SCHEMA = (
    "column_name string, data_type string, missing_values_pct double, "
    "unique_values_pct string, minimum_value string, maximum_value string, "
    "dq_issue string"
)


def _fmt_val(v, kind: str) -> str:
    """str() of the cell as pandas would show it in the report frame."""
    if v is None:
        return ""
    if kind == "int":
        return str(int(v))
    if kind == "bool":
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return str(v)
    return str(v)


class _Appender:
    """The reference's first_comma comma-append protocol
    (pandas_dq.py:145-146, 234-235)."""

    def __init__(self):
        self.text: dict[str, str] = {}
        self.comma: dict[str, str] = {}

    def add(self, key: str, s: str) -> None:
        self.text[key] = self.text.get(key, "") + self.comma.get(key, "") + s
        self.comma[key] = ", "

    def get(self, key: str) -> str:
        return self.text.get(key, "")


@dataclass
class DQReport:
    """Driver-side report pair: per-column findings (dq_df2) and the
    two-row good/bad summary (dq_df1)."""

    columns: list[str]
    data_type: dict[str, str]
    missing_pct: dict[str, float]
    unique_pct: dict[str, object]  # int or 'NA'
    min_val: dict[str, str]
    max_val: dict[str, str]
    issues: dict[str, str]
    summary: dict[str, str]  # GOOD/BAD -> text
    roles: dict[str, list[str]] = field(default_factory=dict)
    n_rows: int = 0
    # per-column distinct counts (exact in parity mode, HLL estimate in
    # engine mode) — kept so dc_report's engine-mode KS gate can skip
    # unbounded-cardinality columns without a second pass
    n_distinct: dict[str, int] = field(default_factory=dict)
    exact: bool = True

    def findings_rows(self) -> list[tuple]:
        return [
            (
                c,
                self.data_type[c],
                float(self.missing_pct[c]),
                str(self.unique_pct[c]),
                self.min_val.get(c, ""),
                self.max_val.get(c, ""),
                self.issues[c],
            )
            for c in self.columns
        ]

    def to_spark(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.findings_rows(), FINDINGS_SCHEMA)

    def summary_rows(self) -> list[tuple[str, str]]:
        return [(GOOD, self.summary[GOOD]), (BAD, self.summary[BAD])]

    def to_summary_html(self, path: str = "dq_report.html") -> str:
        """The reference writes the TWO-ROW summary (dq_df1) when
        ``html=True, verbose=0`` (pandas_dq.py:519-521)."""
        rows = "".join(
            f"<tr><td>{k}</td><td>{v}</td></tr>" for k, v in self.summary_rows()
        )
        html = (
            "<html><body><table border='1'><tr><th></th><th>DQ Issue</th></tr>"
            f"{rows}</table></body></html>"
        )
        with open(path, "w") as f:
            f.write(html)
        return path

    def print_inline(self, verbose: int = 0) -> None:
        """S8 inline-display analogue of the reference's styled
        ``display(...)`` (pandas_dq.py:525-539): the report is
        O(n_columns) and already driver-side, so this is a plain print
        — no Spark job.  ``verbose < 0`` prints nothing (reference
        parity)."""
        if verbose < 0:
            return
        if verbose == 0:
            for k, v in self.summary_rows():
                print(f"    {k}: {v}")
            return
        widths = [
            max(len(str(r[i])) for r in self.findings_rows() + [tuple([""] * 7)])
            for i in range(7)
        ]
        for r in self.findings_rows():
            print("    " + " | ".join(str(v).ljust(w) for v, w in zip(r, widths)))

    def to_html(self, path: str = "dq_report.html", styled: bool = False) -> str:
        """S7 html-sink analogue (pandas_dq.py:547-590): the report is
        O(n_columns), rendered driver-side; no browser open.

        ``styled=True`` is the S8 inline-display analogue of the
        reference's ``style.background_gradient(cmap='Reds').
        set_properties(font-family: Segoe UI)`` (pandas_dq.py:535-539):
        a red gradient over the numeric Missing Values% column plus
        the font, as inline styles."""
        rows_data = self.findings_rows()
        miss_vals = [r[2] for r in rows_data]
        lo = min(miss_vals) if miss_vals else 0.0
        hi = max(miss_vals) if miss_vals else 0.0

        def miss_style(v: float) -> str:
            if not styled:
                return ""
            t = 0.0 if hi == lo else (v - lo) / (hi - lo)
            # white -> red ramp (Reds-ish); dark cells get white text
            g = int(255 - 160 * t)
            fg = "#ffffff" if t > 0.6 else "#000000"
            return f" style='background-color:rgb(255,{g},{g});color:{fg}'"

        rows = "".join(
            "<tr>"
            + f"<td>{r[0]}</td><td>{r[1]}</td>"
            + f"<td{miss_style(r[2])}>{r[2]}</td>"
            + "".join(f"<td>{x}</td>" for x in r[3:])
            + "</tr>"
            for r in rows_data
        )
        hdr = "".join(
            f"<th>{h}</th>"
            for h in [
                "Column Name",
                "Data Type",
                "Missing Values%",
                "Unique Values%",
                "Minimum Value",
                "Maximum Value",
                "DQ Issue",
            ]
        )
        font = " style=\"font-family: 'Segoe UI'\"" if styled else ""
        html = (
            f"<html><body><table border='1'{font}>"
            f"<tr>{hdr}</tr>{rows}</table></body></html>"
        )
        with open(path, "w") as f:
            f.write(html)
        return path


def outlier_predicate(c: F.Column, lb: float, ub: float, kind: str) -> F.Column:
    """A10/P3 fence predicate ``(c < lb) | (c > ub)`` with the pandas
    NaN semantics: in numpy/pandas ``NaN > ub`` is False, but Spark
    orders NaN greater than every value, so an unguarded predicate
    counts every NaN as an outlier (pandas_dq.py:392 vs Spark
    ordering).  Nulls are already neutral (NULL comparisons -> NULL,
    skipped by sum); NaN needs the explicit guard on float kinds."""
    pred = (c < F.lit(lb)) | (c > F.lit(ub))
    if kind == "float":
        pred = ~F.isnan(c) & pred
    return pred


def iqr_outlier_counts(
    df: DataFrame,
    bounds: dict[str, tuple[float, float]],
    kinds: dict[str, str],
) -> dict[str, int]:
    """One conditional agg over all bounded columns — single scan."""
    if not bounds:
        return {}
    aggs = [
        F.sum(
            outlier_predicate(F.col(c), lb, ub, kinds.get(c, "")).cast("long")
        ).alias(c)
        for c, (lb, ub) in bounds.items()
    ]
    row = df.agg(*aggs).collect()[0].asDict()
    return {c: int(row[c] or 0) for c in bounds}


def build_dq_report(
    df: DataFrame,
    target: str | list[str] | None = None,
    correlation_threshold: float = CORRELATION_THRESHOLD,
    rare_threshold: float = RARE_THRESHOLD,
    exact: bool = True,
) -> DQReport:
    n_pre = None  # lazily; dup count gives totals

    # duplicate column names (pandas_dq.py:129-134).  The reference's
    # "drop" line `df = df.T[df.T.index.duplicated(keep='first')].T`
    # actually KEEPS ONLY the 2nd+ occurrences of duplicated names and
    # drops every unique column (verified against the actual reference
    # via tests/reference_shim.py: columns [a,b,a] -> report over the
    # SECOND `a` only).  Reproduced faithfully: positional rename (so
    # the dup-row count below can resolve columns at all) -> select
    # the duplicated positions -> alias back.
    seen, dup_cols, keep_idx = set(), [], []
    names = df.columns
    for i, c in enumerate(names):
        if c in seen:
            dup_cols.append(c)
            keep_idx.append(i)
        seen.add(c)
    if dup_cols:
        df = df.toDF(*[f"__c{i}" for i in range(len(names))])

    # ---- stage 1: duplicate rows (pandas_dq.py:122-126) ----
    # engine mode shuffles a 64-bit row hash instead of full rows
    if exact:
        dup_rows = duplicate_row_count(df)
    else:
        from ..plans.profile import duplicate_row_count_hashed

        dup_rows = duplicate_row_count_hashed(df)
    if dup_rows > 0:
        if exact:
            df = df.dropDuplicates()
        else:
            # engine mode: group on the same 64-bit row hash the count
            # used — the shuffle compares 8-byte keys instead of full
            # rows (same collision model as the hashed count)
            h = F.xxhash64(*[F.col(c) for c in df.columns])
            df = df.withColumn("__rowhash", h).dropDuplicates(
                ["__rowhash"]
            ).drop("__rowhash")

    if dup_cols:
        df = df.select(*[F.col(f"__c{i}").alias(names[i]) for i in keep_idx])
    df = df.cache()

    cols = df.columns
    target_col: list[str] = []
    if target is not None:
        target_col = [target] if isinstance(target, str) else list(target)

    # ---- stage 2: ONE fused agg — profile + quantiles + corr ----
    kinds = {}
    state_pre = None  # we need roles; roles need the profile itself.
    # Profile all columns (including target) in one pass, with the
    # quantile and correlation expressions fused into the same agg.
    from ..plans.profile import col_kind  # local to avoid cycle noise

    num_candidates = [
        f.name
        for f in df.schema.fields
        if col_kind(f.dataType) in ("float", "int")
    ]
    extra = []
    if exact:
        # parity mode: exact percentile fused into the single agg pass
        for c in num_candidates:
            cd = F.when(null_or_nan(F.col(c), col_kind(df.schema[c].dataType)), None).otherwise(
                F.col(c).cast("double")
            )
            extra.append(
                F.percentile(cd, F.array(F.lit(0.25), F.lit(0.75))).alias(f"q__{c}")
            )
    for i, a in enumerate(num_candidates):
        for b in num_candidates[i + 1 :]:
            ca = F.when(null_or_nan(F.col(a), col_kind(df.schema[a].dataType)), None).otherwise(F.col(a).cast("double"))
            cb = F.when(null_or_nan(F.col(b), col_kind(df.schema[b].dataType)), None).otherwise(F.col(b).cast("double"))
            extra.append(F.corr(ca, cb).alias(f"c__{a}__{b}"))

    state = profile(df, exact_distinct=exact, extra_aggs=extra)
    n = state.n_rows
    if not exact and num_candidates:
        # engine mode: range-bucketed exact quantiles — same numbers,
        # no single-reducer percentile state (VERDICT r02 item 3)
        from ..plans.profile import quantiles_bucketed_many

        bq = quantiles_bucketed_many(df, num_candidates, [0.25, 0.75])
        for c in num_candidates:
            state.extras[f"q__{c}"] = bq.get(c)

    # roles computed over predictors only (reference drops target first,
    # pandas_dq.py:158-161)
    pred_state = ProfileState(
        n_rows=n,
        columns={k: v for k, v in state.columns.items() if k not in target_col},
        exact=state.exact,
    )
    roles = classify_from_profile(pred_state)

    id_cols = sorted(set(roles["id_vars"]))
    zero_var_cols = sorted(set(roles["cols_delete"]))
    cat_cols = roles["cat_vars"] + roles["factor_vars"]
    date_cols = roles["date_vars"]
    discrete_string_vars = roles["discrete_string_vars"]
    num_cols = roles["continuous_vars"] + roles["int_vars"]
    float_cols = roles["continuous_vars"]

    missing_cols = [c for c in cols if state.columns[c].n_missing > 0]

    # ---- stage 3: outlier counts per numeric col (pandas_dq.py:386-392) ----
    bounds: dict[str, tuple[float, float]] = {}
    for c in num_cols:
        q = state.extras.get(f"q__{c}")
        if q is None:
            continue
        q1, q3 = q[0], q[1]
        if q1 is None or q3 is None:
            continue
        iqr = q3 - q1
        bounds[c] = (q1 - 1.5 * iqr, q3 + 1.5 * iqr)
    kind_of = {f.name: col_kind(f.dataType) for f in df.schema.fields}
    outlier_counts = iqr_outlier_counts(df, bounds, kind_of)

    # ---- stage 4: rare categories, ALL cat cols in ONE long-form job
    # (pandas_dq.py:317-336; fused plan shared with FixDQ.transform).
    # Only counts and <=10-value lists ever reach the driver.
    rare_info = rare_categories_fused(df, cat_cols, rare_threshold, list_cap=10)

    # ---- assembly (driver-side, byte-parity strings) ----
    dq1 = _Appender()
    dq2 = _Appender()

    if dup_rows > 0:
        dq1.add(BAD, f"There are {dup_rows} duplicate rows in the dataset. De-Dup these rows using Fix_DQ.")
    else:
        dq1.add(GOOD, "There are no duplicate rows in this dataset")
    if len(dup_cols) > 0:
        # the reference interpolates a pandas Index (pandas_dq.py:248)
        idx_str = "Index([" + ", ".join(repr(c) for c in dup_cols) + "], dtype='object')"
        dq1.add(BAD, f"There are {len(dup_cols)} duplicate columns in the dataset. De-Dup {idx_str} using Fix_DQ.")
    else:
        dq1.add(GOOD, "There are no duplicate columns in this datatset")

    if len(id_cols) > 0:
        dq1.add(BAD, "There are ID columns in the dataset. Remove them before modeling using Fix_DQ.")
        for c in id_cols:
            dq2.add(c, "Possible ID column: drop before modeling step.")
    else:
        dq1.add(GOOD, "There are no ID columns in the dataset.")

    if len(zero_var_cols) > 0:
        dq1.add(BAD, "These are zero-variance or low information columns in the dataset. Remove them before modeling.")
        for c in zero_var_cols:
            dq2.add(c, "Possible Zero-variance or low information colum: drop before modeling step.")
    else:
        dq1.add(GOOD, "There are no zero-variance or low information columns in the dataset.")

    if len(date_cols) > 0:
        dq1.add(BAD, f"There are {len(date_cols)} date-time vars in the dataset. Make sure you transform them before modeling.")
        for c in date_cols:
            dq2.add(c, "Possible date-time colum: transform before modeling step.")
    else:
        dq1.add(GOOD, "There are no date-time vars in this dataset")

    if len(missing_cols) > 0:
        for c in missing_cols:
            m = state.columns[c].n_missing
            dq2.add(c, f"{m} missing values. Impute them with mean, median, mode, or a constant value such as 123.")
    else:
        dq1.add(GOOD, "There are no columns with missing values in the dataset")

    if len(cat_cols) > 0:
        for c in cat_cols:
            info = rare_info.get(c)
            if not info:
                continue
            n_rare, rare_vals = info
            if n_rare <= 10:
                dq2.add(c, f"{n_rare} rare categories: {rare_vals}. Group them into a single category or drop the categories.")
            else:
                dq2.add(c, f"{n_rare} rare categories: Too many to list. Group them into a single category or drop the categories.")
    else:
        dq1.add(GOOD, f"There are no categorical columns with rare categories (< {100 * rare_threshold:.0f} percent) in this dataset")

    inf_cols = [c for c in cols if state.columns[c].n_inf > 0]
    if len(inf_cols) > 0:
        dq1.add(BAD, f"There are {len(inf_cols)} columns with infinite values in the dataset. Replace them with NaN or a finite value.")
        for c in inf_cols:
            dq2.add(c, f"{state.columns[c].n_inf} infinite values. Replace them with a finite value.")
    else:
        dq1.add(GOOD, "There are no columns with infinite values in this dataset ")

    # mixed dtypes cannot occur in a Spark column (single-typed);
    # reference check at pandas_dq.py:356-378 reproduced as never-firing
    dq1.add(GOOD, "There are no columns with mixed (more than one) dataypes in this dataset")

    if len(num_cols) > 0:
        first_time = True
        any_outlier = False
        for c in num_cols:
            cnt = outlier_counts.get(c, 0)
            if cnt > 0:
                any_outlier = True
                if first_time:
                    dq1.add(BAD, f"There are {len(num_cols)} numerical columns, some with outliers. Remove them or use robust statistics.")
                    first_time = False
                lb, ub = bounds[c]
                dq2.add(c, f"Column has {cnt} outliers greater than upper bound ({ub:.2f}) or lower than lower bound({lb:.2f}). Cap them or remove them.")
        if not any_outlier:
            dq1.add(GOOD, "There are no numeric columns with outliers in this dataset")

    # high cardinality: reference flags ALL discrete-string cols (Q5,
    # pandas_dq.py:409-426 — threshold selection commented out at 414)
    if len(discrete_string_vars) > 0:
        card = {c: state.columns[c].n_distinct for c in discrete_string_vars}
        card_threshold = min(30, min(card.values()))
        dq1.add(BAD, f"There are {len(discrete_string_vars)} columns with high cardinality (>{card_threshold} categories) in the dataset. Reduce them using encoding techniques or feature selection methods.")
        for c in discrete_string_vars:
            dq2.add(c, f"Possible high cardinality column with {card[c]} unique values: Use hash encoding or text embedding to reduce dimension.")
    else:
        dq1.add(GOOD, "There are no high cardinality columns in this dataset")

    # correlation (pandas_dq.py:428-443): later column in num_cols order
    # is flagged when any upper-triangle |corr| exceeds the threshold
    high_corr: dict[str, list[str]] = {}
    for j, b in enumerate(num_cols):
        partners = []
        for i in range(j):
            a = num_cols[i]
            v = state.extras.get(f"c__{a}__{b}", state.extras.get(f"c__{b}__{a}"))
            if v is not None and abs(v) > correlation_threshold:
                partners.append(a)
        if partners:
            high_corr[b] = partners
    if high_corr:
        dq1.add(BAD, f"There are {len(high_corr)} columns with >= {correlation_threshold} correlation in the dataset. Drop one of them or use dimensionality reduction techniques.")
        for c, partners in high_corr.items():
            dq2.add(c, f"Column has a high correlation with {partners}. Consider dropping one of them.")
    else:
        dq1.add(GOOD, "There are no highly correlated columns in the dataset.")

    # target: model type + imbalance (pandas_dq.py:446-483); leakage
    # check reproduced as never-firing (Q2 — corrwith on a DataFrame
    # aligns on names and yields all-NaN)
    imbalanced_targets: set[str] = set()
    if target is not None:
        model_type = "Regression"
        t_cat = [t for t in target_col if state.columns[t].kind in ("string", "bool")]
        if t_cat:
            model_type = "Classification"
        else:
            for t in target_col:
                if state.columns[t].n_distinct <= 30:
                    model_type = "Classification"
        if model_type == "Classification":
            for t in target_col:
                vc = value_counts(df.filter(F.col(t).isNotNull()), t, normalize=True)
                if vc:
                    freqs = [f for _, f in vc]
                    if min(freqs) < IMBALANCE_THRESHOLD or max(freqs) > 1 - IMBALANCE_THRESHOLD:
                        dq1.add(BAD, f"Imbalanced classes in target variable ({t}). Use resampling or class weights to address.")
                        # reference appends directly, bypassing the
                        # first_comma protocol (pandas_dq.py:481)
                        dq2.text[t] = dq2.get(t) + "Target column. Appears to have Imbalanced classes. Try balancing classes."
                        imbalanced_targets.add(t)
        dq1.add(GOOD, "There are no target leakage columns in the dataset")
    else:
        dq1.add(GOOD, "There is no target given. Hence no target leakage columns detected in the dataset")

    # ---- final per-column frame (pandas_dq.py:149-231, 506-517) ----
    data_type, missing_pct, unique_pct, minv, maxv, issues = {}, {}, {}, {}, {}, {}
    # min/max eligibility: non-missing numeric-dtype cols, plus missing
    # cols that classified into number_cols — the reference's elif
    # branch (pandas_dq.py:213-226: `if col not in missing_cols: ...
    # elif col in number_cols: ...`), NaN-skipping aggregates.
    minmax_eligible: list[str] = []
    for c in cols:
        cp = state.columns[c]
        is_numericish = cp.kind in ("float", "int", "bool")
        if (c not in missing_cols and is_numericish) or (
            c in missing_cols and c in num_cols
        ):
            minmax_eligible.append(c)
    # pandas dtype-promotion quirk: the reference builds the min/max
    # frames by .loc enlargement over ONLY the eligible columns, then
    # `data_types.join(minimum_values)` reindexes over ALL columns
    # (pandas_dq.py:206-232).  The enlargement frame's dtype comes
    # from the eligible KINDS ({bool} -> bool; bool+int -> int64 with
    # bools coerced to 0/1; any float -> float64); the join then
    # injects NaN for every ineligible column, which upcasts
    # int64 -> float64 ("499.0"/"1.0" strings) but bool -> OBJECT,
    # leaving True/False untouched.  Truth table verified against the
    # actual reference via tests/reference_shim.py: bool+string ->
    # 'False'/'True'; bool+int(+string) -> '0.0'/'1.0'; int-only ->
    # '1'/'500'.
    minmax_kinds = {state.columns[c].kind for c in minmax_eligible}
    minmax_as_float = minmax_kinds != {"bool"} and (
        len(minmax_eligible) < len(cols)
        or any(state.columns[c].kind == "float" for c in minmax_eligible)
    )
    for c in cols:
        cp = state.columns[c]
        data_type[c] = pandas_dtype_name(df.schema[c].dataType)
        missing_pct[c] = 100.0 * cp.n_missing / n if n else 0.0
        unique_pct[c] = "NA" if c in float_cols else int(100 * cp.n_distinct / n) if n else 0
        if c in minmax_eligible:
            if minmax_as_float:
                minv[c] = "" if cp.min_val is None else str(float(cp.min_val))
                maxv[c] = "" if cp.max_val is None else str(float(cp.max_val))
            elif minmax_kinds == {"bool"}:
                minv[c] = _fmt_val(cp.min_val, "bool")
                maxv[c] = _fmt_val(cp.max_val, "bool")
            else:
                # int64 frame: bools coerced to 0/1 alongside ints
                minv[c] = "" if cp.min_val is None else str(int(cp.min_val))
                maxv[c] = "" if cp.max_val is None else str(int(cp.max_val))
        else:
            minv[c] = ""
            maxv[c] = ""
        text = dq2.get(c)
        if text == "":
            if c in target_col:
                if cp.n_distinct == 1:
                    text = "Target column. Appears to have zero variance. Double-check it."
                else:
                    text = "Target column"
            else:
                text = "No issue"
        issues[c] = text

    df.unpersist()
    return DQReport(
        columns=cols,
        data_type=data_type,
        missing_pct=missing_pct,
        unique_pct=unique_pct,
        min_val=minv,
        max_val=maxv,
        issues=issues,
        summary={GOOD: dq1.get(GOOD), BAD: dq1.get(BAD)},
        roles=roles,
        n_rows=n,
        n_distinct={c: state.columns[c].n_distinct for c in cols},
        exact=exact,
    )


# S5 sample-cap thresholds (pandas_dq.py:113-114): path inputs at or
# above SAMPLE_CAP_ROWS are profiled on a ~SAMPLE_CAP_N random sample
SAMPLE_CAP_ROWS = 1_000_000
SAMPLE_CAP_N = 100_000


def _at_least_rows(df: DataFrame, n: int) -> bool:
    """Bounded probe: does ``df`` have at least ``n`` rows?  Uses
    ``limit(n)`` so the scan stops once ``n`` rows are found — never a
    full count of a 10^12-row table."""
    return df.limit(n).count() >= n


def dq_report(
    data,
    target=None,
    html: bool = False,
    csv_engine: str = "pandas",
    verbose: int = 0,
    spark: SparkSession | None = None,
    sample_cap_rows: int | None = None,
    sample_cap_n: int | None = None,
    exact: bool | None = None,
) -> DataFrame:
    """Entry point matching the reference signature (pandas_dq.py:51).

    ``data`` is a Spark DataFrame or a file path (csv/parquet/feather —
    S1-S4 dispatch).  Returns the findings table as a Spark DataFrame.

    ``exact`` selects the physical strategy, never the numbers'
    meaning:  ``True`` is parity mode (exact ``percentile`` /
    ``count(DISTINCT)`` / full-row dedup — byte-identical to the
    reference); ``False`` is engine mode (range-bucketed exact
    quantiles, ``approx_count_distinct``, 64-bit-hash dup counts —
    the plans that survive a 10^12-row table).  ``None`` (default)
    auto-selects by row count, mirroring the reference's own ≥1M
    sample-cap instinct (pandas_dq.py:113-114): DataFrame inputs with
    ≥ ``sample_cap_rows`` rows (bounded ``limit`` probe, not a full
    count) run in engine mode; smaller inputs and path inputs (which
    the sample cap already shrinks to ~``sample_cap_n`` rows) run in
    parity mode.
    """
    from ..sources.io import read_any

    cap_rows = sample_cap_rows if sample_cap_rows is not None else SAMPLE_CAP_ROWS
    cap_n = sample_cap_n if sample_cap_n is not None else SAMPLE_CAP_N
    if isinstance(data, str):
        spark = spark or SparkSession.getActiveSession()
        df = read_any(spark, data, csv_engine=csv_engine, on_unsupported="return_input")
        if isinstance(df, str):
            # reference parity: unsupported extension prints and
            # returns the input unchanged (pandas_dq.py:108-111)
            return data
        # S5 sample-cap (pandas_dq.py:113-114): file inputs only
        total = df.count()
        if total >= cap_rows:
            print(
                f"Alert: Detected dataframe size = {total} rows. "
                f"Sample size = {cap_n} rows."
            )
            df = df.sample(fraction=cap_n / total, seed=99)
        if exact is None:
            # path inputs are already capped to ~cap_n rows by the
            # sample above, so parity mode is always safe here
            exact = True
    else:
        df = data
        if exact is None:
            exact = not _at_least_rows(df, cap_rows)
            if not exact:
                # make the silent mode flip visible at runtime, the way
                # the path-input sample cap announces itself (ADVICE
                # r04): engine mode changes the physical strategy
                # (approx distinct counts, hash-keyed dup counts), so
                # parity-sensitive callers on >=1M-row frames should
                # pass exact=True explicitly
                print(
                    f"Alert: Detected dataframe size >= {cap_rows} rows. "
                    "Using scale-safe engine mode (pass exact=True for "
                    "reference-parity plans)."
                )
    rep = build_dq_report(df, target=target, exact=exact)
    if html:
        # reference: verbose==0 writes the 2-row summary, else the
        # per-column findings (pandas_dq.py:519-523)
        if verbose == 0:
            rep.to_summary_html()
        else:
            rep.to_html()
    else:
        # reference displays the styled frame inline (525-539);
        # terminal analogue prints the same table, nothing on verbose<0
        rep.print_inline(verbose)
    return rep.to_spark(df.sparkSession)
