"""Distributed ``Fix_DQ`` (reference: pandas_dq.py:659-1058).

``fit`` runs the fused profile pass plus one quantile/correlation agg
and produces a tiny picklable :class:`FixDQState` — the Spark analogue
of the attribute soup the reference stores on ``self`` (upper_bounds_
at 948, col_transformers_ at 951, drop lists at 993-1019).

``transform`` is ONE narrow ``select`` of when/least/na.fill/log1p/pow
expressions — no Python on executors, fully inside whole-stage codegen.
The only shuffles are the dedup (A5) and the rare-category value
counts, which the reference deliberately recomputes on the TRANSFORM
data rather than using fit state (pandas_dq.py:767-769 — train and
test can group differently; reproduced, see SURVEY.md §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.skew import fit_yeo_johnson_lambda, yeo_johnson_col, yeo_johnson_transform_np
from ..plans.profile import col_kind, null_or_nan, profile

SKEW_THRESHOLD = 1.0  # pandas_dq.py:954


@dataclass
class FixDQState:
    drop_cols_: list[str] = field(default_factory=list)
    missing_cols_: list[str] = field(default_factory=list)
    id_cols_: list[str] = field(default_factory=list)
    zero_var_cols_: list[str] = field(default_factory=list)
    drop_corr_cols_: list[str] = field(default_factory=list)
    mixed_type_cols_: list[str] = field(default_factory=list)
    upper_bounds_: dict[str, float] = field(default_factory=dict)
    # col -> ("log1p", None) | ("yeo-johnson", (lmbda, mean, std))
    col_transformers_: dict[str, tuple] = field(default_factory=dict)


# oversized-rare-set join (step 4b): explicitly broadcast the
# rare-value build side up to this many distinct values (~tens of MB
# of short strings); beyond it, fall back to a shuffle join and let
# AQE's skew handling split any hot imputed-fill partition
RARE_BROADCAST_CAP = 1_000_000


class FixDQ:
    """sklearn-style transformer over Spark DataFrames.

    Defaults follow the reference CODE, not its README (README/code
    mismatches noted at SURVEY.md §2.11): quantile=0.87,
    num_fill_value=9999, rare_threshold=0.01, correlation_threshold=0.9
    (pandas_dq.py:661-667).
    """

    def __init__(
        self,
        quantile: float | None = 0.87,
        cat_fill_value="missing",
        num_fill_value=9999,
        rare_threshold: float = 0.01,
        correlation_threshold: float = 0.9,
        yj_sample_cap: int = 200_000,
        rare_isin_cap: int = 10_000,
        engine_mode: bool | None = None,
    ):
        self.quantile = quantile
        self.cat_fill_value = cat_fill_value
        self.num_fill_value = num_fill_value
        self.rare_threshold = rare_threshold
        self.correlation_threshold = correlation_threshold
        self.yj_sample_cap = yj_sample_cap
        # engine_mode=True swaps the fused exact `percentile` (whose
        # partial aggregation state is the column's full value multiset
        # — a single-reducer scale-killer) for the range-bucketed exact
        # quantile plan (plans.profile.quantiles_bucketed_many).  Same
        # numbers (exact linear interpolation incl. +-inf handling);
        # parity mode keeps the fused single-pass agg.  ``None``
        # (default, r5) auto-selects at fit time by row count — the
        # same bounded ``limit`` probe and >=1M threshold as
        # ``dq_report(exact=None)``; the chosen mode is recorded in
        # ``resolved_engine_mode_`` and announced when it flips.
        self.engine_mode = engine_mode
        self.resolved_engine_mode_: bool | None = None
        # rare sets up to this size are applied as an isin literal;
        # larger sets (high-cardinality columns, where almost every
        # value is rare) switch to the step-4b rare-value JOIN
        # (broadcast when the set fits, AQE-splittable shuffle join
        # otherwise) so the driver never materializes them
        self.rare_isin_cap = rare_isin_cap
        self.state: FixDQState | None = None

    def _string_fill(self, c: str) -> str:
        if isinstance(self.cat_fill_value, dict):
            return self.cat_fill_value.get(c, "missing")
        return self.cat_fill_value

    # -- fit ---------------------------------------------------------
    def fit(self, X: DataFrame, y=None) -> "FixDQ":
        engine = self.engine_mode
        if engine is None:
            from .dq_report import SAMPLE_CAP_ROWS, _at_least_rows

            engine = _at_least_rows(X, SAMPLE_CAP_ROWS)
            if engine:
                print(
                    f"Alert: Detected dataframe size >= {SAMPLE_CAP_ROWS} "
                    "rows. Fix_DQ fitting in scale-safe engine mode (pass "
                    "engine_mode=False for reference-parity plans)."
                )
        self.resolved_engine_mode_ = engine
        st = FixDQState()
        kinds = {f.name: col_kind(f.dataType) for f in X.schema.fields}
        float_cols = [c for c in X.columns if kinds[c] == "float"]
        num_cols = [c for c in X.columns if kinds[c] in ("int", "float")]
        non_float = [c for c in X.columns if kinds[c] != "float"]

        # fused agg: profile + fit quantiles + pairwise corr in one pass
        p = self.quantile if self.quantile is not None else 0.99
        extra = []
        if not engine:
            for c in float_cols:
                # pandas .quantile keeps +-inf in the order statistics;
                # only NaN/null are skipped — so do NOT filter inf here
                cd = F.when(null_or_nan(F.col(c), "float"), None).otherwise(
                    F.col(c).cast("double")
                )
                extra.append(
                    F.percentile(cd, F.array(F.lit(p), F.lit(1 - p))).alias(f"q__{c}")
                )
        for i, a in enumerate(num_cols):
            for b in num_cols[i + 1 :]:
                ca = F.when(null_or_nan(F.col(a), kinds[a]), None).otherwise(F.col(a).cast("double"))
                cb = F.when(null_or_nan(F.col(b), kinds[b]), None).otherwise(F.col(b).cast("double"))
                extra.append(F.corr(ca, cb).alias(f"c__{a}__{b}"))
        state = profile(X, exact_distinct=not engine, extra_aggs=extra)
        n = state.n_rows
        if engine and float_cols:
            from ..plans.profile import quantiles_bucketed_many

            bq = quantiles_bucketed_many(X, float_cols, [p, 1 - p])
            for c in float_cols:
                state.extras[f"q__{c}"] = bq.get(c)

        st.missing_cols_ = [c for c in X.columns if state.columns[c].n_missing > 0]
        drop_missing = [
            c for c in st.missing_cols_ if n and state.columns[c].n_missing / n >= 0.80
        ]
        st.id_cols_ = [c for c in non_float if state.columns[c].is_id_like]
        st.zero_var_cols_ = [c for c in non_float if state.columns[c].is_constant]

        # corr-drop keeps the EARLIER column in order (pandas_dq.py:910-918)
        for j, b in enumerate(num_cols):
            for i in range(j):
                a = num_cols[i]
                v = state.extras.get(f"c__{a}__{b}")
                if v is not None and abs(v) > self.correlation_threshold:
                    if b not in st.drop_corr_cols_:
                        st.drop_corr_cols_.append(b)

        # upper bounds: ub = q(p) + 1.5*(q(p) - q(1-p)), float cols only
        # (pandas_dq.py:921-948)
        for c in float_cols:
            q = state.extras.get(f"q__{c}")
            if q is None or q[0] is None:
                continue
            q3, q1 = q[0], q[1]
            st.upper_bounds_[c] = q3 + 1.5 * (q3 - q1)

        # skew transformers (pandas_dq.py:950-979); pandas .skew() on a
        # column containing +-inf is NaN, so inf columns never qualify
        yj_cols = []
        for c in float_cols:
            cp = state.columns[c]
            if cp.n_inf > 0 or cp.skewness is None:
                continue
            if abs(cp.skewness) > SKEW_THRESHOLD:
                if cp.min_val is not None and cp.min_val > 0:
                    st.col_transformers_[c] = ("log1p", None)
                else:
                    yj_cols.append(c)

        # Yeo-Johnson lambda MLE on a driver-side (seeded, capped)
        # sample — the transform itself stays a Catalyst expression.
        if yj_cols:
            sel = X.select(*yj_cols)
            cnt = n
            if cnt > self.yj_sample_cap:
                sel = sel.sample(fraction=self.yj_sample_cap / cnt, seed=42)
            pdf = sel.toPandas()
            for c in yj_cols:
                vals = pdf[c].to_numpy(dtype=float)
                vals = vals[np.isfinite(vals)]
                lam = fit_yeo_johnson_lambda(vals)
                t = yeo_johnson_transform_np(vals, lam)
                st.col_transformers_[c] = ("yeo-johnson", (lam, float(t.mean()), float(t.std())))

        st.mixed_type_cols_ = []  # impossible on Spark (single-typed cols)

        drop: list[str] = []
        drop += st.id_cols_
        drop += st.zero_var_cols_
        drop += st.drop_corr_cols_
        drop += drop_missing
        # stable order, first occurrence wins (reference uses set();
        # we keep column order for deterministic output)
        seen = set()
        st.drop_cols_ = [c for c in drop if not (c in seen or seen.add(c))]
        self.state = st
        return self

    # -- transform ---------------------------------------------------
    def transform(self, X: DataFrame) -> DataFrame:
        if self.state is None:
            raise RuntimeError("FixDQ.transform called before fit")
        st = self.state
        kinds = {f.name: col_kind(f.dataType) for f in X.schema.fields}

        # 1. dedup rows (pandas_dq.py:1032) — values-identical rows, so
        #    any survivor yields the same output
        X = X.dropDuplicates()

        # 2. drop fitted columns (pandas_dq.py:1034-1036)
        to_drop = [c for c in st.drop_cols_ if c in X.columns]
        if to_drop:
            X = X.drop(*to_drop)

        # 3. missing cols found only at transform time are added to the
        #    fitted list — stateful quirk reproduced (pandas_dq.py:713-718)
        new_missing = [
            c
            for c in X.columns
            if c not in st.missing_cols_ and kinds.get(c) is not None
        ]
        if new_missing:
            row = X.agg(
                *[
                    F.sum(null_or_nan(F.col(c), kinds[c]).cast("long")).alias(c)
                    for c in new_missing
                ]
            ).collect()[0].asDict()
            for c in new_missing:
                if (row[c] or 0) > 0:
                    st.missing_cols_.append(c)

        # 4. rare categories recomputed on THIS data (pandas_dq.py:
        #    767-769), on the IMPUTED values: the reference imputes
        #    first (pandas_dq.py:1039) and only then groups rares
        #    (pandas_dq.py:1052), so the fill value participates in
        #    value_counts and the denominator is every (deduped) row.
        #    Computed distributed: ONE long-form groupBy over all
        #    string columns (posexplode -> (col_idx, value) counts,
        #    map-side combined); the driver sees only per-column
        #    totals, rare-set sizes, and rare sets small enough for an
        #    isin literal.  Oversized rare sets are marked via the
        #    step-4b broadcast/shuffle join (no driver materialization).
        str_cols = [c for c in X.columns if kinds.get(c) == "string"]
        imputed_str: dict[str, Column] = {}
        for c in str_cols:
            if c in st.missing_cols_:
                imputed_str[c] = F.coalesce(F.col(c), F.lit(self._string_fill(c)))
            else:
                imputed_str[c] = F.col(c)
        rare_by_col: dict[str, list] = {}
        rare_join_cols: dict[str, int] = {}  # col -> non-null total
        if str_cols:
            vc = (
                X.select(
                    F.posexplode(
                        F.array(*[imputed_str[c] for c in str_cols])
                    ).alias("ci", "val")
                )
                .filter(F.col("val").isNotNull())
                .groupBy("ci", "val")
                .count()
                .persist()
            )
            try:
                totals = {
                    r["ci"]: r["tot"]
                    for r in vc.groupBy("ci").agg(F.sum("count").alias("tot")).collect()
                }
                thr_expr = F.lit(self.rare_threshold)
                tot_expr = F.element_at(
                    F.array(*[F.lit(totals.get(i, 1)) for i in range(len(str_cols))]),
                    F.col("ci") + 1,
                )
                rare_vc = vc.filter(F.col("count") / tot_expr < thr_expr).persist()
                sizes = {
                    r["ci"]: r["cnt"]
                    for r in rare_vc.groupBy("ci").agg(F.count("*").alias("cnt")).collect()
                }
                small = [i for i, cnt in sizes.items() if cnt <= self.rare_isin_cap]
                if small:
                    for r in rare_vc.filter(F.col("ci").isin(small)).collect():
                        rare_by_col.setdefault(str_cols[r["ci"]], []).append(r["val"])
                for i, cnt in sizes.items():
                    if cnt > self.rare_isin_cap:
                        rare_join_cols[str_cols[i]] = totals.get(i, 1)
                rare_vc.unpersist()
            finally:
                vc.unpersist()

        # 4b. oversized rare sets (> rare_isin_cap values): mark via a
        #     JOIN against a lazily-recomputed per-column rare-value DF
        #     instead of `count(*) over (partition by value)` — the
        #     window would hash every row sharing one value into a
        #     single task, and the imputed fill ("missing") is exactly
        #     the hot key that skews it (VERDICT r03 item 2).  The
        #     rare-value side is an aggregate (one row per DISTINCT
        #     value), broadcast when it fits, so the hot key either
        #     never shuffles (broadcast) or is AQE-splittable
        #     (left-outer sort-merge); either way no single-task stage.
        X_src = X  # plan before the flag joins — rv must derive from it
        out_cols = list(X.columns)  # the flag columns are not outputs
        for c, tot in rare_join_cols.items():
            flag = f"__rare_flag__{c}"
            rv = (
                X_src.select(imputed_str[c].alias("__rare_val"))
                .filter(F.col("__rare_val").isNotNull())
                .groupBy("__rare_val")
                .agg(F.count("*").alias("__cnt"))
                # same predicate as the isin path: count / non-null
                # total < rare_threshold
                .filter(
                    F.col("__cnt") / F.lit(float(tot)) < F.lit(self.rare_threshold)
                )
                .select(F.col("__rare_val").alias(flag))
            )
            n_rare = sizes[str_cols.index(c)]
            if n_rare <= RARE_BROADCAST_CAP:
                rv = F.broadcast(rv)
            X = X.join(rv, imputed_str[c] == F.col(flag), "left")

        # 5. ONE select expressing impute -> cap -> inf-replace -> rare
        #    -> skew, in the reference's fixed order (pandas_dq.py:1025-1058)
        exprs = []
        for c in out_cols:
            kind = kinds.get(c)
            col = F.col(c)
            if c in st.missing_cols_:
                if kind == "string":
                    # same resolution as imputed_str above (the rare
                    # denominator must see exactly this fill)
                    col = F.when(
                        col.isNull(), F.lit(self._string_fill(c))
                    ).otherwise(col)
                elif kind in ("int", "float"):
                    fill = (
                        self.num_fill_value.get(c, -999)
                        if isinstance(self.num_fill_value, dict)
                        else self.num_fill_value
                    )
                    if kind == "float":
                        col = F.when(null_or_nan(col, "float"), F.lit(float(fill))).otherwise(col)
                    else:
                        col = F.when(col.isNull(), F.lit(fill)).otherwise(col)
            if kind == "float" and c in st.upper_bounds_:
                ub = float(st.upper_bounds_[c])
                if self.quantile is not None:
                    # np.where(x > ub, ub, x): NaN > ub is False in
                    # numpy but TRUE in Spark ordering — guard it
                    col = F.when(~F.isnan(col) & (col > ub), F.lit(ub)).otherwise(col)
                col = F.when(col.isin(float("inf"), float("-inf")), F.lit(ub)).otherwise(col)
            if kind == "string" and c in rare_by_col:
                col = F.when(
                    col.isin(*rare_by_col[c]), F.lit("Rare")
                ).otherwise(col)
            elif kind == "string" and c in rare_join_cols:
                # huge rare set: flag column produced by the 4b join —
                # non-null match means the imputed value is rare
                col = F.when(
                    col.isNotNull() & F.col(f"__rare_flag__{c}").isNotNull(),
                    F.lit("Rare"),
                ).otherwise(col)
            if kind == "float" and c in st.col_transformers_:
                name, params = st.col_transformers_[c]
                if name == "log1p":
                    col = F.log1p(col)
                else:
                    lam, mu, sigma = params
                    col = yeo_johnson_col(col.cast("double"), lam, standardize=(mu, sigma))
            exprs.append(col.cast("double").alias(c) if kind == "float" else col.alias(c))
        return X.select(*exprs)

    def fit_transform(self, X: DataFrame, y=None) -> DataFrame:
        return self.fit(X, y).transform(X)
