"""Fused single-pass column profiler — the engine's core plan.

The reference (``/root/reference/pandas_dq.py``) makes >=12 full-table
passes per report: ``duplicated()`` at 122, ``isnull().sum()`` at 154,
a ``nunique()`` loop at 198-202, min/max loops at 206-226, per-column
``value_counts`` at 322, inf scan at 340, ``applymap(type)`` at 357,
per-column quantiles at 387-392, ``corr()`` at 429, and more.

Here everything that is a per-column global aggregate is fused into ONE
wide ``df.agg(...)`` — a single scan, map-side partial aggregation, one
tiny shuffled row out.  Catalyst/Tungsten keep the whole expression tree
inside whole-stage codegen; at 100 TB this is a single pass over the
parquet scan with only the referenced columns read.

Exact-vs-approx: parity mode (default) uses exact ``count(DISTINCT c)``
per column.  Multiple exact distincts in one agg trigger Spark's Expand
(input duplicated x k) — fine at test scale, wasteful at 10^12 rows, so
``exact_distinct=False`` switches to ``approx_count_distinct`` which
fuses without Expand; callers flag results as approximate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FLOAT_TYPES = (T.FloatType, T.DoubleType)
_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def col_kind(dt: T.DataType) -> str:
    """Collapse the Spark type to the reference's type notion.

    Mirrors the dtype buckets of ``classify_columns``
    (pandas_dq.py:1456-1514): continuous (float), int, bool, date,
    string/object, other.
    """
    if isinstance(dt, _FLOAT_TYPES):
        return "float"
    if isinstance(dt, _INT_TYPES):
        return "int"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "date"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.DecimalType):
        return "float"
    return "other"


def null_or_nan(c: F.Column, kind: str) -> F.Column:
    """pandas does not distinguish NaN from missing; Spark does.

    Every missing-check on float columns must be ``isNull OR isnan``
    (SURVEY.md §4.3 trap 5; reference pandas_dq.py:154, 713).
    """
    if kind == "float":
        return c.isNull() | F.isnan(c)
    return c.isNull()


@dataclass
class ColumnProfile:
    name: str
    dtype: str  # Spark simpleString
    kind: str  # float | int | bool | date | string | other
    n_rows: int = 0
    n_missing: int = 0
    n_distinct: int = 0  # excludes nulls (pandas nunique default)
    min_val: object = None
    max_val: object = None
    n_inf: int = 0
    skewness: float | None = None  # pandas-adjusted Fisher-Pearson
    sum_val: float | None = None
    mean_val: float | None = None
    stddev_val: float | None = None
    max_len: int | None = None
    avg_len: float | None = None
    n_date_parseable: int | None = None  # string cols: to_timestamp successes
    exact: bool = True  # False: n_distinct is an HLL estimate (rsd 0.01)

    @property
    def missing_pct(self) -> float:
        return 100.0 * self.n_missing / self.n_rows if self.n_rows else 0.0

    @property
    def unique_pct(self) -> float:
        return 100.0 * self.n_distinct / self.n_rows if self.n_rows else 0.0

    @property
    def is_constant(self) -> bool:
        # zero-variance: a single distinct value (pandas_dq.py:906-908)
        return self.n_distinct == 1

    @property
    def is_id_like(self) -> bool:
        # every non-null value unique AND no missing (pandas_dq.py:901-903)
        if self.n_rows <= 0:
            return False
        if self.exact:
            return self.n_distinct == self.n_rows
        # engine mode: n_distinct is an HLL estimate with rsd 0.01, so
        # exact equality would (almost) never fire on a true ID column;
        # require the exact no-missing condition plus distinct within
        # the 2-sigma error band of the row count
        return self.n_missing == 0 and self.n_distinct >= int(0.98 * self.n_rows)


@dataclass
class ProfileState:
    """Driver-side result of the fused profile pass.

    This object plays the role the reference's per-column stat frames
    play (pandas_dq.py:149-231) and of the attribute soup ``Fix_DQ.fit``
    stores on ``self`` (pandas_dq.py:888-991).  It is tiny —
    O(n_columns) — and broadcastable.
    """

    n_rows: int
    columns: dict[str, ColumnProfile] = field(default_factory=dict)
    exact: bool = True
    extras: dict[str, object] = field(default_factory=dict)

    def cols_of_kind(self, *kinds: str) -> list[str]:
        return [c.name for c in self.columns.values() if c.kind in kinds]


def _pandas_skew_expr(c: F.Column) -> F.Column:
    """pandas ``.skew()`` = adjusted Fisher-Pearson; Spark ``skewness``
    is population g1.  Adjustment: g1 * sqrt(n(n-1)) / (n-2), with n the
    non-null count (verified numerically, SURVEY.md §4.3 trap 1)."""
    n = F.count(c)
    g1 = F.skewness(c)
    return F.when(
        n > 2, g1 * F.sqrt(n * (n - 1)) / (n - 2)
    ).otherwise(F.lit(None).cast("double"))


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
    with_dates: bool = True,
    extra_aggs: list | None = None,
) -> ProfileState:
    """One fused aggregation computing SURVEY.md §2.4 ops
    A1 (missing), A2 (nunique), A3 (min/max), A8 (inf), A13 (skew),
    A19 (id-detect), A20 (zero-var), A22 (string-length stats),
    A23 (date-parse-check) for every requested column simultaneously.

    ``extra_aggs`` lets callers fuse additional global aggregates
    (exact percentiles, pairwise correlations, …) into the SAME pass;
    their results land in ``ProfileState.extras`` keyed by alias.
    """
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    kinds: dict[str, str] = {}
    for f in fields:
        name, kind = f.name, col_kind(f.dataType)
        kinds[name] = kind
        c = F.col(name)
        aggs.append(
            F.sum(null_or_nan(c, kind).cast("long")).alias(f"miss::{name}")
        )
        # nunique: pandas excludes NaN; for float cols exclude NaN too
        dc = F.when(null_or_nan(c, kind), None).otherwise(c) if kind == "float" else c
        if exact_distinct:
            aggs.append(F.count_distinct(dc).alias(f"dist::{name}"))
        else:
            aggs.append(F.approx_count_distinct(dc, 0.01).alias(f"dist::{name}"))
        if kind in ("float", "int", "date", "bool"):
            # pandas min/max skip NaN; Spark orders NaN greater than
            # any value, so float max would return NaN (SURVEY.md §4.3
            # trap 5) — exclude NaN explicitly for float kinds
            mc = F.when(null_or_nan(c, kind), None).otherwise(c) if kind == "float" else c
            aggs.append(F.min(mc).alias(f"min::{name}"))
            aggs.append(F.max(mc).alias(f"max::{name}"))
        if kind in ("float", "int"):
            cd = c.cast("double")
            base = F.when(null_or_nan(c, kind), None).otherwise(cd)
            aggs.append(F.sum(base).alias(f"sum::{name}"))
            aggs.append(F.avg(base).alias(f"mean::{name}"))
            aggs.append(F.stddev(base).alias(f"std::{name}"))
        if kind == "float":
            aggs.append(
                F.sum(
                    c.isin(float("inf"), float("-inf")).cast("long")
                ).alias(f"inf::{name}")
            )
            noinf = F.when(
                null_or_nan(c, kind) | c.isin(float("inf"), float("-inf")), None
            ).otherwise(c.cast("double"))
            aggs.append(_pandas_skew_expr(noinf).alias(f"skew::{name}"))
        if kind == "string":
            aggs.append(F.max(F.length(c)).alias(f"maxlen::{name}"))
            aggs.append(F.avg(F.length(c)).alias(f"avglen::{name}"))
            if with_dates:
                aggs.append(
                    F.sum(
                        F.try_to_timestamp(c).isNotNull().cast("long")
                    ).alias(f"dateok::{name}")
                )
    aggs.extend(extra_aggs or [])
    row = df.agg(*aggs).collect()[0].asDict()
    n_rows = int(row["__n"])
    state = ProfileState(n_rows=n_rows, exact=exact_distinct)
    known = {a for a in row if "::" in a or a == "__n"}
    state.extras = {k: v for k, v in row.items() if k not in known}
    for f in fields:
        name, kind = f.name, kinds[f.name]
        p = ColumnProfile(
            name=name,
            dtype=f.dataType.simpleString(),
            kind=kind,
            n_rows=n_rows,
            n_missing=int(row.get(f"miss::{name}") or 0),
            n_distinct=int(row.get(f"dist::{name}") or 0),
            min_val=row.get(f"min::{name}"),
            max_val=row.get(f"max::{name}"),
            n_inf=int(row.get(f"inf::{name}") or 0),
            skewness=row.get(f"skew::{name}"),
            sum_val=row.get(f"sum::{name}"),
            mean_val=row.get(f"mean::{name}"),
            stddev_val=row.get(f"std::{name}"),
            max_len=row.get(f"maxlen::{name}"),
            avg_len=row.get(f"avglen::{name}"),
            n_date_parseable=row.get(f"dateok::{name}"),
            exact=exact_distinct,
        )
        sk = p.skewness
        if sk is not None and (math.isnan(sk) or math.isinf(sk)):
            p.skewness = None
        state.columns[name] = p
    return state


def duplicate_row_count(df: DataFrame, subset: list[str] | None = None) -> int:
    """A4 dup-row-count: pandas ``df.duplicated().sum()``
    (pandas_dq.py:122-124) counts every row beyond the first per group,
    with NaN == NaN.  Spark ``groupBy`` groups nulls/NaNs together too,
    so ``sum(count - 1)`` over full-row groups matches exactly.
    One shuffle on all columns; at scale prefer hashing the row first
    (``duplicate_row_count_hashed``)."""
    cols = subset or df.columns
    out = (
        df.groupBy(*cols)
        .count()
        .agg(F.sum(F.col("count") - 1).alias("dups"))
        .collect()[0]["dups"]
    )
    return int(out or 0)


def duplicate_row_count_hashed(df: DataFrame, subset: list[str] | None = None) -> int:
    """Scale path for A4: shuffle a 64-bit hash instead of full rows.

    ``xxhash64`` collisions at 10^12 rows are possible (~birthday bound)
    so this is the engine-mode estimate; parity mode uses the exact
    variant above."""
    cols = subset or df.columns
    h = F.xxhash64(*[F.col(c) for c in cols])
    out = (
        df.select(h.alias("h"))
        .groupBy("h")
        .count()
        .agg(F.sum(F.col("count") - 1).alias("dups"))
        .collect()[0]["dups"]
    )
    return int(out or 0)


def quantiles(
    df: DataFrame, cols: list[str], probs: list[float]
) -> dict[str, list[float]]:
    """A10/A11 exact quantiles.  pandas ``.quantile`` uses linear
    interpolation, which Spark's exact ``percentile`` matches (NOT
    ``percentile_approx`` — SURVEY.md §4.3 trap 2).  All columns in one
    agg pass."""
    aggs = [
        F.percentile(
            F.when(null_or_nan(F.col(c), "float"), None).otherwise(
                F.col(c).cast("double")
            ),
            F.array(*[F.lit(p) for p in probs]),
        ).alias(c)
        for c in cols
    ]
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0].asDict()
    return {c: list(row[c]) if row[c] is not None else None for c in cols}


def quantiles_bucketed(
    df: DataFrame, col: str, probs: list[float], n_buckets: int = 256,
    max_distinct_for_driver: int = 8_000_000,
) -> list[float]:
    """EXACT linear-interpolation quantiles without the single-reducer
    value multiset that Spark's exact ``percentile`` carries (its
    partial state is every value — a scale-killer on wide columns).

    Adaptive physical strategy (r6, same policy as
    ``operators.ks.ks_2samp_auto``): the per-value histogram (one
    shuffle, map-side combined) is collected with
    ``limit(cap+1).toPandas()`` in ONE job — if it comes back with
    <= cap rows it IS the complete histogram and the order statistics
    are located on the driver with numpy (exact same interpolation);
    if it overflows, fall through to the fully distributed
    range-bucketed plan: per-value counts -> range buckets -> bucket
    totals prefix-summed on the driver (<= ``n_buckets`` rows) -> the
    <=2 order statistics each requested quantile needs located inside
    single buckets via per-bucket cumulative windows.  The driver
    never holds more than ``max_distinct_for_driver`` histogram rows
    (default 8M ~ 130 MB of (double, count) rows — measured faster
    than the distributed plan up to that size and comfortably inside
    an 8g driver; lower it on memory-tight drivers); work per reducer
    in the distributed path is bounded by the bucket's distinct values
    — nothing holds the full column multiset at any scale.  The old
    path always paid a persist plus THREE sequential driver jobs on
    the histogram.

    Matches pandas ``.quantile`` / numpy linear interpolation exactly
    (index = (n-1)*p; v = lo + frac*(hi-lo)).  Nulls/NaNs dropped.
    """
    import numpy as np

    v = F.when(null_or_nan(F.col(col), "float"), None).otherwise(
        F.col(col).cast("double")
    )
    per_val_plan = (
        df.select(v.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .count()
    )
    pdf = per_val_plan.limit(max_distinct_for_driver + 1).toPandas()
    if len(pdf) <= max_distinct_for_driver:
        if len(pdf) == 0:
            return [None for _ in probs]
        order = np.argsort(pdf["v"].to_numpy())
        vals = pdf["v"].to_numpy()[order]
        cum = pdf["count"].to_numpy()[order].cumsum()
        n = int(cum[-1])
        vmin, vmax = float(vals[0]), float(vals[-1])
        if n == 1 or vmin == vmax:
            return [vmin for _ in probs]
        out = []
        for p in probs:
            pos = (n - 1) * p
            k0, k1 = int(math.floor(pos)), int(math.ceil(pos))
            frac = pos - math.floor(pos)
            # val_at(k) = smallest v whose cumulative count exceeds k —
            # identical to the distributed plan's (prev <= k < cum) row
            v0 = float(vals[np.searchsorted(cum, k0, side="right")])
            v1 = float(vals[np.searchsorted(cum, k1, side="right")])
            out.append(v0 + frac * (v1 - v0))
        return out
    per_val = per_val_plan.persist()
    try:
        tot = per_val.agg(
            F.sum("count").alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
        ).collect()[0]
        n = int(tot["n"] or 0)
        if n == 0:
            return [None for _ in probs]
        vmin, vmax = float(tot["lo"]), float(tot["hi"])
        if n == 1 or vmin == vmax:
            return [vmin for _ in probs]
        # order-statistic indices needed (0-based), with interpolation
        wanted: dict[int, None] = {}
        locs = []
        for p in probs:
            pos = (n - 1) * p
            k0, k1 = int(math.floor(pos)), int(math.ceil(pos))
            wanted[k0] = None
            wanted[k1] = None
            locs.append((k0, k1, pos - math.floor(pos)))
        span = vmax - vmin
        bucket = F.least(
            F.floor((F.col("v") - F.lit(vmin)) / F.lit(span) * n_buckets),
            F.lit(n_buckets - 1),
        ).cast("int")
        pv = per_val.withColumn("bucket", bucket)
        btot = {
            r["bucket"]: r["t"]
            for r in pv.groupBy("bucket").agg(F.sum("count").alias("t")).collect()
        }
        # exclusive prefix: rows BEFORE each bucket
        offsets, acc = {}, 0
        for i in range(n_buckets):
            offsets[i] = acc
            acc += btot.get(i, 0)
        # map each wanted index to its bucket, then fetch inside it
        by_bucket: dict[int, list[int]] = {}
        for k in wanted:
            bi = max(b for b in offsets if offsets[b] <= k and btot.get(b, 0) > 0
                     and k < offsets[b] + btot.get(b, 0))
            by_bucket.setdefault(bi, []).append(k)
        w = Window.partitionBy("bucket").orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        off_expr = F.element_at(
            F.array(*[F.lit(offsets[i]) for i in range(n_buckets)]),
            F.col("bucket") + 1,
        )
        ranked = pv.filter(
            F.col("bucket").isin(list(by_bucket))
        ).select(
            "v",
            (off_expr + F.sum("count").over(w)).alias("cum"),  # rows <= v
            (off_expr + F.sum("count").over(w) - F.col("count")).alias("prev"),
        )
        ks = sorted(wanted)
        cond = None
        for k in ks:
            c = (F.col("prev") <= k) & (F.col("cum") > k)
            cond = c if cond is None else (cond | c)
        rows = ranked.filter(cond).collect()
        val_at: dict[int, float] = {}
        for r in rows:
            for k in ks:
                if r["prev"] <= k < r["cum"]:
                    val_at[k] = float(r["v"])
        return [
            val_at[k0] + frac * (val_at[k1] - val_at[k0])
            for k0, k1, frac in locs
        ]
    finally:
        per_val.unpersist()


def quantiles_bucketed_many(
    df: DataFrame, cols: list[str], probs: list[float], n_buckets: int = 64
) -> dict[str, list[float] | None]:
    """Multi-column :func:`quantiles_bucketed` — ONE long-form job for
    all columns (the engine-mode quantile path, VERDICT r02 item 3).

    Same algorithm per column: per-value counts (posexplode -> one
    shuffle, map-side combined) -> per-column range buckets -> bucket
    totals prefix-summed on the driver (<= n_cols * n_buckets tiny
    rows) -> the <=2 order statistics each quantile needs located via
    per-(column, bucket) cumulative windows.  No reducer ever holds a
    column's full value multiset (Spark's exact ``percentile`` state);
    work per task is bounded by one bucket's distinct values.

    Exact pandas/numpy linear interpolation; nulls/NaNs dropped.
    Columns with no non-null values map to ``None``.
    """
    if not cols:
        return {}
    k = len(cols)
    guarded = [
        F.when(null_or_nan(F.col(c), "float"), None).otherwise(
            F.col(c).cast("double")
        )
        for c in cols
    ]
    per_val = (
        df.select(F.posexplode(F.array(*guarded)).alias("ci", "v"))
        .filter(F.col("v").isNotNull())
        .groupBy("ci", "v")
        .count()
        .persist()
    )
    try:
        # lo/hi for degenerate early-outs; flo/fhi (finite-only) for the
        # range bucketing — pandas .quantile keeps +-inf in the order
        # statistics (they sort to the edges), so inf rows are KEPT and
        # routed to the edge buckets rather than poisoning the range
        finite = ~F.col("v").isin(float("inf"), float("-inf"))
        stats = {
            r["ci"]: r
            for r in per_val.groupBy("ci")
            .agg(
                F.sum("count").alias("n"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
                F.min(F.when(finite, F.col("v"))).alias("flo"),
                F.max(F.when(finite, F.col("v"))).alias("fhi"),
            )
            .collect()
        }
        out: dict[str, list[float] | None] = {}
        live: list[int] = []
        wanted_by_ci: dict[int, set[int]] = {}
        locs_by_ci: dict[int, list[tuple[int, int, float]]] = {}
        for i, c in enumerate(cols):
            r = stats.get(i)
            n = int(r["n"]) if r is not None else 0
            if n == 0:
                out[c] = None
                continue
            lo, hi = float(r["lo"]), float(r["hi"])
            if n == 1 or lo == hi:
                out[c] = [lo for _ in probs]
                continue
            wanted: set[int] = set()
            locs = []
            for p in probs:
                pos = (n - 1) * p
                k0, k1 = int(math.floor(pos)), int(math.ceil(pos))
                wanted.add(k0)
                wanted.add(k1)
                locs.append((k0, k1, pos - math.floor(pos)))
            live.append(i)
            wanted_by_ci[i] = wanted
            locs_by_ci[i] = locs
        if not live:
            return out
        live_set = set(live)
        B = n_buckets

        def _flo(i: int) -> float:
            v = stats[i]["flo"] if i in live_set else None
            return float(v) if v is not None else 0.0

        def _fspan(i: int) -> float:
            if i not in live_set:
                return 1.0
            lo, hi = stats[i]["flo"], stats[i]["fhi"]
            if lo is None or hi is None or float(hi) <= float(lo):
                return 1.0
            return float(hi) - float(lo)

        lo_e = F.element_at(
            F.array(*[F.lit(_flo(i)) for i in range(k)]), F.col("ci") + 1
        )
        span_e = F.element_at(
            F.array(*[F.lit(_fspan(i)) for i in range(k)]), F.col("ci") + 1
        )
        pv = per_val.filter(F.col("ci").isin(live)).withColumn(
            "bucket",
            F.when(F.col("v") == float("inf"), F.lit(B - 1))
            .when(F.col("v") == float("-inf"), F.lit(0))
            .otherwise(
                F.greatest(
                    F.least(
                        F.floor((F.col("v") - lo_e) / span_e * B), F.lit(B - 1)
                    ),
                    F.lit(0),
                )
            )
            .cast("int"),
        )
        btot = {
            (r["ci"], r["bucket"]): r["t"]
            for r in pv.groupBy("ci", "bucket")
            .agg(F.sum("count").alias("t"))
            .collect()
        }
        # exclusive prefix offsets (rows before each bucket), flat array
        # indexed ci*B + bucket; and the buckets each wanted order
        # statistic lives in
        offsets = [0] * (k * B)
        need: dict[int, set[int]] = {i: set() for i in live}
        for i in live:
            acc = 0
            for b in range(B):
                offsets[i * B + b] = acc
                acc += btot.get((i, b), 0)
            for kk in wanted_by_ci[i]:
                for b in range(B):
                    t = btot.get((i, b), 0)
                    if t > 0 and offsets[i * B + b] <= kk < offsets[i * B + b] + t:
                        need[i].add(b)
                        break
        pair_cond = None
        for i in live:
            if not need[i]:
                continue
            c = (F.col("ci") == i) & F.col("bucket").isin(sorted(need[i]))
            pair_cond = c if pair_cond is None else (pair_cond | c)
        w = Window.partitionBy("ci", "bucket").orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        off_expr = F.element_at(
            F.array(*[F.lit(x) for x in offsets]),
            F.col("ci") * B + F.col("bucket") + 1,
        )
        ranked = pv.filter(pair_cond).select(
            "ci",
            "v",
            (off_expr + F.sum("count").over(w)).alias("cum"),  # rows <= v
            (off_expr + F.sum("count").over(w) - F.col("count")).alias("prev"),
        )
        row_cond = None
        for i in live:
            ks = sorted(wanted_by_ci[i])
            sub = None
            for kk in ks:
                cc = (F.col("prev") <= kk) & (F.col("cum") > kk)
                sub = cc if sub is None else (sub | cc)
            cond_i = (F.col("ci") == i) & sub
            row_cond = cond_i if row_cond is None else (row_cond | cond_i)
        val_at: dict[tuple[int, int], float] = {}
        for r in ranked.filter(row_cond).collect():
            i = r["ci"]
            for kk in wanted_by_ci[i]:
                if r["prev"] <= kk < r["cum"]:
                    val_at[(i, kk)] = float(r["v"])
        for i in live:
            out[cols[i]] = [
                val_at[(i, k0)] + frac * (val_at[(i, k1)] - val_at[(i, k0)])
                for k0, k1, frac in locs_by_ci[i]
            ]
        return out
    finally:
        per_val.unpersist()


def rare_categories_fused(
    df: DataFrame,
    cols: list[str],
    threshold: float,
    list_cap: int = 10,
) -> dict[str, tuple[int, list | None]]:
    """A7 rare-category detection for MANY columns in ONE long-form job
    (VERDICT r02 item 2 — the plan FixDQ.transform already uses at
    operators/fix_dq.py:229-265, ported to the report path).

    Returns ``{col: (n_rare, values_or_None)}`` — ``values`` (in pandas
    ``value_counts`` order: count desc, first-appearance, value) is
    materialized ONLY when ``n_rare <= list_cap``, so the driver never
    collects more than ``list_cap * n_cols`` values no matter how many
    distinct values a (mis-classified) column has; columns above the
    cap report their exact rare count with ``None``.

    Columns are grouped by Spark dtype so collected values keep their
    Python types (a float32 categorical's rares must interpolate into
    the issue string as floats, not quoted strings).  The common
    all-string case is exactly one job.
    """
    out: dict[str, tuple[int, list | None]] = {}
    if not cols:
        return out
    by_type: dict[str, list[str]] = {}
    for c in cols:
        by_type.setdefault(df.schema[c].dataType.simpleString(), []).append(c)
    for group in by_type.values():
        long = df.select(
            F.monotonically_increasing_id().alias("__pos"),
            F.posexplode(F.array(*[F.col(c) for c in group])).alias("ci", "val"),
        ).filter(F.col("val").isNotNull())
        counts = (
            long.groupBy("ci", "val")
            .agg(F.count(F.lit(1)).alias("cnt"), F.min("__pos").alias("first"))
            .persist()
        )
        try:
            tot = {
                r["ci"]: r["t"]
                for r in counts.groupBy("ci").agg(F.sum("cnt").alias("t")).collect()
            }
            tot_expr = F.element_at(
                F.array(*[F.lit(tot.get(i, 1)) for i in range(len(group))]),
                F.col("ci") + 1,
            )
            rare = counts.filter((F.col("cnt") / tot_expr) < F.lit(threshold))
            sizes = {
                r["ci"]: r["k"]
                for r in rare.groupBy("ci").agg(F.count(F.lit(1)).alias("k")).collect()
            }
            small = [i for i, k in sizes.items() if 0 < k <= list_cap]
            lists: dict[int, list] = {i: [] for i in small}
            if small:
                for r in (
                    rare.filter(F.col("ci").isin(small))
                    .orderBy("ci", F.col("cnt").desc(), F.col("first"), F.col("val"))
                    .collect()
                ):
                    lists[r["ci"]].append(r["val"])
            for i, c in enumerate(group):
                k = sizes.get(i, 0)
                if k:
                    out[c] = (int(k), lists.get(i))
        finally:
            counts.unpersist()
    return out


def correlation_matrix(df: DataFrame, cols: list[str]) -> dict[tuple[str, str], float]:
    """A12: all k(k-1)/2 pairwise Pearson correlations in ONE agg.

    pandas ``DataFrame.corr`` is pairwise-complete-observations, which
    ``F.corr`` matches (null pairs skipped).  ml.stat.Correlation was
    rejected: requires vector assembly and null-drops whole rows.
    (reference: pandas_dq.py:428-443, 910-918)"""
    aggs = []
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            ca = F.when(null_or_nan(F.col(a), "float"), None).otherwise(
                F.col(a).cast("double")
            )
            cb = F.when(null_or_nan(F.col(b), "float"), None).otherwise(
                F.col(b).cast("double")
            )
            aggs.append(F.corr(ca, cb).alias(f"{a}::{b}"))
            pairs.append((a, b))
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0].asDict()
    return {(a, b): row[f"{a}::{b}"] for a, b in pairs}


def value_counts(
    df: DataFrame, col: str, normalize: bool = True, drop_null: bool = True
) -> list[tuple[object, float]]:
    """A7/A14: per-value frequencies.  pandas ``value_counts(
    normalize=True)`` excludes NaN from the denominator (verified;
    SURVEY.md §4.3 trap 4)."""
    # pandas tie-break: values with EQUAL counts keep first-appearance
    # order (hashtable insertion).  Reproduce with min(monotonic id) —
    # monotone in scan order for parquet / createDataFrame inputs.
    # When the input's lineage contains a shuffle (e.g. the dedup
    # before dq_report) partition row order is not scan order, so the
    # value itself is the FINAL tie-break: the result stays fully
    # deterministic even where first-appearance order is undefined.
    d = df.select(F.col(col), F.monotonically_increasing_id().alias("__pos"))
    if drop_null:
        d = d.filter(F.col(col).isNotNull())
    total = None
    counts = d.groupBy(col).agg(
        F.count(F.lit(1)).alias("count"), F.min("__pos").alias("__first")
    )
    rows = counts.orderBy(
        F.col("count").desc(), F.col("__first"), F.col(col)
    ).collect()
    if normalize:
        total = sum(r["count"] for r in rows) or 1
        return [(r[col], r["count"] / total) for r in rows]
    return [(r[col], r["count"]) for r in rows]
