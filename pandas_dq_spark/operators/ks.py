"""Two-sample Kolmogorov-Smirnov statistic as a distributed operator.

The reference calls ``scipy.stats.ks_2samp`` on two in-memory columns
(pandas_dq.py:1308-1320).  Spark has no builtin, so this is a custom
*algorithm* (not a planner extension, SURVEY.md §7.2): union the two
tagged samples, group by value (one shuffle, map-side combined), and
take the max gap between the two empirical CDFs via RANGE-BUCKETED
window cumulative sums — per-bucket cumsum in parallel plus
driver-side prefix offsets over the tiny bucket-total table.  Exact,
no global single-task sort at any scale.

D = sup_x |F1(x) - F2(x)| computed at every observed value; ties are
handled by evaluating the CDFs AFTER all rows of an equal value (group
by value first), which is exactly scipy's convention
(``searchsorted(..., side='right')``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_2samp_df(
    df1: DataFrame, col1: str, df2: DataFrame, col2: str, n_buckets: int = 256
) -> float:
    """Exact two-sample KS statistic between ``df1[col1]`` and
    ``df2[col2]`` (nulls/NaNs dropped, like ``.dropna()`` at
    pandas_dq.py:1317).

    Fully distributed: per-value counts (one shuffle with map-side
    combine), then cumulative CDFs via RANGE-BUCKETED windows — each
    of ``n_buckets`` value ranges cumsums locally in parallel, and the
    driver prefix-sums only the ≤``n_buckets`` bucket totals into
    literal offsets.  No global single-task sort at any size."""
    a = (
        df1.select(F.col(col1).cast("double").alias("v"))
        .where(F.col("v").isNotNull() & ~F.isnan("v"))
        .withColumn("tag", F.lit(1))
    )
    b = (
        df2.select(F.col(col2).cast("double").alias("v"))
        .where(F.col("v").isNotNull() & ~F.isnan("v"))
        .withColumn("tag", F.lit(0))
    )
    u = a.unionByName(b)
    # collapse ties first: per distinct value, counts in each sample
    per_val = u.groupBy("v").agg(
        F.sum("tag").alias("c1"),
        F.sum(1 - F.col("tag")).alias("c2"),
    ).persist()
    try:
        tot = per_val.agg(
            F.sum("c1").alias("n1"),
            F.sum("c2").alias("n2"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        ).collect()[0]
        n1, n2 = tot["n1"] or 0, tot["n2"] or 0
        if n1 == 0 or n2 == 0:
            return float("nan")
        vmin, vmax = float(tot["vmin"]), float(tot["vmax"])
        if vmin == vmax:  # single distinct value: CDFs jump together
            return 0.0
        span = vmax - vmin
        bucket = F.least(
            F.floor((F.col("v") - F.lit(vmin)) / F.lit(span) * n_buckets),
            F.lit(n_buckets - 1),
        ).cast("int")
        pv = per_val.withColumn("bucket", bucket)
        # bucket totals -> driver prefix sums (tiny), exclusive offsets
        btot = {
            r["bucket"]: (r["t1"], r["t2"])
            for r in pv.groupBy("bucket")
            .agg(F.sum("c1").alias("t1"), F.sum("c2").alias("t2"))
            .collect()
        }
        off1, off2, acc1, acc2 = [], [], 0, 0
        for i in range(n_buckets):
            off1.append(acc1)
            off2.append(acc2)
            t = btot.get(i)
            if t:
                acc1 += t[0]
                acc2 += t[1]
        w = Window.partitionBy("bucket").orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        o1 = F.element_at(F.array(*[F.lit(x) for x in off1]), F.col("bucket") + 1)
        o2 = F.element_at(F.array(*[F.lit(x) for x in off2]), F.col("bucket") + 1)
        gaps = pv.select(
            F.abs(
                (F.sum("c1").over(w) + o1) / F.lit(float(n1))
                - (F.sum("c2").over(w) + o2) / F.lit(float(n2))
            ).alias("gap")
        )
        out = gaps.agg(F.max("gap").alias("d")).collect()[0]["d"]
        return float(out)
    finally:
        per_val.unpersist()


def ks_2samp_auto(
    df1: DataFrame, col1: str, df2: DataFrame, col2: str,
    max_distinct_for_driver: int = 100_000,
) -> float:
    """Exact KS with an adaptive physical strategy: group the union by
    value (map-side partial agg, one small shuffle), and if the
    distinct-value histogram is small enough, finish the cumulative
    max on the driver — avoiding the global-window single-task sort
    that ``ks_2samp_df`` pays.  Above the threshold the fully
    distributed window plan (``ks_2samp_df``) is the engine-mode
    default — the driver never sees more than ``max_distinct_for_
    driver`` histogram rows (default 100k ~ 1.6 MB).

    r6: the cardinality probe and the histogram collect are ONE job —
    ``limit(cap+1).toPandas()``: if the limited collect comes back
    with <= cap rows it necessarily IS the complete histogram, and if
    it overflows we learned the cardinality exceeds the cap for the
    price of a bounded collect.  The old ``count()`` + ``toPandas()``
    pair computed the whole union+aggregation twice (nothing was
    persisted between the jobs)."""
    a = (
        df1.select(F.col(col1).cast("double").alias("v"))
        .where(F.col("v").isNotNull() & ~F.isnan("v"))
        .withColumn("tag", F.lit(1))
    )
    b = (
        df2.select(F.col(col2).cast("double").alias("v"))
        .where(F.col("v").isNotNull() & ~F.isnan("v"))
        .withColumn("tag", F.lit(0))
    )
    per_val = (
        a.unionByName(b)
        .groupBy("v")
        .agg(F.sum("tag").alias("c1"), F.sum(1 - F.col("tag")).alias("c2"))
    )
    pdf = per_val.limit(max_distinct_for_driver + 1).toPandas()
    if len(pdf) > max_distinct_for_driver:
        return ks_2samp_df(df1, col1, df2, col2)
    import numpy as np

    pdf = pdf.sort_values("v")
    n1, n2 = pdf["c1"].sum(), pdf["c2"].sum()
    if n1 == 0 or n2 == 0:
        return float("nan")
    gaps = np.abs(pdf["c1"].cumsum() / n1 - pdf["c2"].cumsum() / n2)
    return float(gaps.max())


def ks_2samp_many(
    df1: DataFrame, df2: DataFrame, cols: list[str], n_buckets: int = 64
) -> dict[str, float]:
    """Exact KS for MANY numeric columns in ONE job (dc_report batch
    path, VERDICT r01 item 8).

    Long form via posexplode -> (col_idx, value, tag), one groupBy
    with map-side combine — then the SAME range-bucketing as
    ``ks_2samp_df`` applied per column (VERDICT r02 item 4): cumulative
    CDFs run under windows partitioned by (col_idx, value-range bucket)
    with driver-computed prefix offsets over the tiny per-(column,
    bucket) total table.  A 10^9-distinct column therefore spreads over
    ``n_buckets`` tasks instead of landing its whole histogram in ONE
    task (the r02 scale bug).  Exact at any cardinality."""
    if not cols:
        return {}

    def longform(df: DataFrame, tag: int) -> DataFrame:
        arr = F.array(*[F.col(c).cast("double") for c in cols])
        return (
            df.select(F.posexplode(arr).alias("ci", "v"))
            .filter(F.col("v").isNotNull() & ~F.isnan("v"))
            .withColumn("tag", F.lit(tag))
        )

    k = len(cols)
    out = {c: float("nan") for c in cols}
    u = longform(df1, 1).unionByName(longform(df2, 0))
    per_val = u.groupBy("ci", "v").agg(
        F.sum("tag").alias("c1"), F.sum(1 - F.col("tag")).alias("c2")
    ).persist()
    try:
        # per-column totals + value range: k tiny rows to the driver
        stats = {
            r["ci"]: r
            for r in per_val.groupBy("ci")
            .agg(
                F.sum("c1").alias("n1"),
                F.sum("c2").alias("n2"),
                F.min("v").alias("vmin"),
                F.max("v").alias("vmax"),
            )
            .collect()
        }
        live: list[int] = []
        for i, c in enumerate(cols):
            r = stats.get(i)
            if r is None or (r["n1"] or 0) == 0 or (r["n2"] or 0) == 0:
                continue  # a side empty -> NaN (scipy would raise)
            if float(r["vmin"]) == float(r["vmax"]):
                out[c] = 0.0  # single distinct value: CDFs jump together
                continue
            live.append(i)
        if not live:
            return out
        live_set = set(live)
        B = n_buckets

        def arr_by_ci(vals: list[float]) -> F.Column:
            return F.element_at(
                F.array(*[F.lit(x) for x in vals]), F.col("ci") + 1
            )

        vmin_e = arr_by_ci(
            [float(stats[i]["vmin"]) if i in live_set else 0.0 for i in range(k)]
        )
        span_e = arr_by_ci(
            [
                float(stats[i]["vmax"]) - float(stats[i]["vmin"])
                if i in live_set
                else 1.0
                for i in range(k)
            ]
        )
        pv = per_val.filter(F.col("ci").isin(live)).withColumn(
            "bucket",
            F.least(
                F.floor((F.col("v") - vmin_e) / span_e * B), F.lit(B - 1)
            ).cast("int"),
        )
        # (column, bucket) totals -> driver prefix sums (<= k*B rows),
        # exclusive offsets as flat literal arrays indexed ci*B+bucket
        btot = {
            (r["ci"], r["bucket"]): (r["t1"], r["t2"])
            for r in pv.groupBy("ci", "bucket")
            .agg(F.sum("c1").alias("t1"), F.sum("c2").alias("t2"))
            .collect()
        }
        off1 = [0] * (k * B)
        off2 = [0] * (k * B)
        for i in live:
            a1 = a2 = 0
            for b in range(B):
                off1[i * B + b] = a1
                off2[i * B + b] = a2
                t = btot.get((i, b))
                if t:
                    a1 += t[0]
                    a2 += t[1]
        idx = F.col("ci") * B + F.col("bucket") + 1
        o1 = F.element_at(F.array(*[F.lit(x) for x in off1]), idx)
        o2 = F.element_at(F.array(*[F.lit(x) for x in off2]), idx)
        n1_e = arr_by_ci(
            [float(stats[i]["n1"]) if i in live_set else 1.0 for i in range(k)]
        )
        n2_e = arr_by_ci(
            [float(stats[i]["n2"]) if i in live_set else 1.0 for i in range(k)]
        )
        w = Window.partitionBy("ci", "bucket").orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        gaps = pv.select(
            "ci",
            F.abs(
                (F.sum("c1").over(w) + o1) / n1_e
                - (F.sum("c2").over(w) + o2) / n2_e
            ).alias("gap"),
        )
        for r in gaps.groupBy("ci").agg(F.max("gap").alias("d")).collect():
            out[cols[r["ci"]]] = float(r["d"])
        return out
    finally:
        per_val.unpersist()


def ks_2samp_arrays(x, y) -> float:
    """Driver-side exact KS for small collected samples (used by
    dc_report where the qualifying columns have <10 distinct values —
    their histograms already sit in the profile pass, so no extra
    cluster job is needed; SURVEY.md §3.3)."""
    import numpy as np

    x = np.sort(np.asarray(x, dtype=float))
    y = np.sort(np.asarray(y, dtype=float))
    n1, n2 = x.size, y.size
    if n1 == 0 or n2 == 0:
        return float("nan")
    allv = np.concatenate([x, y])
    cdf1 = np.searchsorted(x, allv, side="right") / n1
    cdf2 = np.searchsorted(y, allv, side="right") / n2
    return float(np.abs(cdf1 - cdf2).max())


def ks_2samp_from_histogram(hist1: dict, hist2: dict) -> float:
    """Exact KS from value->count histograms (for low-cardinality
    columns the full histogram is tiny regardless of row count)."""
    vals = sorted(set(hist1) | set(hist2))
    n1 = sum(hist1.values())
    n2 = sum(hist2.values())
    if n1 == 0 or n2 == 0:
        return float("nan")
    c1 = c2 = 0
    d = 0.0
    for v in vals:
        c1 += hist1.get(v, 0)
        c2 += hist2.get(v, 0)
        d = max(d, abs(c1 / n1 - c2 / n2))
    return d
