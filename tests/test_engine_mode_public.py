"""Public-API engine mode (VERDICT r03 items 1, 2, 8).

Round 3 left the scale-safe plans (`quantiles_bucketed_many`,
`approx_count_distinct`, `duplicate_row_count_hashed`) reachable only
through private APIs; these tests pin that `dq_report(exact=False)` /
`dc_report(exact=False)` now reach them from the documented entry
points, that `exact=None` auto-selects by row count, and that FixDQ's
oversized-rare-set fallback joins instead of windowing by value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pandas_dq_spark import FixDQ, dc_report, dq_report
from pandas_dq_spark.operators import dc_report as dc_mod
from pandas_dq_spark.operators.dc_report import build_dc_report

from .fixtures import messy_sdf


@pytest.fixture(scope="module")
def messy(spark):
    return messy_sdf(spark)


class _PlanRecorder:
    """Record the query-execution string of every DataFrame.collect()
    issued while active (build_dq_report is eager, so the 'plan' of a
    report run is the set of plans of its internal jobs)."""

    def __init__(self, monkeypatch, sample_df):
        self.plans: list[str] = []
        # the fused profile agg has hundreds of expressions; default
        # plan rendering truncates at 25 fields and would hide the
        # percentile/xxhash64 expressions these tests assert on
        sample_df.sparkSession.conf.set(
            "spark.sql.debug.maxToStringFields", "100000"
        )
        cls = type(sample_df)
        orig = cls.collect

        def recording_collect(df):
            self.plans.append(df._jdf.queryExecution().toString())
            return orig(df)

        monkeypatch.setattr(cls, "collect", recording_collect)

    def joined(self) -> str:
        return "\n".join(self.plans)


def test_public_dq_report_engine_mode_plans(messy, monkeypatch):
    sdf, _ = messy
    rec = _PlanRecorder(monkeypatch, sdf)
    dq_report(sdf, exact=False, verbose=-1)
    plans = rec.joined()
    assert rec.plans, "recorder captured no jobs"
    # no exact-percentile aggregate (single-reducer value multiset)
    assert "percentile(" not in plans
    # no Expand from multi-column exact count(DISTINCT)
    assert "Expand" not in plans
    # dup count shuffles a 64-bit hash, not full rows
    assert "xxhash64" in plans


def test_public_dq_report_parity_mode_unchanged(messy, monkeypatch):
    sdf, _ = messy
    rec = _PlanRecorder(monkeypatch, sdf)
    dq_report(sdf, exact=True, verbose=-1)
    plans = rec.joined()
    # sanity check the recorder actually sees the parity plans (guards
    # the engine-mode assertions above against false negatives)
    assert "percentile(" in plans
    assert "xxhash64" not in plans


def test_public_dq_report_auto_selects_by_row_count(messy, monkeypatch):
    sdf, _ = messy
    # 2000 rows >= a 500-row cap -> bounded limit-probe flips to engine
    rec = _PlanRecorder(monkeypatch, sdf)
    dq_report(sdf, verbose=-1, sample_cap_rows=500)
    assert "percentile(" not in rec.joined()
    assert "xxhash64" in rec.joined()


def test_public_dq_report_auto_parity_below_threshold(messy, monkeypatch):
    sdf, _ = messy
    rec = _PlanRecorder(monkeypatch, sdf)
    dq_report(sdf, verbose=-1)  # 2000 rows << 1M default cap
    assert "percentile(" in rec.joined()


def test_engine_mode_findings_close_to_parity(messy):
    sdf, _ = messy
    par = dq_report(sdf, exact=True, verbose=-1).toPandas()
    eng = dq_report(sdf, exact=False, verbose=-1).toPandas()
    assert list(par.columns) == list(eng.columns)
    assert len(par) == len(eng)
    # quantile-derived findings are exact in both modes (bucketed path
    # is exact); distinct-derived text can differ only via HLL error,
    # which is zero at these cardinalities except for near-ID columns
    same = (par["dq_issue"] == eng["dq_issue"]).mean()
    assert same >= 0.9, eng[par["dq_issue"] != eng["dq_issue"]]


def test_public_dc_report_engine_mode(spark, monkeypatch):
    rng = np.random.default_rng(7)
    n = 1200
    pdf_tr = pd.DataFrame(
        {
            "wide_float": rng.normal(0, 1, n),  # ~n distinct
            "narrow_float": rng.choice([0.5, 1.5, 2.5], n),
            "label": rng.choice([0, 1], n).astype("int64"),
        }
    )
    pdf_te = pdf_tr.copy()
    pdf_te["narrow_float"] = rng.choice([0.5, 1.5, 9.5], n)
    tr, te = spark.createDataFrame(pdf_tr), spark.createDataFrame(pdf_te)

    # parity: the reference's 'NA'->0 quirk sends BOTH float columns
    # to KS regardless of cardinality
    _, _, diff_par = build_dc_report(tr, te, exact=True)
    assert "KS test statistic" in (diff_par["narrow_float"] or "")

    # engine mode with a lowered cap: the unbounded-cardinality float
    # is gated out of the KS job, the narrow one still runs
    monkeypatch.setattr(dc_mod, "KS_ENGINE_DISTINCT_CAP", 50)
    _, _, diff_eng = build_dc_report(tr, te, exact=False)
    assert "KS test statistic" not in (diff_eng["wide_float"] or "")
    assert "KS test statistic" in (diff_eng["narrow_float"] or "")

    # public entry point accepts the flag and returns the same schema
    out = dc_report(tr, te, exact=False)
    assert out.columns == [
        "column_name",
        "dq_issue_train",
        "dq_issue_test",
        "distribution_difference",
    ]
    assert out.count() == 3


def test_fixdq_oversized_rare_set_joins_not_windows(spark):
    rng = np.random.default_rng(11)
    n = 4000
    # dominant fill: >50% of rows null -> imputed to "missing" (the
    # hot key the old per-value window would single-task); the rest is
    # a long tail of values each below the 1% rare threshold
    vals = np.array([f"tail_{i:05d}" for i in range(400)])
    col = np.where(
        rng.random(n) < 0.6, None, rng.choice(vals, n)
    )
    pdf = pd.DataFrame({"cat": pd.Series(col, dtype="object"),
                        "x": rng.normal(0, 1, n)})
    sdf = spark.createDataFrame(pdf)

    fx = FixDQ(rare_isin_cap=50)  # 400 rare values >> cap -> join path
    out = fx.fit_transform(sdf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "per-value window stage still present"
    assert "Join" in plan
    # rare set (400 values) is far below RARE_BROADCAST_CAP
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan

    got = out.toPandas().sort_values("x").reset_index(drop=True)
    # reference semantics oracle via the small isin path
    ref = (
        FixDQ(rare_isin_cap=10_000_000)
        .fit_transform(sdf)
        .toPandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)
    # the dominant fill is NOT rare; every tail value (freq < 1%) is
    counts = pd.Series([v for v in col if v is not None]).value_counts()
    assert (got["cat"] == "missing").sum() == pd.isna(pdf["cat"]).sum()
    rare_expected = {v for v in counts.index if counts[v] / counts.sum() < 0.01}
    if rare_expected == set(counts.index):
        assert set(got.loc[got["cat"] != "missing", "cat"]) == {"Rare"}


def test_engine_mode_dup_drop_hashed(messy, monkeypatch):
    sdf, _ = messy
    dup = sdf.unionByName(sdf.limit(50))  # 50 exact duplicate rows
    rec = _PlanRecorder(monkeypatch, sdf)
    eng = dq_report(dup, exact=False, verbose=-1).toPandas()
    # the dedup-drop path grouped on the 64-bit row hash, not full rows
    assert "__rowhash" in rec.joined()
    par = dq_report(dup, exact=True, verbose=-1).toPandas()
    # duplicate finding and post-drop profile agree across modes
    assert (par["dq_issue"] == eng["dq_issue"]).mean() >= 0.9
    assert list(par["missing_values_pct"]) == list(eng["missing_values_pct"])


def test_fixdq_auto_selects_engine_mode_on_large_frame(spark, monkeypatch, capsys):
    """r5 (VERDICT r04 item 3): FixDQ defaults to engine_mode=None and
    auto-selects by row count with the same bounded limit probe as
    dq_report — on a >=1M-row frame the fit plans must contain no
    exact-percentile aggregate and no Expand."""
    import pyspark.sql.functions as F

    big = (
        spark.range(1_100_000)
        .select(
            F.col("id"),
            (F.rand(7) * 100).alias("x"),
            F.when(F.rand(11) < 0.5, "a").otherwise("b").alias("cat"),
        )
    )
    rec = _PlanRecorder(monkeypatch, big)
    fx = FixDQ()
    fx.fit(big)
    assert fx.resolved_engine_mode_ is True
    assert "engine mode" in capsys.readouterr().out
    plans = rec.joined()
    assert rec.plans, "recorder captured no jobs"
    assert "percentile(" not in plans
    assert "Expand" not in plans
    # the true ID column survives engine-mode (HLL-band) detection
    assert fx.state.id_cols_ == ["id"]


def test_fixdq_auto_parity_below_threshold(messy):
    sdf, _ = messy
    fx = FixDQ()
    fx.fit(sdf)  # 2000 rows << 1M
    assert fx.resolved_engine_mode_ is False


def test_classify_columns_engine_mode(spark, monkeypatch):
    """r5: classify_columns(exact=False) profiles without Expand and
    still lands the role lists (HLL-band all-unique cascades)."""
    import numpy as np
    import pandas as pd

    from pandas_dq_spark.operators.classify import classify_columns

    rng = np.random.default_rng(5)
    n = 3000
    pdf = pd.DataFrame(
        {
            "rowid": np.arange(n),  # int, out of date range -> id
            "amount": rng.normal(50, 10, n),
            "grp": rng.choice(["x", "y", "z"], n),
        }
    )
    sdf = spark.createDataFrame(pdf)
    rec = _PlanRecorder(monkeypatch, sdf)
    roles_eng = classify_columns(sdf, exact=False)
    assert "Expand" not in rec.joined()
    roles_par = classify_columns(sdf, exact=True)
    assert roles_eng == roles_par
    assert roles_par["id_vars"] == ["rowid"]
    assert roles_par["cat_vars"] == ["grp"]
    assert roles_par["continuous_vars"] == ["amount"]
