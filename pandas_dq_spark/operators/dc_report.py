"""Distributed ``dc_report`` train/test drift comparison
(reference: pandas_dq.py:1199-1362).

Two fused profile passes (one per side) + ONE fused KS job covering
every qualifying column (ks_2samp_many).  Qualification reproduces the
reference gate (1308): both sides numeric AND ``count_unique < 10``
where count_unique is derived from the int-truncated Unique Values% —
note the quirk that float columns report 'NA' which maps to 0, so
EVERY float column passes the gate and gets a KS test, exactly like
the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .dq_report import DQReport, build_dq_report
from .ks import ks_2samp_many

SHORT_SCHEMA = (
    "column_name string, dq_issue_train string, dq_issue_test string, "
    "distribution_difference string"
)

FULL_SCHEMA = (
    "column_name string, data_type_train string, data_type_test string, "
    "missing_values_pct_train double, missing_values_pct_test double, "
    "unique_values_pct_train string, unique_values_pct_test string, "
    "minimum_value_train string, minimum_value_test string, "
    "maximum_value_train string, maximum_value_test string, "
    "dq_issue_train string, dq_issue_test string, distribution_difference string"
)


# engine-mode-only gate (NON-parity, documented): columns whose
# (approx) distinct count exceeds this skip the KS test entirely.  The
# reference's 'NA'→0 quirk sends EVERY float column to KS; parity mode
# reproduces that, but at 10^12 rows an unbounded-cardinality float
# column contributes an unbounded per-value shuffle to the fused KS
# job, so engine mode bounds the per-column work instead.
KS_ENGINE_DISTINCT_CAP = 100_000


def build_dc_report(
    train: DataFrame,
    test: DataFrame,
    exclude: list[str] | None = None,
    exact: bool = True,
) -> tuple[DQReport, DQReport, dict[str, str | None]]:
    exclude = exclude or []
    for e in exclude:
        if e in train.columns:
            train = train.drop(e)
        else:
            print("Column %s not found in train" % e)
        if e in test.columns:
            test = test.drop(e)
        else:
            print("Column %s not found in train" % e)
    if train.columns != test.columns:
        raise ValueError(
            "The two dataframes dont have the same columns. Use exclude argument to exclude columns from comparison."
        )

    rep_tr = build_dq_report(train, exact=exact)
    rep_te = build_dq_report(test, exact=exact)

    # gather every column that passes the KS gate, then compute ALL
    # the KS statistics in ONE job (ks_2samp_many) instead of one
    # union+groupBy+window job per column
    def _qualifies(col: str) -> bool:
        unique_train = rep_tr.unique_pct[col]
        unique_test = rep_te.unique_pct[col]
        count_unique_train = (
            0 if unique_train == "NA" else rep_tr.n_rows * (unique_train / 100)
        )
        count_unique_test = (
            0 if unique_test == "NA" else rep_te.n_rows * (unique_test / 100)
        )
        numeric = _kind(train, col) in ("int", "float") and _kind(test, col) in (
            "int",
            "float",
        )
        if not (
            numeric
            and count_unique_train < 10
            and count_unique_test < 10
            and rep_tr.missing_pct[col] < 100
            and rep_te.missing_pct[col] < 100
        ):
            return False
        if not exact:
            # engine mode: bound the fused KS job — skip columns whose
            # (approx) distinct count is unbounded (non-parity; the
            # reference has no such gate because scipy.ks_2samp on an
            # in-memory sample never meets this regime)
            if (
                rep_tr.n_distinct.get(col, 0) > KS_ENGINE_DISTINCT_CAP
                or rep_te.n_distinct.get(col, 0) > KS_ENGINE_DISTINCT_CAP
            ):
                return False
        return True

    ks_cols = [c for c in train.columns if _qualifies(c)]
    ks_stats = ks_2samp_many(train, test, ks_cols)

    dist_diff: dict[str, str | None] = {}
    for col in train.columns:
        missing_train = rep_tr.missing_pct[col]
        missing_test = rep_te.missing_pct[col]
        unique_train = rep_tr.unique_pct[col]
        unique_test = rep_te.unique_pct[col]

        s = ""
        if col in ks_stats:
            ks = ks_stats[col]
            if ks > 0:
                s += f"The distributions of {col} are different with a KS test statistic of {ks:.3f}. "
        if missing_train != missing_test:
            s += f"The percentage of missing values of {col} are different between train ({missing_train:.2f}%) and test ({missing_test:.2f}%). "
        if unique_train != unique_test:
            if unique_train == "NA" or unique_test == "NA":
                s += f"The data types of {col} are different between train: {rep_tr.data_type[col]} and test: {rep_te.data_type[col]}. "
            else:
                s += f"The percentage of unique values of {col} are different between train ({unique_train:.2f}%) and test ({unique_test:.2f}%). "
        dist_diff[col] = s if s != "" else None
    return rep_tr, rep_te, dist_diff


def _kind(df: DataFrame, col: str) -> str:
    from ..plans.profile import col_kind

    return col_kind(df.schema[col].dataType)


def dc_report(
    train: DataFrame,
    test: DataFrame,
    exclude: list[str] | None = None,
    html: bool = False,
    verbose: int = 0,
    spark: SparkSession | None = None,
    exact: bool | None = None,
) -> DataFrame:
    """Public train/test drift entry point (pandas_dq.py:1199).

    ``exact`` mirrors :func:`dq_report`'s flag: ``True`` = parity
    plans, ``False`` = engine plans (bucketed quantiles,
    approx-distinct, hashed dup counts, KS bounded by
    ``KS_ENGINE_DISTINCT_CAP``).  ``None`` auto-selects by row count
    on either side via a bounded ``limit`` probe.
    """
    spark = spark or train.sparkSession
    if exact is None:
        from .dq_report import SAMPLE_CAP_ROWS, _at_least_rows

        exact = not (
            _at_least_rows(train, SAMPLE_CAP_ROWS)
            or _at_least_rows(test, SAMPLE_CAP_ROWS)
        )
        if not exact:
            # same visibility as dq_report's auto-flip (ADVICE r04)
            print(
                f"Alert: Detected dataframe size >= {SAMPLE_CAP_ROWS} rows. "
                "Using scale-safe engine mode (pass exact=True for "
                "reference-parity plans)."
            )
    rep_tr, rep_te, dist_diff = build_dc_report(train, test, exclude, exact=exact)
    cols = rep_tr.columns
    if verbose:
        rows = [
            (
                c,
                rep_tr.data_type[c],
                rep_te.data_type[c],
                float(rep_tr.missing_pct[c]),
                float(rep_te.missing_pct[c]),
                str(rep_tr.unique_pct[c]),
                str(rep_te.unique_pct[c]),
                rep_tr.min_val[c],
                rep_te.min_val[c],
                rep_tr.max_val[c],
                rep_te.max_val[c],
                rep_tr.issues[c],
                rep_te.issues[c],
                dist_diff[c],
            )
            for c in cols
        ]
        return spark.createDataFrame(rows, FULL_SCHEMA)
    rows = [
        (c, rep_tr.issues[c], rep_te.issues[c], dist_diff[c]) for c in cols
    ]
    return spark.createDataFrame(rows, SHORT_SCHEMA)
