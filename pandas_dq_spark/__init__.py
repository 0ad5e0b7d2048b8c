"""pandas_dq_spark — a PySpark-native data-quality & web-corpus
quality-filter engine with the capabilities of AutoViML/pandas_dq.

Public API mirrors the reference's four entry points
(pandas_dq.py:51/659/1064/1199/1364) plus the web-text pipeline the
north rule mandates (see BASELINE.json / SURVEY.md §7).
"""

from .operators.classify import classify_columns
from .operators.dc_report import build_dc_report, dc_report
from .operators.dq_report import DQReport, build_dq_report, dq_report
from .operators.fix_dq import FixDQ, FixDQState
from .operators.ks import ks_2samp_arrays, ks_2samp_df
from .operators.schema_checker import DataSchemaChecker
from .operators.setops import compare_unique, left_subtract
from .plans.profile import (
    ProfileState,
    correlation_matrix,
    duplicate_row_count,
    profile,
    quantiles,
)
from .session import get_spark

# reference compatibility alias (class name in pandas_dq is Fix_DQ)
Fix_DQ = FixDQ

__all__ = [
    "DQReport",
    "DataSchemaChecker",
    "FixDQ",
    "Fix_DQ",
    "FixDQState",
    "ProfileState",
    "build_dc_report",
    "build_dq_report",
    "classify_columns",
    "compare_unique",
    "correlation_matrix",
    "dc_report",
    "dq_report",
    "duplicate_row_count",
    "get_spark",
    "ks_2samp_arrays",
    "ks_2samp_df",
    "left_subtract",
    "profile",
    "quantiles",
]
