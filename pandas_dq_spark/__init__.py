"""pandas_dq_spark — a PySpark-native data-quality & web-corpus
quality-filter engine with the capabilities of AutoViML/pandas_dq.

Public API mirrors the reference's four entry points
(pandas_dq.py:51/659/1064/1199/1364) plus the web-text pipeline the
north rule mandates (see BASELINE.json / SURVEY.md §7).
"""

from .functions.corpus import (
    chunk_documents,
    deterministic_sample,
    pack_chunks,
    stratified_mix,
    term_stats,
    tfidf_top_terms,
)
from .operators.classify import classify_columns
from .operators.dc_report import build_dc_report, dc_report
from .operators.dedup import (
    DedupCacheHandle,
    connected_components,
    decontaminate,
    mark_contaminated,
    near_dedup,
    release_dedup_caches,
)
from .operators.dq_report import DQReport, build_dq_report, dq_report
from .operators.fix_dq import FixDQ, FixDQState
from .operators.ks import (
    ks_2samp_arrays,
    ks_2samp_auto,
    ks_2samp_df,
    ks_2samp_many,
)
from .operators.schema_checker import DataSchemaChecker
from .operators.mixed_types import mixed_type_report
from .operators.setops import (
    compare_unique,
    find_remove_columns_with_infinity,
    left_subtract,
)
from .plans.profile import (
    ProfileState,
    correlation_matrix,
    duplicate_row_count,
    profile,
    quantiles,
    quantiles_bucketed,
)
from .session import get_spark
from .sources.io import write_training_shards
from .webtext.linededup import frequent_lines, remove_repeated_lines
from .webtext.training import prepare_training_corpus
from .webtext.urls import filter_blocklisted_hosts, normalize_url, url_host

# reference compatibility aliases (pandas_dq names)
Fix_DQ = FixDQ
EDA_find_remove_columns_with_infinity = find_remove_columns_with_infinity


def write_to_html(report, filename: str = "dq_report.html") -> str:
    """S7 html sink (pandas_dq.py:547-590): render a DQReport or any
    small Spark DataFrame to an HTML file (no browser open)."""
    from .operators.dq_report import DQReport

    if isinstance(report, DQReport):
        return report.to_html(filename)
    rows = report.limit(10_000).collect()
    hdr = "".join(f"<th>{c}</th>" for c in report.columns)
    body = "".join(
        "<tr>" + "".join(f"<td>{v}</td>" for v in r) + "</tr>" for r in rows
    )
    html = f"<html><body><table border='1'><tr>{hdr}</tr>{body}</table></body></html>"
    with open(filename, "w") as f:
        f.write(html)
    return filename

__all__ = [
    "DQReport",
    "EDA_find_remove_columns_with_infinity",
    "find_remove_columns_with_infinity",
    "mixed_type_report",
    "write_to_html",
    "DataSchemaChecker",
    "DedupCacheHandle",
    "release_dedup_caches",
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
    "ks_2samp_auto",
    "ks_2samp_df",
    "ks_2samp_many",
    "left_subtract",
    "profile",
    "quantiles",
    "quantiles_bucketed",
    # training-data toolkit (r5)
    "chunk_documents",
    "connected_components",
    "decontaminate",
    "deterministic_sample",
    "filter_blocklisted_hosts",
    "frequent_lines",
    "mark_contaminated",
    "near_dedup",
    "normalize_url",
    "pack_chunks",
    "prepare_training_corpus",
    "remove_repeated_lines",
    "stratified_mix",
    "term_stats",
    "tfidf_top_terms",
    "url_host",
    "write_training_shards",
]
