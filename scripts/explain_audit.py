#!/usr/bin/env python
"""Re-generate the PLANS.md evidence: formatted physical plans of the
headline operators on sf0.01."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import pyspark.sql.functions as F
from pandas_dq_spark.session import get_spark
from pandas_dq_spark.webtext.heuristics import QualityConfig
from pandas_dq_spark.webtext.pipeline import quality_filter

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    qs = entrymod.queries()
    for name in ["q3_segment_revenue", "q5_nation_revenue", "s_cosine_topk", "a10_outlier_counts"]:
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        if name in entrymod.EAGER_QUERIES:
            # eager entries run bounded jobs at construction (quantile
            # fences / dup-id materialization) — the plan below shows
            # the FINAL job with those results baked in as literals
            print("[eager at construction — see __spark_entry__.EAGER_QUERIES]")
        qs[name](spark, SF).explain("formatted")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.col("text"),
        F.col("lang"),
    )
    out = quality_filter(pages, QualityConfig(min_words=20), check_extraction=False)
    print(f"\n{'=' * 70}\nquality_filter -> select(url, keep)\n{'=' * 70}")
    out.select("url", "keep").explain("formatted")


if __name__ == "__main__":
    main()
