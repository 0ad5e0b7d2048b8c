#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship number is the webtext quality-filter pipeline's docs/sec
(the north-rule metric); per-query wall times cover the operator
inventory's heavy hitters.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_nation_revenue",
    "a10_outlier_counts",
    "a12_correlation",
    "a17_ks_statistic",
    "t_token_counts",
    "w_quality_rule_counts",
    "s_cosine_topk",
    "m_minhash_near_dups",
]

# queries added after round 4 — timed and spread-reported like the
# headline set, but EXCLUDED from the `value` sum so the headline total
# stays comparable round-over-round
EXTRA = [
    "m_simhash_near_dups",
    "c_tfidf_top",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from pandas_dq_spark.session import get_spark
    from pandas_dq_spark.webtext.heuristics import QualityConfig
    from pandas_dq_spark.webtext.pipeline import quality_filter

    import pyspark.sql.functions as F

    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "5000"},
    )

    qs = entrymod.queries()
    # warm-up: JVM/codegen/Arrow init
    qs["a2_distinct_counts"](spark, SF_DIR).collect()

    # best-of-3 per query, spread reported (VERDICT r03 item 3): this
    # sandbox VM shows 2-3x run-to-run noise (host contention); min
    # reflects the engine, max-min quantifies how noisy the window was
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    extra_timings: dict[str, float] = {}
    for name in HEADLINE + EXTRA:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            runs.append(time.perf_counter() - t0)
        dest = timings if name in HEADLINE else extra_timings
        dest[name] = round(min(runs), 4)
        spreads[name] = round(max(runs) - min(runs), 4)

    # flagship: full quality-filter pipeline over documents-as-pages
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    pages = docs.select(
        F.concat(F.lit("doc://"), F.lpad(F.col("doc_id").cast("string"), 9, "0")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.col("text"),
        F.col("lang"),
    )
    n_docs = pages.count()
    wt_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = quality_filter(pages, QualityConfig(min_words=20), check_extraction=False)
        # force full materialization of every column incl. scrub + issues
        out.select(F.sum(F.length("scrubbed_text")), F.sum(F.size("issues")), F.sum(F.col("keep").cast("long"))).collect()
        wt_runs.append(time.perf_counter() - t0)
    wt_sec = min(wt_runs)
    timings["wt_quality_filter"] = round(wt_sec, 4)
    spreads["wt_quality_filter"] = round(max(wt_runs) - wt_sec, 4)

    # throughput on an ENLARGED corpus (sf0.1 docs x400 = 2M pages):
    # the 5k-doc run above is fixed-cost dominated; docs/sec only means
    # something when per-doc work dwarfs plan/codegen/job overheads.
    # NOT included in the headline total (keeps round-over-round
    # comparability of `value`).
    # drop caches the earlier queries pinned (minhash signature tables
    # etc.) so the throughput run measures the pipeline, not GC churn
    # against a fragmented heap
    spark.catalog.clearCache()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "400"))
    big = (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .select(
            F.concat(
                F.lit("doc://"),
                F.col("rep").cast("string"),
                F.lit("/"),
                F.lpad(F.col("doc_id").cast("string"), 9, "0"),
            ).alias("url"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
            F.col("lang"),
        )
        .repartition(CPUS * 4)
        .persist()
    )
    n_big = big.count()
    big_runs = []
    # best-of-3: the flagship number; this sandbox's host contention
    # swings wall clocks 2-3x in waves longer than one run
    for _ in range(3):
        t0 = time.perf_counter()
        out = quality_filter(big, QualityConfig(min_words=20), check_extraction=False)
        out.select(F.sum(F.length("scrubbed_text")), F.sum(F.size("issues")), F.sum(F.col("keep").cast("long"))).collect()
        big_runs.append(time.perf_counter() - t0)
    big_sec = min(big_runs)
    big.unpersist()

    total = round(sum(timings.values()), 4)
    timings["wt_quality_filter_2m"] = round(big_sec, 4)
    spreads["wt_quality_filter_2m"] = round(max(big_runs) - big_sec, 4)
    timings.update(extra_timings)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "sf": float(sf),
                "docs_per_sec": round(n_big / big_sec, 2),
                "n_docs": n_big,
                "docs_per_sec_small": round(n_docs / wt_sec, 2),
                "n_docs_small": n_docs,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
