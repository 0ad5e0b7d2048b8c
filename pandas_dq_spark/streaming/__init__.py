"""Structured Streaming wrappers (SURVEY.md §1.4/§2.9).

The reference is batch-only and the north rule is batch-resumable, so
streaming is a thin adapter: the SAME stage builders (quality_filter,
FixDQ.transform — both pure column expressions over a DataFrame) are
applied inside ``foreachBatch`` or directly on a streaming DataFrame
(stats/rules/scrub are stateless projections, so they stream as-is;
only the exact-dedup mark, which needs a global shuffle, is replaced
by ``dropDuplicatesWithinWatermark`` in streaming mode).

Output-schema changelog (ADVICE r03): round 3 widened the per-doc UDF
struct, so ``streaming_quality_filter`` output gained four columns —
``n_chars``, ``symbol_ratio``, ``repeated_line_frac``,
``ellipsis_line_frac``.  A streaming query restarted against a sink/
checkpoint written under the pre-r3 schema DIVERGES on the mismatch
(proven by tests/test_streaming.py::
test_streaming_restart_fresh_vs_stale_sink): the file sink accepts
the widened rows, leaving a mixed-schema sink where plain reads
resolve only one schema and pre-upgrade rows lack the new columns
even under ``mergeSchema``.  Restart into a FRESH sink (or one with
real schema evolution, e.g. Iceberg) after upgrading.  Note also that
the stateful dedup's checkpointed WATERMARK carries across restarts:
a resumed query drops newly-arrived batches whose event times fall
behind it, independent of any schema change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..webtext.heuristics import QualityConfig, rule_exprs
from ..webtext.pipeline import ISSUE_TYPE, _drop_reserved
from ..webtext.scrub import scrub_col
from ..webtext.udfs import TEXT_SCORES_FIELDS, make_text_scores_udf


def streaming_quality_filter(
    stream_df: DataFrame,
    cfg: QualityConfig | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "warc_ts",
    dedup: bool = True,
) -> DataFrame:
    """Stateless rule/scrub stages applied to a streaming DataFrame;
    exact dedup becomes watermark-scoped dedup on the text hash (the
    streaming-legal analogue of the batch global dedup).  ``dedup=
    False`` keeps every row (``is_dup`` stays False) — used when the
    consumer chains its own stateful operator (e.g. the windowed
    metrics aggregation) and wants a single stateful stage.

    Score/verdict field names are reserved (see
    ``webtext.pipeline.RESERVED_OUTPUT_COLS``): colliding input columns
    are dropped at entry, same as the batch pipeline."""
    cfg = cfg or QualityConfig()
    out = _drop_reserved(stream_df).withWatermark(ts_col, watermark)
    # same fused Arrow pass as the batch pipeline (stats incl. char/
    # line level come out of the one UDF struct)
    scores_udf = make_text_scores_udf(cfg.stopwords)
    out = out.withColumn("__ts", scores_udf(F.col("text")))
    # one select for all struct fields (one analysis pass, not one
    # per field — same fusion as the batch pipeline, r4)
    out = out.select(
        *[c for c in out.columns if c != "__ts"],
        *[F.col(f"__ts.{fld}").alias(fld) for fld in TEXT_SCORES_FIELDS],
    )
    if dedup:
        out = out.withColumn(
            "__text_hash", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256)
        )
        out = out.dropDuplicatesWithinWatermark(["__text_hash"]).drop(
            "__text_hash"
        )
    out = out.withColumn("is_dup", F.lit(False))
    issue_structs = [
        F.when(
            pred,
            F.struct(
                F.lit(name).alias("check"),
                F.lit("drop").alias("severity"),
                F.lit(detail).alias("detail"),
            ),
        )
        for name, pred, detail in rule_exprs(cfg)
    ]
    out = out.withColumn(
        "issues",
        F.filter(F.array(*issue_structs), lambda x: x.isNotNull()).cast(ISSUE_TYPE),
    )
    out = out.withColumn("keep", F.size("issues") == 0)
    out = out.withColumn("scrubbed_text", scrub_col(F.col("text")))
    return out


def streaming_metrics_windowed(
    stream_df: DataFrame,
    cfg: QualityConfig | None = None,
    ts_col: str = "warc_ts",
    window_dur: str = "7 days",
    watermark: str = "14 days",
) -> DataFrame:
    """Streaming analogue of the batch metrics sidecar
    (webtext.pipeline.metrics_sidecar): per EVENT-TIME window per
    bucket, doc/keep/char counts, with the watermark bounding late-data
    state — rows later than ``watermark`` behind the max seen event
    time are dropped and their window finalizes (append-mode emits).

    One stateful operator (the window agg); the quality stages run with
    ``dedup=False`` so this query holds only |windows x buckets| state
    rows — at 10^12 docs the state store carries thousands of rows, not
    documents."""
    cfg = cfg or QualityConfig()
    scored = streaming_quality_filter(
        stream_df, cfg, watermark=watermark, ts_col=ts_col, dedup=False
    )
    bucket = F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.n_buckets)).cast("int")
    return (
        scored.withColumn("bucket", bucket)
        .groupBy(F.window(F.col(ts_col), window_dur).alias("w"), "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "n_docs",
            "n_kept",
            "total_chars",
        )
    )


def streaming_host_running_counts(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    url_col: str = "url",
    watermark: str = "10 minutes",
):
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``
    (the harness for semantics Spark's built-ins can't express): a
    running per-host document counter that persists across
    micro-batches in keyed group state.

    State is one long per host — at 10^12 docs the state store holds
    |hosts| rows, not |docs|; the host key shuffle is the only wide
    operation, and skewed hosts are bounded because the state update
    is O(batch rows) per key, not O(history)."""
    import pandas as pd  # noqa: F811 - executor-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    host = F.parse_url(F.col(url_col), F.lit("HOST")).alias("host")
    base = stream_df.withWatermark(ts_col, watermark).select(host)

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"host": [key[0]], "n_docs": [n]})

    return base.groupBy("host").applyInPandasWithState(
        update,
        outputStructType="host string, n_docs long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quality_filter_foreach_batch(cfg: QualityConfig | None = None):
    """``writeStream.foreachBatch`` adapter reusing the full BATCH
    pipeline (including the exact global dedup within each micro-batch)."""
    from ..webtext.pipeline import quality_filter

    def fn(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return quality_filter(batch_df, cfg, check_extraction=False)

    return fn
