"""Corpus-level repeated-line removal (CCNet-style): lines that occur
in many distinct documents are boilerplate (nav bars, cookie banners,
footers) and are stripped from every document.

Scale shape:
- line frequencies come from a two-level (line, doc) pre-aggregation —
  both levels map-side combinable, no count(DISTINCT) state; only
  (line, counts) rows shuffle.
- the frequent-line set (lines in >= min_docs docs) is SMALL by
  construction relative to the corpus (it is the boilerplate
  vocabulary), so the removal join broadcasts it; the corpus text
  shuffles once, keyed by document, for the ordered reconstruction.
- reconstruction is sort_array(collect_list(struct(idx, line))) — an
  aggregation, not a window, so a document's lines collapse map-side
  into one buffer per partial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    min_docs: int = 5,
) -> DataFrame:
    """(line, n_docs) for non-blank lines appearing in >= ``min_docs``
    distinct documents."""
    lines = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
        ).alias("line"),
    ).filter(F.trim(F.col("line")) != "")
    per_doc = lines.groupBy("line", "__doc").agg(F.count(F.lit(1)))
    return (
        per_doc.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    min_docs: int = 5,
    out_col: str = "clean_text",
    freq: DataFrame | None = None,
) -> DataFrame:
    """Strip corpus-frequent lines from every document.

    Returns ``df``'s id column plus ``out_col`` — the document with
    every line that occurs in >= ``min_docs`` distinct documents
    removed, remaining lines in original order ('' when everything
    was boilerplate).  Pass a precomputed ``freq`` (from
    :func:`frequent_lines`, possibly persisted) to reuse one counting
    pass across many removal calls."""
    if freq is None:
        freq = frequent_lines(df, text_col, id_col, min_docs)
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
        ).alias("idx", "line"),
    )
    kept = lines.join(
        F.broadcast(freq.select("line")), "line", "left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("idx"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
        ).alias(out_col)
    )
    # documents whose every line was boilerplate vanish from `kept`;
    # restore them with an empty clean text
    return df.select(id_col).join(rebuilt, id_col, "left").select(
        id_col, F.coalesce(F.col(out_col), F.lit("")).alias(out_col)
    )
