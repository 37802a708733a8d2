"""Online deduplication for document streams — the streaming twin of
``operators/dedup.exact_duplicates`` (same md5-content digest), for
continuous training-data ingestion where the corpus arrives as
micro-batches rather than a static table.

Two state regimes, matching how Structured Streaming bounds dedup state:

- **global** (``within_watermark=None``): ``dropDuplicates`` on the
  digest. State holds one digest per distinct document ever seen —
  exact forever, right for bounded backfills replayed as a stream.
- **watermarked** (``within_watermark='1 hour'`` + an event-time
  column): ``dropDuplicatesWithinWatermark``. State is bounded by the
  watermark horizon — the 100-TB continuous path, where "duplicate"
  means "same content within the late-data window" (re-crawls of the
  same page cluster in time, so a horizon ≥ the crawl revisit interval
  catches them without unbounded state).

State is hash-partitioned by digest across executors; a micro-batch
shuffles only its own rows. No reference analogue (the reference's
batch loop has no streaming dedup) — capability from the prompt's
training-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    within_watermark: str | None = None,
) -> DataFrame:
    """Keep the first arrival of each distinct document content.

    Works on both streaming and batch DataFrames (the batch plan is the
    degenerate one-batch case — used by the equivalence test). The
    digest column is dropped on output; rows pass through otherwise
    unchanged.
    """
    # null text must NOT dedupe: md5(NULL) is NULL and dropDuplicates
    # treats null keys as equal, so every null-text row after the first
    # (image-only records, failed extraction) would silently vanish;
    # null rows fall back to a per-row unique digest and pass through
    digested = docs.withColumn(
        "_digest",
        F.coalesce(
            F.md5(F.col(text_col)),
            # uuid(): per-row unique and streaming-legal
            # (monotonically_increasing_id is rejected in streams)
            F.concat(F.lit("null:"), F.expr("uuid()")),
        ),
    )
    if within_watermark is None:
        return digested.dropDuplicates(["_digest"]).drop("_digest")
    return (
        digested.withWatermark(ts_col, within_watermark)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )
