"""Distributed running sums — the scale-safe replacement for
``Window.partitionBy(file).orderBy(row)`` prefix sums.

A per-file window funnels every row of a file through ONE reducer: the
sort+window task for a 1-billion-line report file runs on a single core no
matter how many executors exist. This module computes the same inclusive
running sums with parallelism proportional to data size:

1. rows are bucketed into fixed-size chunks of the (non-negative) order
   column: ``chunk_id = order div chunk``;
2. ONE exchange hash-partitions on ``(part, chunk_id)``; a within-chunk
   window computes local running sums — parallelism = number of chunks,
   not number of files;
3. per-chunk totals come from a narrow map-side-combined aggregate over
   the pre-window frame (tiny output: one row per chunk) — one extra
   narrow scan of the input, no second big shuffle;
4. a window over the per-chunk rows (one row per chunk — kilobytes per
   terabyte of input) turns totals into exclusive prefix offsets, joined
   back on ``(part, chunk_id)``. No broadcast hint on purpose: the big
   side leaves step 2 already partitioned AND sorted by
   ``(part, chunk_id, order)``, so a sort-merge join needs no new exchange
   or sort, while AQE broadcasts the offsets when small. Either way there
   is no size ceiling on the offsets side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CHUNK = 1 << 16


def chunked_inclusive_sums(
    df: DataFrame,
    part_col: str,
    order_col: str,
    sums: dict[str, object],
    chunk: int = DEFAULT_CHUNK,
    return_part_totals: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Add, for each ``out_name -> int Column`` in `sums`, the inclusive
    running sum over rows of the same `part_col` ordered by `order_col`.

    `order_col` must be non-negative and unique per partition (dense is
    ideal: chunks stay balanced). Output columns are LONG.

    With ``return_part_totals=True`` also returns a tiny DataFrame
    ``(part_col, <out_name> [= per-part total], ...)`` — one row per part,
    derived from the per-chunk aggregates at no extra scan.
    """
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    flagged = df.select(
        "*", *[col.cast("long").alias(f"_flag_{out}") for out, col in sums.items()]
    )
    flagged = flagged.withColumn("_ck", F.expr(f"`{order_col}` div {chunk}"))

    w_local = (
        Window.partitionBy(part_col, "_ck")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = flagged.select(
        "*",
        *[F.sum(f"_flag_{out}").over(w_local).alias(f"_loc_{out}") for out in sums],
    )

    # per-chunk totals from the PRE-window frame: a narrow scan with
    # map-side partial aggregation and a tiny exchange (one row per chunk).
    # Aggregating the windowed output instead would NOT reuse the big
    # exchange (column pruning canonicalises the two subplans differently)
    # and would re-run the exchange+sort+window — measurably slower. The
    # extra narrow scan is the same trade sources/common.attach_row_index
    # makes, and is the only re-read in the pipeline.
    per_chunk = flagged.groupBy(part_col, "_ck").agg(
        *[F.sum(f"_flag_{out}").alias(f"_tot_{out}") for out in sums]
    )
    w_prev = (
        Window.partitionBy(part_col)
        .orderBy("_ck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_chunk.select(
        part_col,
        "_ck",
        *[
            F.coalesce(F.sum(f"_tot_{out}").over(w_prev), F.lit(0)).alias(f"_off_{out}")
            for out in sums
        ],
    )

    joined = local.join(offsets, [part_col, "_ck"])
    out_cols = [c for c in df.columns] + [
        (F.col(f"_loc_{out}") + F.col(f"_off_{out}")).alias(out) for out in sums
    ]
    result = joined.select(*out_cols)
    if not return_part_totals:
        return result
    part_totals = per_chunk.groupBy(part_col).agg(
        *[F.sum(f"_tot_{out}").alias(out) for out in sums]
    )
    return result, part_totals
