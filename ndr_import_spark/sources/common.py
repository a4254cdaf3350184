"""Shared source utilities: per-file dense row indexing, encoding probe.

Row order is the one impedance between the reference's file-order streaming
and Spark (SURVEY §3): header/footer handling, `row_identifier: index` and
non-tabular sessionization all need a dense, 0-based, per-file line number.

`attach_row_index` computes it WITHOUT a wide shuffle:

1. `monotonically_increasing_id()` (narrow) gives `pid * 2^33 + offset` in
   scan order — partition ids follow file/split order for file scans;
2. a per-partition count aggregate (tiny: #partitions rows) → driver prefix
   sums → dense global index, applied via a broadcast join;
3. per-file min (tiny: #files rows) subtracted via broadcast join.

Total cost at 100 TB: one extra pass for the two small aggregates; no
all-to-all shuffle, no single-partition funnel (a window over
`partitionBy(source_file)` would funnel each file into one reducer — exactly
the trap this avoids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def attach_row_index(df: DataFrame, file_col: str = "source_file") -> DataFrame:
    """Add dense 0-based per-file `row_index` preserving scan order."""
    spark = df.sparkSession
    df = df.withColumn("_mid", F.monotonically_increasing_id())
    df = df.withColumn("_pid", F.shiftrightunsigned(F.col("_mid"), 33))

    part_stats = (
        df.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"), F.min("_mid").alias("_base"))
        .collect()
    )
    offsets = []
    acc = 0
    for row in sorted(part_stats, key=lambda r: r["_pid"]):
        # dense global index = acc + (_mid - _base)
        offsets.append((row["_pid"], acc - row["_base"]))
        acc += row["_n"]
    if not offsets:
        return df.withColumn("row_index", F.lit(0).cast("long")).drop("_mid", "_pid")

    off_df = spark.createDataFrame(offsets, "_pid long, _off long")
    df = (
        df.join(F.broadcast(off_df), "_pid")
        .withColumn("_gidx", F.col("_mid") + F.col("_off"))
        .drop("_mid", "_pid", "_off")
    )

    file_mins = df.groupBy(file_col).agg(F.min("_gidx").alias("_fmin"))
    df = (
        df.join(F.broadcast(file_mins), file_col)
        .withColumn("row_index", (F.col("_gidx") - F.col("_fmin")).cast("long"))
        .drop("_gidx", "_fmin")
    )
    return df


def probe_encoding(path: str, default: str = "UTF-8") -> str:
    """Bounded-prefix encoding probe (vs the reference's full extra parse pass,
    helpers/file/delimited.rb:65-88 — unaffordable at 100 TB).

    Detects UTF-16 LE/BE BOMs and falls back to windows-1252 when the prefix
    is not valid UTF-8.
    """
    try:
        with open(path, "rb") as fh:
            prefix = fh.read(1 << 20)
    except OSError:
        return default
    if prefix.startswith(b"\xff\xfe"):
        return "UTF-16LE"
    if prefix.startswith(b"\xfe\xff"):
        return "UTF-16BE"
    if prefix.startswith(b"\xef\xbb\xbf"):
        return "UTF-8"
    # BOM-less UTF-16: ASCII text has every other byte NUL (text.rb's
    # mode-probing equivalent) — NULs on odd offsets ⇒ LE, even ⇒ BE
    if prefix:
        sample = prefix[:4096]
        odd_nuls = sample[1::2].count(0)
        even_nuls = sample[0::2].count(0)
        half = max(len(sample) // 2, 1)
        if odd_nuls > half * 0.7:
            return "UTF-16LE"
        if even_nuls > half * 0.7:
            return "UTF-16BE"
    try:
        prefix.decode("utf-8")
        return "UTF-8"
    except UnicodeDecodeError:
        return "windows-1252"


# cp1252 0x80-0x9F printables; iso-8859-1 decodes those bytes to C1 control
# chars (Spark's CSV charset whitelist has iso-8859-1 but not windows-1252,
# so we read latin-1 and remap the 27 differing characters)
_CP1252_FROM = "".join(chr(b) for b in range(0x80, 0xA0))
_CP1252_TO = "".join(bytes([b]).decode("cp1252", errors="replace") for b in range(0x80, 0xA0))


def spark_charset(encoding: str) -> str:
    """Map a probed encoding to one Spark's CSV reader accepts."""
    if encoding.lower().replace("-", "") in ("windows1252", "cp1252"):
        return "iso-8859-1"
    return encoding


def cp1252_fixup(col, encoding: str):
    """Remap C1 control chars to their cp1252 printables after an
    iso-8859-1 read of windows-1252 bytes."""
    if encoding.lower().replace("-", "") not in ("windows1252", "cp1252"):
        return col
    return F.translate(col, _CP1252_FROM, _CP1252_TO)


def rtrim_nulls(arr):
    """Drop trailing NULL cells (Spark CSV pads ragged rows to max width;
    the reference's rows are genuinely ragged)."""
    last_nonnull = F.aggregate(
        F.transform(arr, lambda c, i: F.when(c.isNotNull(), i + 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: F.greatest(acc, x),
    )
    return F.slice(arr, 1, last_nonnull)


def strip_bom(col):
    return F.regexp_replace(col, "^﻿", "")


def list_input_files(spark: SparkSession, path: str | list[str]) -> list[str]:
    import glob
    paths = path if isinstance(path, list) else [path]
    out: list[str] = []
    for p in paths:
        matches = glob.glob(p)
        out.extend(matches if matches else [p])
    return out
