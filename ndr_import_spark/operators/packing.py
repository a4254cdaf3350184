"""Sequence packing and batch-shape operators for training-data pipelines.

No reference counterpart (`ndr_import` stops at record extraction); these
are the final pre-tokenizer stages of a 100 TB training pipeline:

* `pack_sequences` — GPT-style concat-and-chunk packing: deterministically
  order documents inside hash shards, concatenate their token streams, and
  cut at fixed `capacity`-token boundaries. Each document is assigned the
  pack where its FIRST token lands (documents may span packs — that is the
  concat-and-chunk contract, e.g. GPT/LLaMA pretraining).
* `length_bucket_stats` — pad-to-power-of-two batching profile: per length
  bucket, how many documents, how many real tokens, and how much padding a
  pad-to-bucket batcher would waste. The standard evidence for choosing
  packing over padding.

Scale design: `pack_sequences`'s only wide operation is ONE running-sum
window partitioned by a uniform md5 shard — no global ordering anywhere.
Shard count is a knob: at 100 TB pick `num_shards` so each shard holds
~one reducer's worth of tokens; shards are independent, so the window
parallelises perfectly and the assignment is bit-identical on any cluster
size (ordering is (shard, id), never partition-dependent).
`length_bucket_stats` is a narrow projection plus one map-side-combinable
aggregate over <= ~40 buckets.

Portability: the shard hash is the same md5-nibble arithmetic as
`corpus.hash_split` (16 uniform bits every engine evaluates identically),
and the length bucket is pure integer arithmetic (bit-length of n-1), so
the DuckDB oracle reproduces both exactly — no float log2 anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_bucket16(id_col: Column, salt: str) -> Column:
    """16 uniform bits from md5(salt:id) — THE canonical engine-portable
    bucket hash; `corpus.deterministic_sample` / `corpus.hash_split` and
    the packing shard all import this one implementation so every DuckDB
    oracle replica stays bit-identical to a single definition."""
    h = F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string")))

    def nib(pos: int) -> Column:
        a = F.ascii(F.substring(h, pos, 1))
        return F.when(a >= 97, a - 87).otherwise(a - 48)

    return nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    capacity: int = 2048,
    num_shards: int = 16,
    salt: str = "pack",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each document a (shard, pack_id, pack_offset) under
    concat-and-chunk packing with `capacity` tokens per pack.

    Documents are streamed in (shard, id) order; `pack_offset` is where
    the document's first token lands inside its pack. A document longer
    than the remaining room spans into the next pack(s) — consumers that
    need intact documents should pre-chunk with `corpus.chunk_documents`.

    `partition_cols` prepends extra keys to the packing window (e.g.
    ``("split",)`` so train/val/test never share a pack) — one window
    over (cols..., shard) instead of one filtered pass per value, and
    the extra keys multiply the available parallelism.
    """
    if capacity < 1:
        raise ValueError("pack_sequences requires capacity >= 1")
    out = df.withColumn(
        "shard", (md5_bucket16(F.col(id_col), salt) % num_shards).cast("int")
    )
    w = (
        Window.partitionBy(*partition_cols, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(token_count_col)).over(w), F.lit(0))
    return (
        out.withColumn("_cumb", cum_before)
        .withColumn("pack_id", F.floor(F.col("_cumb") / capacity))
        .withColumn("pack_offset", (F.col("_cumb") % capacity).cast("long"))
        .drop("_cumb")
    )


def length_bucket(token_count_col: Column) -> Column:
    """Smallest power of two >= max(n, 1), via bit-length of (n-1) — pure
    integer arithmetic (conv to base 2 + string length), no float log2, so
    every engine computes the identical bucket."""
    n = F.greatest(token_count_col, F.lit(1))
    bits = F.length(F.conv((n - 1).cast("string"), 10, 2))
    # 2^bits as the binary string "1" + bits zeros — conv-based because
    # pyspark's shiftleft takes only a literal shift amount
    pow2 = F.conv(F.concat(F.lit("1"), F.repeat(F.lit("0"), bits)), 2, 10)
    return F.when(n == 1, F.lit(1).cast("long")).otherwise(pow2.cast("long"))


def length_bucket_stats(df: DataFrame, token_count_col: str) -> DataFrame:
    """Per power-of-two length bucket: document count, real tokens, padded
    tokens under pad-to-bucket batching, waste, and waste fraction
    (rounded 5dp). One narrow projection + one tiny aggregate."""
    bucketed = df.withColumn("bucket", length_bucket(F.col(token_count_col)))
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_count_col)).alias("sum_tokens"),
        )
        .withColumn("padded_tokens", F.col("bucket") * F.col("n_docs"))
        .withColumn("waste_tokens", F.col("padded_tokens") - F.col("sum_tokens"))
        .withColumn(
            "waste_frac",
            F.round(
                F.col("waste_tokens").cast("double") / F.col("padded_tokens"), 5
            ),
        )
        .orderBy("bucket")
    )
