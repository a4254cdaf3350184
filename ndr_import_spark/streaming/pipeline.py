"""Structured Streaming surface: the record pipeline as a continuous query.

The reference gem is batch-only (lazy Enumerators over closed files —
`lib/ndr_import/table.rb:47-61`); this module is the net-new streaming
counterpart the north-star asks for. Design:

* the compiled mapping pipeline (`operators.compiler.compile_records`) is a
  pure narrow map (select + explode), so it applies to a streaming
  DataFrame unchanged — same code path for batch and streaming;
* ORDER-DEPENDENT features (header/footer consumption, `row_identifier:
  index`, non-tabular sessionization across file order) are rejected at
  plan time: a stream has no stable file order. Headers are handled by
  schema instead (`header_lines: 1` → column names come from the declared
  mapping, `skipFirstRow`-style handling belongs to the batch path);
* late data: `windowed_stats` = watermark + tumbling window (state is
  dropped `delay` after the window closes); `session_window_stats` =
  native `session_window` gap sessions — the streaming twin of the batch
  gap-sessionization in `__spark_entry__.q_events_sessionize`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ndr_import_spark.operators import compiler
from ndr_import_spark.plans.model import MappingError, TableMapping


def _cells_schema(n_cols: int) -> T.StructType:
    return T.StructType(
        [T.StructField(f"c{i}", T.StringType()) for i in range(n_cols)]
    )


def stream_tables(
    spark: SparkSession,
    path: str,
    fmt: str,
    mapping: TableMapping,
    options: dict | None = None,
) -> DataFrame:
    """readStream wrapper → the compiler's cells contract
    (source_file, row_index, cells array<string>).

    Streaming has no per-file line order: `row_index` is NULL (order-
    dependent mapping features are rejected in `stream_records`). The
    declared mapping supplies the schema — no inference job on a stream.
    """
    options = dict(options or {})
    n = len(mapping.columns)
    reader = spark.readStream
    if fmt in ("csv", "delimited"):
        sep = options.pop("col_sep", mapping.delimiter or ",")
        df = (
            reader.schema(_cells_schema(n))
            .options(sep=sep, header=str(bool(mapping.header_lines)).lower(), **options)
            .csv(path)
        )
        cells = F.array(*[F.col(f"c{i}").cast("string") for i in range(n)])
    elif fmt == "jsonl":
        names = [c.column if isinstance(c.column, str) else f"c{i}"
                 for i, c in enumerate(mapping.columns)]
        schema = T.StructType([T.StructField(nm, T.StringType()) for nm in names])
        df = reader.schema(schema).options(**options).json(path)
        cells = F.array(*[F.col(nm).cast("string") for nm in names])
    elif fmt in ("txt", "text"):
        df = reader.options(**options).text(path)
        cells = F.array(F.col("value"))
    else:
        raise MappingError(f"Streaming not supported for format: {fmt}")

    return df.select(
        F.lit(path).alias("source_file"),
        F.lit(None).cast("long").alias("row_index"),
        cells.alias("cells"),
    )


def stream_records(
    mapping: TableMapping, cells_stream: DataFrame, strict: bool = False
) -> DataFrame:
    """Compiled record pipeline over a streaming cells DataFrame.

    Rejects order-dependent mapping features (no stable order on a stream):
    footer_lines, row_identifier: index, non-tabular sessionization.
    """
    if mapping.kind == "non_tabular":
        raise MappingError(
            "non-tabular sessionization is order-dependent; batch only "
            "(stream into files, then run the batch sessionizer per file)"
        )
    if mapping.footer_lines:
        raise MappingError("footer_lines is order-dependent; batch only")
    if mapping.row_identifier == "index":
        raise MappingError("row_identifier: index is order-dependent; use uuid")
    return compiler.compile_records(mapping, cells_stream, strict=strict)


def windowed_stats(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window_duration: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — late rows beyond the
    watermark are dropped and window state is reclaimed (bounded state at
    100 TB/day stream rates)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("double")).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n",
            "sum_value",
        )
    )


def stateful_stream_dedup(
    df: DataFrame,
    key_col: str = "fingerprint",
    id_col: str = "doc_id",
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming exact-dedup with keyed state: the first document seen per
    `key_col` (content fingerprint) is emitted, every later duplicate —
    within or across micro-batches — is dropped. The custom-stateful
    counterpart of the batch `operators.dedup.exact_duplicates` for a
    continuously arriving corpus.

    Implemented with `applyInPandasWithState` (Arrow-batched, grouped
    keyed state): one hash shuffle on the fingerprint, then per-key state
    is a single boolean. Within a micro-batch the winner is the min id
    (arrival order inside a batch is not deterministic; min is). At
    stream scale the state store grows one entry per distinct document —
    set `state_timeout_ms` (processing-time timeout) to reclaim entries
    for keys idle longer than the window in which re-crawls realistically
    arrive; a re-seen key after reclaim re-emits, which for dedup is the
    standard bounded-state trade.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(id_col, T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def dedup_fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf[id_col].min()
                best = m if best is None else min(best, m)
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        if not state.exists and best is not None:
            state.update((True,))
            import pandas as pd

            yield pd.DataFrame({key_col: [key[0]], id_col: [int(best)]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        df.select(key_col, F.col(id_col).cast("long").alias(id_col))
        .groupBy(key_col)
        .applyInPandasWithState(dedup_fn, out_schema, state_schema, "append", timeout)
    )


# stream_decontaminate collects the eval set to the driver; cap its size so a
# corpus-sized frame errors clearly instead of OOMing the driver. 1M short
# texts ≈ low hundreds of MB of gram keys — an upper bound on any real
# benchmark suite, far below driver memory.
_EVAL_SET_MAX_ROWS = 1_000_000


def stream_decontaminate(
    doc_stream: DataFrame,
    eval_set,
    n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Drop streaming documents sharing any word `n`-gram with a STATIC
    evaluation set — the continuous-ingestion twin of
    `operators.corpus.ngram_decontaminate`.

    The eval side is collected once at plan time into a frozenset of
    md5-prefix gram keys (benchmarks are tiny next to the corpus) and
    closure-shipped to every task; the stream side checks membership in
    an Arrow-batched mapInPandas — STATELESS, so no watermark or state
    store is needed (a stream-side semi-join + distinct would require
    aggregation state; a non-equi stream-static join plans per-row
    nested loops). Same over-flag-only md5 collision semantics as the
    batch operator.

    `eval_set` may be a static DataFrame with `text_col` or an iterable
    of strings. The eval frame is collected to the driver, so its size is
    GUARDED: more than `_EVAL_SET_MAX_ROWS` rows raises ValueError up
    front (a caller passing a corpus-sized frame as the "eval set" would
    otherwise OOM the driver mid-collect) — real benchmark suites are
    thousands of rows, orders of magnitude under the guard."""
    import hashlib
    from collections.abc import Iterator as _It

    def grams_of(text: str) -> set[bytes]:
        words = [w for w in (text or "").strip().split() if w]
        return {
            hashlib.md5(" ".join(words[i:i + n]).encode()).digest()[:8]
            for i in range(len(words) - n + 1)
        }

    if isinstance(eval_set, DataFrame):
        # collect ONE row past the cap in a single action — the guard and
        # the collect share one evaluation of the eval frame's plan (a
        # separate count-then-collect would pay an expensive upstream
        # computation twice), and never a full count of an unbounded input
        rows = (
            eval_set.select(text_col).limit(_EVAL_SET_MAX_ROWS + 1).collect()
        )
        if len(rows) > _EVAL_SET_MAX_ROWS:
            raise ValueError(
                f"stream_decontaminate eval_set exceeds {_EVAL_SET_MAX_ROWS} "
                "rows — it is collected to the driver and closure-shipped, "
                "which only makes sense for benchmark-sized sets. Decontaminate "
                "against a corpus-sized set with the batch "
                "operators.corpus.ngram_decontaminate (distributed semi-join) "
                "instead."
            )
        texts = [r[0] for r in rows]
    else:
        texts = list(eval_set)
    eval_grams = frozenset().union(*[grams_of(t) for t in texts]) if texts else frozenset()

    schema = doc_stream.schema

    def clean(batches: _It) -> _It:
        for pdf in batches:
            mask = [
                not (grams_of(t) & eval_grams) for t in pdf[text_col]
            ]
            yield pdf[mask]

    return doc_stream.mapInPandas(clean, schema)


def session_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Native session-window gap sessionization — the streaming twin of the
    batch prefix-sum sessionizer. State per open session, closed `gap`
    after the last event (plus watermark slack)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("double")).alias("total_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def stream_neardup_probe(
    doc_stream: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.5,
    shingle_n: int = 5,
) -> DataFrame:
    """Continuously probe a stored `dedup.write_neardup_index` artifact
    with a document STREAM: each arriving document's band keys
    stream-static-join the index's (band, key) rows, then the hashed
    shingle sets verify exact Jaccard — all stateless (no watermark, no
    state store), append-mode compatible.

    A pair that matches in several bands emits once PER MATCHING BAND
    (bounded duplication <= `bands`): collapsing it in-stream would need
    aggregation state, so the consumer dedups downstream (or runs the
    batch `probe_neardup_index` inside foreachBatch when exact-once
    pairs matter). Same over-flag-only md5 semantics as the batch path."""
    from ndr_import_spark.operators.dedup import (
        _band_keys,
        _check_index_params,
        _shingles_from_norm,
        jaccard_verdict,
        shingle_hashes,
    )
    from ndr_import_spark.operators.textstats import normalize_text

    spark = doc_stream.sparkSession
    _check_index_params(spark, index_path, k, bands, shingle_n)
    old_banded = spark.read.parquet(f"{index_path}/bands")
    old_sets = spark.read.parquet(f"{index_path}/sets").select(
        F.col("_id").alias("old_id"), F.col("_hs").alias("_shb")
    )
    # stateless narrow prep with the SAME Generate barrier as the batch
    # path: _norm must be an attribute, or the normalisation regexes are
    # captured inside the shingling lambda and re-run once per shingle
    # (expression-tree duplication is execution-mode-independent)
    normed = doc_stream.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array(normalize_text(F.col(text_col)))).alias("_norm"),
    )
    hashed = normed.select(
        "_id",
        F.array_distinct(
            shingle_hashes(_shingles_from_norm(F.col("_norm"), shingle_n))
        ).alias("_hs"),
    )
    banded = _band_keys(hashed, k, bands, "mh", carry=["_hs"])
    candidates = banded.alias("l").join(
        old_banded.alias("r"), ["band", "key"]
    ).select(
        F.col("l._id").alias("new_id"),
        F.col("l._hs").alias("_sha"),
        F.col("r._id").alias("old_id"),
    )
    verified = candidates.join(old_sets, "old_id")
    return jaccard_verdict(verified, "new_id", "old_id", verify_threshold)


def stream_warc_ingest(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Continuous crawl ingestion: a STREAMING twin of `sources.warc.
    read_warc` — new `.warc.gz` archives landing in `path` flow through
    the identical per-file parse (record walk → HTTP split → HTML strip)
    as micro-batches.

    Spark's file stream source tracks processed files in the checkpoint,
    so each archive is parsed exactly once; `max_files_per_trigger`
    bounds a micro-batch to a predictable number of ~1 GiB archives.
    The parse is the SAME `warc_map_batches` function the batch reader
    uses — one definition of the extraction, batch and streaming provably
    aligned. Downstream, the frame composes with the other streaming
    stages (quality filter columns, `stream_neardup_probe`,
    `stream_decontaminate`) exactly like a batch documents frame."""
    from ndr_import_spark.sources.warc import WARC_DOC_SCHEMA, warc_map_batches

    # streaming sources need an explicit schema; binaryFile's is fixed
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("pathGlobFilter", "*.warc*")
        .load(path)
    )

    return files.select("path", "content").mapInPandas(
        warc_map_batches, WARC_DOC_SCHEMA
    )


def stream_cluster_assign(
    vec_stream: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 127,
) -> DataFrame:
    """Continuously assign arriving embeddings to a STANDING centroid
    table — the (cid, d, c) frame `clustering.kmeans_centroids` trains
    and a batch job persists — e.g. routing fresh documents into
    SemDeDup buckets as they land.

    Stateless per-row shape: the batch path's explode -> groupBy
    aggregate would make the stream an AGGREGATION (update/complete
    mode, a state store); here the k distances are computed per row as
    zip_with/aggregate folds against k driver-literal centroid arrays —
    interpreted HOFs, the documented 2-4x constant-factor tax, paid
    deliberately to keep the stream append-mode and stateless. Values
    are the same exact BIGINTs as the batch lattice (same round, same
    squared-difference sum, and the argmin compiles through the SAME
    `clustering.argmin_chain` the batch assignment uses), so a record
    routed on the stream lands in the cluster a batch re-run would
    assign, bit-for-bit."""
    from pyspark.sql import functions as F

    from ndr_import_spark.operators.clustering import argmin_chain

    cent: dict[int, dict[int, int]] = {}
    for r in centroids.collect():
        cent.setdefault(int(r["cid"]), {})[int(r["d"])] = int(r["c"])
    cids = sorted(cent)
    if not cids:
        raise ValueError(
            "stream_cluster_assign needs a non-empty centroid table "
            "(got zero (cid, d, c) rows — did the training write fail?)"
        )
    qvec = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("long"),
    )
    base = vec_stream.select(F.col(id_col), qvec.alias("_q"))
    dist_cols = []
    for cid in cids:
        cvec = [cent[cid][d] for d in sorted(cent[cid])]
        carr = F.array(*[F.lit(c).cast("long") for c in cvec])
        diff2 = F.zip_with(F.col("_q"), carr, lambda a, b: (a - b) * (a - b))
        dist = F.aggregate(
            diff2, F.lit(0).cast("long"), lambda acc, x: acc + x
        )
        dist_cols.append(dist.alias(f"d{cid}"))
    scored = base.select(id_col, *dist_cols)
    best, chain = argmin_chain(cids)
    return scored.select(
        id_col, chain.cast("int").alias("cid"), best.alias("dist")
    )


def stream_phrase_flags(
    doc_stream: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag arriving documents that contain any of a standing banned /
    boilerplate phrase list — the streaming admission-control twin of
    `retrieval.phrase_search`.

    Stateless per-row shape (append-mode, no state store): each document
    re-serialises its token stream with sentinel spaces and tests
    `' phrase '` containment — a pure-codegen contains() per phrase.
    Presence (unlike the batch operator's occurrence COUNT, which needs
    the positional index to see delimiter-sharing repeats) is exactly
    expressible this way: a phrase occurs iff its space-delimited form
    appears in the delimited token stream, so the flag agrees with
    `phrase_search`'s n_docs on every document, pinned by test."""
    from pyspark.sql import functions as F

    from ndr_import_spark.operators.textstats import tokens

    parsed = []
    for p in phrases:
        ts = [t for t in p.lower().split() if t]
        if ts:
            parsed.append((p, " ".join(ts)))
    if not parsed:
        raise ValueError("stream_phrase_flags needs at least one phrase")
    stream = F.concat(
        F.lit(" "), F.concat_ws(" ", tokens(F.col(text_col))), F.lit(" ")
    )
    flags = [
        F.contains(stream, F.lit(f" {canon} ")).alias(f"hit_{i}")
        for i, (_p, canon) in enumerate(parsed)
    ]
    base = doc_stream.select(F.col(id_col), *flags)
    any_hit = None
    for i in range(len(parsed)):
        c = F.col(f"hit_{i}")
        any_hit = c if any_hit is None else (any_hit | c)
    matched = F.array_compact(
        F.array(*[
            F.when(F.col(f"hit_{i}"), F.lit(p))
            for i, (p, _c) in enumerate(parsed)
        ])
    )
    return base.select(
        id_col,
        any_hit.alias("flagged"),
        matched.alias("matched_phrases"),
    )


def stream_cms_cells(
    key_stream: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Maintain a Count-Min sketch CONTINUOUSLY over a key stream — the
    stateful-streaming twin of `sketches.cms_build`.

    The CMS cell frame is a combinable aggregate, so the streaming form
    is simply the same explode → groupBy(cell) → sum as a streaming
    aggregation: Spark's state store holds exactly depth×width rows
    (constant, corpus-independent — the textbook bounded-state sketch),
    each micro-batch folds in map-side partials, and the sink reads the
    running totals in update mode. Because the hash family is the
    portable md5 ladder, the streamed cells equal a batch `cms_build`
    over the same rows cell-for-cell (pinned by test), and remain
    mergeable with any batch-built sketch by cell summation."""
    from pyspark.sql import functions as F

    from ndr_import_spark.operators.sketches import _cms_cell

    rows = key_stream.select(
        F.col(key_col).alias("_k"),
        (F.col(weight_col) if weight_col else F.lit(1)).alias("_w"),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    )
    col = _cms_cell(F.col("r"), F.col("_k"), width)
    return (
        rows.select("r", col.alias("col"), "_w")
        .groupBy("r", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def stream_media_metadata(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Continuous media-ingest metadata: a STREAMING twin of
    `multimodal.extract_media_metadata` — media files landing in `path`
    are probed (MP3 frame walk, Ogg pages, MP4 boxes) as micro-batches.
    The probe is stateless per payload, so the streaming frame is the
    SAME mapInPandas body the batch operator uses; file-source
    checkpointing gives exactly-once per file. Output joins the other
    streaming stages as a normal metadata frame (route by container,
    budget by duration)."""
    from ndr_import_spark.operators.multimodal import (
        extract_media_metadata,
    )

    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )
    # media_id: stable 60-bit hash of the file path (streaming sources
    # have no natural id column)
    from ndr_import_spark.operators.textstats import md5_long

    payloads = files.select(
        md5_long(F.col("path")).alias("media_id"),
        F.col("content").alias("payload"),
    )
    return extract_media_metadata(payloads)


def stream_audio_tags(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Continuous audio-tag ingest (r11): the streaming twin of
    `multimodal.audio_tag_table` over the binaryFile micro-batch
    source, so tag triage (title/artist routing, has_picture album-art
    quarantine) covers LIVE ingest across every container the batch
    operator reads — ID3 MP3, FLAC, Ogg Vorbis/Opus, WAV RIFF/INFO and
    MP4/M4A ilst. The tag walk is stateless per payload, so the
    streaming frame IS the batch operator's mapInPandas body applied to
    the stream (stream == batch parity by construction, pinned in
    tests); file-source checkpointing gives exactly-once per file."""
    from ndr_import_spark.operators.multimodal import audio_tag_table

    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )
    from ndr_import_spark.operators.textstats import md5_long

    payloads = files.select(
        md5_long(F.col("path")).alias("media_id"),
        F.col("content").alias("payload"),
    )
    return audio_tag_table(payloads)


def stream_audio_fingerprints(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Continuous cross-codec audio dedup keys (r11): the streaming
    twin of `multimodal.audio_fingerprint_table` over the binaryFile
    micro-batch source. Audio landing in `path` yields its two-tier
    dedup keys (exact pcm_md5 + settled-window fingerprint) live; the
    decode is stateless per payload so the streaming frame IS the
    batch operator's body (stream == batch parity pinned in tests).
    Compose with `stateful_stream_dedup` keyed on the fingerprint for
    live near-duplicate detection across codecs."""
    from ndr_import_spark.operators.multimodal import (
        audio_fingerprint_table,
    )

    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )
    from ndr_import_spark.operators.textstats import md5_long

    payloads = files.select(
        md5_long(F.col("path")).alias("media_id"),
        F.col("content").alias("payload"),
    )
    return audio_fingerprint_table(payloads)


def stream_audio_quality(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Continuous audio quality triage (r11): the streaming twin of
    `multimodal.audio_quality_table` over the binaryFile micro-batch
    source — clipped / silent / DC-offset files get their routing
    verdict ON INGEST, so a curation pipeline can quarantine bad audio
    before it lands in the corpus (the audio analogue of the streaming
    C4/boilerplate gates). Stateless per payload; stream == batch
    parity pinned in tests."""
    from ndr_import_spark.operators.multimodal import audio_quality_table

    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )
    from ndr_import_spark.operators.textstats import md5_long

    payloads = files.select(
        md5_long(F.col("path")).alias("media_id"),
        F.col("content").alias("payload"),
    )
    return audio_quality_table(payloads)


def stream_c4_filter(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming C4 cleaning: the row-local rule subset
    (corpus.c4_clean_stateless — sentence extraction, >=3-words and
    javascript drops, lorem/brace/blocklist and min-sentences gates) on
    a document stream, append mode, zero state. The corpus-level
    3-sentence span dedup is inherently cross-document and stays in the
    batch operator; route the stream's survivors into batch `c4_clean`
    (or `stateful_stream_dedup` for exact dups) for that stage."""
    from ndr_import_spark.operators.corpus import c4_clean_stateless

    return c4_clean_stateless(
        docs_stream, text_col=text_col, id_col=id_col, blocklist=blocklist
    )


def stream_extract_main_content(
    pages_stream: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_link_pct: int = 25,
) -> DataFrame:
    """Streaming boilerplate removal: the row-local array form
    (boilerplate.extract_main_content_stateless — segmentation, block
    features, keep rule, ordered reassembly all within the row) on an
    HTML page stream, append mode, zero state. With stream_c4_filter
    downstream, the whole crawl front half (WARC text -> boilerplate ->
    unicode -> C4 row-local rules) runs on a live stream; only the
    corpus-level stages (span dedup, MinHash, decontamination) stay
    batch."""
    from ndr_import_spark.operators.boilerplate import (
        extract_main_content_stateless,
    )

    return extract_main_content_stateless(
        pages_stream,
        html_col=html_col,
        id_col=id_col,
        min_words=min_words,
        max_link_pct=max_link_pct,
    )


def stream_unicode_clean(
    docs_stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming unicode hygiene: clean_unicode is one Arrow mapInPandas
    pass with zero state, so it runs unchanged in append mode. With
    stream_extract_main_content before it and stream_c4_filter after,
    the whole crawl front half (WARC text -> boilerplate -> unicode ->
    C4 row-local rules) runs on a live stream."""
    from ndr_import_spark.operators.unicode_clean import clean_unicode

    return clean_unicode(docs_stream, text_col=text_col, id_col=id_col)


def stream_scrub_images(
    media_stream: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Streaming image-side PII scrub: strip EXIF/GPS/ICC from JPEG
    payloads — and (r8) EXIF/XMP/ICCP chunks from WebP containers,
    lossy VP8 included — as they arrive (multimodal.scrub_image_metadata
    — one stateless Arrow pass; unrecognised payloads pass through
    unchanged)."""
    from ndr_import_spark.operators.multimodal import scrub_image_metadata

    return scrub_image_metadata(
        media_stream, payload_col=payload_col, id_col=id_col
    )


def stream_log2_histogram(
    value_stream: DataFrame,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Maintain the power-of-two histogram sketch CONTINUOUSLY — the
    stateful-streaming twin of `sketches.log2_histogram` (r8). Same
    shape as stream_cms_cells: the sketch is a combinable aggregate, so
    the streaming form is the identical bit-length bin select →
    groupBy(bin) → count with ≤64 rows of state-store state, and the
    streamed cells equal a batch log2_histogram over the same rows
    bin-for-bin (no float log anywhere — the binning is integer bit
    length, so stream and batch cannot disagree on an edge).
    Quantile reads apply `sketches.histogram_quantiles` to the sink
    table between micro-batches.

    Positive-only contract enforced exactly as in the batch twin (r8
    advice): units <= 0 are filtered, so zeros/negatives can never make
    stream and batch sketches diverge bin-for-bin."""
    from pyspark.sql import functions as F

    units = F.floor(F.col(value_col) * scale).cast("long")
    return (
        value_stream.select(units.alias("_u"))
        .where(F.col("_u") >= 1)
        .select(
            F.length(F.conv(F.col("_u").cast("string"), 10, 2)).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def stream_audio_triage(
    media_stream: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Streaming audio triage (r10): route arriving audio payloads by
    structural integrity + tags WITHOUT decoding PCM — the streaming
    twin of mp3_structure_table + audio_tag_table, fused into ONE
    stateless Arrow pass (a stream-stream self-join would add useless
    state; per-payload both parses are side-info/tag-sized). The
    output adds a `route` column ('keep' for structurally-intact
    files, 'quarantine' otherwise) that a forEachBatch sink splits
    on."""
    import pandas as pd

    def run(batches):
        from ndr_import_spark.functions.mp3 import (
            Mp3Error,
            mp3_structure,
            parse_id3v2,
        )

        for pdf in batches:
            out = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p or b"")
                try:
                    s = mp3_structure(raw)
                    verdict = s["verdict"]
                    dur = s["duration_ms"]
                except Mp3Error:
                    verdict, dur = "not_mp3", 0.0
                v2 = parse_id3v2(raw)
                title = None
                if v2 is not None:
                    title = v2["tags"].get("TIT2") or v2["tags"].get("TT2")
                out.append((
                    int(mid), verdict, dur, title,
                    "keep" if verdict == "ok" else "quarantine",
                ))
            yield pd.DataFrame(out, columns=[
                "media_id", "verdict", "duration_ms", "title", "route",
            ])

    return media_stream.mapInPandas(
        run,
        "media_id long, verdict string, duration_ms double, "
        "title string, route string",
    )
