"""Non-tabular sessionization — multi-line text → record cells.

Reference: lib/ndr_import/non_tabular/table.rb (+record.rb, line.rb,
column_mapping.rb). A line stream is partitioned into records by
`start_line_pattern` / optional `end_line_pattern`, then each record's line
array is tabulated into cells by per-column line selection (int / range /
RegexpRange) + capture-regex chains.

Spark shape:

1. running-sum session ids via chunked two-level prefix sums
   (`operators/prefix.py`: within-chunk windows partitioned by
   ``(source_file, row_index div chunk)`` + a tiny per-chunk offset table
   joined back) — the reference's state machine is a prefix-sum:
   ``session = Σ is_start``, in-record = paired start/end counting.
   Parallelism scales with line count, never one-reducer-per-file;
2. multi-line `remove_lines` lookahead/lookback runs in the same chunked
   windows, with boundary "ghost" copies of the ≤k−1 rows nearest each
   chunk edge providing cross-chunk context (dropped after flagging);
3. `groupBy(source_file, session)` + `sort_array(collect_list(...))` →
   ordered per-record line arrays — ONE shuffle keyed by (file, record);
4. tabulation compiles to higher-order array functions (filter/slice/
   transform/array_join) — JVM-side, no UDF; RegexpRange resolves via
   `array_position` over per-line match flags.

The record ordinal and per-file last-session are likewise tiny-aggregate
joins, not whole-file windows — no stage in this pipeline funnels a file
into a single task.

Parity notes: lines are rstripped on ingest (line.rb:18); removed lines
(remove_lines page headers/footers) never enter records; the trailing
record is DISCARDED unless `end_in_a_record` (table.rb#process_end_of_record);
records are re-indexed by record ordinal (the tabulated array is what
Table#transform enumerates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ndr_import_spark.operators.prefix import (
    DEFAULT_CHUNK,
    chunked_inclusive_sums,
)
from ndr_import_spark.plans.model import (
    ColumnMapping,
    MappingError,
    RegexpRange,
    TableMapping,
    UTF8CoercionError,
)


def _matches(col: Column, pattern, equality_for_str: bool = False) -> Column:
    """String patterns compare per Ruby semantics; regexes via rlike."""
    from ndr_import_spark.plans.yaml_loader import RubyRegexp
    if isinstance(pattern, RubyRegexp) or not equality_for_str:
        return col.rlike(str(pattern))
    return col == F.lit(str(pattern))


def _flag_removed_lines(df: DataFrame, mapping: TableMapping, w) -> DataFrame:
    """remove_lines: k-line window equality/regex match flags all k lines
    (table.rb#remove_unwanted_lines)."""
    if not isinstance(mapping.remove_lines, dict):
        return df.withColumn("_removed", F.lit(False))
    for name, patterns in mapping.remove_lines.items():
        # match-start flag: lines i..i+k-1 equal the k patterns
        # (lead/lag with offset 0 are identity — keep them out of the
        # window operator so single-pattern groups stay window-free)
        starts = F.lit(True)
        for j, pat in enumerate(patterns):
            nxt = F.col("value") if j == 0 else F.lead(F.col("value"), j).over(w)
            starts = starts & F.coalesce(_matches(nxt, pat, equality_for_str=True), F.lit(False))
        df = df.withColumn(f"_ms_{name}", starts)
        # a line is removed when any of the previous k-1 lines started a match
        group_removed = F.lit(False)
        for s in range(len(patterns)):
            prev = (
                F.col(f"_ms_{name}") if s == 0 else F.lag(F.col(f"_ms_{name}"), s).over(w)
            )
            group_removed = group_removed | F.coalesce(prev, F.lit(False))
        df = df.withColumn(f"_rm_{name}", group_removed).drop(f"_ms_{name}")
    total = F.lit(False)
    for name in mapping.remove_lines:
        total = total | F.col(f"_rm_{name}")
    df = df.withColumn("_removed", total)
    return df.drop(*[f"_rm_{n}" for n in mapping.remove_lines])


def _remove_lines_lookahead(mapping: TableMapping) -> int:
    """Max lead/lag distance a multi-line remove_lines group needs."""
    if not isinstance(mapping.remove_lines, dict):
        return 0
    return max((len(p) - 1 for p in mapping.remove_lines.values()), default=0)


def _sessionized_lines(
    df: DataFrame,
    mapping: TableMapping,
    strict: bool = True,
    chunk: int = DEFAULT_CHUNK,
) -> tuple[DataFrame, DataFrame]:
    """Per-line sessionization state: the shared first phase of
    `sessionize` and the fused `tabulate_non_tabular` path.

    Returns ``(per_line, last_by_file)`` where per_line carries
    (source_file, row_index, value, _session, _captured, _closes) and
    last_by_file is one tiny row per file with `_last_session`.
    """
    look = _remove_lines_lookahead(mapping)
    if chunk <= look:
        raise MappingError(
            f"chunk ({chunk}) must exceed the remove_lines lookahead ({look})"
        )

    df = df.withColumn("value", F.regexp_replace(F.col("value"), r"\s+$", ""))
    df_narrow = df  # pre-window frame for the windowless probe path

    df = df.withColumn("_ck", F.expr(f"row_index div {chunk}"))
    if look == 0 or not isinstance(mapping.remove_lines, dict):
        # single-line patterns compile window-free; the spec is unused
        w_g = Window.partitionBy("source_file", "_ck").orderBy("row_index")
        df = _flag_removed_lines(df, mapping, w_g)
    else:
        # cross-chunk context for bounded lead/lag: copy the `look` rows
        # nearest each chunk edge into the neighbouring chunk as ghosts —
        # they supply lookahead values / lag flags, then drop out
        pos = F.col("row_index") % chunk
        base = df.withColumn("_ghost", F.lit(False))
        ghosts_prev = (
            df.filter((pos < look) & (F.col("_ck") > 0))
            .withColumn("_ck", F.col("_ck") - 1)
            .withColumn("_ghost", F.lit(True))
        )
        ghosts_next = (
            df.filter(pos >= chunk - look)
            .withColumn("_ck", F.col("_ck") + 1)
            .withColumn("_ghost", F.lit(True))
        )
        aug = base.unionByName(ghosts_prev).unionByName(ghosts_next)
        w_g = Window.partitionBy("source_file", "_ck").orderBy("row_index")
        aug = _flag_removed_lines(aug, mapping, w_g)
        df = aug.filter(~F.col("_ghost")).drop("_ghost")

    is_start = F.col("value").rlike(mapping.start_line_pattern)
    has_end = mapping.end_line_pattern is not None
    is_end = (
        (~is_start) & F.col("value").rlike(mapping.end_line_pattern)
        if has_end
        else F.lit(False)
    )
    virtual = 1 if mapping.start_in_a_record else 0

    df = df.withColumn("_is_start", is_start).withColumn("_is_end", is_end)
    df, file_totals = chunked_inclusive_sums(
        df.drop("_ck"),
        "source_file",
        "row_index",
        {
            "_s_raw": F.col("_is_start").cast("int"),
            "_e_incl": F.col("_is_end").cast("int"),
        },
        chunk=chunk,
        return_part_totals=True,
    )
    df = df.withColumn("_s_incl", F.col("_s_raw") + F.lit(virtual)).drop("_s_raw")
    # per-file last session id, free from the per-chunk totals (one row per
    # file): total starts + virtual
    last_by_file = file_totals.select(
        "source_file", (F.col("_s_raw") + F.lit(virtual)).alias("_last_session")
    )
    df = df.withColumn(
        "_s_excl", F.col("_s_incl") - F.col("_is_start").cast("int")
    ).withColumn("_e_excl", F.col("_e_incl") - F.col("_is_end").cast("int"))
    # in-record *before* this line (state-machine prefix counting)
    df = df.withColumn("_in_before", F.col("_s_excl") > F.col("_e_excl"))

    if strict:
        # ONE probe job for both parity errors: start-before-end
        # (table.rb#start_record) and UTF-8 coercion failure (junk bytes
        # survive the encoding fallbacks as U+FFFD — table.rb:75-82).
        # Without an end pattern a clash is impossible, so the probe plan
        # is the pre-window df — a narrow scan, no shuffle.
        bad_utf8 = F.max(F.col("value").contains("�").cast("int")).alias("bad_utf8")
        if has_end:
            clash_cond = (F.col("_is_start") & F.col("_in_before")).cast("int")
            probe = df.agg(F.max(clash_cond).alias("clash"), bad_utf8).collect()[0]
            if probe["clash"]:
                raise MappingError(
                    "Start of new record found before end of current record"
                )
        else:
            probe = df_narrow.agg(bad_utf8).collect()[0]
        if probe["bad_utf8"]:
            raise UTF8CoercionError(
                "Line contains bytes that survive no encoding fallback"
            )

    df = df.withColumn("_session", F.col("_s_incl"))
    captured = F.when(F.col("_removed"), F.lit(False)).otherwise(
        F.when(F.col("_is_start"), F.lit(bool(mapping.capture_start_line)))
        .when(F.col("_is_end"), F.lit(bool(mapping.capture_end_line)) & F.col("_in_before"))
        .otherwise(F.col("_in_before"))
    )
    df = df.withColumn("_captured", captured)
    df = df.withColumn(
        "_closes", (F.col("_is_end") & F.col("_in_before")).cast("int")
    )
    return df, last_by_file


def _group_sessions(
    per_line: DataFrame,
    extra_fields: list[Column] | None = None,
    captured_only: bool = False,
) -> DataFrame:
    """Group FIRST (one shuffle keyed by (file, session)), then decide which
    sessions to emit on the grouped rows — orders of magnitude fewer rows
    than per-line whole-partition windows. The collected struct's first
    field is the line number so `sort_array` restores line order.

    With `captured_only` the non-captured lines never enter the collected
    array at all (collect_list drops the NULL structs), shrinking the
    shuffle payload and removing the post-shuffle captured filter; the
    session-close bookkeeping still sees every line through the `_closes`
    aggregate."""
    fields = [F.col("row_index").alias("n")]
    if not captured_only:
        fields.append(F.col("_captured").alias("c"))
    fields.extend(extra_fields or [F.col("value").alias("v")])
    struct = F.struct(*fields)
    if captured_only:
        struct = F.when(F.col("_captured"), struct)
    return (
        per_line.filter(F.col("_session") >= 1)
        .groupBy("source_file", "_session")
        .agg(
            F.max("_closes").alias("_closed"),
            F.sort_array(F.collect_list(struct)).alias("_all_lines"),
        )
    )


def _emit_records(
    grouped: DataFrame, mapping: TableMapping, last_by_file: DataFrame
) -> DataFrame:
    """Emit-filter grouped sessions and assign record ordinals.

    A session is closed iff it contains a real end line; the trailing
    session is in-record at EOF iff it is not closed (every session >= 1
    contains exactly one start). The per-file last session comes from the
    tiny per-file totals join — NOT a whole-file window (that would funnel
    every record of a file into one task). One row per file; AQE
    broadcasts it.

    When the emit predicate cannot reference `_last_session` after
    constant-folding `end_in_a_record` (end pattern + end_in_a_record off:
    emit is just `_closed == 1`; no end pattern + end_in_a_record on: emit
    is always true), the join is skipped OUTRIGHT: every file in `grouped`
    appears in `last_by_file` by construction (both derive from the same
    lines), so the inner join never drops rows — but Catalyst cannot prove
    that, keeps the join for cardinality, and its corpus-sized totals
    subtree then runs as a FULL extra pass over the input (measured on
    nontabular_extract: 4.8 s of 15.3 s stage wall recomputing every
    per-line regex to produce a list of file names the filter never
    reads)."""
    needs_last = (
        bool(mapping.end_in_a_record)
        if mapping.end_line_pattern is not None
        else not bool(mapping.end_in_a_record)
    )
    if needs_last:
        grouped = grouped.join(last_by_file, "source_file")
    last_session = F.col("_last_session")
    if mapping.end_line_pattern is not None:
        emit = (F.col("_closed") == 1) | (
            ((F.col("_session") == last_session) & (F.col("_closed") == 0))
            if mapping.end_in_a_record
            else F.lit(False)
        )
    else:
        emit = (
            F.lit(True)
            if mapping.end_in_a_record
            else (F.col("_session") != last_session)
        )
    grouped = grouped.withColumn("_emit", emit).filter(F.col("_emit"))
    # record ordinal per file (what Table#transform's index means here):
    # in well-formed input sessions 1..last are ALL emitted up to the tail
    # (an unclosed non-final session would be a start-before-end clash,
    # which the reference always raises on), so the ordinal is simply
    # session−1 — pure arithmetic, no extra pass or shuffle. On malformed
    # input under strict=False (where the reference has no defined
    # behaviour) ordinals stay monotone but may skip values.
    return grouped.withColumn("row_index", (F.col("_session") - 1).cast("long"))


def sessionize(
    df: DataFrame,
    mapping: TableMapping,
    strict: bool = True,
    chunk: int = DEFAULT_CHUNK,
) -> DataFrame:
    """lines (source_file,row_index,value) → per-record line arrays.

    Output: (source_file, row_index [record ordinal], lines array<string>).

    strict=True runs the start-before-end MappingError probe — an extra
    Spark job, but over the same chunk-parallel plan (when no
    end_line_pattern exists the probe degenerates to a narrow UTF-8 scan
    with no window at all). Disable in throughput paths with well-formed
    patterns.

    `chunk` bounds the rows a single within-chunk window task sorts; see
    operators/prefix.py for the scale rationale.
    """
    per_line, last_by_file = _sessionized_lines(df, mapping, strict=strict, chunk=chunk)
    grouped = _group_sessions(per_line)
    grouped = _emit_records(grouped, mapping, last_by_file)
    grouped = grouped.withColumn(
        "lines",
        F.transform(
            F.filter(F.col("_all_lines"), lambda x: x["c"]), lambda x: x["v"]
        ),
    )
    return grouped.select("source_file", "row_index", "lines")


# ---------------------------------------------------------------------------
# tabulation (record.rb#tabulate + column_mapping.rb)
# ---------------------------------------------------------------------------

def _ruby_index(arr: Column, i: int) -> Column:
    """Ruby Array#[int] — negative from end, out-of-range → NULL."""
    n = F.size(arr)
    if i >= 0:
        return F.when(F.lit(i) < n, F.element_at(arr, i + 1))
    return F.when(n + i >= 0, F.element_at(arr, i))


def _ruby_slice(arr: Column, b: Column, e: Column, excl: bool) -> Column:
    """Ruby Array#[b..e] with negative-index resolution → array (may be empty).

    Returns NULL when b is out of range (Ruby returns nil)."""
    n = F.size(arr)
    b_res = F.when(b < 0, n + b).otherwise(b)
    e_res = F.when(e < 0, n + e).otherwise(e)
    if excl:
        e_res = e_res - 1
    e_res = F.least(e_res, n - 1)
    length = F.greatest(e_res - b_res + 1, F.lit(0))
    ok = (b_res >= 0) & (b_res <= n)
    return F.when(ok, F.slice(arr, b_res + 1, length))


def _regexp_index(arr: Column, pattern) -> Column:
    """0-based index of first line matching `pattern`; NULL when no match
    (RegexpRange::PatternMatchError parity)."""
    if isinstance(pattern, int):
        return F.lit(pattern)
    flags = F.transform(arr, lambda x: x.rlike(str(pattern)))
    pos = F.array_position(flags, F.lit(True))  # 1-based, 0 when absent
    return F.when(pos > 0, pos - 1)


def _selected_lines(lines: Column, cm: ColumnMapping) -> Column:
    sel = cm.lines
    if isinstance(sel, int):
        single = _ruby_index(lines, sel)
        return F.when(single.isNotNull(), F.array(single)).otherwise(
            F.array().cast("array<string>")
        )
    if isinstance(sel, range):
        # python range from !ruby/range loader: inclusive already resolved
        return F.coalesce(
            _ruby_slice(lines, F.lit(sel.start), F.lit(sel.stop - 1), excl=False),
            F.array().cast("array<string>"),
        )
    if isinstance(sel, RegexpRange):
        b = _regexp_index(lines, sel.begin)
        e = _regexp_index(lines, sel.end)
        # PatternMatchError → NULL cell (record.rb rescue)
        return F.when(
            b.isNotNull() & e.isNotNull(), _ruby_slice(lines, b, e, excl=sel.excl)
        )
    raise MappingError(f"Unsupported non_tabular_cell lines: {sel!r}")


def _capture_chain(line: Column, captures) -> Column:
    """Replace the line with capture group 1, recursively per pattern
    (column_mapping.rb#capture_value); no match → NULL; result stripped."""
    value = line
    patterns = captures if isinstance(captures, list) else [captures]
    for pat in patterns:
        p = str(pat)
        value = F.when(value.rlike(p), F.regexp_extract(value, p, 1))
    return F.trim(value)


def _capture_chain_blankdrop(line: Column, captures) -> Column:
    """`_capture_chain` minus the NULL-vs-'' distinction: one
    `regexp_extract` per pattern (half the regex evaluations of the
    rlike+extract pair). regexp_extract yields '' on no-match, so a missed
    line and an empty capture group both land on '' — indistinguishable
    from NULL to the blank-dropping cell filter, which is the only
    consumer when `preserve_blank_lines` is off (the default)."""
    value = line
    patterns = captures if isinstance(captures, list) else [captures]
    for pat in patterns:
        value = F.regexp_extract(value, str(pat), 1)
    return F.trim(value)


def tabulate_cells(lines: Column, columns: list[ColumnMapping]) -> Column:
    """record line-array → cells array<string> in column order."""
    cells = []
    for cm in columns:
        if cm.lines is None or cm.capture is None:
            raise MappingError(
                f"Non-tabular cell for {cm.column or cm.standard_mapping!r} "
                "must declare lines and capture"
            )
        selected = _selected_lines(lines, cm)
        captured = F.transform(selected, lambda ln: _capture_chain(ln, cm.capture))
        if cm.preserve_blank_lines:
            kept = F.filter(captured, lambda v: v.isNotNull())
        else:
            kept = F.filter(captured, lambda v: v.isNotNull() & (F.trim(v) != ""))
        joined = F.array_join(kept, cm.join or "")
        # RegexpRange miss → NULL cell: selected itself is NULL in that case
        cells.append(F.when(selected.isNotNull(), joined))
    return F.array(*cells)


def _fused_regexp_index(cls: Column, pattern, flag_field: str) -> Column:
    """0-based index of the first captured line whose precomputed rlike
    flag (`flag_field`) is true; NULL when no match (PatternMatchError
    parity). Int patterns are literal indexes."""
    if isinstance(pattern, int):
        return F.lit(pattern)
    flags = F.transform(cls, lambda x: x[flag_field])
    pos = F.array_position(flags, F.lit(True))  # 1-based, 0 when absent
    return F.when(pos > 0, pos - 1)


def _fused_cell(
    cls: Column, cm: ColumnMapping, ci: int, rr: Column | None = None
) -> Column:
    """One cell from the captured-line struct array, using the per-line
    PRE-computed capture value (field ``p{ci}``) and RegexpRange match
    flags (``b{ci}``/``e{ci}``) — no regex runs after the shuffle.

    For RegexpRange columns the begin/end indexes are read from the
    materialised ``rr`` struct (fields ``b{ci}``/``e{ci}``): Catalyst
    expression trees cannot share subexpressions, so referencing the
    array_position-over-transform index Column directly would inline (=
    re-evaluate) it at every one of its ~20 uses inside the Ruby-slice
    bounds arithmetic."""
    sel = cm.lines
    if isinstance(sel, int):
        single = _ruby_index(cls, sel)
        caps = F.when(single.isNotNull(), F.array(single[f"p{ci}"])).otherwise(
            F.array().cast("array<string>")
        )
    elif isinstance(sel, range):
        sliced = _ruby_slice(cls, F.lit(sel.start), F.lit(sel.stop - 1), excl=False)
        caps = F.coalesce(
            F.transform(sliced, lambda x: x[f"p{ci}"]),
            F.array().cast("array<string>"),
        )
    elif isinstance(sel, RegexpRange):
        b = rr[f"b{ci}"] if rr is not None else _fused_regexp_index(cls, sel.begin, f"b{ci}")
        e = rr[f"e{ci}"] if rr is not None else _fused_regexp_index(cls, sel.end, f"e{ci}")
        # PatternMatchError → NULL cell (record.rb rescue)
        sliced = F.when(
            b.isNotNull() & e.isNotNull(), _ruby_slice(cls, b, e, excl=sel.excl)
        )
        caps = F.when(sliced.isNotNull(), F.transform(sliced, lambda x: x[f"p{ci}"]))
    else:
        raise MappingError(f"Unsupported non_tabular_cell lines: {sel!r}")
    if cm.preserve_blank_lines:
        kept = F.filter(caps, lambda v: v.isNotNull())
    else:
        kept = F.filter(caps, lambda v: v.isNotNull() & (F.trim(v) != ""))
    joined = F.array_join(kept, cm.join or "")
    return F.when(caps.isNotNull(), joined)


def tabulate_non_tabular(
    df: DataFrame,
    mapping: TableMapping,
    strict: bool = True,
    chunk: int = DEFAULT_CHUNK,
) -> DataFrame:
    """Full pipeline: lines → sessionized records → cells DataFrame.

    Fused plan: capture-chain regexes and RegexpRange begin/end rlike
    flags are evaluated PER LINE before the (file, session) shuffle —
    flat string columns inside whole-stage codegen — so the post-shuffle
    record assembly touches no regex at all. The interpreted
    higher-order-function work that remains (slice / element_at /
    array_position / a field-projection transform over an already-short
    struct array) is regex-free and O(record length). Versus evaluating
    `tabulate_cells` on collected line arrays this cut the steady-state
    end-to-end time ~3× at sf0.1 and removes the raw line text from the
    shuffle payload entirely (only capture results travel).

    Both `_cls` (captured-line structs) and `cells` are materialised
    through one-element explodes on purpose: the downstream mapper
    references `cells` once per column per klass, and CollapseProject
    would inline (= re-evaluate) the whole tree at every reference —
    measured 4-5× on the end-to-end pipeline. A Generate node evaluates
    the generator exactly once per row and materialises the value as a
    plain attribute. No data is buffered: explode of a single-element
    array is row-for-row.
    """
    columns = mapping.columns
    for cm in columns:
        if cm.lines is None or cm.capture is None:
            raise MappingError(
                f"Non-tabular cell for {cm.column or cm.standard_mapping!r} "
                "must declare lines and capture"
            )
    per_line, last_by_file = _sessionized_lines(df, mapping, strict=strict, chunk=chunk)
    # captures/flags are computed per line BUT only for captured lines
    # (when(_captured, ...)): removed/page-furniture lines never pay the
    # regex, and the collected struct skips them entirely
    extra: list[Column] = []
    for ci, cm in enumerate(columns):
        chain = (
            _capture_chain(F.col("value"), cm.capture)
            if cm.preserve_blank_lines
            else _capture_chain_blankdrop(F.col("value"), cm.capture)
        )
        extra.append(F.when(F.col("_captured"), chain).alias(f"p{ci}"))
        if isinstance(cm.lines, RegexpRange):
            if not isinstance(cm.lines.begin, int):
                extra.append(
                    F.when(
                        F.col("_captured"), F.col("value").rlike(str(cm.lines.begin))
                    ).alias(f"b{ci}")
                )
            if not isinstance(cm.lines.end, int):
                extra.append(
                    F.when(
                        F.col("_captured"), F.col("value").rlike(str(cm.lines.end))
                    ).alias(f"e{ci}")
                )
    grouped = _group_sessions(per_line, extra_fields=extra, captured_only=True)
    emitted = _emit_records(grouped, mapping, last_by_file)
    rec = emitted.select(
        "source_file",
        "row_index",
        F.explode(F.array(F.col("_all_lines"))).alias("_cls"),
    )
    # materialise each RegexpRange column's begin/end index ONCE through a
    # Generate barrier (same rationale as _cls/cells: Catalyst would
    # otherwise inline the array_position-over-transform index at every
    # reference inside the slice-bounds arithmetic — measured ~20x)
    rr_fields: list[Column] = []
    for ci, cm in enumerate(columns):
        if isinstance(cm.lines, RegexpRange):
            rr_fields.append(
                _fused_regexp_index(F.col("_cls"), cm.lines.begin, f"b{ci}").alias(f"b{ci}")
            )
            rr_fields.append(
                _fused_regexp_index(F.col("_cls"), cm.lines.end, f"e{ci}").alias(f"e{ci}")
            )
    rr = None
    if rr_fields:
        rec = rec.select(
            "source_file",
            "row_index",
            "_cls",
            F.explode(F.array(F.struct(*rr_fields))).alias("_rr"),
        )
        rr = F.col("_rr")
    cells = [_fused_cell(F.col("_cls"), cm, ci, rr) for ci, cm in enumerate(columns)]
    return rec.select(
        "source_file",
        "row_index",
        F.explode(F.array(F.array(*cells))).alias("cells"),
    )
