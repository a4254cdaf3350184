"""Integer-lattice Lloyd's k-means (operators/clustering.py).

Hand-computed 1-D trajectories pin quantisation, the argmin tie-break,
FLOOR (not truncating) centroid division on negative sums, and
empty-cluster drop; engine parity is covered by the `kmeans_clusters`
unrolled-CTE oracle."""

from __future__ import annotations

from ndr_import_spark.operators.clustering import (
    embedding_dims,
    kmeans_lattice,
)


def _emb(spark, vals):
    return spark.createDataFrame(
        [(i, [v]) for i, v in enumerate(vals)],
        "vec_id long, embedding array<float>",
    )


def test_quantization_is_round_half_up_on_doubles(spark):
    df = _emb(spark, [0.5, -0.5, 0.1])
    got = {r["vec_id"]: r["q"] for r in embedding_dims(df).collect()}
    # 0.5*127 = 63.5 exactly (0.5 is dyadic) -> rounds away from zero
    assert got == {0: 64, 1: -64, 2: 13}


def test_two_cluster_hand_trace(spark):
    # q-lattice points 13, 14, 64, 66; init centroids 13 (cid0), 14 (cid1)
    df = _emb(spark, [0.1, 0.11, 0.5, 0.52])
    rows = {r["cluster"]: r for r in kmeans_lattice(df, k=2, iterations=3).collect()}
    assert rows[0]["n_members"] == 2 and rows[1]["n_members"] == 2
    # converged centroids 13 and 65: wcss = (0+1) and (1+1)
    assert rows[0]["wcss"] == 1
    assert rows[1]["wcss"] == 2
    assert rows[0]["min_vec_id"] == 0
    assert rows[1]["min_vec_id"] == 2


def test_centroid_update_floors_negative_sums(spark):
    # q = -13, -14: centroid floor(-27/2) = -14 (floor, NOT truncation);
    # wcss against -14 is 1 + 0
    df = _emb(spark, [-0.1, -0.11])
    row = kmeans_lattice(df, k=1, iterations=1).collect()[0]
    assert row["n_members"] == 2
    assert row["wcss"] == 1


def test_empty_cluster_drops(spark):
    # coincident init centroids: ties all go to cid 0, cid 1 starves
    df = _emb(spark, [0.0, 0.0, 0.0])
    rows = kmeans_lattice(df, k=2, iterations=2).collect()
    assert len(rows) == 1
    assert rows[0]["cluster"] == 0
    assert rows[0]["n_members"] == 3
    assert rows[0]["wcss"] == 0


def test_guards_raise_clear_errors(spark):
    import pytest

    from ndr_import_spark.operators.clustering import (
        _assign_wide,
        embedding_dims,
        kmeans_centroids,
    )
    from ndr_import_spark.streaming import stream_cluster_assign

    df = _emb(spark, [0.1, 0.2])
    dims = embedding_dims(df)
    with pytest.raises(ValueError, match="non-empty centroid"):
        _assign_wide(dims, [], "vec_id")
    # ragged centroid cells (vector-length mismatch) -> clear message
    with pytest.raises(ValueError, match="ragged centroid"):
        _assign_wide(dims, [(0, 0, 5), (1, 0, 5), (1, 1, 5)], "vec_id")
    empty = spark.createDataFrame([], "cid int, d int, c long")
    with pytest.raises(ValueError, match="non-empty centroid"):
        stream_cluster_assign(df, empty)
    # and the public trained-centroid frame is streaming-consumable
    cents = kmeans_centroids(df, k=1, iterations=1)
    assert set(cents.columns) == {"cid", "d", "c"}
    assert cents.count() == 1  # 1 cluster x 1 dim


def test_wide_assign_bit_identical_to_narrow_spec(spark):
    # _assign (join ×k fan-out + min(struct)) is the executable spec;
    # _assign_wide (conditional-aggregate pipeline) must agree value-for-
    # value, including the smaller-cid tie-break on equidistant points.
    from ndr_import_spark.operators.clustering import (
        _assign,
        _assign_wide,
        embedding_dims,
    )

    vals = [
        [0.1, 0.2], [0.11, 0.19], [-0.4, 0.3], [0.0, 0.0],
        [0.5, -0.5], [-0.5, 0.5],  # symmetric: exercises ties
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "vec_id long, embedding array<float>",
    )
    dims = embedding_dims(df)
    cent_rows = [
        (0, 0, 13), (0, 1, 25), (1, 0, -51), (1, 1, 38), (2, 0, 0), (2, 1, 0)
    ]
    cdf = spark.createDataFrame(cent_rows, "cid int, d int, c long")
    narrow = {
        r["vec_id"]: (r["cid"], r["dist"])
        for r in _assign(dims, cdf, "vec_id").collect()
    }
    wide = {
        r["vec_id"]: (r["cid"], r["dist"])
        for r in _assign_wide(dims, cent_rows, "vec_id").collect()
    }
    assert narrow == wide


def test_semantic_dedup_pairs_within_cluster_only(spark):
    from ndr_import_spark.operators.clustering import semantic_dedup_pairs

    # blob A: three near-identical +x vectors; blob B: two +y and one -x.
    # -x lands in whichever cluster is nearer but can never pair with +x
    # (negative dot) nor +y (zero dot).
    rows = [
        (0, [1.0, 0.0]), (1, [0.99, 0.01]), (2, [0.98, 0.0]),
        (3, [0.0, 1.0]), (4, [0.0, 0.97]), (5, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = semantic_dedup_pairs(df, k=2, iterations=2, threshold_pct=90)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert got == {(0, 1), (0, 2), (1, 2), (3, 4)}
    # every surviving pair carries a positive integer dot
    assert all(r["int_dot"] > 0 for r in pairs.collect())


def test_semantic_dedup_threshold_is_exact_integer_arithmetic(spark):
    from ndr_import_spark.operators.clustering import semantic_dedup_pairs

    # 2-d lattice: (127, 0) vs (90, 90): cos = 90/(127.28..) ≈ 0.7071.
    # p=70 keeps the pair; p=71 drops it — the boundary is exact ints.
    rows = [(0, [1.0, 0.0]), (1, [0.709, 0.709])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    keep = semantic_dedup_pairs(df, k=1, iterations=1, threshold_pct=70)
    drop = semantic_dedup_pairs(df, k=1, iterations=1, threshold_pct=71)
    assert keep.count() == 1
    assert drop.count() == 0


def test_separated_blobs_converge_to_their_means(spark):
    vals = [0.01, 0.02, 0.03, 0.8, 0.81, 0.82]
    df = _emb(spark, vals)
    rows = {r["cluster"]: r for r in kmeans_lattice(df, k=2, iterations=3).collect()}
    assert rows[0]["n_members"] == 3
    assert rows[1]["n_members"] == 3
    assert rows[0]["min_vec_id"] == 0
    assert rows[1]["min_vec_id"] == 3


def test_capped_semantic_dedup_bounds_dominant_cluster(spark):
    """Adversarially dominant cluster (r5 VERDICT item 4): all vectors
    land in ONE k-means cluster, but they are pairwise-distinct in every
    quantized band, so the capped path generates ZERO candidate pairs
    where the uncapped path dots all m(m-1)/2 — except the planted
    identical twins, which agree on every band and are still found."""
    from ndr_import_spark.operators.clustering import semantic_dedup_pairs

    m = 40
    rows = []
    for i in range(m):
        # base direction + a unique per-vector bump in BOTH bands
        # (n_bands=2: band0 = dims {0,2}, band1 = dims {1,3}) -> all in
        # one cluster, every band signature distinct
        v = [1.0 + 0.05 * (i + 1), 1.0 + 0.07 * (i + 1), 1.0, 1.0]
        rows.append((i, v))
    # planted near-identical twins: same vector twice
    rows.append((100, [2.0, 2.0, 2.0, 2.0]))
    rows.append((101, [2.0, 2.0, 2.0, 2.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    uncapped = semantic_dedup_pairs(
        df, k=1, iterations=1, threshold_pct=90, max_cluster_size=None
    )
    capped = semantic_dedup_pairs(
        df, k=1, iterations=1, threshold_pct=90, max_cluster_size=10, n_bands=2
    )
    got_capped = {(r["a_id"], r["b_id"]) for r in capped.collect()}
    got_uncapped = {(r["a_id"], r["b_id"]) for r in uncapped.collect()}
    # the twins survive the cap
    assert (100, 101) in got_capped
    assert got_capped <= got_uncapped
    # and the candidate volume is bounded: only band-matching pairs are
    # ever dotted -- the planted twins are the ONLY band collision
    assert got_capped == {(100, 101)}
    assert len(got_uncapped) > 50  # nearby 1.0-base vectors are >=90% cosine


def test_capped_equals_uncapped_when_under_cap(spark):
    from ndr_import_spark.operators.clustering import semantic_dedup_pairs

    rows = [(i, [float(i % 3 + 1), 2.0, 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    base = semantic_dedup_pairs(df, k=2, iterations=2, threshold_pct=80)
    capped = semantic_dedup_pairs(
        df, k=2, iterations=2, threshold_pct=80, max_cluster_size=100
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, capped.collect())
    )


def test_semantic_dedup_cap_is_default_on(spark):
    """r6 VERDICT item 2: the scale guard must be opt-OUT. The default
    max_cluster_size is finite so an unread-docs caller gets the bounded
    shape; None is the explicit uncapped escape hatch. r12 lowered the
    default 65536 -> 8192 (r11 VERDICT item 1): the blockwise pair scan
    bounds MEMORY at any m, but one task still runs the whole cluster's
    m²·d arithmetic, and 65536² ≈ 2.7·10¹⁴ int ops is not a defensible
    single-task bound."""
    import inspect

    from ndr_import_spark.operators.clustering import semantic_dedup_pairs

    sig = inspect.signature(semantic_dedup_pairs)
    assert sig.parameters["max_cluster_size"].default == 8192

    # behavioural pin: with a tiny corpus the default equals uncapped
    rows = [(i, [float(i % 3 + 1), 2.0, 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    default = semantic_dedup_pairs(df, k=2, iterations=2, threshold_pct=80)
    uncapped = semantic_dedup_pairs(
        df, k=2, iterations=2, threshold_pct=80, max_cluster_size=None
    )
    assert sorted(map(tuple, default.collect())) == sorted(
        map(tuple, uncapped.collect())
    )


def test_pair_scan_blockwise_equals_full_matrix(spark):
    """r11 VERDICT item 1: the uncapped within-cluster pair phase must
    never materialise the m×m dots matrix — one task holds a whole
    cluster, and m = 65536 would need ~70 GB for it. The scan now runs
    in row blocks of ⌊pair_block_elems / m⌋ rows. Force 1-row blocks on
    a 50-member mega-cluster (50 ≫ block size — 49 block boundaries
    exercised) and pin the output identical to the single-block run,
    which IS the former full-matrix computation."""
    from ndr_import_spark.operators.clustering import semantic_dedup_pairs

    m = 50
    rows = [
        (i, [1.0 + 0.001 * i, 2.0 - 0.002 * i, 1.0 + 0.003 * (i % 7), 2.0])
        for i in range(m)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # pair_block_elems=64 with m=50 -> 1-row blocks (64 // 50 = 1)
    blocked = semantic_dedup_pairs(
        df, k=1, iterations=1, threshold_pct=90,
        max_cluster_size=None, pair_block_elems=64,
    )
    single = semantic_dedup_pairs(
        df, k=1, iterations=1, threshold_pct=90,
        max_cluster_size=None, pair_block_elems=1 << 23,
    )
    got_blocked = sorted(map(tuple, blocked.collect()))
    got_single = sorted(map(tuple, single.collect()))
    assert got_blocked == got_single
    # the near-parallel vectors must actually produce pairs, and each
    # row carries the exact integer dot (sanity that the blocked path
    # emits real values, not placeholders)
    assert len(got_blocked) > 100
    assert all(r[3] > 0 for r in got_blocked)


def test_np_assign_bit_identical_to_wide(spark):
    # r11: _assign_np (vectorized Arrow matmul assignment) must agree
    # value-for-value with _assign_wide, including the smaller-cid
    # tie-break (np.argmin returns the FIRST minimum over cid-sorted
    # centroid rows) — the same contract test_wide_assign_bit_identical
    # pins between the wide form and the executable spec.
    from ndr_import_spark.operators.clustering import (
        _assign_np,
        _assign_wide,
        embedding_dims,
        embedding_qarr,
    )

    vals = [
        [0.1, 0.2], [0.11, 0.19], [-0.4, 0.3], [0.0, 0.0],
        [0.5, -0.5], [-0.5, 0.5],  # symmetric: exercises ties
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "vec_id long, embedding array<float>",
    )
    cent_rows = [
        (0, 0, 13), (0, 1, 25), (1, 0, -51), (1, 1, 38), (2, 0, 0), (2, 1, 0)
    ]
    wide = {
        r["vec_id"]: (r["cid"], r["dist"])
        for r in _assign_wide(embedding_dims(df), cent_rows, "vec_id").collect()
    }
    arrow = {
        r["vec_id"]: (r["cid"], r["dist"])
        for r in _assign_np(embedding_qarr(df), cent_rows, "vec_id").collect()
    }
    assert wide == arrow


def test_qarr_guards_and_invalid_rows(spark):
    import pytest

    from ndr_import_spark.operators.clustering import (
        _assign_np,
        embedding_qarr,
    )

    df = spark.createDataFrame(
        [(0, [0.1]), (1, None), (2, [])],
        "vec_id long, embedding array<float>",
    )
    qdf = embedding_qarr(df)
    # NULL / empty vectors are excluded exactly like posexplode's long
    # form (no rows emitted for them)
    assert [r["vec_id"] for r in qdf.collect()] == [0]
    with pytest.raises(ValueError, match="non-empty centroid"):
        _assign_np(qdf, [], "vec_id")
    with pytest.raises(ValueError, match="ragged centroid"):
        _assign_np(qdf, [(0, 0, 5), (1, 0, 5), (1, 1, 5)], "vec_id")


def test_np_assignment_plan_has_no_exchange(spark):
    # the point of the r11 Arrow path: assignment itself never shuffles —
    # scan -> quantise -> one ArrowEvalPython-class pass, no Exchange,
    # no join, no aggregate
    from ndr_import_spark.operators.clustering import (
        _assign_np,
        embedding_qarr,
    )

    df = _emb(spark, [0.1, 0.2, 0.3])
    asg = _assign_np(embedding_qarr(df), [(0, 0, 10), (1, 0, 50)], "vec_id")
    plan = asg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan
