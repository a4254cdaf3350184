"""Fixed-point integer PageRank (operators/graph.py).

Hand-computed trajectories on tiny graphs pin the exact integer
recurrence (the DuckDB-parity path is covered by the `pagerank` oracle
query); a plan probe checks the edge shuffle is deduped across
iterations via ReusedExchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from ndr_import_spark.operators.graph import (
    pagerank_fixed_point,
    synthetic_link_graph,
)

S = 10**12


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_cycle_is_a_fixpoint(spark):
    # 3-cycle, out-degree 1 everywhere: score stays scale//3 forever.
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    got = {r["id"]: r["score"] for r in pagerank_fixed_point(e, 4).collect()}
    assert got == {0: S // 3, 1: S // 3, 2: S // 3}


def test_star_one_iteration_hand_computed(spark):
    # 1,2,3 -> 0 and 0 -> 1; n=4, init 250_000_000_000 each,
    # teleport floor = 150_000_000_000 // 4 = 37_500_000_000.
    e = _edges(spark, [(1, 0), (2, 0), (3, 0), (0, 1)])
    got = {r["id"]: r["score"] for r in pagerank_fixed_point(e, 1).collect()}
    tp = 37_500_000_000
    assert got[0] == tp + 85 * (3 * 250_000_000_000) // 100
    assert got[1] == tp + 85 * 250_000_000_000 // 100
    assert got[2] == tp  # no in-links: teleport only
    assert got[3] == tp
    # total mass never exceeds scale (dangling/teleport floors leak down)
    assert sum(got.values()) <= S


def test_out_degree_split(spark):
    # 0 -> {1, 2}: each successor gets score//2 of node 0's rank.
    e = _edges(spark, [(0, 1), (0, 2), (1, 0), (2, 0)])
    got = {r["id"]: r["score"] for r in pagerank_fixed_point(e, 1).collect()}
    n = 3
    init = S // n
    tp = 150_000_000_000 // n
    assert got[1] == tp + 85 * (init // 2) // 100
    assert got[2] == got[1]
    assert got[0] == tp + 85 * (init + init) // 100


def test_synthetic_link_graph_shape(spark):
    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    e = synthetic_link_graph(docs, out_degree=3)
    rows = e.collect()
    # stride 7919 mod 10 = 9 -> offsets 9, 8, 7: never 0, so 30 edges
    assert len(rows) == 30
    assert all(0 <= r["dst"] < 10 and r["dst"] != r["src"] for r in rows)
    # deterministic: doc 0 links to (0+9)%10, (0+18)%10, (0+23757)%10
    assert sorted(r["dst"] for r in rows if r["src"] == 0) == [7, 8, 9]


def test_triangle_count_hand_graphs(spark):
    from ndr_import_spark.operators.graph import triangle_count

    # K4: every node sits on C(3,2) = 3 triangles
    k4 = _edges(
        spark,
        [(a, b) for a in range(4) for b in range(4) if a != b],
    )
    got = {r["node"]: r["triangles"] for r in triangle_count(k4).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # a path has no triangles
    path = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    assert triangle_count(path).count() == 0
    # duplicate + reversed edges must not double-count: one triangle
    tri = _edges(spark, [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (0, 2)])
    got = {r["node"]: r["triangles"] for r in triangle_count(tri).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_edge_shuffle_reused_across_iterations(spark):
    docs = spark.range(50).withColumnRenamed("id", "doc_id")
    pr = pagerank_fixed_point(synthetic_link_graph(docs), iterations=3)
    pr.collect()  # AQE resolves exchange reuse at runtime; read final plan
    plan = pr._sc._jvm.PythonSQLUtils.explainString(
        pr._jdf.queryExecution(), "formatted"
    )
    assert "ReusedExchange" in plan


class TestHits:
    def test_hand_star_graph(self, spark):
        from ndr_import_spark.operators.graph import hits_fixed_point

        # hub node 0 points at 1,2,3; they point nowhere.
        edges = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3)], "src long, dst long"
        )
        out = {r["id"]: r for r in hits_fixed_point(edges, 2).collect()}
        # node 0 is the only hub; 1-3 are equal authorities; node 0 has
        # zero authority and 1-3 zero hub score
        assert out[0]["hub"] > 0 and out[0]["authority"] == 0
        assert len({out[i]["authority"] for i in (1, 2, 3)}) == 1
        assert all(out[i]["hub"] == 0 for i in (1, 2, 3))

    def test_partition_count_invariant(self, spark):
        from ndr_import_spark.operators.graph import hits_fixed_point

        rows = [(i, (i * 3 + 1) % 17) for i in range(17) for _ in (0,)]
        rows += [(i, (i * 5 + 2) % 17) for i in range(17)]
        rows = [r for r in rows if r[0] != r[1]]
        a = sorted(
            tuple(r) for r in hits_fixed_point(
                spark.createDataFrame(rows, "src long, dst long")
                .repartition(1), 3).collect()
        )
        b = sorted(
            tuple(r) for r in hits_fixed_point(
                spark.createDataFrame(rows, "src long, dst long")
                .repartition(7), 3).collect()
        )
        assert a == b


class TestLabelPropagation:
    """Synchronous deterministic LPA (graph.label_propagation)."""

    def test_two_cliques_converge_to_min_ids(self, spark):
        from ndr_import_spark.operators.graph import label_propagation

        # two 4-cliques joined by nothing: labels collapse to each
        # clique's smallest id within 2 rounds
        edges = []
        for base in (0, 10):
            ids = [base + i for i in range(4)]
            edges += [(a, b) for a in ids for b in ids if a < b]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.id: r.label for r in label_propagation(df, 3).collect()}
        assert all(got[i] == 0 for i in range(4))
        assert all(got[10 + i] == 10 for i in range(4))

    def test_tie_breaks_to_smallest_label(self, spark):
        from ndr_import_spark.operators.graph import label_propagation

        # node 2 sees neighbours {0, 1} once each: tie → label 0
        df = spark.createDataFrame([(0, 2), (1, 2)], "src long, dst long")
        got = {r.id: r.label for r in label_propagation(df, 1).collect()}
        assert got[2] == 0

    def test_synchronous_trajectory_is_reproducible(self, spark):
        from ndr_import_spark.operators.graph import (
            label_propagation,
            synthetic_block_graph,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        e = synthetic_block_graph(docs, block=16, stride=3)
        a = sorted(map(tuple, label_propagation(e, 4).collect()))
        b = sorted(map(tuple, label_propagation(e, 4).collect()))
        assert a == b

    def test_block_graph_communities_confined_to_blocks(self, spark):
        from ndr_import_spark.operators.graph import (
            label_propagation,
            synthetic_block_graph,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        e = synthetic_block_graph(docs, block=16, stride=3)
        l5 = sorted(map(tuple, label_propagation(e, 5).collect()))
        # labels never cross the planted 16-blocks (edges don't either);
        # NOTE synchronous LPA has no global fixed point here — the
        # sparse phantom tail of the last partial block 2-cycles (the
        # known bipartite oscillation), which is why the oracle gate
        # pins the exact round-5 labelling rather than convergence
        comm = {}
        for nid, lab in l5:
            comm.setdefault(lab, set()).add(nid // 16)
        assert all(len(blocks) == 1 for blocks in comm.values())
        assert len(comm) >= 32  # at least one community per full block

    def test_argmax_has_no_global_window(self, spark):
        from ndr_import_spark.operators.graph import (
            label_propagation,
            synthetic_block_graph,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        plan = (
            label_propagation(synthetic_block_graph(docs), 2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan  # argmax is max-of-struct, not row_number


class TestBfsHops:
    """Frontier BFS (operators/graph.bfs_hops): min-hop semantics on a
    hand graph, unreachable exclusion, and the frontier (not relaxation)
    plan property — each round's join input is only the new nodes."""

    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    def _seeds(self, spark, ids):
        return spark.createDataFrame([(i,) for i in ids], "id long")

    def test_min_hop_distances(self, spark):
        from ndr_import_spark.operators.graph import bfs_hops

        # 0->1->2->3->4 chain plus a shortcut 0->3 and a cycle back 4->0:
        # min-hop must win (3 is 1 hop, not 3), cycle must not loop forever
        e = self._edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (4, 0)])
        got = {r.id: r.hops for r in bfs_hops(e, self._seeds(spark, [0]), 4).collect()}
        assert got == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2}

    def test_unreachable_and_hop_budget(self, spark):
        from ndr_import_spark.operators.graph import bfs_hops

        # 10->11 disconnected; 0->1->2 with max_hops=1 stops at 1
        e = self._edges(spark, [(0, 1), (1, 2), (10, 11)])
        got = {r.id: r.hops for r in bfs_hops(e, self._seeds(spark, [0]), 1).collect()}
        assert got == {0: 0, 1: 1}

    def test_multi_seed_takes_nearest(self, spark):
        from ndr_import_spark.operators.graph import bfs_hops

        e = self._edges(spark, [(0, 1), (1, 2), (5, 2)])
        got = {r.id: r.hops for r in bfs_hops(e, self._seeds(spark, [0, 5]), 3).collect()}
        assert got[2] == 1  # via seed 5, not 2 hops via 0

    def test_directed_edges_not_symmetrised(self, spark):
        from ndr_import_spark.operators.graph import bfs_hops

        e = self._edges(spark, [(1, 0)])  # points INTO the seed
        got = {r.id: r.hops for r in bfs_hops(e, self._seeds(spark, [0]), 3).collect()}
        assert got == {0: 0}
