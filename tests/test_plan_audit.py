"""Physical-plan audits: the scale properties the operators claim must be
visible in `.explain` — filter pushdown, column pruning, broadcast
semi-joins, no cartesian products, narrow compiled mappings.

These tests pin the PLAN, not the result: a refactor that silently turns
a broadcast semi-join into a shuffled join or drops a pushed filter still
returns correct rows at sf0.01 but dies at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def plan(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


class TestScanPushdown:
    def test_q6_filters_reach_parquet_scan(self, spark):
        p = plan(entry.queries()["q6_forecast_revenue"](spark, SF_DIR))
        assert "PushedFilters: [" in p
        # at least one real pushed predicate, not an empty list
        assert "PushedFilters: []" not in p.split("PushedFilters:", 1)[1][:200]

    def test_q6_column_pruning(self, spark):
        p = plan(entry.queries()["q6_forecast_revenue"](spark, SF_DIR))
        # q6 needs 4 lineitem columns; the scan schema must not include
        # untouched wide columns like l_comment
        read_schema = p.split("ReadSchema:", 1)[1].split("\n", 1)[0]
        assert "l_comment" not in read_schema
        assert "l_extendedprice" in read_schema


class TestJoinShapes:
    def test_decontaminate_broadcast_semi_join(self, spark):
        p = plan(entry.queries()["decontaminate"](spark, SF_DIR))
        assert "LeftSemi" in p
        assert "BroadcastHashJoin" in p or "BroadcastExchange" in p

    def test_no_cartesian_in_dedup_family(self, spark):
        for name in ["dedup_minhash", "dedup_ngram_jaccard", "ann_lsh_pairs",
                     "dedup_embedding"]:
            p = plan(entry.queries()[name](spark, SF_DIR), "simple")
            assert "CartesianProduct" not in p, name
            assert "BroadcastNestedLoopJoin" not in p, name

    def test_composed_pipelines_no_cartesian(self, spark):
        for name in ["training_mix", "funnel_analysis", "window_analytics",
                     "range_join_windows", "merge_upsert"]:
            p = plan(entry.queries()[name](spark, SF_DIR), "simple")
            assert "CartesianProduct" not in p, name
            assert "BroadcastNestedLoopJoin" not in p, name

    def test_q4_semi_join_carries_non_equi_residual(self, spark):
        # the EXISTS compiles to ONE LeftSemi hash join on the equi key
        # with l_shipdate > o_orderdate as its residual — not a full join
        # + distinct (which would duplicate orders by lineitem fan-out)
        p = plan(entry.queries()["q4_priority_semi"](spark, SF_DIR), "simple")
        assert "LeftSemi" in p
        assert "CartesianProduct" not in p
        assert "Distinct" not in p and "distinct" not in p

    def test_q16_excluded_suppliers_are_anti_joined(self, spark):
        p = plan(entry.queries()["q16_supplier_variety"](spark, SF_DIR), "simple")
        assert "LeftAnti" in p
        assert "CartesianProduct" not in p

    def test_q17_threshold_join_no_cartesian(self, spark):
        # correlated-avg rewrite: aggregate-then-join on partkey; the
        # exact-decimal threshold rides the join as a residual condition
        p = plan(entry.queries()["q17_small_order_revenue"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_q19_disjunction_stays_single_equi_join(self, spark):
        # three OR branches must NOT become a union of three joins; the
        # common quantity/size bounds are extracted and pushed to the scan
        p = plan(entry.queries()["q19_disjunctive"](spark, SF_DIR))
        assert "Union" not in p
        assert "CartesianProduct" not in p
        pushed = p.split("PushedFilters:", 1)[1][:400]
        assert "GreaterThanOrEqual(l_quantity,1.0)" in pushed

    def test_q22_threshold_is_one_row_broadcast(self, spark):
        # scalar-subquery threshold: the only nested-loop join allowed is
        # the deliberate 1-row broadcast cross join; the NOT EXISTS must
        # be a LeftAnti hash join
        p = plan(entry.queries()["q22_dormant_customers"](spark, SF_DIR), "simple")
        assert "LeftAnti" in p
        assert p.count("BroadcastNestedLoopJoin") <= 1
        assert "CartesianProduct" not in p

    def test_relational_breadth_filters_push_to_scans(self, spark):
        for name in ["q7_volume_shipping", "q8_market_share", "q14_promo_share",
                     "q15_top_supplier"]:
            p = plan(entry.queries()[name](spark, SF_DIR))
            assert "PushedFilters: [" in p, name
            first = p.split("PushedFilters:", 1)[1][:200]
            assert "PushedFilters: []" not in first, name

    def test_tfidf_scalar_attach_is_broadcast(self, spark):
        # the corpus-size attach is a 1-row broadcast BNLJ by design;
        # the guard is that the broadcast is present (not a shuffle) and
        # nothing else degenerates to a cartesian product
        p = plan(entry.queries()["tfidf_top_terms"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastExchange" in p


class TestNarrowPipelines:
    def test_compiled_mapping_has_no_exchange(self, spark):
        # the YAML->select compiler must stay a narrow projection: zero
        # shuffles between parquet scan and records
        p = plan(entry.queries()["map_clean_fields"](spark, SF_DIR), "simple")
        body = p.split("AdaptiveSparkPlan", 1)[-1]
        # the only allowed Exchange is the final presentation orderBy
        n_exchanges = body.count("Exchange")
        n_sorts = body.count("rangepartitioning")
        assert n_exchanges <= 1
        if n_exchanges == 1:
            assert n_sorts >= 1  # it is the orderBy, not a shuffle join

    def test_chunking_is_shuffle_free(self, spark):
        from ndr_import_spark.operators.corpus import chunk_documents

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        p = plan(chunk_documents(docs), "simple")
        assert "Exchange" not in p

    def test_text_profile_is_shuffle_free(self, spark):
        from ndr_import_spark.operators.textstats import text_profile

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        p = plan(text_profile(docs), "simple")
        assert "Exchange" not in p
        assert "BatchScan" in p or "FileScan" in p or "Scan parquet" in p


class TestNewOperatorPlanShapes:
    def test_pack_sequences_single_data_shuffle(self, spark):
        # one Exchange partitions by shard for the window; the group-by
        # (shard, pack) aggregate must NOT re-shuffle (grouping contains
        # the partition key) — only the final orderBy may add exchanges
        p = plan(entry.queries()["pack_sequences"](spark, SF_DIR), "simple")
        pre_sort = p.split("Sort", 1)[0]
        assert pre_sort.count("Exchange") <= 1, p

    def test_bm25_corpus_side_not_force_broadcast(self, spark):
        # tiny frames (term DF, 1-row stats) broadcast; the doc-length
        # frame carries no hint so it stays shuffle-plannable at scale
        p = plan(entry.queries()["bm25_search"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastExchange" in p

    def test_oov_vocab_is_broadcast(self, spark):
        p = plan(entry.queries()["oov_rate"](spark, SF_DIR), "simple")
        assert "BroadcastExchange" in p
        assert "CartesianProduct" not in p

    def test_snapshot_diff_shuffles_hashes_not_text(self, spark):
        # the full-outer join must move only (doc_id, md5) — the text
        # column is hashed at scan time and must not appear in any
        # exchange's output schema
        df = entry.queries()["snapshot_diff"](spark, SF_DIR)
        p = plan(df, "formatted")
        for chunk in p.split("\n\n"):
            if chunk.strip().startswith("(") and "Exchange" in chunk.split("\n")[0]:
                assert "text#" not in chunk, chunk

    def test_mix_temperature_no_corpus_shuffle_after_agg(self, spark):
        # after the per-source aggregate, everything is group-cardinality:
        # no exchange may carry the raw token column
        p = plan(entry.queries()["mix_temperature"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p

    def test_kmv_overlap_no_cartesian(self, spark):
        p = plan(entry.queries()["vocab_overlap_kmv"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p


class TestLatestOperatorPlanShapes:
    def test_decontaminate_report_eval_side_broadcast(self, spark):
        p = plan(entry.queries()["decontaminate_report"](spark, SF_DIR), "simple")
        assert "BroadcastExchange" in p
        assert "CartesianProduct" not in p

    def test_corpus_card_no_join_no_window(self, spark):
        p = plan(entry.queries()["corpus_card"](spark, SF_DIR), "simple")
        assert "Window" not in p
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    def test_pmi_no_cartesian_and_topk_is_take_ordered(self, spark):
        p = plan(entry.queries()["pmi_collocations"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        assert "TakeOrderedAndProject" in p  # top-k, not a global sort

    def test_dedup_keep_best_no_window(self, spark):
        # the election is an aggregate, not a row_number window
        p = plan(entry.queries()["dedup_keep_best"](spark, SF_DIR), "simple")
        assert "Window" not in p

    def test_incremental_dedup_no_cartesian(self, spark):
        p = plan(entry.queries()["incremental_dedup"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_simhash_verify_runs_inside_bucket_join(self, spark):
        # the Hamming filter must sit BELOW the pair-dedup aggregate, so
        # hot buckets never push raw candidates into a shuffle (the sf1
        # 73M-candidate pathology); bit_count appears in a Filter that
        # feeds the dedup, and there is no post-dedup signature re-join
        from ndr_import_spark.operators.dedup import simhash_hamming_pairs

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        p = plan(simhash_hamming_pairs(docs), "simple")
        assert "CartesianProduct" not in p
        assert "bit_count" in p
        # simple mode prints the tree top-down (root first): NOTHING may
        # sit above the pair-dedup aggregate except exchanges — the old
        # shape re-joined signatures ABOVE the dedup, shuffling 73M raw
        # candidates at sf1; now every join (bucket self-join + the
        # signature frame's zero-token back-join) is below it, and the
        # hamming predicate feeds the dedup from below too
        dedup_at = p.find("HashAggregate")
        assert dedup_at >= 0
        assert p.find("Join") > dedup_at, "no join above the pair dedup"
        assert p.find("bit_count") > dedup_at, "hamming filter feeds the dedup"


class TestRound5PlanShapes:
    def test_doc_fingerprints_min_stays_in_hash_aggregate(self, spark):
        # the 60-bit LONG chunk hash exists so the per-doc MIN runs as
        # HashAggregate with map-side partials; a string fingerprint
        # regresses to SortAggregate (a sort on both sides of the
        # exchange) — pin the plan
        p = plan(entry.queries()["doc_fingerprints"](spark, SF_DIR))
        assert "SortAggregate" not in p
        assert "partial_min" in p  # map-side combine before the exchange

    def test_textstats_queries_have_no_interpreted_hofs(self, spark):
        # the r5 codegen rewrites must not regress to ArrayFilter/
        # ArrayTransform/ArrayAggregate/ZipWith (interpreted)
        for q in ("text_stats", "lang_id", "tokenizer_fertility",
                  "lexical_diversity", "quality_filter"):
            p = plan(entry.queries()[q](spark, SF_DIR), "extended")
            for node in ("aggregate(", "zip_with(", "transform(", "filter(lambda"):
                assert node not in p, f"{q} plan contains {node!r}"

    def test_incremental_dedup_probe_reuses_codegen_signature(self, spark):
        # the banded probe must consume the _sig column computed by
        # _hashed_sig_frame, never re-derive signatures through the
        # interpreted minhash_signatures_column fallback
        from ndr_import_spark.operators.dedup import incremental_neardup_pairs

        old = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
        new = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(80).filter(F.col("doc_id") >= 50)
            .withColumn("doc_id", F.col("doc_id") + 100000)
        )
        df = incremental_neardup_pairs(old, new)
        p = plan(df, "extended")
        assert "aggregate(" not in p and "zip_with(" not in p
        df.sparkSession  # keep the scope alive until after the assert
        df._ndr_cache_scope.release()


class TestSessionTwoPlanShapes:
    def test_gopher_gram_counts_stay_in_hash_aggregate(self, spark):
        # the gram frame groups on (_id, _n, _gram) with count — partial
        # map-side aggregation must collapse grams before the exchange
        p = plan(entry.queries()["gopher_quality"](spark, SF_DIR))
        assert "partial_count" in p
        # no interpreted HOFs anywhere in the bundle
        pe = plan(entry.queries()["gopher_quality"](spark, SF_DIR), "extended")
        for node in ("aggregate(", "zip_with(", "filter(lambda"):
            assert node not in pe

    def test_pagerank_broadcasts_node_count_not_edges(self, spark):
        # the scalar n rides as a BROADCAST nested-loop (1-row side,
        # Cross BuildRight); the edges<->scores joins must be keyed
        # equi-joins and nothing may fall to an unbroadcast cartesian
        p = plan(entry.queries()["pagerank"](spark, SF_DIR))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin Cross BuildRight" in p  # scalars
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        # every nested-loop is a broadcast-scalar cross, never an outer
        # (formatted explain: tree mentions carry the suffix, detail
        # mentions don't -> suffixed must be exactly half of all)
        assert p.count("BroadcastNestedLoopJoin") == 2 * p.count(
            "BroadcastNestedLoopJoin Cross BuildRight"
        )

    def test_kmeans_assignment_is_single_aggregate_per_round(self, spark):
        # the wide conditional-aggregate form: centroid join broadcast,
        # ONE groupBy per assignment (no per-(id,cid) pre-aggregate)
        from ndr_import_spark.operators.clustering import (
            _assign_wide,
            embedding_dims,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        cent = [(c, d, 7) for c in range(4) for d in range(64)]
        df = _assign_wide(embedding_dims(emb), cent, "vec_id")
        p = plan(df)
        assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
        # exactly one aggregate pair (partial + final) over vec_id —
        # formatted explain prints each node twice (tree + detail)
        assert p.count("HashAggregate") == 4
        assert "SortAggregate" not in p

    def test_record_linkage_no_cartesian(self, spark):
        p = plan(entry.queries()["record_linkage"](spark, SF_DIR))
        assert "CartesianProduct" not in p

    def test_url_dedup_param_sort_is_the_only_wide_step(self, spark):
        p = plan(entry.queries()["url_dedup"](spark, SF_DIR))
        assert "CartesianProduct" not in p
        # canonical-key dedup aggregates with map-side partials
        assert "partial_count" in p

    def test_triangle_count_joins_are_equi_joins(self, spark):
        p = plan(entry.queries()["triangle_count"](spark, SF_DIR))
        assert "CartesianProduct" not in p
        # the only nested-loops are the 1-row node-count scalars from the
        # synthetic graph construction; wedge/closure joins are keyed
        assert p.count("BroadcastNestedLoopJoin") == 2 * p.count(
            "BroadcastNestedLoopJoin Cross BuildRight"
        )


class TestSession3Ops:
    def test_phrase_search_postings_joins_are_equijoins(self, spark):
        from ndr_import_spark.operators.retrieval import phrase_search

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        df = phrase_search(docs, ["slow hash batch", "big data merge"])
        p = plan(df, "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_perplexity_buckets_no_cartesian_on_corpus(self, spark):
        p = plan(entry.queries()["perplexity_buckets"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p

    def test_pca_gram_shuffles_partials_not_corpus(self, spark):
        from ndr_import_spark.operators.pca import augmented_gram

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        p = plan(augmented_gram(emb, 64), "formatted")
        # exactly one exchange: the (batches x (d+1)^2) partial-gram rows;
        # the corpus itself only flows into mapInPandas
        assert p.count("Exchange") <= 2  # partial agg exchange (+AQE read)
        assert "MapInPandas" in p
        assert "Join" not in p

    def test_logreg_feature_frame_is_narrow(self, spark):
        from ndr_import_spark.operators.classifier import longform_features

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        p = plan(longform_features(docs), "formatted")
        assert "Exchange" not in p
        assert "Join" not in p

    def test_zorder_key_is_narrow_codegen(self, spark):
        from ndr_import_spark.operators.layout import morton_key, quantise_dim
        import pyspark.sql.functions as F

        df = spark.range(100).select(
            F.col("id").alias("x"), (F.col("id") * 7 % 50).alias("y")
        )
        keyed = df.select(
            morton_key(
                quantise_dim(F.col("x"), F.lit(0), F.lit(99), 16),
                quantise_dim(F.col("y"), F.lit(0), F.lit(49), 16),
            ).alias("z")
        )
        p = plan(keyed, "formatted")
        assert "Exchange" not in p and "BatchEvalPython" not in p
        # '*' prefix marks whole-stage-codegen nodes in formatted mode
        assert "* Project" in p

    def test_table_profile_single_data_shuffle(self, spark):
        p = plan(entry.queries()["table_profile"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        # melt + two keyed aggregates: exchanges only for the (c,v) and
        # (c) hash aggregations (+ final sort), never a join
        assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


class TestRound6PlanShapes:
    def test_heaps_law_no_unpartitioned_doc_window(self, spark):
        # r6 top ask: the cumulative (tokens, new-types) sums must run on
        # the chunked prefix machinery — every window that orders by
        # doc_id is partitioned by the chunk id, so no doc-count-sized
        # frame ever funnels through one reducer. The only permissible
        # SinglePartition window is the per-chunk offsets frame (one row
        # per 2^16 docs).
        p = plan(entry.queries()["heaps_law"](spark, SF_DIR), "simple")
        for line in p.splitlines():
            if "Window" in line and "doc_id" in line:
                spec_prefix = line.split("windowspecdefinition(", 1)[1].split(
                    "doc_id", 1
                )[0]
                assert "_ck" in spec_prefix, line
        # and the offsets side aggregates BEFORE its tiny global window:
        # the SinglePartition exchange may only sit under a Window that
        # consumes per-chunk totals (_tot_*), never raw per-doc rows
        lines = p.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" in line:
                above = "\n".join(lines[max(0, i - 3):i])
                # legitimate SinglePartition exchanges: the per-chunk
                # offsets window (consumes _tot_* rows, one per 2^16
                # docs) and the final scalar OLS aggregate (keys=[])
                assert "_tot_" in above or "HashAggregate(keys=[]" in above, (
                    f"SinglePartition feeds a non-chunk frame:\n{above}"
                )

    def test_main_content_single_regroup_no_python(self, spark):
        # segmentation + block features are pure codegen maps; the only
        # exchange is the per-doc regroup of already-KEPT blocks (the
        # output itself), and nothing touches Python workers
        p = plan(entry.queries()["main_content"](spark, SF_DIR), "simple")
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "CartesianProduct" not in p
        assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p

    def test_semantic_dedup_capped_no_cartesian(self, spark):
        p = plan(entry.queries()["semantic_dedup_capped"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestRound6Session2PlanShapes:
    def test_dsir_selection_is_take_ordered_not_global_sort(self, spark):
        p = plan(entry.queries()["dsir_resample"](spark, SF_DIR))
        assert "TakeOrderedAndProject" in p
        # the llr table (bounded by the 1024 hash buckets) broadcasts
        assert "BroadcastHashJoin" in p

    def test_c4_span_window_partitions_on_doc(self, spark):
        import re

        p = plan(entry.queries()["c4_clean"](spark, SF_DIR), "extended")
        # every window spec must carry the doc partition key: a global
        # window over the sentence frame is the 100 TB single-reducer bug
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", p):
            assert "_id" in m.group(1)

    def test_hll_registers_have_no_window_no_python(self, spark):
        p = plan(entry.queries()["hll_distinct"](spark, SF_DIR))
        assert "Window" not in p
        assert "BatchEvalPython" not in p and "ArrowEval" not in p

    def test_label_propagation_argmax_is_aggregate_not_window(self, spark):
        p = plan(entry.queries()["label_propagation"](spark, SF_DIR))
        assert "Window" not in p

    def test_link_graph_single_exchange(self, spark):
        # extraction is per-row codegen; the ONLY exchange belongs to the
        # host-edge aggregate (plus AQE reads)
        p = plan(entry.queries()["link_graph"](spark, SF_DIR))
        import re

        n = len(re.findall(r"Exchange hashpartitioning", p))
        assert n <= 2  # partial/final pair of the one aggregate

    def test_compaction_window_partitions_per_table_partition(self, spark):
        import re

        p = plan(entry.queries()["compaction_plan"](spark, SF_DIR), "extended")
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
        assert specs and all("partition" in s for s in specs)

    def test_unicode_clean_transform_shuffle_free(self, spark):
        from ndr_import_spark.operators.unicode_clean import clean_unicode

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        p = plan(clean_unicode(docs))
        assert "Exchange" not in p


class TestSession2Plans:
    """Plan pins for the round-7 session-2 queries."""

    def test_q2_single_lineitem_scan(self, spark):
        # the window-MIN form must scan lineitem ONCE; the textbook
        # agg+join-back form it replaced scanned it twice
        p = plan(entry.queries()["q2_min_cost_supplier"](spark, SF_DIR))
        assert p.count("lineitem.parquet") == 1
        assert "Window" in p  # the per-part MIN is the window, not a self-join

    def test_q11_scalar_threshold_is_broadcast_not_window(self, spark):
        p = plan(entry.queries()["q11_important_parts"](spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
        assert "Window" not in p  # global total is a 1-row cross join

    def test_q20_semi_join_no_supplier_duplication(self, spark):
        p = plan(entry.queries()["q20_dominant_shippers"](spark, SF_DIR))
        assert "LeftSemi" in p

    def test_parquet_layout_reads_no_data_pages(self, spark):
        # the probe's plan must contain NO parquet scan of the tables —
        # footers are read inside the Python task, not by Spark's reader
        p = plan(entry.queries()["parquet_layout"](spark, SF_DIR))
        assert "lineitem.parquet" not in p.split("== Physical Plan ==")[-1] \
            or "FileScan" not in p
        assert "MapInPandas" in p

    def test_bfs_no_global_window_or_cartesian(self, spark):
        p = plan(entry.queries()["bfs_reachability"](spark, SF_DIR))
        assert "CartesianProduct" not in p
        assert "Window" not in p


class TestR8PlanShapes:
    """Plan audits for the round-8 additions."""

    def test_image_pipeline_broadcast_survivor_join_no_cartesian(self, spark):
        p = plan(entry.queries()["image_pipeline"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastHashJoin" in p or "BroadcastExchange" in p

    def test_zstd_dict_train_broadcasts_dictionary(self, spark):
        # the one-row dictionary must ride a broadcast, never a shuffle
        # against the sampled corpus
        p = plan(entry.queries()["zstd_dict_train"](spark, SF_DIR), "simple")
        assert "BroadcastExchange" in p
        assert "CartesianProduct" not in p
        # top-k is the limit-pushed sort, not a global materialised sort
        assert "TakeOrderedAndProject" in p

    def test_hybrid_rrf_fuses_bounded_frames(self, spark):
        p = plan(entry.queries()["hybrid_search_rrf"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        # both rankers cut to top-k before fusion
        assert "TakeOrderedAndProject" in p or "Limit" in p

    def test_source_lexical_drift_prunes_by_broadcast_vocab(self, spark):
        # r11: the operator aggregates (source, token) counts ONCE and
        # checkpoints the bounded frames, so the declared plan reads the
        # sources x V dense RDD (corpus scans: zero) and the broadcast
        # vocabulary prune lives in the checkpoint's own subtree. Audit
        # both halves: the final plan must be cartesian-free and
        # corpus-free; the pre-barrier composition must still prune the
        # token stream through a broadcast of the 200-row vocabulary.
        p = plan(
            entry.queries()["source_lexical_drift"](spark, SF_DIR), "simple"
        )
        assert "CartesianProduct" not in p
        assert "Scan parquet" not in p  # bounded RDDs only
        assert "Scan ExistingRDD" in p

        # the REAL pre-barrier subtree (r11 ADVICE: no hand-rebuilt
        # copy — if the operator drops the broadcast hint or
        # restructures the join, this audit must fail)
        from ndr_import_spark.operators.corpus import _drift_token_counts

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _full, _vocab, cnt = _drift_token_counts(docs, "text", "source", 200)
        inner = plan(cnt, "simple")
        assert "BroadcastHashJoin" in inner or "BroadcastExchange" in inner

    def test_scan_prune_plan_reads_no_data_bytes(self, spark):
        # the planner's input is the footer inventory: the lineitem scan
        # exists only in the rewrite stage; the plan stage reads the
        # one-row-per-row-group frame
        df = entry.queries()["scan_prune_plan"](spark, SF_DIR)
        rows = df.collect()
        assert all(r.kept == (r.key_max >= 4000 and r.key_min <= 9000)
                   for r in rows)
        assert sum(r.n_rows for r in rows) > 0

    def test_epoch_shuffle_single_window_per_epoch(self, spark):
        p = plan(entry.queries()["epoch_shuffle"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in p
        # the epoch fan-out is a broadcast of 4 rows, not a shuffle
        assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p


class TestRound10Plans:
    """Plan pins for the r10 multimodal additions: both are stateless
    Arrow passes whose ONLY exchanges are the final analytic aggregate
    (mp3) / output ordering (canvas) — payloads must never shuffle."""

    def test_mp3_integrity_payloads_never_shuffle(self, spark):
        df = entry.queries()["mp3_integrity"](spark, SF_DIR)
        p = plan(df, "simple")
        assert "CartesianProduct" not in p
        # the payload column must be consumed by the Python runner
        # BEFORE any Exchange: the only shuffled rows are the
        # 14-column structural summaries and the 4-group aggregate
        python_part = p.split("MapInPandas", 1)[0]
        assert "payload" not in python_part.split("Exchange")[0] or \
            "Exchange" not in python_part, (
                "payload bytes cross an exchange before the Arrow pass")

    def test_webp_canvas_table_shuffles_sums_not_canvases(self, spark):
        df = entry.queries()["webp_anim_canvas"](spark, SF_DIR)
        p = plan(df, "simple")
        assert "CartesianProduct" not in p
        assert "MapInPandas" in p
        # after the Arrow pass only digest/sum columns exist; the
        # canvas bytes never appear in a post-MapInPandas exchange
        post = p.split("MapInPandas", 1)[0]  # plan prints top-down:
        # everything ABOVE MapInPandas is post-pass
        assert "canvas " not in post


class TestRound11Plans:
    def test_album_art_pipeline_broadcast_join_no_cartesian(self, spark):
        """The capstone claims: art-sized Arrow passes, ONE hash
        groupBy, a BROADCAST kept-make join — and image payload bytes
        must never cross the post-hash exchanges."""
        df = entry.queries()["album_art_pipeline"](spark, SF_DIR)
        p = plan(df, "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastHashJoin" in p  # kept_make join is broadcast
        # payload bytes (audio or art) must never be a shuffle key and
        # the groupBy exchanges carry the 64-bit hash, not images
        assert "hashpartitioning(payload" not in p
        assert "hashpartitioning(phash" in p

    def test_cross_codec_audio_dedup_groups_on_fingerprint(self, spark):
        """Samples never leave the Arrow task: the single groupBy keys
        on the 32-bit fingerprint; no cartesian, no payload exchange."""
        df = entry.queries()["cross_codec_audio_dedup"](spark, SF_DIR)
        p = plan(df, "simple")
        assert "CartesianProduct" not in p
        assert "hashpartitioning(fingerprint" in p
        assert "hashpartitioning(payload" not in p

    def test_audio_pipeline_broadcast_semi_joins_no_cartesian(self, spark):
        """The capstone claims: payload-free fingerprint groupBy plus
        BROADCAST semi-joins for the ok-id and kept-id filters."""
        df = entry.queries()["audio_pipeline"](spark, SF_DIR)
        p = plan(df, "simple")
        assert "CartesianProduct" not in p
        assert p.count("BroadcastHashJoin") >= 2  # ok-ids + kept-ids
        assert "hashpartitioning(fingerprint" in p
        assert "hashpartitioning(payload" not in p
