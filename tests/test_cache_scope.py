"""Per-pipeline banded-dedup cache scoping (operators/dedup._CacheScope).

Regression for the round-3 module-global `_LIVE_CACHE`: building banded
pipeline B used to evict still-lazy pipeline A's cache, so acting on A
afterwards recomputed its shingle pass per plan reference (~3x slower,
still correct). Scopes are now per-pipeline, held in a bounded LRU.
"""

from __future__ import annotations

from ndr_import_spark.operators import dedup
from ndr_import_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)


def _docs(spark, tag):
    rows = [
        (1, f"{tag} the quick brown fox jumps over the lazy dog again"),
        (2, f"{tag} the quick brown fox jumps over the lazy dog again!"),
        (3, f"{tag} completely different text about spark shuffles"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCacheScope:
    def test_interleaved_pipelines_both_stay_cached(self, spark):
        # build A, build B (interleave), THEN act on A then B: both must
        # hit their own caches — under the old one-slot global, building
        # B unpersisted A's hashed frame before A ever ran.
        a = minhash_lsh_pairs(_docs(spark, "aa"), verify_threshold=0.5)
        b = ngram_jaccard_pairs(_docs(spark, "bb"), threshold=0.3)
        scope_a = a._ndr_cache_scope
        scope_b = b._ndr_cache_scope
        assert scope_a is not scope_b
        # both hashed frames still carry a persistent storage level
        assert all(df.storageLevel.useMemory for df in scope_a._dfs)
        assert all(df.storageLevel.useMemory for df in scope_b._dfs)
        assert a.count() >= 1 and b.count() >= 1
        # after actions the frames are genuinely materialised in the cache
        assert all(df.storageLevel.useMemory for df in scope_a._dfs)

    def test_explicit_release_unpersists(self, spark):
        a = minhash_lsh_pairs(_docs(spark, "cc"), verify_threshold=0.5)
        scope = a._ndr_cache_scope
        cached = list(scope._dfs)
        assert cached and all(df.storageLevel.useMemory for df in cached)
        scope.release()
        assert not any(df.storageLevel.useMemory for df in cached)
        assert id(scope) not in (dedup._LIVE_SCOPES or {})
        # releasing twice is a no-op, and the pipeline still computes
        scope.release()
        assert a.count() >= 1

    def test_lru_bound_evicts_oldest_only(self, spark):
        pipes = [
            minhash_lsh_pairs(_docs(spark, f"p{i}"), verify_threshold=0.5)
            for i in range(dedup._MAX_LIVE_SCOPES + 1)
        ]
        scopes = [p._ndr_cache_scope for p in pipes]
        # oldest scope evicted by capacity, all newer ones alive
        assert scopes[0]._released
        assert not any(s._released for s in scopes[1:])
        assert len(dedup._LIVE_SCOPES) == dedup._MAX_LIVE_SCOPES
        # the evicted pipeline still returns correct rows (recompute path)
        assert pipes[0].count() >= 1
