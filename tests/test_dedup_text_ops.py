"""Unit tests for the dedup / text-analysis / summarization operators
added beyond the reference surface (BASELINE.json north star)."""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from multi_crm_cross_sell_spark.operators.dedup import P, shingles
from multi_crm_cross_sell_spark.operators.similarity_search import (
    embedding_near_dup_pairs,
)
from multi_crm_cross_sell_spark.operators.summarize import (
    extractive_summary,
    summarize,
)

_ROLL_R = 1_000_003


def _py_base_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P


class TestShingles:
    def test_trigram_values(self, spark):
        df = spark.createDataFrame([("a b c d",)], ["text"])
        [row] = df.select(shingles(F.col("text")).alias("sh")).collect()
        assert row.sh == ["a b c", "b c d"]

    def test_short_doc_yields_empty_not_error(self, spark):
        df = spark.createDataFrame([("a b",), ("a",), ("",)], ["text"])
        rows = df.select(shingles(F.col("text")).alias("sh")).collect()
        assert all(r.sh == [] for r in rows)

    def test_distinct(self, spark):
        df = spark.createDataFrame([("x y z x y z x y z",)], ["text"])
        [row] = df.select(shingles(F.col("text")).alias("sh")).collect()
        assert sorted(row.sh) == sorted(set(row.sh))


class TestRollingHash:
    def test_matches_python_reference(self, spark, sf_dir):
        from multi_crm_cross_sell_spark.plans import all_queries

        q = all_queries()["rolling_hash_fingerprints"]
        got = {r.doc_id: r.rolling_fp for r in q.fn(spark, sf_dir).collect()}
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5).collect()
        for d in docs:
            acc = 0
            for tok in d.text.split(" "):
                acc = (acc * _ROLL_R + _py_base_hash(tok)) % P
            assert got[d.doc_id] == acc


class TestEmbeddingNearDup:
    def test_self_pairs_excluded_and_ordered(self, spark, sf_dir):
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = embedding_near_dup_pairs(e, threshold=-1.0).limit(50).collect()
        assert all(r.id1 < r.id2 for r in out)

    def test_identical_vectors_cosine_one(self, spark):
        rows = [(1, [1.0] * 8), (2, [1.0] * 8), (3, [-1.0] * 8)]
        e = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = {
            (r.id1, r.id2): r.cosine
            for r in embedding_near_dup_pairs(e, threshold=0.99).collect()
        }
        assert out == {(1, 2): 1.0}


class TestDedupClusters:
    def test_transitive_chain_folds_into_one_cluster(self, spark):
        from multi_crm_cross_sell_spark.operators.dedup import dedup_clusters

        # 1-2-3 chain (1 and 3 never paired directly), 10-11 pair,
        # plus an isolated pair 20-21
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21)], ["doc1", "doc2"]
        )
        got = {
            r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_representative"])
            for r in dedup_clusters(pairs).collect()
        }
        assert got[1] == (1, 3, True)
        assert got[2] == (1, 3, False)
        assert got[3] == (1, 3, False)  # transitive member joins via 2
        assert got[10] == (10, 2, True) and got[11] == (10, 2, False)
        assert got[20] == (20, 2, True) and got[21] == (20, 2, False)

    def test_long_path_converges(self, spark):
        from multi_crm_cross_sell_spark.operators.dedup import dedup_clusters

        # path graph 0-1-2-...-9: worst-case diameter for propagation
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], ["doc1", "doc2"]
        )
        rows = dedup_clusters(pairs).collect()
        assert {r["cluster_id"] for r in rows} == {0}
        assert all(r["cluster_size"] == 10 for r in rows)

    def test_iteration_cap_detected_not_silent(self, spark):
        # A diameter-9 path cannot converge in 2 iterations; the loop
        # must say so (raise by default, warn when strict=False), never
        # return silently split clusters (ADVICE r3).
        import pytest

        from multi_crm_cross_sell_spark.operators.dedup import dedup_clusters

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], ["doc1", "doc2"]
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            dedup_clusters(pairs, max_iters=2)
        with pytest.warns(RuntimeWarning, match="did not converge"):
            rows = dedup_clusters(pairs, max_iters=2, strict=False).collect()
        assert len(rows) == 10  # non-strict still returns the partial fold


class TestSummarize:
    def test_extractive_rule(self):
        text = "short one. this sentence has the most tokens of all. tiny"
        summary, n = extractive_summary(text)
        assert summary == "this sentence has the most tokens of all"
        assert n == 3

    def test_tie_prefers_first_sentence(self):
        summary, n = extractive_summary("one two three. four five six")
        assert summary == "one two three"
        assert n == 2

    def test_mapinpandas_schema_and_values(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta. g"), (2, "x. y z w")], ["doc_id", "text"]
        )
        out = summarize(df).orderBy("doc_id").collect()
        assert [r.summary for r in out] == ["alpha beta", "y z w"]
        assert [r.n_sentences for r in out] == [2, 2]
        assert all(r.method == "extractive" for r in out)
        assert [f.name for f in summarize(df).schema.fields] == [
            "doc_id",
            "summary",
            "n_sentences",
            "method",
        ]


class TestIvf:
    def test_cells_partition_all_vectors(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from multi_crm_cross_sell_spark.operators.similarity_search import ivf_topk

        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = ivf_topk(e, F.col("vec_id") % 50 == 0, k=3).collect()
        assert len(out) > 0
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
        for q, rows in by_q.items():
            assert len(rows) <= 3
            ranks = sorted(r.rk for r in rows)
            assert ranks == list(range(1, len(rows) + 1))
            cos = [r.cosine for r in sorted(rows, key=lambda r: r.rk)]
            assert cos == sorted(cos, reverse=True)
            assert all(r.vec_id != q for r in rows)

    def test_nprobe_widens_search_monotonically(self, spark, sf_dir):
        """nprobe=2 candidates are a superset of nprobe=1's, so each
        query's top-k cosine at any rank can only improve — the IVF
        recall knob must be monotone."""
        from pyspark.sql import functions as F

        from multi_crm_cross_sell_spark.operators.similarity_search import ivf_topk

        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pred = F.col("vec_id") % 50 == 0
        one = {
            (r.query_id, r.rk): r.cosine
            for r in ivf_topk(e, pred, k=3, nprobe=1).collect()
        }
        two = {
            (r.query_id, r.rk): r.cosine
            for r in ivf_topk(e, pred, k=3, nprobe=2).collect()
        }
        assert set(one) <= set(two)  # never fewer results
        for key, cos1 in one.items():
            assert two[key] >= cos1


class TestAdaptivePlanes:
    def test_more_planes_give_pair_subset(self, spark, sf_dir):
        """Plane k is seed-determined, so a K+1-bit bucket refines the
        K-bit bucket: the pair set must shrink monotonically (the
        log2(n) scaling knob is precision-only, never a new pair)."""
        from multi_crm_cross_sell_spark.operators.similarity_search import (
            embedding_near_dup_pairs,
        )

        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        p8 = {
            (r.id1, r.id2)
            for r in embedding_near_dup_pairs(e, threshold=0.2, n_planes=8).collect()
        }
        p10 = {
            (r.id1, r.id2)
            for r in embedding_near_dup_pairs(e, threshold=0.2, n_planes=10).collect()
        }
        assert p10 <= p8

    def test_adaptive_count_grows_with_corpus(self):
        from multi_crm_cross_sell_spark.operators.similarity_search import (
            N_PLANES,
            adaptive_n_planes,
        )

        assert adaptive_n_planes(2_000) == N_PLANES  # sf0.1 keeps default
        assert adaptive_n_planes(20_000) == 12  # 10x corpus: +4 bits
        assert adaptive_n_planes(100) == N_PLANES  # floor at the default
        # monotone non-decreasing in n
        counts = [adaptive_n_planes(n) for n in (10, 10**3, 10**5, 10**7, 10**9)]
        assert counts == sorted(counts)
