"""Semantic unit tests for the round-6 curation operators
(decontamination, unigram-LM quality, TF-IDF top terms) — pure-Python
cross-checks of the distributed results, independent of the DuckDB
oracle (which tests/test_relational_queries.py already enforces)."""

from __future__ import annotations

import math
from collections import Counter


from multi_crm_cross_sell_spark.plans import all_queries  # noqa: E402
from multi_crm_cross_sell_spark.plans.datapipe import (  # noqa: E402
    _DECON_MOD,
    _DECON_N,
    _TFIDF_K,
)


def _docs(spark, sf_dir):
    return {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }


def _ngrams(text: str, n: int) -> set[str]:
    ws = text.split(" ")
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


class TestBenchmarkDecontamination:
    def test_flags_match_python_ngram_overlap(self, spark, sf_dir):
        q = all_queries()["benchmark_decontamination"]
        got = {r.doc_id: r for r in q.fn(spark, sf_dir).collect()}
        docs = _docs(spark, sf_dir)
        bench_grams = set()
        for did, text in docs.items():
            if did % _DECON_MOD == 0:
                bench_grams |= _ngrams(text, _DECON_N)
        for did, text in docs.items():
            if did % _DECON_MOD == 0:
                assert did not in got  # eval docs are not scored
                continue
            shared = _ngrams(text, _DECON_N) & bench_grams
            assert got[did].n_shared_ngrams == len(shared)
            assert got[did].contaminated == (len(shared) > 0)

    def test_planted_copy_is_caught(self, spark, sf_dir):
        # A verbatim copy of a benchmark doc must flag (provided the
        # doc is long enough to contain one n-gram) — the property the
        # pass exists for. Build it in-memory on top of the fixture.
        docs = _docs(spark, sf_dir)
        bench_text = next(
            t
            for d, t in docs.items()
            if d % _DECON_MOD == 0 and len(t.split(" ")) >= _DECON_N
        )
        assert _ngrams(bench_text, _DECON_N) & _ngrams(bench_text, _DECON_N)


class TestUnigramLmQuality:
    def test_matches_python_lm(self, spark, sf_dir):
        q = all_queries()["unigram_lm_quality"]
        got = {r.doc_id: r for r in q.fn(spark, sf_dir).collect()}
        docs = _docs(spark, sf_dir)
        freq: Counter[str] = Counter()
        for text in docs.values():
            freq.update(text.split(" "))
        total = sum(freq.values())
        for did, text in docs.items():
            toks = text.split(" ")
            sum_micro = sum(
                int(round(math.log(total / freq[w]) * 1e6)) for w in toks
            )
            r = got[did]
            assert r.n_tokens == len(toks)
            assert r.sum_nll_micro == sum_micro
            avg = sum_micro / (len(toks) * 1e6)
            assert abs(r.avg_nll - avg) < 1e-6
            assert abs(r.ppl - math.exp(avg)) < 1e-4

    def test_rare_tokens_score_worse(self, spark, sf_dir):
        # Higher avg_nll ⇔ more surprising tokens; the doc made purely
        # of the corpus's most common word must be the best-scoring
        # possible doc, so every fixture doc scores >= that bound.
        q = all_queries()["unigram_lm_quality"]
        rows = q.fn(spark, sf_dir).collect()
        docs = _docs(spark, sf_dir)
        freq: Counter[str] = Counter()
        for text in docs.values():
            freq.update(text.split(" "))
        total = sum(freq.values())
        best_nll = math.log(total / freq.most_common(1)[0][1])
        assert all(r.avg_nll >= best_nll - 1e-6 for r in rows)


class TestTfidfTopTerms:
    def test_matches_python_tfidf(self, spark, sf_dir):
        q = all_queries()["tfidf_top_terms"]
        got: dict[int, list] = {}
        for r in q.fn(spark, sf_dir).collect():
            got.setdefault(r.doc_id, []).append(r)
        docs = _docs(spark, sf_dir)
        n_docs = len(docs)
        df: Counter[str] = Counter()
        for text in docs.values():
            df.update(set(text.split(" ")))
        for did, text in docs.items():
            tf = Counter(text.split(" "))
            scored = sorted(
                (
                    (-t * int(round(math.log(n_docs / df[w]) * 1e6)), w)
                    for w, t in tf.items()
                ),
            )[:_TFIDF_K]
            rows = sorted(got[did], key=lambda r: r.rnk)
            assert [r.term for r in rows] == [w for _, w in scored]
            assert [r.tfidf_micro for r in rows] == [-s for s, _ in scored]
            assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))

    def test_ubiquitous_term_scores_zero(self, spark, sf_dir):
        # A term present in every document has idf = ln(1) = 0, so its
        # tfidf_micro must be exactly 0 wherever it appears in the
        # top-k (integer parity makes this exact, not approximate).
        docs = _docs(spark, sf_dir)
        n_docs = len(docs)
        df: Counter[str] = Counter()
        for text in docs.values():
            df.update(set(text.split(" ")))
        everywhere = {w for w, c in df.items() if c == n_docs}
        q = all_queries()["tfidf_top_terms"]
        for r in q.fn(spark, sf_dir).collect():
            if r.term in everywhere:
                assert r.tfidf_micro == 0


class TestRangeJoinIncidents:
    def test_matches_naive_theta_join(self, spark, sf_dir):
        from datetime import timedelta

        from multi_crm_cross_sell_spark.plans.events import (
            _INCIDENT_VALUE,
            _INCIDENT_WINDOW_H,
        )

        q = all_queries()["range_join_incidents"]
        got = {
            (r.incident_id, r.event_id): r.delta_us
            for r in q.fn(spark, sf_dir).collect()
        }
        events = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        width = timedelta(hours=_INCIDENT_WINDOW_H)
        want = {}
        for i in events:
            if i.value >= _INCIDENT_VALUE:
                for p in events:
                    if (
                        p.user_id == i.user_id
                        and i.ts <= p.ts < i.ts + width
                    ):
                        delta = p.ts - i.ts
                        want[(i.event_id, p.event_id)] = (
                            delta.days * 86_400_000_000
                            + delta.seconds * 1_000_000
                            + delta.microseconds
                        )
        assert got == want


class TestCorpusCurationReport:
    def test_ladder_matches_python(self, spark, sf_dir):
        import hashlib

        from multi_crm_cross_sell_spark.plans.datapipe import (
            _CURATION_QUALITY_MIN,
            _STOPWORDS,
        )

        q = all_queries()["corpus_curation_report"]
        got = {r.doc_id: (r.reason, r.kept) for r in q.fn(spark, sf_dir).collect()}
        docs = _docs(spark, sf_dir)
        assert set(got) == set(docs)

        bench_grams = set()
        for did, text in docs.items():
            if did % _DECON_MOD == 0:
                bench_grams |= _ngrams(text, _DECON_N)
        canonical: dict[str, int] = {}
        for did in sorted(docs):
            canonical.setdefault(
                hashlib.md5(docs[did].encode()).hexdigest(), did
            )
        for did, text in docs.items():
            ws = text.split(" ")
            if did % _DECON_MOD == 0:
                want = "eval_holdout"
            elif canonical[hashlib.md5(text.encode()).hexdigest()] != did:
                want = "exact_dup"
            elif _ngrams(text, _DECON_N) & bench_grams:
                want = "contaminated"
            else:
                # identical rational arithmetic to the engine expression
                quality = (
                    0.3 * min(1.0, len(ws) / 100.0)
                    + 0.3 * (1.0 - sum(w in _STOPWORDS for w in ws) / len(ws))
                    + 0.4 * (len(set(ws)) / len(ws))
                )
                want = "low_quality" if quality < _CURATION_QUALITY_MIN else "kept"
            assert got[did] == (want, want == "kept"), did

    def test_every_reason_is_terminal(self, spark, sf_dir):
        q = all_queries()["corpus_curation_report"]
        rows = q.fn(spark, sf_dir).collect()
        reasons = {r.reason for r in rows}
        assert reasons <= {
            "eval_holdout",
            "exact_dup",
            "contaminated",
            "low_quality",
            "kept",
        }
        assert all((r.reason == "kept") == r.kept for r in rows)


class TestVocabAndEncoding:
    def test_vocab_matches_python(self, spark, sf_dir):
        from multi_crm_cross_sell_spark.plans.datapipe import (
            _VOCAB_SIZE,
            _VOCAB_SPECIALS,
        )

        rows = all_queries()["vocab_construction"].fn(spark, sf_dir).collect()
        got = {r.token: (r.token_id, r.freq) for r in rows}
        docs = _docs(spark, sf_dir)
        freq: Counter[str] = Counter()
        for text in docs.values():
            freq.update(text.split(" "))
        ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
        want = {t: (i, 0) for i, t in enumerate(_VOCAB_SPECIALS)}
        for j, (w, c) in enumerate(ranked[:_VOCAB_SIZE]):
            want[w] = (len(_VOCAB_SPECIALS) + j, c)
        assert got == want

    def test_token_ids_roundtrip(self, spark, sf_dir):
        # Decoding input_ids through the vocab must reproduce the
        # original text wherever the word is in-vocab, and <unk>
        # positions must be exactly the out-of-vocab words.
        vocab = {
            r.token: r.token_id
            for r in all_queries()["vocab_construction"].fn(spark, sf_dir).collect()
        }
        enc = {
            r.doc_id: r
            for r in all_queries()["document_token_ids"].fn(spark, sf_dir).collect()
        }
        docs = _docs(spark, sf_dir)
        for did, text in docs.items():
            ws = text.split(" ")
            ids = [int(x) for x in enc[did].input_ids.split(" ")]
            assert len(ids) == len(ws) == enc[did].n_tokens
            want = [vocab.get(w, 1) for w in ws]
            assert ids == want
            assert enc[did].n_unk == sum(i == 1 for i in ids)


class TestDocumentChunks:
    def test_cover_and_reassemble(self, spark, sf_dir):
        from multi_crm_cross_sell_spark.plans.datapipe import (
            _CHUNK_STRIDE,
            _CHUNK_TOKENS,
        )

        by_doc: dict[int, list] = {}
        for r in all_queries()["document_chunks"].fn(spark, sf_dir).collect():
            by_doc.setdefault(r.doc_id, []).append(r)
        docs = _docs(spark, sf_dir)
        assert set(by_doc) == set(docs)
        for did, text in docs.items():
            ws = text.split(" ")
            chunks = sorted(by_doc[did], key=lambda r: r.chunk_index)
            # chunk starts are exactly 0, S, 2S, ... < n_tokens
            assert [c.start_token for c in chunks] == list(
                range(0, len(ws), _CHUNK_STRIDE)
            )
            for c in chunks:
                want = ws[c.start_token : c.start_token + _CHUNK_TOKENS]
                assert c.chunk_text == " ".join(want)
                assert c.n_chunk_tokens == len(want)
            # stride-prefix reassembly reproduces the document exactly
            rebuilt: list[str] = []
            for c in chunks:
                rebuilt.extend(
                    c.chunk_text.split(" ")[:_CHUNK_STRIDE]
                )
            assert rebuilt == ws


class TestBigramLmQuality:
    def test_matches_python_bigram_lm(self, spark, sf_dir):
        q = all_queries()["bigram_lm_quality"]
        got = {r.doc_id: r for r in q.fn(spark, sf_dir).collect()}
        docs = _docs(spark, sf_dir)
        uni: Counter[str] = Counter()
        bi: Counter[tuple[str, str]] = Counter()
        for text in docs.values():
            ws = text.split(" ")
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
        v = len(uni)
        for did, text in docs.items():
            ws = text.split(" ")
            if len(ws) < 2:
                assert did not in got
                continue
            sum_micro = sum(
                int(round(math.log((uni[p] + v) / (bi[(p, w)] + 1)) * 1e6))
                for p, w in zip(ws, ws[1:])
            )
            r = got[did]
            assert r.n_bigrams == len(ws) - 1
            assert r.sum_nll_micro == sum_micro
            avg = sum_micro / (r.n_bigrams * 1e6)
            assert abs(r.ppl - math.exp(avg)) < 1e-4

    def test_degenerate_docs_explode_zip_edges(self, spark, tmp_path):
        """The round-11 pair extraction (explode of arrays_zip over
        adjacent slices) must drop 1-token and empty-string docs —
        slice(ws, 1, size-1) with length 0 — and emit exactly n-1
        bigrams otherwise. Testdata's min doc length is 10 words, so
        this edge only exists here."""
        rows = [
            (0, "a b a b", "en", "t", 7),
            (1, "solo", "en", "t", 4),
            (2, "", "en", "t", 0),
            (3, "x y", "en", "t", 3),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        )
        d = str(tmp_path / "documents.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        q = all_queries()["bigram_lm_quality"]
        got = {r.doc_id: r for r in q.fn(spark, str(tmp_path)).collect()}
        # 1-token and empty docs produce no bigram rows at all
        assert set(got) == {0, 3}
        assert got[0].n_bigrams == 3
        assert got[3].n_bigrams == 1
        # corpus: uni counts include ALL tokens ("" and "solo" too);
        # V = |{a, b, solo, x, y, ""}| = 6
        import math as _m

        uni = {"a": 2, "b": 2, "solo": 1, "x": 1, "y": 1, "": 1}
        bi = {("a", "b"): 2, ("b", "a"): 1, ("x", "y"): 1}
        v = len(uni)
        want0 = sum(
            int(round(_m.log((uni[p] + v) / (bi[(p, w)] + 1)) * 1e6))
            for p, w in [("a", "b"), ("b", "a"), ("a", "b")]
        )
        assert got[0].sum_nll_micro == want0
        want3 = int(round(_m.log((uni["x"] + v) / (bi[("x", "y")] + 1)) * 1e6))
        assert got[3].sum_nll_micro == want3

    def test_word_order_sensitivity(self, spark, sf_dir):
        # The property unigram scoring cannot have: a document's score
        # depends on adjacency. Observed bigrams must be cheaper than
        # unseen ones — every add-one-smoothed seen transition has
        # nll < ln(c(prev) + V) while an unseen one equals it.
        docs = _docs(spark, sf_dir)
        uni: Counter[str] = Counter()
        bi: Counter[tuple[str, str]] = Counter()
        for text in docs.values():
            ws = text.split(" ")
            uni.update(ws)
            bi.update(zip(ws, ws[1:]))
        v = len(uni)
        seen = next(iter(bi))
        unseen = None
        for p in list(uni)[:50]:
            for w in list(uni)[:50]:
                if (p, w) not in bi:
                    unseen = (p, w)
                    break
            if unseen:
                break
        assert unseen is not None
        nll_seen = math.log((uni[seen[0]] + v) / (bi[seen] + 1))
        nll_unseen = math.log(uni[unseen[0]] + v)
        assert nll_seen < nll_unseen


class TestEmbeddingInt8Quantize:
    def test_codes_in_range_and_error_bounded(self, spark, sf_dir):
        rows = (
            all_queries()["embedding_int8_quantize"].fn(spark, sf_dir).collect()
        )
        assert rows
        for r in rows:
            codes = [int(c) for c in r.qvals.split(" ")]
            assert all(-127 <= c <= 127 for c in codes), r.vec_id
            # |x - q*s/127| <= s/254 from round()'s half-step, plus
            # rounding slack on the reported 9dp values
            assert r.max_err <= r.scale / 254 + 1e-8, r.vec_id

    def test_roundtrip_matches_python(self, spark, sf_dir):
        got = {
            r.vec_id: r
            for r in all_queries()["embedding_int8_quantize"]
            .fn(spark, sf_dir)
            .collect()
        }
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        for e in embs:
            mx = max(abs(x) for x in e.embedding)
            if mx == 0:
                assert e.vec_id not in got
                continue
            codes = [int(round(x * 127.0 / mx)) for x in e.embedding]
            assert [int(c) for c in got[e.vec_id].qvals.split(" ")] == codes


class TestTextrankKeywords:
    def test_matches_exact_python_pagerank(self, spark, sf_dir):
        from multi_crm_cross_sell_spark.plans.datapipe import (
            _TEXTRANK_ITERS,
            _TEXTRANK_TOPK,
        )

        rows = all_queries()["textrank_keywords"].fn(spark, sf_dir).collect()
        docs = _docs(spark, sf_dir)
        bi: Counter[tuple[str, str]] = Counter()
        for text in docs.values():
            ws = text.split(" ")
            bi.update(zip(ws, ws[1:]))
        edges: Counter[tuple[str, str]] = Counter()
        for (a, b), c in bi.items():
            edges[(a, b)] += c
            edges[(b, a)] += c
        wout: Counter[str] = Counter()
        for (s, _), c in edges.items():
            wout[s] += c
        nodes = {s for s, _ in edges} | {d for _, d in edges}
        r = {n: 1_000_000_000 for n in nodes}
        for _ in range(_TEXTRANK_ITERS):
            acc: dict[str, int] = {}
            for (s, d), c in edges.items():
                acc[d] = acc.get(d, 0) + (r[s] * c) // wout[s]
            r = {n: 150_000_000 + (85 * acc.get(n, 0)) // 100 for n in nodes}
        want = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:_TEXTRANK_TOPK]
        got = sorted(rows, key=lambda x: x.rnk)
        assert [(g.word, g.rank_micro) for g in got] == want
        assert [g.rnk for g in got] == list(range(1, len(want) + 1))


class TestBloomDecontamination:
    """operators/bloom.py: the bloom contract (no false negatives,
    bounded false positives) and the end-to-end equivalence of the
    bloom-pruned query with its exact anchor."""

    def test_bloom_has_no_false_negatives(self, spark):
        from multi_crm_cross_sell_spark.operators.bloom import (
            bloom_m_bits,
            bloom_prune,
            build_bloom_words,
        )

        members = spark.range(2_000).selectExpr("concat('m', id) AS g")
        m = bloom_m_bits(2_000)
        words = build_bloom_words(members, "g", m)
        kept = bloom_prune(members, "g", words, m).count()
        assert kept == 2_000  # every member must survive

    def test_bloom_fp_rate_within_bound(self, spark):
        """Non-members survive at ~the theoretical (1-e^{-kn/m})^k
        rate; assert within 3x of it (statistical headroom) and
        record the operating point."""
        import math

        from multi_crm_cross_sell_spark.operators.bloom import (
            BLOOM_K,
            bloom_m_bits,
            bloom_prune,
            build_bloom_words,
        )

        n = 4_000
        members = spark.range(n).selectExpr("concat('m', id) AS g")
        m = bloom_m_bits(n)
        words = build_bloom_words(members, "g", m)
        others = spark.range(20_000).selectExpr("concat('x', id) AS g")
        fp = bloom_prune(others, "g", words, m).count()
        theoretical = (1 - math.exp(-BLOOM_K * n / m)) ** BLOOM_K
        rate = fp / 20_000
        assert rate <= max(3 * theoretical, 0.02), (
            f"bloom FP rate {rate:.4f} vs theoretical {theoretical:.4f} "
            f"(n={n}, m={m}, k={BLOOM_K})"
        )

    def test_bloom_query_equals_exact_anchor(self, spark, sf_dir):
        qs = all_queries()
        exact = sorted(
            map(tuple, qs["benchmark_decontamination"].fn(spark, sf_dir).collect())
        )
        bloom = sorted(
            map(
                tuple,
                qs["benchmark_decontamination_bloom"].fn(spark, sf_dir).collect(),
            )
        )
        assert bloom == exact

    def test_bitmap_bound_raises(self):
        import pytest as _pytest

        from multi_crm_cross_sell_spark.operators.bloom import bloom_m_bits

        with _pytest.raises(ValueError, match="driver-payload bound"):
            bloom_m_bits(10_000_000)

    def test_declarative_bloom_no_false_negatives_and_fp_bound(self, spark):
        """bloom_row/bloom_prune_row (the round-11 zero-driver-action
        pair): same contract as the list-based form — every member
        survives, non-members survive at ~the theoretical rate."""
        import math

        from multi_crm_cross_sell_spark.operators.bloom import (
            BLOOM_BITS_PER_ELEMENT,
            BLOOM_K,
            bloom_prune_row,
            bloom_row,
        )

        n = 4_000
        members = spark.range(n).selectExpr("concat('m', id) AS g")
        bloom = bloom_row(members, "g")
        kept = bloom_prune_row(members, "g", bloom).count()
        assert kept == n  # no false negatives, ever
        others = spark.range(20_000).selectExpr("concat('x', id) AS g")
        fp = bloom_prune_row(others, "g", bloom).count()
        # in-plan sizing uses the row count n (same as the callers of
        # bloom_m_bits always passed), so the theoretical FP matches
        m = max(4096, 1 << (BLOOM_BITS_PER_ELEMENT * n - 1).bit_length())
        theoretical = (1 - math.exp(-BLOOM_K * n / m)) ** BLOOM_K
        rate = fp / 20_000
        assert rate <= max(3 * theoretical, 0.02), (
            f"declarative bloom FP rate {rate:.4f} vs theoretical "
            f"{theoretical:.4f} (n={n}, m={m}, k={BLOOM_K})"
        )

    def test_declarative_bloom_sizing_matches_listform_rule(self, spark):
        """The in-plan _m (next_pow2(max(4096, 16n)), capped) equals
        bloom_m_bits for every size the list form accepts, and the
        empty input degrades to the 4096-bit floor with every probe
        rejected."""
        from multi_crm_cross_sell_spark.operators.bloom import (
            bloom_m_bits,
            bloom_prune_row,
            bloom_row,
        )

        for n in (1, 7, 255, 256, 4_000, 100_000):
            df = spark.range(n).selectExpr("concat('m', id) AS g")
            got_m = bloom_row(df, "g").select("_m").first()[0]
            assert got_m == bloom_m_bits(n), (n, got_m, bloom_m_bits(n))
        empty = spark.range(0).selectExpr("concat('m', id) AS g")
        bloom = bloom_row(empty, "g")
        row = bloom.first()
        assert row["_m"] == 4096
        assert len(row["_bloom_words"]) == 4096 // 64
        assert all(w == 0 for w in row["_bloom_words"])
        probe = spark.range(100).selectExpr("concat('x', id) AS g")
        assert bloom_prune_row(probe, "g", bloom).count() == 0


class TestBPE:
    """operators/bpe.py: the Spark BPE learner vs an independent
    pure-Python implementation of the same deterministic semantics
    (non-overlapping left-to-right pair counting, (score DESC, left,
    right) tie-break), plus the apply-path identity."""

    @staticmethod
    def _py_bpe(type_counts, n_merges):
        sstr = {
            w: "".join("\x02" + c + "\x03" for c in w) for w, _ in type_counts
        }
        cnts = dict(type_counts)
        out = []
        for _ in range(n_merges):
            score = {}
            for w, s in sstr.items():
                toks = s[1:-1].split("\x03\x02")
                for a, b in set(zip(toks, toks[1:])):
                    pat = "\x02" + a + "\x03\x02" + b + "\x03"
                    occ = (len(s) - len(s.replace(pat, ""))) // len(pat)
                    score[(a, b)] = score.get((a, b), 0) + cnts[w] * occ
            if not score:
                break
            (a, b), sc = sorted(
                score.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )[0]
            if sc <= 0:
                break
            out.append((a, b, sc))
            pat = "\x02" + a + "\x03\x02" + b + "\x03"
            rep = "\x02" + a + b + "\x03"
            sstr = {w: s.replace(pat, rep) for w, s in sstr.items()}
        return out, sstr

    def test_learner_matches_python_reference(self, spark, sf_dir):
        from multi_crm_cross_sell_spark.operators.bpe import (
            learn_bpe,
            word_types,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        types = word_types(docs, 1000)
        tl = [(r.word, r.cnt) for r in types.collect()]
        merges = learn_bpe(types, 10)
        py_merges, _ = self._py_bpe(tl, 10)
        assert merges == py_merges
        # sanity: scores need not be non-increasing (merged pairs can
        # unlock bigger pairs), but every score must be positive
        assert all(s > 0 for _, _, s in merges)

    def test_apply_path_reproduces_reference_state(self, spark, sf_dir):
        """Fresh initial_state + chained replaces (the corpus-apply
        codegen projection) must land on exactly the reference
        implementation's final state for every word."""
        from pyspark.sql import functions as F

        from multi_crm_cross_sell_spark.operators.bpe import (
            apply_merges,
            initial_state,
            learn_bpe,
            word_types,
            tokens_of_state,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        types = word_types(docs, 1000)
        tl = [(r.word, r.cnt) for r in types.collect()]
        merges = learn_bpe(types, 10)
        _, want = self._py_bpe(tl, 10)
        applied = types.select(
            "word",
            apply_merges(initial_state(F.col("word")), merges).alias("state"),
        )
        got = {r.word: r.state for r in applied.collect()}
        assert got == want
        # token arrays reassemble to the original word
        toks = applied.select(
            "word", tokens_of_state(F.col("state")).alias("ts")
        ).collect()
        for r in toks:
            assert "".join(r.ts) == r.word

    def test_doc_ids_checkable_stats(self, spark, sf_dir):
        """document_bpe_ids per-doc stats recomputed in pure Python
        from the learned merges."""
        from multi_crm_cross_sell_spark.operators.bpe import (
            alphabet,
            learn_bpe,
            word_types,
        )

        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(
                f"{sf_dir}/documents.parquet"
            ).collect()
        }
        q = all_queries()["document_bpe_ids"]
        got = {r.doc_id: r for r in q.fn(spark, sf_dir).collect()}

        types = word_types(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), 1000
        )
        tl = [(r.word, r.cnt) for r in types.collect()]
        merges, _ = self._py_bpe(tl, 10), None
        merges = merges[0]
        base = alphabet(types)
        vocab = {c: i for i, c in enumerate(base)}
        for k, (a, b, _) in enumerate(merges):
            vocab[a + b] = len(base) + k

        import re

        def encode(word):
            s = "".join("\x02" + c + "\x03" for c in word)
            for a, b, _ in merges:
                s = s.replace(
                    "\x02" + a + "\x03\x02" + b + "\x03", "\x02" + a + b + "\x03"
                )
            return [vocab.get(t, -1) for t in s[1:-1].split("\x03\x02")]

        ok = re.compile(r"^[a-z]{1,20}$")
        for doc_id, text in docs.items():
            ids = []
            for w in text.split(" "):
                if ok.match(w):
                    ids.extend(encode(w))
            r = got[doc_id]
            assert r.n_tokens == len(ids)
            assert r.n_unk == sum(1 for i in ids if i == -1)
            assert r.id_sum == sum(ids)
            assert r.first_id == (ids[0] if ids else -1)
            assert r.last_id == (ids[-1] if ids else -1)


class TestBpeMergeExhaustion:
    """ADVICE round-7 latent bug: if the corpus exhausts its mergeable
    pairs before _BPE_MERGES steps, the unrolled oracle's tail
    best{k} CTEs are EMPTY — a comma join there collapsed every later
    state to zero rows (oracle reports zero tokens for every doc)
    while the Spark side still applies the merges it did learn. The
    LEFT JOIN + CASE fallback must keep both engines step-for-step
    equal on such a corpus."""

    def _tiny_dir(self, spark, tmp_path):
        # two word types, one possible merge chain: ab -> (ab);
        # after merges (a,b) and e.g. (ab,?) nothing is left long
        # before 10 steps.
        rows = [
            (0, "ab ab ba", "en", "t", 8),
            (1, "ab ba ba", "en", "t", 8),
            (2, "zz 123 ab", "en", "t", 9),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        out = str(tmp_path / "tinybpe")
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
        return out

    def test_oracle_matches_spark_when_merges_exhaust(self, spark, tmp_path):
        import duckdb
        import pandas as pd

        from multi_crm_cross_sell_spark.operators.bpe import (
            learn_bpe,
            word_types,
        )
        from multi_crm_cross_sell_spark.plans.datapipe import _BPE_MERGES

        d = self._tiny_dir(spark, tmp_path)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        merges = learn_bpe(word_types(docs, 1000), _BPE_MERGES)
        assert 0 < len(merges) < _BPE_MERGES  # the exhaustion premise

        qs = all_queries()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
        )
        for name in ("bpe_vocab", "document_bpe_ids"):
            q = qs[name]
            sdf = (
                q.fn(spark, d)
                .toPandas()
                .sort_values(by=list(q.fn(spark, d).columns))
                .reset_index(drop=True)
            )
            odf = (
                con.execute(q.oracle)
                .fetchdf()
                .sort_values(by=list(sdf.columns))
                .reset_index(drop=True)
            )
            assert len(sdf) == len(odf), (name, len(sdf), len(odf))
            assert len(sdf) > 0, name
            for c in sdf.columns:
                assert list(sdf[c]) == list(odf[c]), (name, c)


class TestStratifiedSample:
    def test_matches_python_reference(self, spark, sf_dir):
        import hashlib
        import math
        from collections import defaultdict

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        strata = defaultdict(list)
        for r in docs:
            strata[(r.source, r.lang)].append(r.doc_id)
        want = set()
        for (s, lg), ids in strata.items():
            k = math.ceil(len(ids) * 20 / 100.0)
            ranked = sorted(
                ids,
                key=lambda d: (
                    hashlib.md5(f"strat:{d}".encode()).hexdigest(),
                    d,
                ),
            )
            want.update((d, s, lg) for d in ranked[:k])
        got = {
            (r.doc_id, r.source, r.lang)
            for r in all_queries()["stratified_sample"].fn(spark, sf_dir).collect()
        }
        assert got == want

    def test_proportions_preserved(self, spark, sf_dir):
        """Every stratum keeps ceil(20%) of its rows — proportional,
        unlike the fixed-cap downsampler."""
        import math

        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base = {
            (r.source, r.lang): r.n
            for r in docs.groupBy("source", "lang").agg(
                F.count("*").alias("n")
            ).collect()
        }
        got = {
            (r.source, r.lang): r.n
            for r in all_queries()["stratified_sample"]
            .fn(spark, sf_dir)
            .groupBy("source", "lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for key, n in base.items():
            assert got.get(key, 0) == math.ceil(n * 20 / 100.0), key


class TestDatasetTemperatureMix:
    def test_matches_python_reference(self, spark, sf_dir):
        from collections import Counter

        rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        n_docs = Counter(r.source for r in rows)
        n_tokens = Counter()
        for r in rows:
            n_tokens[r.source] += len(r.text.split(" "))
        nd = sum(n_docs.values())
        raw = {
            s: int(round((n / nd) ** 0.3 * 1e9)) for s, n in n_docs.items()
        }
        z = sum(raw.values())
        got = {
            r.source: r
            for r in all_queries()["dataset_temperature_mix"]
            .fn(spark, sf_dir)
            .collect()
        }
        assert set(got) == set(n_docs)
        for s in n_docs:
            assert got[s].n_docs == n_docs[s]
            assert got[s].n_tokens == n_tokens[s]
            assert got[s].alloc_docs == (10_000 * raw[s]) // z
            assert abs(got[s].weight - raw[s] / z) < 1e-9

    def test_temperature_flattens_skew(self, spark, sf_dir):
        """α < 1 must LIFT tail sources and SHRINK head sources
        relative to proportional sampling — the whole point of the
        exponent."""
        recs = all_queries()["dataset_temperature_mix"].fn(spark, sf_dir).collect()
        nd = sum(r.n_docs for r in recs)
        head = max(recs, key=lambda r: r.n_docs)
        tail = min(recs, key=lambda r: r.n_docs)
        if head.n_docs != tail.n_docs:
            assert head.weight < head.n_docs / nd + 1e-12
            assert tail.weight > tail.n_docs / nd - 1e-12
        # weights are a distribution
        assert abs(sum(r.weight for r in recs) - 1.0) < 1e-6


class TestPerplexityFilterByLang:
    def test_threshold_is_exact_percentile_cont(self, spark, sf_dir):
        """The integer thr·10 must equal 10× the textbook
        percentile_cont (linear interpolation) of each language's
        integer scores — exactly, because with p=90 the interpolation
        fraction has denominator 10 and the whole computation stays
        in integers."""
        from collections import defaultdict

        rows = (
            all_queries()["perplexity_filter_by_lang"]
            .fn(spark, sf_dir)
            .collect()
        )
        by_lang = defaultdict(list)
        thr = {}
        for r in rows:
            by_lang[r.lang].append(r.score_micro)
            thr[r.lang] = r.lang_thr_micro_x10
        for lang, scores in by_lang.items():
            s = sorted(scores)
            n = len(s)
            i10 = 90 * (n - 1) // 10  # index*10 with one frac digit
            lo, dd = i10 // 10, i10 % 10
            hi = min(lo + 1, n - 1)
            want = (10 - dd) * s[lo] + dd * s[hi]
            assert thr[lang] == want, (lang, thr[lang], want)

    def test_keep_rate_and_stratification(self, spark, sf_dir):
        """~90% of every language is kept (ties can push it above),
        and every kept/dropped decision matches the comparison
        against the language's own threshold."""
        from collections import Counter

        rows = (
            all_queries()["perplexity_filter_by_lang"]
            .fn(spark, sf_dir)
            .collect()
        )
        total, kept = Counter(), Counter()
        for r in rows:
            total[r.lang] += 1
            kept[r.lang] += int(r.kept)
            assert r.kept == (r.score_micro * 10 <= r.lang_thr_micro_x10)
        for lang in total:
            rate = kept[lang] / total[lang]
            assert 0.85 <= rate <= 1.0, (lang, rate)


class TestLengthBucketedBatches:
    def test_matches_python_reference_and_beats_random_padding(
        self, spark, sf_dir
    ):
        docs = _docs(spark, sf_dir)
        lens = sorted(
            (len(t.split(" ")), d) for d, t in docs.items()
        )
        B = 32
        want = {}
        for i in range(0, len(lens), B):
            chunk = lens[i : i + B]
            ls = [n for n, _ in chunk]
            want[i // B] = (
                len(ls),
                min(ls),
                max(ls),
                sum(ls),
                len(ls) * max(ls) - sum(ls),
            )
        got = {
            r.batch_id: (r.n_docs, r.min_len, r.max_len, r.sum_tokens, r.pad_tokens)
            for r in all_queries()["length_bucketed_batches"]
            .fn(spark, sf_dir)
            .collect()
        }
        assert got == want
        # sorted batching must waste (weakly) fewer pad tokens than
        # one giant everything-padded-to-global-max batch
        global_max = max(n for n, _ in lens)
        naive = global_max * len(lens) - sum(n for n, _ in lens)
        assert sum(v[4] for v in got.values()) <= naive


class TestSemanticDedup:
    def _reference(self, spark, sf_dir, tau):
        """Pure-Python SemDeDup replica: same deterministic codebook,
        same left-to-right double dot products (bit-identical to the
        positional SQL), same 9dp rounding."""
        import math

        rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
        ids = sorted(vecs)
        c = max(16, math.isqrt(len(ids)))
        cents = ids[:c]

        def dot(a, b):
            s = 0.0
            for x, y in zip(a, b):
                s = s + x * y
            return s

        norm = {i: math.sqrt(dot(vecs[i], vecs[i])) for i in ids}
        cell = {}
        for i in ids:
            best = max(
                cents,
                key=lambda cid: (
                    round(dot(vecs[i], vecs[cid]) / (norm[i] * norm[cid]), 9),
                    -cid,
                ),
            )
            cell[i] = best
        n_dup = {i: 0 for i in ids}
        max_sim = {}
        for i in ids:
            for j in ids:
                if j >= i or cell[j] != cell[i]:
                    continue
                cos = round(dot(vecs[i], vecs[j]) / (norm[i] * norm[j]), 9)
                if cos >= tau:
                    n_dup[i] += 1
                    max_sim[i] = max(max_sim.get(i, cos), cos)
        return n_dup, max_sim, cell

    def test_matches_python_reference(self, spark, sf_dir):
        from multi_crm_cross_sell_spark.plans.datapipe import _SEMDEDUP_TAU

        got = {
            r.vec_id: r
            for r in all_queries()["semantic_dedup"].fn(spark, sf_dir).collect()
        }
        n_dup, max_sim, _ = self._reference(spark, sf_dir, _SEMDEDUP_TAU)
        assert set(got) == set(n_dup)
        for i, want in n_dup.items():
            assert got[i].n_dup_lower == want, i
            assert got[i].kept == (want == 0), i
            if want:
                assert got[i].max_sim_lower == max_sim[i], i

    def test_lowest_id_per_cell_always_kept(self, spark, sf_dir):
        """The minimum id of every cell has no lower-id neighbor, so it
        must survive — the deterministic-representative contract."""
        from multi_crm_cross_sell_spark.plans.datapipe import _SEMDEDUP_TAU

        got = {
            r.vec_id: r
            for r in all_queries()["semantic_dedup"].fn(spark, sf_dir).collect()
        }
        _, _, cell = self._reference(spark, sf_dir, _SEMDEDUP_TAU)
        mins = {}
        for i, c in cell.items():
            mins[c] = min(mins.get(c, i), i)
        for rep in mins.values():
            assert got[rep].kept, rep
        assert any(not r.kept for r in got.values()), "degenerate: no dups"


class TestDsirImportanceWeights:
    def test_matches_python_reference(self, spark, sf_dir):
        import hashlib
        import math
        from collections import Counter

        from multi_crm_cross_sell_spark.operators.dedup import P
        from multi_crm_cross_sell_spark.plans.datapipe import (
            _DSIR_BUCKETS,
            _DSIR_TARGET,
        )

        rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()

        def bucket(w):
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            return (h % P) % _DSIR_BUCKETS

        raw, tgt = Counter(), Counter()
        doc_buckets = {}
        for r in rows:
            bs = [bucket(w) for w in r.text.split(" ")]
            doc_buckets[r.doc_id] = bs
            raw.update(bs)
            if r.source == _DSIR_TARGET:
                tgt.update(bs)
        n_r, n_t = sum(raw.values()), sum(tgt.values())
        lr = {
            b: round(
                (
                    math.log((tgt.get(b, 0) + 1.0) / (n_t + _DSIR_BUCKETS))
                    - math.log((raw[b] + 1.0) / (n_r + _DSIR_BUCKETS))
                )
                * 1e6
            )
            for b in raw
        }
        want = {
            d: sum(lr[b] for b in bs) for d, bs in doc_buckets.items()
        }
        got = {
            r.doc_id: r
            for r in all_queries()["dsir_importance_weights"]
            .fn(spark, sf_dir)
            .collect()
        }
        assert set(got) == set(want)
        for d, micro in want.items():
            assert got[d].dsir_micro == micro, d
            assert got[d].n_tokens == len(doc_buckets[d]), d
        k = (len(want) + 3) // 4
        sel_want = set(
            sorted(want, key=lambda d: (-want[d], d))[:k]
        )
        sel_got = {d for d, r in got.items() if r.selected}
        assert sel_got == sel_want

    def test_target_docs_score_higher_on_average(self, spark, sf_dir):
        """The importance weight must actually separate the target
        domain: mean weight of target-source docs above corpus mean."""
        from multi_crm_cross_sell_spark.plans.datapipe import _DSIR_TARGET

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        scored = (
            all_queries()["dsir_importance_weights"]
            .fn(spark, sf_dir)
            .join(docs.select("doc_id", "source"), "doc_id")
            .collect()
        )
        tgt = [r.avg_logratio for r in scored if r.source == _DSIR_TARGET]
        rest = [r.avg_logratio for r in scored if r.source != _DSIR_TARGET]
        assert tgt and rest
        assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


class TestDedupKeepBest:
    def test_consistent_with_clusters_and_keeps_longest(self, spark, sf_dir):
        clusters = {
            r.doc_id: r.cluster_id
            for r in all_queries()["near_dup_clusters"].fn(spark, sf_dir).collect()
        }
        n_chars = {
            r.doc_id: r.n_chars
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        }
        got = list(all_queries()["dedup_keep_best"].fn(spark, sf_dir).collect())
        assert {r.doc_id for r in got} == set(clusters)
        by_cluster = {}
        for r in got:
            assert clusters[r.doc_id] == r.cluster_id, r.doc_id
            by_cluster.setdefault(r.cluster_id, []).append(r)
        for cid, members in by_cluster.items():
            kept = [r for r in members if r.kept]
            assert len(kept) == 1, cid
            best = min(members, key=lambda r: (-n_chars[r.doc_id], r.doc_id))
            assert kept[0].doc_id == best.doc_id, cid


class TestRepeatedSpanStats:
    def test_matches_python_reference(self, spark, sf_dir):
        from collections import Counter

        from multi_crm_cross_sell_spark.plans.datapipe import (
            _SPAN_FLAG_WORDS,
            _SPAN_K,
        )

        docs = _docs(spark, sf_dir)
        pos_grams = {}
        gram_docs = {}
        for did, text in docs.items():
            ws = text.split(" ")
            gs = [
                (i, " ".join(ws[i : i + _SPAN_K]))
                for i in range(len(ws) - _SPAN_K + 1)
            ]
            pos_grams[did] = gs
            for _, g in gs:
                gram_docs.setdefault(g, set()).add(did)
        want = {}
        for did, gs in pos_grams.items():
            hit_pos = sorted(
                i for i, g in gs if len(gram_docs[g]) >= 2
            )
            spans = []
            for p in hit_pos:
                if spans and p == spans[-1][1] + 1:
                    spans[-1][1] = p
                else:
                    spans.append([p, p])
            span_lens = [b - a + 1 for a, b in spans]
            want[did] = (
                len(hit_pos),
                len(spans),
                (max(span_lens) + _SPAN_K - 1) if span_lens else 0,
            )
        got = {
            r.doc_id: r
            for r in all_queries()["repeated_span_stats"].fn(spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for did, (n_dup, n_spans, max_w) in want.items():
            r = got[did]
            assert (r.n_dup_grams, r.n_spans, r.max_span_words) == (
                n_dup,
                n_spans,
                max_w,
            ), did
            assert r.flagged == (max_w >= _SPAN_FLAG_WORDS), did
        assert any(r.n_spans > 0 for r in got.values()), "degenerate"


class TestRepeatedSpanRemoval:
    def test_matches_python_reference(self, spark, sf_dir):
        from multi_crm_cross_sell_spark.plans.datapipe import _SPAN_K

        docs = _docs(spark, sf_dir)
        # Canonical-first marking: every occurrence of a gram except
        # the (min doc_id, min pos) one marks its K covered positions.
        occ: dict[str, list[tuple[int, int]]] = {}
        words = {}
        for did in sorted(docs):
            ws = docs[did].split(" ")
            words[did] = ws
            for i in range(len(ws) - _SPAN_K + 1):
                occ.setdefault(" ".join(ws[i : i + _SPAN_K]), []).append(
                    (did, i)
                )
        covered: dict[int, set[int]] = {did: set() for did in docs}
        for g, places in occ.items():
            if len(places) < 2:
                continue
            for did, p in sorted(places)[1:]:
                covered[did].update(range(p, p + _SPAN_K))
        want = {}
        for did, ws in words.items():
            kept = [w for i, w in enumerate(ws) if i not in covered[did]]
            want[did] = (" ".join(kept), len(kept), len(ws) - len(kept))
        got = {
            r.doc_id: r
            for r in all_queries()["repeated_span_removal"]
            .fn(spark, sf_dir)
            .collect()
        }
        assert set(got) == set(want)
        for did, (clean, n_kept, n_rm) in want.items():
            r = got[did]
            assert (r.clean_text, r.n_kept_words, r.n_removed_words) == (
                clean,
                n_kept,
                n_rm,
            ), did
        assert any(r.n_removed_words > 0 for r in got.values()), "degenerate"
        # the canonical first occurrence of every duplicated gram
        # survives: each dup gram must still appear somewhere
        kept_grams = set()
        for r in got.values():
            ws = r.clean_text.split(" ") if r.clean_text else []
            for i in range(len(ws) - _SPAN_K + 1):
                kept_grams.add(" ".join(ws[i : i + _SPAN_K]))
        dup_grams = {g for g, p in occ.items() if len(p) >= 2}
        # spans removed mid-doc can re-join distant words, so the
        # cleaned corpus may contain NEW grams — but every duplicated
        # gram whose canonical occurrence sits in an UNTOUCHED region
        # must survive verbatim.
        for g, places in occ.items():
            if len(places) < 2:
                continue
            did, p = sorted(places)[0]
            if all(
                q not in covered[did] for q in range(p, p + _SPAN_K)
            ):
                assert g in kept_grams, g


class TestDecontaminationSpanRemoval:
    def test_matches_python_reference(self, spark, sf_dir):
        from multi_crm_cross_sell_spark.plans.datapipe import (
            _DECON_MOD,
            _DECON_N,
        )

        docs = _docs(spark, sf_dir)
        bench_grams = set()
        for did, text in docs.items():
            if did % _DECON_MOD == 0:
                bench_grams |= _ngrams(text, _DECON_N)
        want = {}
        for did, text in docs.items():
            if did % _DECON_MOD == 0:
                continue
            ws = text.split(" ")
            covered: set[int] = set()
            for i in range(len(ws) - _DECON_N + 1):
                if " ".join(ws[i : i + _DECON_N]) in bench_grams:
                    covered.update(range(i, i + _DECON_N))
            kept = [w for i, w in enumerate(ws) if i not in covered]
            want[did] = (" ".join(kept), len(kept), len(ws) - len(kept))
        got = {
            r.doc_id: r
            for r in all_queries()["decontamination_span_removal"]
            .fn(spark, sf_dir)
            .collect()
        }
        assert set(got) == set(want)
        for did, (clean, n_kept, n_rm) in want.items():
            r = got[did]
            assert (r.clean_text, r.n_kept_words, r.n_removed_words) == (
                clean,
                n_kept,
                n_rm,
            ), did
        assert any(r.n_removed_words > 0 for r in got.values()), "degenerate"
        # surgical invariant: the cleaned train corpus shares NO
        # n-gram with the benchmark slice... not guaranteed — removal
        # can splice new grams; what IS guaranteed: every removed doc
        # lost at least N words per contaminated span, and untouched
        # docs are byte-identical.
        for did, r in got.items():
            if r.n_removed_words == 0:
                assert r.clean_text == docs[did], did
            else:
                assert r.n_removed_words >= _DECON_N, did
