"""Correctness gate for the prefix-doubling suffix-array operator.

Exact maximal repeats have no tractable SQL oracle, so the operator's
gate is reference equivalence: the distributed suffix ORDER must match
a brute-force Python sort of every suffix of the same concatenated
token stream (sentinels included — the reference models the identical
comparison semantics the operator documents)."""

from __future__ import annotations

import numpy as np
import pytest


def _reference_sranks(docs: dict[int, list[str]]) -> dict[tuple[int, int], int]:
    """Brute force: concatenate docs in doc_id order with the same
    per-doc sentinel, sort all suffixes of the global token list, and
    rank the REAL positions (sentinels dropped, ranks re-densified)."""
    glob: list[str] = []
    origin: list[tuple[int, int] | None] = []
    for d in sorted(docs):
        for p, w in enumerate(docs[d]):
            glob.append(w)
            origin.append((d, p))
        glob.append("\x00" + str(d))
        origin.append(None)
    order = sorted(range(len(glob)), key=lambda i: glob[i:])
    out: dict[tuple[int, int], int] = {}
    rank = 0
    for i in order:
        if origin[i] is not None:
            out[origin[i]] = rank
            rank += 1
    return out


@pytest.mark.parametrize("seed,n_docs,vocab", [(3, 12, 5), (11, 25, 3)])
def test_suffix_ranks_match_python_reference(spark, seed, n_docs, vocab):
    from multi_crm_cross_sell_spark.operators.suffix import suffix_ranks

    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = {
        d: [words[rng.randint(vocab)] for _ in range(rng.randint(3, 18))]
        for d in range(n_docs)
    }
    rows = [
        (d, p, w) for d, toks in docs.items() for p, w in enumerate(toks)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    got = {
        (r["doc_id"], r["pos"]): r["srank"]
        for r in suffix_ranks(df, n_parts=5).collect()
    }
    want = _reference_sranks(docs)
    assert got == want


def test_suffix_ranks_identical_docs_tiebreak(spark):
    """Byte-identical documents: every shared suffix ties until the
    per-doc sentinel, which must break toward the lower doc_id."""
    from multi_crm_cross_sell_spark.operators.suffix import suffix_ranks

    docs = {0: ["a", "b", "a"], 1: ["a", "b", "a"], 2: ["b", "a"]}
    rows = [(d, p, w) for d, t in docs.items() for p, w in enumerate(t)]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    got = {
        (r["doc_id"], r["pos"]): r["srank"]
        for r in suffix_ranks(df, n_parts=3).collect()
    }
    assert got == _reference_sranks(docs)


def test_global_dense_rank_is_dense_and_ordered(spark):
    from multi_crm_cross_sell_spark.operators.suffix import global_dense_rank

    df = spark.createDataFrame(
        [(x,) for x in [5, 3, 3, 9, 1, 5, 1]], "k bigint"
    )
    got = {
        r["k"]: r["rank"]
        for r in global_dense_rank(df, ["k"], n_parts=3).collect()
    }
    assert got == {1: 0, 3: 1, 5: 2, 9: 3}


def _reference_adjacent_lcp(docs):
    """Adjacent-suffix LCPs over the same concatenated stream."""
    glob, origin = [], []
    for d in sorted(docs):
        for p, w in enumerate(docs[d]):
            glob.append(w)
            origin.append((d, p))
        glob.append("\x00" + str(d))
        origin.append(None)
    order = sorted(range(len(glob)), key=lambda i: glob[i:])
    real = [i for i in order if origin[i] is not None]
    out = {}
    for k in range(len(real) - 1):
        a, b = real[k], real[k + 1]
        lcp = 0
        while (
            a + lcp < len(glob)
            and b + lcp < len(glob)
            and glob[a + lcp] == glob[b + lcp]
        ):
            lcp += 1
        out[origin[a]] = (origin[b], lcp)
    return out


@pytest.mark.parametrize("seed,n_docs,vocab", [(5, 10, 3), (23, 18, 4)])
def test_adjacent_lcp_matches_python_reference(spark, seed, n_docs, vocab):
    from multi_crm_cross_sell_spark.operators.suffix import adjacent_lcp

    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = {
        d: [words[rng.randint(vocab)] for _ in range(rng.randint(3, 15))]
        for d in range(n_docs)
    }
    rows = [(d, p, w) for d, t in docs.items() for p, w in enumerate(t)]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    got = {
        (r["doc_id"], r["pos"]): ((r["nxt_doc_id"], r["nxt_pos"]), r["lcp"])
        for r in adjacent_lcp(df, n_parts=4).collect()
    }
    want = _reference_adjacent_lcp(docs)
    assert got == want


def test_adjacent_lcp_repeated_block(spark):
    """A deliberately planted ≥4-token repeat across two docs must
    surface as an adjacent-pair lcp of exactly its length (bounded by
    the sentinel at the shorter doc's edge)."""
    from multi_crm_cross_sell_spark.operators.suffix import adjacent_lcp

    docs = {
        0: ["x", "q", "r", "s", "t", "y"],
        1: ["z", "q", "r", "s", "t"],
        2: ["a", "b"],
    }
    rows = [(d, p, w) for d, t in docs.items() for p, w in enumerate(t)]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    got = {
        (r["doc_id"], r["pos"]): r["lcp"]
        for r in adjacent_lcp(df, n_parts=3).collect()
    }
    ref = {k: v[1] for k, v in _reference_adjacent_lcp(docs).items()}
    assert got == ref
    # the planted repeat: suffix (0,1)="q r s t y ..." and (1,1)=
    # "q r s t <sent>" share exactly 4 tokens; they are SA-adjacent
    assert max(got.values()) == 4


def _reference_cross_doc_repeat(docs):
    """Brute force: for every position, the longest prefix of its
    suffix that occurs (token-for-token) starting anywhere in a
    DIFFERENT document."""
    out = {}
    for d, toks in docs.items():
        for p in range(len(toks)):
            best = 0
            for d2, t2 in docs.items():
                if d2 == d:
                    continue
                for q in range(len(t2)):
                    ln = 0
                    while (
                        p + ln < len(toks)
                        and q + ln < len(t2)
                        and toks[p + ln] == t2[q + ln]
                    ):
                        ln += 1
                    best = max(best, ln)
            out[(d, p)] = best
    return out


@pytest.mark.parametrize("seed,n_docs,vocab", [(7, 10, 3), (41, 16, 4)])
def test_cross_doc_repeat_matches_python_reference(spark, seed, n_docs, vocab):
    from multi_crm_cross_sell_spark.operators.suffix import cross_doc_repeat

    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = {
        d: [words[rng.randint(vocab)] for _ in range(rng.randint(3, 15))]
        for d in range(n_docs)
    }
    rows = [(d, p, w) for d, t in docs.items() for p, w in enumerate(t)]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    got = {
        (r["doc_id"], r["pos"]): r["rep"]
        for r in cross_doc_repeat(df, n_parts=4).collect()
    }
    assert got == _reference_cross_doc_repeat(docs)


def test_cross_doc_repeat_single_doc_is_zero(spark):
    """One document alone: internal repeats are NOT cross-doc, every
    rep must be 0."""
    from multi_crm_cross_sell_spark.operators.suffix import cross_doc_repeat

    toks = ["a", "b", "a", "b", "a", "b"]
    df = spark.createDataFrame(
        [(0, p, w) for p, w in enumerate(toks)],
        "doc_id bigint, pos bigint, w string",
    )
    got = {r["pos"]: r["rep"] for r in cross_doc_repeat(df, n_parts=3).collect()}
    assert got == {p: 0 for p in range(len(toks))}


def test_cross_doc_repeat_agrees_with_anchor_gram_marks(spark):
    """Cross-validation of two independent implementations: a
    position's k-gram is cross-doc shared (the anchor-gram family's
    mark, brute-forced here) iff the suffix-array rep >= k."""
    from multi_crm_cross_sell_spark.operators.suffix import cross_doc_repeat

    k = 3
    rng = np.random.RandomState(97)
    words = [f"w{i}" for i in range(4)]
    docs = {
        d: [words[rng.randint(4)] for _ in range(rng.randint(k, 20))]
        for d in range(14)
    }
    gram_docs = {}
    for d, toks in docs.items():
        for p in range(len(toks) - k + 1):
            gram_docs.setdefault(tuple(toks[p : p + k]), set()).add(d)
    marks = {
        (d, p)
        for d, toks in docs.items()
        for p in range(len(toks) - k + 1)
        if len(gram_docs[tuple(toks[p : p + k])] - {d}) > 0
    }
    rows = [(d, p, w) for d, t in docs.items() for p, w in enumerate(t)]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    got = {
        (r["doc_id"], r["pos"])
        for r in cross_doc_repeat(df, n_parts=4).collect()
        if r["rep"] >= k
    }
    assert got == marks


def test_exact_repeat_doc_stats_planted(spark):
    """Planted 6-token repeat across docs 0/1 with flag_words=4:
    exact longest, exact mark counts, exact covered-union footprint
    (two overlapping flagged starts in each doc fold into ONE
    island)."""
    from multi_crm_cross_sell_spark.operators.suffix import (
        cross_doc_repeat,
        exact_repeat_doc_stats,
    )

    docs = {
        0: ["p", "q", "r", "s", "t", "u", "x1", "x2"],
        1: ["z1", "p", "q", "r", "s", "t", "u"],
        2: ["a", "b", "c"],
    }
    rows = [(d, p, w) for d, t in docs.items() for p, w in enumerate(t)]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    rep = cross_doc_repeat(df, n_parts=3)
    got = {
        r["doc_id"]: (
            r["longest_repeat"],
            r["n_repeat_starts"],
            r["n_covered_words"],
            r["flagged"],
        )
        for r in exact_repeat_doc_stats(rep, mark_k=3, flag_words=4).collect()
    }
    ref_rep = _reference_cross_doc_repeat(docs)
    # independent fold of the brute-force rep frame
    want = {}
    for d, toks in docs.items():
        reps = [ref_rep[(d, p)] for p in range(len(toks))]
        longest = max(reps)
        n_marks = sum(1 for x in reps if x >= 3)
        covered = set()
        for p, x in enumerate(reps):
            if x >= 4:
                covered.update(range(p, p + x))
        want[d] = (longest, n_marks, len(covered), longest >= 4)
    assert got == want
    # and the planted numbers themselves, for readability:
    assert got[0][0] == 6 and got[1][0] == 6 and got[2] == (0, 0, 0, False)
    assert got[0][2] == 6 and got[1][2] == 6


@pytest.mark.parametrize("seed,n_docs,vocab", [(13, 12, 3), (59, 18, 4)])
def test_exact_repeat_stats_match_duckdb_oracle(spark, seed, n_docs, vocab):
    """The registration-grade gate for round 11: the suffix-array
    Spark pipeline and the chained-CTE DuckDB oracle (monotone mark
    pruning, exact_repeat_oracle_sql) must agree row-for-row on a
    random documents table. k_max is asserted above the corpus' true
    longest so the oracle's exactness bound holds."""
    import duckdb

    from multi_crm_cross_sell_spark.operators.suffix import (
        cross_doc_repeat,
        exact_repeat_doc_stats,
        exact_repeat_oracle_sql,
    )

    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = {
        d: [words[rng.randint(vocab)] for _ in range(rng.randint(3, 20))]
        for d in range(n_docs)
    }
    k_max = 24
    assert max(_reference_cross_doc_repeat(docs).values()) < k_max
    ddf = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id bigint, text string"
    )
    toks = ddf.select(
        "doc_id",
        __import__("pyspark.sql.functions", fromlist=["posexplode"]).posexplode(
            __import__("pyspark.sql.functions", fromlist=["split"]).split(
                ddf.text, " "
            )
        ).alias("pos", "w"),
    )
    rep = cross_doc_repeat(toks, n_parts=4)
    got = {
        r["doc_id"]: (
            r["longest_repeat"],
            r["n_repeat_starts"],
            r["n_covered_words"],
            r["flagged"],
        )
        for r in exact_repeat_doc_stats(rep, mark_k=3, flag_words=5).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(d, " ".join(t)) for d, t in docs.items()],
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            exact_repeat_oracle_sql(k_max, mark_k=3, flag_words=5)
        ).fetchall()
    }
    assert got == want


@pytest.mark.parametrize("seed,cap", [(7, 4), (41, 8), (97, 3)])
def test_cross_doc_repeat_capped_matches_min_of_reference(spark, seed, cap):
    """Capped mode: rep must equal min(true rep, cap) everywhere —
    including corpora whose repeats exceed the cap (rank tie groups
    at the final doubling level exercise the gpos tie-break)."""
    from multi_crm_cross_sell_spark.operators.suffix import cross_doc_repeat

    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(3)]
    docs = {
        d: [words[rng.randint(3)] for _ in range(rng.randint(3, 16))]
        for d in range(10)
    }
    # plant a long shared block so true rep >> cap in places
    block = [words[rng.randint(3)] for _ in range(cap * 3)]
    docs[100] = ["u1"] + block + ["u2"]
    docs[101] = block + ["u3"]
    rows = [(d, p, w) for d, t in docs.items() for p, w in enumerate(t)]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    got = {
        (r["doc_id"], r["pos"]): r["rep"]
        for r in cross_doc_repeat(df, n_parts=4, cap=cap).collect()
    }
    want = {
        k: min(v, cap) for k, v in _reference_cross_doc_repeat(docs).items()
    }
    assert got == want


def test_capped_stats_match_uncapped_below_thresholds(spark):
    """The capped-input exactness claim: with cap >= flag_words, every
    stat except the saturating longest_repeat must match the uncapped
    run bit-for-bit (covered-union proof in the docstring)."""
    from multi_crm_cross_sell_spark.operators.suffix import (
        cross_doc_repeat,
        exact_repeat_doc_stats,
    )

    rng = np.random.RandomState(71)
    words = [f"w{i}" for i in range(3)]
    docs = {
        d: [words[rng.randint(3)] for _ in range(rng.randint(4, 18))]
        for d in range(8)
    }
    block = [words[rng.randint(3)] for _ in range(20)]
    docs[50] = block + ["a1"] + block
    docs[51] = ["b1", "b2"] + block
    rows = [(d, p, w) for d, t in docs.items() for p, w in enumerate(t)]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    cap, mark_k, flag = 6, 3, 5
    capped = {
        r["doc_id"]: (r["n_repeat_starts"], r["n_covered_words"], r["flagged"])
        for r in exact_repeat_doc_stats(
            cross_doc_repeat(df, n_parts=4, cap=cap), mark_k=mark_k,
            flag_words=flag,
        ).collect()
    }
    uncapped = {
        r["doc_id"]: (r["n_repeat_starts"], r["n_covered_words"], r["flagged"])
        for r in exact_repeat_doc_stats(
            cross_doc_repeat(df, n_parts=4), mark_k=mark_k, flag_words=flag
        ).collect()
    }
    assert capped == uncapped


def test_capped_pipeline_matches_oracle_totally(spark):
    """The registration pair: Spark capped pipeline vs the k_max=cap
    chained-CTE oracle must agree on ANY corpus — no exactness-bound
    caveat (repeats far beyond the cap are planted to prove it)."""
    import duckdb

    from multi_crm_cross_sell_spark.operators.suffix import (
        cross_doc_repeat,
        exact_repeat_doc_stats,
        exact_repeat_oracle_sql,
    )

    rng = np.random.RandomState(29)
    words = [f"w{i}" for i in range(4)]
    docs = {
        d: [words[rng.randint(4)] for _ in range(rng.randint(3, 20))]
        for d in range(12)
    }
    block = [words[rng.randint(4)] for _ in range(40)]
    docs[200] = block + ["t1"]
    docs[201] = ["t2"] + block
    cap, mark_k, flag = 8, 3, 5
    ddf = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()],
        "doc_id bigint, text string",
    )
    from pyspark.sql import functions as F

    toks = ddf.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in exact_repeat_doc_stats(
            cross_doc_repeat(toks, n_parts=4, cap=cap), mark_k=mark_k,
            flag_words=flag,
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(d, " ".join(t)) for d, t in docs.items()],
    )
    want = {
        r[0]: r[1:]
        for r in con.execute(
            exact_repeat_oracle_sql(cap, mark_k=mark_k, flag_words=flag)
        ).fetchall()
    }
    assert got == want


def test_global_prefix_sum_matches_itertools(spark):
    import itertools

    from multi_crm_cross_sell_spark.operators.suffix import global_prefix_sum

    vals = [3, 0, 5, 1, 0, 0, 7, 2, 4, 1, 1, 0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "ord bigint, v bigint"
    )
    got = {
        r["ord"]: r["ps"]
        for r in global_prefix_sum(df, "ord", "v", out="ps", n_parts=4).collect()
    }
    want = dict(enumerate(itertools.accumulate(vals)))
    assert got == want


def test_order_ranks_monotone_and_tie_preserving(spark):
    """_order_ranks: equal keys share a rank; rank order equals key
    order (values themselves are arbitrary ids, NOT dense)."""
    from multi_crm_cross_sell_spark.operators.suffix import _order_ranks

    rows = [(i, k) for i, k in enumerate([5, 3, 3, 9, 1, 5, 1, 3])]
    df = spark.createDataFrame(rows, "gpos bigint, k bigint")
    got = {r["gpos"]: r["rank"] for r in _order_ranks(df, ["k"], 3).collect()}
    by_key = {}
    for i, k in rows:
        by_key.setdefault(k, set()).add(got[i])
    # tie-preserving: one rank value per key
    assert all(len(v) == 1 for v in by_key.values())
    # order-monotone: rank values sort identically to keys
    ks = sorted(by_key)
    rs = [next(iter(by_key[k])) for k in ks]
    assert rs == sorted(rs) and len(set(rs)) == len(ks)


def test_exact_repeat_stats_plan_matches_oracle(spark):
    """Round-11 staging gate: the UNREGISTERED plan function and its
    oracle builder agree row-for-row on real testdata (sf0.001) — the
    registration is a decorator flip away."""
    import duckdb

    from multi_crm_cross_sell_spark.plans.datapipe import (
        _exact_repeat_oracle,
        exact_repeat_stats,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (
            r["longest_repeat"],
            r["n_repeat_starts"],
            r["n_covered_words"],
            r["flagged"],
        )
        for r in exact_repeat_stats(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = {r[0]: r[1:] for r in con.execute(_exact_repeat_oracle()).fetchall()}
    assert got == want


def test_exact_repeat_removal_planted(spark):
    """Symmetric removal: a >= flag-word cross-doc block disappears
    from BOTH docs; untouched docs pass through verbatim."""
    from pyspark.sql import functions as F

    from multi_crm_cross_sell_spark.operators.suffix import (
        cross_doc_repeat,
        exact_repeat_removal_frame,
    )

    block = [f"b{i}" for i in range(6)]
    docs = {
        0: ["x1"] + block + ["x2"],
        1: block + ["y1"],
        2: ["a", "b", "c"],
    }
    ddf = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()],
        "doc_id bigint, text string",
    )
    toks = ddf.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    rep = cross_doc_repeat(toks, n_parts=3, cap=8)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept_words"], r["n_removed_words"])
        for r in exact_repeat_removal_frame(ddf, rep, flag_words=4).collect()
    }
    assert got == {
        0: ("x1 x2", 2, 6),
        1: ("y1", 1, 6),
        2: ("a b c", 3, 0),
    }


def test_exact_repeat_removal_plan_matches_duckdb_oracle(spark):
    """Round-11 staging gate for the removal twin: plan vs
    exact_repeat_removal_oracle_sql, row-for-row on sf0.001."""
    import duckdb

    from multi_crm_cross_sell_spark.plans.datapipe import (
        _exact_repeat_removal_oracle,
        exact_repeat_removal,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept_words"], r["n_removed_words"])
        for r in exact_repeat_removal(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_exact_repeat_removal_oracle()).fetchall()
    }
    assert got == want


def test_exact_repeat_removal_matches_python_reference(spark):
    """Randomized end-to-end check of the symmetric removal against a
    brute-force reference: covered = union of [p, p+rep-1] over
    rep >= flag, cleaned text = the uncovered words in order."""
    from pyspark.sql import functions as F

    from multi_crm_cross_sell_spark.operators.suffix import (
        cross_doc_repeat,
        exact_repeat_removal_frame,
    )

    rng = np.random.RandomState(83)
    words = [f"w{i}" for i in range(3)]
    docs = {
        d: [words[rng.randint(3)] for _ in range(rng.randint(4, 22))]
        for d in range(16)
    }
    flag, cap = 5, 8
    ref_rep = _reference_cross_doc_repeat(docs)
    want = {}
    for d, toks in docs.items():
        covered = set()
        for p in range(len(toks)):
            if ref_rep[(d, p)] >= flag:
                covered.update(range(p, p + ref_rep[(d, p)]))
        kept = [w for p, w in enumerate(toks) if p not in covered]
        want[d] = (" ".join(kept), len(kept), len(toks) - len(kept))
    ddf = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()],
        "doc_id bigint, text string",
    )
    toks = ddf.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    rep = cross_doc_repeat(toks, n_parts=4, cap=cap)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept_words"], r["n_removed_words"])
        for r in exact_repeat_removal_frame(ddf, rep, flag_words=flag).collect()
    }
    assert got == want


def test_group_expr_cross_group_only(spark):
    """group_expr: repeats WITHIN a group must not count — only
    cross-group sharing registers."""
    from pyspark.sql import functions as F

    from multi_crm_cross_sell_spark.operators.suffix import cross_doc_repeat

    block = [f"b{i}" for i in range(5)]
    docs = {
        # docs 0 and 2: same group (even), share a 5-block — NOT cross
        0: block + ["x1"],
        2: ["x2"] + block,
        # doc 1 (odd group) shares a 3-prefix of the block with group 0
        1: block[:3] + ["y1"],
    }
    rows = [(d, p, w) for d, t in docs.items() for p, w in enumerate(t)]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    got = {
        (r["doc_id"], r["pos"]): r["rep"]
        for r in cross_doc_repeat(
            df, n_parts=3, group_expr=lambda d: d % 2
        ).collect()
    }
    # cross-group reference: group = parity
    want = {}
    for d, toks in docs.items():
        for p in range(len(toks)):
            best = 0
            for d2, t2 in docs.items():
                if d2 % 2 == d % 2:
                    continue
                for q in range(len(t2)):
                    ln = 0
                    while (
                        p + ln < len(toks)
                        and q + ln < len(t2)
                        and toks[p + ln] == t2[q + ln]
                    ):
                        ln += 1
                    best = max(best, ln)
            want[(d, p)] = best
    assert got == want
    # the planted facts: within-group 5-share invisible, cross-group 3 visible
    assert got[(0, 0)] == 3 and got[(2, 1)] == 3 and got[(1, 0)] == 3


def test_exact_contamination_plan_matches_oracle_and_ngram_flag(spark):
    """Round-11 staging gate for the contamination twin, PLUS the
    cross-implementation parity pin: the suffix-exact contaminated
    flag must equal benchmark_decontamination's n-gram flag on real
    testdata (rep >= n ⟺ shares an n-gram with the holdout)."""
    import duckdb

    from multi_crm_cross_sell_spark.plans.datapipe import (
        _exact_contamination_oracle,
        benchmark_decontamination,
        exact_contamination_spans,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (
            r["longest_shared_span"],
            r["n_contaminated_positions"],
            r["contaminated"],
        )
        for r in exact_contamination_spans(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(_exact_contamination_oracle()).fetchall()
    }
    assert got == want
    ngram_flags = {
        r["doc_id"]: r["contaminated"]
        for r in benchmark_decontamination(spark, sf).collect()
    }
    assert {d: v[2] for d, v in got.items()} == ngram_flags


def test_cap_metadata_travels_with_rep_frame(spark):
    """Round-12 hardening: cross_doc_repeat stamps its cap into the
    rep column's metadata, so a consumer called WITHOUT the cap kwarg
    still enforces cap >= flag_words — the kwarg cannot be silently
    dropped (the pre-change bypass). A contradicting explicit kwarg
    raises; a matching one passes; an uncapped frame resolves to
    None."""
    from multi_crm_cross_sell_spark.operators.suffix import (
        cross_doc_repeat,
        exact_repeat_doc_stats,
    )

    rows = [(0, 0, "a"), (0, 1, "b"), (1, 0, "a"), (1, 1, "b")]
    df = spark.createDataFrame(rows, "doc_id bigint, pos bigint, w string")
    rep_capped = cross_doc_repeat(df, n_parts=2, cap=4)
    assert rep_capped.schema["rep"].metadata["suffix_cap"] == 4
    # kwarg omitted: metadata enforces the precondition anyway
    with pytest.raises(ValueError, match="cap=4 < flag_words"):
        exact_repeat_doc_stats(rep_capped, mark_k=2, flag_words=9)
    # contradicting kwarg: caller bug, loud
    with pytest.raises(ValueError, match="contradicts"):
        exact_repeat_doc_stats(rep_capped, mark_k=1, flag_words=2, cap=8)
    # matching kwarg and metadata: fine
    exact_repeat_doc_stats(rep_capped, mark_k=1, flag_words=2, cap=4)
    # uncapped frame: metadata says -1 -> resolves to None, always ok
    rep_un = cross_doc_repeat(df, n_parts=2)
    assert rep_un.schema["rep"].metadata["suffix_cap"] == -1
    exact_repeat_doc_stats(rep_un, mark_k=1, flag_words=50)
