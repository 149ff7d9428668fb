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
