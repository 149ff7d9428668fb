"""Unit tests for bench.py's harness arithmetic — the pieces whose
failure modes the round-10 review found (ratio skew on missing
oracles, fake ratios when no oracle ran). No SparkSession needed."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sec_totals(names, book, oracle_timings):
    """Mirror of bench.main's inner helper (kept in lockstep by this
    test — the helper is a closure, so the logic is restated here;
    a drift shows up as a failing expectation below on the same
    inputs)."""
    both = [n for n in names if n in book and n in oracle_timings]
    if not both:
        return None, None
    o = sum(oracle_timings[n] for n in both)
    s = sum(book[n] for n in both)
    return round(o, 3), round(s / o, 3)


def test_ratio_restricted_to_both_sides():
    names = ["a", "b", "c"]
    book = {"a": 2.0, "b": 4.0, "c": 100.0}  # c has NO oracle timing
    oracle = {"a": 1.0, "b": 1.0}
    o, r = _sec_totals(names, book, oracle)
    assert o == 2.0
    # the spark numerator must exclude c (100.0) — pre-fix it did not
    assert r == 3.0


def test_ratio_is_null_when_no_oracle_ran():
    o, r = _sec_totals(["a"], {"a": 2.0}, {})
    assert o is None and r is None


def test_bench_source_matches_mirror():
    """The mirrored helper above must stay in lockstep with bench.py's
    closure: assert the load-bearing lines exist verbatim in the
    source (a cheap drift tripwire — if bench.py's logic changes,
    update the mirror and these expectations together)."""
    src = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    ).read()
    assert "both = [n for n in names if n in book and n in oracle_timings]" in src
    assert "if not both:" in src
    assert "s = sum(book[n] for n in both)" in src


def test_oracle_pass_guards_per_query():
    """One failing oracle must not discard later timings: feed
    oracle_pass a registry stub whose first oracle raises."""
    import bench

    class Q:
        def __init__(self, oracle):
            self.oracle = oracle

    class FakeCon:
        def execute(self, sql):
            if sql == "BOOM":
                raise RuntimeError("bad oracle")

            class R:
                def fetchall(self):
                    return []

            return R()

    # monkeypatch duck_connect via tools.check import inside oracle_pass
    import tools.check as check

    real = check.duck_connect
    check.duck_connect = lambda sf_dir: FakeCon()
    try:
        qs = {
            bench.HEADLINE[0]: Q("BOOM"),
            bench.HEADLINE[1]: Q("SELECT 1"),
        }
        book: dict = {}
        bench.oracle_pass(book, "/nonexistent", qs, runs=1)
        assert bench.HEADLINE[0] not in book
        assert bench.HEADLINE[1] in book
    finally:
        check.duck_connect = real
