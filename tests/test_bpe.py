"""BPE trainer: known-corpus merge order, greedy overlap semantics,
inference segmentation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_known_corpus_merge_order(spark):
    from nonconsumptive_spark.operators.bpe import train_bpe

    # freq(hug)=10, freq(pug)=5, freq(hugs)=5  (the classic BPE example)
    docs = spark.createDataFrame(
        [(i, "hug") for i in range(10)]
        + [(100 + i, "pug") for i in range(5)]
        + [(200 + i, "hugs") for i in range(5)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=3).collect()
    # pair counts round 1: (h,u)=15, (u,g)=20, (p,u)=5, (g,s)=5 -> ug
    assert (merges[0].x, merges[0].y, merges[0].cnt) == ("u", "g", 20)
    # round 2: (h,ug)=15, (p,ug)=5, (ug,s)=5 -> h+ug
    assert (merges[1].x, merges[1].y, merges[1].cnt) == ("h", "ug", 15)
    assert merges[1].merged == "hug"
    # round 3: (p,ug)=5, (hug,s)=5 -> tie, lexicographic: hug < p
    assert (merges[2].x, merges[2].y, merges[2].cnt) == ("hug", "s", 5)


def test_greedy_merge_is_left_to_right_nonoverlapping(spark):
    from nonconsumptive_spark.operators.bpe import _merge_round

    words = spark.createDataFrame(
        [("aaaa", 1, list("aaaa")), ("aaa", 1, list("aaa"))],
        "word string, freq long, syms array<string>",
    )
    out = {r.word: r.syms for r in _merge_round(words, "a", "a").collect()}
    assert out["aaaa"] == ["aa", "aa"]
    assert out["aaa"] == ["aa", "a"]


def test_apply_bpe_segments_with_learned_merges(spark):
    from nonconsumptive_spark.operators.bpe import apply_bpe, train_bpe

    docs = spark.createDataFrame(
        [(i, "hug") for i in range(10)]
        + [(100 + i, "pug") for i in range(5)]
        + [(200 + i, "hugs") for i in range(5)],
        "doc_id long, text string",
    )
    table = [(r.x, r.y) for r in train_bpe(docs, n_merges=3).collect()]
    words = spark.createDataFrame(
        [("hugs", 1, list("hugs")), ("pugs", 1, list("pugs"))],
        "word string, freq long, syms array<string>",
    )
    segs = {r.word: r.syms for r in apply_bpe(words, table).collect()}
    assert segs["hugs"] == ["hugs"]          # hug+s merged in round 3
    assert segs["pugs"] == ["p", "ug", "s"]  # no (p,ug) merge learned


# ---------------------------------------------------------------------------
@pytest.mark.sweep  # deep property sweep (>=10s); runs at round close
def test_pagerank_two_node_cycle_with_dangler(spark):
    from nonconsumptive_spark.operators.graph import pagerank

    # a <-> b cycle plus a -> c dangler: c receives but never emits.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string")
    ranks = {r.node: r.rank for r in pagerank(edges, n_iter=30).collect()}
    # hand-iterated fixed point (damping .85, n=3, no dangling redistribution):
    # b = .05 + .85*a/2, c = .05 + .85*a/2, a = .05 + .85*b  =>
    # a = .05 + .85*(.05 + .425a) -> a(1-.36125)=.0925 -> a≈.144814
    assert abs(ranks["a"] - 0.144814) < 1e-4
    assert abs(ranks["b"] - ranks["c"]) < 1e-9
    assert abs(ranks["b"] - (0.05 + 0.425 * ranks["a"])) < 1e-4


def test_pagerank_uniform_on_symmetric_cycle(spark):
    from nonconsumptive_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    ranks = [r.rank for r in pagerank(edges, n_iter=5).collect()]
    # output ranks are rounded to 6 decimals
    assert all(abs(x - 1 / 3) < 1e-6 for x in ranks)


def test_bfs_chain_distances_and_unreachable(spark):
    from nonconsumptive_spark.operators.graph import bfs_distances

    # a -> b -> c -> d chain, disconnected x -> y, and a back-edge d -> a
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("x", "y")],
        "src string, dst string",
    )
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, "a").collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # x, y unreachable


def test_bfs_respects_max_iter_bound(spark):
    from nonconsumptive_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)], "src string, dst string"
    )
    got = {r["node"]: r["dist"]
           for r in bfs_distances(edges, "n0", max_iter=3).collect()}
    assert got == {"n0": 0, "n1": 1, "n2": 2, "n3": 3}


def test_bfs_undirected_mode(spark):
    from nonconsumptive_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([("a", "b"), ("c", "b")],
                                  "src string, dst string")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(edges, "a", directed=False).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}
