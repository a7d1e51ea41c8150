"""Search-and-layout walkthrough: index a corpus for phrase retrieval,
rank it with BM25, pick the Pareto-frontier documents, and lay the event
table out in Z-order to show the file-pruning win — the round-4 surface
as one runnable script.

Run:  python examples/search_and_layout.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from nonconsumptive_spark.operators.retrieval import (
        bm25_topk,
        build_positional_index,
        phrase_search_indexed,
    )
    from nonconsumptive_spark.operators.skyline import skyline
    from nonconsumptive_spark.queries import load
    from nonconsumptive_spark.session import get_spark
    from nonconsumptive_spark.sources.layout import (
        compact_files,
        pruning_stats,
        zorder_write,
    )

    spark = get_spark("search-and-layout", cpus=8, shuffle_partitions=8)
    docs = load(spark, sf_dir, "documents")

    print("== phrase search over the positional index ==")
    idx = build_positional_index(docs)
    hits = phrase_search_indexed(idx, ["table", "table"]).orderBy("doc_id")
    for r in hits.limit(5).collect():
        print(f"  doc {r['doc_id']}: {r['n_hits']} hit(s), first at token "
              f"{r['first_pos']}")

    print("== BM25 top-5 for ['table', 'scan'] ==")
    for r in bm25_topk(docs, ["table", "scan"], k=5).collect():
        print(f"  doc {r['doc_id']}: score {r['score']}")

    print("== query likelihood top-5 for ['table', 'scan'] ==")
    from nonconsumptive_spark.operators.retrieval import query_likelihood_topk

    for r in query_likelihood_topk(docs, ["table", "scan"], k=5).collect():
        print(f"  doc {r['doc_id']}: score {r['score']} "
              f"({r['n_terms_matched']} terms)")

    print("== skyline: longest AND most-diverse docs ==")
    from pyspark.sql import functions as F

    from nonconsumptive_spark.functions.text import tokenize

    pts = docs.select(
        "doc_id", F.col("n_chars").alias("x"),
        F.size(F.array_distinct(tokenize("text"))).alias("y"))
    for r in skyline(pts, "x", "y").orderBy("doc_id").collect():
        print(f"  doc {r['doc_id']}: {r['x']} chars, {r['y']} types")

    print("== min-span proximity for ['table', 'scan'] (top 5 tightest) ==")
    from nonconsumptive_spark.operators.retrieval import (
        min_span_proximity,
        min_span_proximity_indexed,
    )

    spans = min_span_proximity(docs, ["table", "scan"]).orderBy("span", "doc_id")
    for r in spans.limit(5).collect():
        print(f"  doc {r['doc_id']}: span {r['span']} ({r['n_matches']} matches)")
    # the indexed form answers the same query from the postings alone
    n_idx = min_span_proximity_indexed(idx, ["table", "scan"]).count()
    print(f"  (indexed form agrees: {n_idx} == {spans.count()} docs)")

    print("== blocklist: every phrase decided in one pass over the index ==")
    from nonconsumptive_spark.operators.retrieval import blocklist_match

    bl = [["table", "table"], ["slow", "scan"], ["merge"]]
    matches = blocklist_match(idx, bl)
    for r in (matches.groupBy("phrase_id").count()
              .orderBy("phrase_id").collect()):
        print(f"  phrase {bl[r['phrase_id']]}: {r['count']} docs flagged")

    print("== Z-order layout of events on (user_id, value) ==")
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    with tempfile.TemporaryDirectory() as tmp:
        zpath = f"{tmp}/events_z"
        zorder_write(ev, zpath, "user_id", "value", n_files=8)
        for pred in ("user_id BETWEEN 10 AND 25", "value >= 150"):
            st = pruning_stats(spark, zpath, pred)
            print(f"  {pred!r}: skip {st['files_skippable']}/{st['n_files']} "
                  f"files ({st['rows_matching']} matching rows)")
        stats = compact_files(spark, zpath, f"{tmp}/events_compact",
                              target_rows=5000, order_col="user_id")
        print(f"== compaction: {stats['files_before']} files -> "
              f"{stats['files_after']} ({stats['rows']} rows preserved) ==")


if __name__ == "__main__":
    main()
