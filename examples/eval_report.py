"""Print a scorer/ranker evaluation report — the grading numbers a
curation pipeline owner checks before trusting any model-driven filter:
discrimination (one-vs-rest ROC AUC), calibration (reliability bins +
ECE), retrieval quality (MRR / MAP / nDCG over the same judgment
harness), a numeric-integrity audit (Benford), and two corpus-health
signals (Good-Turing unseen mass, token burstiness).

Run:  python examples/eval_report.py [sf_dir]

Every number comes from the same oracle-checked queries the driver gate
verifies (registry + r5-staged), so the report is exactly as
trustworthy as the oracle suite.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from nonconsumptive_spark.queries import all_queries
    from nonconsumptive_spark.session import get_spark

    spark = get_spark("eval-report", cpus=8, shuffle_partitions=8)

    def staged(name):
        return all_queries()[name].spark_fn(spark, sf_dir).collect()

    print(f"# Scorer / ranker evaluation — {sf_dir}\n")

    print("## Discrimination: one-vs-rest ROC AUC (score = embedding[0])")
    for r in sorted(staged("q_auc_eval"), key=lambda r: r["label"]):
        bar = "#" * int((r["auc"] or 0.5) * 20)
        print(f"- label {r['label']}: auc={r['auc']}  "
              f"({r['n_pos']} pos / {r['n_neg']} neg)  {bar}")

    print("\n## Calibration (reliability bins; gap = per-bin ECE term)")
    cal = sorted(staged("q_calibration_bins"), key=lambda r: r["bin"])
    n_total = sum(r["n"] for r in cal)
    ece = sum(r["gap"] * r["n"] for r in cal) / n_total
    for r in cal:
        print(f"- bin {r['bin']}: n={r['n']:4d}  conf={r['avg_conf']:.3f}  "
              f"actual={r['pos_rate']:.3f}  gap={r['gap']:.3f}")
    print(f"- ECE (n-weighted mean gap): {ece:.4f}")

    print("\n## Retrieval: lexical ranker vs semantic pseudo-relevance")
    mrr_rows = staged("q_mrr_map_eval")
    ndcg_rows = {r["query_id"]: r for r in staged("q_ndcg_eval")}
    rrs = [r["rr"] for r in mrr_rows if r["rr"] is not None]
    aps = [r["ap"] for r in mrr_rows]
    for r in sorted(mrr_rows, key=lambda r: r["query_id"]):
        nd = ndcg_rows.get(r["query_id"])
        print(f"- q{r['query_id']}: first_rel={r['first_rel']}  "
              f"rr={r['rr']}  ap={r['ap']}  "
              f"ndcg={nd['ndcg'] if nd else None}")
    if mrr_rows:
        print(f"- MRR={sum(rrs) / len(mrr_rows):.4f}  "
              f"MAP={sum(aps) / len(aps):.4f}")

    print("\n## Numeric integrity: Benford first-digit audit (events.value)")
    for r in sorted(staged("q_benford_deviation"), key=lambda r: -r["chi2"]):
        flag = "  <-- inspect" if r["chi2"] > 50 else ""
        print(f"- {r['event_type']}: n={r['n']}  chi2={r['chi2']}{flag}")

    print("\n## Unseen mass (Good-Turing): smallest r with N_{r+1} support")
    gt = sorted((r for r in staged("q_good_turing")
                 if r["r_star"] is not None), key=lambda r: r["r"])[:5]
    for r in gt:
        print(f"- r={r['r']}: N_r={r['n_r']}  r*={r['r_star']}")

    print("\n## Burstiest tokens (Fano factor of per-doc counts)")
    for r in sorted(staged("q_token_burstiness"),
                    key=lambda r: -r["fano"])[:5]:
        print(f"- {r['token']}: fano={r['fano']}  total={r['total']}  "
              f"in {r['n_docs']} docs")


if __name__ == "__main__":
    main()
