"""Print a corpus drift & classifier report — the monitoring numbers a
training-data pipeline watches between crawls: scalar-feature drift (PSI),
token-distribution divergence (JSD), cross-source content overlap, and the
two in-engine classifiers (closed-form Naive Bayes, GD-trained logistic).

Run:  python examples/drift_report.py [sf_dir]

Every number comes from the same registry queries the driver gate
verifies (``nonconsumptive_spark.queries``), so the report is exactly as
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

    spark = get_spark("drift-report", cpus=8, shuffle_partitions=8)
    qs = all_queries()

    def run(name):
        return qs[name].spark_fn(spark, sf_dir).collect()

    print(f"# Drift & classifier report — {sf_dir}\n")

    psi = sorted(run("q_psi_drift"), key=lambda r: -r.psi)[:5]
    print("## Top source pairs by PSI (n_chars deciles)")
    for r in psi:
        flag = " <- investigate" if r.psi > 0.2 else ""
        print(f"  {r.source_a:>10} vs {r.source_b:<10}  psi={r.psi:.4f}{flag}")

    jsd = sorted(run("q_js_divergence"), key=lambda r: -r.jsd)[:5]
    print("\n## Top language pairs by token JSD")
    for r in jsd:
        print(f"  {r.label_a:>4} vs {r.label_b:<4}  jsd={r.jsd:.4f}")

    print("\n## Naive Bayes lang classifier (train-on-self confusion)")
    cells = run("q_nb_lang_confusion")
    total = sum(r.n_docs for r in cells)
    diag = sum(r.n_docs for r in cells if r.actual == r.predicted)
    print(f"  accuracy {diag}/{total} = {diag / total:.3f}")
    worst = sorted((r for r in cells if r.actual != r.predicted),
                   key=lambda r: -r.n_docs)[:3]
    for r in worst:
        print(f"  most-confused: {r.actual} -> {r.predicted}  ({r.n_docs})")

    print("\n## Trained logistic classifier (length class, 8 GD rounds)")
    rows = run("q_logreg_train")
    n = len(rows)
    correct = sum(1 for r in rows if r.pred == (r.y == 1))
    pos = sum(r.y for r in rows)
    print(f"  accuracy {correct}/{n} = {correct / n:.3f}"
          f"  (majority baseline {max(pos, n - pos) / n:.3f})")

    print("\n## Bloom novelty of the odd-id batch vs the even-id corpus")
    bn = run("q_bloom_novelty")
    tot_sh = sum(r.n_shingles for r in bn)
    hits = sum(r.n_bloom_hits for r in bn)
    fps = sum(r.n_false_pos for r in bn)
    print(f"  {hits}/{tot_sh} shingles hit the filter"
          f" ({fps} false positives = {fps / max(hits, 1):.1%} of hits)")

    print("\n## Are sources exchangeable?  (doc-length two-sample tests)")
    ks = sorted(run("q_ks_length_sources"), key=lambda r: -r.ks_stat)[:3]
    for r in ks:
        print(f"  KS  {r.source_a:>10} vs {r.source_b:<10}"
              f"  D={r.ks_stat:.4f}")
    mwu = sorted(run("q_mann_whitney_sources"),
                 key=lambda r: -abs(r.z_stat))[:3]
    for r in mwu:
        print(f"  MWU {r.source_a:>10} vs {r.source_b:<10}"
              f"  z={r.z_stat:+.2f}")
    tt = sorted(run("q_welch_ttest_sources"),
                key=lambda r: -abs(r.t_stat))[:3]
    for r in tt:
        print(f"  t   {r.source_a:>10} vs {r.source_b:<10}"
              f"  t={r.t_stat:+.2f} (df~{r.welch_df:.0f})")

    print("\n## Does source determine language?")
    mi = run("q_lang_source_mi")[0]
    chi = run("q_lang_source_chi2")[0]
    print(f"  I(lang; source) = {mi.mi_nats:.4f} nats over {mi.n_cells} cells")
    print(f"  chi2 = {chi.chi2:.2f} on {chi.dof} dof"
          f"  (independence plausible below ~{chi.dof + 2.5 * (2 * chi.dof) ** 0.5:.0f})")

    spark.stop()


if __name__ == "__main__":
    main()
