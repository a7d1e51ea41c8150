"""Print a corpus statistics panel — the distributional-health numbers a
dataset owner checks before (and after) every curation change: does
document length differ by source (ANOVA + Kruskal-Wallis + Brown-
Forsythe, with Wilson-interval pass rates and jackknife uncertainty),
how diverse is each source's language (Yule/Simpson/Chao1/MATTR/Theil),
how readable is the corpus (Flesch), how associated are the metadata
axes (Cramér's V, Kendall tau-b), and what does the Zipf head cover.

Run:  python examples/stats_panel.py [sf_dir]

Every number comes from the same oracle-checked queries the driver gate
verifies (registry + r5-staged), so the panel is exactly as trustworthy
as the oracle suite.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from nonconsumptive_spark.queries import all_queries
    from nonconsumptive_spark.session import get_spark

    spark = get_spark("stats-panel", cpus=8, shuffle_partitions=8)

    def staged(name):
        return all_queries()[name].spark_fn(spark, sf_dir).collect()

    print(f"# Corpus statistics panel — {sf_dir}\n")

    print("## Does document length differ by source?")
    a = staged("q_anova_oneway")[0]
    print(f"- one-way ANOVA: F={a['f_stat']}  eta^2={a['eta_sq']}  "
          f"omega^2={a['omega_sq']}  ({a['n_groups']} sources, "
          f"{a['n_total']} docs)")
    kw = staged("q_kruskal_wallis")[0]
    print(f"- Kruskal-Wallis: H={kw['h_stat']}  "
          f"tie-corrected={kw['h_corrected']}")
    bf = staged("q_levene_bf")
    w = bf[0]["w_stat"]
    print(f"- Brown-Forsythe (variance homogeneity): W={w}")
    jk = staged("q_jackknife_ratio")[0]
    print(f"- tokens/doc = {jk['theta_hat']} "
          f"(jackknife SE {jk['jk_se']}, bias {jk['jk_bias']})\n")

    print("## Association between metadata axes")
    cv = staged("q_cramers_v")[0]
    print(f"- lang x source: chi2={cv['chi2']}  "
          f"Cramér's V={cv['cramers_v']}")
    kt = staged("q_kendall_tau_b")[0]
    print(f"- length vs token count: Kendall tau-b={kt['tau_b']}")
    ck = staged("q_cohens_kappa")[0]
    print(f"- lang-id vs labels: kappa={ck['kappa']} "
          f"(po={ck['po']}, pe={ck['pe']})\n")

    print("## Per-source pass rates (n_chars >= 200), Wilson 95%")
    for r in sorted(staged("q_wilson_ci"),
                    key=lambda r: r["p_hat"], reverse=True)[:6]:
        print(f"- {r['source']}: {r['p_hat']} "
              f"[{r['wilson_lo']}, {r['wilson_hi']}]  (k={r['k']}/{r['n']})")
    print()

    print("## Lexical diversity / richness (top sources by Yule's K)")
    yules = {r["source"]: r for r in staged("q_yules_k")}
    chao = {r["source"]: r for r in staged("q_chao1_richness")}
    theil = {r["source"]: r for r in staged("q_theil_index")}
    for src in sorted(yules, key=lambda s: yules[s]["yules_k"],
                      reverse=True)[:6]:
        y, c, t = yules[src], chao[src], theil[src]
        print(f"- {src}: K={y['yules_k']}  D={y['simpson_d']}  "
              f"chao1={c['chao1']} (obs {c['n_types']})  "
              f"coverage={c['coverage']}  theil={t['theil_t']}")
    print()

    print("## Readability (Flesch, corpus distribution)")
    fl = [r["flesch"] for r in staged("q_flesch_reading")
          if r["flesch"] is not None]
    fl.sort()
    if fl:
        mid = fl[len(fl) // 2]
        print(f"- docs={len(fl)}  min={fl[0]}  median={mid}  "
              f"max={fl[-1]}\n")

    print("## Zipf head coverage")
    for r in sorted(staged("q_vocab_coverage"), key=lambda r: r["top_k"]):
        bar = "#" * int(r["coverage"] * 30)
        print(f"- top {r['top_k']:>6}: {r['coverage']}  {bar}")
    print()

    print("## Length-distribution shape by source (heaviest tails)")
    for r in sorted(staged("q_higher_moments"),
                    key=lambda r: (r["excess_kurtosis"] is None,
                                   -(r["excess_kurtosis"] or 0)))[:5]:
        print(f"- {r['source']}: mean={r['mean']}  std={r['std_pop']}  "
              f"skew={r['skewness']}  ex-kurtosis={r['excess_kurtosis']}")

    spark.stop()


if __name__ == "__main__":
    main()
