"""Print a small "dataset card" for a corpus directory — the first-mile
numbers a training-data curator wants before touching anything: size,
language mix, quality, duplication, length distribution with error bars,
and the most distinctive vocabulary per language.

Run:  python examples/dataset_card.py [sf_dir]

Every number comes from the same registry queries the driver gate
verifies (``nonconsumptive_spark.queries``), so the card is exactly as
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

    spark = get_spark("dataset-card", cpus=8, shuffle_partitions=8)
    qs = all_queries()

    def run(name):
        return qs[name].spark_fn(spark, sf_dir).collect()

    profile = run("q_corpus_profile")
    ci = run("q_bootstrap_mean_ci")[0]
    lang_mix: dict[str, int] = {}
    for r in run("q_lang_id"):
        lang_mix[r["pred_lang"]] = lang_mix.get(r["pred_lang"], 0) + 1
    dedup = run("q_dedup_stats")
    quality = run("q_quality_filter")
    kept = sum(1 for r in quality if r["keep"])
    terms = run("q_distinctive_terms")

    print(f"# Dataset card — {sf_dir}\n")
    print("## Size (per source, top 5 by docs)")
    for r in sorted(profile, key=lambda r: -r["n_docs"])[:5]:
        print(f"- {r['source']}: {r['n_docs']} docs, "
              f"{r['total_tokens']} tokens "
              f"(mean {r['mean_tokens']}, p95 {r['p95_tokens']}), "
              f"top lang {r['top_lang']}")
    print(f"- mean doc length (chars): {ci['mean']} "
          f"(95% bootstrap CI [{ci['ci_lo']}, {ci['ci_hi']}])\n")
    print("## Language mix (heuristic lang-ID)")
    for lang, n in sorted(lang_mix.items(), key=lambda kv: -kv[1]):
        print(f"- {lang}: {n}")
    print("\n## Duplication (near-dup cluster size histogram)")
    for r in sorted(dedup, key=lambda r: r["cluster_size"]):
        print(f"- size {r['cluster_size']}: {r['n_clusters']} clusters, "
              f"{r['n_removable']} removable docs")
    print(f"\n## Quality filter\n- keep: {kept}/{len(quality)}")
    from nonconsumptive_spark.queries import all_queries

    codey = all_queries()["q_code_score"].spark_fn(spark, sf_dir).collect()
    n_codey = sum(1 for r in codey if r["is_codey"])
    print(f"\n## Code-likeness\n- code-looking docs: {n_codey}/{len(codey)}")
    top = all_queries()["q_top_component"].spark_fn(spark, sf_dir).collect()
    peak = max(top, key=lambda r: abs(r["loading"]))
    print("\n## Embedding anisotropy (top principal component)")
    print(f"- strongest loading: dim {peak['dim']} at {peak['loading']}")
    print("\n## Distinctive vocabulary (top-3 per language)")
    by_label: dict[str, list] = {}
    for r in sorted(terms, key=lambda r: (r["label"], r["rank"])):
        by_label.setdefault(r["label"], []).append(r["token"])
    for label, toks in sorted(by_label.items()):
        print(f"- {label}: {', '.join(toks[:3])}")


if __name__ == "__main__":
    main()
