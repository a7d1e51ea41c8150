"""Markov chain text generation demo — the Spark-first equivalent of the
reference's Ngrams.ipynb "generate text from the transition matrix" cells
(/root/reference/examples/Ngrams.ipynb: bigram counts -> conditional
next-word distribution -> repeated weighted draws).

Run:  python examples/markov_generate.py [sf_dir] [start_token] [length]

The transition table is built distributed (one corpus-wide bigram agg);
generation is a driver-side loop of seeded weighted draws over the
vocab-bounded table (operators/markov.py) — deterministic for a seed, so
the demo prints the same chain every run.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    start = sys.argv[2] if len(sys.argv) > 2 else "the"
    length = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    from nonconsumptive_spark.operators.markov import generate_chain
    from nonconsumptive_spark.operators.wordcount import ngram_counts
    from nonconsumptive_spark.queries import load
    from nonconsumptive_spark.session import get_spark

    spark = get_spark("markov-demo", cpus=4, shuffle_partitions=4)
    docs = load(spark, sf_dir, "documents")
    bigrams = ngram_counts(docs, 2)
    chain = generate_chain(bigrams, start=start, length=length, seed=42)
    print(" ".join(chain))


if __name__ == "__main__":
    main()
