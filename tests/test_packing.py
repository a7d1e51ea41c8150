"""Sequence-packing invariants: capacity, offset contiguity, determinism
under repartitioning, oversized-doc isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

MAX_LEN = 64
SHARDS = 4


def _packed(spark, docs=None):
    from nonconsumptive_spark.operators.packing import pack_sequences

    if docs is None:
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    return pack_sequences(docs, max_len=MAX_LEN, n_shards=SHARDS)


def test_every_doc_packed_exactly_once(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    packed = _packed(spark, docs)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_capacity_respected_except_oversized_singletons(spark):
    per_seq = (
        _packed(spark)
        .groupBy("shard", "seq_id")
        .agg(F.sum("n_tokens").alias("total"), F.count("*").alias("docs"))
    )
    # A sequence may exceed max_len ONLY when it holds a single oversized doc.
    bad = per_seq.filter((F.col("total") > MAX_LEN) & (F.col("docs") > 1))
    assert bad.count() == 0


def test_offsets_are_contiguous_fill(spark):
    # Within a sequence, sorting docs by offset must give
    # offset[i] == sum of n_tokens of docs before it (greedy append).
    rows = (
        _packed(spark)
        .sort("shard", "seq_id", "seq_offset")
        .collect()
    )
    fill: dict[tuple, int] = {}
    for r in rows:
        key = (r.shard, r.seq_id)
        assert r.seq_offset == fill.get(key, 0)
        fill[key] = fill.get(key, 0) + r.n_tokens


def test_deterministic_across_partitioning(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = {(r.doc_id): (r.shard, r.seq_id, r.seq_offset)
         for r in _packed(spark, docs).collect()}
    b = {(r.doc_id): (r.shard, r.seq_id, r.seq_offset)
         for r in _packed(spark, docs.repartition(7)).collect()}
    assert a == b


def test_oversized_doc_is_isolated(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * n) for i, n in enumerate([10, 500, 10, 10, 60, 10])],
        "doc_id long, text string",
    )
    from nonconsumptive_spark.operators.packing import pack_sequences

    packed = pack_sequences(docs, max_len=MAX_LEN, n_shards=1)
    by_doc = {r.doc_id: r for r in packed.collect()}
    big = by_doc[1]
    mates = [r for r in by_doc.values()
             if (r.shard, r.seq_id) == (big.shard, big.seq_id)]
    assert mates == [big]  # the 500-token doc shares its sequence with no one
    assert big.seq_offset == 0


def test_packing_stats_consistent(spark):
    from nonconsumptive_spark.operators.packing import packing_stats

    packed = _packed(spark)
    stats = packing_stats(packed, max_len=MAX_LEN).collect()[0]
    n_seqs = packed.select("shard", "seq_id").distinct().count()
    assert stats.n_sequences == n_seqs
    assert stats.n_docs == packed.count()
    assert 0.0 < stats.fill_ratio <= 1.0


# ---------------------------------------------------------------------------
class TestRedaction:
    def test_redacts_all_three_classes(self, spark):
        from nonconsumptive_spark.operators.textstats import redact_pii

        docs = spark.createDataFrame(
            [
                (1, "mail me at jo.doe+x@site.co.uk or visit https://a.b/c?d=1 ref 12345678"),
                (2, "no pii here, just 123 and a word"),
                (3, "https://x.y/z?email=a@b.com stays one URL"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in redact_pii(docs).collect()}
        assert out[1].n_emails == 1 and out[1].n_urls == 1 and out[1].n_id_runs == 1
        assert out[1].redacted == "mail me at <EMAIL> or visit <URL> ref <ID>"
        assert out[2].redacted == docs.filter("doc_id=2").collect()[0].text
        assert (out[2].n_emails, out[2].n_urls, out[2].n_id_runs) == (0, 0, 0)
        # the email-shaped substring inside the URL redacts as part of the URL
        assert out[3].redacted == "<URL> stays one URL"
        assert out[3].n_urls == 1


# ---------------------------------------------------------------------------
class TestVersioningAndLogprob:
    def test_corpus_diff_statuses(self, spark):
        from nonconsumptive_spark.operators.versioning import corpus_diff, diff_summary

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
        new = spark.createDataFrame(
            [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string")
        st = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
        assert st == {1: "deleted", 2: "unchanged", 3: "changed", 4: "added"}
        summary = {r.status: r.n for r in
                   diff_summary(corpus_diff(old, new)).collect()}
        assert summary == {"deleted": 1, "unchanged": 1, "changed": 1, "added": 1}

    def test_unigram_logprob_orders_quality(self, spark):
        from nonconsumptive_spark.operators.textstats import unigram_logprob_scores

        # doc 3 is all-rare tokens; docs 1-2 share frequent vocabulary
        docs = spark.createDataFrame(
            [(1, "the cat sat on the mat"),
             (2, "the dog sat on the rug"),
             (3, "zyx qwv plk mnb"),
             (4, "")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in unigram_logprob_scores(docs).collect()}
        assert out[3].avg_logprob < out[1].avg_logprob
        assert out[3].avg_logprob < out[2].avg_logprob
        assert out[4].n_tokens == 0 and out[4].avg_logprob == 0.0

    def test_vocab_cap_forces_oov(self, spark):
        from nonconsumptive_spark.operators.textstats import unigram_logprob_scores

        docs = spark.createDataFrame(
            [(1, "aa aa aa aa"), (2, "bb bb"), (3, "cc")],
            "doc_id long, text string",
        )
        # cap=1 keeps only 'aa': bb (count 2) and cc (count 1) both hit the
        # OOV floor, so their docs score IDENTICALLY under the cap...
        capped = {r.doc_id: r.avg_logprob
                  for r in unigram_logprob_scores(docs, vocab_cap=1).collect()}
        assert capped[2] == capped[3]
        # ...but differ when the vocab holds their true counts.
        full = {r.doc_id: r.avg_logprob
                for r in unigram_logprob_scores(docs, vocab_cap=10).collect()}
        assert full[2] > full[3]


# ---------------------------------------------------------------------------
class TestCapAndFilter:
    def test_cap_respects_k_and_determinism(self, spark):
        from nonconsumptive_spark.operators.textstats import cap_per_source
        from tests.conftest import SF_SMALL

        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        capped = cap_per_source(docs, k=5)
        per_src = {r.source: r.n for r in
                   capped.groupBy("source").count().withColumnRenamed("count", "n").collect()}
        avail = {r.source: r.n for r in
                 docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
        for src, n in per_src.items():
            assert n == min(5, avail[src])
        # deterministic under repartitioning
        a = {r.doc_id for r in capped.collect()}
        b = {r.doc_id for r in cap_per_source(docs.repartition(9), k=5).collect()}
        assert a == b

    def test_quality_filter_reasons(self, spark):
        from nonconsumptive_spark.operators.textstats import quality_filter

        good = ("the cat and the dog sat in a house with it is nice and "
                "the sun was warm so they slept all day long together")
        docs = spark.createDataFrame(
            [
                (1, good),
                (2, "short text"),                       # too_short
                (3, "1234 5678 !!! 90 ## 4567 " * 8),    # low_alpha + low_stopword
                (4, ("spam word " * 30).strip()),        # high_dup (one repeated bigram)
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in quality_filter(docs).collect()}
        assert out[1].keep and not (out[1].too_short or out[1].low_alpha
                                    or out[1].high_dup or out[1].low_stopword)
        assert out[2].too_short and not out[2].keep
        assert out[3].low_alpha and not out[3].keep
        assert out[4].high_dup and not out[4].keep


class TestStreamingHygiene:
    def test_redaction_stream_equals_batch(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from nonconsumptive_spark.operators.textstats import redact_pii
        from tests.conftest import SF_SMALL

        src = str(tmp_path / "docs")
        batch_df = (
            spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .withColumn("text", F.concat(
                F.col("text"), F.lit(" mail x"), F.col("doc_id").cast("string"),
                F.lit("@ex.org")))
        )
        batch_df.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.format("parquet")
            .schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 2)
            .load(src)
        )
        out = str(tmp_path / "red")
        q = (
            redact_pii(stream).writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r.doc_id, r.redacted, r.n_emails)
               for r in spark.read.parquet(out).collect()}
        expect = {(r.doc_id, r.redacted, r.n_emails)
                  for r in redact_pii(spark.read.parquet(src)).collect()}
        assert got == expect and len(got) > 0
        assert all(n == 1 for _, _, n in got)
