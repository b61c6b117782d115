"""Invariants for the round-2 training-pipeline operators (the oracle
gate covers value parity; these cover Spark-side semantics and the
properties the oracle can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_logs_spark.operators.multimodal import (
    media_content_dedup,
    media_from_documents,
)
from bigdata_logs_spark.operators.parse import IPV4_RE, redact_pii
from bigdata_logs_spark.operators.pipeline import (
    pack_token_budget,
    source_mixing_weights,
)
from bigdata_logs_spark.operators.similarity import ann_recall
from bigdata_logs_spark.operators.textops import repetition_scores, with_tokens
from bigdata_logs_spark.sources import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_packing_conserves_docs_and_tokens(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    packed = pack_token_budget(docs, budget=2048, n_shards=8)
    totals = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("bin_tokens").alias("toks")
    ).collect()[0]
    n_docs = docs.count()
    n_tokens = (
        with_tokens(docs).agg(F.sum(F.size("tokens"))).collect()[0][0]
    )
    assert totals.docs == n_docs
    assert totals.toks == n_tokens
    # bins are contiguous from 0 within each shard — holds whenever
    # every doc is shorter than the budget (a doc longer than the
    # budget straddles windows and the straddled indices have no
    # starting doc); true for this fixture
    for row in packed.groupBy("shard").agg(
        F.min("bin").alias("lo"), F.max("bin").alias("hi"), F.count("*").alias("n")
    ).collect():
        assert row.lo == 0
        assert row.n == row.hi - row.lo + 1


def test_mixing_weights_rebalance_to_uniform(spark, sf_dir):
    w = source_mixing_weights(_docs(spark, sf_dir))
    rows = w.collect()
    # applying the weights equalizes token mass: share * weight is the
    # same (1/n_sources) for every source
    eff = [r.token_share * r.sampling_weight for r in rows]
    assert max(eff) - min(eff) < 1e-4
    assert abs(sum(eff) - 1.0) < 1e-3
    assert all(r.sampling_weight > 0 for r in rows)


def test_repetition_scores_bounds(spark, sf_dir):
    rep = repetition_scores(_docs(spark, sf_dir))
    bad = rep.filter(
        (F.col("top_token_share") <= 0)
        | (F.col("top_token_share") > 1)
        | (F.col("dup_bigram_ratio") < 0)
        | (F.col("dup_bigram_ratio") >= 1)
    ).count()
    assert bad == 0
    # degenerate doc: one token repeated -> share 1.0, all dup bigrams
    one = spark.createDataFrame(
        [(0, "x x x x x", "en", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = repetition_scores(one).collect()[0]
    assert r.top_token_share == 1.0
    assert r.dup_bigram_ratio == 0.75  # 4 bigrams, 1 distinct


def test_redact_pii_leaves_no_addresses(spark):
    lines = spark.createDataFrame(
        [
            ("Failed password for root from 203.0.113.7 port 22 ssh2",),
            ("no address here",),
            ("two: 10.0.0.1 and 192.168.255.254",),
        ],
        "value string",
    )
    out = redact_pii(lines)
    leftover = out.filter(
        F.col("redacted_line").rlike(IPV4_RE)
    ).count()
    assert leftover == 0
    assert (
        out.filter(F.col("redacted_line").contains("[IP]")).count() == 2
    )


def test_media_dedup_partitions_the_corpus(spark, sf_dir):
    media = media_from_documents(_docs(spark, sf_dir))
    groups = media_content_dedup(media)
    assert (
        groups.agg(F.sum("n_copies")).collect()[0][0] == media.count()
    )
    # canonical id is a member of its own group
    joined = groups.join(
        media.select(F.md5("content").alias("checksum"), "media_id"),
        ["checksum"],
    ).filter(F.col("canonical_media_id") == F.col("media_id"))
    assert joined.count() == groups.count()


def test_ann_recall_bounded_and_complete(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rec = ann_recall(emb, n_queries=5, k=5, nprobe=2).collect()
    assert len(rec) == 5
    for r in rec:
        assert 0 <= r.n_hits <= 5
        assert abs(r.recall_at_k - r.n_hits / 5) < 1e-9


def test_incremental_near_dup_only_pairs_new_with_old(spark, sf_dir):
    from bigdata_logs_spark.operators.dedup import incremental_near_dup

    docs = _docs(spark, sf_dir)
    pairs = incremental_near_dup(docs, new_source="src9", threshold=0.05)
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    for r in pairs.collect():
        assert src[r.new_doc] == "src9"
        assert src[r.old_doc] != "src9"


def test_length_gate_keeps_at_least_ninety_pct(spark, sf_dir):
    from bigdata_logs_spark.operators.pipeline import (
        token_length_percentile_gate,
    )

    row = token_length_percentile_gate(_docs(spark, sf_dir)).collect()[0]
    assert row.p_lo <= row.p_hi
    # [p05, p95] must cover >= 90% of docs (exact percentiles; the
    # closed interval can only add boundary docs)
    assert row.n_kept >= 0.9 * row.n_total
    assert row.n_kept <= row.n_total


def test_packing_invariant_under_partitioning(spark, sf_dir):
    # bin assignment must depend only on (shard, doc_id order), never
    # on physical layout — the property that makes packing reproducible
    # across cluster sizes and re-runs
    docs = _docs(spark, sf_dir)
    a = [tuple(r) for r in pack_token_budget(docs).collect()]
    b = [
        tuple(r)
        for r in pack_token_budget(docs.repartition(13)).collect()
    ]
    assert a == b


def test_repetition_scores_invariant_under_partitioning(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = [tuple(r) for r in repetition_scores(docs).collect()]
    b = [tuple(r) for r in repetition_scores(docs.repartition(13)).collect()]
    assert a == b


def test_incremental_agrees_with_full_near_dup(spark, sf_dir):
    # the delta-vs-corpus pairs must be exactly the full pair set
    # restricted to (new-batch, existing) pairs — same LSH, same cap,
    # same verification, so no pair may appear or vanish
    from bigdata_logs_spark.operators.dedup import (
        incremental_near_dup,
        near_dup_pairs,
    )

    docs = _docs(spark, sf_dir)
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    full = {
        frozenset((r.doc_a, r.doc_b)): r.jaccard
        for r in near_dup_pairs(docs, threshold=0.05).collect()
        if (src[r.doc_a] == "src9") != (src[r.doc_b] == "src9")
    }
    inc = {
        frozenset((r.new_doc, r.old_doc)): r.jaccard
        for r in incremental_near_dup(docs, threshold=0.05).collect()
    }
    assert inc == full


def test_boilerplate_semantics(spark):
    """A gram repeated INSIDE one doc counts once toward df (distinct
    per doc); fraction is bounded and exact."""
    from bigdata_logs_spark.operators.textops import (
        boilerplate_fraction,
        boilerplate_ngrams,
    )

    rows = [
        # "a b c" twice within doc 0 -> df contribution still 1
        (0, "en", "src0", 11, "a b c a b c"),
        (1, "en", "src0", 11, "a b c x y z"),
        (2, "en", "src0", 5, "q r s t u"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars int, text string"
    )
    top = {r["gram"]: r["df"] for r in boilerplate_ngrams(docs, k=3, min_df=2).collect()}
    assert top == {"a b c": 2}

    frac = {r["doc_id"]: r for r in boilerplate_fraction(docs, k=3, min_df=2).collect()}
    # doc 0 distinct grams: "a b c","b c a","c a b" -> 1 of 3 common
    assert frac[0]["n_grams"] == 3 and frac[0]["n_common"] == 1
    assert abs(frac[0]["boilerplate_frac"] - round(1 / 3, 4)) < 1e-9
    assert frac[2]["n_common"] == 0 and frac[2]["boilerplate_frac"] == 0.0
    assert all(0.0 <= r["boilerplate_frac"] <= 1.0 for r in frac.values())


def test_chunking_covers_every_token_with_overlap(spark):
    from bigdata_logs_spark.operators.pipeline import chunk_documents

    rows = [
        (0, "en", "src0", 39, " ".join(f"t{i}" for i in range(20))),  # 2 chunks
        (1, "en", "src0", 5, "a b c"),  # single short chunk
        (2, "en", "src0", 0, ""),  # empty -> no rows
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars int, text string"
    )
    out = chunk_documents(docs, chunk_size=16, stride=12).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: starts at tokens 0 and 12 -> sizes 16 and 8; overlap keeps
    # boundary context and every token lands in >=1 chunk
    assert [r["n_tokens"] for r in by_doc[0]] == [16, 8]
    assert [r["chunk_no"] for r in by_doc[0]] == [0, 1]
    assert [r["n_tokens"] for r in by_doc[1]] == [3]
    assert 2 not in by_doc


def test_per_source_sample_bounded_and_partition_invariant(spark, sf_dir):
    from bigdata_logs_spark.operators.pipeline import per_source_sample
    from bigdata_logs_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = per_source_sample(docs, n_per_source=3)
    per_src = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_src and all(n <= 3 for n in per_src.values())
    # hash-ranked, not arbitrary: identical membership under repartition
    a = sorted(map(str, out.collect()))
    b = sorted(map(str, per_source_sample(docs.repartition(7), n_per_source=3).collect()))
    assert a == b


def test_chunking_rejects_gapful_stride(spark):
    import pytest as _pytest

    from bigdata_logs_spark.operators.pipeline import chunk_documents

    docs = spark.createDataFrame(
        [(0, "en", "s", 5, "a b c")],
        "doc_id long, lang string, source string, n_chars int, text string",
    )
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_size=2, stride=3)


def test_ngram_novelty_copy_has_zero_novelty(spark):
    from bigdata_logs_spark.operators.textops import ngram_novelty

    docs = spark.createDataFrame(
        [
            (0, "a b c d e", "en", "s1", 9),
            (1, "a b c d e", "en", "s1", 9),  # verbatim copy of doc 0
            (2, "x y z w", "en", "s2", 7),  # all-new content
            (3, "c d e x y z q", "en", "s2", 13),  # mix: old + new grams
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs, k=3).collect()}
    assert out[0].novel_frac == 1.0
    assert out[1].novel_frac == 0.0  # every gram first seen in doc 0
    assert out[2].novel_frac == 1.0
    # doc 3: grams {c d e, d e x, e x y, x y z, y z q} — 'c d e' is
    # doc 0's, 'x y z' is doc 2's, the 3 bridging grams are novel.
    assert out[3].n_grams == 5
    assert out[3].n_novel == 3
    # short docs (< k tokens) emit no grams and are absent
    assert set(out) == {0, 1, 2, 3}


def test_pair_similarity_histogram_counts_and_plan(spark, sf_dir):
    from bigdata_logs_spark.operators.similarity import (
        pair_similarity_histogram,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    hist = pair_similarity_histogram(emb, n_cells=16)
    # the cell equi-join must not degrade to a cartesian product
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    rows = hist.collect()
    n = emb.count()
    # cosine bins live in [-1, 1] -> bin in [-10, 10]
    assert all(-10 <= r.bin <= 10 for r in rows)
    total_pairs = sum(r.n_pairs for r in rows)
    # sampled pair count: sum over cells of c_i*(c_i-1)/2, strictly
    # fewer than all pairs but non-empty for any non-trivial corpus
    assert 0 < total_pairs < n * (n - 1) // 2


def test_udtf_ngrams_row_identical_to_native_twin(spark, sf_dir):
    from bigdata_logs_spark.operators.textops import (
        _gram_strings,
        ngram_rows_udtf,
        with_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    via_udtf = ngram_rows_udtf(docs, k=3, max_doc_id=50)
    native = (
        with_tokens(docs.filter(F.col("doc_id") < 50))
        .select(
            "doc_id",
            F.posexplode(_gram_strings(3)).alias("pos", "gram"),
        )
    )
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, native.collect())
    )


def test_source_vocab_overlap_hand_checked(spark):
    from bigdata_logs_spark.operators.textops import source_vocab_overlap

    docs = spark.createDataFrame(
        [
            (0, "a b c", "s1", "en", 5),
            (1, "b c d", "s2", "en", 5),
            (2, "x y", "s3", "en", 3),
            (3, "c a b a", "s1", "en", 7),  # repeats must not inflate
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = {(r.source_a, r.source_b): r for r in source_vocab_overlap(docs).collect()}
    # s1 vocab {a,b,c}, s2 {b,c,d}: |∩|=2, |∪|=4
    r = out[("s1", "s2")]
    assert (r.n_a, r.n_b, r.n_common) == (3, 3, 2)
    assert r.vocab_jaccard == 0.5
    # disjoint vocabularies never emit a row (inner join on token)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out
