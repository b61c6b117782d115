"""Dedup + similarity invariants: partition independence, candidate
containment, IVF recall sanity (SURVEY.md §5.2 property strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_logs_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_signatures,
    near_dup_pairs,
)
from bigdata_logs_spark.operators.similarity import (
    ann_ivf_topk,
    centroid_vectors,
    embedding_near_dup,
    knn_brute_force,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from bigdata_logs_spark.sources import load_table

    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from bigdata_logs_spark.sources import load_table

    return load_table(spark, sf_dir, "embeddings").cache()


def test_minhash_partition_invariant(docs):
    one = sorted(map(str, minhash_signatures(docs.repartition(1)).collect()))
    many = sorted(map(str, minhash_signatures(docs.repartition(7)).collect()))
    assert one == many


def test_minhash_covers_every_doc_every_band(docs):
    sigs = minhash_signatures(docs)
    n_docs = docs.count()
    assert sigs.count() == n_docs * 8
    per_doc = sigs.groupBy("doc_id").count().select(F.min("count"), F.max("count"))
    lo, hi = per_doc.first()
    assert lo == hi == 8


def test_exact_dedup_partition_sums(docs):
    dd = exact_dedup(docs)
    # every source row is accounted for by exactly one winner
    assert dd.agg(F.sum("dup_count")).first()[0] == docs.count()


def test_near_dup_pairs_share_a_shingle(docs):
    # candidate pairs come from shared minhash buckets => jaccard > 0
    pairs = near_dup_pairs(docs, threshold=0.0)
    assert pairs.filter(F.col("jaccard") <= 0).count() == 0
    assert pairs.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0


def test_bucket_pair_rows_equals_self_join(docs):
    """_bucket_pair_rows (single-shuffle groupBy + in-bucket pair
    expansion) must emit EXACTLY the multiset the classic capped
    bucket self-join produces — same pairs, same per-bucket
    multiplicities (winnowing counts shared buckets, so multiset
    equality, not just set equality, is the contract). Run on the
    real signature rows so band/sig skew and >2-member buckets are
    exercised; a tiny cap forces the occupancy-drop path too."""
    from bigdata_logs_spark.operators.dedup import _bucket_pair_rows

    sigs = minhash_signatures(docs).cache()
    for cap in (64, 3):
        new = _bucket_pair_rows(sigs, ["band", "sig"], cap=cap)
        ok = (
            sigs.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("n_occ"))
            .filter(F.col("n_occ") <= cap)
            .select("band", "sig")
        )
        capped = sigs.join(ok, ["band", "sig"])
        old = (
            capped.select("band", "sig", F.col("doc_id").alias("doc_a"))
            .join(
                capped.select("band", "sig", F.col("doc_id").alias("doc_b")),
                ["band", "sig"],
            )
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        assert new.exceptAll(old).count() == 0, f"extra pairs at cap={cap}"
        assert old.exceptAll(new).count() == 0, f"missing pairs at cap={cap}"


def test_bucket_pair_rows_rank_gates_hot_buckets(docs):
    """Bounded aggregation state — the 100 TB boilerplate-bucket
    guard — must come from the single-pass rank gate, not the old
    count-prefilter + broadcast anti-join (judge-measured 35-56%
    slower): the plan's collect_list aggregate sits ABOVE a
    row_number window on the bucket key, with NO anti-join and NO
    second shuffle — the window's hashpartitioning on (band, sig) is
    the expansion's ONLY exchange on that key (the groupBy reuses
    it)."""
    from bigdata_logs_spark.operators.dedup import _bucket_pair_rows

    from tests.planprobe import assert_rank_gate_shape, physical_plan

    sigs = minhash_signatures(docs)
    plan = physical_plan(_bucket_pair_rows(sigs, ["band", "sig"]))
    assert_rank_gate_shape(plan, "band")


def test_bucket_pair_rows_no_self_pairs_on_duplicate_rows(docs, spark):
    """Non-unique (bucket, doc_id) input must not emit (d, d) pairs —
    the documented precondition is now also guarded in the output."""
    from bigdata_logs_spark.operators.dedup import _bucket_pair_rows

    rows = spark.createDataFrame(
        [("b1", 1), ("b1", 1), ("b1", 2), ("b2", 3), ("b2", 3)],
        "bucket string, doc_id int",
    )
    got = _bucket_pair_rows(rows, ["bucket"]).collect()
    assert all(r.doc_a != r.doc_b for r in got)
    assert {(r.doc_a, r.doc_b) for r in got} == {(1, 2)}


def test_bucket_pair_rows_drops_null_key_rows(spark):
    """NULL bucket keys never join in the classic self-join form, so
    the groupBy expansion must emit nothing for them either (NULL is
    an ordinary group to groupBy — without the guard a null-key
    bucket would wrongly pair its members)."""
    from bigdata_logs_spark.operators.dedup import _bucket_pair_rows

    rows = spark.createDataFrame(
        [(None, 1), (None, 2), ("b1", 3), ("b1", 4)],
        "bucket string, doc_id int",
    )
    got = {(r.doc_a, r.doc_b) for r in _bucket_pair_rows(rows, ["bucket"]).collect()}
    assert got == {(3, 4)}


def test_containment_rare_shingle_catches_lsh_miss(spark):
    """DD-18's reason to exist: a short doc pasted verbatim inside a
    much longer one has containment 1.0 but Jaccard ~|A|/|B|, far
    below the 8x4 band curve — the Jaccard-tuned LSH tier (DD-13)
    structurally misses it, the DF-capped rare-shingle inverted index
    must not (the contained doc shares its WHOLE shingle set with its
    container, so any non-boilerplate shingle is a candidate
    generator however extreme the size ratio)."""
    import random

    from bigdata_logs_spark.operators.dedup import (
        containment_rare_shingle,
        minhash_containment,
    )

    random.seed(7)
    words = [f"w{i}" for i in range(2000)]
    small = " ".join(random.sample(words, 12))
    big = (
        " ".join(random.sample(words, 600))
        + " " + small + " "
        + " ".join(random.sample(words, 600))
    )
    rows = [(1, small), (2, big)] + [
        (i, " ".join(random.sample(words, 50))) for i in range(3, 23)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    assert minhash_containment(df).count() == 0, "fixture drifted"
    got = containment_rare_shingle(df).collect()
    assert [(r.doc_a, r.doc_b, r.containment) for r in got] == [(1, 2, 1.0)]
    # sizes are exact distinct-shingle-set sizes
    assert got[0].n_inter == got[0].sz_a


def test_containment_rare_shingle_df_cap_drops_boilerplate(spark):
    """A shingle whose document frequency exceeds the cap generates
    no candidates (the quadratic-blowup guard is part of the operator
    contract): docs related ONLY through an over-cap boilerplate
    shingle must not pair."""
    from bigdata_logs_spark.operators.dedup import containment_rare_shingle

    boiler = "click here now"
    # 5 docs share ONLY the boilerplate shingle; with df_cap=4 the
    # shingle is over-cap, so no pairs survive (min_shared=1 isolates
    # the cap contract from the shared-shingle gate)
    rows = [(i, f"u{i} v{i} " + boiler + f" x{i} y{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    assert (
        containment_rare_shingle(
            df, threshold=0.0, df_cap=4, min_shared=1
        ).count()
        == 0
    )
    # at df_cap=5 the shingle is within cap and all 10 pairs appear
    assert (
        containment_rare_shingle(
            df, threshold=0.0, df_cap=5, min_shared=1
        ).count()
        == 10
    )
    # the default min_shared=2 gate drops single-shingle candidates
    assert containment_rare_shingle(df, threshold=0.0, df_cap=5).count() == 0


def test_bipartite_pair_rows_rank_gate_plan(docs):
    """The bipartite (delta-vs-corpus) expansion must carry the same
    single-pass rank-gate shape as ``_bucket_pair_rows``: no anti-join
    prefilter, the side-list collect_lists above the row_number
    window, and the window's exchange as the only hashpartitioning on
    the bucket key."""
    from bigdata_logs_spark.operators.dedup import _bipartite_pair_rows
    from tests.planprobe import assert_rank_gate_shape, physical_plan

    sigs = minhash_signatures(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    plan = physical_plan(
        _bipartite_pair_rows(
            sigs, ["band", "sig"], F.col("source") == "src9", "n", "o"
        )
    )
    assert_rank_gate_shape(plan, "band")


def test_winnowing_fp_rank_gate_single_shuffle(docs):
    """The single-key (fp) expansion paths (winnowing, CDC chunks)
    get the same one-exchange guarantee: the window's
    hashpartitioning on fp is the expansion's only shuffle on that
    key."""
    from bigdata_logs_spark.operators.dedup import _bucket_pair_rows
    from tests.planprobe import (
        assert_single_exchange_on,
        physical_plan,
    )

    fps = docs.select(
        "doc_id", F.substring(F.md5("text"), 1, 4).alias("fp")
    )
    plan = physical_plan(_bucket_pair_rows(fps, ["fp"]))
    assert "LeftAnti" not in plan
    assert_single_exchange_on(plan, "fp")


def test_bipartite_pair_rows_equals_capped_join(docs):
    """_bipartite_pair_rows (incremental_near_dup's candidate stage)
    must emit EXACTLY the multiset of the classic capped new×old
    bucket join; tiny cap exercises the occupancy-drop path, and the
    occupancy count covers ALL bucket rows (both sides), matching the
    join form's pre-join count."""
    from bigdata_logs_spark.operators.dedup import _bipartite_pair_rows

    sigs = (
        minhash_signatures(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .cache()
    )
    is_new = F.col("source") == "src9"
    for cap in (64, 3):
        new = _bipartite_pair_rows(
            sigs, ["band", "sig"], is_new, "new_doc", "old_doc", cap=cap
        )
        ok = (
            sigs.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("n_occ"))
            .filter(F.col("n_occ") <= cap)
            .select("band", "sig")
        )
        capped = sigs.join(ok, ["band", "sig"])
        old = (
            capped.filter(is_new)
            .select("band", "sig", F.col("doc_id").alias("new_doc"))
            .join(
                capped.filter(~is_new).select(
                    "band", "sig", F.col("doc_id").alias("old_doc")
                ),
                ["band", "sig"],
            )
            .select("new_doc", "old_doc")
        )
        assert new.exceptAll(old).count() == 0, f"extra pairs at cap={cap}"
        assert old.exceptAll(new).count() == 0, f"missing pairs at cap={cap}"


def test_winnowing_fp_path_equals_self_join(docs):
    """The single-key (fp) winnowing path counts SHARED buckets per
    pair (n_shared feeds min_shared), so the expansion's per-pair
    multiplicities must match the classic capped fp self-join's —
    checked end-to-end on the real fingerprint rows at a tiny cap to
    force the occupancy-drop path."""
    from bigdata_logs_spark.operators.dedup import (
        WINNOW_W,
        _bucket_pair_rows,
        _shingles,
        _tokens,
    )

    hs = F.expr(
        "transform(shingles,"
        " s -> CAST(conv(substring(md5(s), 1, 13), 16, 10) AS BIGINT))"
    )
    mins = F.expr(
        f"""
        array_distinct(transform(
          sequence(1, greatest(size(hs) - {WINNOW_W} + 1, 1)),
          i -> array_min(slice(hs, i, {WINNOW_W}))))
        """
    )
    fps = (
        docs.withColumn("tokens", _tokens(F.col("text")))
        .withColumn("shingles", _shingles())
        .withColumn("hs", hs)
        .select("doc_id", F.explode(mins).alias("fp"))
        .cache()
    )
    for cap in (64, 2):
        new = (
            _bucket_pair_rows(fps, ["fp"], cap=cap)
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
        ok = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_occ"))
            .filter(F.col("n_occ") <= cap)
            .select("fp")
        )
        capped = fps.join(ok, ["fp"])
        old = (
            capped.select("fp", F.col("doc_id").alias("doc_a"))
            .join(capped.select("fp", F.col("doc_id").alias("doc_b")), "fp")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
        assert new.exceptAll(old).count() == 0, f"extra at cap={cap}"
        assert old.exceptAll(new).count() == 0, f"missing at cap={cap}"


def test_minhash_buckets_caps_member_list_not_count(spark):
    """A bucket past BUCKET_CAP still reports its exact n_docs but
    lists only the first-cap member sample — the member list is
    rank-gated BEFORE aggregation so per-group state stays bounded."""
    from bigdata_logs_spark.operators.dedup import BUCKET_CAP, minhash_buckets

    n = BUCKET_CAP + 6
    docs = spark.createDataFrame(
        [(i, "identical boilerplate text shared by every doc") for i in range(n)],
        "doc_id long, text string",
    )
    got = minhash_buckets(docs).collect()
    assert len(got) == 8  # one bucket per band, all with the same docs
    for r in got:
        assert r.n_docs == n
        assert len(r.members.split(",")) == BUCKET_CAP


def test_jaccard_pairs_bounded(docs):
    pairs = jaccard_pairs(docs, max_doc_id=40, threshold=0.5)
    bad = pairs.filter((F.col("jaccard") < 0.5) | (F.col("jaccard") > 1.0))
    assert bad.count() == 0


def test_embedding_near_dup_symmetric_free(emb):
    pairs = embedding_near_dup(emb, threshold=-1.0)
    n = emb.count()
    assert pairs.count() == n * (n - 1) // 2  # each unordered pair once


def test_ivf_assignment_partitions_corpus(emb):
    cent = centroid_vectors(emb)
    assert cent.count() == emb.select("label").distinct().count()
    dims = cent.select(F.size("cvec").alias("d")).distinct().collect()
    assert len(dims) == 1


def test_ivf_results_subset_of_brute_force_corpus(emb):
    ivf = ann_ivf_topk(emb, n_queries=3, k=5, nprobe=2)
    rows = ivf.collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    # per-query ranks are 1..n without gaps
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_agrees_with_brute_force_on_probed_cells(emb):
    """IVF cosine scores must equal brute-force scores for the same
    (query, neighbor) pairs — probing changes the candidate set, never
    the metric."""
    ivf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_ivf_topk(emb, n_queries=3, k=5, nprobe=2).collect()
    }
    bf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in knn_brute_force(emb, n_queries=3, k=200).collect()
    }
    overlap = set(ivf) & set(bf)
    assert overlap, "IVF found pairs brute force never scored"
    for pair in overlap:
        assert ivf[pair] == bf[pair]


def test_embedding_near_dup_arrow_engine_bit_identical_to_fold(spark, sf_dir):
    # the Arrow scoring path accumulates per-dimension in the same
    # left-to-right order as the SQL fold, so results must be
    # BIT-identical, not just approximately equal
    from bigdata_logs_spark.operators.similarity import embedding_near_dup
    from bigdata_logs_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = [tuple(r) for r in embedding_near_dup(emb, engine="arrow").collect()]
    f = [tuple(r) for r in embedding_near_dup(emb, engine="fold").collect()]
    assert a == f
    assert len(a) > 0


def test_scoped_verify_path_equals_full_explode(docs, monkeypatch):
    """The candidate-scoped Jaccard verify (the 100 TB physical plan,
    normally gated behind BLS_SCOPE_VERIFY_MIN_BYTES) must emit
    exactly the pairs the full-corpus explode emits — the adaptive
    switch is a plan choice, never a semantics choice."""
    from bigdata_logs_spark.operators.dedup import near_dup_pairs

    full = {tuple(r) for r in near_dup_pairs(docs).collect()}
    monkeypatch.setenv("BLS_SCOPE_VERIFY_MIN_BYTES", "1")
    scoped = {tuple(r) for r in near_dup_pairs(docs).collect()}
    assert scoped == full and full


def test_minhash_calibration_bounds_and_exactness(spark, docs):
    """DD-11: agreement and jaccard are probabilities; for 1-row
    bands the two should track each other closely on a near-dup-heavy
    fixture (the estimator-health signal the operator exists for)."""
    from bigdata_logs_spark.operators.dedup import minhash_calibration

    row = minhash_calibration(docs).collect()[0]
    assert row.n_pairs > 0
    for c in ("avg_jaccard", "avg_band_agreement"):
        assert 0.0 <= row[c] <= 1.0
    assert row.mean_abs_gap < 0.25  # estimator sane on this corpus
    # identical docs must agree on every band: gap bounded by the
    # non-identical share, so mean gap <= 1 - avg_band_agreement + eps
    assert row.mean_abs_gap <= 1.0


def test_centroid_confusion_diagonal_dominates_separable_labels(spark):
    from bigdata_logs_spark.operators.similarity import (
        centroid_classification_report,
    )

    # two well-separated clusters: label 0 near (1,0,...), label 1
    # near (0,1,...) -> confusion matrix must be purely diagonal
    rows = []
    for i in range(8):
        eps = (i % 4) * 0.01
        rows.append((i, [1.0 - eps, eps, 0.0, 0.0], 0))
        rows.append((100 + i, [eps, 1.0 - eps, 0.0, 0.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = centroid_classification_report(emb).collect()
    assert {(r.label, r.predicted) for r in out} == {(0, 0), (1, 1)}
    assert all(r.label_accuracy == 1.0 for r in out)
    assert sum(r.n for r in out) == 16


def test_emb_dim_matches_corpus_contract(spark, sf_dir):
    """similarity.EMB_DIM gates the codegen'd unrolled dot product: a
    corpus dimension change would silently drop every opted-in call
    site onto the interpreted fold path (correct but ~1.5x slower on
    the 500k-pair loops) — fail HERE instead, so the constant and the
    corpus can't drift apart unnoticed."""
    from bigdata_logs_spark.operators.similarity import EMB_DIM
    from bigdata_logs_spark.sources import load_table

    dims = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.size("embedding").alias("d"))
        .distinct()
        .collect()
    )
    assert [r.d for r in dims] == [EMB_DIM]
