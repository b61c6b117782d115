"""Spark-side invariants for the round-5 batch of extension operators
(TextRank G-1, Count-Min Sketch SK-1, Heaps curve T-16, product
quantization E-13/E-14, curriculum PL-14). The oracle gate covers
cross-engine value parity; these pin the semantic properties the
hash compare can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_logs_spark.operators.graph import (
    SCALE,
    textrank_keywords,
    token_adjacency_edges,
)
from bigdata_logs_spark.operators.pipeline import curriculum_phases
from bigdata_logs_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    pq_codes,
    pq_distortion,
)
from bigdata_logs_spark.operators.sketches import cms_heavy_hitters
from bigdata_logs_spark.operators.textops import vocab_growth, with_tokens
from bigdata_logs_spark.sources import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_adjacency_edges_are_symmetric(spark, sf_dir):
    edges = token_adjacency_edges(_docs(spark, sf_dir))
    flipped = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
    )
    assert edges.exceptAll(flipped).count() == 0


def test_textrank_ranks_positive_and_ordered(spark, sf_dir):
    top = textrank_keywords(_docs(spark, sf_dir), top_n=10).collect()
    assert 0 < len(top) <= 10
    ranks = [r.rank_scaled for r in top]
    assert ranks == sorted(ranks, reverse=True)
    # damped PageRank keeps every rank >= the teleport base
    assert all(r >= 150_000 for r in ranks)
    # a hub token must beat uniform; uniform init is SCALE
    assert ranks[0] > SCALE


def test_cms_never_underestimates(spark, sf_dir):
    rep = cms_heavy_hitters(_docs(spark, sf_dir)).collect()
    assert len(rep) > 0
    for r in rep:
        # the CMS one-sided error guarantee
        assert r.cms_estimate >= r.exact_count
        assert r.overestimate == r.cms_estimate - r.exact_count
    # deterministic ceiling: no counter can exceed the stream mass
    # (the classical e*N/w bound is probabilistic and doesn't apply to
    # this fixture's 31-token vocabulary, where the only collisions
    # are heavy-with-heavy)
    total = (
        with_tokens(_docs(spark, sf_dir))
        .agg(F.sum(F.size("tokens")))
        .collect()[0][0]
    )
    assert all(r.cms_estimate <= total for r in rep)
    # with 31 keys in 128 buckets most rows are collision-free, so the
    # majority of top tokens must be estimated exactly (fixture-pinned)
    assert sum(1 for r in rep if r.overestimate == 0) >= len(rep) // 2


def test_vocab_growth_monotone_and_consistent(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    curve = vocab_growth(docs).collect()
    assert curve, "curve must be non-empty"
    for a, b in zip(curve, curve[1:]):
        assert a.docs_seen < b.docs_seen
        assert a.total_tokens <= b.total_tokens
        assert a.vocab_size <= b.vocab_size
    final = curve[-1]
    toks = with_tokens(docs)
    assert final.docs_seen == docs.count()
    assert (
        final.total_tokens
        == toks.agg(F.sum(F.size("tokens"))).collect()[0][0]
    )
    assert (
        final.vocab_size
        == toks.select(F.explode("tokens")).distinct().count()
    )


def test_pq_codes_shape_and_range(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    codes = pq_codes(emb)
    assert codes.count() == emb.count()
    bounds = codes.agg(
        *[F.min(f"code_{s}").alias(f"lo{s}") for s in range(PQ_M)],
        *[F.max(f"code_{s}").alias(f"hi{s}") for s in range(PQ_M)],
    ).collect()[0]
    for s in range(PQ_M):
        assert bounds[f"lo{s}"] >= 0
        assert bounds[f"hi{s}"] < PQ_K


def test_pq_seed_vectors_encode_to_themselves(spark, sf_dir):
    """Each seed vector's distortion to its own codebook entry is 0,
    so every seed must self-assign (distance 0 is the unique min
    barring duplicate seeds)."""
    emb = _emb(spark, sf_dir)
    seeds = emb.orderBy("vec_id").limit(PQ_K)
    coded = pq_codes(emb).join(seeds.select("vec_id"), "vec_id")
    rows = coded.orderBy("vec_id").collect()
    assert len(rows) == PQ_K
    for i, r in enumerate(rows):
        for s in range(PQ_M):
            assert r[f"code_{s}"] == i


def test_pq_distortion_counts_cover_corpus(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    rep = pq_distortion(emb)
    n = emb.count()
    per_sub = rep.groupBy("subspace").agg(F.sum("n_vecs").alias("n")).collect()
    assert len(per_sub) == PQ_M
    assert all(r.n == n for r in per_sub)
    assert rep.where(F.col("mean_sq_dist") < 0).count() == 0


def test_curriculum_phases_partition_and_order(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    cur = curriculum_phases(docs)
    assert cur.count() == docs.count()
    # phases are a partition: every doc exactly once, ranks contiguous
    sizes = {r.phase: r.n for r in
             cur.groupBy("phase").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # NTILE balance
    ranks = cur.groupBy("phase").agg(
        F.min("phase_rank").alias("lo"), F.max("phase_rank").alias("hi")
    ).collect()
    for r in ranks:
        assert r.lo == 1 and r.hi == sizes[r.phase]
    # easy-first: every doc in phase p is no longer than any in p+1
    stats = {r.phase: (r.lo, r.hi) for r in cur.groupBy("phase").agg(
        F.min("n_tokens").alias("lo"), F.max("n_tokens").alias("hi")
    ).collect()}
    for p in (1, 2, 3):
        assert stats[p][1] <= stats[p + 1][0] + 1  # NTILE may split a tie


def test_kmv_small_range_rule_and_bounds(spark, sf_dir):
    from bigdata_logs_spark.operators.sketches import KMV_K, kmv_distinct
    from bigdata_logs_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    rep = kmv_distinct(ev).collect()
    assert len(rep) > 0
    for r in rep:
        assert r.kmv_estimate > 0
        if r.n_exact < KMV_K:
            # small-range rule: sketch holds every distinct hash, so
            # the estimate IS the exact count
            assert r.kmv_estimate == float(r.n_exact)
        else:
            # KMV's relative standard error is ~1/sqrt(k-2) (~27% at
            # k=16); 4 sigma is a safe deterministic-fixture envelope
            assert abs(r.rel_error) < 4 / (KMV_K - 2) ** 0.5


def test_zipf_slope_negative_and_bounded(spark, sf_dir):
    from bigdata_logs_spark.operators.textops import zipf_fit
    from bigdata_logs_spark.sources import load_table

    rep = zipf_fit(load_table(spark, sf_dir, "documents")).collect()
    assert len(rep) > 0
    for r in rep:
        # frequency is non-increasing in rank, so the OLS slope of
        # ln(freq) on ln(rank) cannot be positive
        assert r.zipf_slope <= 0
        assert r.n_terms > 2


def test_pq_adc_query_is_its_own_nearest_neighbor(spark, sf_dir):
    from bigdata_logs_spark.operators.similarity import pq_adc_topk
    from bigdata_logs_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    top = pq_adc_topk(emb).collect()
    assert len(top) == 10
    qid = emb.agg(F.min("vec_id")).collect()[0][0]
    # the query is a seed, so it encodes to itself and its ADC
    # distance is exactly 0 -> it must rank first
    assert top[0].vec_id == qid
    assert top[0].adc_sq_dist == 0.0
    dists = [r.adc_sq_dist for r in top]
    assert dists == sorted(dists)


def test_account_clusters_partition_well_formed(spark, sf_dir):
    from bigdata_logs_spark.operators.graph import account_clusters
    from bigdata_logs_spark.operators.parse import (
        FAILED_AUTH_EVENTS,
        parse_ssh_lines,
    )
    from bigdata_logs_spark.operators.ssh_synth import synthesize_ssh_lines
    from bigdata_logs_spark.sources import load_table

    parsed = parse_ssh_lines(
        synthesize_ssh_lines(load_table(spark, sf_dir, "events"))
    )
    clusters = {r.user: r.cluster for r in account_clusters(parsed).collect()}
    assert clusters
    # representative closure: every cluster label is itself a user
    # whose own label is itself
    for u, c in clusters.items():
        assert c in clusters and clusters[c] == c
        assert c <= u  # representative is the min username
    # soundness: two users sharing an IP must land in the same cluster
    edges = (
        parsed.where(
            F.col("event").isin(*FAILED_AUTH_EVENTS)
            & F.col("user").isNotNull()
            & F.col("ip").isNotNull()
        )
        .select("user", "ip")
        .distinct()
        .collect()
    )
    by_ip: dict = {}
    for r in edges:
        by_ip.setdefault(r.ip, []).append(r.user)
    for users in by_ip.values():
        labels = {clusters[u] for u in users}
        assert len(labels) == 1, f"IP-sharing users split: {users}"


def test_truncation_fidelity_monotone_in_dim(spark, sf_dir):
    from bigdata_logs_spark.operators.similarity import truncation_fidelity
    from bigdata_logs_spark.sources import load_table

    rep = truncation_fidelity(load_table(spark, sf_dir, "embeddings")).collect()
    assert [r.trunc_dim for r in rep] == [8, 16, 32]
    for r in rep:
        assert 0 < r.min_cos <= r.mean_cos <= 1.0 + 1e-9
    # keeping more dimensions can only preserve more energy
    for a, b in zip(rep, rep[1:]):
        assert a.mean_cos <= b.mean_cos + 1e-9
        assert a.min_cos <= b.min_cos + 1e-9


def test_python_datasource_plans_splits_and_is_deterministic(spark):
    """U-6: the custom source must honor its splits option (one task
    per planned id-range) and produce a split-count-independent row
    set."""
    from bigdata_logs_spark.sources.pygen import (
        register_sshlog_gen,
        synth_line,
    )

    register_sshlog_gen(spark)

    def rows(splits):
        return (
            spark.read.format("sshlog_gen")
            .option("rows", 500)
            .option("splits", splits)
            .load()
        )

    assert rows(8).rdd.getNumPartitions() == 8
    assert rows(3).rdd.getNumPartitions() == 3
    a = sorted(map(str, rows(8).collect()))
    b = sorted(map(str, rows(3).collect()))
    assert a == b and len(a) == 500
    # spot-check the generator contract against the pure function
    got = {r.id: r.value for r in rows(8).collect()}
    for i in (0, 1, 2, 3, 499):
        assert got[i] == synth_line(i)


def test_quality_survivors_one_keeper_per_component_max_content(spark, sf_dir):
    from bigdata_logs_spark.operators.dedup import quality_dedup_survivors

    docs = _docs(spark, sf_dir)
    rep = quality_dedup_survivors(docs)
    assert rep.count() == docs.count()
    per = rep.groupBy("component").agg(
        F.sum(F.col("keep").cast("int")).alias("keepers"),
        F.count("*").alias("n"),
    )
    assert per.where(F.col("keepers") != 1).count() == 0
    # the keeper has the component's max n_chars
    sized = rep.join(docs.select("doc_id", "n_chars"), "doc_id")
    comp_max = sized.groupBy("component").agg(F.max("n_chars").alias("mx"))
    kept = sized.where("keep").join(comp_max, "component")
    assert kept.where(F.col("n_chars") != F.col("mx")).count() == 0


def test_token_graph_degree_buckets_are_powers_of_two_and_cover(spark, sf_dir):
    from bigdata_logs_spark.operators.graph import (
        token_adjacency_edges,
        token_graph_degrees,
    )

    docs = _docs(spark, sf_dir)
    rep = token_graph_degrees(docs).collect()
    assert rep
    for r in rep:
        assert r.degree_bucket & (r.degree_bucket - 1) == 0  # power of two
    n_nodes = (
        token_adjacency_edges(docs).select("src").distinct().count()
    )
    assert sum(r.n_nodes for r in rep) == n_nodes


def test_observed_metrics_match_direct_aggregation(spark, sf_dir, tmp_path):
    from bigdata_logs_spark.sources import load_table
    from bigdata_logs_spark.sources.io import observed_write

    ev = load_table(spark, sf_dir, "events")
    got = observed_write(
        ev,
        str(tmp_path / "obs_store"),
        {
            "n_rows": F.count(F.lit(1)),
            "max_event_id": F.max("event_id"),
        },
    )
    direct = ev.agg(
        F.count(F.lit(1)).alias("n"), F.max("event_id").alias("m")
    ).collect()[0]
    assert got["n_rows"] == direct.n
    assert got["max_event_id"] == direct.m
    # the sink actually landed every observed row
    assert spark.read.parquet(str(tmp_path / "obs_store")).count() == direct.n


def test_propagation_raises_instead_of_splitting_components(spark):
    """iterate.propagate_min_labels must refuse to return unconverged
    labels: a 6-node path graph needs ~5 rounds for the min label to
    reach the far end, so max_iter=2 raises while max_iter=10
    converges to one component."""
    import pytest

    from bigdata_logs_spark.operators.iterate import propagate_min_labels

    chain = [(i, i + 1) for i in range(5)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "a long, b long"
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )

    def step(cur):
        return (
            edges.join(cur.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_min"))
            .withColumnRenamed("a", "node")
        )

    done = propagate_min_labels(labels, step, "node", "lbl", max_iter=10)
    assert {r.lbl for r in done.collect()} == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        propagate_min_labels(labels, step, "node", "lbl", max_iter=2)


def test_cdc_catches_copied_paragraph_where_global_jaccard_is_low(spark):
    """DD-12 semantics on a hand-built fixture: two long documents
    share one verbatim 40-token paragraph inside ~200 tokens of
    otherwise-disjoint text (global 3-shingle Jaccard ~0.1, below any
    near-dup threshold). CDC chunking must still pair them; two
    fully-disjoint docs must not pair."""
    from bigdata_logs_spark.operators.dedup import cdc_shared_chunks

    import random

    rng = random.Random(7)

    def words(prefix, n):
        return " ".join(f"{prefix}{rng.randint(0, 999)}" for _ in range(n))

    para = " ".join(f"shared{i}" for i in range(40))
    doc_a = words("aa", 100) + " " + para + " " + words("ab", 100)
    doc_b = words("ba", 100) + " " + para + " " + words("bb", 100)
    doc_c = words("ca", 240)
    docs = spark.createDataFrame(
        [
            (1, doc_a, "en", "s", len(doc_a)),
            (2, doc_b, "en", "s", len(doc_b)),
            (3, doc_c, "en", "s", len(doc_c)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = {(r.doc_a, r.doc_b): r.n_shared_chunks
             for r in cdc_shared_chunks(docs).collect()}
    assert (1, 2) in pairs, "shared paragraph must produce shared chunks"
    assert all(3 not in p for p in pairs), "disjoint doc must not pair"


def test_nprobe_sweep_recall_monotone_and_saturating(spark, sf_dir):
    """E-17: probing more cells can only find more true neighbors, and
    probing every cell (nprobe >= n_cells) must reach recall 1.0."""
    from bigdata_logs_spark.operators.similarity import ivf_nprobe_sweep
    from bigdata_logs_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_cells = emb.select("label").distinct().count()
    rep = ivf_nprobe_sweep(emb, probes=(1, 2, n_cells)).collect()
    recalls = [r.mean_recall for r in rep]
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0


def test_char_entropy_bounds_and_known_values(spark):
    """T-20 on hand-built fixtures: uniform text hits ln(alphabet),
    constant text is exactly 0, and every score is within
    [0, ln(n_distinct_chars)]."""
    import math

    from bigdata_logs_spark.operators.textops import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaa", "en", "s", 4),       # constant -> 0
            (2, "abcd", "en", "s", 4),       # uniform over 4 -> ln 4
            (3, "aab", "en", "s", 3),        # 2/3,1/3 mix
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert got[1].char_entropy == 0.0
    assert abs(got[2].char_entropy - round(math.log(4), 6)) < 1e-9
    want3 = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert abs(got[3].char_entropy - round(want3, 6)) < 1e-6
    for r in got.values():
        assert 0.0 <= r.char_entropy <= math.log(r.n_chars_total) + 1e-9
