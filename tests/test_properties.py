"""Property-based tests (SURVEY.md §5.2): the parser totals always
account for every input line and never throw, on adversarial
generated syslog; aggregates are invariant to row order and
partitioning. Each hypothesis example is a whole batch of lines so
one Spark job covers it."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from bigdata_logs_spark.operators.parse import MASTER_RE, parse_ssh_lines

MONTHS = ["Jan", "Feb", "Mar", "Jun", "Dec"]
MESSAGES = [
    "Invalid user {w} from 192.0.2.{n}",
    "Failed password for {w} from 10.0.0.{n} port {p} ssh2",
    "pam_unix(sshd:auth): authentication failure; logname= uid={n} "
    "euid=0 tty=ssh ruser= rhost=198.51.100.{n}",
    "Connection closed by 172.16.0.{n} [preauth]",
    "Received disconnect from 10.1.{n}.{n}: 11: Bye Bye",
    "Did not receive identification string from 203.0.113.{n}",
    "{w}",  # arbitrary junk message
]

words = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=10
)


@st.composite
def syslog_line(draw):
    shape = draw(st.integers(0, len(MESSAGES)))
    if shape == len(MESSAGES):
        # totally arbitrary printable line (must be dropped, not crash)
        return draw(
            st.text(
                alphabet=st.characters(
                    codec="ascii", exclude_categories=("Cc", "Cs")
                ),
                max_size=80,
            )
        )
    msg = MESSAGES[shape].format(
        w=draw(words), n=draw(st.integers(0, 255)), p=draw(st.integers(1, 65535))
    )
    return (
        f"{draw(st.sampled_from(MONTHS))} {draw(st.integers(1, 31))} "
        f"{draw(st.integers(0, 23)):02d}:{draw(st.integers(0, 59)):02d}:"
        f"{draw(st.integers(0, 59)):02d} host{draw(st.integers(0, 9))} "
        f"sshd[{draw(st.integers(1, 99999))}]: {msg}"
    )


SCHEMA = StructType([StructField("value", StringType())])


@given(st.lists(syslog_line(), min_size=1, max_size=60))
@settings(max_examples=12, deadline=None)
def test_parser_never_throws_and_accounts_for_every_line(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], SCHEMA)
    parsed = parse_ssh_lines(df)
    n_parsed = parsed.count()
    n_match = df.filter(F.col("value").rlike(MASTER_RE)).count()
    assert n_parsed == n_match  # parse-or-drop, nothing else
    # every parsed row keeps the non-null master fields
    assert parsed.filter(F.col("month").isNull() | F.col("message").isNull()).count() == 0
    # the event classifier is total: no nulls, unknown shapes -> other
    assert parsed.filter(F.col("event").isNull()).count() == 0


def test_profile_invariant_under_partitioning(spark, events):
    from bigdata_logs_spark.operators.dashboard import entity_profile

    base = sorted(map(str, entity_profile(events.repartition(1)).collect()))
    for k in (3, 16):
        alt = sorted(map(str, entity_profile(events.repartition(k)).collect()))
        assert alt == base


def test_profile_invariant_under_row_order(spark, events):
    from bigdata_logs_spark.operators.dashboard import entity_profile

    shuffled = events.orderBy(F.rand(seed=7))
    a = sorted(map(str, entity_profile(events).collect()))
    b = sorted(map(str, entity_profile(shuffled).collect()))
    assert a == b


doc_texts = st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=40), min_size=1, max_size=30
)


@given(doc_texts)
@settings(max_examples=10, deadline=None)
def test_repetition_scores_match_python_reference(spark, texts):
    from bigdata_logs_spark.operators.textops import repetition_scores

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in repetition_scores(docs).collect()}
    for i, t in enumerate(texts):
        toks = t.strip().split() if t.strip() else []
        r = got[i]
        assert r.n_tokens == len(toks)
        if toks:
            from collections import Counter

            top = Counter(toks).most_common(1)[0][1]
            assert abs(r.top_token_share - round(top / len(toks), 4)) < 1e-9
        else:
            assert r.top_token_share == 0.0
        bigrams = [f"{toks[j]} {toks[j+1]}" for j in range(len(toks) - 1)]
        if bigrams:
            want = round(1.0 - len(set(bigrams)) / len(bigrams), 4)
            assert abs(r.dup_bigram_ratio - want) < 1e-9
        else:
            assert r.dup_bigram_ratio == 0.0


@given(
    st.lists(st.integers(0, 400), min_size=1, max_size=60),
    st.integers(64, 512),
)
@settings(max_examples=8, deadline=None)
def test_packing_matches_python_concat_chunk_reference(spark, sizes, budget):
    from bigdata_logs_spark.operators.pipeline import (
        hash_bucket,
        pack_token_budget,
    )

    # one-token-per-unit docs so n_tokens == sizes[i]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * s), "en", "s", s) for i, s in enumerate(sizes)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.shard, r.bin): (r.n_docs, r.bin_tokens)
        for r in pack_token_budget(docs, budget=budget, n_shards=4).collect()
    }
    # python reference: same shard hash, concat-and-chunk prefix-sum
    # binning (a doc belongs to the window its first token falls in)
    shard_of = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", hash_bucket(F.col("doc_id"), "pack:", 4).alias("s")
        ).collect()
    }
    from collections import defaultdict

    want = defaultdict(lambda: [0, 0])
    running = defaultdict(int)
    for i in sorted(range(len(sizes))):
        s = shard_of[i]
        b = running[s] // budget
        want[(s, b)][0] += 1
        want[(s, b)][1] += sizes[i]
        running[s] += sizes[i]
    assert got == {k: tuple(v) for k, v in want.items()}


# ---------------------------------------------------------------------------
# Round-4 operators: chunking coverage and kmeans assignment totals on
# generated corpora (one Spark job per hypothesis example).
# ---------------------------------------------------------------------------

docs_schema = "doc_id long, lang string, source string, n_chars int, text string"


@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=60), min_size=1, max_size=12
    ),
    st.integers(2, 6),
    st.data(),
)
@settings(max_examples=12, deadline=None)
def test_chunking_total_coverage_property(spark, texts, chunk_size, data):
    stride = data.draw(st.integers(1, chunk_size))
    """Every token of every doc appears in >= 1 chunk; chunk count per
    doc is exactly len(starts) = ceil(n_tokens / stride) bounded; no
    chunk exceeds chunk_size tokens."""
    from bigdata_logs_spark.operators.pipeline import chunk_documents

    rows = [(i, "en", "s", len(t), t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, docs_schema)
    out = chunk_documents(docs, chunk_size=chunk_size, stride=stride).collect()
    toks = {
        i: ([] if t.strip() == "" else t.strip().split())
        for i, t in enumerate(texts)
    }
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert 1 <= r["n_tokens"] <= chunk_size
    for i, tk in toks.items():
        n = len(tk)
        if n == 0:
            assert i not in by_doc
            continue
        got = by_doc[i]
        expected_chunks = (n + stride - 1) // stride
        assert len(got) == expected_chunks
        # coverage: union of [start, start+size) spans every index
        covered = set()
        for r in sorted(got, key=lambda r: r["chunk_no"]):
            start = r["chunk_no"] * stride
            covered.update(range(start, min(start + chunk_size, n)))
        assert covered == set(range(n))


@given(st.integers(2, 6))
@settings(max_examples=6, deadline=None)
def test_kmeans_partition_of_corpus_property(spark, k):
    """Cluster sizes sum to the corpus size; every cluster id is in
    [0, k); per-dimension rows agree on n_vecs within a cluster."""
    from bigdata_logs_spark.operators.similarity import kmeans_update
    from bigdata_logs_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = kmeans_update(emb, k=k).collect()
    n_corpus = emb.count()
    by_cluster: dict[int, set] = {}
    for r in out:
        assert 0 <= r["cluster"] < k
        by_cluster.setdefault(r["cluster"], set()).add(r["n_vecs"])
    assert all(len(s) == 1 for s in by_cluster.values())
    assert sum(next(iter(s)) for s in by_cluster.values()) == n_corpus


@given(
    st.lists(
        st.tuples(words, st.integers(0, 500), st.integers(0, 500)),
        min_size=2,
        max_size=8,
        unique_by=lambda t: t[0],
    ).filter(lambda rows: sum(r[1] for r in rows) > 0 and sum(r[2] for r in rows) > 0)
)
@settings(max_examples=8, deadline=None)
def test_chi2_statistic_invariant_and_matches_scipy_free_reference(spark, rows):
    """chi2_drift_report: the total statistic must match a pure-Python
    reference on any contingency table and be invariant to row order
    and partitioning (sums/window over a k-row table)."""
    from bigdata_logs_spark.operators.anomaly import chi2_drift_report

    df = spark.createDataFrame(rows, "k string, n_first long, n_second long")
    out = chi2_drift_report(df, key_col="k").collect()
    flipped = chi2_drift_report(
        spark.createDataFrame(list(reversed(rows)), "k string, n_first long, n_second long")
        .repartition(3),
        key_col="k",
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, flipped))

    ta = sum(r[1] for r in rows)
    tb = sum(r[2] for r in rows)
    want = 0.0
    for _, n1, n2 in rows:
        e1 = ta * (n1 + n2) / (ta + tb)
        e2 = tb * (n1 + n2) / (ta + tb)
        if e1 > 0:
            want += (n1 - e1) ** 2 / e1
        if e2 > 0:
            want += (n2 - e2) ** 2 / e2
    got = sum(r.chi2_contrib for r in out)
    assert abs(got - want) < 1e-4


@given(st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=6))
@settings(max_examples=8, deadline=None)
def test_random_projection_is_linear_property(spark, seeds):
    """E-10 linearity: proj(a) + proj(b) == proj(a + b) exactly, for
    integer-valued embeddings (quantization is identity on integers,
    and the fold is pure integer arithmetic)."""
    import numpy as np

    from bigdata_logs_spark.operators.similarity import random_projection

    rng = np.random.RandomState(seeds[0] % (2**31))
    a = rng.randint(-50, 50, size=8).astype("float64")
    b = rng.randint(-50, 50, size=8).astype("float64")
    emb = spark.createDataFrame(
        [
            (0, [float(x) for x in a], 0),
            (1, [float(x) for x in b], 0),
            (2, [float(x) for x in (a + b)], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.vec_id: r for r in random_projection(emb, d_out=4).collect()}
    for j in range(1, 5):
        assert (
            out[0][f"proj_{j}"] + out[1][f"proj_{j}"] == out[2][f"proj_{j}"]
        )


def test_round5_ops_invariant_under_partitioning(spark, events, sf_dir):
    """The new round-5 operators must produce identical results for
    any input partitioning — the property that makes them safe at
    cluster scale, where partition counts are never what they were in
    the test environment."""
    from bigdata_logs_spark.operators.analytics import (
        daily_value_rank,
        user_activity_deciles,
    )
    from bigdata_logs_spark.operators.anomaly import rare_transitions
    from bigdata_logs_spark.operators.similarity import (
        pair_similarity_histogram,
    )
    from bigdata_logs_spark.operators.textops import (
        ngram_novelty,
        source_vocab_overlap,
    )
    from bigdata_logs_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cases = [
        (rare_transitions, events),
        (user_activity_deciles, events),
        (daily_value_rank, events),
        (ngram_novelty, docs),
        (source_vocab_overlap, docs),
        (pair_similarity_histogram, emb),
    ]
    for fn, df in cases:
        base = sorted(map(str, fn(df.repartition(1)).collect()))
        alt = sorted(map(str, fn(df.repartition(13)).collect()))
        assert alt == base, fn.__name__


def test_new_batch_ops_invariant_under_partitioning(spark, sf_dir):
    """Partition-invariance for the TextRank/CMS/Heaps/PQ/curriculum
    batch: fixed-point integer ranks, explicit-arithmetic hashes, and
    tie-broken argmins must not depend on how the input was split."""
    from bigdata_logs_spark.operators.graph import textrank_keywords
    from bigdata_logs_spark.operators.pipeline import curriculum_phases
    from bigdata_logs_spark.operators.similarity import (
        pq_codes,
        pq_distortion,
    )
    from bigdata_logs_spark.operators.similarity import (
        pq_adc_topk,
        truncation_fidelity,
    )
    from bigdata_logs_spark.operators.sketches import (
        cms_heavy_hitters,
        kmv_distinct,
    )
    from bigdata_logs_spark.operators.textops import vocab_growth, zipf_fit
    from bigdata_logs_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    ev = load_table(spark, sf_dir, "events")
    cases = [
        (textrank_keywords, docs),
        (cms_heavy_hitters, docs),
        (vocab_growth, docs),
        (pq_codes, emb),
        (pq_distortion, emb),
        (curriculum_phases, docs),
        (zipf_fit, docs),
        (kmv_distinct, ev),
        (pq_adc_topk, emb),
        (truncation_fidelity, emb),
    ]
    for fn, df in cases:
        base = sorted(map(str, fn(df.repartition(1)).collect()))
        alt = sorted(map(str, fn(df.repartition(13)).collect()))
        assert alt == base, fn.__name__


@given(
    st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=60),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=8, deadline=None)
def test_cdc_chunking_matches_python_reference(spark, texts):
    """DD-12's boundary/chunk/pair semantics re-derived in pure
    Python (hashlib md5, same 4-gram/mod-8 rule) must agree with the
    Spark implementation on arbitrary corpora."""
    import hashlib
    from collections import defaultdict

    from bigdata_logs_spark.operators.dedup import (
        CDC_GRAM,
        CDC_MOD,
        CDC_OCCUPANCY_CAP,
        cdc_shared_chunks,
    )

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.doc_a, r.doc_b): r.n_shared_chunks
        for r in cdc_shared_chunks(docs).collect()
    }

    def chunks(text):
        toks = text.strip().split() if text.strip() else []
        out, cur = [], []
        for i, t in enumerate(toks):
            if cur and i + CDC_GRAM - 1 < len(toks):
                gram = " ".join(toks[i : i + CDC_GRAM])
                h = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
                if h % CDC_MOD == 0:
                    out.append(" ".join(cur))
                    cur = []
            cur.append(t)
        if cur:
            out.append(" ".join(cur))
        return {hashlib.md5(c.encode()).hexdigest() for c in out}

    fps = {i: chunks(t) for i, t in enumerate(texts)}
    occupancy = defaultdict(set)
    for i, s in fps.items():
        for fp in s:
            occupancy[fp].add(i)
    want = defaultdict(int)
    for fp, members in occupancy.items():
        if 2 <= len(members) <= CDC_OCCUPANCY_CAP:
            ms = sorted(members)
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    want[(ms[x], ms[y])] += 1
    want = {k: v for k, v in want.items() if v >= 2}
    assert got == want


budget_sources = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2", "s3", "s4"]),
        st.integers(1, 30),
    ),
    min_size=2,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(budget_sources)
@settings(max_examples=10, deadline=None)
def test_budget_allocation_sums_exactly_and_is_quota_fair(spark, srcs):
    """PL-18 largest-remainder properties on arbitrary source mixes:
    budgets sum EXACTLY to the global budget, and every source's
    integer budget is within 1 token of its real-valued quota (the
    Hamilton-method fairness bound)."""
    from pyspark.sql import Row

    from bigdata_logs_spark.operators.pipeline import token_budget_allocation

    rows = [
        Row(
            doc_id=i * 100 + j,
            lang="en",
            source=s,
            n_chars=5,
            text=" ".join(f"t{k}" for k in range(n)),
        )
        for i, (s, n) in enumerate(srcs)
        for j in range(2)
    ]
    out = token_budget_allocation(spark.createDataFrame(rows)).collect()
    assert sum(r.token_budget for r in out) == 100_000
    denom = sum(r.w_micro for r in out)
    for r in out:
        quota = 100_000 * r.w_micro / denom
        assert quota - 1 < r.token_budget < quota + 1, (r.source, quota)


shared_run_docs = st.tuples(
    st.lists(st.sampled_from("abcdef"), min_size=6, max_size=12),
    st.integers(0, 8),
    st.integers(0, 8),
)


@given(shared_run_docs)
@settings(max_examples=10, deadline=None)
def test_winnowing_guarantee_catches_any_shared_run(spark, case):
    """DD-14 winnowing guarantee on generated fixtures: two documents
    sharing a verbatim run of >= w + k - 1 = 6 tokens ALWAYS share at
    least one selected fingerprint — the paper's detection guarantee,
    which must hold for every run content and every amount of
    distinct surrounding text."""
    from pyspark.sql import Row

    from bigdata_logs_spark.operators.dedup import winnowing_overlap

    run_letters, pre, post = case
    run = " ".join(f"r{c}{i}" for i, c in enumerate(run_letters))
    d0 = " ".join(f"p{i}x p{i}y" for i in range(pre)) + " " + run
    d1 = run + " " + " ".join(f"q{i}x q{i}y" for i in range(post))
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, lang="en", source="t", n_chars=len(t), text=t.strip())
            for i, t in enumerate([d0, d1])
        ]
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in winnowing_overlap(docs, min_shared=1).collect()
    }
    assert (0, 1) in pairs


kmv_id_sets = st.tuples(
    st.sets(st.integers(1, 3000), min_size=1, max_size=120),
    st.sets(st.integers(1, 3000), min_size=1, max_size=120),
)


@given(kmv_id_sets)
@settings(max_examples=8, deadline=None)
def test_kmv_set_ops_matches_python_replay(spark, sets):
    """SK-3 is explicit md5 order statistics, so a pure-Python replay
    of the sketch must reproduce the Spark estimates EXACTLY — union
    and intersection, small-range rule included."""
    import hashlib

    from pyspark.sql import Row

    from bigdata_logs_spark.operators.sketches import KMV_K, kmv_set_ops

    a_ids, b_ids = sets
    rows = [
        Row(event_id=i, user_id=u, event_type="click")
        for i, u in enumerate(sorted(a_ids))
    ] + [
        Row(event_id=10_000 + i, user_id=u, event_type="purchase")
        for i, u in enumerate(sorted(b_ids))
    ]
    got = kmv_set_ops(spark.createDataFrame(rows)).collect()[0]

    def h(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16)

    flags = {h(u): [u in a_ids, u in b_ids] for u in a_ids | b_ids}
    top = sorted(flags)[:KMV_K]
    n_both = sum(1 for hh in top if flags[hh][0] and flags[hh][1])
    if len(flags) < KMV_K:
        union_est = float(len(top))
    else:
        union_est = round((KMV_K - 1) * float(1 << 52) / top[-1], 4)
    assert got.n_union_exact == len(flags)
    assert got.kmv_union == union_est
    assert got.kmv_intersection == round(n_both * union_est / KMV_K, 4)


def test_dashboard_render_all_invariant_under_partitioning(spark, events):
    """D-53 unions ten panels off a shared cache — every panel value
    must be independent of the input's physical partitioning (the
    decimal-accumulation / exact-integer disciplines compose through
    the melt)."""
    from bigdata_logs_spark.caching import release_caches
    from bigdata_logs_spark.operators.dashboard import dashboard_render_all

    def run(df):
        out = sorted(map(str, dashboard_render_all(df).collect()))
        release_caches()
        spark.catalog.clearCache()
        return out

    base = run(events.repartition(1))
    assert run(events.repartition(7)) == base


def test_semantic_dedup_invariant_under_partitioning_and_row_order(
    spark, sf_dir
):
    """DD-15's component labels and keep decisions must not depend on
    physical layout: the propagation loop, centroid means, and the
    window tie-breaks are all order-free by construction."""
    from pyspark.sql import functions as F

    from bigdata_logs_spark.operators.similarity import semantic_dedup
    from bigdata_logs_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = sorted(map(str, semantic_dedup(emb.repartition(1)).collect()))
    alt = sorted(
        map(
            str,
            semantic_dedup(
                emb.orderBy(F.rand(seed=11)).repartition(5)
            ).collect(),
        )
    )
    assert alt == base


@given(
    n=st.integers(min_value=1, max_value=4000),
    k=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=300, deadline=None)
def test_ntile_from_rank_formula_matches_sql_semantics(n, k):
    """Pure-Python mirror of ``ntile_from_rank``'s integer arithmetic
    against SQL NTILE's definitional form (first n%k buckets take the
    extra row) for arbitrary (n, k) — the Spark-side equivalence test
    pins a handful of cases against F.ntile; this covers the space."""
    q, r = divmod(n, k)
    hi = q + 1
    span = r * hi

    def formula(rn: int) -> int:
        if rn <= span:
            return (rn + q) // hi
        return r + (rn - span + q - 1) // max(q, 1)

    # definitional NTILE: walk buckets left to right
    bucket, filled = 1, 0
    for rn in range(1, n + 1):
        size = hi if bucket <= r else q
        if filled >= size:
            bucket += 1
            filled = 0
        assert formula(rn) == bucket, (n, k, rn)
        filled += 1
