"""Graph operators over corpus-derived graphs (SURVEY.md §2.11 G-1).

The reference ranks words by raw frequency only
(``/root/reference/src/stats_dashboard.py:146-158`` renders a top-word
bar chart). TextRank (Mihalcea & Tarau, EMNLP 2004) is the standard
graph upgrade of that feature: build the token co-occurrence graph and
run PageRank on it, so a term's weight reflects the connectivity of
its neighbourhood rather than its bare count. This module implements
the fixed-iteration PageRank core as pure DataFrame algebra — the
engine's canonical *iterative* algorithm alongside the k-means Lloyd
step in ``similarity.py``.

Cross-engine exactness (the registry oracle runs the same unrolled
iterations in DuckDB): ranks are kept as BIGINT at a fixed scale
(SCALE = 1e6 = uniform rank), every per-edge contribution is floored
to an integer BEFORE the incoming-edge sum, so the only reductions are
exact integer sums — no float sum-order sensitivity anywhere. The two
float ops left (one BIGINT/BIGINT true division per edge, one
``0.85 * sum`` per node) are single IEEE operations on integer-valued
operands, deterministic on any engine.

Scale shape for 100 TB: the corpus collapses to the weighted edge list
in ONE pass (explode adjacent pairs → groupBy (src, dst)); vocabulary
graphs are tiny relative to the corpus (millions of edges vs billions
of tokens), so the three fixed Jacobi iterations run on the aggregated
graph only. The edge list is cached across iterations; each iteration
is one shuffle-join on ``src`` plus one integer groupBy on ``dst``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_logs_spark.caching import tracked_cache
from bigdata_logs_spark.operators.textops import with_tokens

# Fixed-point scale: rank 1.0 (the uniform init) == 1_000_000.
SCALE = 1_000_000
# Damping factor 0.85 -> the teleport term is exactly 150_000 at SCALE.
BASE = 150_000


def token_adjacency_edges(docs: DataFrame) -> DataFrame:
    """Weighted undirected token-adjacency edge list, materialized as
    a symmetric directed list: one row per (src, dst) ordered pair of
    tokens adjacent anywhere in the corpus, ``w`` = number of
    adjacencies. One corpus pass, one (src, dst) shuffle."""
    lo = F.slice(F.col("tokens"), 1, F.size("tokens") - 1)
    hi = F.slice(F.col("tokens"), 2, F.size("tokens") - 1)
    fwd = F.zip_with(lo, hi, lambda a, b: F.struct(a.alias("src"), b.alias("dst")))
    rev = F.zip_with(hi, lo, lambda a, b: F.struct(a.alias("src"), b.alias("dst")))
    # Both orientations emitted from ONE tokenize+explode pass (a
    # union of two selects would rescan and re-tokenize the corpus).
    return (
        with_tokens(docs)
        .where(F.size("tokens") >= 2)
        .select(F.explode(F.concat(fwd, rev)).alias("e"))
        .groupBy(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )


def textrank_keywords(
    docs: DataFrame, iterations: int = 3, top_n: int = 25
) -> DataFrame:
    """G-1: TextRank keyword scores — ``iterations`` Jacobi steps of
    damped PageRank (d = 0.85) on the token-adjacency graph, reported
    for the ``top_n`` best-ranked tokens.

    Ranks are relative to uniform (scaled by ``SCALE``): R0 = SCALE
    for every node; each step computes

        R'(v) = 150000 + floor(0.85 * sum_{u->v} floor(R(u) * w(u,v)
                                                       / out_w(u)))

    entirely in integers (see module docstring for why that is
    cross-engine exact). Isolated tokens (single-token documents with
    no adjacency) are not graph nodes, matching the TextRank paper's
    connected-vocabulary convention.

    Output: (token, rank_scaled BIGINT) — top ``top_n`` by rank desc,
    token asc (total deterministic order under ties).
    """
    edges = token_adjacency_edges(docs)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # Edges annotated with source out-weight: the loop-invariant graph,
    # cached because all `iterations` joins re-read it.
    graph = tracked_cache(edges.join(out_w, "src"))
    # cache: referenced by the rank init plus every iteration's
    # left join — uncached, each reference re-runs the distinct over
    # the edge list. Vocabulary-sized.
    nodes = tracked_cache(
        graph.select(F.col("src").alias("token")).distinct()
    )

    # The rank vector is vocabulary-sized — orders of magnitude
    # smaller than the edge list — so each iteration broadcasts it
    # into a map-side join against the cached graph instead of
    # re-shuffling the edges three times. (At an extreme vocabulary
    # where the rank vector outgrows broadcast range, drop the hints
    # and the same plan degrades gracefully to shuffle joins.)
    ranks = nodes.withColumn("r", F.lit(SCALE).cast("long"))
    for _ in range(iterations):
        contrib = (
            graph.join(
                F.broadcast(ranks.select(F.col("token").alias("src"), "r")),
                "src",
            )
            .select(
                F.col("dst").alias("token"),
                F.floor(F.col("r") * F.col("w") / F.col("ow"))
                .cast("long")
                .alias("c"),
            )
            .groupBy("token")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(F.broadcast(contrib), "token", "left").select(
            "token",
            (
                F.lit(BASE)
                + F.floor(F.lit(0.85) * F.coalesce(F.col("c"), F.lit(0)))
            )
            .cast("long")
            .alias("r"),
        )

    return (
        ranks.orderBy(F.desc("r"), "token")
        .limit(top_n)
        .select("token", F.col("r").alias("rank_scaled"))
    )


def account_clusters(parsed: DataFrame, max_iter: int = 20) -> DataFrame:
    """G-2: shared-IP account clustering — connected components over
    the bipartite user↔IP graph of failed-auth SSH events (the
    "which accounts is this attacker cycling through" drill-down
    behind AD-2/AD-5's per-IP alerts; cites the incident framing of
    ``/root/reference/README.md:2``).

    The bipartite structure is the scale trick: min-label propagation
    alternates user→IP (min user label per IP) and IP→user, so a hub
    IP shared by 10k users costs 10k edge rows per round — NEVER the
    10k² user-user pair materialization a one-mode projection (or the
    oracle's self-join adjacency, fine at oracle scale) would pay.
    Convergence in O(component diameter) rounds, each two joins + two
    aggs on the (user, ip) edge list only.

    Lineage control, checkpoint-block hygiene, and the
    converge-or-raise contract live in the shared driver loop
    (``iterate.propagate_min_labels``) — if a component's bipartite
    diameter exceeds the iteration budget the call RAISES instead of
    returning silently-split clusters.

    Output: (user, cluster) — cluster is the lexicographically
    smallest username in the component.
    """
    from bigdata_logs_spark.operators.iterate import propagate_min_labels
    from bigdata_logs_spark.operators.parse import FAILED_AUTH_EVENTS

    edges = (
        parsed.where(
            F.col("event").isin(*FAILED_AUTH_EVENTS)
            & F.col("user").isNotNull()
            & F.col("ip").isNotNull()
        )
        .select("user", "ip")
        .distinct()
        .transform(tracked_cache)
    )
    labels = edges.select("user").distinct().withColumn(
        "cluster", F.col("user")
    )

    def neighbor_min(cur):
        ip_min = (
            edges.join(cur, "user")
            .groupBy("ip")
            .agg(F.min("cluster").alias("ip_label"))
        )
        return (
            edges.join(ip_min, "ip")
            .groupBy("user")
            .agg(F.min("ip_label").alias("nbr_min"))
        )

    return propagate_min_labels(
        labels, neighbor_min, key="user", label="cluster", max_iter=max_iter
    ).orderBy("user")


def token_graph_degrees(docs: DataFrame) -> DataFrame:
    """G-3: degree distribution of the token-adjacency graph —
    power-of-two degree buckets vs node counts, the quick shape check
    (scale-free? hub-dominated?) run before pointing an iterative
    algorithm like G-1 at a corpus, and the empirical basis for the
    broadcast-the-rank-vector decision documented there.

    Degree = distinct neighbors (unweighted). The bucket is the
    largest power of two <= degree, computed from the BINARY STRING
    length (``shiftleft(1, length(bin(deg)) - 1)``) — float
    ``log2`` is ln(x)/ln(2) in Spark and NOT exact on power-of-two
    boundaries, which would mis-bucket exactly the values that define
    the buckets. Edge list → per-node count → |buckets| rows: nothing
    larger than the vocabulary ever aggregates.
    """
    edges = token_adjacency_edges(docs)
    degrees = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    bucket = F.expr("shiftleft(CAST(1 AS BIGINT), length(bin(deg)) - 1)")
    return (
        degrees.select(bucket.alias("degree_bucket"))
        .groupBy("degree_bucket")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree_bucket")
    )


def token_graph_triangles(docs: DataFrame) -> DataFrame:
    """G-4: exact triangle count + global clustering coefficient of
    the token-adjacency graph — the one-number cohesion summary
    (3·triangles / wedges) that distinguishes hub-and-spoke
    boilerplate vocabularies from genuinely interlinked ones, and the
    standard big-graph benchmark op (Suri & Vassilvitskii's MR
    triangle counting).

    Shape: the undirected edge set (src < dst, so each edge once)
    self-joins on the middle vertex to enumerate ordered wedges
    a<b<c, then one more equi-join closes them against the edge list
    — each triangle counted exactly once, no cartesian anywhere. The
    wedge total comes from the degree table alone (Σ deg·(deg−1)/2,
    exact integers). At 100 TB the standard refinement is
    degree-ordered orientation (orient each edge toward the
    higher-degree endpoint) so the wedge join fans out on low-degree
    vertices only; the id-ordered orientation here is the same plan
    shape with a cheaper orientation key.

    Exactness: counts are BIGINT; deg·(deg−1)/2 divides an even
    integer exactly; the only float op is the final coefficient
    division, rounded at 1e-6.
    """
    edges = token_adjacency_edges(docs).select("src", "dst")
    und = edges.where(F.col("src") < F.col("dst"))
    e_ab = und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e_bc = und.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e_ac = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = (
        e_ab.join(e_bc, "b")
        .join(e_ac, ["a", "c"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    shape = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
        .cast("long")
        .alias("n_wedges"),
    )
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        shape.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                3.0 * F.col("n_triangles").cast("double") / F.col("n_wedges"), 6
            ).alias("clustering_coeff"),
        )
    )


def token_graph_kcore(docs: DataFrame, k: int = 3, rounds: int = 4) -> DataFrame:
    """G-5: k-core peeling profile (Seidman 1983; Batagelj-Zaversnik
    peel) — ``rounds`` fixed rounds of "drop every vertex with degree
    < k" on the token-adjacency graph, reporting surviving node/edge
    counts per round; the cohesion ladder that separates a corpus's
    densely interlinked core vocabulary from hapax fringe (round 0 is
    the whole graph, the fixed point is the k-core).

    The round count is FIXED, not run-to-convergence, so the output
    is deterministic and the oracle can replay the identical unrolled
    peels; once the peel converges, further rounds are no-ops, so a
    converged profile shows equal tail rows (visible in the output
    rather than hidden behind a raised error).

    Scale shape: each round is one degree aggregation + two hash
    semi-joins on the CACHED vocabulary-sized edge list (the corpus
    is scanned exactly once, by the edge build); the peel count is a
    constant, so the lineage is bounded and checkpoint-free.
    """
    edges = tracked_cache(
        token_adjacency_edges(docs).select("src", "dst")
    )
    rows = []
    cur = edges
    for rnd in range(rounds + 1):
        # ONE degree aggregation per round serves both consumers: the
        # round stats (n_nodes = group count, n_edges = Σdeg/2 — src
        # is never null, so the group count IS countDistinct(src), and
        # Σdeg IS the edge-row count) and the peel predicate. The old
        # form paid a second edge-sized exchange per round for a
        # separate countDistinct over cur. deg is vocabulary-sized.
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        stats = deg.agg(
            F.lit(rnd).alias("round"),
            F.count(F.lit(1)).alias("n_nodes"),
            # coalesce: Σdeg over a fully-peeled (empty) graph is
            # NULL where the old count(*) was 0
            (F.coalesce(F.sum("deg"), F.lit(0)) / 2)
            .cast("bigint")
            .alias("n_edges"),
        )
        rows.append(stats)
        if rnd == rounds:
            break
        alive = deg.where(F.col("deg") >= k).select("src")
        cur = tracked_cache(
            cur.join(alive, "src", "left_semi")
            .join(alive.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("round")


def bfs_reachability(docs: DataFrame, hops: int = 4) -> DataFrame:
    """G-6: BFS reachability profile — breadth-first expansion from
    the top-degree token for a FIXED number of hops, reporting newly
    reached vocabulary per hop (the how-connected-is-the-core probe;
    a small-world token graph reaches most of the vocabulary in 2-3
    hops, a fragmented one doesn't).

    Scale shape: frontier expansion is one equi-join of the (cached,
    vocabulary-sized) edge list against the previous frontier plus an
    anti-join against the visited set per hop; the hop count is fixed
    so lineage is bounded and the oracle replays identical unrolled
    rounds. The seed pick (max degree, token tiebreak) is ONE
    aggregation, deterministic cross-engine.
    """
    edges = tracked_cache(token_adjacency_edges(docs).select("src", "dst"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    seed = deg.orderBy(F.desc("deg"), "src").limit(1).select("src")
    visited = tracked_cache(seed)
    frontier = visited
    rows = [
        frontier.agg(
            F.lit(0).alias("hop"), F.count(F.lit(1)).alias("n_new_nodes")
        )
    ]
    for hop in range(1, hops + 1):
        nxt = tracked_cache(
            edges.join(
                frontier.withColumnRenamed("src", "f"),
                F.col("src") == F.col("f"),
            )
            .select(F.col("dst").alias("src"))
            .distinct()
            .join(visited, "src", "left_anti")
        )
        rows.append(
            nxt.agg(
                F.lit(hop).alias("hop"), F.count(F.lit(1)).alias("n_new_nodes")
            )
        )
        # visited and nxt are DISJOINT (nxt is anti-joined against
        # visited) and each internally distinct, so their union is
        # already a set — the old .distinct() here was a semantic
        # no-op costing one exchange per hop
        visited = tracked_cache(visited.unionByName(nxt))
        frontier = nxt
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("hop")


def markov_stationary(events: DataFrame, iterations: int = 5) -> DataFrame:
    """G-7: quasi-stationary distribution of the event-type Markov
    chain — ``iterations`` fixed power-iteration steps of the
    transition matrix AD-6 (`rare_transitions`) calibrates, starting
    from the uniform mass vector; where the per-edge probabilities say
    what follows WHAT, the stationary mass says where user attention
    CONCENTRATES in the long run (the steady-state the chain drifts
    toward).

    Fixed-point exactness (the G-1 discipline): masses are BIGINT at
    SCALE; every per-edge flow floors floor(m * n / out_total) to an
    integer BEFORE the incoming sum, so both engines reduce exact
    integers; the final share is one double division. Fixed iteration
    count keeps the oracle an identical unrolled replay.

    Scale shape: the corpus collapses to the k x k transition-count
    table in ONE (user_id)-partitioned window pass (k = event-type
    cardinality, tiny); all iterations run on broadcast-sized tables.
    Cites /root/reference/src/stats_dashboard.py:79-101 (the per-type
    volume bars this upgrades with sequence structure)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        events.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("nxt").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out_w = edges.groupBy("src").agg(F.sum("n").alias("ow"))
    graph = tracked_cache(edges.join(out_w, "src"))
    # cache: the node table is referenced once per iteration plus the
    # final share projection — uncached, EVERY reference re-scans the
    # corpus and re-runs the distinct (iterations + 2 full corpus
    # passes; the one genuine scale bug in this operator). k rows.
    nodes = tracked_cache(
        events.select(F.col("event_type").alias("t")).distinct()
    )

    mass = nodes.withColumn("m", F.lit(SCALE).cast("long"))
    for _ in range(iterations):
        contrib = (
            graph.join(
                F.broadcast(mass.select(F.col("t").alias("src"), "m")),
                "src",
            )
            .select(
                F.col("dst").alias("t"),
                F.floor(F.col("m") * F.col("n") / F.col("ow"))
                .cast("long")
                .alias("c"),
            )
            .groupBy("t")
            .agg(F.sum("c").alias("c"))
        )
        mass = nodes.join(F.broadcast(contrib), "t", "left").select(
            "t", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("m")
        )

    # cache: `mass` feeds both the grand total and the share
    # projection; uncached, the whole unrolled iteration chain would
    # execute twice. k rows.
    mass = tracked_cache(mass)
    total = mass.agg(F.sum("m").alias("tot"))
    return (
        mass.crossJoin(F.broadcast(total))
        .select(
            F.col("t").alias("event_type"),
            F.col("m").alias("mass_scaled"),
            F.round(F.col("m").cast("double") / F.col("tot"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("mass_scaled"), "event_type")
    )


def degree_assortativity(docs: DataFrame) -> DataFrame:
    """G-8: degree assortativity coefficient of the token-adjacency
    graph (Newman, PRL 89:208701, 2002) — the Pearson correlation of
    the (distinct-neighbor) degrees at the two ends of every edge,
    evaluated over the symmetric directed edge list as the paper
    specifies. Assortative (r > 0) graphs have hubs linking to hubs;
    language co-occurrence graphs are canonically DISASSORTATIVE
    (hubs = function words link to rare content words), so r < 0 is
    the expected healthy signature and r drifting toward 0 flags a
    templated corpus. Completes the G-3/G-4 shape suite: degree
    distribution, cohesion, and now degree-degree mixing.

    Exactness: degrees are exact BIGINT distinct-neighbor counts; the
    five co-moments over edge-endpoint degree pairs accumulate in
    DECIMAL(38,0) (degree products overflow BIGINT on hub-heavy
    graphs long before they trouble 38 digits); the closed form
    spends its floats in mirrored operand order; a degree-regular
    graph (zero variance) reports NULL.

    Scale shape: one corpus pass builds the edge list; the degree
    table is vocabulary-sized and broadcast into the two edge-endpoint
    joins; the co-moments collapse in one combinable aggregation —
    nothing bigger than the edge list ever shuffles."""
    edges = token_adjacency_edges(docs).select("src", "dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    di = deg.select(F.col("src"), F.col("deg").alias("deg_src"))
    dj = deg.select(
        F.col("src").alias("dst"), F.col("deg").alias("deg_dst")
    )
    dec = "decimal(19,0)"
    pairs = (
        edges.join(F.broadcast(di), "src")
        .join(F.broadcast(dj), "dst")
        .select(
            F.col("deg_src").cast(dec).alias("j"),
            F.col("deg_dst").cast(dec).alias("k"),
        )
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n_edges_directed"),
        F.sum("j").alias("sj"),
        F.sum("k").alias("sk"),
        F.sum(F.col("j") * F.col("k")).alias("sjk"),
        F.sum(F.col("j") * F.col("j")).alias("sjj"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
    )
    n = F.col("n_edges_directed").cast("double")
    sj = F.col("sj").cast("double")
    sk = F.col("sk").cast("double")
    sjk = F.col("sjk").cast("double")
    sjj = F.col("sjj").cast("double")
    skk = F.col("skk").cast("double")
    varj = n * sjj - sj * sj
    vark = n * skk - sk * sk
    r = (n * sjk - sj * sk) / (F.sqrt(varj) * F.sqrt(vark))
    return m.select(
        "n_edges_directed",
        F.when((varj > 0) & (vark > 0), F.round(r, 6)).alias(
            "assortativity"
        ),
    )
