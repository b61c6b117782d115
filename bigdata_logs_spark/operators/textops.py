"""Text analysis operators over the ``documents`` table
(SURVEY.md §2.11 north-star: token counting, quality scoring,
language-ID, fingerprinting).

All token-level work uses native Spark array/lambda functions
(``split`` / ``transform`` / ``filter`` / ``aggregate``) — JVM-side,
no Python UDFs, so the hot path scales with executors, not with the
Python interpreter. Tokenization contract (shared with the DuckDB
oracles): tokens = regex-split of trimmed text on ``\\s+``; empty
text -> 0 tokens.
"""

from __future__ import annotations

import pandas  # noqa: F401  (resolves stringified pandas_udf type hints)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_logs_spark.caching import tracked_cache

# Marker stopwords for the quality/lang heuristics (present in the
# synthetic corpus vocabulary).
STOPWORDS = ("a", "the")


def _tokens(text: Column) -> Column:
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    # Deliberately NO spread_small_input here: measured across the
    # token-consuming battery at sf0.1, the repartition exchange
    # (which ships the full text column) costs more than one core's
    # tokenize+explode for every consumer except the per-CHARACTER
    # explode in media_byte_entropy, which spreads at its own call
    # site. Heavier per-token stages (shingle+md5 in the dedup
    # family) spread themselves for the same reason.
    return docs.withColumn("tokens", _tokens(F.col(text_col)))


def doc_stats_by_lang(docs: DataFrame) -> DataFrame:
    """Per-language corpus stats; decimal-exact averages."""
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.sum("n_chars") / F.count(F.lit(1)), 2).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count per document (the BPE-ish regex variant
    would swap the split pattern; the plumbing is identical)."""
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    ).orderBy("doc_id")


def word_frequencies(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-wide word top-k: explode -> count -> TakeOrdered."""
    return (
        with_tokens(docs)
        .select(F.explode("tokens").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(k)
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document quality heuristics: length, type-token ratio,
    stopword ratio, mean token length — the classic cheap filters of
    an LLM-data pipeline, all as native column arithmetic."""
    toks = F.col("tokens")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    total_tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return (
        with_tokens(docs)
        .select(
            "doc_id",
            "lang",
            F.col("n_chars"),
            n.alias("n_tokens"),
            F.when(n > 0, F.round(F.size(F.array_distinct(toks)) * 1.0 / n, 4))
            .otherwise(F.lit(0.0))
            .alias("type_token_ratio"),
            F.when(n > 0, F.round(n_stop * 1.0 / n, 4))
            .otherwise(F.lit(0.0))
            .alias("stopword_ratio"),
            F.when(n > 0, F.round(total_tok_chars * 1.0 / n, 4))
            .otherwise(F.lit(0.0))
            .alias("mean_token_len"),
        )
        .orderBy("doc_id")
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID. On real corpora the marker sets
    would be per-language char n-gram profiles; the synthetic corpus
    shares one vocabulary, so this demonstrates the mechanism (marker
    count -> argmax with deterministic tiebreak) rather than accuracy.
    """
    toks = F.col("tokens")
    en_markers = F.array(F.lit("the"), F.lit("a"), F.lit("is"), F.lit("of"))
    en_score = F.size(F.filter(toks, lambda t: F.array_contains(en_markers, t)))
    return (
        with_tokens(docs)
        .select(
            "doc_id",
            "lang",
            en_score.alias("en_marker_count"),
            F.when(en_score > 0, F.lit("en")).otherwise(F.lit("unknown")).alias(
                "predicted_lang"
            ),
        )
        .orderBy("doc_id")
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of the full text plus a positional
    polynomial token hash (order-sensitive, unlike a bag-of-words
    hash — reordered words change it). Pure integer arithmetic in
    BIGINT, identical across engines."""
    toks = _tokens(F.col("text"))
    poly = F.expr(
        """
        aggregate(
          transform(sequence(1, size(tokens)),
                    i -> ((ascii(substr(element_at(tokens, i), 1, 1)) * 31
                           + length(element_at(tokens, i)))
                          * ((i * 2654435761) % 2147483647)) % 2147483647),
          0L, (acc, x) -> (acc + x) % 2147483647)
        """
    )
    return (
        docs.withColumn("tokens", toks)
        .select(
            "doc_id",
            F.md5(F.col("text")).alias("md5_fingerprint"),
            poly.alias("poly_fingerprint"),
        )
        .orderBy("doc_id")
    )


def doc_length_zscores(docs: DataFrame) -> DataFrame:
    """Per-language z-score of document length via grouped-map
    ``applyInPandas`` — the engine's sanctioned Python extension point
    (Arrow-batched, one pandas frame per group; SURVEY.md §2.10).

    Group moments use integer sums (exact regardless of row order
    inside the pandas frame), then a fixed float expression — so the
    result is deterministic and cross-engine checkable even though a
    Python worker computes it. At scale: one shuffle on ``lang``;
    each group must fit one worker (fine for a bounded language set —
    use the native-expression path for unbounded keys).
    """
    import math

    import pandas as pd

    def zscores(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].astype("int64")
        n = len(x)
        sx = int(x.sum())
        sxx = int((x * x).sum())
        mean = sx / n
        var = sxx / n - (sx / n) * (sx / n)
        if var > 0:
            std = math.sqrt(var)
            z = ((x - mean) / std).round(4)
        else:
            z = pd.Series([None] * n, dtype="float64")
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "n_chars": x, "z": z}
        )

    return (
        docs.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(zscores, "doc_id bigint, lang string, n_chars bigint, z double")
        .orderBy("doc_id")
    )


def token_counts_pandas_udf(docs: DataFrame) -> DataFrame:
    """Scalar ``@pandas_udf`` variant of ``token_counts`` — the
    vectorized series->series extension point (SURVEY.md §2.10 U-2).

    Same tokenization contract as the native path, so both produce
    hash-identical results; the native expression remains the hot
    path (JVM codegen beats Arrow round-trips when built-ins can
    express the op — this exists to prove the escape hatch).
    """
    import re

    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"\s+")

    # NB: this module uses `from __future__ import annotations`, which
    # stringifies type hints; pandas must be resolvable in module
    # globals for Spark's signature inspection.
    @pandas_udf("int")
    def n_tokens(text: "pandas.Series") -> "pandas.Series":  # noqa: F821
        return text.map(lambda t: len(ws.split(t.strip())) if t.strip() else 0)

    @pandas_udf("int")
    def n_distinct(text: "pandas.Series") -> "pandas.Series":  # noqa: F821
        return text.map(
            lambda t: len(set(ws.split(t.strip()))) if t.strip() else 0
        )

    return docs.select(
        "doc_id",
        "lang",
        n_tokens(F.col("text")).alias("n_tokens"),
        n_distinct(F.col("text")).alias("n_distinct_tokens"),
    ).orderBy("doc_id")


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k terms per document by tf-idf: tf(term, doc) * ln(N/df).

    Everything is a native DataFrame pipeline: explode tokens -> tf
    per (doc, term) -> df per term (one small shuffle on the term
    key) -> join -> per-doc window top-k. Only (doc_id, term, count)
    triples shuffle; document text never does. ``ln`` on doubles is
    bit-identical between the JVM and the DuckDB oracle (verified),
    and the score is additionally rounded to 6 decimals before
    ranking with a term-name tiebreak, so top-k is deterministic.

    At 100 TB: df is a map-side-combined count over terms (bounded by
    vocabulary size, broadcastable); the window partitions by doc_id,
    which is the natural even key.
    """
    # N computed IN the plan (1-row agg, broadcast by the cross join)
    # so the operator is fully lazy — no eager count job at build time
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    toks = with_tokens(docs).select("doc_id", F.explode(F.col("tokens")).alias("term"))
    # cache: tf feeds both the df derivation and the scoring join —
    # uncached, the tokenize+explode+agg would run twice
    tf = tracked_cache(
        toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    # df derived FROM tf (tf has exactly one row per (doc, term), so
    # counting rows per term == counting distinct docs per term) —
    # this replaces a second full explode + a distinct exchange with
    # one vocab-sized aggregation over the cached tf
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = F.round(
        F.col("tf").cast("double")
        * F.log(F.col("n_docs") / F.col("df").cast("double")),
        6,
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", "tf", "df", score.alias("tfidf"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("doc_id", "rnk")
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Per-document repetition heuristics (the Gopher-style filters
    that catch boilerplate and degenerate generations):

    - ``top_token_share`` — the most frequent token's share of all
      tokens (near 1.0 = the doc is one token repeated);
    - ``dup_bigram_ratio`` — fraction of adjacent-token bigrams that
      are repeats of an earlier bigram in the same doc.

    Scale shape: the bigram ratio is pure per-row array arithmetic
    (narrow, codegen'd). The top-token count shuffles only fixed-width
    (doc_id, token, count) triples with map-side partial aggregation —
    document text never crosses the wire.
    """
    toks = with_tokens(docs)
    n = F.col("n_tokens")
    bigrams = F.expr(
        """
        CASE WHEN size(tokens) < 2 THEN array()
        ELSE transform(sequence(1, size(tokens) - 1),
               i -> concat_ws(' ', element_at(tokens, i), element_at(tokens, i + 1)))
        END
        """
    )
    base = toks.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        bigrams.alias("bigrams"),
    )
    top = (
        toks.select("doc_id", F.explode("tokens").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_tok_n"))
    )
    n_bg = F.size("bigrams")
    return (
        base.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.when(n > 0, F.round(F.col("top_tok_n") * 1.0 / n, 4))
            .otherwise(F.lit(0.0))
            .alias("top_token_share"),
            F.when(
                n_bg > 0,
                F.round(
                    F.lit(1.0)
                    - F.size(F.array_distinct(F.col("bigrams"))) * 1.0 / n_bg,
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_ratio"),
        )
        .orderBy("doc_id")
    )


def _gram_strings(k: int) -> Column:
    """Readable k-gram strings over the ``tokens`` column (space-
    joined), empty array when the doc is shorter than k."""
    return F.expr(
        f"""
        CASE WHEN size(tokens) < {k} THEN array()
        ELSE transform(sequence(1, size(tokens) - {k - 1}),
               i -> concat_ws(' ', slice(tokens, i, {k})))
        END
        """
    )


def boilerplate_ngrams(
    docs: DataFrame, k: int = 3, min_df: int = 2, top: int = 50
) -> DataFrame:
    """Cross-document repeated n-grams — the boilerplate/template
    detector of web-crawl curation (RefinedWeb/C4 strip spans that
    recur across many pages; with a corpus of flat token streams the
    unit of repetition is the k-gram, not the line).

    Scale shape: per-doc DISTINCT grams first (narrow), so a gram
    repeated inside one long doc counts once; then one map-side-
    combined count per gram. Only (doc_id, gram) pairs shuffle; text
    never does. TakeOrdered bounds the driver result.
    """
    grams = (
        with_tokens(docs)
        .select("doc_id", F.explode(F.array_distinct(_gram_strings(k))).alias("gram"))
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .orderBy(F.desc("df"), F.asc("gram"))
        .limit(top)
    )


def boilerplate_fraction(
    docs: DataFrame, k: int = 3, min_df: int = 20
) -> DataFrame:
    """Per-document boilerplate fraction: the share of a doc's
    distinct k-grams that are corpus-common (document frequency >=
    ``min_df``) — the per-doc gate a curation pipeline thresholds on
    to drop template-heavy pages.

    One exploded (doc_id, gram) set feeds both sides: gram->df
    aggregation (small: vocabulary-bounded) joins back to the per-doc
    gram list. The join key is the gram string — skew-bounded because
    the df side is pre-aggregated to one row per gram before the
    join, and the fraction is exact integer arithmetic, oracle-safe.
    """
    from bigdata_logs_spark.caching import tracked_cache

    grams = (
        with_tokens(docs)
        .select("doc_id", F.explode(F.array_distinct(_gram_strings(k))).alias("gram"))
        .transform(tracked_cache)
    )
    common = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    per_doc = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    n_common = (
        grams.join(common, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        per_doc.join(n_common, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    F.coalesce(F.col("n_common"), F.lit(0)) * 1.0
                    / F.col("n_grams"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("boilerplate_frac"),
        )
        .orderBy("doc_id")
    )


def commonness_scores(docs: DataFrame) -> DataFrame:
    """T-12: per-document mean corpus-unigram probability — a
    language-model-free "perplexity proxy" quality signal: documents
    of mostly rare tokens score low, boilerplate of corpus-dominant
    tokens scores high. Training-data curation pairs this with
    ``quality_scores`` (surface heuristics) and
    ``repetition_scores`` (self-similarity).

    Exact-rational math: score = sum(corpus_count(tok)) /
    (n_tokens * corpus_total). Every intermediate is an integer sum —
    no log() (libm differs across engines) and no float accumulation
    order — with ONE final int/int division, so the double is
    bit-identical in any engine and any partitioning.

    Scale shape: one explode to (doc_id, token), a token-count agg
    (map-side combinable), a join back on the token key, and a per-doc
    sum. The vocabulary agg output is Zipf-small relative to the
    corpus; the join is token-keyed and skew-handled by AQE.

    Overflow bound: the n_tokens * corpus_total BIGINT product holds
    while n_tokens * corpus_total < 2^63 — e.g. million-token docs
    against a ~9e12-token corpus. Past that, cast both factors to
    double before the division (the score is a probability; float
    error at that scale is irrelevant) — same escape hatch as AD-1's
    variance sums.
    """
    toks = with_tokens(docs).select(
        "doc_id", F.explode("tokens").alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("corpus_total"))
    per_doc = (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").alias("sum_counts"),
        )
    )
    return (
        per_doc.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("sum_counts")
                / (F.col("n_tokens") * F.col("corpus_total"))
            ).alias("commonness"),
        )
        .orderBy("doc_id")
    )


def ngram_novelty(docs: DataFrame, k: int = 3) -> DataFrame:
    """T-13: per-document novel-content fraction — the share of a
    doc's distinct k-grams whose FIRST corpus occurrence (by doc_id
    order) is in this document. The forward-looking twin of
    ``boilerplate_fraction``: boilerplate asks "how much of this doc
    is corpus-common", novelty asks "how much did this doc add that
    no earlier doc had" — the incremental-value signal crawl curation
    uses to rank re-crawls and near-duplicate chains (a doc that adds
    nothing novel after its predecessors is a drop candidate even
    when no single pairwise Jaccard crosses the dedup bar).

    Deterministic by construction: "first" is min(doc_id) per gram —
    a total order both engines share — not ingestion wall-clock.

    Scale shape: per-doc DISTINCT grams (narrow explode), one
    map-side-combinable min(doc_id) agg per gram (vocabulary-bounded
    output), then an equi-join back on the gram key and a per-doc
    integer fraction. Only (doc_id, gram) pairs ever shuffle; the
    fraction is exact integer arithmetic with one final division.
    """
    # cache: the distinct-gram explode feeds both the first-owner
    # aggregation and the join's probe side — uncached, the
    # tokenize+gram explode runs twice
    grams = tracked_cache(
        with_tokens(docs)
        .select(
            "doc_id",
            F.explode(F.array_distinct(_gram_strings(k))).alias("gram"),
        )
    )
    first_owner = grams.groupBy("gram").agg(
        F.min("doc_id").alias("first_doc")
    )
    return (
        grams.join(first_owner, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") * 1.0 / F.col("n_grams"), 4).alias(
                "novel_frac"
            ),
        )
        .orderBy("doc_id")
    )


def ngram_rows_udtf(docs: DataFrame, k: int = 3, max_doc_id: int = 50) -> DataFrame:
    """U-5: Python UDTF (table function) — completes the user-function
    taxonomy next to grouped-map (U-1), scalar pandas_udf (U-2),
    stateful pandas (U-3) and grouped-agg pandas_udf (U-4): a
    one-row-to-many-rows expansion in the FROM clause, the Spark-4
    form of the reference's dict→rows reshape (SURVEY §2.10 D-45).
    Emits one (pos, gram) row per token k-gram via a lateral join.

    THE SLOW-PATH DISCLAIMER IS THE POINT: UDTFs run row-at-a-time in
    the Python worker, so the native twin (``_gram_strings`` — a JVM
    ``transform``/``explode``, used by T-10/T-11/T-13) is the hot
    path; this exists to pin the extension surface and is capped to
    ``max_doc_id`` docs. A pytest asserts the UDTF output is
    row-identical to the native expression, so the escape hatch is
    oracle-checked, not just demonstrated.

    Tokenization contract: ``str.split()`` == regex split of trimmed
    text on ``\\s+`` (both discard leading/trailing/repeated
    whitespace), the same contract every text oracle uses.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, gram: string")
    class NgramExpand:
        def eval(self, text: str, k: int):  # noqa: A002 - SQL-facing arg
            toks = text.split() if text and text.strip() else []
            for i in range(len(toks) - k + 1):
                yield i, " ".join(toks[i : i + k])

    spark = docs.sparkSession
    spark.udtf.register("bls_ngram_expand", NgramExpand)
    docs.filter(F.col("doc_id") < max_doc_id).createOrReplaceTempView(
        "bls_udtf_docs"
    )
    return spark.sql(
        f"""
        SELECT d.doc_id, g.pos, g.gram
        FROM bls_udtf_docs d, LATERAL bls_ngram_expand(d.text, {int(k)}) g
        ORDER BY d.doc_id, g.pos
        """
    )


def source_vocab_overlap(docs: DataFrame) -> DataFrame:
    """T-14: pairwise vocabulary Jaccard between sources — the
    mixing-diagnostics matrix behind ``source_mixing_weights`` (PL-7):
    two sources with near-identical vocabularies are redundant in a
    training mix (upweighting both buys no diversity), while a
    low-overlap source contributes vocabulary the mix lacks. Computed
    on DISTINCT (source, token) pairs, so corpus volume per source
    cancels out and only lexical coverage is compared.

    Scale shape: the corpus collapses to the distinct (source, token)
    vocabulary table FIRST (map-side-combinable distinct, Zipf-small
    output); the self-join is token-keyed over that small table and
    emits at most k rows per token for k sources; the final matrix is
    k(k-1)/2 rows. Jaccard is exact-integer |A∩B| / (|A|+|B|-|A∩B|)
    with ONE division.
    """
    vocab = (
        with_tokens(docs)
        .select("source", F.explode("tokens").alias("token"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = vocab.alias("a"), vocab.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("vocab_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def vocab_growth(docs: DataFrame, step: int = 50) -> DataFrame:
    """T-16: Heaps-law vocabulary growth curve — cumulative corpus
    size vs distinct-vocabulary size at every ``step``-document
    checkpoint (plus the final partial bucket), in document-id order.

    The empirical Heaps exponent (vocab ~ tokens^beta) is the standard
    "is more crawl data still adding new vocabulary?" diagnostic when
    sizing a training corpus; the raw integer curve is emitted instead
    of a fitted beta so the output stays transcendental-free and
    bit-identical across engines.

    Shape: the one global ``row_number`` over doc_id is the inherently
    sequential part (at 100 TB you would substitute the monotone
    ingest key that already orders the corpus); everything after it is
    aggregated — each token collapses to its FIRST-occurrence rank
    (min-combinable), ranks collapse to step buckets, and the
    cumulative window runs over the tiny n/step-row series, never the
    corpus. All arithmetic is integer (floor-div bucketing, integer
    cumsums): no float anywhere.
    """
    from pyspark.sql import Window

    base = with_tokens(docs).select(
        F.row_number().over(Window.orderBy("doc_id")).alias("rn"), "tokens"
    )
    n_row = base.agg(F.max("rn").alias("n"))
    ck = F.expr(f"least(((rn + {step - 1}) div {step}) * {step}, n)").cast("long")
    b2 = base.crossJoin(F.broadcast(n_row)).withColumn("ck", ck)
    toks_in = b2.groupBy("ck").agg(F.sum(F.size("tokens")).alias("toks"))
    firsts = (
        b2.select("rn", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.min("rn").alias("rn"))
        .crossJoin(F.broadcast(n_row))
        .withColumn("ck", ck)
        .groupBy("ck")
        .agg(F.count(F.lit(1)).alias("new_terms"))
    )
    series = toks_in.join(firsts, "ck", "full_outer").select(
        "ck",
        F.coalesce("toks", F.lit(0)).alias("toks"),
        F.coalesce("new_terms", F.lit(0)).alias("new_terms"),
    )
    cum = Window.orderBy("ck").rowsBetween(Window.unboundedPreceding, 0)
    return series.select(
        F.col("ck").alias("docs_seen"),
        F.sum("toks").over(cum).cast("long").alias("total_tokens"),
        F.sum("new_terms").over(cum).cast("long").alias("vocab_size"),
    ).orderBy("docs_seen")


def zipf_fit(docs: DataFrame, top_r: int = 100) -> DataFrame:
    """T-17: per-language Zipf-law fit — OLS slope of ln(frequency)
    on ln(rank) over each language's ``top_r`` most frequent tokens.
    Natural corpora sit near slope -1; a corpus drifting toward 0 is
    template/boilerplate-heavy, one far below -1 has a starved tail —
    the distributional companion to T-16's growth curve.

    Cross-engine exactness: ``ln`` on identical doubles is
    bit-identical across engines (pinned by the hex-parse/ln gotcha
    tests), so each term is quantized to fixed-point BIGINT
    (round(ln·1e6)) and the five co-moments are EXACT integer sums —
    the AGG-7 discipline transplanted to transcendental inputs. The
    closed-form slope is then evaluated in double with mirrored
    operand order and rounded at 1e-4.

    Scale shape: corpus → (lang, token) counts (one map-combinable
    shuffle); ranking is a per-language window over vocabulary-sized
    groups; the regression reduces ``top_r`` rows per language.
    """
    from pyspark.sql import Window

    freqs = (
        with_tokens(docs)
        .select("lang", F.explode("tokens").alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), "token")
    ranked = freqs.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= top_r
    )
    xi = F.round(F.log(F.col("rank").cast("double")) * 1e6).cast("long")
    yi = F.round(F.log(F.col("cnt").cast("double")) * 1e6).cast("long")
    m = (
        ranked.select("lang", xi.alias("x"), yi.alias("y"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    n = F.col("n_terms")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    return m.select(
        "lang",
        "n_terms",
        # n_terms == 1 makes the OLS denominator exactly zero (sxx ==
        # sx*sx); emit NULL instead of cross-engine-divergent NaN/Inf
        F.round(
            F.when(n > 1, (n * sxy - sx * sy) / (n * sxx - sx * sx)), 4
        ).alias("zipf_slope"),
    ).orderBy("lang")


def lang_id_confusion(docs: DataFrame) -> DataFrame:
    """T-18: confusion matrix of the T-5 language-ID heuristic against
    the labeled ``lang`` column, with per-cell share of the true
    language — the evaluation leg T-5 itself lacks (E-12 plays the
    same role for the IVF coarse quantizer). On the synthetic
    shared-vocabulary corpus the interesting signal is the per-lang
    miss ("unknown") rate of the marker set.

    Shape: the per-doc prediction is a narrow expression; the corpus
    collapses to |langs| x |predictions| cells; the share divides two
    exact integers once.
    """
    preds = lang_id(docs).select("lang", "predicted_lang")
    cells = preds.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    from pyspark.sql import Window

    per_lang = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "predicted_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(per_lang), 4).alias(
            "share_of_lang"
        ),
    ).orderBy("lang", "predicted_lang")


def char_entropy(docs: DataFrame) -> DataFrame:
    """T-20: per-document character-distribution Shannon entropy (in
    nats) — the classic cheap gibberish/binary-spill detector: natural
    prose sits in a narrow entropy band; base64 blobs and key-mash
    score high, repeated-character padding scores near zero. The
    standard companion gate to T-4's token-level quality signals.

    Shape: one explode to (doc_id, char) rows, a combinable
    (doc_id, char) count, then a per-doc sum of ~alphabet-size terms.
    Exactness: each term (cnt/n)·ln(cnt/n) is one division, one
    bit-identical ln, one multiply; the per-doc sum spans at most
    |alphabet| ≈ dozens of terms with ~1e-15 relative error against
    the 1e-6 rounding (the kmeans headroom argument).
    """
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).where(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n")
    terms = counts.join(totals, "doc_id").select(
        "doc_id", "n", (p * F.log(p)).alias("term")
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.first("n").alias("n_chars_total"),
            F.round(-F.sum("term"), 6).alias("char_entropy"),
        )
        .orderBy("doc_id")
    )


_ADJ_PAIRS = """
    CASE WHEN size(tokens) < 2 THEN array()
    ELSE transform(sequence(1, size(tokens) - 1),
           i -> struct(element_at(tokens, i) AS w1,
                       element_at(tokens, i + 1) AS w2))
    END
"""

# ln quantized to integer micro-units: ln() on identical doubles is
# bit-identical across Spark and DuckDB, and quantize-BEFORE-sum keeps
# every downstream reduction in exact BIGINT arithmetic (the zipf_fit
# / T-17 discipline).
def _ln_micro(c) -> Column:
    return F.round(F.log(c.cast("double")) * 1e6).cast("long")


def pmi_bigrams(docs: DataFrame, min_count: int = 5, k: int = 50) -> DataFrame:
    """T-21: pointwise mutual information of adjacent token pairs —
    the classic phrase-mining statistic (word2vec-style collocation
    detection; Church & Hanks 1990): PMI = ln(p(w1 w2) / (p(w1) *
    p(w2))), reported in integer micro-nats as
    ``q(c12) + 2 q(Nu) - q(Nb) - q(c1) - q(c2)`` where q = round(ln *
    1e6) — each ln quantized BEFORE the sum so the score is exact
    BIGINT arithmetic cross-engine.

    Shape: two map-side-combined counts (unigrams, bigram pairs); the
    bigram table joins the vocabulary-sized unigram table twice
    (broadcast at any realistic vocab) plus one broadcast single-row
    totals join; TakeOrderedAndProject top-k. Nothing corpus-sized is
    ever sorted; the ``min_count`` floor is applied before the join,
    which also bounds the candidate set at 100 TB.
    """
    toks = with_tokens(docs)
    uni = (
        toks.select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        toks.select(F.explode(F.expr(_ADJ_PAIRS)).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = F.broadcast(
        uni.agg(F.sum("c").alias("n_uni")).crossJoin(
            big.agg(F.sum("n").alias("n_big"))
        )
    )
    c1 = F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")))
    c2 = F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")))
    return (
        big.where(F.col("n") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(totals)
        .select(
            "w1",
            "w2",
            "n",
            (
                _ln_micro(F.col("n"))
                + 2 * _ln_micro(F.col("n_uni"))
                - _ln_micro(F.col("n_big"))
                - _ln_micro(F.col("c1"))
                - _ln_micro(F.col("c2"))
            ).alias("pmi_micro"),
        )
        .orderBy(F.desc("pmi_micro"), "w1", "w2")
        .limit(k)
    )


def lm_doc_scores(docs: DataFrame) -> DataFrame:
    """T-22: per-document negative log-likelihood under the corpus's
    own add-one-smoothed bigram language model — the "score every
    document with a cheap LM and gate on perplexity" quality filter
    every large pretraining pipeline runs (CCNet / KenLM-style, here
    with the corpus itself as the model). Per doc bigram (w1, w2):
    nll += ln(c(w1) + V) - ln(c(w1 w2) + 1), reported as the exact
    integer micro-nat total plus avg_nll = round(total / n, 2).

    Shape: the model IS two aggregation outputs (unigram and bigram
    count tables built in one pass each); scoring re-joins the
    per-doc bigram stream to the bigram table on (w1, w2) — an
    equi-join co-partitioned with the count build — and to the
    vocabulary-sized unigram table (broadcast); one final doc_id
    aggregation. At 100 TB the model tables are computed once and
    reused across scoring runs, and the unigram leg stays broadcast
    while the bigram leg is a bucketed join.

    Quantize-before-sum keeps the total exact; the only float op is
    the final integer/integer division, identical IEEE cross-engine.
    """
    toks = with_tokens(docs)
    doc_pairs = toks.select(
        "doc_id", F.explode(F.expr(_ADJ_PAIRS)).alias("p")
    ).select("doc_id", "p.w1", "p.w2")
    big = doc_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    uni = (
        toks.select(F.explode("tokens").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    vocab = F.broadcast(uni.agg(F.count(F.lit(1)).alias("v")))
    scored = (
        doc_pairs.join(big, ["w1", "w2"])
        .join(F.broadcast(uni), "w1")
        .crossJoin(vocab)
        .select(
            "doc_id",
            (
                _ln_micro(F.col("cu") + F.col("v"))
                - _ln_micro(F.col("cb") + F.lit(1))
            ).alias("term_micro"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("term_micro").alias("nll_micro_total"),
    )
    # left join back so zero-bigram docs keep a row (NULL score)
    return (
        toks.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "nll_micro_total",
            F.round(
                F.col("nll_micro_total").cast("double") / F.col("n_bigrams"), 2
            ).alias("avg_nll_micro"),
        )
        .orderBy("doc_id")
    )


def duplicate_ngram_fraction(docs: DataFrame, k: int = 3) -> DataFrame:
    """T-23: cross-document duplicate n-gram fraction — for each doc,
    the share of its distinct k-grams that also occur in at least one
    OTHER document (the Gopher/RefinedWeb-family duplication quality
    signal, the corpus-level complement of T-7's within-doc
    repetition): high values mark boilerplate and templated spam that
    per-pair dedup tiers only catch quadratically.

    Exactness: the fraction is a ratio of exact integers, rounded at
    1e-4; "occurs elsewhere" is corpus occurrences minus own
    occurrences (so a gram repeated only WITHIN the doc does not
    count — that is T-7's signal, not this one).

    Shape: one explode to distinct (doc, gram, own_count) rows, one
    map-side-combined gram count, one equi-join on the gram key, one
    doc_id aggregation — no pair expansion anywhere; this is the
    linear-cost screen that runs BEFORE the quadratic-candidate
    tiers. At 100 TB grams ride as md5 fingerprints.
    """
    from bigdata_logs_spark.operators.dedup import _shingles

    # cache: per_doc feeds both the corpus-count aggregation and the
    # join's probe side — uncached, the shingle explode runs twice
    per_doc = tracked_cache(
        with_tokens(docs)
        .select("doc_id", F.explode(_shingles()).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("own"))
    )
    corpus = per_doc.groupBy("gram").agg(F.sum("own").alias("corpus_n"))
    frac = F.round(
        F.sum((F.col("corpus_n") > F.col("own")).cast("int"))
        / F.count(F.lit(1)),
        4,
    )
    return (
        per_doc.join(corpus, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_grams"),
            frac.alias("dup_gram_fraction"),
        )
        .orderBy("doc_id")
    )


def confusable_usernames(parsed: DataFrame) -> DataFrame:
    """T-24: one-keystroke confusable usernames — for every attempted
    username, the count of OTHER attempted usernames within edit
    distance 1 (the typo-squat / credential-stuffing signal: `admin`
    vs `admln` attempts are one campaign, not two accounts).

    Candidate generation is the FastSS / SymSpell deletion
    neighbourhood (Bocek et al., 2007): each name emits itself plus
    every single-character deletion as blocking keys; two names
    within edit distance 1 ALWAYS share a key (substitution — both
    delete the differing position; insertion/deletion — the longer
    name's deletion equals the shorter name), so the equi-join on
    keys has exact recall with NO all-pairs scan, then the built-in
    `levenshtein` verifies. Output: one row per username with >= 1
    confusable neighbour.

    Scale shape: keys are linear in total name length; candidates are
    bounded by per-key occupancy (names sharing a deletion), so the
    self-join is an equi-join whose fan-out rides the key histogram —
    the LSH candidate->verify discipline applied to edit distance.
    """
    users = (
        parsed.where(F.col("user").isNotNull())
        .groupBy(F.col("user").alias("name"))
        .agg(F.count(F.lit(1)).alias("n_attempts"))
    )
    deletes = F.expr(
        "array_union(array(name), transform(sequence(1, length(name)), "
        "i -> concat(substring(name, 1, i - 1), substring(name, i + 1))))"
    )
    # cache: both sides of the deletion-key self-join read this —
    # uncached, the SSH parse + username aggregation + delete-variant
    # explode all run twice
    keyed = tracked_cache(
        users.select(
            "name", "n_attempts", F.explode(deletes).alias("k")
        ).distinct()
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.name") != F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name"),
            F.col("a.n_attempts").alias("n_attempts"),
            F.col("b.name").alias("neighbor"),
        )
        .distinct()
        .where(F.levenshtein("name", "neighbor") == 1)
    )
    return (
        pairs.groupBy("name", "n_attempts")
        .agg(
            F.count(F.lit(1)).alias("n_confusables"),
            F.min("neighbor").alias("first_neighbor"),
        )
        .orderBy("name")
    )


def kwic_concordance(
    docs: DataFrame, top_terms: int = 3, per_term: int = 50
) -> DataFrame:
    """T-25: keyword-in-context concordance — for the ``top_terms``
    most frequent tokens, every occurrence with two tokens of left
    and right context (the corpus-inspection view behind "why is this
    token so frequent": boilerplate shows identical contexts, organic
    usage varies), capped at ``per_term`` deterministic rows each.

    Scale shape: the term list is a broadcast top-k; occurrence
    extraction is one posexplode joined against it (corpus scanned
    once, narrow); context slices are per-row array expressions — no
    window over the corpus, and the per-term cap bounds the output.
    """
    from pyspark.sql import Window

    toks = with_tokens(docs).where(F.size("tokens") > 0)
    counts = (
        toks.select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = (
        counts.orderBy(F.desc("n"), "term")
        .limit(top_terms)
        .select("term")
    )
    occ = toks.select(
        "doc_id", "tokens", F.posexplode("tokens").alias("pos0", "term")
    ).withColumn("pos", F.col("pos0") + 1)
    left = F.array_join(
        F.slice(
            F.col("tokens"),
            F.greatest(F.col("pos") - 2, F.lit(1)),
            F.col("pos") - F.greatest(F.col("pos") - 2, F.lit(1)),
        ),
        " ",
    )
    right = F.array_join(
        F.slice(
            F.col("tokens"),
            F.col("pos") + 1,
            F.least(F.lit(2), F.size("tokens") - F.col("pos")),
        ),
        " ",
    )
    w = Window.partitionBy("term").orderBy("doc_id", "pos")
    return (
        occ.join(F.broadcast(top), "term")
        .select(
            "term",
            "doc_id",
            "pos",
            left.alias("left_ctx"),
            right.alias("right_ctx"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_term)
        .drop("rn")
        .orderBy("term", "doc_id", "pos")
    )


def inverted_index_postings(docs: DataFrame, top_n: int = 20) -> DataFrame:
    """PL-19: inverted-index construction — per token its document
    frequency, total term frequency, and the first 10 doc ids of the
    sorted posting list, for the ``top_n`` highest-df tokens (the
    retrieval-side index a RAG/search pipeline builds over the
    corpus; df/tf are also the raw inputs every BM25 variant needs).

    Scale shape: one explode -> per-(token, doc) tf (combinable),
    then a token-keyed window rank + aggregation SHARING one
    hash-partitioning: ``row_number`` over (token, doc_id) marks each
    token's 10 smallest doc ids with a spillable sort (no per-group
    buffer, however big a stopword's posting list is), and the
    aggregate's ``collect_list(when(rn <= 10, ...))`` accumulates at
    most 10 elements per group — df/tf stay plain combinable
    counters, so NO aggregation state anywhere grows with posting
    length (a full collect-then-slice would buffer a stopword's
    entire posting set). Top-k is TakeOrderedAndProject."""
    from pyspark.sql import Window

    tf = (
        with_tokens(docs)
        .select("doc_id", F.explode("tokens").alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # unique (token, doc_id) keys -> the rank is deterministic
    rn = F.row_number().over(
        Window.partitionBy("token").orderBy("doc_id")
    )
    posting = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.when(F.col("rn") <= 10, F.col("doc_id")))
            ),
            lambda v: v.cast("string"),
        ),
        ",",
    )
    return (
        tf.withColumn("rn", rn)
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            posting.alias("postings_head"),
        )
        .orderBy(F.desc("df"), "token")
        .limit(top_n)
    )


def bm25_topk(
    docs: DataFrame,
    n_query_terms: int = 3,
    skip_top: int = 9,
    k: int = 10,
) -> DataFrame:
    """T-26: BM25 document ranking (Robertson & Spärck Jones; the
    Okapi weighting behind Lucene/Elasticsearch and every BM25
    retrieval baseline) for a deterministic query — the
    ``n_query_terms`` vocabulary terms ranked ``skip_top+1..`` by
    document frequency (the all-docs stopwords above them carry ~zero
    idf, so the mid-frequency head is the honest self-contained
    query). Extends T-7's tf-idf with the saturation (k1) and
    length-normalization (b) terms that make BM25 the retrieval
    default: a 50-occurrence term isn't 50x more relevant, and long
    docs don't win by volume.

    Exactness: idf is quantize-each-ln micro-nats (exact BIGINT);
    k1 = 1.25 and b = 0.75 are exact binary fractions, so every float
    step (one dl/avgdl ratio, two fused multiply-free products, one
    division) is a single IEEE op on deterministic operands mirrored
    by the oracle; per-term scores round to BIGINT micro-units so the
    per-doc SUM is an exact integer reduction in any order.

    Scale shape: tf/df/dl are combinable aggregations off ONE explode
    pass; the query-term pick is a window over the vocabulary-sized
    df table; scoring joins tf against the BROADCAST 3-term query and
    the per-doc length — co-partitioned on doc_id; top-k is
    TakeOrderedAndProject. At 100 TB the tf/df/dl model tables are
    built once per corpus snapshot and reused across queries."""
    from pyspark.sql import Window

    toks = with_tokens(docs).select("doc_id", "tokens")
    # cache: tf feeds the df aggregation AND the scoring join —
    # uncached, the explode+agg runs twice (these are the "model
    # tables built once per corpus snapshot" of the contract below)
    tf = tracked_cache(
        toks.select("doc_id", F.explode("tokens").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = toks.select("doc_id", F.size("tokens").cast("long").alias("dl"))
    dfq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    total = dl.agg(F.sum("dl").alias("total_dl"))
    st = n_docs.crossJoin(total)
    # Vocabulary-sized window (the T-25/PL-19 precedent): the df table
    # is vocab-sized, never corpus-sized.
    w = Window.orderBy(F.desc("df"), "token")
    ln_micro = lambda c: F.round(  # noqa: E731
        F.log(c.cast("double")) * F.lit(1000000.0)
    ).cast("long")
    qt = (
        dfq.withColumn("r", F.row_number().over(w))
        .where((F.col("r") > skip_top) & (F.col("r") <= skip_top + n_query_terms))
        .crossJoin(F.broadcast(st))
        .select(
            "token",
            "df",
            (ln_micro(F.col("n_docs") + 1) - ln_micro(F.col("df") + 1)).alias(
                "idf_micro"
            ),
        )
    )
    scored = (
        tf.join(F.broadcast(qt), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            F.round(
                (F.col("idf_micro") * F.col("tf")).cast("double")
                * F.lit(2.25)
                / (
                    F.col("tf").cast("double")
                    + F.lit(1.25)
                    * (
                        F.lit(0.25)
                        + F.lit(0.75)
                        * (
                            F.col("dl").cast("double")
                            / (
                                F.col("total_dl").cast("double")
                                / F.col("n_docs")
                            )
                        )
                    )
                )
            )
            .cast("long")
            .alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum("s").alias("bm25_micro"),
        )
        .orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(k)
    )


RAKE_STOPWORDS = ("a", "the")
RAKE_MAX_PHRASE = 4
RAKE_TOP_K = 15


def rake_keyphrases(docs: DataFrame) -> DataFrame:
    """T-27: RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley
    2010) over the corpus — candidate phrases are the maximal runs of
    content words between stopwords/punctuation; each word scores
    degree/frequency (degree = summed length of every phrase it
    appears in), and a phrase scores the SUM of its member word
    scores. Where T-7's tf-idf ranks single TERMS per doc, RAKE
    surfaces multi-word PHRASES corpus-wide — the keyword-list view
    of what the corpus is about.

    Exactness: tokenization is pure deterministic string work
    (lowercase, punctuation -> delimiter, ``\\b(a|the)\\b`` ->
    delimiter, whitespace collapse); word scores are integer micro
    floor-divisions (degree*1e6 div freq) so per-phrase sums are
    order-free BIGINT reductions; one double division at the end.
    Top-k is total-ordered (score desc, phrase asc).

    Scale shape: phrase instances explode from one scan bounded by
    text length; word stats and phrase scores are combinable
    aggregations over (word) and (phrase) — both vocabulary-sized,
    orders of magnitude under corpus size; the word-score table
    BROADCASTS into the scoring join; top-k is
    TakeOrderedAndProject."""
    stop_alt = "|".join(RAKE_STOPWORDS)
    s = F.lower(F.trim(F.col("text")))
    s = F.regexp_replace(s, r"[^a-z0-9\s]+", " | ")
    s = F.regexp_replace(s, rf"\b({stop_alt})\b", "|")
    phr = (
        docs.select(F.explode(F.split(s, r"\|")).alias("rawp"))
        .select(
            F.regexp_replace(F.trim(F.col("rawp")), r"\s+", " ").alias(
                "phrase"
            )
        )
        .where(
            (F.col("phrase") != "")
            & (F.size(F.split(F.col("phrase"), " ")) <= RAKE_MAX_PHRASE)
        )
    )
    inst = phr.select(
        "phrase",
        F.split(F.col("phrase"), " ").alias("ws"),
    ).select("phrase", F.size("ws").alias("plen"), F.explode("ws").alias("w"))
    wstats = inst.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("degsum"),
    )
    wscore = wstats.select(
        "w", F.expr("degsum * 1000000 div freq").alias("wscore_micro")
    )
    pfreq = phr.groupBy("phrase").agg(F.count(F.lit(1)).alias("freq"))
    pwords = (
        phr.select("phrase")
        .distinct()
        .select(
            "phrase", F.explode(F.split(F.col("phrase"), " ")).alias("w")
        )
    )
    pscore = (
        pwords.join(F.broadcast(wscore), "w")
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("wscore_micro").alias("pscore_micro"),
        )
    )
    return (
        pscore.join(pfreq, "phrase")
        .select(
            "phrase",
            "n_words",
            "freq",
            F.round(
                F.col("pscore_micro").cast("double") / F.lit(1000000.0), 6
            ).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), F.asc("phrase"))
        .limit(RAKE_TOP_K)
    )


def readability_profile(docs: DataFrame) -> DataFrame:
    """T-28: per-source readability profile — Flesch reading ease and
    Flesch-Kincaid grade from three corpus-exact counts (words,
    sentences, syllable groups), the 1948/1975 formulas every
    document-quality rubric still quotes. T-2's quality score gates
    on surface ratios; the readability pair summarizes the same
    surface at the register level ("is this source textbook prose or
    telegraphese") and is the standard pre-filter knob for
    training-mix curation.

    The syllable count is the classic vowel-group heuristic: maximal
    ``[aeiouy]+`` runs in the lowercased text (counted as a length
    difference between two regex replacements — no per-word loop);
    sentences are maximal ``[.!?]+`` runs floored at 1 per document.
    Deterministic by construction — both engines run the identical
    regex replacements (DuckDB needs the explicit 'g' flag).

    Exactness: all three counts sum as exact BIGINTs per source; each
    formula spends six mirrored IEEE ops on two shared divisions.

    Scale shape: three narrow per-row expressions into one combinable
    per-source aggregation — one scan, nothing wider than a counter
    row shuffles."""
    low = F.lower(F.col("text"))
    vow_marked = F.length(F.regexp_replace(low, "[aeiouy]+", "#"))
    vow_gone = F.length(F.regexp_replace(low, "[aeiouy]+", ""))
    syl = vow_marked - vow_gone
    sen_marked = F.length(F.regexp_replace(low, "[.!?]+", "#"))
    sen_gone = F.length(F.regexp_replace(low, "[.!?]+", ""))
    sen = F.greatest(sen_marked - sen_gone, F.lit(1))
    nw = F.when(
        F.trim(F.col("text")) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    agg = (
        docs.select(
            "source",
            nw.cast("long").alias("w"),
            sen.cast("long").alias("s"),
            syl.cast("long").alias("y"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w").alias("n_words"),
            F.sum("s").alias("n_sentences"),
            F.sum("y").alias("n_syllable_groups"),
        )
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast(
        "double"
    )
    ypw = F.col("n_syllable_groups").cast("double") / F.col(
        "n_words"
    ).cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * ypw
    fk = F.lit(0.39) * wps + F.lit(11.8) * ypw - F.lit(15.59)
    ok = F.col("n_words") > 0
    return agg.select(
        "source",
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllable_groups",
        F.when(ok, F.round(flesch, 4)).alias("flesch"),
        F.when(ok, F.round(fk, 4)).alias("fk_grade"),
    ).orderBy("source")


def heaps_law(docs: DataFrame, checkpoints: int = 10) -> DataFrame:
    """T-29: Heaps'-law vocabulary-growth fit — cumulative distinct
    vocabulary V against cumulative token count N at ``checkpoints``
    doc-id milestones, with the log-log OLS fit V = k * N^beta
    (Heaps 1978; beta ~ 0.4-0.6 for natural corpora). T-17's Zipf
    slope profiles the FREQUENCY distribution at one instant; Heaps'
    beta profiles the GROWTH — a beta collapsing toward 0 while docs
    keep arriving is the classic templated/duplicated-corpus smell,
    and the k/beta pair predicts vocabulary (= embedding/hash table)
    size at 100x the corpus before you pay for the scan.

    Exactness and the scale trick: there is NO global running window
    — each token contributes its n_tokens to its doc, each distinct
    token contributes 1 to its FIRST doc (min doc_id), and both
    doc-granular tables aggregate against ``checkpoints`` broadcast
    doc-id thresholds cut by integer arithmetic over the doc-id
    range (lo-1 + span*i div cp) — so V(ck) and N(ck) are exact
    combinable BIGINT sums, one shuffle each, at any corpus size.
    The fit is T-17's quantized-ln discipline: round(ln * 1e6) BIGINT
    terms (ln is bit-identical cross-engine), exact integer
    co-moments, mirrored closed-form floats. ln k is reported rather
    than k = exp(...) because exp's cross-engine rounding is not
    pinned like ln's.
    """
    per_doc = with_tokens(docs).select(
        "doc_id", F.size("tokens").alias("m"), "tokens"
    )
    firsts = (
        per_doc.select("doc_id", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("fd"))
        .groupBy("fd")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    # cache the (doc_id, m) projection: it feeds the id-range probe
    # and the cumulative-token leg (two more tokenize passes
    # otherwise); two ints per doc, so the cache is metadata-sized —
    # deliberately NOT caching the token arrays for one more saved
    # pass (firsts keeps its own single explode)
    sizes = tracked_cache(per_doc.select("doc_id", "m"))
    rng = sizes.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    cks = (
        rng.select(
            F.explode(
                F.sequence(F.lit(1), F.lit(checkpoints))
            ).alias("ck"),
            "lo",
            "hi",
        )
        .select(
            "ck",
            F.expr("lo - 1 + ((hi - lo + 1) * ck) div " + str(checkpoints))
            .alias("ck_doc"),
        )
    )
    n_cum = (
        sizes
        .crossJoin(F.broadcast(cks))
        .where(F.col("doc_id") <= F.col("ck_doc"))
        .groupBy("ck", "ck_doc")
        .agg(F.sum("m").alias("n_tokens_cum"))
    )
    v_cum = (
        firsts.crossJoin(F.broadcast(cks))
        .where(F.col("fd") <= F.col("ck_doc"))
        .groupBy("ck")
        .agg(F.sum("v").alias("vocab_cum"))
    )
    pts = n_cum.join(v_cum, ["ck"]).where(
        (F.col("n_tokens_cum") > 0) & (F.col("vocab_cum") > 0)
    )
    xi = F.round(
        F.log(F.col("n_tokens_cum").cast("double")) * 1e6
    ).cast("long")
    yi = F.round(F.log(F.col("vocab_cum").cast("double")) * 1e6).cast("long")
    m = pts.select(xi.alias("x"), yi.alias("y")).agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_pts")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    beta = (n * sxy - sx * sy) / denom
    lnk = (sy - beta * sx) / n.cast("double") / F.lit(1e6)
    fit = m.select(
        F.when(denom > 0, F.round(beta, 4)).alias("heaps_beta"),
        F.when(denom > 0, F.round(lnk, 4)).alias("heaps_ln_k"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("ck").cast("long").alias("checkpoint"),
            "ck_doc",
            "n_tokens_cum",
            "vocab_cum",
            "heaps_beta",
            "heaps_ln_k",
        )
        .orderBy("checkpoint")
    )


def tokenizer_fertility(docs: DataFrame) -> DataFrame:
    """T-30: tokenizer fertility profile per language — subword tokens
    per whitespace word ("fertility") and characters per subword, the
    two numbers multilingual-tokenizer papers publish per language
    (high fertility = the tokenizer fragments that language, inflating
    sequence length and training cost for the same text). T-3 counts
    whitespace tokens; this is the comparison against a BPE-ish
    pre-tokenization — letter runs, digit runs, and single
    punctuation marks on the lowercased text — the deterministic
    stand-in for a learned BPE's pre-tokenizer split.

    Exactness: both token counts are regex-derived exact BIGINTs
    (array lengths of regexp_extract_all, a shared builtin); the two
    ratios each spend one IEEE division; languages with zero words
    report NULL.

    Scale shape: two narrow per-doc expressions, one combinable
    per-lang sum — no explode, no shuffle wider than |langs| rows."""
    words = F.size(
        F.expr(r"regexp_extract_all(trim(text), '[^\\s]+', 0)")
    )
    subs = F.size(
        F.expr(
            r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"
        )
    )
    per_doc = docs.select(
        "lang",
        F.when(words > 0, words).otherwise(F.lit(0)).alias("w"),
        F.when(subs > 0, subs).otherwise(F.lit(0)).alias("s"),
        F.length(F.regexp_replace(F.lower(F.col("text")), r"\s+", ""))
        .alias("ch"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("n_words"),
        F.sum("s").alias("n_subtokens"),
        F.sum("ch").alias("n_chars_nospace"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_subtokens",
        F.when(
            F.col("n_words") > 0,
            F.round(
                F.col("n_subtokens").cast("double")
                / F.col("n_words").cast("double"),
                4,
            ),
        ).alias("fertility"),
        F.when(
            F.col("n_subtokens") > 0,
            F.round(
                F.col("n_chars_nospace").cast("double")
                / F.col("n_subtokens").cast("double"),
                4,
            ),
        ).alias("chars_per_subtoken"),
    ).orderBy("lang")


def char_class_profile_arrow(docs: DataFrame) -> DataFrame:
    """U-7: ``mapInArrow`` character-class profile — per document, the
    count of letters, digits, whitespace and other characters,
    computed on raw Arrow RecordBatches with ``pyarrow.compute``
    kernels. Completes the Python extension taxonomy (grouped-map U-1,
    scalar pandas_udf U-2, stateful U-3, grouped-agg U-4, UDTF U-5,
    DataSource U-6) with the LOWEST-overhead escape hatch: no pandas
    materialization at all — batches stay in Arrow's columnar layout
    end-to-end, which is the right call for byte-level kernels over
    wide batches (the multimodal M-ops' natural upgrade path).

    Determinism: pyarrow, Spark's Java regex and DuckDB all implement
    single-character classes identically (pyarrow and DuckDB are both
    RE2), and counts of non-overlapping single-char matches are exact
    integers — so the Python-path output hash-matches a pure-SQL
    oracle, same contract as U-2. The native expression remains the
    hot path; this proves the escape hatch stays certifiable.

    Scale shape: embarrassingly parallel map over Arrow batches; no
    shuffle; output is one narrow row per document."""

    def profile(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            n_chars = pc.cast(pc.utf8_length(text), pa.int64())
            alpha = pc.cast(
                pc.count_substring_regex(text, "[A-Za-z]"), pa.int64()
            )
            digit = pc.cast(
                pc.count_substring_regex(text, "[0-9]"), pa.int64()
            )
            space = pc.cast(
                pc.count_substring_regex(text, r"\s"), pa.int64()
            )
            other = pc.subtract(
                pc.subtract(pc.subtract(n_chars, alpha), digit), space
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    n_chars,
                    alpha,
                    digit,
                    space,
                    other,
                ],
                names=[
                    "doc_id",
                    "n_chars",
                    "n_alpha",
                    "n_digit",
                    "n_space",
                    "n_other",
                ],
            )

    return docs.select("doc_id", "text").mapInArrow(
        profile,
        "doc_id bigint, n_chars bigint, n_alpha bigint, n_digit bigint,"
        " n_space bigint, n_other bigint",
    ).orderBy("doc_id")


def burrows_delta(docs: DataFrame, top_m: int = 30) -> DataFrame:
    """T-31: Burrows' Delta stylometric distance between sources
    (Burrows 2002, the standard authorship-attribution measure) —
    z-score each source's relative frequency of the corpus's
    ``top_m`` most frequent tokens (function words dominate that
    set, which is the point: style lives in function-word rates),
    then Delta(a, b) = mean |z_a - z_b| over the marker tokens. The
    curation angle: sources with near-zero Delta are stylistic
    clones (one crawler, one template), so a "diverse" mixture
    weighted by source count may be far less diverse than it looks —
    T-30 profiles a source's tokenizer cost, Delta profiles its
    style redundancy against every other source.

    Exactness: relative frequencies quantize to BIGINT micros at the
    (source, token) cell (one division each); each z-score is the
    integer co-moment form (n*f - Sf) / sqrt(n*Sff - Sf^2) — integer
    numerator, integer radicand, one sqrt + one division — and
    re-quantizes to micros so the final mean |dz| is an exact integer
    reduction with one closing division. Zero-variance markers (all
    sources at the same rate) contribute NULL z and are excluded from
    the pair mean identically on both engines.

    Scale shape: one tokenize pass -> (source, token) counts; the
    marker set is a corpus-wide top-m (TakeOrdered, vocabulary-
    bounded); everything pairwise runs on |sources|^2 x m rows."""
    toks = with_tokens(docs).select(
        "source", F.explode("tokens").alias("token")
    )
    # cache: cell feeds THREE consumers (per-source totals, the
    # corpus-wide marker top-m, and the grid join) — uncached, the
    # tokenize+explode+agg pipeline runs three times
    cell = tracked_cache(
        toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = cell.groupBy("source").agg(F.sum("cnt").alias("total"))
    markers = (
        cell.groupBy("token")
        .agg(F.sum("cnt").alias("corpus_cnt"))
        .orderBy(F.desc("corpus_cnt"), F.asc("token"))
        .limit(top_m)
        .select("token")
    )
    # every (source, marker) cell, zero-filled — a source that never
    # uses a marker is stylistic signal, not missing data
    grid = totals.crossJoin(F.broadcast(markers))
    fq = (
        grid.join(cell, ["source", "token"], "left")
        .select(
            "source",
            "token",
            F.round(
                F.coalesce(F.col("cnt"), F.lit(0)).cast("double")
                * F.lit(1e6)
                / F.col("total").cast("double")
            )
            .cast("long")
            .alias("fq"),
        )
    )
    stats = fq.groupBy("token").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("fq").alias("sf"),
        F.sum(F.col("fq") * F.col("fq")).alias("sff"),
    )
    varn = (
        F.col("n").cast("double") * F.col("sff").cast("double")
        - F.col("sf").cast("double") * F.col("sf").cast("double")
    )
    z = (
        F.col("n").cast("double") * F.col("fq").cast("double")
        - F.col("sf").cast("double")
    ) / F.sqrt(varn)
    zq = (
        fq.join(F.broadcast(stats), ["token"])
        .select(
            "source",
            "token",
            F.when(varn > 0, F.round(z * F.lit(1e6)).cast("long")).alias(
                "zq"
            ),
        )
        .where(F.col("zq").isNotNull())
    )
    za = zq.select(
        F.col("source").alias("source_a"), "token", F.col("zq").alias("za")
    )
    zb = zq.select(
        F.col("source").alias("source_b"), "token", F.col("zq").alias("zb")
    )
    pairs = za.join(zb, ["token"]).where(
        F.col("source_a") < F.col("source_b")
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_markers"),
            F.sum(F.abs(F.col("za") - F.col("zb"))).alias("sabs"),
        )
        .select(
            "source_a",
            "source_b",
            "n_markers",
            F.round(
                F.col("sabs").cast("double")
                / F.col("n_markers").cast("double")
                / F.lit(1e6),
                4,
            ).alias("delta"),
        )
        .orderBy("source_a", "source_b")
    )
