"""X4 — text analysis over the ``documents`` table (SURVEY.md §2.D).

LLM-training-pipeline text ops: token frequency, TF-IDF, language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All token work is JVM-side (``split``/``explode``/``regexp_extract_all``
/higher-order array functions) — no Python in the hot path; every
entry is DuckDB-oracle-backed.

Scale stance: explode → groupBy(term) is the classic word-count
shuffle — map-side partial aggregation absorbs the heavy hitters;
per-doc scores are pure projections (no shuffle at all); TF-IDF is
two hash aggregates + one broadcast-able join on term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.plans.registry import query, scoped_persist
from couchwarehouse_spark.plans.sizing import data_width

# Tiny English-stopword profile for the language-ID heuristic and
# quality scoring (public-knowledge stopword list).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


@query(
    "token_frequency",
    oracle="""
    SELECT term, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
)
def token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency, top-20 (X4: tokenize → explode → count).

    Scale: partial map-side combine collapses each partition's counts
    before the term shuffle; top-k is TakeOrderedAndProject. Tie-broken
    by term so the result is deterministic.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(20)
    )


@query(
    "tf_idf_top_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    ORDER BY tfidf DESC, tf.doc_id, tf.term
    LIMIT 25
    """,
)
def tf_idf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (X4): the most distinctive (doc, term) pairs.

    Two hash aggregates (term-frequency per doc, document-frequency
    per term) + a join on term. Scale: the DF side is |vocabulary|
    rows — deliberately UNHINTED, because a web-corpus vocabulary has
    a heavy tail (typos, ids) and is not guaranteed broadcastable;
    left to AQE the join broadcasts only when the vocabulary actually
    fits, else runs term-keyed (word-count-shaped, no hot key: df of
    a term caps at n_docs but the shuffle key space is the whole
    vocabulary). The corpus count is a scalar broadcast. Deterministic
    ordering by (tfidf, doc_id, term).
    """
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = tokens.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # Corpus size joins in as a broadcast single-row aggregate — one
    # lazy plan, no eager driver-side count() job.
    n_docs = d.agg(F.count("*").cast("double").alias("n_docs"))
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
        .orderBy(F.col("tfidf").desc(), "doc_id", "term")
        .limit(25)
    )


@query(
    "unigram_surprisal_scores",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    freq AS (
      SELECT term, count(*) AS c FROM tokens GROUP BY term
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq)
    SELECT t.doc_id,
           count(*)                              AS n_tokens,
           round(CAST(sum(CAST(round(1000000 * -ln(freq.c / tot.n)) AS BIGINT))
                 AS DOUBLE) / 1000000 / count(*), 6) AS avg_surprisal
    FROM tokens t JOIN freq USING (term) CROSS JOIN tot
    GROUP BY t.doc_id
    ORDER BY avg_surprisal DESC, t.doc_id
    LIMIT 20
    """,
)
def unigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal scoring (X4): per-doc average negative log
    probability of its tokens under the corpus unigram distribution —
    the model-free stand-in for the perplexity filter CCNet-style
    pipelines run (docs far above corpus-typical surprisal are noise;
    far below are boilerplate). Top-20 most surprising docs.

    Scale: one word-count aggregate builds the LM (|vocabulary| rows);
    scoring joins tokens back on term — deliberately UNHINTED like
    ``tf_idf_top_terms`` (AQE broadcasts a small vocab, shuffles a
    heavy-tailed one); the total-token scalar reduces the vocab-sized
    ``freq`` frame, NOT the corpus — summing per-term counts is the
    same number without a third tokenize-and-explode pass over every
    document. Per-doc reduce is (doc_id)-keyed; top-k is a
    per-partition heap. Each ``-ln(c/n)`` quantizes to integer
    micro-nats BEFORE the reduce (the ``ngram_entropy_rate`` idiom),
    so the per-doc average is an associative integer sum — rank order
    of the top-20 cannot flip on partitioning or summation order.
    """
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(_tokens()).alias("term"))
    freq = tokens.groupBy("term").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("n"))
    surp_micro = F.round(
        1_000_000 * -F.log(F.col("c") / F.col("n"))
    ).cast("long")
    return (
        tokens.join(freq, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(surp_micro).cast("double") / 1_000_000 / F.count("*"), 6
            ).alias("avg_surprisal"),
        )
        .orderBy(F.col("avg_surprisal").desc(), "doc_id")
        .limit(20)
    )


@query(
    "language_id_heuristic",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> list_contains({list(EN_STOPWORDS)!r}, t))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio
      FROM documents
    )
    SELECT lang,
           CASE WHEN stop_ratio >= 0.04 THEN 'en_like' ELSE 'other' END AS predicted,
           count(*) AS n_docs,
           round(avg(stop_ratio), 4) AS avg_stop_ratio
    FROM scored
    GROUP BY 1, 2
    """,
)
def language_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (X4): stopword-profile scoring.

    A real pipeline scores per-language n-gram/stopword profiles and
    argmaxes; here one English profile → binary call, crossed with the
    labelled ``lang`` so the output doubles as a confusion summary.
    Pure array expressions — ``filter``/``array_contains`` — no UDF.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    stop_ratio = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("double") / F.size(toks)
    return (
        d.select("lang", stop_ratio.alias("stop_ratio"))
        .select(
            "lang",
            F.when(F.col("stop_ratio") >= 0.04, "en_like")
            .otherwise("other")
            .alias("predicted"),
            "stop_ratio",
        )
        .groupBy("lang", "predicted")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
        )
    )


@query(
    "quality_scores",
    oracle=f"""
    WITH feat AS (
      SELECT source,
             n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> list_contains({list(EN_STOPWORDS)!r}, t))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_tokens >= 20 AND avg_token_len BETWEEN 3 AND 12
                          AND stop_ratio <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           round(avg(avg_token_len), 4) AS mean_token_len
    FROM feat
    GROUP BY source
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (X4): length / mean-token-length / stopword-ratio
    gates — the standard cheap pre-filters of LLM data pipelines
    (C4/Gopher-style rules, public knowledge). Pure expressions.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    feat = d.select(
        "source",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        (F.col("n_chars").cast("double") / F.size(toks)).alias("avg_token_len"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
            / F.size(toks)
        ).alias("stop_ratio"),
    )
    is_q = (
        (F.col("n_tokens") >= 20)
        & F.col("avg_token_len").between(3, 12)
        & (F.col("stop_ratio") <= 0.5)
    )
    return feat.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(is_q.cast("int")).cast("long").alias("n_quality"),
        F.round(F.avg("avg_token_len"), 4).alias("mean_token_len"),
    )


@query(
    "token_count_bpe_ish",
    oracle="""
    SELECT source,
           CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
             AS n_bpe_tokens,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens
    FROM documents
    GROUP BY source
    """,
)
def token_count_bpe_ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (X4): whitespace tokens vs a BPE-ish regex
    tokenizer (letter runs / digit runs / single other-chars) — the
    cheap token-budget estimator used before real BPE. JVM regex.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)))).alias(
            "n_bpe_tokens"
        ),
        F.sum(F.size(_tokens())).alias("n_ws_tokens"),
    )


@query(
    "doc_fingerprints",
    oracle="""
    WITH shingled AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    fp AS (
      SELECT doc_id, lang,
             CASE WHEN len(toks) >= 3 THEN
               list_min(list_transform(range(1, len(toks) - 1),
                 i -> md5(concat_ws(' ', list_extract(toks, i),
                                         list_extract(toks, i + 1),
                                         list_extract(toks, i + 2)))))
             ELSE md5(concat_ws(' ', list_sort(toks))) END AS fingerprint
      FROM shingled
    )
    SELECT lang,
           count(*) AS n_docs,
           count(DISTINCT fingerprint) AS n_fingerprints
    FROM fp
    GROUP BY lang
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (X4): winnowing-style — the minimum
    hash over word-3-gram shingles is a stable content fingerprint
    robust to local edits (MOSS/winnowing family, public knowledge).

    Built entirely from higher-order array functions: ``transform``
    over a shingle index range → ``md5`` → ``array_min``. Fingerprint
    collisions across distinct docs ≈ near-duplicates — the cheap
    pre-screen before MinHash (see plans.dedup).
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )  # md5-per-shingle is compute-dense; don't let one input file = one task
    toks = _tokens()
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            )
        ),
    )
    fingerprint = F.when(F.size(toks) >= 3, F.array_min(shingle_hashes)).otherwise(
        F.md5(F.concat_ws(" ", F.array_sort(toks)))
    )
    return (
        d.select("lang", fingerprint.alias("fingerprint"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_fingerprints"),
        )
    )


@query(
    "token_position_census",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' '))                         AS t,
             unnest(range(1, len(string_split(text, ' ')) + 1))      AS pos
      FROM documents
    )
    SELECT CAST(pos AS BIGINT)        AS pos,
           CAST(count(*) AS BIGINT)   AS n_tokens,
           CAST(count(DISTINCT t) AS BIGINT) AS n_distinct,
           min(t)                     AS first_token
    FROM tok
    WHERE pos <= 8
    GROUP BY pos
    """,
)
def token_position_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional vocabulary census via ``posexplode`` (the ordinal
    explode the C-arr family needs): for each of the first 8 token
    positions, corpus-wide token volume, vocabulary size, and the
    lexicographic first token. The DuckDB lane zips two parallel
    ``unnest`` calls, since it lacks WITH ORDINALITY.

    Scale: the position filter lands IN the generator's child (only 8
    positions survive the explode per doc before any shuffle), and the
    aggregate key has 8 groups — partial aggregation makes the
    exchange negligible.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    tok = d.select(
        F.posexplode(F.slice(F.split("text", " "), 1, 8)).alias("pos0", "t")
    )
    return (
        tok.select((F.col("pos0") + 1).cast("long").alias("pos"), "t")
        .groupBy("pos")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("t").alias("n_distinct"),
            F.min("t").alias("first_token"),
        )
    )


@query(
    "token_entropy_per_source",
    oracle="""
    WITH tc AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    counts AS (
      SELECT source, term, count(*) AS c FROM tc GROUP BY source, term
    ),
    tot AS (
      SELECT source, CAST(sum(c) AS DOUBLE) AS n, count(*) AS n_terms
      FROM counts GROUP BY source
    )
    SELECT counts.source,
           CAST(tot.n AS BIGINT)                                   AS total_tokens,
           tot.n_terms                                             AS distinct_terms,
           round(CAST(sum(CAST(round(1000000 * c * ln(tot.n / c)) AS BIGINT))
                 AS DOUBLE) / 1000000 / tot.n, 4)                  AS token_entropy
    FROM counts JOIN tot ON counts.source = tot.source
    GROUP BY counts.source, tot.n, tot.n_terms
    """,
)
def token_entropy_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon token entropy per source (X4 corpus-diversity signal):
    ``-Σ p ln p`` over the source's token distribution — low entropy
    flags template-y / repetitive sources before they skew a training
    mix (the aggregate cousin of ``repetition_census``'s per-doc
    ratios).

    Scale: word-count shuffle on (source, term) with map-side partial
    aggregation, then per-source totals join back — the totals table
    is |sources| rows, broadcast. Entropy reduces in the
    ``c·ln(n/c)`` form (−Σ p·ln p = (1/n)·Σ c·ln(n/c)) with each
    term quantized to integer micro-nats BEFORE the sum (the
    ``ngram_entropy_rate`` idiom) — the integer-count multiplier
    keeps quantized terms ≥ ln(n)·10⁶, and the integer sum is
    associative, so the 4-dp result is partitioning-proof.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("source", F.explode(_tokens()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("c"))
    )
    tot = counts.groupBy("source").agg(
        F.sum("c").cast("double").alias("n"), F.count("*").alias("n_terms")
    )
    h_micro = F.round(
        1_000_000 * F.col("c") * F.log(F.col("n") / F.col("c"))
    ).cast("long")
    return (
        counts.join(F.broadcast(tot), "source")
        .groupBy("source", "n", "n_terms")
        .agg(
            F.round(
                F.sum(h_micro).cast("double") / 1_000_000 / F.col("n"), 4
            ).alias("token_entropy")
        )
        .select(
            "source",
            F.col("n").cast("long").alias("total_tokens"),
            F.col("n_terms").alias("distinct_terms"),
            "token_entropy",
        )
    )


@query(
    "bigram_stats",
    oracle="""
    WITH t AS (
      SELECT lang, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT lang,
             unnest(list_transform(range(1, len(w)),
               i -> concat_ws(' ', list_extract(w, i), list_extract(w, i + 1)))) AS bigram
      FROM t WHERE len(w) >= 2
    )
    SELECT lang,
           count(*)                    AS total_bigrams,
           count(DISTINCT bigram)      AS distinct_bigrams,
           min(bigram)                 AS min_bigram,
           max(bigram)                 AS max_bigram
    FROM bg
    GROUP BY lang
    """,
)
def bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram census per lang (X4 n-gram statistics — the
    counting kernel under any n-gram LM / contamination scan): total
    and distinct bigram counts plus lexicographic extrema.

    Scale: same word-count shape as ``token_frequency``, but staged as
    TWO aggregates — (lang, bigram) counts first (map-side partial
    combine collapses repeats before the shuffle), then per-lang
    totals derived from the count table. One ``agg`` mixing count(*)
    with countDistinct would instead plan an Expand (every row
    duplicated per aggregate group) and shuffle twice the rows.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    # Compute-dense per-row explosion: widen first — one small parquet
    # file would otherwise run the whole explode as a single task.
    counts = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .filter(F.size(toks) >= 2)
        .select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("c"))
    )
    return counts.groupBy("lang").agg(
        F.sum("c").alias("total_bigrams"),
        F.count("*").alias("distinct_bigrams"),
        F.min("bigram").alias("min_bigram"),
        F.max("bigram").alias("max_bigram"),
    )


COVERAGE_TOP_K = 10


@query(
    "token_coverage_topk",
    oracle=f"""
    WITH counts AS (
      SELECT lang, term, count(*) AS c
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY lang, term
    ),
    ranked AS (
      SELECT lang, c,
             row_number() OVER (PARTITION BY lang ORDER BY c DESC, term) AS rnk
      FROM counts
    )
    SELECT lang,
           CAST(sum(c) AS BIGINT)                                   AS total_tokens,
           CAST(sum(CASE WHEN rnk <= {COVERAGE_TOP_K} THEN c ELSE 0 END) AS BIGINT)
                                                                    AS topk_tokens,
           round(CAST(sum(CASE WHEN rnk <= {COVERAGE_TOP_K} THEN c ELSE 0 END) AS DOUBLE)
                 / sum(c), 6)                                       AS topk_coverage
    FROM ranked
    GROUP BY lang
    """,
)
def token_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-coverage curve point (X4): the fraction of ALL token
    occurrences accounted for by each language's top-10 terms — high
    coverage means a head-heavy (template-y) corpus, low coverage a
    diverse one; the number tokenizer/vocab sizing decisions read.

    Scale: word-count aggregate first (map-side combine collapses the
    corpus to its vocabulary), THEN the rank window runs over the
    per-lang vocabulary table — thousands of rows per stratum, never
    the corpus. Deterministic tie-break (count desc, term asc).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(_tokens()).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), "term")
    ranked = counts.withColumn("rnk", F.row_number().over(w))
    topk = F.when(F.col("rnk") <= COVERAGE_TOP_K, F.col("c")).otherwise(0)
    return ranked.groupBy("lang").agg(
        F.sum("c").alias("total_tokens"),
        F.sum(topk).alias("topk_tokens"),
        F.round(F.sum(topk).cast("double") / F.sum("c"), 6).alias("topk_coverage"),
    )


CHUNK_WINDOW = 32   # tokens per training chunk
CHUNK_STRIDE = 16   # overlap = window - stride


@query(
    "doc_chunking",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (SELECT doc_id, toks, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS s FROM t)
    SELECT doc_id,
           s // {CHUNK_STRIDE} AS chunk_id,
           len(list_slice(toks, s + 1, s + {CHUNK_WINDOW})) AS n_tokens,
           array_to_string(list_slice(toks, s + 1, s + {CHUNK_WINDOW}), ' ') AS chunk_text
    FROM c
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (X4/X+): split every document
    into overlapping CHUNK_WINDOW-token chunks at stride
    CHUNK_STRIDE — the standard context-window packing prep for LLM
    training (each token appears in ≤2 chunks; boundaries never lose
    context). Companion to ``sequence_packing``, which bins whole
    documents; this op SPLITS documents that exceed the window.

    Scale: pure per-row work — ``sequence`` + ``explode`` + ``slice``
    are all JVM-side array expressions, zero shuffles, zero Python.
    Chunk fan-out is bounded (len/stride per doc) so partition sizes
    grow by a constant factor; the explode keeps the scan's partition
    pruning and column projection intact.
    """
    d = load_table(spark, sf_dir, "documents")
    chunks = (
        d.select("doc_id", _tokens().alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(
                    F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE)
                )
            ).alias("s"),
        )
        .select(
            "doc_id",
            F.expr(f"s DIV {CHUNK_STRIDE}").alias("chunk_id"),
            F.slice(F.col("toks"), F.col("s") + 1, CHUNK_WINDOW).alias("chunk"),
        )
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("chunk").cast("long").alias("n_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


@query(
    "bpe_pair_census",
    oracle="""
    WITH words AS (
      SELECT word, count(*) AS wc
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) >= 2
      GROUP BY word
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(word)),
                                   i -> substr(word, CAST(i AS INTEGER), 2))) AS pair,
             wc
      FROM words
    )
    SELECT pair, CAST(sum(wc) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 10
    """,
)
def bpe_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge-selection kernel (X4 tokenizer-training prep):
    corpus-frequency of every ADJACENT CHARACTER PAIR, weighted by
    word occurrence counts — the statistic byte-pair encoding
    maximizes at each merge step (Sennrich et al., public method).
    Iterating = apply the top pair as a merge and re-run; this entry
    certifies one step's counts exactly.

    Scale: the corpus collapses to its VOCABULARY first (word-count
    aggregate, map-side combined — the heavy-hitter shuffle never
    carries document payloads), then pair explosion runs over
    distinct words only (thousands of rows, not the corpus); the
    pair aggregate is another word-count shape and top-10 is a heap.
    """
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(_tokens()).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substring(F.col("word"), i, F.lit(2)),
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(10)
    )


# Posting-list head size: the index stores each term's first block
# of postings inline (block-max / skip-list head); the tail lives in
# further blocks. Bounding the block keeps any one reducer's state
# fixed-size regardless of how hot the term is.
POSTINGS_BLOCK = 32


@query(
    "inverted_index_postings",
    oracle=f"""
    WITH tokens AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    df AS (SELECT term, count(*) AS df FROM tokens GROUP BY term),
    ranked AS (
      SELECT term, doc_id,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM tokens
    )
    SELECT r.term,
           CAST(any_value(df.df) AS BIGINT) AS df,
           string_agg(r.doc_id, ',' ORDER BY r.doc_id) AS postings_head
    FROM ranked r JOIN df ON r.term = df.term
    WHERE r.rn <= {POSTINGS_BLOCK}
    GROUP BY r.term
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (S19/X4 — the distributed index-construction
    kernel behind every full-text engine): term → document frequency +
    the first {POSTINGS_BLOCK}-entry posting block (sorted doc_ids,
    CSV-serialized — the delta-encodable byte shape a real index
    stores; the tail would live in further blocks keyed (term,
    block_no)).

    Scale: tokenize → per-doc DISTINCT (map-side, bounded by doc
    length) → df is one word-count-shaped hash aggregate; the posting
    head uses row_number ≤ K, which Spark executes as
    WindowGroupLimit — each map task forwards at most K candidate
    postings per term BEFORE the shuffle, so a stopword-hot term costs
    K rows per partition, never its full posting list on one reducer.
    The df table is vocab-sized: the join back is a broadcast. This is
    exactly the segment shape ES/Lucene builds per shard (the
    reference's ES target delegates it; couchwarehouse feeds it via
    the _bulk egress, sinks/elasticsearch.py).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    tokens = d.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("term")
    )
    df_tbl = tokens.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    heads = (
        tokens.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= POSTINGS_BLOCK)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head")
        )
    )
    return heads.join(F.broadcast(df_tbl), "term").select(
        "term", "df", "postings_head"
    )


N_BPE_MERGES = 3  # merges applied from one census (batched-BPE shortcut)


@query(
    "bpe_apply_merges",
    oracle=f"""
    WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    bg AS (
      SELECT list_extract(toks, i) AS a, list_extract(toks, i + 1) AS b
      FROM t, (SELECT unnest(range(1, 4096)) AS i) g
      WHERE i < len(toks)
    ),
    top3 AS (
      SELECT a, b, row_number() OVER (ORDER BY count(*) DESC, a, b) AS rk
      FROM bg GROUP BY a, b
      ORDER BY count(*) DESC, a, b LIMIT {N_BPE_MERGES}
    ),
    padded AS (
      SELECT lang, ' ' || replace(array_to_string(toks, ' '), ' ', '  ') || ' ' AS s,
             len(toks) AS n_before
      FROM t
    ),
    m1 AS (SELECT lang, n_before, replace(s,
             (SELECT ' ' || a || '  ' || b || ' ' FROM top3 WHERE rk = 1),
             (SELECT ' ' || a || '_' || b || ' ' FROM top3 WHERE rk = 1)) AS s FROM padded),
    m2 AS (SELECT lang, n_before, replace(s,
             (SELECT ' ' || a || '  ' || b || ' ' FROM top3 WHERE rk = 2),
             (SELECT ' ' || a || '_' || b || ' ' FROM top3 WHERE rk = 2)) AS s FROM m1),
    m3 AS (SELECT lang, n_before, replace(s,
             (SELECT ' ' || a || '  ' || b || ' ' FROM top3 WHERE rk = 3),
             (SELECT ' ' || a || '_' || b || ' ' FROM top3 WHERE rk = 3)) AS s FROM m2)
    SELECT lang,
           CAST(count(*) AS BIGINT)          AS n_docs,
           CAST(sum(n_before) AS BIGINT)     AS tokens_before,
           CAST(sum(len(regexp_split_to_array(trim(s), ' +'))) AS BIGINT)
                                             AS tokens_after,
           CAST(sum(len(s) - len(replace(s, '_', ''))) AS BIGINT)
                                             AS merged_units
    FROM m3
    GROUP BY lang
    """,
)
def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-apply kernel (X4, companion to ``bpe_pair_census``):
    select the corpus's top-{N_BPE_MERGES} adjacent-pair merges (exact
    census, deterministic (count DESC, pair) tie-break) and APPLY them
    to every document, reporting per-lang token counts before/after
    and merged-unit occurrences — the batched-BPE shortcut (k merges
    from one census; true BPE re-censuses between merges, which is
    this same job iterated, cf. graph_pagerank_3iter for the
    iterate-a-kernel pattern).

    Adjacency via the space-doubling trick: inter-token gaps become
    two spaces, so each literal ``' a  b '`` replacement consumes one
    space from each side and NEVER overlaps its neighbor's match —
    plain left-to-right replace-all, identical semantics in both
    engines, no regex anywhere (tokens here are alphanumeric; a
    general tokenizer would hash tokens to ids first, same dataflow).

    Scale: the census is the word-count shuffle (map-side partial);
    the 3 winning merges collapse to a 3-row broadcast array and
    application is a pure per-row fold projection (``F.aggregate``
    over the broadcast merges) — no second shuffle, no Python; the
    final per-lang aggregate is ~5 groups.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    toks = d.select("lang", _tokens().alias("toks"))
    bigrams = toks.select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                ),
            ).otherwise(F.array())
        ).alias("p")
    )
    top3 = (
        bigrams.groupBy("p.a", "p.b")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "a", "b")
        .limit(N_BPE_MERGES)
        .select(
            F.concat(F.lit(" "), "a", F.lit("  "), "b", F.lit(" ")).alias("pat"),
            F.concat(F.lit(" "), "a", F.lit("_"), "b", F.lit(" ")).alias("rep"),
            # Sort key reproducing the census rank EXACTLY: (-n, a, b)
            # ascending ≡ (n DESC, a ASC, b ASC). reverse(array_sort)
            # would flip the a/b tie-break and reorder tied merges
            # relative to the oracle's rk sequence.
            F.struct((-F.col("n")).alias("negn"), "a", "b").alias("ord"),
        )
    )
    # One row holding the ranked merges, in census-rank order.
    merges_row = top3.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ord"), F.col("pat"), F.col("rep")))
        ).alias("ms")
    ).select(
        F.transform("ms", lambda m: F.struct(m["pat"].alias("pat"), m["rep"].alias("rep"))).alias("ms")
    )

    padded = d.select(
        "lang",
        F.size(_tokens()).alias("n_before"),
        F.concat(
            F.lit(" "), F.replace(F.col("text"), F.lit(" "), F.lit("  ")), F.lit(" ")
        ).alias("s"),
    )
    applied = padded.crossJoin(F.broadcast(merges_row)).select(
        "lang",
        "n_before",
        F.aggregate(
            "ms",
            F.col("s"),
            lambda acc, m: F.replace(acc, m["pat"], m["rep"]),
        ).alias("s"),
    )
    return applied.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_before").cast("long").alias("tokens_before"),
        F.sum(F.size(F.split(F.trim("s"), " +"))).cast("long").alias("tokens_after"),
        F.sum(
            F.length("s") - F.length(F.replace(F.col("s"), F.lit("_"), F.lit("")))
        ).cast("long").alias("merged_units"),
    )


@query(
    "bigram_surprisal_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    pos AS (
      SELECT doc_id, unnest(toks) AS w,
             generate_subscripts(toks, 1) AS p
      FROM t
    ),
    big AS (
      SELECT a.doc_id, a.w AS w1, b.w AS w2
      FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
    ),
    c12 AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS n FROM c12 GROUP BY w1)
    SELECT big.doc_id,
           CAST(count(*) AS BIGINT)                       AS n_bigrams,
           round(CAST(sum(CAST(round(1000000 * -ln(c12.c / CAST(c1.n AS DOUBLE)))
                 AS BIGINT)) AS DOUBLE) / 1000000 / count(*), 6) AS avg_surprisal
    FROM big
    JOIN c12 USING (w1, w2)
    JOIN c1 USING (w1)
    GROUP BY big.doc_id
    ORDER BY avg_surprisal DESC, big.doc_id
    LIMIT 20
    """,
)
def bigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal scoring (X4 — the conditional-probability
    step up from ``unigram_surprisal_scores``): per-doc average
    -ln p(w2|w1) under the corpus bigram model (c12/c1), surfacing the
    20 most surprising documents. The bigram LM catches scrambled or
    machine-garbled text that unigram frequency scoring misses — token
    sets look normal, transitions don't — which is exactly the CCNet/
    Gopher-style perplexity-filter role, model-free.

    Scale: bigrams come from ONE pass per document (array zip of the
    token list with its tail — no position self-join; the oracle's
    join states the same pairs declaratively). The LM is a (w1,w2)
    hash aggregate with map-side combine; conditional totals reduce
    the c12 table, not the corpus; scoring joins bigrams back
    UNHINTED (AQE broadcasts a small LM, shuffles a heavy-tailed
    one — the ``tf_idf_top_terms`` stance). Per-doc reduce is
    (doc_id)-keyed; top-20 is a per-partition heap. Each ``-ln(c/n)``
    quantizes to integer micro-nats before the reduce (the
    ``ngram_entropy_rate`` idiom) so the average — and the top-20
    ranking on it — is summation-order-proof.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    bigram_structs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(bigram_structs).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    big = scoped_persist(big)
    c12 = big.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    c1 = c12.groupBy("w1").agg(F.sum("c").alias("n"))
    return (
        big.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.round(
                        1_000_000
                        * -F.log(F.col("c") / F.col("n").cast("double"))
                    ).cast("long")
                ).cast("double")
                / 1_000_000
                / F.count("*"),
                6,
            ).alias("avg_surprisal"),
        )
        .orderBy(F.col("avg_surprisal").desc(), "doc_id")
        .limit(20)
    )


SPAN_START_MOD = 7  # ≈1/7 of positions seed a corruption span
SPAN_LEN_MOD = 3  # span length 1 + h%3 ∈ {1,2,3}


@query(
    "span_corruption_census",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
               FROM documents),
    pos AS (
      SELECT doc_id, source, len(toks) AS n_tokens,
             unnest(range(0, len(toks))) AS p
      FROM t
    ),
    starts AS (
      SELECT doc_id, source, n_tokens, p,
             1 + CAST(('0x' || substr(md5(doc_id || ':' || p), 17, 2))
                      AS BIGINT) % {SPAN_LEN_MOD} AS span_len
      FROM pos
      WHERE CAST(('0x' || substr(md5(doc_id || ':' || p), 1, 15)) AS BIGINT)
            % {SPAN_START_MOD} = 0
    ),
    masked AS (
      SELECT DISTINCT doc_id, source, n_tokens,
             unnest(range(p, least(p + span_len, n_tokens))) AS mp
      FROM starts
    ),
    runs AS (
      SELECT doc_id, source, n_tokens, mp,
             CASE WHEN lag(mp) OVER (PARTITION BY doc_id ORDER BY mp)
                       IS DISTINCT FROM mp - 1 THEN 1 ELSE 0 END AS is_head
      FROM masked
    ),
    per_doc AS (
      SELECT doc_id, any_value(source) AS source,
             any_value(n_tokens) AS n_tokens,
             count(*) AS n_masked, sum(is_head) AS n_spans
      FROM runs GROUP BY doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT)        AS n_docs_masked,
           CAST(sum(n_tokens) AS BIGINT)   AS total_tokens,
           CAST(sum(n_masked) AS BIGINT)   AS total_masked,
           CAST(sum(n_spans) AS BIGINT)    AS total_spans,
           round(CAST(sum(n_masked) AS DOUBLE) / sum(n_tokens), 6)
             AS mask_ratio
    FROM per_doc GROUP BY source
    """,
)
def span_corruption_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption mask planning (X4 — the T5/UL2 pretraining
    objective's data-prep kernel): deterministic hash-seeded span
    starts (≈1/{SPAN_START_MOD} of positions) each mask 1..{SPAN_LEN_MOD}
    tokens; overlapping spans merge into islands. The census reports,
    per source, how much text the objective would corrupt and into
    how many spans — the numbers that calibrate noise density before
    a pretraining run (and the same salted-hash determinism the
    split/resample entries use, so masks are reproducible across
    epochs and engines).

    Scale: position explosion is a projection; span fan-out is ≤
    {SPAN_LEN_MOD}× the start rows; island heads come from ONE
    (doc_id)-keyed window over masked positions (per-partition state
    = one doc's masks); the rollup is a per-source hash aggregate.
    Entirely JVM-side md5 arithmetic — no Python, no RNG state.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    pos = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            "source",
            F.size(toks).alias("n_tokens"),
            F.explode(F.sequence(F.lit(0), F.size(toks) - 1)).alias("p"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    key = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("p")))
    h_start = F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % SPAN_START_MOD
    span_len = 1 + F.conv(F.substring(key, 17, 2), 16, 10).cast("long") % SPAN_LEN_MOD
    starts = pos.filter(h_start == 0).select(
        "doc_id", "source", "n_tokens", "p", span_len.alias("span_len")
    )
    masked = (
        starts.select(
            "doc_id",
            "source",
            "n_tokens",
            F.explode(
                F.sequence(
                    F.col("p"),
                    F.least(
                        F.col("p") + F.col("span_len") - 1, F.col("n_tokens") - 1
                    ),
                )
            ).alias("mp"),
        )
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("mp")
    runs = masked.withColumn(
        "is_head",
        F.when(
            F.lag("mp").over(w).isNull() | (F.lag("mp").over(w) != F.col("mp") - 1),
            1,
        ).otherwise(0),
    )
    per_doc = runs.groupBy("doc_id").agg(
        F.first("source").alias("source"),
        F.first("n_tokens").alias("n_tokens"),
        F.count("*").alias("n_masked"),
        F.sum("is_head").alias("n_spans"),
    )
    # Docs whose hash seeded no span at all drop from the census —
    # n_docs_masked counts corrupted docs, not the corpus.
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs_masked"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_masked").alias("total_masked"),
        F.sum("n_spans").alias("total_spans"),
        F.round(
            F.sum("n_masked").cast("double") / F.sum("n_tokens"), 6
        ).alias("mask_ratio"),
    )


KN_TOP_K = 20


@query(
    "kn_continuation_counts",
    oracle=f"""
    WITH t AS (
      SELECT string_split(text, ' ') AS w FROM documents
    ),
    big AS (
      SELECT unnest(list_transform(range(1, len(w)),
               i -> {{'w1': list_extract(w, i), 'w2': list_extract(w, i + 1)}}),
             recursive := true)
      FROM t WHERE len(w) >= 2
    ),
    types AS (SELECT DISTINCT w1, w2 FROM big),
    n_types AS (SELECT count(*) AS n FROM types)
    SELECT w2                            AS term,
           count(*)                      AS left_continuation,
           round(count(*) / (SELECT CAST(n AS DOUBLE) FROM n_types), 6)
                                         AS p_continuation
    FROM types
    GROUP BY w2
    ORDER BY left_continuation DESC, term
    LIMIT {KN_TOP_K}
    """,
)
def kn_continuation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation counts (X4 — the smoothing statistic
    under interpolated-KN n-gram LMs, Kneser & Ney 1995): for each
    word, N1+(· w) = how many DISTINCT left contexts it follows, and
    the KN lower-order probability p_cont(w) = N1+(· w) / |bigram
    types|. Words with high raw frequency but low continuation count
    ("Francisco") get correctly down-weighted as backoff candidates —
    the classic motivation for the statistic — which also makes it a
    boilerplate detector: templated corpora show token types locked
    to few contexts.

    Scale: bigrams from one array zip per document (no position
    self-join), then a (w1, w2) DISTINCT — a hash aggregate with
    map-side partial dedup — and a (w2) count over the TYPE table,
    which is already far smaller than the corpus. The |types|
    denominator is a one-row aggregate cross-joined (broadcast) onto
    the result; top-k is TakeOrderedAndProject. Integer counts; only
    the final ratio is a rounded double.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    bigram_structs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    types = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .filter(F.size(toks) >= 2)
        .select(F.explode(bigram_structs).alias("bg"))
        .select("bg.w1", "bg.w2")
        .distinct()
    )
    types = scoped_persist(types)
    n_types = types.agg(F.count("*").cast("double").alias("n"))
    return (
        types.groupBy(F.col("w2").alias("term"))
        .agg(F.count("*").alias("left_continuation"))
        .crossJoin(F.broadcast(n_types))
        .select(
            "term",
            "left_continuation",
            F.round(F.col("left_continuation") / F.col("n"), 6).alias(
                "p_continuation"
            ),
        )
        .orderBy(F.col("left_continuation").desc(), "term")
        .limit(KN_TOP_K)
    )


COVERAGE_THRESHOLDS = (50, 90, 99)  # percent of token mass to cover


@query(
    "vocab_coverage_curve",
    oracle=f"""
    WITH counts AS (
      SELECT term, count(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    ),
    ranked AS (
      SELECT c,
             row_number() OVER (ORDER BY c DESC, term) AS rnk,
             sum(c) OVER (ORDER BY c DESC, term
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER () AS total
      FROM counts
    )
    SELECT t.threshold_pct,
           min(rnk)                       AS vocab_size,
           CAST(min(cum) AS BIGINT)       AS tokens_covered,
           CAST(min(total) AS BIGINT)     AS total_tokens
    FROM ranked
    JOIN (VALUES {', '.join(f'({t})' for t in COVERAGE_THRESHOLDS)})
         AS t(threshold_pct) ON cum * 100 >= total * t.threshold_pct
    GROUP BY t.threshold_pct
    ORDER BY t.threshold_pct
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-size sizing curve (X4 — the tokenizer budget
    question): the smallest head-vocabulary covering 50 / 90 / 99 %
    of all token occurrences. The knee of this curve is how vocab
    sizes get chosen; a tiny 99 %-vocab flags a template corpus, a
    huge one flags noise/typos that BPE will spend merges on.

    Scale: the corpus collapses to its vocabulary in one word-count
    aggregate (map-side combine); the rank/cumsum window runs over
    the VOCAB table ordered by count — vocabulary-sized, not
    corpus-sized (single-partition window over ~10⁵-10⁷ vocab rows is
    the standard and acceptable cost; for web-scale vocabularies the
    same curve is computed on the count histogram instead). The
    threshold probe is a 3-row broadcast join; ``cum·100 ≥ total·t``
    stays in integers. Tie-break (count desc, term) makes the curve
    deterministic.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), "term")
    ranked = counts.select(
        "c",
        F.row_number().over(w).alias("rnk"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    thresholds = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in COVERAGE_THRESHOLDS])).alias(
            "threshold_pct"
        )
    )
    return (
        ranked.join(
            F.broadcast(thresholds),
            F.col("cum") * 100 >= F.col("total") * F.col("threshold_pct"),
        )
        .groupBy("threshold_pct")
        .agg(
            F.min("rnk").alias("vocab_size"),
            F.min("cum").alias("tokens_covered"),
            F.min("total").alias("total_tokens"),
        )
        .orderBy("threshold_pct")
    )


FH_DIM = 32  # hashed feature-space dimensionality (buckets)


@query(
    "feature_hashing_vectorizer",
    oracle=f"""
    WITH tf AS (
      SELECT term, count(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    ),
    h AS (
      SELECT term, c,
             CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) % {FH_DIM} AS bucket,
             CASE WHEN CAST(('0x' || substr(md5('sgn:' || term), 1, 15)) AS BIGINT)
                       % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tf
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT)     AS n_terms,
           CAST(sum(c) AS BIGINT)       AS total_count,
           CAST(sum(sgn * c) AS BIGINT) AS signed_mass
    FROM h
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def feature_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing ("hashing trick") vectorizer census (X4):
    corpus term frequencies folded into a fixed FH_DIM-bucket hashed
    feature space with md5-derived signed hashing (Weinberger et al.
    2009, "Feature Hashing for Large Scale Multitask Learning") — the
    fixed-width text featurizer used when the vocabulary is unbounded.
    Per bucket: how many distinct terms collided into it, the raw
    token mass, and the SIGNED mass (the sign hash makes collisions
    cancel in expectation — the paper's variance argument). All three
    are exact integers; the md5-derived bucket/sign evaluate
    identically in both engines (the ``md5_long`` idiom).

    Scale: the corpus reduces to the VOCABULARY-sized term-frequency
    table first (word-count shuffle with map-side combine); hashing
    and the FH_DIM-group aggregate then run on |vocab| rows, not
    |tokens| — at 100 TB the second aggregate's input is millions of
    rows, its output {FH_DIM}.
    """
    from couchwarehouse_spark.plans.dedup import md5_long

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    sgn = F.when(
        md5_long(F.concat(F.lit("sgn:"), F.col("term"))) % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        tf.select(
            (md5_long(F.col("term")) % FH_DIM).alias("bucket"),
            "c",
            sgn.alias("sgn"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("c").alias("total_count"),
            F.sum(F.col("sgn") * F.col("c")).alias("signed_mass"),
        )
        .orderBy("bucket")
    )


HEAPS_CHECKPOINTS = (10, 25, 50, 100)  # percent-of-corpus prefixes


@query(
    "heaps_law_vocab_growth",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    pct AS (SELECT unnest({list(HEAPS_CHECKPOINTS)!r}) AS pct),
    cut AS (SELECT pct, (n_docs * pct + 99) // 100 AS cutoff FROM pct CROSS JOIN n),
    first_seen AS (
      SELECT term, min(doc_id) AS first_doc
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    ),
    doc_tok AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    )
    SELECT c.pct,
           CAST(c.cutoff AS BIGINT) AS cutoff_docs,
           (SELECT CAST(sum(n_tok) AS BIGINT) FROM doc_tok
             WHERE doc_id < c.cutoff) AS n_tokens_cum,
           (SELECT CAST(count(*) AS BIGINT) FROM first_seen
             WHERE first_doc < c.cutoff) AS vocab_size
    FROM cut c
    ORDER BY pct
    """,
)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve (X4): distinct-vocabulary
    size after the first 10/25/50/100% of the corpus (by doc_id
    order), with the cumulative token mass at each prefix — the
    V(n) ~ K·n^β sublinear-growth check every corpus QA pass runs
    (flat growth → boilerplate/duplication; superlinear → encoding
    noise or tokenizer breakage). Heaps' law is public knowledge
    (Heaps 1978).

    Exactness: a term counts toward checkpoint p iff its FIRST
    occurrence (min doc_id — an integer aggregate) lands before the
    integer cutoff ``ceil(n_docs·p/100)`` computed as
    ``(n·p + 99) // 100`` in both engines; everything is integers.

    Scale: one word-count aggregate produces the vocabulary-sized
    (term, first_doc) table; the checkpoint fan-out crosses it (and
    the per-doc token counts) with a 4-row literal dim — ≤4× a
    vocab-sized frame through a 4-group aggregate. The corpus itself
    is scanned once. No windows, no sort until the 4-row output.
    """
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count("*").alias("n_docs"))
    pct = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"({p})" for p in HEAPS_CHECKPOINTS)
        + " AS t(pct)"
    )
    cut = pct.crossJoin(F.broadcast(n_docs)).select(
        "pct",
        F.expr("(n_docs * pct + 99) div 100").alias("cutoff"),
    )
    first_seen = (
        d.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    doc_tok = d.select("doc_id", F.size(_tokens()).alias("n_tok"))
    vocab = (
        first_seen.crossJoin(F.broadcast(cut))
        .filter(F.col("first_doc") < F.col("cutoff"))
        .groupBy("pct", "cutoff")
        .agg(F.count("*").alias("vocab_size"))
    )
    mass = (
        doc_tok.crossJoin(F.broadcast(cut))
        .filter(F.col("doc_id") < F.col("cutoff"))
        .groupBy("pct", "cutoff")
        .agg(F.sum("n_tok").alias("n_tokens_cum"))
    )
    return (
        vocab.join(mass, ["pct", "cutoff"])
        .select(
            "pct",
            F.col("cutoff").alias("cutoff_docs"),
            "n_tokens_cum",
            "vocab_size",
        )
        .orderBy("pct")
    )


SB_ALPHA_NUM, SB_ALPHA_DEN = 2, 5  # stupid-backoff α = 0.4 (Brants 2007)


from couchwarehouse_spark.plans.sampling import _SPLIT_SQL as _SB_SPLIT_SQL, TRAIN_PCT as _SB_TRAIN, VAL_PCT as _SB_VAL  # noqa: E402


@query(
    "stupid_backoff_scores",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, lang, text, {_SB_SPLIT_SQL} AS hash_bucket FROM documents
    ),
    train_bg AS (
      SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))
               AS bg
      FROM split WHERE hash_bucket < {_SB_TRAIN}
    ),
    bgc AS (
      SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
             count(*) AS b FROM train_bg GROUP BY 1, 2
    ),
    ctx AS (SELECT w1, CAST(sum(b) AS BIGINT) AS c FROM bgc GROUP BY w1),
    uni AS (
      SELECT w, count(*) AS u FROM (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM split WHERE hash_bucket < {_SB_TRAIN}
      ) GROUP BY w
    ),
    tot AS (SELECT CAST(sum(u) AS BIGINT) AS n, count(*) AS v FROM uni),
    test_bg AS (
      SELECT lang,
             unnest(list_transform(range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))
               AS bg
      FROM split WHERE hash_bucket >= {_SB_TRAIN + _SB_VAL}
    ),
    scored AS (
      SELECT t.lang,
             bgc.b IS NULL AS backoff,
             CAST(round(1000000 * CASE WHEN bgc.b IS NOT NULL
                  THEN -ln(bgc.b / CAST(ctx.c AS DOUBLE))
                  ELSE -ln(({SB_ALPHA_NUM} * (coalesce(uni.u, 0) + 1))
                           / CAST({SB_ALPHA_DEN} * (tot.n + tot.v + 1) AS DOUBLE))
             END) AS BIGINT) AS nls_micro
      FROM test_bg t
      LEFT JOIN bgc ON string_split(t.bg, ' ')[1] = bgc.w1
                   AND string_split(t.bg, ' ')[2] = bgc.w2
      LEFT JOIN ctx ON string_split(t.bg, ' ')[1] = ctx.w1
      LEFT JOIN uni ON string_split(t.bg, ' ')[2] = uni.w
      CROSS JOIN tot
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(sum(CASE WHEN backoff THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
           round(CAST(sum(nls_micro) AS DOUBLE) / 1000000 / count(*), 6)
             AS avg_surprisal
    FROM scored
    GROUP BY lang
    ORDER BY lang
    """,
)
def stupid_backoff_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff bigram LM scoring (X4): fit bigram counts on the
    TRAIN split, score the TEST split's transitions with Brants et
    al. 2007's non-normalized backoff — S(w₂|w₁) = B(w₁w₂)/C(w₁) when
    the bigram was seen, else α·P₁(w₂) with α = 0.4 and an
    add-1-smoothed unigram (the paper's web-scale recipe: no
    discounting, no normalization, "stupid" and effective). Reports
    per-language held-out transition count, how often the model had
    to back off (the coverage signal), and average surprisal — the
    quality-filter twin of ``heldout_perplexity_eval`` one Markov
    order up.

    The split gates are ``deterministic_split``'s salted-hash buckets
    (same literal SQL, leak-proof by construction). Backoff-vs-hit is
    an exact NULL test on the joined bigram table; each surprisal is
    one division + ln on identical integers in both engines, then
    quantized to integer micro-nats BEFORE the per-language reduce
    (the ``ngram_entropy_rate`` idiom) — the average is an
    associative integer sum, so it cannot flip on summation order at
    a bigger SF or different partitioning.

    Scale: the LM tables are bigram-vocabulary-sized hash aggregates;
    scoring is the test transition stream LEFT-joined against them on
    the bigram key (AQE broadcasts small LMs, shuffles heavy-tailed
    ones); per-language reduce carries |langs| groups.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )  # one parquet file = one task; per-row bigram work is compute-dense
    from couchwarehouse_spark.plans.sampling import _split_bucket

    bucket = _split_bucket(F.col("doc_id"))
    toks = F.split("text", " ")
    bigrams = F.transform(
        F.slice(toks, 1, F.size(toks) - 1),
        lambda t, i: F.concat_ws(" ", t, F.element_at(toks, i + 2)),
    )
    base = d.select("lang", bucket.alias("hash_bucket"), bigrams.alias("bgs"), toks.alias("toks"))
    train = base.filter(F.col("hash_bucket") < _SB_TRAIN)
    test = base.filter(F.col("hash_bucket") >= _SB_TRAIN + _SB_VAL)
    train_bg = train.select(F.explode("bgs").alias("bg")).select(
        F.split("bg", " ")[0].alias("w1"), F.split("bg", " ")[1].alias("w2")
    )
    bgc = train_bg.groupBy("w1", "w2").agg(F.count("*").alias("b"))
    bgc = scoped_persist(bgc)
    ctx = bgc.groupBy("w1").agg(F.sum("b").alias("c"))
    uni = (
        train.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("u"))
    )
    tot = uni.agg(F.sum("u").alias("n"), F.count("*").alias("v"))
    t = test.select("lang", F.explode("bgs").alias("bg")).select(
        "lang",
        F.split("bg", " ")[0].alias("w1"),
        F.split("bg", " ")[1].alias("w2"),
    )
    nls = F.when(
        F.col("b").isNotNull(), -F.log(F.col("b") / F.col("c").cast("double"))
    ).otherwise(
        -F.log(
            (SB_ALPHA_NUM * (F.coalesce(F.col("u"), F.lit(0)) + 1))
            / (SB_ALPHA_DEN * (F.col("n") + F.col("v") + 1)).cast("double")
        )
    )
    nls_micro = F.round(1_000_000 * nls).cast("long")
    return (
        t.join(bgc, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(uni.withColumnRenamed("w", "w2"), "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("b").isNull().alias("backoff"),
            nls_micro.alias("nls_micro"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_transitions"),
            F.sum(F.col("backoff").cast("int")).cast("long").alias("n_backoff"),
            F.round(
                F.sum("nls_micro").cast("double") / 1_000_000 / F.count("*"), 6
            ).alias("avg_surprisal"),
        )
        .orderBy("lang")
    )


SPECTRUM_TOP = 20  # smallest frequencies shown (the spectrum head)


@query(
    "zipf_frequency_spectrum",
    oracle=f"""
    WITH tf AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    spec AS (
      SELECT c AS freq, CAST(count(*) AS BIGINT) AS n_terms
      FROM tf GROUP BY c
    ),
    v AS (SELECT CAST(sum(n_terms) AS BIGINT) AS vocab FROM spec)
    SELECT freq, n_terms,
           round(CAST(n_terms AS DOUBLE) / v.vocab, 6) AS vocab_share
    FROM spec CROSS JOIN v
    ORDER BY freq
    LIMIT {SPECTRUM_TOP}
    """,
)
def zipf_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequency spectrum (Zipf/Good-Turing head): how
    many vocabulary terms occur exactly c times, for the smallest
    {SPECTRUM_TOP} frequencies. The spectrum is THE input to
    Good-Turing smoothing (N_1, N_2, ... — Gale & Sampson 1995), and
    its head is the corpus-health dial every tokenizer/dedup pass
    watches: hapax share spikes under OCR noise and collapses under
    aggressive dedup.

    Exactness: both levels are integer counts; the only division is
    the final vocab share, rounded once.

    Scale: word-count shuffle (map-side combined) → a second tiny
    aggregate keyed by count (≤ distinct-frequency groups, heavy-hit
    absorbed map-side) → the vocab total attaches as a one-row
    broadcast. The ORDER BY ... LIMIT head is TakeOrderedAndProject.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(_tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    spec = tf.groupBy(F.col("c").alias("freq")).agg(
        F.count("*").alias("n_terms")
    )
    vocab = spec.agg(F.sum("n_terms").alias("vocab"))
    return (
        spec.crossJoin(F.broadcast(vocab))
        .select(
            "freq",
            "n_terms",
            F.round(F.col("n_terms").cast("double") / F.col("vocab"), 6).alias(
                "vocab_share"
            ),
        )
        .orderBy("freq")
        .limit(SPECTRUM_TOP)
    )


BLEU_MAX_N = 2  # modified-precision orders reported (BLEU-2 components)


def _duck_ngrams(n: int) -> str:
    return (
        f"unnest(list_transform(range(1, len(t) - {n} + 2), "
        f"i -> array_to_string(t[i:i+{n}-1], ' ')))"
    )


@query(
    "bleu_ngram_eval",
    oracle=f"""
    WITH cand AS (
      SELECT doc_id // 2 AS pair, string_split(text, ' ') AS t
      FROM documents WHERE doc_id % 2 = 0
    ),
    ref AS (
      SELECT doc_id // 2 AS pair, string_split(text, ' ') AS t
      FROM documents WHERE doc_id % 2 = 1
    ),
    pairs AS (SELECT cand.pair FROM cand JOIN ref USING (pair)),
    cg AS (
      SELECT pair, n, g, count(*) AS c FROM (
        SELECT pair, 1 AS n, {_duck_ngrams(1)} AS g FROM cand
        UNION ALL
        SELECT pair, 2 AS n, {_duck_ngrams(2)} AS g FROM cand WHERE len(t) >= 2
      ) WHERE pair IN (SELECT pair FROM pairs) GROUP BY pair, n, g
    ),
    rg AS (
      SELECT pair, n, g, count(*) AS c FROM (
        SELECT pair, 1 AS n, {_duck_ngrams(1)} AS g FROM ref
        UNION ALL
        SELECT pair, 2 AS n, {_duck_ngrams(2)} AS g FROM ref WHERE len(t) >= 2
      ) WHERE pair IN (SELECT pair FROM pairs) GROUP BY pair, n, g
    )
    SELECT cg.n AS ngram_n,
           CAST(sum(cg.c) AS BIGINT) AS n_cand_ngrams,
           CAST(sum(least(cg.c, coalesce(rg.c, 0))) AS BIGINT) AS n_clipped,
           round(CAST(sum(least(cg.c, coalesce(rg.c, 0))) AS DOUBLE)
                 / sum(cg.c), 6) AS precision
    FROM cg LEFT JOIN rg USING (pair, n, g)
    GROUP BY cg.n
    ORDER BY ngram_n
    """,
)
def bleu_ngram_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level modified n-gram precision — the BLEU-{BLEU_MAX_N}
    components (Papineni et al. 2002): candidate/reference pairs are
    the deterministic (even doc_id, odd doc_id) pairing, per-pair
    n-gram counts are CLIPPED at the reference count, and precision_n
    is the corpus ratio Σclipped/Σcandidate — the eval kernel behind
    every generation-quality dashboard (the brevity penalty's exp()
    is deliberately left out: these are the integer-exact components
    it multiplies).

    Exactness: clipping is min() of integer counts; the only division
    is the final corpus ratio, rounded once.

    Scale: n-gram explosion → per-(pair, n, gram) counts with map-side
    partials; the clip is ONE equi hash join on (pair, n, gram) —
    pair-local, so a co-partitioned layout makes it shuffle-free; the
    reduce is a 2-group sum. No windows, no UDFs.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    cand = d.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("pair"), t.alias("t")
    )
    ref = d.filter(F.col("doc_id") % 2 == 1).select(
        ((F.col("doc_id") - 1) / 2).cast("long").alias("pair"), t.alias("t")
    )
    pairs = cand.select("pair").join(ref.select("pair"), "pair")

    def gram_at(n: int):
        # NB: a UNARY lambda on purpose — PySpark arity-sniffs
        # higher-order-function lambdas, and a second (defaulted)
        # parameter silently turns this into the (element, index)
        # binary form, feeding the array INDEX where n belongs.
        return lambda i: F.concat_ws(" ", F.slice("t", i + 1, n))

    def grams(side: DataFrame) -> DataFrame:
        parts = []
        for n in range(1, BLEU_MAX_N + 1):
            parts.append(
                side.filter(F.size("t") >= n).select(
                    "pair",
                    F.lit(n).alias("n"),
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(0), F.size("t") - n),
                            gram_at(n),
                        )
                    ).alias("g"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return (
            out.join(F.broadcast(pairs), "pair")
            .groupBy("pair", "n", "g")
            .agg(F.count("*").alias("c"))
        )

    cg, rg = grams(cand), grams(ref).withColumnRenamed("c", "rc")
    clipped = F.sum(F.least(F.col("c"), F.coalesce(F.col("rc"), F.lit(0))))
    return (
        cg.join(rg, ["pair", "n", "g"], "left")
        .groupBy(F.col("n").alias("ngram_n"))
        .agg(
            F.sum("c").alias("n_cand_ngrams"),
            clipped.cast("long").alias("n_clipped"),
            F.round(clipped.cast("double") / F.sum("c"), 6).alias("precision"),
        )
        .orderBy("ngram_n")
    )


_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # token_count_bpe_ish's tokenizer


@query(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT)
             AS n_subword_tokens,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
           round(CAST(sum(len(regexp_extract_all(text, '{_BPE_RE}'))) AS DOUBLE)
                 / sum(len(string_split(text, ' '))), 6) AS fertility
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY (subword tokens per whitespace word) per
    language — the metric tokenizer papers report per script (e.g.
    the XLM-R and NLLB analyses): high fertility means the vocabulary
    fragments that language, inflating its effective sequence length
    and training cost. Uses the same BPE-ish regex tokenizer as
    token_count_bpe_ish over the same corpus, so the two entries
    reconcile.

    Exactness: both token counts are integers summed exactly; one
    division per language, rounded once.

    Scale: a single scan with two per-row counts (regexp + split are
    JVM-side projections), one |langs|-group partial-aggregated
    reduce. No explode — counts, not token rows, cross the exchange.
    """
    d = load_table(spark, sf_dir, "documents")
    sub = F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0)))
    words = F.size(_tokens())
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(sub).alias("n_subword_tokens"),
            F.sum(words).alias("n_words"),
            F.round(
                F.sum(sub).cast("double") / F.sum(words), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


@query(
    "ngram_entropy_rate",
    oracle="""
    WITH toks AS (
      SELECT lang, doc_id, string_split(text, ' ') AS t FROM documents
    ),
    big AS (
      SELECT lang, t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, len(t))) AS u(i)
      WHERE len(t) >= 2
    ),
    bc AS (
      SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c
      FROM big GROUP BY lang, w1, w2
    ),
    terms AS (
      SELECT lang, c,
             CAST(sum(c) OVER (PARTITION BY lang, w1) AS BIGINT) AS ctx,
             CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n,
             CAST(round(1000000 * c * ln(
               CAST(sum(c) OVER (PARTITION BY lang, w1) AS DOUBLE) / c
             )) AS BIGINT) AS h_micro
      FROM bc
    )
    SELECT lang,
           CAST(min(n) AS BIGINT) AS n_bigrams,
           round(CAST(sum(h_micro) AS DOUBLE) / 1000000 / min(n), 6)
             AS entropy_rate_nats
    FROM terms
    GROUP BY lang
    ORDER BY lang
    """,
)
def ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram ENTROPY RATE per language — H(w₂|w₁) under the MLE
    bigram model, Σ p(w₁,w₂)·ln(1/p(w₂|w₁)): Shannon's per-symbol
    uncertainty of the language (Shannon 1951's printed-English
    estimate, the statistic LM perplexity targets). Low entropy rate
    = templated/repetitive text (an independent quality signal);
    across languages it normalizes perplexity comparisons. The text
    twin of markov_conditional_entropy (same micro-nats reduce over a
    different chain), and the CONDITIONAL refinement of
    token_entropy_per_source's unigram entropy.

    Exactness: each bigram's c·ln(ctx/c) quantizes to integer
    micro-nats once; the per-language reduce is an integer sum; one
    division, rounded once.

    Scale: adjacent-pair projection (no self-join — ``slice`` pairs
    within the token array) → (lang, w1, w2) hash aggregate; both
    windows run over the BIGRAM TYPE table (vocabulary-sized), never
    token occurrences.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    big = (
        d.filter(F.size(t) >= 2)
        .select(
            "lang",
            F.explode(
                F.zip_with(
                    F.slice(t, 1, F.size(t) - 1),
                    F.slice(t, 2, F.size(t) - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select("lang", "p.w1", "p.w2")
    )
    bc = big.groupBy("lang", "w1", "w2").agg(F.count("*").alias("c"))
    wctx = Window.partitionBy("lang", "w1")
    wlang = Window.partitionBy("lang")
    terms = bc.select(
        "lang",
        F.sum("c").over(wlang).alias("n"),
        F.round(
            1_000_000
            * F.col("c")
            * F.log(F.sum("c").over(wctx).cast("double") / F.col("c"))
        )
        .cast("long")
        .alias("h_micro"),
    )
    return (
        terms.groupBy("lang")
        .agg(
            F.min("n").alias("n_bigrams"),
            F.round(
                F.sum("h_micro").cast("double") / 1_000_000 / F.min("n"), 6
            ).alias("entropy_rate_nats"),
        )
        .orderBy("lang")
    )


KN_DISCOUNT_NUM, KN_DISCOUNT_DEN = 3, 4  # absolute discount d = 0.75


@query(
    "kneser_ney_bigram_scores",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, lang, text, {_SB_SPLIT_SQL} AS hash_bucket FROM documents
    ),
    train_bg AS (
      SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
      FROM (
        SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1])) AS bg
        FROM split WHERE hash_bucket < {_SB_TRAIN}
      )
    ),
    bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM train_bg
            GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
                   CAST(count(*) AS BIGINT) AS n1w1
            FROM bgc GROUP BY w1),
    cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1w2 FROM bgc GROUP BY w2),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t,
                   CAST(count(DISTINCT w2) AS BIGINT) AS v
            FROM bgc),
    test_bg AS (
      SELECT lang,
             string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
      FROM (
        SELECT lang,
               unnest(list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1])) AS bg
        FROM split WHERE hash_bucket >= {_SB_TRAIN + _SB_VAL}
      )
    ),
    scored AS (
      SELECT t.lang,
             ctx.c1 IS NULL AS ctx_backoff,
             CAST(round(1000000000 * -ln(
               CASE WHEN ctx.c1 IS NOT NULL THEN
                 (greatest({KN_DISCOUNT_DEN} * coalesce(bgc.c, 0)
                           - {KN_DISCOUNT_NUM}, 0)
                    * (tot.t + tot.v + 1)
                  + {KN_DISCOUNT_NUM} * ctx.n1w1 * (coalesce(cont.n1w2, 0) + 1))
                 / CAST({KN_DISCOUNT_DEN} * ctx.c1 * (tot.t + tot.v + 1)
                        AS DOUBLE)
               ELSE (coalesce(cont.n1w2, 0) + 1)
                    / CAST(tot.t + tot.v + 1 AS DOUBLE)
               END)) AS BIGINT) AS nls_nano
      FROM test_bg t
      LEFT JOIN bgc ON t.w1 = bgc.w1 AND t.w2 = bgc.w2
      LEFT JOIN ctx ON t.w1 = ctx.w1
      LEFT JOIN cont ON t.w2 = cont.w2
      CROSS JOIN tot
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(sum(CASE WHEN ctx_backoff THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ctx_backoff,
           round(CAST(sum(nls_nano) AS DOUBLE) / 1000000000 / count(*), 6)
             AS avg_surprisal
    FROM scored
    GROUP BY lang
    ORDER BY lang
    """,
)
def kneser_ney_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM scoring (X4 — Kneser & Ney
    1995 / Chen & Goodman 1998, THE reference n-gram smoother): fit on
    the TRAIN split, score the TEST split's transitions with absolute
    discount d = 3/4 interpolated against the continuation
    distribution —

        p(w2|w1) = (max(c12 − d, 0) + d·N1+(w1·)·p_cont(w2)) / c(w1·)
        p_cont(w2) = (N1+(·w2) + 1) / (T + V + 1)

    (add-1-smoothed continuation so unseen test words stay finite —
    the ``stupid_backoff_scores`` convention); an unseen CONTEXT backs
    off to p_cont alone. Completes the KN stack this repo already
    carries: ``kn_continuation_counts`` computes the statistic, this
    entry uses it as the actual smoother, and per-language held-out
    surprisal is directly comparable with ``stupid_backoff_scores``
    (same split, same transitions) — interpolated KN should win, and
    measuring THAT is the point.

    Exactness: with d = 3/4 every probability is the ratio of two
    integer-valued expressions (cross-multiplied by 4(T+V+1)); both
    engines build the same numerator/denominator, take one ln, and
    quantize to integer NANO-nats BEFORE the per-language reduce,
    emitting the average at micro precision (6 dp).  Nano grain (r7
    verdict #1): a 1-unit tie flip — JVM ``Math.log`` vs libm ``log``
    are each ≤1 ulp but not identically rounded near a ``.5``
    boundary — now perturbs the 6-dp average by 1e-9/n instead of
    1e-6/n, so a single flipped term can no longer move the emitted
    value.  The pytest mirror rounds HALF_UP via ``decimal.Decimal``
    to match Spark's ``F.round`` (HALF_UP on the shortest decimal
    repr), killing the half-to-even divergence of Python ``round()``.

    Scale: the LM tables are bigram-vocabulary-sized hash aggregates;
    scoring is three LEFT joins of the test transition stream against
    them on bigram/unigram keys (AQE broadcasts small LMs); the
    one-row totals broadcast; the final reduce is an integer sum per
    language.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    from couchwarehouse_spark.plans.sampling import _split_bucket

    bucket = _split_bucket(F.col("doc_id"))
    toks = F.split("text", " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    base = d.filter(F.size(toks) >= 2).select(
        "lang", bucket.alias("hash_bucket"), bigrams.alias("bgs")
    )
    train_bg = (
        base.filter(F.col("hash_bucket") < _SB_TRAIN)
        .select(F.explode("bgs").alias("bg"))
        .select("bg.w1", "bg.w2")
    )
    bgc = train_bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    bgc = scoped_persist(bgc)  # feeds ctx, cont, tot AND the score join
    ctx = bgc.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count("*").alias("n1w1")
    )
    cont = bgc.groupBy("w2").agg(F.count("*").alias("n1w2"))
    tot = bgc.agg(
        F.count("*").alias("t"), F.countDistinct("w2").alias("v")
    )
    test = (
        base.filter(F.col("hash_bucket") >= _SB_TRAIN + _SB_VAL)
        .select("lang", F.explode("bgs").alias("bg"))
        .select("lang", "bg.w1", "bg.w2")
    )
    tv1 = (F.col("t") + F.col("v") + 1).cast("double")
    seen_num = (
        F.greatest(
            KN_DISCOUNT_DEN * F.coalesce(F.col("c"), F.lit(0))
            - KN_DISCOUNT_NUM,
            F.lit(0),
        ).cast("double")
        * tv1
        + KN_DISCOUNT_NUM
        * F.col("n1w1")
        * (F.coalesce(F.col("n1w2"), F.lit(0)) + 1)
    )
    seen_den = KN_DISCOUNT_DEN * F.col("c1") * tv1
    p = F.when(F.col("c1").isNotNull(), seen_num / seen_den).otherwise(
        (F.coalesce(F.col("n1w2"), F.lit(0)) + 1) / tv1
    )
    nls_nano = F.round(1_000_000_000 * -F.log(p)).cast("long")
    return (
        test.join(bgc, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("c1").isNull().alias("ctx_backoff"),
            nls_nano.alias("nls_nano"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_transitions"),
            F.sum(F.col("ctx_backoff").cast("int")).cast("long").alias(
                "n_ctx_backoff"
            ),
            F.round(
                F.sum("nls_nano").cast("double") / 1_000_000_000
                / F.count("*"),
                6,
            ).alias("avg_surprisal"),
        )
        .orderBy("lang")
    )


COLLOC_MIN_COUNT = 5  # candidate bigrams must occur at least this often
COLLOC_TOP_K = 20


@query(
    "collocation_llr_pairs",
    oracle=f"""
    WITH big AS (
      SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
      FROM (
        SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1])) AS bg
        FROM documents
      )
    ),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM big
            GROUP BY 1, 2),
    r AS (SELECT w1, CAST(sum(c) AS BIGINT) AS rr FROM c12 GROUP BY w1),
    cc AS (SELECT w2, CAST(sum(c) AS BIGINT) AS col FROM c12 GROUP BY w2),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c12),
    cells AS (
      SELECT c12.w1, c12.w2, c12.c,
             c12.c AS k11, r.rr - c12.c AS k12, cc.col - c12.c AS k21,
             n.n - r.rr - cc.col + c12.c AS k22,
             r.rr AS rr, cc.col AS col, n.n AS n
      FROM c12 JOIN r USING (w1) JOIN cc USING (w2) CROSS JOIN n
      WHERE c12.c >= {COLLOC_MIN_COUNT}
    ),
    scored AS (
      SELECT w1, w2, c,
             2 * (
               CASE WHEN k11 > 0 THEN CAST(round(1000000 * k11 *
                 ln(k11 * CAST(n AS DOUBLE) / (rr * col))) AS BIGINT)
                 ELSE 0 END
             + CASE WHEN k12 > 0 THEN CAST(round(1000000 * k12 *
                 ln(k12 * CAST(n AS DOUBLE) / (rr * (n - col)))) AS BIGINT)
                 ELSE 0 END
             + CASE WHEN k21 > 0 THEN CAST(round(1000000 * k21 *
                 ln(k21 * CAST(n AS DOUBLE) / ((n - rr) * col))) AS BIGINT)
                 ELSE 0 END
             + CASE WHEN k22 > 0 THEN CAST(round(1000000 * k22 *
                 ln(k22 * CAST(n AS DOUBLE) / ((n - rr) * (n - col)))) AS BIGINT)
                 ELSE 0 END
             ) AS llr_micro
      FROM cells
    )
    SELECT w1, w2, c AS n_cooccur,
           round(llr_micro / 1000000.0, 4) AS llr
    FROM scored
    ORDER BY llr_micro DESC, w1, w2
    LIMIT {COLLOC_TOP_K}
    """,
)
def collocation_llr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-likelihood-ratio collocations (X4 — Dunning 1993's G²
    statistic, the standard collocation extractor): for each bigram
    seen ≥ {COLLOC_MIN_COUNT} times, G² = 2·Σ kᵢⱼ·ln(kᵢⱼ·N / (rowᵢ·colⱼ))
    over the 2×2 contingency table of (w1, w2) adjacency. Unlike raw
    frequency or PMI, G² is sound for SPARSE counts (Dunning's whole
    point), so it surfaces multiword units ("new york") without
    hallucinating rare-pair artifacts — the phrase-mining /
    tokenizer-merge-candidate signal in a data pipeline, and the
    pairwise twin of ``chi2_term_keyness``'s goodness-of-fit.

    Exactness: all four cells are integers derived from one bigram
    count table; each k·ln(k·N/(r·c)) term quantizes to integer
    micro-nats (zero cells contribute exactly 0 — the x·ln x limit),
    so the G² ordering is an integer ordering; ranking uses the
    integer, the emitted value is one rounded division.

    Scale: one bigram hash aggregate (map-side combined), two
    marginal aggregates over the TYPE table (vocabulary-sized, not
    corpus-sized), a one-row total broadcast, and joins keyed on
    w1/w2 over the type table; top-k is TakeOrderedAndProject on the
    integer score.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    bigram_structs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    c12 = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .filter(F.size(toks) >= 2)
        .select(F.explode(bigram_structs).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    c12 = scoped_persist(c12)  # feeds marginals AND the scored join
    r = c12.groupBy("w1").agg(F.sum("c").alias("rr"))
    cc = c12.groupBy("w2").agg(F.sum("c").alias("col"))
    n = c12.agg(F.sum("c").alias("n"))

    def term(k, row, col):
        return F.when(
            k > 0,
            F.round(
                1_000_000
                * k
                * F.log(k * F.col("n").cast("double") / (row * col))
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    k11 = F.col("c")
    k12 = F.col("rr") - F.col("c")
    k21 = F.col("col") - F.col("c")
    k22 = F.col("n") - F.col("rr") - F.col("col") + F.col("c")
    nn, rr, col = F.col("n"), F.col("rr"), F.col("col")
    llr_micro = 2 * (
        term(k11, rr, col)
        + term(k12, rr, nn - col)
        + term(k21, nn - rr, col)
        + term(k22, nn - rr, nn - col)
    )
    return (
        c12.filter(F.col("c") >= COLLOC_MIN_COUNT)
        .join(r, "w1")
        .join(cc, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1", "w2",
            F.col("c").alias("n_cooccur"),
            llr_micro.alias("llr_micro"),
        )
        .orderBy(F.col("llr_micro").desc(), "w1", "w2")
        .limit(COLLOC_TOP_K)
        .select(
            "w1", "w2", "n_cooccur",
            F.round(F.col("llr_micro") / 1_000_000.0, 4).alias("llr"),
        )
    )


@query(
    "positional_template_drift",
    oracle="""
    WITH t AS (SELECT source, string_split(text, ' ') AS w FROM documents),
    pos AS (
      SELECT source, len(w) AS n, unnest(w) AS term,
             generate_subscripts(w, 1) AS p
      FROM t
    ),
    bucketed AS (
      SELECT source, ((p - 1) * 10) // n AS decile, term FROM pos
    )
    SELECT source, CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT)            AS n_tokens,
           CAST(count(DISTINCT term) AS BIGINT) AS n_types,
           round(count(DISTINCT term) / CAST(count(*) AS DOUBLE), 6)
                                               AS type_token_ratio
    FROM bucketed
    GROUP BY source, decile
    ORDER BY source, decile
    """,
)
def positional_template_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional type/token census (X4 template detector): token
    diversity per POSITION DECILE of the document, per source. A
    templated source (boilerplate headers, generated framing, scraped
    nav) shows position-LOCKED vocabulary — the type/token ratio
    collapses in exactly the deciles the template occupies, while
    organic text is roughly flat. This positional view catches
    structure that whole-doc ratios (``repetition_census``) average
    away, and the low-diversity deciles are exactly where
    ``boilerplate_suffix_census``-style trimming should aim.

    Exactness: the decile is integer arithmetic ((p−1)·10 div n);
    counts and distinct-counts are integers; one rounded division.

    Scale: one posexplode projection (position never shuffles a
    payload — (source, decile, term) triples do), one hash aggregate
    with map-side partial distinct; output is |sources|·10 rows.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    pos = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .select("source", F.size(toks).alias("n"), F.posexplode(toks))
        .select(
            "source",
            F.expr("pos * 10 DIV n").alias("decile"),
            F.col("col").alias("term"),
        )
    )
    return (
        pos.groupBy("source", "decile")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("term").alias("n_types"),
            F.round(
                F.countDistinct("term") / F.count("*").cast("double"), 6
            ).alias("type_token_ratio"),
        )
        .orderBy("source", "decile")
    )


GT_MAX_R = 10  # Good-Turing head: estimates for r = 1..10


@query(
    "good_turing_estimates",
    oracle=f"""
    WITH t AS (SELECT string_split(text, ' ') AS w FROM documents
               WHERE len(string_split(text, ' ')) >= 2),
    tf AS (
      SELECT g, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(list_transform(range(1, len(w)),
                     i -> w[i] || ' ' || w[i+1])) AS g FROM t)
      GROUP BY g
    ),
    spec AS (
      SELECT c AS r, CAST(count(*) AS BIGINT) AS nr FROM tf GROUP BY c
    ),
    tot AS (SELECT CAST(sum(r * nr) AS BIGINT) AS n FROM spec),
    p0 AS (SELECT coalesce((SELECT nr FROM spec WHERE r = 1), 0) AS n1)
    SELECT a.r, a.nr AS n_r,
           round((a.r + 1) * b.nr / CAST(a.nr AS DOUBLE), 6) AS r_star,
           round((a.r + 1) * b.nr / CAST(a.nr AS DOUBLE) / tot.n, 9)
             AS p_gt,
           round(p0.n1 / CAST(tot.n AS DOUBLE), 9) AS unseen_mass
    FROM spec a
    JOIN spec b ON b.r = a.r + 1
    CROSS JOIN tot CROSS JOIN p0
    WHERE a.r <= {GT_MAX_R}
    ORDER BY a.r
    """,
)
def good_turing_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency re-estimates over BIGRAM types (X4 —
    Good 1953 / Gale & Sampson 1995): for each small count r, the
    Turing estimator r* = (r+1)·N_{r+1}/N_r and the smoothed
    probability r*/N, plus the unseen-event mass N_1/N that
    discounting frees up — the statistic under Katz backoff and the
    classic answer to "how much probability do n-grams we've never
    seen deserve". Bigrams, not unigrams, deliberately: GT discounting
    is applied to N-GRAM counts in Katz backoff (the unigram
    vocabulary here is closed — its spectrum has no small-r head, see
    ``zipf_frequency_spectrum``), and the bigram spectrum is where
    hapaxes actually live. Head-only (r ≤ {GT_MAX_R}, rows require
    N_r+1 > 0): the estimator is unreliable where the spectrum is
    sparse — the documented reason SGT interpolates the tail.

    Exactness: N_r and N are exact integers; each estimate is one
    integer-ratio division, rounded once.

    Scale: bigrams from one array zip per doc → a (bigram) hash
    aggregate (map-side combined) → a tiny frequency-of-frequency
    aggregate → a self-join of the SPECTRUM table (≤ distinct-count
    rows) on r+1; the total and N_1 attach as one-row broadcasts.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    bigram_structs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tf = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .filter(F.size(toks) >= 2)
        .select(F.explode(bigram_structs).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c"))
    )
    spec = tf.groupBy(F.col("c").alias("r")).agg(F.count("*").alias("nr"))
    spec = scoped_persist(spec)  # self-join + totals, all from one pass
    tot = spec.agg(F.sum(F.col("r") * F.col("nr")).alias("n"))
    p0 = spec.filter(F.col("r") == 1).agg(
        F.coalesce(F.sum("nr"), F.lit(0)).alias("n1")
    )
    nxt = spec.select((F.col("r") - 1).alias("r"), F.col("nr").alias("nr_next"))
    r_star = (F.col("r") + 1) * F.col("nr_next") / F.col("nr").cast("double")
    return (
        spec.filter(F.col("r") <= GT_MAX_R)
        .join(nxt, "r")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(p0))
        .select(
            "r",
            F.col("nr").alias("n_r"),
            F.round(r_star, 6).alias("r_star"),
            F.round(r_star / F.col("n"), 9).alias("p_gt"),
            F.round(F.col("n1") / F.col("n").cast("double"), 9).alias(
                "unseen_mass"
            ),
        )
        .orderBy("r")
    )


FOG_COMPLEX_SYLL = 3  # tokens with ≥3 vowel groups count as "complex"


@query(
    "readability_fog_census",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             len(string_split(text, ' ')) AS w,
             len(list_filter(
               list_transform(string_split(text, ' '),
                              t -> len(regexp_extract_all(t, '[aeiouy]+'))),
               s -> s >= {FOG_COMPLEX_SYLL})) AS cx,
             list_sum(list_transform(string_split(text, ' '),
                      t -> len(regexp_extract_all(t, '[aeiouy]+')))) AS syll
      FROM documents
    ),
    q AS (
      SELECT source, w, cx, syll,
             CAST(round(1000000 * 0.4 * (w + 100.0 * cx / w)) AS BIGINT)
               AS fog_micro
      FROM per_doc WHERE w > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS total_words,
           round(CAST(sum(cx) AS DOUBLE) / sum(w), 6) AS complex_share,
           round(CAST(sum(syll) AS DOUBLE) / sum(w), 6) AS syll_per_word,
           round(CAST(sum(fog_micro) AS DOUBLE) / 1000000 / count(*), 4)
             AS fog_index_avg
    FROM q
    GROUP BY source
    ORDER BY source
    """,
)
def readability_fog_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability profiling (X4): Gunning-fog-style index per source
    — 0.4·(words-per-passage + 100·complex-word share), with vowel-
    group runs as the engine-portable syllable estimator (the
    standard heuristic when no pronunciation dictionary ships with
    the engine) and each whitespace doc as one passage. Readability
    drift across sources is a top-line quality-mix signal (a source
    sliding toward long jargon-dense sentences changes downstream
    model behavior before any dedup/quality gate notices).

    Exactness: word/syllable/complex counts are integers from one
    regexp per token evaluated identically by both engines (the
    pattern has no engine-divergent syntax); the per-doc fog value is
    rational (no transcendentals) so both engines compute the
    identical double, micro-quantized before the per-source integer
    reduce; ratio columns divide exact integer sums once.

    Scale: per-row array transform (JVM codegen, no Python), one hash
    agg on source — the scan is the cost, exactly as it should be.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    syll_counts = F.transform(
        toks,
        lambda t: F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), F.lit(0))),
    )
    w = F.size(toks)
    cx = F.size(F.filter(syll_counts, lambda s: s >= FOG_COMPLEX_SYLL))
    syll = F.aggregate(syll_counts, F.lit(0), lambda acc, x: acc + x)
    per_doc = d.select(
        "source", w.alias("w"), cx.alias("cx"), syll.alias("syll")
    ).filter(F.col("w") > 0)
    fog_micro = F.round(
        1_000_000 * 0.4 * (F.col("w") + 100.0 * F.col("cx") / F.col("w"))
    ).cast("long")
    return (
        per_doc.select("source", "w", "cx", "syll", fog_micro.alias("fog_micro"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("total_words"),
            F.round(F.sum("cx").cast("double") / F.sum("w"), 6).alias(
                "complex_share"
            ),
            F.round(F.sum("syll").cast("double") / F.sum("w"), 6).alias(
                "syll_per_word"
            ),
            F.round(
                F.sum("fog_micro").cast("double") / 1_000_000 / F.count("*"), 4
            ).alias("fog_index_avg"),
        )
        .orderBy("source")
    )


DELTA_TOP_TERMS = 30  # Burrows' Delta runs over the M most frequent terms


@query(
    "burrows_delta_stylometry",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    src_n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM tok
              GROUP BY source),
    top AS (
      SELECT term FROM tok GROUP BY term
      ORDER BY count(*) DESC, term LIMIT {DELTA_TOP_TERMS}
    ),
    cnt AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM tok
      WHERE term IN (SELECT term FROM top) GROUP BY 1, 2
    ),
    fq AS (
      SELECT s.source, t.term,
             CAST(round(1000000 * CAST(coalesce(cnt.c, 0) AS DOUBLE) / s.n)
                  AS BIGINT) AS f
      FROM src_n s CROSS JOIN top t
      LEFT JOIN cnt ON cnt.source = s.source AND cnt.term = t.term
    ),
    stats AS (
      SELECT term, CAST(count(*) AS BIGINT) AS ns,
             CAST(sum(f) AS BIGINT) AS sf
      FROM fq GROUP BY term
    ),
    dev AS (
      SELECT fq.source, fq.term, fq.f * st.ns - st.sf AS d, st.ns
      FROM fq JOIN stats st USING (term)
    ),
    sig AS (
      SELECT term, CAST(sum(d * d) AS BIGINT) AS sdd, CAST(max(ns) AS BIGINT)
             AS ns
      FROM dev GROUP BY term
    ),
    z AS (
      SELECT dev.source, dev.term,
             CAST(dev.d AS DOUBLE)
             / nullif(sqrt(CAST(sig.sdd AS DOUBLE) / (sig.ns - 1)), 0) AS z
      FROM dev JOIN sig USING (term)
    ),
    pair_terms AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(round(1000000 * abs(a.z - b.z)) AS BIGINT) AS dz
      FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
    )
    SELECT source_a, source_b,
           round(CAST(sum(dz) AS DOUBLE) / 1000000 / {DELTA_TOP_TERMS}, 4)
             AS delta
    FROM pair_terms
    GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """,
)
def burrows_delta_stylometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta (Burrows LLC'02, the standard stylometric
    authorship distance): z-score each source's relative frequency of
    the corpus's top-M terms against the cross-source distribution,
    then Delta(a,b) = mean |z_a − z_b| — the full source-pair
    distance matrix. In a training-mix context Delta clusters sources
    by WRITING STYLE (function-word profile) rather than topic, the
    axis TF-IDF/embedding dedup is blind to.

    Exactness: relative frequencies quantize to integer micro before
    any cross-source math, deviations f·S − Σf are exact integers
    (micro-freqs ≤ 10⁶ × 20 sources keep d² sums < 2^63), z is a
    fixed float dag over them (one sqrt), and the per-pair term
    reduce micro-quantizes |z_a − z_b| back to an integer sum.

    Scale: token explode → (source, term) hash agg (top-M broadcast
    prunes it to M terms); the z table is |sources|·M rows — the
    pair join is over THAT tiny frame (190 pairs × 30 terms), never
    the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("term"))
    tok = scoped_persist(tok)
    src_n = tok.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    top = (
        tok.groupBy("term")
        .agg(F.count("*").alias("tc"))
        .orderBy(F.col("tc").desc(), "term")
        .limit(DELTA_TOP_TERMS)
        .select("term")
    )
    top = F.broadcast(top)
    cnt = (
        tok.join(top, "term")
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    fq = (
        src_n.crossJoin(top)
        .join(cnt, ["source", "term"], "left")
        .select(
            "source",
            "term",
            F.round(
                1_000_000 * F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("n")
            )
            .cast("long")
            .alias("f"),
        )
    )
    fq = scoped_persist(fq)
    stats = fq.groupBy("term").agg(
        F.count("*").cast("long").alias("ns"), F.sum("f").cast("long").alias("sf")
    )
    dev = fq.join(F.broadcast(stats), "term").select(
        "source", "term", (F.col("f") * F.col("ns") - F.col("sf")).alias("d"), "ns"
    )
    dev = scoped_persist(dev)
    sig = dev.groupBy("term").agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
        F.max("ns").cast("long").alias("ns"),
    )
    z = dev.drop("ns").join(F.broadcast(sig), "term").select(
        "source",
        "term",
        (
            F.col("d").cast("double")
            / F.nullif(
                F.sqrt(F.col("sdd").cast("double") / (F.col("ns") - 1)),
                F.lit(0.0),
            )
        ).alias("z"),
    )
    a = z.select("term", F.col("source").alias("source_a"), F.col("z").alias("za"))
    b = z.select("term", F.col("source").alias("source_b"), F.col("z").alias("zb"))
    return (
        a.join(b, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.round(1_000_000 * F.abs(F.col("za") - F.col("zb")))
            .cast("long")
            .alias("dz"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.sum("dz").cast("double") / 1_000_000 / DELTA_TOP_TERMS, 4
            ).alias("delta")
        )
        .orderBy("source_a", "source_b")
    )


# Artifact detectors shared by both lanes (Java regex and RE2 agree on
# these constructs: explicit \x ranges, literal alternations).
ART_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
ART_TAG_RE = r"</?[a-zA-Z][a-zA-Z0-9]*[^>]*>"
ART_ENTITY_RE = r"&(amp|lt|gt|quot|apos|nbsp|#[0-9]+);"


@query(
    "text_artifact_census",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN contains(text, chr(65533))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mojibake,
           CAST(sum(CASE WHEN regexp_matches(text, '{ART_CONTROL_RE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
           CAST(sum(CASE WHEN regexp_matches(text, '{ART_TAG_RE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_html_tag,
           CAST(sum(CASE WHEN regexp_matches(text, '{ART_ENTITY_RE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_html_entity,
           round(CAST(sum(CASE WHEN contains(text, chr(65533))
                              OR regexp_matches(text, '{ART_CONTROL_RE}')
                              OR regexp_matches(text, '{ART_TAG_RE}')
                              OR regexp_matches(text, '{ART_ENTITY_RE}')
                         THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS artifact_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def text_artifact_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding/markup ARTIFACT census per source — the cleanliness
    gate every web-scale text pipeline runs before training: documents
    carrying U+FFFD replacement characters (mojibake — a decode step
    already lost bytes), C0 control characters (binary contamination),
    HTML tags, or HTML entities (markup that survived extraction).
    Reports per-source counts and the any-artifact document rate; the
    downstream policy (drop, re-extract, route to a cleaner) keys off
    exactly these columns. A clean corpus legitimately scores zero —
    the census proves it rather than assumes it.

    Exactness: four boolean detectors per document (one literal
    ``contains`` + three regexes whose constructs Java regex and RE2
    interpret identically — explicit \\x ranges, literal
    alternations, no lookaround), integer-summed; one final division.

    Scale: one scan, all detectors fused in the same projection
    (whole-stage codegen), one |sources|-group hash agg. Nothing
    shuffles but the per-source counters.
    """
    d = load_table(spark, sf_dir, "documents")
    moji = F.col("text").contains("�").cast("int")
    ctrl = F.col("text").rlike(ART_CONTROL_RE).cast("int")
    tag = F.col("text").rlike(ART_TAG_RE).cast("int")
    ent = F.col("text").rlike(ART_ENTITY_RE).cast("int")
    any_art = (
        F.col("text").contains("�")
        | F.col("text").rlike(ART_CONTROL_RE)
        | F.col("text").rlike(ART_TAG_RE)
        | F.col("text").rlike(ART_ENTITY_RE)
    ).cast("int")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(moji).cast("long").alias("n_mojibake"),
            F.sum(ctrl).cast("long").alias("n_control"),
            F.sum(tag).cast("long").alias("n_html_tag"),
            F.sum(ent).cast("long").alias("n_html_entity"),
            F.round(
                F.sum(any_art).cast("double") / F.count("*"), 6
            ).alias("artifact_rate"),
        )
        .orderBy("source")
    )


TEXTRANK_TOP = 20
# Damping 0.85 in micro-rank units: r0 = 1e6 uniform, teleport 150000.
_TR_TELEPORT = 150_000


@query(
    "textrank_keywords",
    oracle=f"""
    WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(1, len(w)),
               i -> concat_ws(' ', list_extract(w, i),
                              list_extract(w, i + 1)))) AS bigram
      FROM t WHERE len(w) >= 2
    ),
    pe AS (
      SELECT DISTINCT least(string_split(bigram, ' ')[1],
                            string_split(bigram, ' ')[2]) AS a,
             greatest(string_split(bigram, ' ')[1],
                      string_split(bigram, ' ')[2]) AS c
      FROM bg
      WHERE string_split(bigram, ' ')[1] <> string_split(bigram, ' ')[2]
    ),
    und AS (
      SELECT a AS src, c AS dst FROM pe UNION ALL SELECT c, a FROM pe
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY src),
    r1 AS (
      SELECT u.dst AS tok,
             {_TR_TELEPORT} + CAST(sum(CAST(round(0.85 * 1000000 / g.d)
                                            AS BIGINT)) AS BIGINT) AS r
      FROM und u JOIN deg g ON u.src = g.src
      GROUP BY u.dst
    ),
    r2 AS (
      SELECT u.dst AS tok,
             {_TR_TELEPORT} + CAST(sum(CAST(round(0.85 * p.r / g.d)
                                            AS BIGINT)) AS BIGINT) AS r
      FROM und u JOIN deg g ON u.src = g.src
      JOIN r1 p ON u.src = p.tok
      GROUP BY u.dst
    )
    SELECT tok AS token, r AS textrank_micro,
           round(r / 1000000.0, 6) AS textrank
    FROM r2
    ORDER BY r DESC, tok
    LIMIT {TEXTRANK_TOP}
    """,
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004 — PageRank
    over the word co-occurrence graph; the unsupervised keyword/
    keyphrase baseline every extractive pipeline starts from): nodes
    are corpus tokens, undirected edges link adjacent tokens, two
    damped power iterations rank the tokens, top-{20} emitted.

    Exactness: ranks are carried in integer MICRO units — each
    iteration's per-edge contribution round(0.85·r(u)/deg(u)) is one
    quantization of an integer-over-integer expression and the
    per-node reduce is an INTEGER sum (the per-iteration-quantization
    variant of the PageRank-3iter scaling trick, needed because word
    degrees are unbounded so no global scale makes 1/deg integral).

    Scale: the co-occurrence graph is vocabulary-sized, built by one
    bigram explode + distinct (map-side combined); each iteration is
    an edge-keyed join + hash agg — the standard distributed PageRank
    round over a graph that is tiny relative to the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    bg = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .filter(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .select(
            F.split("bigram", " ").getItem(0).alias("wa"),
            F.split("bigram", " ").getItem(1).alias("wb"),
        )
        .filter(F.col("wa") != F.col("wb"))
    )
    pe = bg.select(
        F.least("wa", "wb").alias("a"), F.greatest("wa", "wb").alias("c")
    ).distinct()
    und = pe.select(F.col("a").alias("src"), F.col("c").alias("dst")).unionAll(
        pe.select(F.col("c").alias("src"), F.col("a").alias("dst"))
    )
    und = scoped_persist(und)  # degree table + both iterations
    deg = und.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    deg = scoped_persist(deg)
    r1 = (
        und.join(deg, "src")
        .groupBy("dst")
        .agg(
            (
                F.lit(_TR_TELEPORT)
                + F.sum(F.round(0.85 * 1_000_000 / F.col("d")).cast("long"))
            )
            .cast("long")
            .alias("r")
        )
        .withColumnRenamed("dst", "tok")
    )
    r2 = (
        und.join(deg, "src")
        .join(r1.withColumnRenamed("tok", "src"), "src")
        .groupBy("dst")
        .agg(
            (
                F.lit(_TR_TELEPORT)
                + F.sum(F.round(0.85 * F.col("r") / F.col("d")).cast("long"))
            )
            .cast("long")
            .alias("r2")
        )
    )
    return (
        r2.orderBy(F.col("r2").desc(), "dst")
        .limit(TEXTRANK_TOP)
        .select(
            F.col("dst").alias("token"),
            F.col("r2").alias("textrank_micro"),
            F.round(F.col("r2") / 1_000_000.0, 6).alias("textrank"),
        )
    )


@query(
    "chao1_vocab_richness",
    oracle="""
    WITH tf AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(c) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_f1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis_f2
      FROM tf
    )
    SELECT vocab, total_tokens, hapax_f1, dis_f2,
           round(vocab + CAST(hapax_f1 AS DOUBLE) * (hapax_f1 - 1)
                         / (2 * (dis_f2 + 1)), 2) AS chao1_estimate,
           round(1 - CAST(hapax_f1 AS DOUBLE) / total_tokens, 6)
             AS good_coverage
    FROM s
    """,
)
def chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate of the UNSEEN vocabulary (Chao
    1984, bias-corrected form V + f1·(f1−1)/(2·(f2+1)) — the ecology
    estimator corpus linguistics adopted for "how big is this
    corpus's vocabulary really?"), plus Good's sample coverage
    1 − f1/N (Good 1953 — the mass the corpus has NOT yet seen, the
    quantity Good-Turing smoothing redistributes; estimator inputs
    shared with ``zipf_frequency_spectrum``'s N_1/N_2 head and
    ``good_turing_estimates``). Rising chao1−V under a fixed crawl
    means the tokenizer keeps meeting new types — the dial that says
    "crawl more" vs "the vocabulary has saturated" for training-data
    planning.

    Exactness: V, N, f1, f2 are integer aggregates of the term-
    frequency table; the bias-corrected denominator 2·(f2+1) is never
    zero, so no guard is needed; the two estimates are single float
    divisions rounded once.

    Scale: one word-count shuffle (map-side combined) then a one-row
    conditional aggregate — the spectrum never materializes beyond
    the tf table both engines already build.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(_tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    s = tf.agg(
        F.count("*").cast("long").alias("vocab"),
        F.sum("c").cast("long").alias("total_tokens"),
        F.sum((F.col("c") == 1).cast("int")).cast("long").alias("hapax_f1"),
        F.sum((F.col("c") == 2).cast("int")).cast("long").alias("dis_f2"),
    )
    return s.select(
        "vocab",
        "total_tokens",
        "hapax_f1",
        "dis_f2",
        F.round(
            F.col("vocab")
            + F.col("hapax_f1").cast("double")
            * (F.col("hapax_f1") - 1)
            / (2 * (F.col("dis_f2") + 1)),
            2,
        ).alias("chao1_estimate"),
        F.round(
            1 - F.col("hapax_f1").cast("double") / F.col("total_tokens"), 6
        ).alias("good_coverage"),
    )


BURST_TOP_K = 20  # reported head of the burstiness census


@query(
    "term_burstiness_adaptation",
    oracle=f"""
    WITH dt AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY doc_id, term
    ),
    t AS (
      SELECT term,
             CAST(sum(c) AS BIGINT) AS cf,
             CAST(count(*) AS BIGINT) AS df,
             CAST(count(*) FILTER (c >= 2) AS BIGINT) AS df2
      FROM dt GROUP BY term
    )
    SELECT term, cf, df, df2,
           round(CAST(cf AS DOUBLE) / df, 4) AS burstiness,
           round(CAST(df2 AS DOUBLE) / df, 4) AS adaptation
    FROM t
    ORDER BY cf DESC, term
    LIMIT {BURST_TOP_K}
    """,
)
def term_burstiness_adaptation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness and adaptation census (Church & Gale 1995 /
    Church 2000 "Empirical estimates of adaptation": real terms are
    BURSTY — P(another occurrence | one occurrence) far exceeds the
    Poisson rate — and the two classic magnitudes are burstiness
    cf/df (mean occurrences per containing doc) and adaptation
    df2/df (share of containing docs that repeat the term)). The
    per-term complement of the corpus-level ``burstiness_fano_census``:
    content words adapt strongly, function words behave ~Poisson —
    the signal behind cache language models and the df-vs-cf choice
    in every retrieval weighting.

    Exactness: cf/df/df2 are pure integer aggregates off the
    (doc, term) count table and cross the oracle raw; the two ratios
    are one float division each, rounded once; ranking orders on
    (cf, term) — fully integer-decided.

    Scale: one explode → one (doc, term) hash agg (map-side combined)
    → one term agg; the census frame is vocabulary-sized, the top-k a
    heap.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    dt = (
        d.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    t = dt.groupBy("term").agg(
        F.sum("c").cast("long").alias("cf"),
        F.count("*").cast("long").alias("df"),
        F.count_if(F.col("c") >= 2).cast("long").alias("df2"),
    )
    return (
        t.orderBy(F.col("cf").desc(), "term")
        .limit(BURST_TOP_K)
        .select(
            "term",
            "cf",
            "df",
            "df2",
            F.round(F.col("cf").cast("double") / F.col("df"), 4).alias(
                "burstiness"
            ),
            F.round(F.col("df2").cast("double") / F.col("df"), 4).alias(
                "adaptation"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round 12: lexical-diversity batch.
# ---------------------------------------------------------------------------

MSTTR_SEG = 10  # tokens per MSTTR segment (full segments only)


@query(
    "msttr_lexical_diversity",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pos AS (
      SELECT source, doc_id, len(t) AS nt,
             unnest(t) AS w,
             unnest(range(0, len(t))) AS p
      FROM toks
    ),
    segs AS (
      SELECT source, doc_id, p // {MSTTR_SEG} AS seg, w
      FROM pos WHERE p // {MSTTR_SEG} < nt // {MSTTR_SEG}
    ),
    per AS (
      SELECT source, doc_id, seg,
             CAST(count(DISTINCT w) AS BIGINT) AS ty
      FROM segs GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(ty) AS BIGINT) AS sum_types,
           round(CAST(sum(ty) AS DOUBLE) / ({MSTTR_SEG} * count(*)), 6)
             AS msttr
    FROM per GROUP BY source
    """,
)
def msttr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean segmental type-token ratio (MSTTR, Johnson 1944 — the
    length-robust lexical-diversity measure; raw TTR falls with text
    length, so per-corpus TTR comparisons are confounded by doc size
    and fixed-width segments remove exactly that): tokens chunk into
    non-overlapping {MSTTR_SEG}-token segments (trailing partial
    segments drop), each segment contributes its type count, and the
    per-source MSTTR is Σtypes / ({MSTTR_SEG}·segments).

    Exactness: segment index is integral division on the token
    position in both lanes; type counts and segment counts cross as
    integers; MSTTR is one float division.

    Scale: one posexplode → (doc, segment) distinct-count hash agg —
    token-count-sized shuffle with map-side combine, no window over
    the corpus.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    pos = d.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("nt"),
        F.posexplode(F.split("text", " ")).alias("p", "w"),
    )
    segs = pos.filter(
        F.expr(f"p div {MSTTR_SEG}") < F.expr(f"nt div {MSTTR_SEG}")
    ).select(
        "source", "doc_id", F.expr(f"p div {MSTTR_SEG}").alias("seg"), "w"
    )
    per = segs.groupBy("source", "doc_id", "seg").agg(
        F.count_distinct("w").cast("long").alias("ty")
    )
    return per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum("ty").cast("long").alias("sum_types"),
        F.round(
            F.sum("ty").cast("double") / (MSTTR_SEG * F.count("*")), 6
        ).alias("msttr"),
    )


@query(
    "yule_k_lexical_richness",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    s AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS v,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM wc GROUP BY source
    )
    SELECT source, n AS n_tokens, v AS vocab,
           round(10000.0 * (s2 - n) / (CAST(n AS DOUBLE) * n), 4) AS yule_k
    FROM s
    """,
)
def yule_k_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source (Yule 1944): K = 10⁴·(Σc² −
    N)/N² over the token-frequency spectrum — the classical
    repeat-rate statistic that is (unlike TTR and unlike Heaps'
    exponents) theoretically INDEPENDENT of text length, which makes
    it the right cross-source vocabulary-concentration comparison.
    The scalar summary of the spectrum ``zipf_frequency_spectrum``
    tabulates (Σm²·V_m = Σc²), and the lexical twin of the
    Gini/Simpson concentration entries.

    Exactness: N, V and Σc² are exact integer aggregates (both well
    inside BIGINT at any shipped SF); K is one float expression with
    identical association in both lanes.

    Scale: word-count shuffle → |sources| rows; map-side combine does
    the heavy lifting.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    wc = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    s = wc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return s.select(
        "source",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("vocab"),
        F.round(
            10000.0
            * (F.col("s2") - F.col("n"))
            / (F.col("n").cast("double") * F.col("n")),
            4,
        ).alias("yule_k"),
    )
