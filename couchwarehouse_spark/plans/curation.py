"""Training-data curation signals: repetition detection, length
histograms, and domain-mixture reweighting over ``documents``.

These are the per-corpus audits an LLM-data pipeline runs between
dedup and sampling (repetition is the classic Gopher-style quality
gate; mixture weights drive the sampler). Reference scope: the
reference warehouse exposes arbitrary SQL over synced tables
(/root/reference/README.md:68); these entries are the LLM-pipeline
extension mandated on top of that surface.

Determinism-by-construction: every ratio in an oracle-compared column
is a SINGLE IEEE-754 division of two exactly-aggregated BIGINTs
(then one round()) — never a sum of per-row doubles, whose last ulp
depends on aggregation order and differs between engines. Threshold
comparisons are integer-only (``k*dup > total`` instead of
``dup/total > 1/k``).

Scale: all three operators are scan → narrow per-row compute → hash
aggregate on a low-cardinality key (source / bucket). Partial
aggregation reduces each of the 1000 executors' output to ~20 rows
before the shuffle, so the exchange is trivially small at 100 TB; no
joins, no windows over big partitions, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.plans.dedup import _shingles
from couchwarehouse_spark.plans.registry import query, scoped_persist
from couchwarehouse_spark.plans.sizing import data_width

REP_FLAG_NUM = 50  # flag a doc when dup_trigrams/total_trigrams > 1/50
# (1/50 calibrated to the synthetic corpus: per-doc dup fractions top out
# near 0.07, so a web-scale 0.2 gate would never fire here and the flag
# column would be vacuously zero at every SF; 2% fires at all three SFs.)
LEN_BUCKET = 16  # histogram bucket width, in tokens
MIX_CAP = 3.0  # max upsampling weight for a starved domain
XDOC_N = 5  # cross-doc dup audit n-gram order (5-grams)
XDOC_FLAG_DEN = 2  # flag a doc when shared/total > 1/2 (9-10% of this corpus)
VOCAB_SIZE = 24  # top-V token vocabulary for the OOV audit
# (the synthetic corpus has 31 distinct tokens at every SF, so a 24-token
# vocab leaves real OOV mass — both columns non-trivial at sf0.001/0.01/0.1)


@query(
    "repetition_census",
    oracle=f"""
    WITH tri AS (
      SELECT source,
             CASE WHEN len(string_split(text, ' ')) >= 3
                  THEN len(string_split(text, ' ')) - 2 ELSE 0 END AS total_tri,
             CASE WHEN len(string_split(text, ' ')) >= 3
                  THEN len(string_split(text, ' ')) - 2
                       - len(list_distinct(list_transform(
                           range(1, len(string_split(text, ' ')) - 1),
                           i -> concat_ws(' ',
                                list_extract(string_split(text, ' '), i),
                                list_extract(string_split(text, ' '), i + 1),
                                list_extract(string_split(text, ' '), i + 2)))))
                  ELSE 0 END AS dup_tri
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(dup_tri) AS BIGINT)  AS dup_trigrams,
           CAST(sum(total_tri) AS BIGINT) AS total_trigrams,
           round(CAST(sum(dup_tri) AS DOUBLE) / sum(total_tri), 6) AS repetition_rate,
           CAST(sum(CASE WHEN {REP_FLAG_NUM} * dup_tri > total_tri
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM tri
    GROUP BY source
    """,
)
def repetition_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source repetition audit: what fraction of word 3-grams are
    duplicates (1 − distinct/total), plus a count of docs over the
    1/5-duplicate flag line — the Gopher-style repetitive-content gate.

    The per-doc signal is two BIGINTs (dup, total); the flag is the
    integer comparison ``5·dup > total``; the only floating point is
    one division of the two exact sums at the end. At scale this is a
    word-count-shaped plan: the trigram arrays never leave the mapper
    (no explode — ``array_distinct`` on the in-row array), and the
    aggregate carries 20 groups.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    toks = F.split("text", " ")
    total_tri = F.when(F.size(toks) >= 3, F.size(toks) - 2).otherwise(F.lit(0))
    dup_tri = F.when(
        F.size(toks) >= 3, F.size(toks) - 2 - F.size(F.array_distinct(_shingles(toks)))
    ).otherwise(F.lit(0))
    per_doc = d.select(
        "source",
        total_tri.cast("long").alias("total_tri"),
        dup_tri.cast("long").alias("dup_tri"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("dup_tri").alias("dup_trigrams"),
        F.sum("total_tri").alias("total_trigrams"),
        F.round(
            F.sum("dup_tri").cast("double") / F.sum("total_tri"), 6
        ).alias("repetition_rate"),
        F.sum(
            (F.lit(REP_FLAG_NUM) * F.col("dup_tri") > F.col("total_tri")).cast("long")
        ).alias("n_flagged"),
    )


@query(
    "doc_length_histogram",
    oracle=f"""
    SELECT (len(string_split(text, ' ')) // {LEN_BUCKET}) * {LEN_BUCKET} AS bucket_start,
           CAST(count(*) AS BIGINT)              AS n_docs,
           CAST(sum(n_chars) AS BIGINT)          AS total_chars,
           CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
           CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY 1
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram of the corpus in 16-token buckets, with
    per-bucket char volume — the length profile every curation run
    inspects before choosing truncation/packing parameters.

    All-integer arithmetic (floor-div bucketing), so the hash match is
    exact by construction. The aggregate key is the bucket id
    (~dozens of groups): partial aggregation collapses each partition
    to the bucket count before any shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    return (
        d.select(
            (F.floor(n_tok / LEN_BUCKET) * LEN_BUCKET).alias("bucket_start"),
            n_tok.alias("n_tok"),
            "n_chars",
        )
        .groupBy("bucket_start")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_tok").alias("min_tokens"),
            F.max("n_tok").alias("max_tokens"),
        )
    )


@query(
    "domain_mixture_weights",
    oracle=f"""
    WITH per_source AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT)     AS n_chars
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT source, n_docs, n_chars,
             sum(n_docs) OVER ()              AS total_docs,
             count(*)    OVER ()              AS n_sources
      FROM per_source
    )
    SELECT source, n_docs, n_chars,
           round(CAST(n_docs AS DOUBLE) / total_docs, 6) AS actual_share,
           round(least(CAST(total_docs AS DOUBLE) / (n_sources * n_docs),
                       {MIX_CAP}), 6)                    AS resample_weight
    FROM tot
    """,
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source doc/char counts, the
    source's actual share of the corpus, and the resampling weight
    that moves the mixture toward uniform across sources (capped at
    3× upsampling, the usual guard against over-replicating a tiny
    domain). This is the table a weighted sampler consumes.

    Both ratios are one double division of exact counts. The corpus
    total comes from a broadcast cross-join of a one-row aggregate
    over the already-reduced per-source frame — not an empty-partition
    window, which would funnel rows through a single task.
    """
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    totals = per_source.agg(
        F.sum("n_docs").alias("_total_docs"), F.count("*").alias("_n_sources")
    )
    total_docs = F.col("_total_docs")
    n_sources = F.col("_n_sources")
    return per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_chars",
        F.round(F.col("n_docs").cast("double") / total_docs, 6).alias("actual_share"),
        F.round(
            F.least(
                total_docs.cast("double") / (n_sources * F.col("n_docs")),
                F.lit(MIX_CAP),
            ),
            6,
        ).alias("resample_weight"),
    )


@query(
    "crossdoc_ngram_dup",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(range(1, len(string_split(text, ' ')) - {XDOC_N - 2}),
               i -> concat_ws(' ', list_extract(string_split(text, ' '), i),
                                   list_extract(string_split(text, ' '), i + 1),
                                   list_extract(string_split(text, ' '), i + 2),
                                   list_extract(string_split(text, ' '), i + 3),
                                   list_extract(string_split(text, ' '), i + 4)))) AS g
      FROM documents WHERE len(string_split(text, ' ')) >= {XDOC_N}
    ),
    ex AS (SELECT doc_id, source, unnest(g) AS g5 FROM sh),
    cnt AS (SELECT g5, count(*) AS nd FROM ex GROUP BY g5),
    per_doc AS (
      SELECT e.doc_id, e.source, count(*) AS total_g,
             sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS shared_g
      FROM ex e JOIN cnt c USING (g5) GROUP BY e.doc_id, e.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT)       AS n_docs,
           CAST(sum(shared_g) AS BIGINT)  AS shared_ngrams,
           CAST(sum(total_g) AS BIGINT)   AS total_ngrams,
           round(CAST(sum(shared_g) AS DOUBLE) / sum(total_g), 6) AS crossdup_rate,
           CAST(sum(CASE WHEN {XDOC_FLAG_DEN} * shared_g > total_g
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM per_doc
    GROUP BY source
    """,
)
def crossdoc_ngram_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-n-gram audit (X1/X+): per source, the
    fraction of distinct word 5-grams that also occur in at least one
    OTHER document, plus a count of docs that are majority-shared —
    the corpus-level companion to the within-doc ``repetition_census``
    (this is the signal behind "remove documents made of boilerplate
    shared across the crawl").

    Plan: per-doc distinct shingles explode to (doc, shingle-hash)
    pairs; one word-count-shaped aggregate computes each shingle's
    document frequency; an equi-join back on the hash marks shared
    shingles; two more low-cardinality aggregates reduce to per-source
    totals. Shingles travel as xxhash64 longs (the count of docs per
    shingle is invariant under an injective hash — the oracle groups
    the raw strings), so the widest shuffle carries (long, long) pairs.
    No broadcast of corpus-sized state: the doc-frequency join is a
    plain shuffled equi-join that scales with the shingle table.

    Deliberately a groupBy+join, NOT ``count over (partition by g)``:
    the window form is one scan cheaper but puts every occurrence of a
    hot shingle (boilerplate shared by millions of docs) into a single
    window task with no remedy — whereas here partial aggregation
    collapses the hot key map-side and AQE skew-join splits the probe
    side of the join back. The skew-robust shape wins at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    toks = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (XDOC_N - 1)),
        lambda i: F.xxhash64(
            F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(XDOC_N)]
            )
        ),
    )
    ex = (
        d.filter(F.size(toks) >= XDOC_N)
        .select("doc_id", "source", F.explode(F.array_distinct(grams)).alias("g"))
    )
    cnt = ex.groupBy("g").agg(F.count("*").alias("nd"))
    per_doc = (
        ex.join(cnt, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("total_g"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("shared_g"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("shared_g").alias("shared_ngrams"),
        F.sum("total_g").alias("total_ngrams"),
        F.round(
            F.sum("shared_g").cast("double") / F.sum("total_g"), 6
        ).alias("crossdup_rate"),
        F.sum(
            (F.lit(XDOC_FLAG_DEN) * F.col("shared_g") > F.col("total_g")).cast("long")
        ).alias("n_flagged"),
    )


@query(
    "vocab_oov_audit",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
    vocab AS (SELECT t FROM cnt ORDER BY c DESC, t LIMIT {VOCAB_SIZE})
    SELECT tok.source,
           CAST(count(*) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
           round(CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS oov_rate
    FROM tok LEFT JOIN vocab v ON tok.t = v.t
    GROUP BY tok.source
    """,
)
def vocab_oov_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage / OOV-rate audit (X4/X+): build the top-V
    corpus vocabulary (count desc, token asc — a total order, so the
    boundary is deterministic even on count ties), then measure each
    source's out-of-vocabulary token mass. This is the
    tokenizer-coverage check a pipeline runs before committing to a
    vocab: a source with high OOV rate will shatter into bytes.

    Plan: one word-count aggregate, a V-row top-k
    (TakeOrderedAndProject — per-partition heaps, no global sort),
    then a LEFT broadcast join of the token stream against the
    vocabulary. The broadcast is correct at ANY corpus size: V is a
    constant by construction, the one kind of build side that never
    outgrows the broadcast threshold.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("t"))
    cnt = tok.groupBy("t").agg(F.count("*").alias("c"))
    vocab = (
        cnt.orderBy(F.col("c").desc(), "t")
        .limit(VOCAB_SIZE)
        .select("t", F.lit(1).alias("_in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "t", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("total_tokens"),
            F.sum(F.col("_in_vocab").isNull().cast("long")).alias("oov_tokens"),
            F.round(
                F.sum(F.col("_in_vocab").isNull().cast("long")).cast("double")
                / F.count("*"),
                6,
            ).alias("oov_rate"),
        )
    )


PSEUDO_SALT = "cw-release-salt:"  # fixed salt — same tokenization across runs


@query(
    "user_pseudonymization",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT)               AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT substr(md5(concat('{PSEUDO_SALT}',
                CAST(user_id AS VARCHAR))), 1, 16)) AS BIGINT) AS n_pseudonyms,
           count(DISTINCT user_id) = count(DISTINCT substr(md5(concat('{PSEUDO_SALT}',
                CAST(user_id AS VARCHAR))), 1, 16)) AS injective,
           min(substr(md5(concat('{PSEUDO_SALT}',
                CAST(user_id AS VARCHAR))), 1, 16)) AS first_pseudonym
    FROM events
    GROUP BY event_type
    """,
)
def user_pseudonymization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity pseudonymization audit (X+): replace the direct
    identifier ``user_id`` with a salted-hash token (the PII-safe
    release transform a pipeline applies before data leaves the
    trust boundary), then verify per event_type that the tokenization
    is injective — distinct users == distinct pseudonyms, i.e. no
    collisions collapsed two identities and no per-partition state
    forked one identity into two tokens.

    Plan: the token is a narrow per-row md5 projection (JVM codegen,
    no UDF, no shuffle of raw identifiers beyond the hash input);
    the only exchange is the 5-group distinct aggregate. At 100 TB
    the two exact distinct counts become a two-level partial
    aggregate on (event_type, token) — same plan family Spark already
    picks here; the 16-hex-char (64-bit) token space makes real
    collisions negligible while the ``injective`` column is the audit
    that proves it on THIS corpus rather than assuming it.
    """
    e = load_table(spark, sf_dir, "events")
    token = F.substring(
        F.md5(F.concat(F.lit(PSEUDO_SALT), F.col("user_id").cast("string"))), 1, 16
    )
    return e.select("event_type", F.col("user_id"), token.alias("tok")).groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("tok").alias("n_pseudonyms"),
        (F.countDistinct("user_id") == F.countDistinct("tok")).alias("injective"),
        F.min("tok").alias("first_pseudonym"),
    )


K_ANONYMITY = 20  # minimum distinct users per quasi-identifier combo


@query(
    "k_anonymity_audit",
    oracle=f"""
    SELECT event_type,
           hour(ts) AS hod,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           count(DISTINCT user_id) < {K_ANONYMITY} AS at_risk
    FROM events
    GROUP BY event_type, hour(ts)
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (X+ governance
    companion to ``user_pseudonymization``): pseudonymizing the direct
    identifier is not enough if a (event_type, hour-of-day) combination
    maps to fewer than k distinct users — those rows re-identify by
    linkage. Flags every quasi-identifier equivalence class below
    k = K_ANONYMITY; the release gate a privacy review runs before
    data leaves the trust boundary.

    Scale: one exact distinct-count aggregate on low-cardinality
    grouping keys — Spark expands to a two-level partial aggregate
    over (event_type, hod, user_id), map-side combined; no window,
    no join, no Python.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_type", F.hour("ts").alias("hod"), "user_id")
        .groupBy("event_type", "hod")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .withColumn("at_risk", F.col("n_users") < K_ANONYMITY)
    )


# Per-source adaptive quality cut: keep the top fraction of each
# source by a quality score, with the threshold derived from the
# source's own score distribution (FineWeb/CCNet-style per-shard
# filtering) instead of one global constant that over-prunes weak
# sources and under-prunes strong ones.
QUALITY_KEEP_FRACTION = 0.6


@query(
    "per_source_quality_cut",
    oracle=f"""
    WITH scored AS (
      SELECT source, doc_id,
             -- integer-exact score: 100*n_chars/n_tokens (mean token
             -- length in centi-chars) — a single int division, no
             -- per-row float whose ulp could reorder the rank
             (100 * n_chars) // len(string_split(text, ' ')) AS score
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM scored
    )
    SELECT source,
           CAST(any_value(n) AS BIGINT)                       AS n_docs,
           CAST(count(*) FILTER (rk <= CAST(ceil({QUALITY_KEEP_FRACTION} * n) AS BIGINT)) AS BIGINT)
                                                              AS n_kept,
           CAST(min(score) FILTER (rk <= CAST(ceil({QUALITY_KEEP_FRACTION} * n) AS BIGINT)) AS BIGINT)
                                                              AS cut_score
    FROM ranked
    GROUP BY source
    """,
)
def per_source_quality_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source adaptive quality filtering (curation): each source
    keeps its own top {QUALITY_KEEP_FRACTION:.0%} of documents by a
    quality score; the cut threshold adapts to the source's score
    distribution (the FineWeb-style per-dump filter). Output: per
    source, total docs, kept count, and the realized cut score.

    The score is an integer (100·chars/tokens) and the rank tie-break
    is doc_id, so the cut boundary is identical in both engines — no
    float percentile straddles the decision.

    Scale: one window over source partitions — source cardinality is
    ~1000s and each partition ranks independently, so the shuffle is
    the same source-keyed exchange the final aggregate needs anyway.
    At extreme per-source volume, swap row_number for an
    approx_percentile threshold (sketch, map-side mergeable) and keep
    the same output contract.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "source",
        "doc_id",
        F.expr("CAST(100 * n_chars AS BIGINT) DIV size(split(text, ' '))").alias(
            "score"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
    wn = Window.partitionBy("source")
    ranked = scored.select(
        "source",
        "score",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    kept = F.col("rk") <= F.ceil(F.lit(QUALITY_KEEP_FRACTION) * F.col("n")).cast(
        "long"
    )
    return ranked.groupBy("source").agg(
        F.any_value(F.col("n")).cast("long").alias("n_docs"),
        F.count_if(kept).cast("long").alias("n_kept"),
        F.min(F.when(kept, F.col("score"))).cast("long").alias("cut_score"),
    )


@query(
    "pii_id_masking_census",
    oracle="""
    WITH scanned AS (
      SELECT c_mktsegment,
             c_name,
             regexp_matches(c_name, 'Customer#[0-9]+')          AS has_id,
             len(regexp_extract_all(c_name, '[0-9]+'))          AS n_digit_runs,
             regexp_replace(c_name, '[0-9]', 'X', 'g')          AS masked
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)                             AS n_rows,
           CAST(count(*) FILTER (has_id) AS BIGINT)             AS n_with_id,
           CAST(sum(n_digit_runs) AS BIGINT)                    AS n_digit_runs,
           CAST(count(DISTINCT masked) AS BIGINT)               AS n_masked_forms
    FROM scanned
    GROUP BY c_mktsegment
    """,
)
def pii_id_masking_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/identifier redaction census (curation): detect structured
    identifiers in a text column by regex, mask their digits, and
    report per-segment detection counts plus the distinct masked
    forms — the detect→redact→audit kernel of a privacy pass (the
    same shape scans emails/phones/SSNs on a real corpus; this
    synthetic schema's identifier pattern is ``Customer#NNN``).
    Companion to ``user_pseudonymization`` (which rekeys ids) and
    ``k_anonymity_audit`` (which verifies the result).

    Scale: pure per-row regex projections (JVM-side, codegen'd) into a
    low-cardinality hash aggregate — zero joins, zero Python; the
    distinct-masked count is the only per-group distinct and rides the
    same exchange. Dialect trap pinned by the oracle: DuckDB's
    regexp_replace replaces the FIRST match unless given the 'g' flag;
    Spark's always replaces all.
    """
    c = load_table(spark, sf_dir, "customer")
    scanned = c.select(
        "c_mktsegment",
        F.col("c_name").rlike("Customer#[0-9]+").alias("has_id"),
        # idx 0 = whole match (Spark defaults to capture group 1;
        # DuckDB's regexp_extract_all defaults to the whole match)
        F.size(F.expr("regexp_extract_all(c_name, '[0-9]+', 0)")).alias(
            "n_digit_runs"
        ),
        F.regexp_replace("c_name", "[0-9]", "X").alias("masked"),
    )
    return scanned.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.count_if("has_id").alias("n_with_id"),
        F.sum("n_digit_runs").cast("long").alias("n_digit_runs"),
        F.countDistinct("masked").alias("n_masked_forms"),
    )


@query(
    "source_tvd_matrix",
    oracle="""
    WITH tc AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    c AS (SELECT source, term, count(*) AS c FROM tc GROUP BY source, term),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY source),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(sum(abs(a.c * tb.t - b.c * ta.t)) AS BIGINT) AS shared_abs,
             CAST(sum(a.c) AS BIGINT) AS shared_a,
             CAST(sum(b.c) AS BIGINT) AS shared_b
      FROM c a JOIN c b ON a.term = b.term AND a.source < b.source
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb ON tb.source = b.source
      GROUP BY a.source, b.source
    ),
    pairs AS (
      SELECT ta.source AS src_a, ta.t AS ta, tb.source AS src_b, tb.t AS tb
      FROM tot ta JOIN tot tb ON ta.source < tb.source
    )
    SELECT src_a, src_b,
           coalesce(shared_abs, 0) + (ta - coalesce(shared_a, 0)) * tb
             + (tb - coalesce(shared_b, 0)) * ta AS tvd_numerator,
           ta * tb                               AS tvd_denominator,
           round((coalesce(shared_abs, 0) + (ta - coalesce(shared_a, 0)) * tb
                  + (tb - coalesce(shared_b, 0)) * ta)
                 / CAST(2 * ta * tb AS DOUBLE), 6) AS tvd
    FROM pairs
    LEFT JOIN shared USING (src_a, src_b)
    ORDER BY src_a, src_b
    """,
)
def source_tvd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise total-variation distance between per-source unigram
    distributions (curation: the mixture-drift / domain-shift audit
    run before reweighting a training mix — TVD(P,Q) = ½ Σ|p-q| is
    the blunt, bounded [0,1] cousin of KL that never divides by a
    zero count). INTEGER-EXACT by construction: with per-source
    totals T_a, T_b, the statistic is computed as the integer
    numerator Σ|c_a·T_b - c_b·T_a| over shared terms plus the
    disjoint-mass terms (T_a - Σc_a_shared)·T_b + (T_b - Σc_b_shared)
    ·T_a, over the integer denominator T_a·T_b — only the final
    display ratio is a rounded double, so the oracle hash can never
    drift on float summation order.

    Scale: one word-count shuffle builds the (source, term) count
    table (map-side combine), the pair terms come from a TERM-keyed
    self-join of that already-collapsed table (|sources|² blowup per
    term, with |sources| small — never a corpus×corpus join), and the
    per-source totals are a |sources|-row broadcast. Output is one
    row per source pair — INCLUDING pairs sharing no term at all
    (TVD exactly 1): the pair spine comes from the tiny totals table,
    with the shared-term aggregate LEFT-joined on.
    """
    d = load_table(spark, sf_dir, "documents")
    c = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("c"))
    )
    c = scoped_persist(c)
    tot = c.groupBy("source").agg(F.sum("c").alias("t"))
    a = c.select(F.col("source").alias("src_a"), "term", F.col("c").alias("ca"))
    b = c.select(F.col("source").alias("src_b"), "term", F.col("c").alias("cb"))
    ta = F.broadcast(tot.select(F.col("source").alias("src_a"), F.col("t").alias("ta")))
    tb = F.broadcast(tot.select(F.col("source").alias("src_b"), F.col("t").alias("tb")))
    shared = (
        a.join(b, ["term"])
        .filter(F.col("src_a") < F.col("src_b"))
        .join(ta, "src_a")
        .join(tb, "src_b")
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.abs(F.col("ca") * F.col("tb") - F.col("cb") * F.col("ta"))).alias(
                "shared_abs"
            ),
            F.sum("ca").alias("shared_a"),
            F.sum("cb").alias("shared_b"),
        )
    )
    # Pair spine from the tiny totals table: pairs sharing NO term
    # must still appear (TVD = 1), so the shared-term aggregate is
    # LEFT-joined onto the full |sources|² / 2 pair list.
    pairs = ta.crossJoin(tb).filter(F.col("src_a") < F.col("src_b"))
    shared = pairs.join(shared, ["src_a", "src_b"], "left").na.fill(
        0, ["shared_abs", "shared_a", "shared_b"]
    )
    num = (
        F.col("shared_abs")
        + (F.col("ta") - F.col("shared_a")) * F.col("tb")
        + (F.col("tb") - F.col("shared_b")) * F.col("ta")
    )
    return shared.select(
        "src_a",
        "src_b",
        num.alias("tvd_numerator"),
        (F.col("ta") * F.col("tb")).alias("tvd_denominator"),
        F.round(
            num / (F.lit(2) * F.col("ta") * F.col("tb")).cast("double"), 6
        ).alias("tvd"),
    ).orderBy("src_a", "src_b")


# Gopher-style rule census (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Table A1) with
# bounds recalibrated to this synthetic corpus so every rule is
# non-vacuous at sf0.01 (docs span 10-99 tokens, mean word length
# 3.96-5.04, dup-bigram fraction tops out near 0.10):
GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS = 20, 80
GOPHER_WL_LO_X10, GOPHER_WL_HI_X10 = 43, 48  # mean word length in [4.3, 4.8]
GOPHER_MIN_STOPWORDS = 2  # distinct stopwords required
GOPHER_DUP2_DEN = 16  # fail when dup_bigrams/total_bigrams > 1/16
_GOPHER_STOPS = ("the", "a", "of", "and", "to", "in", "is", "it")


@query(
    "gopher_quality_flags",
    oracle=f"""
    WITH feat AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_tok,
             len(text) - len(string_split(text, ' ')) + 1 AS word_chars,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                                {list(_GOPHER_STOPS)!r})) AS n_stops,
             len(string_split(text, ' ')) - 1 AS tot_bi,
             len(string_split(text, ' ')) - 1
               - len(list_distinct(list_transform(
                   range(1, len(string_split(text, ' '))),
                   i -> concat_ws(' ',
                        list_extract(string_split(text, ' '), i),
                        list_extract(string_split(text, ' '), i + 1))))) AS dup_bi
      FROM documents
    ),
    flags AS (
      SELECT lang,
             CASE WHEN n_tok < {GOPHER_MIN_TOKENS} OR n_tok > {GOPHER_MAX_TOKENS}
                  THEN 1 ELSE 0 END AS f_wc,
             CASE WHEN 10 * word_chars < {GOPHER_WL_LO_X10} * n_tok
                    OR 10 * word_chars > {GOPHER_WL_HI_X10} * n_tok
                  THEN 1 ELSE 0 END AS f_wl,
             CASE WHEN n_stops < {GOPHER_MIN_STOPWORDS} THEN 1 ELSE 0 END AS f_stop,
             CASE WHEN {GOPHER_DUP2_DEN} * dup_bi > tot_bi THEN 1 ELSE 0 END AS f_dup
      FROM feat
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(sum(f_wc) AS BIGINT)  AS n_fail_wordcount,
           CAST(sum(f_wl) AS BIGINT)  AS n_fail_wordlen,
           CAST(sum(f_stop) AS BIGINT) AS n_fail_stopwords,
           CAST(sum(f_dup) AS BIGINT) AS n_fail_dupbigram,
           CAST(sum(CASE WHEN f_wc + f_wl + f_stop + f_dup = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM flags
    GROUP BY lang
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality census (curation): per-lang counts of docs
    failing each of four document-quality rules from the Gopher data
    pipeline (Rae et al. 2021) — token-count bounds, mean-word-length
    band, minimum distinct-stopword presence, and a duplicate-bigram
    ceiling — plus the all-rules-pass count the sampler actually
    keeps. Complements ``quality_scores`` (one combined boolean per
    source): this is the per-RULE breakdown that tells a pipeline
    WHICH gate is responsible for per-language attrition before it
    tunes thresholds.

    Every rule is an integer comparison (mean word length is the
    cross-multiplication ``10·word_chars <> bound·n_tokens``, the
    bigram ceiling is ``16·dup > total``), so both engines agree bit
    for bit; there is no floating point anywhere.

    Scale: scan → per-row array ops (no explode — the bigram dup count
    is ``array_distinct`` on the in-row array) → one hash aggregate on
    lang. Word-count shape; partial aggregation reduces every
    partition to ≤|langs| rows before the shuffle.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    bigrams = F.transform(
        F.slice(toks, 1, F.size(toks) - 1),
        lambda t, i: F.concat_ws(" ", t, F.element_at(toks, i + 2)),
    )
    n_tok = F.size(toks)
    word_chars = F.length("text") - n_tok + 1
    n_stops = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    tot_bi = n_tok - 1
    dup_bi = tot_bi - F.size(F.array_distinct(bigrams))
    feat = d.select(
        "lang",
        ((n_tok < GOPHER_MIN_TOKENS) | (n_tok > GOPHER_MAX_TOKENS))
        .cast("int")
        .alias("f_wc"),
        (
            (10 * word_chars < GOPHER_WL_LO_X10 * n_tok)
            | (10 * word_chars > GOPHER_WL_HI_X10 * n_tok)
        )
        .cast("int")
        .alias("f_wl"),
        (n_stops < GOPHER_MIN_STOPWORDS).cast("int").alias("f_stop"),
        (GOPHER_DUP2_DEN * dup_bi > tot_bi).cast("int").alias("f_dup"),
    )
    return feat.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("f_wc").alias("n_fail_wordcount"),
        F.sum("f_wl").alias("n_fail_wordlen"),
        F.sum("f_stop").alias("n_fail_stopwords"),
        F.sum("f_dup").alias("n_fail_dupbigram"),
        F.sum(
            (F.col("f_wc") + F.col("f_wl") + F.col("f_stop") + F.col("f_dup") == 0).cast(
                "int"
            )
        )
        .cast("long")
        .alias("n_pass"),
    )


@query(
    "source_kl_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    sc AS (SELECT source, w, count(*) AS c FROM tok GROUP BY source, w),
    st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM sc GROUP BY source),
    cc AS (SELECT w, CAST(sum(c) AS BIGINT) AS cc FROM sc GROUP BY w),
    ct AS (SELECT CAST(sum(cc) AS BIGINT) AS nc FROM cc),
    terms AS (
      SELECT sc.source, st.ns,
             CAST(round(1000000 * sc.c *
               ln((CAST(sc.c AS DOUBLE) * ct.nc) / (CAST(st.ns AS DOUBLE) * cc.cc))
             ) AS BIGINT) AS t_micro
      FROM sc JOIN st USING (source) JOIN cc USING (w) CROSS JOIN ct
    )
    SELECT source,
           CAST(min(ns) AS BIGINT) AS n_tokens,
           round(CAST(sum(t_micro) AS DOUBLE) / 1000000 / min(ns), 6)
             AS kl_nats
    FROM terms
    GROUP BY source
    """,
)
def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence KL(p_source ‖ p_corpus) over unigram
    distributions — the information-theoretic mixture-drift audit
    (Kullback-Leibler 1951; the statistic behind data-mixture tuning
    and domain-shift alarms). Sources far from the corpus distribution
    are the ones temperature sampling reweights; the sibling of
    ``source_tvd_matrix`` (pairwise, L1-like) with corpus-relative,
    likelihood-ratio semantics. MLE source distribution: only terms
    the source actually uses contribute (0·ln0 = 0), so no smoothing
    enters.

    Exactness: each (source, term) contribution c·ln((c·N_c)/(N_s·c_c))
    is computed once from exact integers and quantized to integer
    micro-nats; the per-source reduce is an INTEGER sum — no float
    accumulation order (the DSIR idiom).

    Scale: one tokenize pass → (source, term) counts (word-count
    shuffle); source totals are |sources| rows and corpus term counts
    vocabulary-sized — both attach to the term table by
    AQE-broadcastable joins; the final reduce carries |sources|
    groups.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    sc = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    sc = scoped_persist(sc)
    st = sc.groupBy("source").agg(F.sum("c").alias("ns"))
    cc = sc.groupBy("w").agg(F.sum("c").alias("cc"))
    ct = cc.agg(F.sum("cc").alias("nc"))
    terms = (
        sc.join(F.broadcast(st), "source")
        .join(cc, "w")
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            "ns",
            F.round(
                1_000_000
                * F.col("c")
                * F.log(
                    (F.col("c").cast("double") * F.col("nc"))
                    / (F.col("ns").cast("double") * F.col("cc"))
                )
            )
            .cast("long")
            .alias("t_micro"),
        )
    )
    return terms.groupBy("source").agg(
        F.min("ns").alias("n_tokens"),
        F.round(
            F.sum("t_micro").cast("double") / 1_000_000 / F.min("ns"), 6
        ).alias("kl_nats"),
    )


@query(
    "text_normalization_census",
    oracle="""
    WITH norm AS (
      SELECT source, text,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               '  +', ' ', 'g')) AS ntext
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ntext <> text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(sum(len(text) - len(ntext)) AS BIGINT) AS chars_removed,
           round(CAST(sum(len(text) - len(ntext)) AS DOUBLE)
                 / sum(len(text)), 6) AS removal_rate
    FROM norm
    GROUP BY source
    ORDER BY source
    """,
)
def text_normalization_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-lite text-normalization impact census: lowercase →
    strip non-[a-z0-9 ] → collapse runs of spaces → trim, the
    canonical pre-dedup normalizer (C4/Gopher normalize-before-hash
    step), reported per source as docs changed / characters removed /
    removal rate. Run BEFORE committing a normalizer: a source whose
    removal rate spikes is markup- or emoji-heavy and will over-merge
    under normalized exact-dedup.

    Exactness: identical replace-all regex pipelines in both engines
    (Spark regexp_replace is replace-all by default; DuckDB needs the
    'g' flag); counts and char deltas are exact integers, one division
    rounded once.

    Scale: pure per-row projection (JVM regex) → one |sources|-group
    partial-aggregated reduce; no explode, no join, no Python.
    """
    d = load_table(spark, sf_dir, "documents")
    ntext = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            "  +",
            " ",
        )
    )
    changed = F.sum((ntext != F.col("text")).cast("int")).cast("long")
    removed = F.sum(F.length("text") - F.length(ntext))
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            changed.alias("n_changed"),
            removed.alias("chars_removed"),
            F.round(
                removed.cast("double") / F.sum(F.length("text")), 6
            ).alias("removal_rate"),
        )
        .orderBy("source")
    )


SUFFIX_K = 2  # trailing-token window treated as the page footer
SUFFIX_MIN_DOCS = 2  # a suffix is boilerplate when ≥ this many docs end with it


@query(
    "boilerplate_suffix_census",
    oracle=f"""
    WITH tails AS (
      SELECT source,
             array_to_string(t[GREATEST(1, len(t) - {SUFFIX_K} + 1):len(t)], ' ')
               AS suffix
      FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= {SUFFIX_K}
    ),
    census AS (
      SELECT source, suffix, CAST(count(*) AS BIGINT) AS n_docs
      FROM tails GROUP BY source, suffix
    )
    SELECT source, suffix, n_docs
    FROM census
    WHERE n_docs >= {SUFFIX_MIN_DOCS}
    ORDER BY n_docs DESC, source, suffix
    LIMIT 50
    """,
)
def boilerplate_suffix_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-document-SUFFIX census: the trailing {SUFFIX_K}-token
    window of every doc, grouped per source, surfacing suffixes that
    ≥{SUFFIX_MIN_DOCS} docs end with — the footer-boilerplate detector
    (copyright lines, 'subscribe to our newsletter', forum
    signatures). Trailing boilerplate is the classic residue crawl
    extraction leaves behind, and the census output IS the strip-list
    a cleanup pass consumes — the positional complement of
    crossdoc_ngram_dup (anywhere) and doc_boundary_overlap (joins).

    Exactness: identical 1-based tail slicing in both lanes
    (GREATEST-clamped); integer counts; deterministic top-50 head.

    Scale: one projection (no explode — the tail slice is O(k) per
    row) → (source, suffix) hash aggregate with map-side partials →
    TakeOrderedAndProject head.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    suffix = F.concat_ws(
        " ", F.slice(t, F.greatest(F.lit(1), F.size(t) - SUFFIX_K + 1), SUFFIX_K)
    )
    return (
        d.filter(F.size(t) >= SUFFIX_K)
        .select("source", suffix.alias("suffix"))
        .groupBy("source", "suffix")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= SUFFIX_MIN_DOCS)
        .orderBy(F.col("n_docs").desc(), "source", "suffix")
        .limit(50)
    )


L_DIVERSITY = 3  # minimum distinct sensitive values per equivalence class


@query(
    "l_diversity_audit",
    oracle=f"""
    WITH cls AS (
      SELECT event_type, hour(ts) AS hod,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(count(DISTINCT CAST(floor(value / 50) AS BIGINT))
                  AS BIGINT) AS l_sensitive
      FROM events GROUP BY event_type, hour(ts)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN l_sensitive < {L_DIVERSITY} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below_l,
           CAST(min(l_sensitive) AS BIGINT) AS min_l,
           round(CAST(sum(CASE WHEN l_sensitive < {L_DIVERSITY} THEN n_users
                               ELSE 0 END) AS DOUBLE)
                 / sum(n_users), 6) AS users_at_risk_share
    FROM cls
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    standard companion: k-anonymity stops re-identification, but a
    class where every member shares the SAME sensitive value still
    leaks it (the homogeneity attack). Over the same (event_type,
    hour) quasi-identifier classes as k_anonymity_audit, this counts
    distinct sensitive-value BANDS (value//50) per class and flags
    classes below l={L_DIVERSITY}, plus the share of users sitting in
    a leaky class — the number a release review asks for after k
    passes.

    Exactness: class sizes, distinct bands, and the flag census are
    exact integers; one division, rounded once.

    Scale: one two-level distinct aggregate over (QI, band) — the
    k_anonymity shape — then a global 4-counter reduce.
    """
    e = load_table(spark, sf_dir, "events")
    band = F.floor(F.col("value") / 50).cast("long")
    cls = e.groupBy("event_type", F.hour("ts").alias("hod")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(band).alias("l_sensitive"),
    )
    below = F.sum((F.col("l_sensitive") < L_DIVERSITY).cast("int")).cast("long")
    risk_users = F.sum(
        F.when(F.col("l_sensitive") < L_DIVERSITY, F.col("n_users")).otherwise(0)
    )
    return cls.agg(
        F.count("*").alias("n_classes"),
        below.alias("n_below_l"),
        F.min("l_sensitive").cast("long").alias("min_l"),
        F.round(risk_users.cast("double") / F.sum("n_users"), 6).alias(
            "users_at_risk_share"
        ),
    )


@query(
    "gini_token_concentration",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rk
      FROM documents
    ),
    g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(rk * n_chars) AS BIGINT) AS rank_weighted
      FROM ranked GROUP BY source
    )
    SELECT source, n_docs, total_chars,
           round(CAST(2 * rank_weighted - (n_docs + 1) * total_chars
                      AS DOUBLE)
                 / nullif(CAST(n_docs AS DOUBLE) * total_chars, 0),
                 6) AS gini
    FROM g
    ORDER BY source
    """,
)
def gini_token_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per source — the Lorenz
    inequality audit a corpus designer runs before mixing: a source
    whose bytes concentrate in a handful of giant documents (G → 1)
    contributes far less DIVERSITY per token than its row count
    suggests, and duplicates/boilerplate inflate it further. Classic
    rank formula G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) over
    ascending-sorted lengths. The WITHIN-source, document-granularity
    complement of ``gini_source_concentration`` (statistics.py), which
    ranks whole-source masses — that one says "do sources contribute
    equally", this one says "inside each source, do documents".

    Exactness: ranks and both sums are exact integers; Σ rank·x is
    invariant under permutations of equal lengths (swapping two equal
    x's swaps their ranks but not the sum), so the doc_id tie-break
    only pins the per-row rank, not the statistic. ONE division at
    the end, rounded once; nullif guards the n·Σx = 0 shape.

    Scale: one window sort per source partition (the same shape every
    percentile entry uses) and a 3-counter aggregate — no joins, no
    second pass. At 100 TB the sort is the cost; the alternative
    single-pass mean-absolute-difference estimator trades exactness
    for it, which this repo's oracle discipline rejects.
    """
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source", "n_chars", F.row_number().over(w).alias("rk")
    )
    g = ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.col("rk") * F.col("n_chars")).cast("long").alias("rank_weighted"),
    )
    return (
        g.select(
            "source",
            "n_docs",
            "total_chars",
            F.round(
                (
                    2 * F.col("rank_weighted")
                    - (F.col("n_docs") + 1) * F.col("total_chars")
                ).cast("double")
                / F.nullif(
                    F.col("n_docs").cast("double") * F.col("total_chars"),
                    F.lit(0.0),
                ),
                6,
            ).alias("gini"),
        )
        .orderBy("source")
    )


_LN2 = 0.6931471805599453  # shared literal: ln(2), never re-derived


@query(
    "jensen_shannon_sources",
    oracle=f"""
    WITH tc AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
          FROM tc GROUP BY source, term),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY source),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_shared_terms,
             CAST(sum(CAST(round(1000000 * 0.5 * (
                 (CAST(a.c AS DOUBLE) / ta.t)
                   * ln(2.0 * a.c * tb.t
                        / (CAST(a.c AS DOUBLE) * tb.t
                           + CAST(b.c AS DOUBLE) * ta.t))
               + (CAST(b.c AS DOUBLE) / tb.t)
                   * ln(2.0 * b.c * ta.t
                        / (CAST(a.c AS DOUBLE) * tb.t
                           + CAST(b.c AS DOUBLE) * ta.t))
             )) AS BIGINT)) AS BIGINT) AS shared_micro,
             CAST(sum(a.c) AS BIGINT) AS shared_a,
             CAST(sum(b.c) AS BIGINT) AS shared_b
      FROM c a JOIN c b ON a.term = b.term AND a.source < b.source
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb ON tb.source = b.source
      GROUP BY a.source, b.source
    ),
    pairs AS (
      SELECT ta.source AS src_a, ta.t AS ta, tb.source AS src_b, tb.t AS tb
      FROM tot ta JOIN tot tb ON ta.source < tb.source
    )
    SELECT src_a, src_b,
           coalesce(n_shared_terms, 0) AS n_shared_terms,
           round((coalesce(shared_micro, 0)
                  + round(1000000 * 0.5 * CAST({_LN2} AS DOUBLE)
                          * (ta - coalesce(shared_a, 0)) / CAST(ta AS DOUBLE))
                  + round(1000000 * 0.5 * CAST({_LN2} AS DOUBLE)
                          * (tb - coalesce(shared_b, 0)) / CAST(tb AS DOUBLE))
                 ) / 1000000.0, 6) AS jsd_nats
    FROM pairs LEFT JOIN shared USING (src_a, src_b)
    ORDER BY src_a, src_b
    """,
)
def jensen_shannon_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions (Lin 1991 — the SYMMETRIC, BOUNDED [0, ln2]
    companion to ``source_kl_divergence``: never infinite on disjoint
    support, so it's the mixture-distance metric actually used for
    data-mix comparison and drift dashboards; its square root is a
    metric). JSD(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2.

    Exactness: for a shared term, 2p/(p+q) reduces to the INTEGER
    ratio 2·c_a·t_b/(c_a·t_b + c_b·t_a), so each per-(pair, term)
    contribution is one fixed float dag over exact integers,
    quantized to micro-nats; disjoint-support mass needs NO per-term
    work — it collapses to ½ln2·(t - Σc_shared)/t in closed form from
    the shared-sum integers (the TVD-matrix trick applied to the KL
    idiom); ln2 enters as the same literal in both lanes; all reduces
    are integer sums.

    Scale: one word-count shuffle to (source, term) counts, one
    TERM-keyed self-join of that collapsed table (|sources|²/2 pairs
    per term — never corpus×corpus), totals broadcast; pairs sharing
    nothing still appear (JSD = ln2 exactly) via the tiny pair spine.
    """
    d = load_table(spark, sf_dir, "documents")
    c = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    c = scoped_persist(c)
    tot = c.groupBy("source").agg(F.sum("c").cast("long").alias("t"))
    a = c.select(F.col("source").alias("src_a"), "term", F.col("c").alias("ca"))
    b = c.select(F.col("source").alias("src_b"), "term", F.col("c").alias("cb"))
    ta = F.broadcast(
        tot.select(F.col("source").alias("src_a"), F.col("t").alias("ta"))
    )
    tb = F.broadcast(
        tot.select(F.col("source").alias("src_b"), F.col("t").alias("tb"))
    )
    den = (
        F.col("ca").cast("double") * F.col("tb")
        + F.col("cb").cast("double") * F.col("ta")
    )
    contrib = 0.5 * (
        (F.col("ca").cast("double") / F.col("ta"))
        * F.log(2.0 * F.col("ca") * F.col("tb") / den)
        + (F.col("cb").cast("double") / F.col("tb"))
        * F.log(2.0 * F.col("cb") * F.col("ta") / den)
    )
    shared = (
        a.join(b, ["term"])
        .filter(F.col("src_a") < F.col("src_b"))
        .join(ta, "src_a")
        .join(tb, "src_b")
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").cast("long").alias("n_shared_terms"),
            F.sum(F.round(1_000_000 * contrib).cast("long"))
            .cast("long")
            .alias("shared_micro"),
            F.sum("ca").cast("long").alias("shared_a"),
            F.sum("cb").cast("long").alias("shared_b"),
        )
    )
    pairs = ta.crossJoin(tb).filter(F.col("src_a") < F.col("src_b"))
    out = pairs.join(shared, ["src_a", "src_b"], "left").na.fill(
        0, ["n_shared_terms", "shared_micro", "shared_a", "shared_b"]
    )
    disjoint_a = F.round(
        1_000_000 * 0.5 * _LN2
        * (F.col("ta") - F.col("shared_a")) / F.col("ta").cast("double")
    )
    disjoint_b = F.round(
        1_000_000 * 0.5 * _LN2
        * (F.col("tb") - F.col("shared_b")) / F.col("tb").cast("double")
    )
    return out.select(
        "src_a",
        "src_b",
        "n_shared_terms",
        F.round(
            (F.col("shared_micro") + disjoint_a + disjoint_b) / 1_000_000.0, 6
        ).alias("jsd_nats"),
    ).orderBy("src_a", "src_b")


@query(
    "theil_atkinson_concentration",
    oracle="""
    WITH per AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS x
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(x) AS BIGINT) AS xx,
                   CAST(count(*) AS BIGINT) AS k FROM per),
    terms AS (
      SELECT x, t.xx, t.k,
             CAST(round(1000000000.0 * x
                        * ln(CAST(x AS DOUBLE) * t.k / t.xx) / t.xx)
                  AS BIGINT) AS theil_nano,
             CAST(round(1000000000.0 * ln(CAST(x AS DOUBLE))) AS BIGINT)
               AS lnx_nano
      FROM per CROSS JOIN tot t
      WHERE x > 0
    )
    SELECT CAST(min(k) AS BIGINT) AS n_sources,
           CAST(min(xx) AS BIGINT) AS total_tokens,
           round(sum(theil_nano) / 1000000000.0, 6) AS theil_t,
           round(1 - exp(sum(lnx_nano) / 1000000000.0 / min(k))
                     / (CAST(min(xx) AS DOUBLE) / min(k)), 6) AS atkinson_1
    FROM terms
    """,
)
def theil_atkinson_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T and Atkinson(eps=1) inequality of token mass across
    sources — the DECOMPOSABLE complements of the Gini entries
    (``gini_source_concentration``/``gini_token_concentration``):
    Theil T = Σ (x/X)·ln(x·k/X) is the unique inequality index that
    splits exactly into within-group + between-group terms (the
    property mixture audits want when sources nest into domains), and
    Atkinson(1) = 1 − geomean/mean states the share of total tokens a
    perfectly equal mix could give up for the same "welfare" — the
    planner's number for how far the corpus is from the target
    uniform mix.

    Exactness: per-source token masses are integer sums; every
    ln-valued term quantizes to integer NANO units before the
    cross-source reduce (the repo's ln-reduce invariant — both
    indices are sums of logs, exactly the shape the greppable test
    polices); the two emits are single float dags rounded once.
    Zero-mass sources drop in both lanes by the integer predicate.

    Scale: one word-count-per-source hash agg, a one-row broadcast
    total, and a |sources|-row reduce.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("x")
    )
    tot = per.agg(
        F.sum("x").cast("long").alias("xx"), F.count("*").cast("long").alias("k")
    )
    terms = (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("x") > 0)
        .select(
            "xx",
            "k",
            F.round(
                1_000_000_000.0
                * F.col("x")
                * F.log(F.col("x").cast("double") * F.col("k") / F.col("xx"))
                / F.col("xx")
            )
            .cast("long")
            .alias("theil_nano"),
            F.round(1_000_000_000.0 * F.log(F.col("x").cast("double")))
            .cast("long")
            .alias("lnx_nano"),
        )
    )
    return terms.agg(
        F.min("k").cast("long").alias("n_sources"),
        F.min("xx").cast("long").alias("total_tokens"),
        F.round(F.sum("theil_nano") / 1_000_000_000.0, 6).alias("theil_t"),
        F.round(
            1
            - F.exp(F.sum("lnx_nano") / 1_000_000_000.0 / F.min("k"))
            / (F.min("xx").cast("double") / F.min("k")),
            6,
        ).alias("atkinson_1"),
    )
