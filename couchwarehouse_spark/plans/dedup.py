"""X1 — deduplication family over ``documents`` / ``embeddings``
(SURVEY.md §2.D): exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB: exact dedup is a hash aggregate (one shuffle on
the content hash). Near-dup NEVER goes all-pairs at scale — the
entries here block on a key (lang / LSH bucket / label) so the
quadratic term is bounded per block; MinHash-LSH is the canonical
sub-quadratic path (shingle → minhash signature → band buckets →
candidates only within buckets) and SimHash the bit-sampling variant.
Signatures use an md5-derived 60-bit hash (``md5_long``) that DuckDB
computes bit-identically, so even the approximate LSH operators are
EXACTLY oracle-checked — same signatures, same bands, same candidate
pairs in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.operators.skew import salted_join
from couchwarehouse_spark.plans.registry import query, scoped_persist, scoped_register
from couchwarehouse_spark.plans.sizing import data_width

N_MINHASH = 16  # minhash permutations
N_BANDS = 4  # LSH bands → r = 4 rows/band; P(candidate) = 1-(1-s^4)^4
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 60  # = md5_long width; 4 bands of 15 bits
SIMHASH_MAX_TOKENS = 32_767  # packed-lane overflow bound (see simhash_near_dup)
# Kirsch-Mitzenmacher second-hash modulus: lane_i = h1 + i*h2' stays
# < 2^60 + 15*2^55 < 2^61 — no overflow under ANSI arithmetic, in
# either engine.
H2_MOD = 1 << 55


def md5_long(col):
    """First 15 md5 hex chars as a non-negative 60-bit long — the
    engine-portable hash: DuckDB's ``CAST(('0x' || substr(md5(x), 1,
    15)) AS BIGINT)`` produces the identical value, which is what lets
    the LSH signatures below be oracle-checked exactly."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _md5_long_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# Calibrated to the synthetic embeddings (max blocked-pair cosine is
# ~0.475; nearest value below threshold is ≥6e-4 away at every SF, so
# the ≥ decision is stable across float32/float64 engines).
COSINE_DUP_THRESHOLD = 0.45


@query(
    "exact_dedup",
    oracle="""
    SELECT lang,
           count(*)                                   AS n_docs,
           count(DISTINCT md5(text))                  AS n_unique,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dups
    FROM documents
    GROUP BY lang
    """,
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup census (X1): duplicates by content hash, per lang.

    Scale: ``md5(text)`` then two hash aggregates — dedup at any scale
    is exactly this one shuffle on the digest (never on the full
    text: 32-byte keys shuffle, documents don't).
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", F.md5("text").alias("h"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").alias("n_unique"),
            (F.count("*") - F.countDistinct("h")).alias("n_dups"),
        )
    )


# Winnowing fingerprint — THE near-dup cluster key. One definition,
# shared by exact_dedup_canonical here and the split-leakage audit
# (plans.sampling), in both the Spark and oracle lanes, so the audit
# can never silently drift from what dedup actually clusters on.
FINGERPRINT_SQL = """CASE WHEN len(string_split(text, ' ')) >= 3 THEN
               list_min(list_transform(range(1, len(string_split(text, ' ')) - 1),
                 i -> md5(concat_ws(' ', list_extract(string_split(text, ' '), i),
                                         list_extract(string_split(text, ' '), i + 1),
                                         list_extract(string_split(text, ' '), i + 2)))))
             ELSE md5(text) END"""


def fingerprint_col():
    """Winnowing fingerprint of the ``text`` column: min md5 3-gram
    shingle, falling back to md5(text) for sub-3-token docs."""
    toks = F.split("text", " ")
    shingle_hashes = F.transform(
        _shingles(toks), lambda s: F.md5(s)
    )
    return F.when(F.size(toks) >= 3, F.array_min(shingle_hashes)).otherwise(
        F.md5("text")
    )


@query(
    "exact_dedup_canonical",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, {FINGERPRINT_SQL} AS fingerprint
      FROM documents
    )
    SELECT fingerprint,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM fp
    GROUP BY fingerprint
    HAVING count(*) > 1
    """,
)
def exact_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor dedup (X1): one kept doc (min id) per
    content-fingerprint cluster — the survivor-selection pattern
    shared with the upsert kernel (R11).

    Keyed on the winnowing fingerprint (min shingle hash, see
    doc_fingerprints) rather than md5(text): exact duplicates share
    ALL shingles so they always cluster, and the key also folds in
    near-dups that share the minimal shingle — giving a non-trivial
    result at every SF (pure md5-exact groups exist only at sf0.1,
    which would make the oracle check vacuous below that).
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    return (
        d.select(fingerprint_col().alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH fp AS (
      SELECT DISTINCT source, {{fingerprint}} AS fingerprint FROM documents
    )
    SELECT a.source AS src_a, b.source AS src_b,
           count(*) AS shared_fingerprints
    FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.source < b.source
    GROUP BY a.source, b.source
    """.replace("{fingerprint}", FINGERPRINT_SQL),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix (X1/curation): for every pair
    of sources, how many distinct content fingerprints they share —
    the audit that tells a pipeline which crawl sources mirror each
    other (so their joint weight can be corrected before training).
    Companion to ``crossdoc_ngram_dup`` (per-source shingle overlap):
    this one localizes overlap to source PAIRS at whole-doc
    granularity.

    Scale: the distinct (source, fingerprint) table is ≤ one row per
    doc; the self-join is keyed on the fingerprint — word-count shape,
    AQE-splittable if one fingerprint is boilerplate-hot — and the
    output is |sources|² max. The fingerprint table persists across
    its two join sides so shingle hashing runs once.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )  # md5-per-shingle is compute-dense; don't let one file = one task
    fp = scoped_persist(
        d.select("source", fingerprint_col().alias("fingerprint")).distinct()
    )
    a = fp.select(F.col("source").alias("src_a"), "fingerprint")
    b = fp.select(F.col("source").alias("src_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("shared_fingerprints"))
    )


_JACCARD_PAIRS_SQL = """
    t AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
               i -> concat_ws(' ', list_extract(string_split(text, ' '), i),
                                   list_extract(string_split(text, ' '), i + 1),
                                   list_extract(string_split(text, ' '), i + 2)))) AS sh
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
               AS jaccard
      FROM t a JOIN t b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
    )
"""


@query(
    "ngram_jaccard_pairs",
    oracle=f"WITH {_JACCARD_PAIRS_SQL} SELECT doc_a, doc_b, jaccard FROM pairs",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram (shingle) Jaccard near-dup pairs (X1), blocked by
    lang — the exact verification step every near-dup pipeline ends
    with, as its own oracle-backed operator.

    Shingle sets, not token sets: token-set Jaccard saturates on any
    small vocabulary (most of this corpus scores ≥0.5) while shingle
    Jaccard only fires on genuinely shared word sequences — the
    standard formulation (Broder resemblance, public knowledge).

    Performance: shingles are hashed to 64-bit longs BEFORE any join —
    Jaccard needs only intersect/union SIZES, which are invariant
    under an (effectively) injective hash, so the expensive
    ``array_intersect`` runs on longs, not ~20-char strings, and the
    shuffled payload shrinks the same way. The oracle computes the
    same sizes on the raw strings.

    Scale — exact prefix filtering (Bayardo/Ma/Srikant "Scaling Up
    All Pairs Similarity Search", WWW'07; public knowledge), never
    all-pairs: with shingle hashes globally ordered (array_sort), a
    pair with J >= τ must overlap in >= ceil(τ·|A|) elements, so doc
    A's first |A| - ceil(τ·|A|) + 1 hashes (its "prefix") must hit
    SOME element of B — pigeonhole, zero recall loss. Candidate
    generation is therefore an equi-join of exploded prefixes against
    exploded full sets on (lang, shingle-hash): linear in shared
    shingles rather than quadratic in block size, and it shuffles/
    scales like word-count. The exact Jaccard verify then runs on
    candidates only. The pigeonhole bound holds for ANY fixed total
    order of the shingle universe — hash order here; the documented
    refinement when candidate volume gets hot is ascending corpus
    document-frequency order (rare shingles first in every prefix, the
    full Bayardo ordering), which costs one extra frequency join.
    ``minhash_lsh_candidates`` is the probabilistic alternative when
    even prefix-join fan-out is too hot.
    """
    d = load_table(spark, sf_dir, "documents")
    par = data_width(spark, sf_dir, "documents")
    t = (
        d.repartition(par)
        .select(
            "doc_id",
            "lang",
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        _shingles(F.split("text", " ")), lambda s: F.xxhash64(s)
                    )
                )
            ).alias("sh"),
        )
    )
    # reused: probe prefixes, build tokens, verify arrays; released by
    # the registry when the next query runs (see scoped_persist)
    t = scoped_persist(t)
    # Prefix length for τ: n - ceil(τn) + 1 (pigeonhole bound above).
    n = F.size("sh")
    plen = (n - F.ceil(F.lit(JACCARD_THRESHOLD) * n) + 1).cast("int")
    probe = t.select(
        "lang",
        F.col("doc_id").alias("doc_a"),
        F.explode(F.slice("sh", 1, plen)).alias("tok"),
    )
    build = t.select(
        "lang", F.col("doc_id").alias("doc_b"), F.explode("sh").alias("tok")
    )
    cand = (
        probe.join(build, ["lang", "tok"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Persisted: the candidate list feeds BOTH verify-join broadcasts
    # below — without this the (expensive) prefix join re-runs inside
    # the second broadcast's lineage.
    cand = scoped_persist(cand)
    # Verify join: broadcast ONLY the candidate id-pair list, never
    # anything carrying shingle arrays. Each corpus pass streams past
    # the broadcast pair ids to attach its side's arrays; the two
    # halves then join on the PAIR key, so the wide arrays shuffle at
    # candidate-pair size — bounded by the prefix filter — and the
    # corpus-sized shingle table is never broadcast or re-shuffled.
    # (The previous shape broadcast with_a — id-pairs PLUS doc_a's
    # arrays — which is pair-volume × array-width driver memory: the
    # exact build that OOMs a small driver first and a big one later.)
    sh_tbl = t.select("doc_id", "sh")
    with_a = sh_tbl.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}).join(
        F.broadcast(cand), "doc_a"
    )
    with_b = sh_tbl.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}).join(
        F.broadcast(cand), "doc_b"
    )
    pairs = with_a.join(with_b, ["doc_a", "doc_b"])
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - inter
    # Threshold on the RAW ratio (like the oracle's WHERE), round only
    # for emission: filtering on the rounded value would admit pairs up
    # to 5e-5 below τ once unions reach ~10⁴ shingles (big docs).
    return (
        pairs.select("doc_a", "doc_b", (inter / union).alias("_j"))
        .filter(F.col("_j") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("_j", 4).alias("jaccard"))
    )


def _shingles(toks):
    """Word-3-gram shingles (1-based element_at indexing)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )


_LONG_MAX = (1 << 63) - 1


def minhash_signature(toks):
    """N_MINHASH independent min-hashes of the shingle set, as ONE
    ``array<long>`` column.

    Permutation family = Kirsch-Mitzenmacher double hashing (public
    knowledge): ``lane_i = h1(s) + i * h2(s)`` with two 60-bit values
    cut from ONE md5 digest (hex chars 1-15 / 16-30) — exactly
    reproducible in DuckDB, which is what makes the LSH entry
    oracle-checked rather than rows-only. The shingle array maps to
    digests, digests to (h1, h2) structs, then all 16 lanes fold in a
    single ``aggregate`` pass — 16 separate ``array_min(transform())``
    projections would rescan the array per lane. Entirely JVM-side,
    no UDF, no shuffle.

    NB: the per-lane index is injected via a Python comprehension over
    literal ints, NOT a two-argument ``transform`` lambda — PySpark
    dispatches two-parameter lambdas as (element, index), which would
    silently shadow the salt with the array position and collapse all
    permutations into one.
    """
    # ONE md5 per shingle: h1 = hex chars 1-15, h2 = chars 16-30 —
    # two independent 60-bit values from the same digest, and the
    # digest is computed once (explicit two-pass transform, no reliance
    # on subexpression elimination inside lambdas).
    pre = F.transform(
        F.transform(_shingles(toks), lambda s: F.md5(s)),
        lambda m: F.struct(
            F.conv(F.substring(m, 1, 15), 16, 10).cast("long").alias("h1"),
            (F.conv(F.substring(m, 16, 15), 16, 10).cast("long") % H2_MOD).alias(
                "h2"
            ),
        ),
    )
    return F.aggregate(
        pre,
        F.array_repeat(F.lit(_LONG_MAX), N_MINHASH),
        lambda acc, p: F.zip_with(
            acc,
            F.array(*[p["h1"] + F.lit(i) * p["h2"] for i in range(N_MINHASH)]),
            lambda a, h: F.least(a, h),
        ),
    )


_SHINGLE_LIST_SQL = """list_transform(range(1, greatest(len(w) - 2, 1) + 1),
               i -> concat_ws(' ', list_extract(w, i),
                                   list_extract(w, i + 1),
                                   list_extract(w, i + 2)))"""

_R = N_MINHASH // N_BANDS

MINHASH_ORACLE = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id, list_distinct({_SHINGLE_LIST_SQL}) AS s FROM t),
    hp AS (
      SELECT doc_id, s,
             list_transform(list_transform(s, g -> md5(g)), m ->
               {{'h1': CAST(('0x' || substr(m, 1, 15)) AS BIGINT),
                 'h2': CAST(('0x' || substr(m, 16, 15)) AS BIGINT) % {H2_MOD}}}) AS hp
      FROM sh
    ),
    mh AS (
      SELECT doc_id, s,
             list_transform(range(0, {N_MINHASH}), i ->
               list_min(list_transform(hp, p -> p.h1 + i * p.h2))) AS mh
      FROM hp
    ),
    buckets AS (
      SELECT doc_id, band,
             array_to_string(list_slice(mh, band * {_R} + 1, band * {_R} + {_R}), '|') AS bh
      FROM mh CROSS JOIN (SELECT unnest(range(0, {N_BANDS})) AS band) bands
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    v AS (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
                   / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS j
      FROM cand JOIN sh x ON cand.doc_a = x.doc_id
                JOIN sh y ON cand.doc_b = y.doc_id
    )
    SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM v WHERE j >= {JACCARD_THRESHOLD}
"""


@query("minhash_lsh_candidates", oracle=MINHASH_ORACLE)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates (X1) — the sub-quadratic path.

    shingle → 16-permutation minhash signature → 4 bands of 4 →
    band-bucket self-join → exact shingle-Jaccard verify on candidates
    only. Output: verified pairs (doc_a, doc_b, jaccard ≥ 0.5) — the
    same metric ``ngram_jaccard_pairs`` computes exhaustively within
    lang blocks, so restricted to same-lang pairs the LSH result is a
    (high-recall) subset of that oracle-backed one — and, being
    unblocked, it additionally surfaces cross-lang near-dups the
    blocked scan structurally cannot see.

    Scale: the only join is on (band, band_key) — docs collide only
    when a whole band matches, so the candidate set is ~linear for
    realistic similarity distributions (LSH, Broder/MMDS, public
    knowledge). No all-pairs anywhere: this is what replaces
    ``ngram_jaccard_pairs``'s blocked join at 100 TB. Oracle-checked
    EXACTLY (not rows-only): the md5-derived signature hashes are
    engine-portable, so DuckDB reproduces the same signatures, bands,
    candidates and verified pairs bit-for-bit.
    """
    d = load_table(spark, sf_dir, "documents")
    # Hashed shingle sets (longs) — see ngram_jaccard_pairs: Jaccard
    # only needs sizes, and long arrays intersect/shuffle far cheaper.
    sh_set = F.array_distinct(
        F.transform(_shingles(F.split("text", " ")), lambda s: F.xxhash64(s))
    )
    sig = d.repartition(data_width(spark, sf_dir, "documents")).select(
        "doc_id", sh_set.alias("sh"), minhash_signature(F.split("text", " ")).alias("mh")
    )
    sig = scoped_persist(sig)  # reused: band buckets + verify join sides

    r = N_MINHASH // N_BANDS
    # Band key = the band's lanes joined as text — small (4 decimal
    # longs), exactly portable; hashing it again (xxhash64) would save
    # a few bytes per key at the cost of oracle reproducibility.
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.element_at("mh", b * r + j + 1) for j in range(r)]
            ).alias("bh"),
        )
        for b in range(N_BANDS)
    ]
    buckets = sig.select("doc_id", F.explode(F.array(*bands)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )

    a, b = buckets.alias("a"), buckets.alias("b")
    # Candidate id-pairs first, deduped BEFORE any array is attached —
    # the band join shuffles only (id, band, hash) triples.
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_tbl = sig.select("doc_id", "sh")
    pairs = (
        cand.join(sh_tbl.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh_tbl.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - inter
    # Raw-ratio threshold, rounded only for emission — keeps the LSH
    # verify's admission rule identical to ngram_jaccard_pairs' (the
    # subset invariant the docstring promises).
    return (
        pairs.select("doc_a", "doc_b", (inter / union).alias("_j"))
        .filter(F.col("_j") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("_j", 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


_SIMHASH_BIT_TERMS = " + ".join(
    f"(CASE WHEN 2 * list_sum(list_transform(hv, h -> (h >> {b}) & 1)) > n_tok "
    f"THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
    for b in range(SIMHASH_BITS)
)

SIMHASH_ORACLE = f"""
    WITH hs AS (
      SELECT doc_id,
             list_slice(list_sort(list_transform(list_distinct(string_split(text, ' ')),
                                                 t -> {_md5_long_sql('t')})),
                        1, {SIMHASH_MAX_TOKENS}) AS hv
      FROM documents WHERE text IS NOT NULL
    ),
    hn AS (SELECT doc_id, hv, len(hv) AS n_tok FROM hs),
    sim AS (SELECT doc_id, {_SIMHASH_BIT_TERMS} AS simhash FROM hn),
    bk AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * {SIMHASH_BITS // 4})) & {(1 << (SIMHASH_BITS // 4)) - 1} AS bh
      FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bands
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM bk a JOIN bk b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@query("simhash_near_dup", oracle=SIMHASH_ORACLE)
def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (X1): 60-bit sign-aggregated token
    hashes (Charikar, public knowledge); docs sharing any 15-bit
    quarter-band are candidates (Hamming ≤ 3 guaranteed caught by
    4-band pigeonhole), then candidates are VERIFIED with
    ``bit_count(xor) ≤ 3`` — band collision alone is the recall
    stage, the Hamming check is the precision stage.

    Implementation: the whole signature is ONE map-side projection —
    hash the distinct tokens in-array (md5-derived 60-bit ``md5_long``
    — engine-portable, so the ENTIRE pipeline is oracle-checked
    exactly), then a single-pass ``aggregate`` accumulates all 60
    per-bit popcounts as FIFTEEN branch-free packed lanes — four
    16-bit counters per long (`acc[g] += ((h>>b)&1) << 16j`), with the
    per-doc token sample capped so the top lane cannot overflow a
    signed long. No explode, no shuffle: the classic explode+groupBy
    word-count shape moves |tokens| rows through an exchange to
    compute a per-doc reduction that is embarrassingly parallel per
    row. Bit b of the simhash is 1 iff popcount_b > n_tokens/2
    (equivalent to the classic ±1 balance being positive). The
    signature table is persisted before the band self-join — it is
    tiny (doc_id, int64), and inlining the wide signature expression
    into both join sides would double the compute and blow up codegen.
    """
    # Null text carries no signature — filtered in BOTH lanes (the
    # oracle's bit terms would otherwise give every null-text doc
    # simhash 0 while Spark's NULL band keys drop them from the join).
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .repartition(data_width(spark, sf_dir, "documents"))
    )
    # Cap the signature at 32 767 tokens per doc: each packed lane
    # carries a popcount shifted up to bit 48, so the running sum
    # stays below 2^63 under ANSI (overflow-checked) arithmetic.
    # Sampling a bounded token subset for monster docs is standard
    # SimHash practice and also bounds per-doc compute. The subset is
    # the SMALLEST 32 767 token hashes (sort before slice) — a
    # set-determined choice, so the capped selection is identical in
    # any engine regardless of array order (DuckDB's list_distinct
    # scrambles order; first-N would silently diverge above the cap).
    hashes = F.slice(
        F.array_sort(
            F.transform(F.array_distinct(F.split("text", " ")), lambda t: md5_long(t))
        ),
        1,
        SIMHASH_MAX_TOKENS,
    )

    def contrib(h, g: int):
        parts = [
            F.shiftleft(F.shiftright(h, 4 * g + j).bitwiseAND(F.lit(1)), 16 * j)
            for j in range(4)
        ]
        e = parts[0]
        for p in parts[1:]:
            e = e + p
        return e

    packed = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS // 4),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[contrib(h, g) for g in range(SIMHASH_BITS // 4)]),
            lambda a, c: a + c,
        ),
    )
    agg = d.select("doc_id", packed.alias("p"), F.size(hashes).alias("n_tok"))

    simhash = None
    for b in range(SIMHASH_BITS):
        g, j = divmod(b, 4)
        popcount = F.shiftright(F.element_at("p", g + 1), 16 * j).bitwiseAND(
            F.lit(0xFFFF)
        )
        bit = (popcount * 2 > F.col("n_tok")).cast("long")
        term = F.shiftleft(bit, b)
        simhash = term if simhash is None else simhash.bitwiseOR(term)

    sh = scoped_persist(agg.select("doc_id", simhash.alias("simhash")))
    band_bits = SIMHASH_BITS // 4
    band_mask = (1 << band_bits) - 1
    bands = [
        F.struct(
            F.lit(q).alias("band"),
            F.shiftright(F.col("simhash"), q * band_bits)
            .bitwiseAND(F.lit(band_mask))
            .alias("bh"),
        )
        for q in range(4)
    ]
    buckets = sh.select(
        "doc_id", "simhash", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a, b_ = buckets.alias("a"), buckets.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= 3)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),  # match the oracle's BIGINT
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .orderBy("doc_a", "doc_b")
    )


@query(
    "embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {COSINE_DUP_THRESHOLD}
    ORDER BY vec_a, vec_b
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (X1): pairs above the cosine
    threshold, blocked by label (≈ the cluster/band key a real
    pipeline blocks on). Dot products via ``zip_with`` + ``aggregate``
    in double precision — JVM expressions, no UDF.

    The similarity value itself is excluded from the output so the
    oracle hash can't wobble on float32-vs-float64 rounding; the
    ≥-threshold decision is margin-checked stable for this data (see
    COSINE_DUP_THRESHOLD). Scale: blocked pairs only; the unblocked
    scale path is the LSH bucketing of ``ann_lsh_topk``
    (plans.similarity).

    Join shape: a SALTED equi-join on the label block key
    (operators.skew.salted_join) — never a broadcast of the vector
    table, which is corpus-sized. Salting matters twice here: the
    block key is low-cardinality by design (10 labels in the test
    corpus), so an unsalted shuffle join caps parallelism at
    n_labels AND pins every hot block's quadratic pair compute on
    one reducer; with the probe side salted and the build side
    replicated per salt, each block's pair generation spreads over
    n_salts reducers at zero recall loss.
    """
    e = load_table(spark, sf_dir, "embeddings")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
        )

    # Norms once per vector (N evaluations), not once per pair (N²):
    # each pair then costs a single dot product.
    v = F.col("embedding").cast("array<double>")
    t = e.select(
        "vec_id", "label", v.alias("v"), F.sqrt(dot(v, v)).alias("norm")
    )
    a_side = t.select(
        "label",
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("v_a"),
        F.col("norm").alias("norm_a"),
    )
    b_side = t.select(
        "label",
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("v_b"),
        F.col("norm").alias("norm_b"),
    )
    cos = dot(F.col("v_a"), F.col("v_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        salted_join(
            a_side,
            b_side,
            on="label",
            n_salts=16,
            # Explicit partition count: the pair shuffle is bytes-tiny
            # but compute-quadratic; without this AQE coalesces it to
            # one task (see salted_join docstring).
            partitions=data_width(spark, sf_dir, "embeddings"),
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b")
        .orderBy("vec_a", "vec_b")
    )


N_CC_MAX_ITERS = 20  # safety bound; components converge in O(diameter)
# Below this edge count the component step finishes on the driver
# (union-find over collected id-pairs — ≤ ~32 MB). The verified pair
# graph is orders of magnitude smaller than the corpus, so this is the
# common case; the distributed label-propagation loop remains the path
# for genuinely large pair graphs. Same adaptive final-phase shape AQE
# itself uses (plan small things locally once their size is known).
CC_DRIVER_EDGE_BOUND = 1_000_000


# Recursive-CTE transitive closure shared by every component-level
# oracle (cluster census, survivor selection).
_COMPONENTS_SQL = f"""{_JACCARD_PAIRS_SQL},
    sym AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    comp AS (
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
    )
"""


def _component_labels(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, bool]:
    """Per-doc component labels ``(doc_id, cluster_id)`` over the
    verified Jaccard pair graph — ``cluster_id`` = the component's min
    doc_id. Shared kernel of ``near_dup_clusters`` (census) and
    ``dedup_survivors`` (survivor selection). Returns ``(labels,
    driver_lane)`` — ``driver_lane`` tells callers the label table is
    provably small (≤ CC_DRIVER_EDGE_BOUND edges), i.e. safe to
    broadcast-hint; in the distributed lane its size is unbounded and
    join hints must be left to AQE.

    Iterative min-label propagation on DataFrames: every vertex
    repeatedly takes the min label among itself and its neighbors;
    converges in O(component diameter) rounds — near-dup components
    are shallow (pairs share a template), so 2-4 rounds in practice,
    with a hard safety bound. Each round is one equi-join + one hash
    aggregate; only a scalar convergence count ever reaches the
    driver. At extreme scale the round count drops with the
    large-star/small-star variant (Kiveris et al., "Connected
    Components in MapReduce", public knowledge); the per-round plan
    here is unchanged.

    NOTE: callers are registered queries; this helper calls the
    registered ``ngram_jaccard_pairs`` FIRST, so per the registry's
    ordering constraint callers must not scoped_persist anything
    before invoking it.
    """
    edges = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").persist()
    # The pair graph is orders of magnitude smaller than the corpus
    # (only near-dup docs appear): shrink it so each propagation round
    # is a few tasks, not a full-width shuffle — but DERIVE the width
    # from the edge count (~1M edges per partition, capped at the
    # session's parallelism) rather than hardcoding it, so a bigger
    # pair graph automatically gets a wider loop. The count() also
    # materializes the persisted pair pipeline exactly once.
    # repartition, NOT coalesce — coalesce would propagate upstream and
    # collapse the (compute-dense) pair-generation pipeline itself to a
    # handful of tasks; the exchange keeps it wide.
    n_edges = edges.count()
    if n_edges <= CC_DRIVER_EDGE_BOUND:
        # Small-graph fast path: union-find over the collected pairs.
        # The expensive part (shingling, prefix-filter join, Jaccard
        # verify) stayed fully distributed; only the verified id-pairs
        # land on the driver, and the iterative-join loop's ~N driver
        # round-trips collapse to one.
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for row in edges.collect():
            a, b = row["doc_a"], row["doc_b"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        edges.unpersist(blocking=False)
        # Arrow-path createDataFrame (pandas input): the rows convert
        # to Arrow batches ONCE here; later executions replay JVM-side
        # bytes. A plain list-of-tuples input would re-run a pickled
        # Python scan on every action that touches the labels.
        import pandas as pd

        rows = sorted((v, find(v)) for v in parent)
        pdf = pd.DataFrame(rows, columns=["doc_id", "cluster_id"], dtype="int64")
        return (
            spark.createDataFrame(pdf, "doc_id long, cluster_id long"),
            True,
        )
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n_edges // 1_000_000 + 1))
    sym = (
        edges.unionByName(
            edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .withColumnsRenamed({"doc_a": "a", "doc_b": "b"})
        .repartition(n_parts)
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc"))
        .persist()
    )
    # Labels only ever decrease, so sum(label) strictly decreases while
    # anything changes — one scalar agg per round is the whole
    # convergence test (no join against the previous labels).
    prev = labels.agg(F.sum("label")).first()[0]
    # sym (and labels) are materialized now; the raw pair cache has
    # served both union branches and can go.
    edges.unpersist(blocking=False)

    converged = False
    for _ in range(N_CC_MAX_ITERS):
        nbr = sym.join(labels, sym.b == labels.doc).select(
            F.col("a").alias("doc"), "label"
        )
        new_labels = (
            labels.unionByName(nbr).groupBy("doc").agg(F.min("label").alias("label"))
        ).persist()
        cur = new_labels.agg(F.sum("label")).first()[0]
        labels.unpersist()
        labels = new_labels
        if cur == prev:
            converged = True
            break
        prev = cur
    sym.unpersist()
    if not converged:
        # Never return silently-wrong clusters: a component with
        # diameter > N_CC_MAX_ITERS hasn't finished propagating.
        labels.unpersist()
        raise RuntimeError(
            f"near-dup components: no fixpoint after {N_CC_MAX_ITERS} rounds "
            "(component diameter exceeds the bound); raise N_CC_MAX_ITERS "
            "or switch to large-star/small-star rounds"
        )
    scoped_register(labels)  # released when the next query runs
    return (
        labels.select(F.col("doc").alias("doc_id"), F.col("label").alias("cluster_id")),
        False,
    )


@query(
    "near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_COMPONENTS_SQL}
    SELECT cluster_id, count(*) AS cluster_size
    FROM comp GROUP BY cluster_id
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster census (X1): connected components over the
    verified Jaccard pair graph — the step that turns pairwise
    near-dup evidence into dedup clusters. See ``_component_labels``
    for the propagation algorithm; the oracle computes the same
    components declaratively via a recursive-CTE transitive closure.
    """
    labels, _ = _component_labels(spark, sf_dir)
    return labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))


@query(
    "dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_COMPONENTS_SQL},
    m AS (
      SELECT c.cluster_id, d.doc_id, d.n_chars
      FROM comp c JOIN documents d USING (doc_id)
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY n_chars DESC, doc_id) AS rn
      FROM m
    ),
    agg AS (
      SELECT cluster_id,
             count(*)                    AS n_members,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM m GROUP BY cluster_id
    )
    SELECT a.cluster_id,
           r.doc_id                                  AS survivor_doc_id,
           r.n_chars                                 AS survivor_chars,
           a.n_members,
           a.total_chars - r.n_chars                 AS dropped_chars
    FROM agg a JOIN ranked r ON a.cluster_id = r.cluster_id AND r.rn = 1
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection over near-dup clusters (X1): per component,
    KEEP the highest-quality member (longest text, ties to the lowest
    doc_id) and account for what the dedup drops — the policy step a
    training pipeline runs between clustering and the final corpus
    (keep-longest is the common heuristic; the interface is any total
    order over members).

    Scale: the member labels join into the documents scan with a
    broadcast hint ONLY when the driver lane proves them small
    (≤ CC_DRIVER_EDGE_BOUND edges); the distributed lane's label
    table is unbounded (web corpora run 30-50% near-dup), so there
    the join is left UNHINTED — a forced broadcast would die on
    Spark's 8 GB broadcast cap instead of degrading to a doc_id-keyed
    shuffle, and AQE still broadcasts when runtime stats allow.
    Survivor choice is ONE hash aggregate via an argmax struct —
    ``max(struct(n_chars, -doc_id))`` — not a window, so a giant
    cluster costs a partial-aggregated hot key (AQE-splittable)
    instead of a single window task. The oracle uses the equivalent
    window formulation.
    """
    labels, driver_lane = _component_labels(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    m = d.join(F.broadcast(labels) if driver_lane else labels, "doc_id")
    # argmax-by-struct: (n_chars asc, -doc_id asc) maximized = longest
    # text, then LOWEST doc_id — deterministic without a window.
    best = F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id")))
    return (
        m.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("n_chars").alias("total_chars"),
            best.alias("_best"),
        )
        .select(
            "cluster_id",
            (-F.col("_best.neg_id")).alias("survivor_doc_id"),
            F.col("_best.n_chars").alias("survivor_chars"),
            "n_members",
            (F.col("total_chars") - F.col("_best.n_chars")).alias("dropped_chars"),
        )
    )


# The minhash oracle's CTE list (everything before its final SELECT),
# reused verbatim by the recall audit; the jaccard CTEs get their `t`
# renamed to avoid colliding with minhash's `t`.
_MINHASH_CTES = MINHASH_ORACLE.strip()[len("WITH "):].rsplit("SELECT doc_a", 1)[0].rstrip()
_JACCARD_RENAMED = _JACCARD_PAIRS_SQL.replace("t AS (", "jt AS (").replace(
    "FROM t a JOIN t b", "FROM jt a JOIN jt b"
)

RECALL_ORACLE = f"""
    WITH {_MINHASH_CTES},
    {_JACCARD_RENAMED},
    lsh AS (SELECT doc_a, doc_b FROM v WHERE j >= {JACCARD_THRESHOLD}),
    lsh_lang AS (
      SELECT l.doc_a, l.doc_b
      FROM lsh l JOIN documents x ON l.doc_a = x.doc_id
                 JOIN documents y ON l.doc_b = y.doc_id
      WHERE x.lang = y.lang
    ),
    m AS (
      SELECT count(*) AS c FROM (
        SELECT doc_a, doc_b FROM lsh_lang
        INTERSECT SELECT doc_a, doc_b FROM pairs
      )
    )
    SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT)    AS n_exact,
           CAST((SELECT count(*) FROM lsh_lang) AS BIGINT) AS n_lsh_same_lang,
           CAST((SELECT c FROM m) AS BIGINT)               AS n_matched,
           round(CAST((SELECT c FROM m) AS DOUBLE)
                 / nullif((SELECT count(*) FROM pairs), 0), 4) AS recall
"""


@query("lsh_recall_audit", oracle=RECALL_ORACLE)
def lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the approximate near-dup path (X1 self-check):
    MinHash-LSH's verified same-lang pairs measured against the
    exhaustive prefix-filtered Jaccard pair set — the audit a pipeline
    runs before trusting LSH band parameters on a new corpus (recall
    <1 means band/row settings are dropping true near-dups; the dial
    is N_BANDS x rows-per-band).

    Scale: both inputs are the already-scale-safe operators; the
    audit itself joins only PAIR tables (near-dup pairs, orders of
    magnitude smaller than the corpus — broadcast) plus a doc_id-
    keyed lang lookup. Runs both pipelines, so cost ≈ their sum — an
    audit run, not a production step. Each pair table is persisted
    after BOTH nested registered calls return (a nested entry
    releases earlier scoped persists), so the three counts and the
    semi-join each read a cached pair table instead of re-running a
    whole dedup pipeline per reference.
    """
    exact = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # NOTE: this nested registered call releases the previous call's
    # scoped persists (registry ordering constraint) — `exact` stays a
    # valid lazy plan; it is persisted below, after this call.
    lsh = minhash_lsh_candidates(spark, sf_dir).select("doc_a", "doc_b")
    exact = scoped_persist(exact)

    # Lang attachment: the PAIR side broadcasts into the two doc
    # scans (the corpus side must never broadcast).
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    a_lang = d.withColumnsRenamed({"doc_id": "doc_a", "lang": "lang_a"}).join(
        F.broadcast(lsh), "doc_a"
    )
    lsh_lang = scoped_persist(
        d.withColumnsRenamed({"doc_id": "doc_b", "lang": "lang_b"})
        .join(F.broadcast(a_lang), "doc_b")
        .filter(F.col("lang_a") == F.col("lang_b"))
        .select("doc_a", "doc_b")
    )
    matched = lsh_lang.join(exact, ["doc_a", "doc_b"], "left_semi")

    ne = exact.agg(F.count("*").alias("n_exact"))
    nl = lsh_lang.agg(F.count("*").alias("n_lsh_same_lang"))
    nm = matched.agg(F.count("*").alias("n_matched"))
    return (
        ne.crossJoin(nl)
        .crossJoin(nm)
        .select(
            "n_exact",
            "n_lsh_same_lang",
            "n_matched",
            # CAST AS DOUBLE, not * 1.0: a 1.0 literal is DECIMAL(2,1)
            # in Spark SQL, so the division (and the driver's value
            # hash) would carry decimal scale the oracle's double lacks.
            F.expr(
                "round(CAST(n_matched AS DOUBLE) / nullif(n_exact, 0), 4)"
            ).alias("recall"),
        )
    )


# Exact-substring dedup granularity: a word n-gram this long that
# occurs more than once in the corpus marks every word it covers for
# removal (Lee et al., "Deduplicating Training Data Makes Language
# Models Better", ACL 2022 — their 50-BPE-token threshold, scaled to
# this corpus's short documents).
DUP_NGRAM_K = 8

_DUP_REMOVAL_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, s,
             array_to_string(list_slice(toks, s + 1, s + {DUP_NGRAM_K}), ' ') AS gram
      FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - {DUP_NGRAM_K} + 1)) AS s
            FROM t)
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
    removed AS (
      SELECT DISTINCT g.doc_id, s + off AS pos
      FROM g JOIN dup USING (gram)
           CROSS JOIN (SELECT unnest(range(0, {DUP_NGRAM_K})) AS off)
    ),
    words AS (
      SELECT doc_id, unnest(toks) AS word,
             generate_subscripts(toks, 1) - 1 AS pos
      FROM t
    ),
    kept AS (
      SELECT w.doc_id, w.pos, w.word
      FROM words w ANTI JOIN removed r ON w.doc_id = r.doc_id AND w.pos = r.pos
    )
    SELECT w.doc_id,
           CAST(any_value(len(t.toks)) AS BIGINT)          AS n_tokens_before,
           CAST(count(k.pos) AS BIGINT)                    AS n_tokens_after,
           coalesce(string_agg(k.word, ' ' ORDER BY k.pos), '') AS cleaned_text
    FROM (SELECT DISTINCT doc_id FROM t) w
    JOIN t USING (doc_id)
    LEFT JOIN kept k ON k.doc_id = w.doc_id
    GROUP BY w.doc_id
"""


@query("duplicate_ngram_removal", oracle=_DUP_REMOVAL_ORACLE)
def duplicate_ngram_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring deduplication at word-n-gram granularity (X1;
    Lee et al. 2022): any {DUP_NGRAM_K}-gram occurring >1 time in the
    corpus marks every word position it covers; documents are
    reassembled from the surviving positions. Unlike document-level
    dedup (exact_dedup / minhash) this removes REPEATED SPANS inside
    otherwise-unique documents — the memorization-risk shape.

    Scale: the corpus explodes to ~n_tokens gram rows keyed by the
    gram string (production: 60-bit gram hash) — one hash aggregate
    finds duplicated grams (map-side partial combine absorbs heavy
    hitters), one semi join marks occurrences, and span→position
    fan-out is a bounded K× explode. Reassembly is one groupBy(doc_id)
    with a sort inside the aggregated array, NOT a global sort. No
    driver-side data, no Python, no all-pairs anything.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )  # token/gram explode is compute-dense; don't let one file = one task
    # toks feeds three consumers (grams, the word posexplode, the
    # final before-count) and grams feeds two (census + semi join):
    # persist both so the corpus tokenizes once and gram-explodes
    # once per run, not 3x/2x (r5 review finding). Registry-scoped —
    # released when the entry finishes.
    toks = scoped_persist(
        d.select("doc_id", F.split("text", " ").alias("toks"))
    )
    # filter BEFORE the sequence explode: Spark's sequence(0, n-K)
    # DESCENDS for n < K (DuckDB's range() is empty) — a sub-K doc has
    # no grams in either engine only if we say so explicitly.
    grams = toks.filter(F.size("toks") >= DUP_NGRAM_K).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - DUP_NGRAM_K)
        ).alias("s"),
        "toks",
    ).select(
        "doc_id",
        "s",
        F.array_join(F.slice("toks", F.col("s") + 1, DUP_NGRAM_K), " ").alias("gram"),
    )
    grams = scoped_persist(grams)
    dup = grams.groupBy("gram").count().filter(F.col("count") > 1).select("gram")
    removed = (
        grams.join(dup, "gram", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + DUP_NGRAM_K - 1)
            ).alias("pos"),
        )
        .distinct()
    )
    words = toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "word")
    )
    kept = words.join(removed, ["doc_id", "pos"], "left_anti")
    survived = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens_after"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    return (
        toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens_before"))
        .join(survived, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens_before",
            F.coalesce(F.col("n_tokens_after"), F.lit(0)).cast("long").alias(
                "n_tokens_after"
            ),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
    )


@query(
    "dedup_savings_histogram",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, n_chars, {FINGERPRINT_SQL} AS fingerprint
      FROM documents
    ),
    clusters AS (
      SELECT fingerprint,
             CAST(count(*) AS BIGINT)      AS cluster_size,
             CAST(sum(n_chars) AS BIGINT)  AS cluster_chars,
             CAST(max(n_chars) AS BIGINT)  AS survivor_chars
      FROM fp GROUP BY fingerprint
    )
    SELECT cluster_size,
           CAST(count(*) AS BIGINT)                          AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT)                 AS n_docs,
           CAST(sum(cluster_size - 1) AS BIGINT)             AS removable_docs,
           CAST(sum(cluster_chars - survivor_chars) AS BIGINT) AS removable_chars
    FROM clusters
    GROUP BY cluster_size
    """,
)
def dedup_savings_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup savings profile (X1 planning audit): the distribution of
    duplicate-cluster sizes under the canonical content fingerprint,
    with the docs and chars a keep-one policy would remove — the
    number a pipeline owner looks at BEFORE running dedup (is it
    worth a corpus pass?) and the regression metric after (did the
    dup mass shrink?). Savings assume the keep-longest survivor
    policy of ``dedup_survivors`` (chars saved = cluster total minus
    its longest member).

    Scale: two chained hash aggregates — per-fingerprint then
    per-size — both map-side partial; the first shuffles one row per
    distinct fingerprint, the second one row per cluster SIZE
    (a handful). No joins, no windows, no Python.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    clusters = (
        d.select("doc_id", "n_chars", fingerprint_col().alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("cluster_size"),
            F.sum("n_chars").alias("cluster_chars"),
            F.max("n_chars").alias("survivor_chars"),
        )
    )
    return clusters.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
        F.sum(F.col("cluster_size") - 1).alias("removable_docs"),
        F.sum(F.col("cluster_chars") - F.col("survivor_chars")).alias(
            "removable_chars"
        ),
    )


DF_CAP = 50  # document-frequency cap: shingles in more docs are "stop shingles"
# and are dropped from the pair-generating vocabulary BEFORE any
# inverted-index self-join (sparse_cosine_pairs, containment_dup_pairs)
# — one viral boilerplate shingle is a df² quadratic key at 100 TB.
# stop_shingle_cap_audit measures exactly the Σdf² work this removes.

SPARSE_COSINE_ORACLE = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
               WHERE len(string_split(text, ' ')) >= 3),
    sh AS (SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                    i -> concat_ws(' ', list_extract(w, i),
                                        list_extract(w, i + 1),
                                        list_extract(w, i + 2)))) AS g
           FROM t),
    tf0 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf
            FROM sh GROUP BY doc_id, g),
    stop AS (SELECT g FROM tf0 GROUP BY g HAVING count(*) > {DF_CAP}),
    tf AS (SELECT * FROM tf0 ANTI JOIN stop USING (g)),
    nr AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
           FROM tf GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
             CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
      FROM tf a JOIN tf b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_1, doc_id_2,
           round(dot / sqrt(CAST(x.n2 AS DOUBLE) * y.n2), 6) AS cos_sim
    FROM dots
    JOIN nr x ON doc_id_1 = x.doc_id
    JOIN nr y ON doc_id_2 = y.doc_id
    WHERE 4 * dot * dot >= x.n2 * y.n2
""".format(DF_CAP=DF_CAP)


@query("sparse_cosine_pairs", oracle=SPARSE_COSINE_ORACLE)
def sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-vector cosine near-dup pairs (X1): document pairs
    with cosine ≥ 0.5 over word-3-gram term-frequency vectors — the
    MULTISET cousin of ``ngram_jaccard_pairs`` (Jaccard ignores how
    often a shingle repeats; tf-cosine catches boilerplate that loops
    the same spans). The decision is integer-exact: with integer dot
    products and squared norms, cos ≥ ½ ⇔ 4·dot² ≥ n1·n2 — no float
    enters the predicate, only the emitted similarity is rounded.

    Scale: candidate generation joins the (doc, shingle, tf) posting
    table on the shingle key, so pair work is Σ df(g)² — bounded by
    shingle diversity (word-3-grams are heavy-tailed-free by
    construction; unigrams would be all-pairs and are NOT used) AND
    by the wired DF_CAP: shingles in more than DF_CAP documents are
    dropped from the vocabulary BEFORE norms or the self-join (a
    broadcast anti-join — the stop-shingle set is tiny by
    definition), so one viral boilerplate shingle can never become a
    df² quadratic key. Cosine is then over the capped vocabulary in
    BOTH lanes. Norms reduce the posting table, not the corpus;
    everything is a hash aggregate or an equi-join — no window, no
    Python.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sh = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .filter(F.size(toks) >= 3)
        .select("doc_id", F.explode(_shingles(toks)).alias("g"))
    )
    tf0 = sh.groupBy("doc_id", "g").agg(F.count("*").alias("tf"))
    tf0 = scoped_persist(tf0)  # feeds the df census AND the capped postings
    stop = (
        tf0.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > DF_CAP)
        .select("g")
    )
    tf = tf0.join(F.broadcast(stop), "g", "left_anti")
    tf = scoped_persist(tf)  # feeds norms AND the pair join
    nr = tf.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("n2"))
    a = tf.select(F.col("doc_id").alias("doc_id_1"), "g", F.col("tf").alias("tf1"))
    b = tf.select(F.col("doc_id").alias("doc_id_2"), "g", F.col("tf").alias("tf2"))
    dots = (
        a.join(b, "g")
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.sum(F.col("tf1") * F.col("tf2")).alias("dot"))
    )
    n1 = nr.select(F.col("doc_id").alias("doc_id_1"), F.col("n2").alias("n2_1"))
    n2 = nr.select(F.col("doc_id").alias("doc_id_2"), F.col("n2").alias("n2_2"))
    return (
        dots.join(n1, "doc_id_1")
        .join(n2, "doc_id_2")
        .filter(4 * F.col("dot") * F.col("dot") >= F.col("n2_1") * F.col("n2_2"))
        .select(
            "doc_id_1",
            "doc_id_2",
            F.round(
                F.col("dot")
                / F.sqrt(F.col("n2_1").cast("double") * F.col("n2_2")),
                6,
            ).alias("cos_sim"),
        )
    )


BOUNDARY_K = 3  # boundary shingle width (words)


@query(
    "doc_boundary_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    edges AS (
      SELECT doc_id,
             array_to_string(list_slice(w, 1, {BOUNDARY_K}), ' ')  AS head,
             array_to_string(
               list_slice(w, len(w) - {BOUNDARY_K} + 1, len(w)), ' ') AS tail
      FROM t WHERE len(w) >= {BOUNDARY_K}
    )
    SELECT a.doc_id AS tail_doc, b.doc_id AS head_doc, a.tail AS shingle
    FROM edges a JOIN edges b ON a.tail = b.head AND a.doc_id <> b.doc_id
    ORDER BY tail_doc, head_doc
    LIMIT 50
    """,
)
def doc_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenation-boundary contamination scan (X1): pairs of
    documents where one document's TRAILING BOUNDARY_K-word shingle
    reappears as another's LEADING shingle — the signature of a
    corpus assembled by naive splitting of a larger stream (web
    crawls chunked mid-page, books sharded mid-paragraph). Training
    on such a corpus double-counts every boundary span and leaks
    context across supposed document boundaries; the pairs are also
    stitch candidates for re-joining split docs.

    Scale: one projection computes both boundary shingles per doc (no
    explode — two array slices), then a single equi-join of the
    tails table against the heads table ON THE SHINGLE STRING — an
    ordinary key-partitioned hash join whose key cardinality is the
    number of distinct boundary shingles (heavy-hitter boilerplate
    shingles are exactly what AQE skew-split handles). Never an
    all-pairs compare; top-50 is TakeOrderedAndProject.
    """
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    edges = d.filter(F.size(w) >= BOUNDARY_K).select(
        "doc_id",
        F.array_join(F.slice(w, 1, BOUNDARY_K), " ").alias("head"),
        F.array_join(F.slice(w, -BOUNDARY_K, BOUNDARY_K), " ").alias("tail"),
    )
    edges = scoped_persist(edges)
    tails = edges.select(F.col("doc_id").alias("tail_doc"), F.col("tail").alias("shingle"))
    heads = edges.select(F.col("doc_id").alias("head_doc"), F.col("head").alias("shingle"))
    return (
        tails.join(heads, "shingle")
        .filter(F.col("tail_doc") != F.col("head_doc"))
        .select("tail_doc", "head_doc", "shingle")
        .orderBy("tail_doc", "head_doc")
        .limit(50)
    )


CONT_NUM, CONT_DEN = 3, 5  # containment threshold 3/5 = 0.6


@query(
    "containment_dup_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
               i -> concat_ws(' ', list_extract(string_split(text, ' '), i),
                                   list_extract(string_split(text, ' '), i + 1),
                                   list_extract(string_split(text, ' '), i + 2)))) AS sh
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    p0 AS (SELECT doc_id, lang, unnest(sh) AS h FROM t),
    stop AS (SELECT h FROM p0 GROUP BY h HAVING count(*) > {DF_CAP}),
    p1 AS (SELECT * FROM p0 ANTI JOIN stop USING (h)),
    p AS (SELECT doc_id, lang, h,
                 count(*) OVER (PARTITION BY doc_id) AS n
          FROM p1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             min(a.n) AS na, min(b.n) AS nb, count(*) AS inter
      FROM p a JOIN p b ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / least(na, nb), 4) AS containment
    FROM pairs
    WHERE {CONT_DEN} * inter >= {CONT_NUM} * least(na, nb)
    """,
)
def containment_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT near-dup pairs (X1): max-containment
    ``|A∩B| / min(|A|, |B|)`` over distinct word-3-gram sets, blocked
    by lang — Broder's containment coefficient, the measure Jaccard
    misses: a short doc fully embedded in a long one (quote farms,
    boilerplate wrappers, doc-in-doc crawls) scores near 1.0 here but
    near |A|/|B| ≈ 0 on Jaccard, so resemblance-only dedup keeps both
    copies. Reference scope: the LLM-pipeline dedup tier mandated on
    top of the reference's SQL surface (/root/reference/README.md:68).

    EXACT, not approximate: any pair at containment ≥ 3/5 over the
    capped vocabulary shares at least one surviving shingle, so
    generating candidates from the shingle inverted index (explode →
    equi-join on the shingle hash → count = intersection size) finds
    every qualifying pair — recall 1 by construction, never an
    all-pairs compare. The threshold test is the integer
    cross-multiplication ``5·inter ≥ 3·min(na, nb)``; the only float
    is the one reported division.

    Scale: postings are (doc, 64-bit shingle hash) pairs; the
    self-join is keyed on the hash, so work concentrates exactly on
    shared shingles. The standard df-cap on stop-shingles is WIRED,
    not just documented: shingles in more than DF_CAP documents are
    dropped from the postings (broadcast anti-join — the stop set is
    tiny by definition) BEFORE the self-join, and per-doc set sizes
    recompute over the surviving vocabulary, so containment is
    measured over the capped vocabulary in both lanes and one viral
    boilerplate shingle can never become a df² quadratic key.
    ``stop_shingle_cap_audit`` quantifies the Σdf² work this removes.
    The oracle joins raw shingle strings — document frequencies,
    intersection SIZES and set sizes are invariant under the
    injective hash, the ``ngram_jaccard_pairs`` argument.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    toks = F.split("text", " ")
    sh = F.array_distinct(F.transform(_shingles(toks), md5_long))
    post0 = (
        d.filter(F.size(toks) >= 3)
        .select("doc_id", "lang", F.explode(sh).alias("h"))
    )
    post0 = scoped_persist(post0)  # feeds the df census AND the capped postings
    stop = (
        post0.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > DF_CAP)
        .select("h")
    )
    kept = post0.join(F.broadcast(stop), "h", "left_anti")
    n_tbl = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    post = kept.join(n_tbl, "doc_id")
    a = post.select(
        F.col("doc_id").alias("doc_a"), "lang", F.col("n").alias("na"), "h"
    )
    b = post.select(
        F.col("doc_id").alias("doc_b"), "lang", F.col("n").alias("nb"), "h"
    )
    return (
        a.join(b, ["h", "lang"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.min("na").alias("na"), F.min("nb").alias("nb"), F.count("*").alias("inter"))
        .filter(CONT_DEN * F.col("inter") >= CONT_NUM * F.least("na", "nb"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double") / F.least("na", "nb"), 4
            ).alias("containment"),
        )
    )


_NORM_DUCK = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
    " '  +', ' ', 'g'))"
)


@query(
    "normalized_dedup_gain",
    oracle=f"""
    WITH hashed AS (
      SELECT source, md5(text) AS raw_h, md5({_NORM_DUCK}) AS norm_h
      FROM documents
    ),
    raw_g AS (
      SELECT source, CAST(sum(c - 1) AS BIGINT) AS extra
      FROM (SELECT source, raw_h, count(*) AS c FROM hashed GROUP BY 1, 2)
      GROUP BY source
    ),
    norm_g AS (
      SELECT source, CAST(sum(c - 1) AS BIGINT) AS extra
      FROM (SELECT source, norm_h, count(*) AS c FROM hashed GROUP BY 1, 2)
      GROUP BY source
    )
    SELECT r.source,
           r.extra AS raw_dup_rows,
           n.extra AS normalized_dup_rows,
           n.extra - r.extra AS dedup_gain
    FROM raw_g r JOIN norm_g n USING (source)
    ORDER BY r.source
    """,
)
def normalized_dedup_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many MORE duplicate rows exact-dedup finds after text
    normalization (lowercase → strip non-alnum → collapse spaces —
    the text_normalization_census pipeline), per source. This is the
    dedup-side justification for normalizing before hashing (C4
    normalizes, CCNet lowercases; the gain column is the evidence):
    raw md5-exact dup count vs normalized-hash dup count, computed in
    one scan.

    Exactness: both lanes hash with md5 over identical strings
    (Spark md5 == DuckDB md5 on UTF-8); dup rows per group = Σ(c−1),
    all integers.

    Scale: one scan emits both hashes; two (source, hash) hash
    aggregates with map-side partials — hash strings, never document
    bodies, cross the exchange; the final join is |sources| rows.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            "  +",
            " ",
        )
    )
    both = d.select(
        "source", F.md5("text").alias("raw_h"), F.md5(norm).alias("norm_h")
    )
    both = scoped_persist(both)

    def extra(col, name):
        return (
            both.groupBy("source", col)
            .agg(F.count("*").alias("c"))
            .groupBy("source")
            .agg(F.sum(F.col("c") - 1).alias(name))
        )

    r = extra("raw_h", "raw_dup_rows")
    n = extra("norm_h", "normalized_dup_rows")
    return (
        r.join(n, "source")
        .select(
            "source",
            "raw_dup_rows",
            "normalized_dup_rows",
            (F.col("normalized_dup_rows") - F.col("raw_dup_rows")).alias(
                "dedup_gain"
            ),
        )
        .orderBy("source")
    )


@query(
    "stop_shingle_cap_audit",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(1, len(t) - 1),
               i -> array_to_string(t[i:i+2], ' ')
             )) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 3
    ),
    df AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY s)
    SELECT CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN df > {DF_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_stop_shingles,
           CAST(sum(df * df) AS BIGINT) AS pair_work_total,
           CAST(sum(CASE WHEN df > {DF_CAP} THEN df * df ELSE 0 END) AS BIGINT)
             AS pair_work_capped,
           round(CAST(sum(CASE WHEN df > {DF_CAP} THEN df * df ELSE 0 END)
                 AS DOUBLE) / sum(df * df), 6) AS pair_work_saved_share
    FROM df
    """,
)
def stop_shingle_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The document-frequency cap audit behind every inverted-index
    pair generator here (ngram_jaccard_pairs, containment_dup_pairs):
    a shingle appearing in df documents contributes df² candidate-pair
    work, so the handful of boilerplate 'stop shingles' above a df cap
    dominate the join — this measures exactly how much (Σdf² mass
    above the cap / total). pair_work_saved_share near 1 on web-scale
    corpora is WHY the cap is standard practice (the Bayardo/prefix-
    filter companion number); the audit is the evidence to set DF_CAP
    before running the expensive pair stage.

    Exactness: document frequencies and Σdf² are exact integers; one
    division, rounded once.

    Scale: per-doc DISTINCT shingles (map-side array_distinct — no
    cross-doc shuffle of shingle arrays), one shingle-keyed count, one
    global sum. This audit is LINEAR in the corpus; the join it sizes
    is quadratic per key — the point. The up-front repartition (r7
    verdict #4: 4.4 s → 1.3 s warm at sf0.1) spreads the explode
    across all cores when the source parquet arrives in few splits —
    the shuffle moves raw docs (cheap), never shingle rows; at 100 TB
    the scan has enough native splits and the exchange is elided by
    AQE when partitioning already suffices. Cross-QUERY reuse of the
    postings frame that ngram_jaccard_pairs/containment_dup_pairs also
    build is impossible under the harness's registry scoping: each
    entry is an independent (spark, sf_dir) callable, and both the
    driver and bench.py clear all caches between entries
    (`spark.catalog.clearCache()`), so a shared scoped_persist would
    never survive to the next query — the fix is making the audit's
    own scan parallel instead.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    toks = F.split("text", " ")
    sh = (
        d.filter(F.size(toks) >= 3)
        .select(
            "doc_id",
            F.explode(F.array_distinct(_shingles(toks))).alias("s"),
        )
    )
    df = sh.groupBy("s").agg(F.count("*").alias("df"))
    work = F.col("df") * F.col("df")
    capped = F.when(F.col("df") > DF_CAP, work).otherwise(F.lit(0))
    return df.agg(
        F.count("*").alias("n_shingles"),
        F.sum((F.col("df") > DF_CAP).cast("int")).cast("long").alias(
            "n_stop_shingles"
        ),
        F.sum(work).alias("pair_work_total"),
        F.sum(capped).alias("pair_work_capped"),
        F.round(
            F.sum(capped).cast("double") / F.sum(work), 6
        ).alias("pair_work_saved_share"),
    )


INC_BATCH_MOD = 10  # doc_id % 10 == 0 plays the "incoming batch" role


@query(
    "incremental_dedup_probe",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', '', 'g'), '  +', ' ', 'g'))) AS nh,
             doc_id % {INC_BATCH_MOD} = 0 AS is_new
      FROM documents
    ),
    corpus AS (SELECT DISTINCT nh FROM h WHERE NOT is_new),
    batch AS (SELECT source, nh FROM h WHERE is_new)
    SELECT b.source,
           CAST(count(*) AS BIGINT) AS n_incoming,
           CAST(sum(CASE WHEN c.nh IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_already_present,
           round(CAST(sum(CASE WHEN c.nh IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
                 / count(*), 6) AS dup_vs_corpus_rate
    FROM batch b LEFT JOIN corpus c USING (nh)
    GROUP BY b.source
    ORDER BY b.source
    """,
)
def incremental_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the production shape: a new ingest batch
    (stand-in: doc_id % {INC_BATCH_MOD} == 0) probed against the
    ALREADY-COMMITTED corpus's normalized-hash index, per source. A
    steady-state pipeline never re-dedups the corpus against itself on
    every ingest; it maintains the hash index and runs exactly this
    batch-vs-index semi-probe — cost proportional to the BATCH, not
    the corpus (Lee et al. 2022 practice; the streaming complement of
    exact_dedup's full-corpus census).

    Exactness: md5 over the shared normalization pipeline; integer
    counts, one division rounded once.

    Scale: corpus side reduces to DISTINCT hashes once (map-side
    combined; in production it IS the stored index — here derived in
    the same query for the oracle); the probe is one equi hash join
    keyed on the hash — the batch side is small, so AQE broadcasts it.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            "  +",
            " ",
        )
    )
    h = d.select(
        "source",
        F.md5(norm).alias("nh"),
        (F.col("doc_id") % INC_BATCH_MOD == 0).alias("is_new"),
    )
    h = scoped_persist(h)
    corpus = h.filter(~F.col("is_new")).select("nh").distinct().withColumn(
        "_hit", F.lit(1)
    )
    batch = h.filter(F.col("is_new")).select("source", "nh")
    hits = F.sum(F.col("_hit").isNotNull().cast("int")).cast("long")
    return (
        batch.join(corpus, "nh", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_incoming"),
            hits.alias("n_already_present"),
            F.round(hits.cast("double") / F.count("*"), 6).alias(
                "dup_vs_corpus_rate"
            ),
        )
        .orderBy("source")
    )


@query(
    "cross_source_leakage_matrix",
    oracle=f"""
    WITH fp AS (
      SELECT source, doc_id, {FINGERPRINT_SQL} AS fp
      FROM documents
    ),
    sfp AS (SELECT DISTINCT source, fp FROM fp)
    SELECT a.source            AS source,
           b.source            AS other_source,
           CAST(count(DISTINCT a.fp) AS BIGINT)     AS shared_fingerprints,
           CAST(count(DISTINCT a.doc_id) AS BIGINT) AS leaked_docs
    FROM fp a JOIN sfp b ON a.fp = b.fp AND a.source <> b.source
    GROUP BY 1, 2
    ORDER BY source, other_source
    """,
)
def cross_source_leakage_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate-leakage matrix (X1 × curation): for each
    ordered source pair, how many of `source`'s documents carry a
    winnowing fingerprint that also appears in `other_source`, and how
    many distinct fingerprints are shared. The cross-corpus
    contamination census a mixture plan reads before weighting
    sources (a crawl that wholesale-contains a curated corpus
    double-counts it at whatever mixture weight both get) — the
    SOURCE-pair analogue of ``split_leakage_check``'s train/test gate,
    on the same fingerprint definition (one shared SQL literal), so
    this matrix can never drift from what dedup actually clusters on.

    Exactness: fingerprints are md5-derived (bit-identical across
    engines); both measures are distinct-counts.

    Scale: the (source, fp) membership table dedups BEFORE the join
    (map-side partial distinct), so the join is keyed on the
    fingerprint with at most |sources| rows per key on the build side
    — never doc × doc; the output is |sources|² rows.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    fp = d.select("source", "doc_id", fingerprint_col().alias("fp"))
    fp = scoped_persist(fp)  # probe side AND membership build side
    sfp = fp.select(F.col("source").alias("other_source"), "fp").distinct()
    return (
        fp.join(sfp, "fp")
        .filter(F.col("source") != F.col("other_source"))
        .groupBy("source", "other_source")
        .agg(
            F.countDistinct("fp").alias("shared_fingerprints"),
            F.countDistinct("doc_id").alias("leaked_docs"),
        )
        .orderBy("source", "other_source")
    )


BAND_GRID = ((2, 8), (4, 4), (8, 2), (16, 1))  # (bands, rows) with b*r = 16

_MH_SQL = f"""
    t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
    sh AS (SELECT doc_id, list_distinct({_SHINGLE_LIST_SQL}) AS s FROM t),
    hp AS (
      SELECT doc_id,
             list_transform(list_transform(s, g -> md5(g)), m ->
               {{'h1': CAST(('0x' || substr(m, 1, 15)) AS BIGINT),
                 'h2': CAST(('0x' || substr(m, 16, 15)) AS BIGINT) % {H2_MOD}}}) AS hp
      FROM sh
    ),
    mh AS (
      SELECT doc_id,
             list_transform(range(0, {N_MINHASH}), i ->
               list_min(list_transform(hp, p -> p.h1 + i * p.h2))) AS mh
      FROM hp
    )"""


@query(
    "lsh_band_tuning_audit",
    oracle=f"""
    WITH {_MH_SQL},
    grid AS (SELECT * FROM (VALUES {", ".join(f"({b}, {r})" for b, r in BAND_GRID)})
             g(bands, rows_per_band)),
    buckets AS (
      SELECT g.bands, g.rows_per_band, band,
             array_to_string(list_slice(mh.mh, band * g.rows_per_band + 1,
                             band * g.rows_per_band + g.rows_per_band), '|') AS bh
      FROM mh CROSS JOIN grid g, unnest(range(0, g.bands)) AS u(band)
    ),
    sizes AS (
      SELECT bands, rows_per_band, CAST(count(*) AS BIGINT) AS n
      FROM buckets GROUP BY bands, rows_per_band, band, bh
    )
    SELECT bands, rows_per_band,
           CAST(count(*) AS BIGINT)                       AS total_buckets,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                          AS multi_buckets,
           CAST(max(n) AS BIGINT)                         AS max_bucket,
           CAST(sum(n * (n - 1) / 2) AS BIGINT)           AS candidate_mass
    FROM sizes
    GROUP BY bands, rows_per_band
    ORDER BY bands
    """,
)
def lsh_band_tuning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-geometry tuning audit (X1 — the measurement behind
    choosing (b, r) in MinHash-LSH, Leskovec/Rajaraman/Ullman ch.3):
    for every (bands × rows) factorization of the {N_MINHASH}-lane
    signature, the ACTUAL bucket census this corpus would produce —
    total buckets, colliding buckets, the largest bucket, and the
    candidate-pair mass Σ n·(n−1)/2 that the verify stage would have
    to score. More bands (lower r) pushes the S-curve left: recall up,
    candidate mass up — this audit prices that trade on real data
    BEFORE committing the expensive pair stage, the same
    evidence-first posture as ``stop_shingle_cap_audit``. The
    production config (b={N_BANDS}) is one of the audited rows, so the
    audit also regression-tracks the live setting's workload.

    Exactness: signatures are the md5-derived Kirsch-Mitzenmacher
    lanes (bit-identical in DuckDB); everything else is integer
    counting.

    Scale: the signature computes ONCE (one pass, no shuffle), bands
    explode to Σb = {sum(b for b, _ in BAND_GRID)} rows per doc, and the census is
    two hash aggregates — candidate pairs are COUNTED from bucket
    sizes, never materialized, so the audit is linear in the corpus
    even where the pair stage would be quadratic.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    toks = F.split("text", " ")
    sig = d.filter(F.size(toks) >= 3).select(
        "doc_id", minhash_signature(toks).alias("mh")
    )
    all_bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("bands"),
                F.lit(r).alias("rows_per_band"),
                F.lit(band).alias("band"),
                F.array_join(
                    F.slice("mh", band * r + 1, r), "|"
                ).alias("bh"),
            )
            for b, r in BAND_GRID
            for band in range(b)
        ]
    )
    sizes = (
        sig.select(F.explode(all_bands).alias("e"))
        .select("e.bands", "e.rows_per_band", "e.band", "e.bh")
        .groupBy("bands", "rows_per_band", "band", "bh")
        .agg(F.count("*").alias("n"))
    )
    return (
        sizes.groupBy("bands", "rows_per_band")
        .agg(
            F.count("*").alias("total_buckets"),
            F.sum((F.col("n") > 1).cast("int")).cast("long").alias(
                "multi_buckets"
            ),
            F.max("n").alias("max_bucket"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias(
                "candidate_mass"
            ),
        )
        .orderBy("bands")
    )


CDC_MOD = 8  # expected chunk length ≈ CDC_MOD tokens (boundary P = 1/8)


@query(
    "cdc_chunk_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w
               FROM documents),
    pos AS (
      SELECT doc_id, source, unnest(w) AS tok, generate_subscripts(w, 1) AS p
      FROM t
    ),
    flagged AS (
      SELECT doc_id, source, tok, p,
             CASE WHEN {_md5_long_sql('tok')} % {CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS cut
      FROM pos
    ),
    chunked AS (
      SELECT doc_id, source, tok, p,
             sum(cut) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS UNBOUNDED PRECEDING) AS chunk_idx
      FROM flagged
    ),
    chunks AS (
      SELECT source, md5(string_agg(tok, ' ' ORDER BY p)) AS ch,
             CAST(count(*) AS BIGINT) AS n_toks
      FROM chunked GROUP BY doc_id, source, chunk_idx
    ),
    dups AS (
      SELECT ch, CAST(count(*) AS BIGINT) AS cnt,
             CAST(min(n_toks) AS BIGINT) AS n_toks
      FROM chunks GROUP BY ch
    )
    SELECT CAST(sum(cnt) AS BIGINT)                      AS total_chunks,
           CAST(count(*) AS BIGINT)                      AS distinct_chunks,
           CAST(sum(cnt - 1) AS BIGINT)                  AS dup_chunks,
           CAST(sum((cnt - 1) * n_toks) AS BIGINT)       AS dup_token_mass,
           round(sum(cnt * n_toks) / CAST(sum(cnt) AS DOUBLE), 4)
                                                         AS avg_chunk_tokens
    FROM dups
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup census (X1 — the FastCDC/LBFS
    rolling-boundary idea, token-granular): a token is a cut point
    when its content hash ≡ 0 (mod {CDC_MOD}), so chunk boundaries are
    a function of CONTENT alone — the same passage chunks identically
    wherever it appears, which is what lets chunk-level dedup find
    shared passages that whole-doc hashing misses and shifted copies
    that fixed-width blocks miss (the anchor property backup systems
    and long-doc dedup both rely on). Reports total/distinct/duplicate
    chunk counts, the duplicated token mass (the dedup savings number
    at chunk granularity), and the realized mean chunk length
    (expected ≈ {CDC_MOD} tokens by the boundary probability).

    Exactness: boundaries and chunk identities are md5-derived
    (bit-identical across engines); every measure is an integer sum;
    one division, rounded once.

    Scale: chunking is doc-LOCAL — one (doc)-partitioned running sum
    assigns chunk ids, one (doc, chunk) aggregate materializes chunk
    hashes (32-byte digests shuffle, never chunk text beyond the
    per-doc aggregate), and the dedup census is a hash aggregate on
    the digest — the ``exact_dedup`` shape one level below documents.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    toks = F.split("text", " ")
    pos = d.select("doc_id", "source", F.posexplode(toks).alias("p", "tok"))
    cut = (md5_long(F.col("tok")) % CDC_MOD == 0).cast("int")
    w = Window.partitionBy("doc_id").orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    chunked = pos.select(
        "doc_id", "source", "tok", "p", F.sum(cut).over(w).alias("chunk_idx")
    )
    chunks = (
        chunked.groupBy("doc_id", "source", "chunk_idx")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("p", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("ch"),
            F.count("*").alias("n_toks"),
        )
    )
    dups = chunks.groupBy("ch").agg(
        F.count("*").alias("cnt"), F.min("n_toks").alias("n_toks")
    )
    return dups.agg(
        F.sum("cnt").alias("total_chunks"),
        F.count("*").alias("distinct_chunks"),
        F.sum(F.col("cnt") - 1).alias("dup_chunks"),
        F.sum((F.col("cnt") - 1) * F.col("n_toks")).alias("dup_token_mass"),
        F.round(
            F.sum(F.col("cnt") * F.col("n_toks"))
            / F.sum("cnt").cast("double"),
            4,
        ).alias("avg_chunk_tokens"),
    )


@query(
    "minhash_estimate_error_audit",
    oracle=f"""
    WITH {_MH_SQL},
    buckets AS (
      SELECT doc_id, band,
             array_to_string(list_slice(mh.mh, band * {_R} + 1,
                             band * {_R} + {_R}), '|') AS bh
      FROM mh CROSS JOIN (SELECT unnest(range(0, {N_BANDS})) AS band) bands
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT
        CAST(len(list_filter(range(1, {N_MINHASH} + 1),
                             i -> x.mh[i] = y.mh[i])) AS BIGINT) AS matches,
        CAST(round(1000000 * (
          len(list_filter(range(1, {N_MINHASH} + 1),
                          i -> x.mh[i] = y.mh[i])) / {N_MINHASH}.0
          - len(list_intersect(sx.s, sy.s))
            / CAST(len(sx.s) + len(sy.s) - len(list_intersect(sx.s, sy.s))
                   AS DOUBLE))) AS BIGINT) AS err_micro
      FROM cand
      JOIN mh x ON cand.doc_a = x.doc_id
      JOIN mh y ON cand.doc_b = y.doc_id
      JOIN sh sx ON cand.doc_a = sx.doc_id
      JOIN sh sy ON cand.doc_b = sy.doc_id
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_pairs,
           round(avg(matches / {N_MINHASH}.0), 6)         AS mean_estimate,
           round(CAST(sum(err_micro) AS DOUBLE) / 1000000 / count(*), 6)
                                                          AS mean_error,
           round(CAST(sum(abs(err_micro)) AS DOUBLE) / 1000000 / count(*), 6)
                                                          AS mean_abs_error,
           round(CAST(max(abs(err_micro)) AS DOUBLE) / 1000000, 6)
                                                          AS max_abs_error
    FROM scored
    """,
)
def minhash_estimate_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ESTIMATION-ERROR audit (X1 — the sketch-accuracy
    companion of ``lsh_recall_audit``, which measures candidate
    recall): over the LSH candidate pairs, compare the signature's
    Jaccard estimate (matching lanes / {N_MINHASH}) against the exact
    shingle Jaccard, reporting mean signed error (bias), mean absolute
    error, and worst case. With {N_MINHASH} lanes the binomial
    std-dev is ≈ √(s(1−s)/{N_MINHASH}) ≈ 0.125 at s = 0.5 — this
    audit verifies the deployed sketch actually sits inside that
    envelope on THIS corpus, which is the evidence for (or against)
    spending more lanes before trusting estimate-ranked dedup.

    Exactness: lane matches are integer counts on md5-derived
    signatures both engines compute bit-identically; the exact Jaccard
    is a rational; the per-pair error quantizes to integer micro-units
    before the reduce.

    Scale: identical candidate generation to ``minhash_lsh_candidates``
    (band-bucket equi-join, never all-pairs); the per-pair compare
    touches two 16-long signatures and two hashed shingle sets; the
    reduce is one partial-aggregated global sum.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sh_set = F.array_distinct(F.transform(_shingles(toks), lambda s: F.xxhash64(s)))
    sig = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .filter(F.size(toks) >= 3)
        .select("doc_id", sh_set.alias("sh"), minhash_signature(toks).alias("mh"))
    )
    sig = scoped_persist(sig)  # band buckets + both compare sides

    r = N_MINHASH // N_BANDS
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.element_at("mh", b * r + j + 1) for j in range(r)]
            ).alias("bh"),
        )
        for b in range(N_BANDS)
    ]
    buckets = sig.select("doc_id", F.explode(F.array(*bands)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    side = lambda suf: sig.select(  # noqa: E731 — tiny local renamer
        F.col("doc_id").alias(f"doc_{suf}"),
        F.col("sh").alias(f"sh_{suf}"),
        F.col("mh").alias(f"mh_{suf}"),
    )
    pairs = cand.join(side("a"), "doc_a").join(side("b"), "doc_b")
    matches = F.size(
        F.filter(
            F.zip_with("mh_a", "mh_b", lambda p, q: p == q), lambda x: x
        )
    ).cast("long")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = (F.size("sh_a") + F.size("sh_b") - inter).cast("double")
    err_micro = F.round(
        1_000_000 * (matches / float(N_MINHASH) - inter / union)
    ).cast("long")
    scored = pairs.select(matches.alias("matches"), err_micro.alias("err_micro"))
    return scored.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg(F.col("matches") / float(N_MINHASH)), 6).alias(
            "mean_estimate"
        ),
        F.round(
            F.sum("err_micro").cast("double") / 1_000_000 / F.count("*"), 6
        ).alias("mean_error"),
        F.round(
            F.sum(F.abs(F.col("err_micro"))).cast("double")
            / 1_000_000
            / F.count("*"),
            6,
        ).alias("mean_abs_error"),
        F.round(
            F.max(F.abs(F.col("err_micro"))).cast("double") / 1_000_000, 6
        ).alias("max_abs_error"),
    )


@query(
    "dedup_cluster_source_mix",
    oracle=f"""
    WITH fp AS (
      SELECT source, {FINGERPRINT_SQL} AS fp
      FROM documents
    ),
    clusters AS (
      SELECT fp, CAST(count(*) AS BIGINT) AS cluster_size,
             CAST(count(DISTINCT source) AS BIGINT) AS source_span
      FROM fp GROUP BY fp
      HAVING count(*) >= 2
    )
    SELECT source_span,
           CAST(count(*) AS BIGINT)          AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs,
           CAST(max(cluster_size) AS BIGINT) AS max_cluster
    FROM clusters
    GROUP BY source_span
    ORDER BY source_span
    """,
)
def dedup_cluster_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster source-span census (X1): for every
    fingerprint cluster of ≥ 2 docs, how many DISTINCT sources it
    spans, histogrammed. Span-1 clusters are within-source churn
    (re-crawls, mirrored pages — dedup freely); span-k clusters are
    cross-source duplication, where the keep-one policy silently
    chooses which SOURCE keeps representation — the cluster-level
    companion of ``cross_source_leakage_matrix``'s pairwise view, on
    the same fingerprint definition, and the number a mixture plan
    needs before treating per-source token counts as independent.

    Exactness: md5-derived fingerprints; counts and distinct-counts.

    Scale: one (fingerprint) hash aggregate over 32-byte digests with
    map-side partial distinct on source, then a histogram over the
    CLUSTER table (≤ distinct-fingerprint rows) — the ``exact_dedup``
    shuffle shape with one extra tiny aggregate.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    clusters = (
        d.select("source", fingerprint_col().alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("cluster_size"),
            F.countDistinct("source").alias("source_span"),
        )
        .filter(F.col("cluster_size") >= 2)
    )
    return (
        clusters.groupBy("source_span")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
            F.max("cluster_size").alias("max_cluster"),
        )
        .orderBy("source_span")
    )


SWEEP_THRESHOLDS = (50, 60, 70, 80, 90)  # Jaccard percent cut points


@query(
    "jaccard_threshold_sweep",
    oracle=f"""
    WITH {_JACCARD_PAIRS_SQL},
    grid AS (SELECT unnest([{", ".join(str(t) for t in SWEEP_THRESHOLDS)}])
             AS threshold_pct),
    sel AS (
      SELECT g.threshold_pct, p.doc_a, p.doc_b
      FROM grid g JOIN pairs p
        ON CAST(round(p.jaccard * 10000) AS BIGINT) >= g.threshold_pct * 100
    ),
    np AS (SELECT threshold_pct, CAST(count(*) AS BIGINT) AS n_pairs
           FROM sel GROUP BY threshold_pct),
    nd AS (
      SELECT threshold_pct, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs
      FROM (SELECT threshold_pct, doc_a AS doc FROM sel
            UNION SELECT threshold_pct, doc_b FROM sel)
      GROUP BY threshold_pct
    )
    SELECT g.threshold_pct,
           coalesce(np.n_pairs, 0) AS n_pairs,
           coalesce(nd.n_docs, 0)  AS n_docs
    FROM grid g
    LEFT JOIN np USING (threshold_pct)
    LEFT JOIN nd USING (threshold_pct)
    ORDER BY g.threshold_pct
    """,
)
def jaccard_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold planning sweep (X1): how many verified near-dup
    pairs — and how many documents they touch — survive each candidate
    Jaccard threshold (50…90%). THE curve a pipeline owner reads to
    set τ: too low and dedup eats legitimate boilerplate-sharing docs,
    too high and templated spam survives; the knee of this curve is
    the evidence. Computed over the SAME verified pair set as
    ``ngram_jaccard_pairs`` (invoked as the inner stage, so the sweep
    can never disagree with the operator it tunes).

    Exactness: the threshold test is an integer comparison on the
    4-dp-rounded Jaccard both engines already agree on
    (round(j·10⁴) ≥ t·100); pair/doc counts are integers.

    Scale: the pair set is computed ONCE by the prefix-filtered
    inverted-index join (never all-pairs); the sweep itself is a
    |thresholds|×|pairs| broadcast join over the tiny grid plus two
    hash aggregates over the PAIR table, not the corpus.
    """
    # Invoke the registered inner query FIRST (registry ordering rule:
    # nested entry releases scoped persists on entry).
    from couchwarehouse_spark.plans import QUERIES

    pairs = QUERIES["ngram_jaccard_pairs"](spark, sf_dir)
    pairs = scoped_persist(pairs)
    grid = F.array(*[F.lit(t) for t in SWEEP_THRESHOLDS])
    sel = (
        pairs.select(
            "doc_a",
            "doc_b",
            F.round(F.col("jaccard") * 10_000).cast("long").alias("j4"),
            F.explode(grid).alias("threshold_pct"),
        )
        .filter(F.col("j4") >= F.col("threshold_pct") * 100)
    )
    sel = scoped_persist(sel)
    np_ = sel.groupBy("threshold_pct").agg(F.count("*").alias("n_pairs"))
    docs = sel.select("threshold_pct", F.col("doc_a").alias("doc")).union(
        sel.select("threshold_pct", F.col("doc_b").alias("doc"))
    )
    nd = docs.groupBy("threshold_pct").agg(
        F.countDistinct("doc").alias("n_docs")
    )
    grid_rows = spark.sql(
        "SELECT explode(array({})) AS threshold_pct".format(
            ", ".join(str(t) for t in SWEEP_THRESHOLDS)
        )
    )
    return (
        grid_rows.join(F.broadcast(np_), "threshold_pct", "left")
        .join(F.broadcast(nd), "threshold_pct", "left")
        .select(
            "threshold_pct",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        )
        .orderBy("threshold_pct")
    )


LEV_DIST_DEN = 10  # pair qualifies when 10·dist ≤ max(len_a, len_b)


@query(
    "levenshtein_near_dup",
    oracle=f"""
    WITH {_MH_SQL},
    buckets AS (
      SELECT doc_id, band,
             array_to_string(list_slice(mh.mh, band * {_R} + 1,
                             band * {_R} + {_R}), '|') AS bh
      FROM mh CROSS JOIN (SELECT unnest(range(0, {N_BANDS})) AS band) bands
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT cand.doc_a, cand.doc_b,
             CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist,
             CAST(greatest(len(x.text), len(y.text)) AS BIGINT) AS max_len
      FROM cand
      JOIN documents x ON cand.doc_a = x.doc_id
      JOIN documents y ON cand.doc_b = y.doc_id
    )
    SELECT doc_a, doc_b, edit_dist,
           round(1.0 - edit_dist / CAST(max_len AS DOUBLE), 4) AS similarity
    FROM scored
    WHERE {LEV_DIST_DEN} * edit_dist <= max_len
    ORDER BY doc_a, doc_b
    """,
)
def levenshtein_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level edit-distance near-dups (X1 — the dedup
    modality shingle Jaccard structurally misses): LSH candidates
    verified by Levenshtein distance, keeping pairs whose edit
    distance is ≤ 1/{LEV_DIST_DEN} of the longer text. OCR noise,
    mojibake, and single-character template fills perturb most
    word-3-grams (killing shingle similarity) while moving edit
    distance only a little — the CCNet/C4-era motivation for keeping
    a character-level verifier behind the token-level candidate
    stage. Levenshtein is a BUILT-IN in both engines (identical DP
    semantics), so the entry is exactly oracle-checked.

    Exactness: candidates are the md5-derived band buckets; the
    admission test is the integer cross-multiplication
    ``{LEV_DIST_DEN}·dist ≤ max(len)``; only the emitted similarity
    divides, rounded once.

    Scale: O(len²)-per-pair DP runs ONLY on band-bucket candidates
    (never all-pairs — the whole point of staging it behind LSH);
    document text joins attach to the candidate table, so full texts
    shuffle once per candidate side, not per corpus pass. At 100 TB
    the extra lever is a length-band pre-filter (|len_a − len_b| >
    max_len/{LEV_DIST_DEN} can never qualify — a pure projection
    predicate before the DP).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sig = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .filter(F.size(toks) >= 3)
        .select("doc_id", "text", minhash_signature(toks).alias("mh"))
    )
    sig = scoped_persist(sig)  # band buckets + both text sides

    r = N_MINHASH // N_BANDS
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.element_at("mh", b * r + j + 1) for j in range(r)]
            ).alias("bh"),
        )
        for b in range(N_BANDS)
    ]
    buckets = sig.select("doc_id", F.explode(F.array(*bands)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    txt = sig.select("doc_id", "text")
    with_texts = cand.join(
        txt.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")),
        "doc_a",
    ).join(
        txt.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")),
        "doc_b",
    )
    # Length pre-filter BEFORE any DP: edit distance ≥ |len_a − len_b|,
    # so a pair whose length gap alone breaks the threshold can never
    # qualify — the O(len²) work is skipped for free.
    max_len = F.greatest(F.length("ta"), F.length("tb")).cast("long")
    pre = with_texts.filter(
        LEV_DIST_DEN * F.abs(F.length("ta") - F.length("tb")) <= max_len
    )
    scored = pre.select(
        "doc_a",
        "doc_b",
        F.levenshtein("ta", "tb").cast("long").alias("edit_dist"),
        max_len.alias("max_len"),
    )
    # Persisted: the threshold filter and the similarity projection
    # both reference edit_dist — without a materialization barrier the
    # O(len²) DP re-evaluates per consumer expression.
    scored = scoped_persist(scored)
    return (
        scored.filter(LEV_DIST_DEN * F.col("edit_dist") <= F.col("max_len"))
        .select(
            "doc_a",
            "doc_b",
            "edit_dist",
            F.round(
                1.0 - F.col("edit_dist") / F.col("max_len").cast("double"), 4
            ).alias("similarity"),
        )
        .orderBy("doc_a", "doc_b")
    )


# Fellegi-Sunter record-linkage weights: m = P(field agrees | match)
# is the usual expert/EM-set literal; u = P(field agrees | non-match)
# is estimated EXACTLY from the value-frequency identity
# u = sum_v n_v(n_v-1) / (N(N-1)) over the field's histogram.
FS_M1 = 0.9  # m-probability, account-balance kilo-bucket field
FS_M2 = 0.9  # m-probability, name-suffix-digit field
# Sub-salt blocks above this many rows (the module's DF_CAP idiom,
# applied to BLOCK size): a block of n rows is split into
# s = ceil(n / FS_BLOCK_CAP) deterministic hash sub-blocks and its
# pair enumeration runs over the s(s+1)/2 sub-block-pair tasks, so
# one hot (segment, nation) cell spreads across s shuffle keys
# instead of landing on a single straggler task. Pair SET is
# unchanged — every unordered pair appears in exactly one task.
FS_BLOCK_CAP = 50


@query(
    "fellegi_sunter_linkage",
    oracle=f"""
    WITH f AS (
      SELECT c_custkey, c_mktsegment, c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS f1,
             substr(c_name, len(c_name), 1) AS f2
      FROM customer
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
    u1 AS (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS num
           FROM (SELECT count(*) AS c FROM f GROUP BY f1)),
    u2 AS (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS num
           FROM (SELECT count(*) AS c FROM f GROUP BY f2)),
    w AS (
      SELECT
        CAST(round(1000000 * ln({FS_M1} * (n * (n - 1))
                                / nullif(u1.num, 0))) AS BIGINT) AS w1a,
        CAST(round(1000000 * ln({1 - FS_M1} * (n * (n - 1))
                                / nullif(n * (n - 1) - u1.num, 0)))
             AS BIGINT) AS w1d,
        CAST(round(1000000 * ln({FS_M2} * (n * (n - 1))
                                / nullif(u2.num, 0))) AS BIGINT) AS w2a,
        CAST(round(1000000 * ln({1 - FS_M2} * (n * (n - 1))
                                / nullif(n * (n - 1) - u2.num, 0)))
             AS BIGINT) AS w2d
      FROM u1 CROSS JOIN u2 CROSS JOIN nn
    ),
    pairs AS (
      SELECT CASE WHEN a.f1 = b.f1 THEN 1 ELSE 0 END AS g1,
             CASE WHEN a.f2 = b.f2 THEN 1 ELSE 0 END AS g2,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM f a JOIN f b ON a.c_mktsegment = b.c_mktsegment
                        AND a.c_nationkey = b.c_nationkey
                        AND a.c_custkey < b.c_custkey
      GROUP BY 1, 2
    )
    SELECT g1 = 1 AS agree_acctbal_kilo,
           g2 = 1 AS agree_name_digit,
           n_pairs,
           round((CASE WHEN g1 = 1 THEN w1a ELSE w1d END
                  + CASE WHEN g2 = 1 THEN w2a ELSE w2d END)
                 / 1000000.0, 6) AS match_weight_nats
    FROM pairs CROSS JOIN w
    ORDER BY 1, 2
    """,
)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter
    1969 — THE entity-resolution scoring model, the theory behind
    Splink/dedupe.io): candidate pairs from a (segment, nation)
    BLOCKING key are scored by the log-likelihood ratio of their
    field-agreement pattern, w = Σ_f ln(m_f/u_f) on agreement,
    ln((1-m_f)/(1-u_f)) on disagreement; u-probabilities come exactly
    from the value-frequency identity over the field histograms. The
    entity-level sibling of the document near-dup stack: X1 dedups
    content, this dedups RECORDS.

    Exactness: since the weight depends only on the agreement
    PATTERN, the output is the pattern census — integer pair counts
    per (agree, agree) cell — and each of the four field-weights is
    quantized ONCE to micro-nats from exact integer frequency sums;
    the pattern weight is an integer sum of two quantized values.

    Scale: the pair join is bounded by the blocking key (Σ block²,
    never N² — the same candidate-generation discipline as the
    MinHash banding in this module), and blocks above FS_BLOCK_CAP
    rows are SUB-SALTED: each row gets a deterministic hash salt in
    [0, s) with s = ceil(block/cap), a broadcast task grid enumerates
    the s(s+1)/2 (sa ≤ sb) sub-block pairs, and the pair join keys on
    (segment, nation, sb) — so a hot block's quadratic work spreads
    across s shuffle keys instead of one straggler task, with every
    unordered pair generated exactly once ((sa < sb) admits both key
    orders once; (sa = sb) keeps ka < kb). The u-estimates are two
    histogram aggregates; the weight table is ONE row broadcast.
    """
    c = load_table(spark, sf_dir, "customer")
    f = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("f1"),
        F.col("c_name").substr(F.length("c_name"), F.lit(1)).alias("f2"),
    )
    f = scoped_persist(f)  # pair-join sides + two histograms + N
    nn = f.agg(F.count("*").cast("long").alias("n"))
    u1 = (
        f.groupBy("f1")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("num1"))
    )
    u2 = (
        f.groupBy("f2")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("num2"))
    )
    den = F.col("n") * (F.col("n") - 1)

    def w_nano(m: float, num):
        return F.round(
            1_000_000 * F.log(m * den / F.nullif(num, F.lit(0)))
        ).cast("long")

    w = (
        u1.crossJoin(u2)
        .crossJoin(nn)
        .select(
            w_nano(FS_M1, F.col("num1")).alias("w1a"),
            w_nano(1 - FS_M1, den - F.col("num1")).alias("w1d"),
            w_nano(FS_M2, F.col("num2")).alias("w2a"),
            w_nano(1 - FS_M2, den - F.col("num2")).alias("w2d"),
        )
    )
    # --- sub-salted block pair enumeration (FS_BLOCK_CAP) ---------
    sz = (
        f.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
            F.greatest(F.lit(1), F.ceil(F.col("cnt") / FS_BLOCK_CAP))
            .cast("int")
            .alias("s"),
        )
    )
    # Task grid: one row per (block, sa, sb) with 0 <= sa <= sb < s —
    # tiny (Σ s(s+1)/2 over blocks) and broadcast to both joins.
    tasks = sz.select(
        "seg",
        "nat",
        "s",
        F.explode(F.sequence(F.lit(0), F.col("s") - 1)).alias("sa"),
    ).select(
        "seg",
        "nat",
        "sa",
        F.explode(F.sequence(F.col("sa"), F.col("s") - 1)).alias("sb"),
    )
    fk = f.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("k"),
        "f1",
        "f2",
    ).join(F.broadcast(sz), ["seg", "nat"]).select(
        "seg",
        "nat",
        "k",
        "f1",
        "f2",
        F.pmod(F.hash("k"), F.col("s")).cast("int").alias("salt"),
    )
    a = fk.withColumnRenamed("salt", "sa").join(
        F.broadcast(tasks), ["seg", "nat", "sa"]
    ).select(
        "seg",
        "nat",
        "sa",
        "sb",
        F.col("k").alias("ka"),
        F.col("f1").alias("f1a"),
        F.col("f2").alias("f2a"),
    )
    b = fk.select(
        "seg",
        "nat",
        F.col("salt").alias("sb"),
        F.col("k").alias("kb"),
        F.col("f1").alias("f1b"),
        F.col("f2").alias("f2b"),
    )
    pairs = (
        a.join(b, ["seg", "nat", "sb"])
        .filter((F.col("sa") < F.col("sb")) | (F.col("ka") < F.col("kb")))
        .select(
            F.when(F.col("f1a") == F.col("f1b"), 1).otherwise(0).alias("g1"),
            F.when(F.col("f2a") == F.col("f2b"), 1).otherwise(0).alias("g2"),
        )
        .groupBy("g1", "g2")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
    return (
        pairs.crossJoin(F.broadcast(w))
        .select(
            (F.col("g1") == 1).alias("agree_acctbal_kilo"),
            (F.col("g2") == 1).alias("agree_name_digit"),
            "n_pairs",
            F.round(
                (
                    F.when(F.col("g1") == 1, F.col("w1a")).otherwise(F.col("w1d"))
                    + F.when(F.col("g2") == 1, F.col("w2a")).otherwise(
                        F.col("w2d")
                    )
                )
                / 1_000_000.0,
                6,
            ).alias("match_weight_nats"),
        )
        .orderBy("agree_acctbal_kilo", "agree_name_digit")
    )


# ---------------------------------------------------------------------------
# Round 11: winnowing minimizer fingerprints (the MOSS sketch).
# ---------------------------------------------------------------------------

WINNOW_K = 3  # shingle width (word 3-grams, the doc_fingerprints unit)
WINNOW_W = 4  # winnowing window: one minimizer guaranteed per w shingles
WINNOW_DF_CAP = 50  # minimizers in more docs than this are boilerplate
WINNOW_TOP_K = 20  # reported head of the shared-minimizer pair ranking


@query(
    "winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    hs AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - {WINNOW_K} + 2),
               i -> md5(concat_ws(' ', t[i], t[i + 1], t[i + 2]))) AS h
      FROM toks WHERE len(t) >= {WINNOW_K + WINNOW_W - 1}
    ),
    mins AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(h) - {WINNOW_W} + 2),
               p -> list_min(h[p:p + {WINNOW_W - 1}])))) AS m
      FROM hs
    ),
    sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_min FROM mins GROUP BY doc_id
    ),
    df AS (
      SELECT m FROM mins GROUP BY m HAVING count(*) <= {WINNOW_DF_CAP}
    ),
    keep AS (SELECT doc_id, m FROM mins SEMI JOIN df USING (m)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS shared_minimizers
      FROM keep a JOIN keep b ON a.m = b.m AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, shared_minimizers,
           sa.n_min AS n_min_a, sb.n_min AS n_min_b,
           round(CAST(round(1000000.0 * shared_minimizers
                            / (sa.n_min + sb.n_min - shared_minimizers))
                      AS BIGINT) / 1000000.0, 6) AS minimizer_jaccard
    FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    ORDER BY shared_minimizers DESC,
             CAST(round(1000000.0 * shared_minimizers
                        / (sa.n_min + sb.n_min - shared_minimizers))
                  AS BIGINT) DESC,
             doc_a, doc_b
    LIMIT {WINNOW_TOP_K}
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing minimizer fingerprints (Schleimer, Wilkerson & Aiken
    SIGMOD'03 — the MOSS local fingerprinting algorithm, and the same
    minimizer idea genomics mappers run at petabyte scale): hash every
    word {WINNOW_K}-gram, slide a window of {WINNOW_W} hashes, and
    keep each window's MINIMUM — guaranteeing a fingerprint at least
    every {WINNOW_W} shingles (the detection floor MinHash can't
    promise: winnowing is position-robust and detects any shared run
    of >= k + w − 1 tokens, not just whole-doc similarity). The
    distinct minimizer sets then rank document pairs by shared count,
    with the minimizer-set Jaccard beside it — the cheap
    guaranteed-coverage complement to ``minhash_lsh_candidates``
    (probabilistic) and ``doc_fingerprints`` (one min per doc).

    Exactness: md5 hex strings order identically in both engines, so
    each window minimum and each distinct set are identical; shared
    counts and set sizes are integers; the Jaccard quantizes once to
    micro units inside the integer tie-broken ORDER BY. Docs shorter
    than k + w − 1 tokens have no full window and are skipped in both
    lanes.

    Scale: everything up to the pair join is doc-local (one
    higher-order-function projection — no shuffle, no Python); the
    inverted index joins only on minimizer keys, posting lists capped
    by the DF filter ({WINNOW_DF_CAP}) exactly like the stop-shingle
    guard — the ~1/w downsampling is the point: the index is w times
    smaller than the full shingle index for the same guarantee.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        data_width(spark, sf_dir, "documents")
    )
    toks = F.split("text", " ")
    hashes = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (WINNOW_K - 1)),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            )
        ),
    )
    mins_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("h")) - (WINNOW_W - 1)),
            lambda p: F.array_min(F.slice(F.col("h"), p, WINNOW_W)),
        )
    )
    mins = (
        d.filter(F.size(toks) >= WINNOW_K + WINNOW_W - 1)
        .select("doc_id", hashes.alias("h"))
        .select("doc_id", F.explode(mins_arr).alias("m"))
    )
    mins = scoped_persist(mins)
    sizes = mins.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_min"))
    df_ok = mins.groupBy("m").agg(F.count("*").alias("df")).filter(
        F.col("df") <= WINNOW_DF_CAP
    )
    keep = mins.join(df_ok.select("m"), "m", "left_semi")
    a = keep.select(F.col("doc_id").alias("doc_a"), "m")
    b = keep.select(F.col("doc_id").alias("doc_b"), "m")
    pairs = (
        a.join(b, "m")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("shared_minimizers"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_min").alias("n_min_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_min").alias("n_min_b"))
    jac_micro = F.round(
        1_000_000.0
        * F.col("shared_minimizers")
        / (F.col("n_min_a") + F.col("n_min_b") - F.col("shared_minimizers"))
    ).cast("long")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .orderBy(
            F.col("shared_minimizers").desc(), jac_micro.desc(), "doc_a", "doc_b"
        )
        .limit(WINNOW_TOP_K)
        .select(
            "doc_a",
            "doc_b",
            "shared_minimizers",
            "n_min_a",
            "n_min_b",
            F.round(jac_micro / 1_000_000.0, 6).alias("minimizer_jaccard"),
        )
    )
