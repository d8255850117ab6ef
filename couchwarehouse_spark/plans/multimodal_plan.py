"""X3 — multimodal query entries: binary payload columns with typed
metadata, exercised over the documents table (text bytes as the
payload stand-in — the container has no codec libs, so the payloads
are real bytes and the decode stage is the documented stub).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.multimodal import (
    extract_features,
    media_struct,
    resize_media,
    sample_frames,
)
from couchwarehouse_spark.plans.registry import query, scoped_persist


@query(
    "multimodal_metadata",
    oracle="""
    SELECT source,
           count(*) AS n_items,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(text)) AS n_unique_payloads,
           max(octet_length(encode(text))) AS max_bytes
    FROM documents
    GROUP BY source
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan (X3): payload sizes and content
    digests per source WITHOUT any decode — the query shape that must
    stay payload-column-pruned at 100 TB (only byte counts and
    digests computed, all JVM-side).

    The payload is the utf-8 text bytes via a real ``media`` struct
    (multimodal.media_struct) — same column layout an image/audio
    table uses.
    """
    d = load_table(spark, sf_dir, "documents")
    with_media = d.withColumn(
        "media",
        media_struct(F.encode("text", "utf-8"), F.lit("text/plain")),
    )
    return with_media.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length(F.col("media.data"))).alias("total_bytes"),
        F.countDistinct(F.md5(F.col("media.data"))).alias("n_unique_payloads"),
        F.max(F.length(F.col("media.data"))).alias("max_bytes"),
    )


@query(
    "multimodal_feature_extract",
    oracle="""
    SELECT source,
           count(*) AS n_items,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           round(avg(round(CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER)
                           / 65535.0, 6)), 4) AS mean_feat0
    FROM documents
    GROUP BY source
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads (X3) — the Arrow-batched
    ``mapInPandas`` pipeline with the deterministic fake encoder
    (multimodal.extract_features; real deployments swap the encoder
    line). Output: per-source count, total bytes, mean first feature
    dimension.

    Oracle-checked EXACTLY: the fake encoder's feature dim 0 is the
    first two md5 bytes of the payload scaled by 1/65535 — DuckDB
    re-derives the same value from ``md5(text)`` hex (the payload IS
    the utf-8 text bytes), so the hash match certifies the whole
    Python worker path: Arrow batching, binary handling, and the
    per-item encoder arithmetic.
    """
    d = load_table(spark, sf_dir, "documents")
    with_media = d.withColumn(
        "media",
        media_struct(F.encode("text", "utf-8"), F.lit("text/plain")),
    )
    feats = extract_features(with_media)
    return (
        feats.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg(F.element_at("feature", 1)), 4).alias("mean_feat0"),
        )
        .orderBy("source")
    )


FRAME_EVERY_MS = 250


@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT)                  AS n_videos,
           CAST(sum(n_chars // {FRAME_EVERY_MS} + 1) AS BIGINT)    AS n_frames,
           CAST(sum((n_chars // {FRAME_EVERY_MS} + 1) * 16) AS BIGINT) AS frame_bytes
    FROM documents
    GROUP BY source
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads (X3): every payload is
    treated as a clip whose duration_ms := n_chars, and
    ``sample_frames`` fans each row out to one 16-byte frame stub per
    250 ms executor-side (multimodal.sample_frames). The oracle
    predicts the fan-out arithmetic straight from the source table —
    so the hash match certifies that the mapInPandas row expansion
    produced exactly the right number and size of frames per doc.
    """
    d = load_table(spark, sf_dir, "documents")
    with_media = d.withColumn(
        "media",
        media_struct(
            F.encode("text", "utf-8"),
            F.lit("video/fake"),
            duration_ms=F.col("n_chars").cast("int"),
        ),
    )
    frames = sample_frames(with_media, FRAME_EVERY_MS)
    return (
        frames.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_videos"),
            F.count("*").alias("n_frames"),
            F.sum(F.length("frame")).alias("frame_bytes"),
        )
    )


RESIZE_W, RESIZE_H = 64, 48  # target dims → digest-stub payload of w*h/64 bytes


@query(
    "multimodal_resize",
    oracle=f"""
    SELECT source,
           count(*) AS n_items,
           CAST(sum({(RESIZE_W * RESIZE_H) // 64}) AS BIGINT)  AS resized_bytes,
           count(DISTINCT md5(text))                           AS n_unique_payloads,
           CAST(min({RESIZE_W}) AS INTEGER)                    AS out_width,
           CAST(min({RESIZE_H}) AS INTEGER)                    AS out_height
    FROM documents
    GROUP BY source
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize lane (X3): every payload re-encoded to the target
    dimensions via Arrow ``mapInPandas`` (multimodal.resize_media;
    the codec is the documented digest-stub — a real deployment swaps
    one function). The oracle predicts the output byte budget and
    payload-distinct counts straight from the source table, so the
    hash match certifies the mapInPandas rewrite produced exactly the
    declared payload size and updated metadata for every row.

    Scale: binary-in/binary-out projection through Arrow batches — no
    shuffle; partition sizing by bytes (see multimodal module
    docstring) keeps payload batches inside executor memory.
    """
    d = load_table(spark, sf_dir, "documents")
    with_media = d.withColumn(
        "media",
        media_struct(F.encode("text", "utf-8"), F.lit("image/fake")),
    )
    resized = resize_media(with_media, RESIZE_W, RESIZE_H)
    return resized.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length(F.col("media.data"))).alias("resized_bytes"),
        F.countDistinct(F.md5("text")).alias("n_unique_payloads"),
        F.min(F.col("media.meta.width")).alias("out_width"),
        F.min(F.col("media.meta.height")).alias("out_height"),
    )


AUDIO_SR = 16_000  # Hz (16-bit mono PCM stand-in)
AUDIO_WIN = 400  # samples per analysis window (25 ms @ 16 kHz)
AUDIO_HOP = 160  # hop between windows (10 ms @ 16 kHz)


@query(
    "multimodal_audio_framing",
    oracle=f"""
    WITH clips AS (
      SELECT source,
             octet_length(encode(text)) * {AUDIO_SR} // 1000 AS n_samples
      FROM documents
    ),
    framed AS (
      SELECT source, n_samples,
             CASE WHEN n_samples >= {AUDIO_WIN}
                  THEN 1 + (n_samples - {AUDIO_WIN}) // {AUDIO_HOP}
                  ELSE 0 END AS n_frames
      FROM clips
    )
    SELECT source,
           CAST(count(*) AS BIGINT)                    AS n_clips,
           CAST(sum(n_frames) AS BIGINT)               AS n_frames,
           CAST(sum(n_samples) * 1000 // {AUDIO_SR} AS BIGINT) AS total_ms,
           round(CAST(sum(n_frames) AS DOUBLE) / count(*), 6) AS avg_frames
    FROM framed GROUP BY source
    """,
)
def multimodal_audio_framing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame-grid planning (X3 — the STFT/feature-window
    arithmetic an ASR/audio-embedding pipeline runs before any codec
    touches bytes): payloads are 16-bit mono PCM stand-ins
    (n_samples := bytes/2 at {AUDIO_SR} Hz); each clip fans out to
    overlapping 25 ms windows at a 10 ms hop ({AUDIO_WIN}/{AUDIO_HOP}
    samples), and the census sizes the downstream feature-extract job
    per source. The fan-out itself is exercised JVM-side (sequence +
    explode of frame indices — the Arrow-free counterpart of
    ``multimodal_frame_sample``'s mapInPandas lane); the oracle states
    the closed-form frame count, so the hash match certifies the
    explode produced exactly the right grid.

    Scale: payload column pruned (only octet_length reaches the
    scan); the explosion multiplies rows by frames-per-clip but
    carries three ints per row — byte-light; the census is a
    per-source hash aggregate with map-side combine. All integer
    arithmetic; one division at emit.
    """
    d = load_table(spark, sf_dir, "documents")
    with_media = d.withColumn(
        "media",
        media_struct(
            F.encode("text", "utf-8"),
            F.lit("audio/pcm16"),
        ),
    )
    clips = with_media.select(
        "doc_id",
        "source",
        # Integer div (not double-divide-then-cast): a double quotient
        # can round UP across an integer boundary where the oracle's
        # // floors — exactness demands the same integer semantics.
        F.expr(
            f"CAST(octet_length(media.data) AS BIGINT) * {AUDIO_SR} div 1000"
        ).alias("n_samples"),
    )
    frames = clips.select(
        "doc_id",
        "source",
        "n_samples",
        F.explode(
            F.when(
                F.col("n_samples") >= AUDIO_WIN,
                F.sequence(
                    F.lit(0).cast("long"),
                    F.expr(f"(n_samples - {AUDIO_WIN}) div {AUDIO_HOP}"),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("frame_idx"),
    ).select(
        "doc_id",
        "source",
        "n_samples",
        (F.col("frame_idx") * AUDIO_HOP).alias("start_sample"),
        (F.col("frame_idx") * AUDIO_HOP + AUDIO_WIN).alias("end_sample"),
    )
    per_clip = frames.groupBy("doc_id", "source", "n_samples").agg(
        F.count("*").alias("n_frames")
    )
    # Clips too short for one window still count (0 frames).
    all_clips = clips.join(
        per_clip.select("doc_id", "n_frames"), "doc_id", "left"
    ).select(
        "source",
        "n_samples",
        F.coalesce("n_frames", F.lit(0)).alias("n_frames"),
    )
    return all_clips.groupBy("source").agg(
        F.count("*").alias("n_clips"),
        F.sum("n_frames").alias("n_frames"),
        F.expr(f"(sum(n_samples) * 1000) div {AUDIO_SR}").alias("total_ms"),
        F.round(F.sum("n_frames").cast("double") / F.count("*"), 6).alias(
            "avg_frames"
        ),
    )


@query(
    "modality_pairing_audit",
    oracle="""
    WITH pairing AS (
      SELECT coalesce(d.lang, '<unpaired>') AS lang,
             CASE WHEN d.doc_id IS NULL THEN 'vector_only'
                  WHEN e.vec_id IS NULL THEN 'text_only'
                  ELSE 'paired' END AS pairing
      FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
    )
    SELECT lang, pairing, count(*) AS n
    FROM pairing
    GROUP BY lang, pairing
    ORDER BY lang, pairing
    """,
)
def modality_pairing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal pairing integrity audit (X3): a multimodal training
    set is only as good as its ALIGNMENT — every text row should have
    its embedding/media row and vice versa. One full-outer join on
    the pairing key classifies every row as paired / text_only /
    vector_only, rolled up per language: the census run before any
    contrastive (CLIP-style) training, where silent unpaired rows
    become wasted batch slots or, worse, mislabeled negatives.

    Scale: a single id-keyed full-outer shuffle join (both sides
    hash-partition on the key — no broadcast needed and no skew:
    pairing keys are unique per side) followed by a tiny
    (lang, pairing) aggregate. At 100 TB this is the cheapest join
    shape there is; the audit's value is that it runs BEFORE the
    expensive encoder pass.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    pairing = (
        F.when(F.col("doc_id").isNull(), F.lit("vector_only"))
        .when(F.col("vec_id").isNull(), F.lit("text_only"))
        .otherwise(F.lit("paired"))
    )
    return (
        d.join(e, d["doc_id"] == e["vec_id"], "full_outer")
        .select(
            F.coalesce(F.col("lang"), F.lit("<unpaired>")).alias("lang"),
            pairing.alias("pairing"),
        )
        .groupBy("lang", "pairing")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "pairing")
    )


PHASH_BITS = 12  # perceptual-hash band width for the bucket census


@query(
    "multimodal_phash_buckets",
    oracle=f"""
    WITH h AS (
      SELECT source,
             CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
               % {1 << PHASH_BITS} AS phash_band
      FROM documents
    ),
    cells AS (
      SELECT phash_band, CAST(count(*) AS BIGINT) AS n_items,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM h GROUP BY phash_band
    )
    SELECT phash_band, n_items, n_sources
    FROM cells
    WHERE n_items >= 2
    ORDER BY n_items DESC, phash_band
    LIMIT 40
    """,
)
def multimodal_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash BAND buckets over binary media payloads — the
    image-dedup blocking step (pHash/aHash banding, the visual twin of
    MinHash-LSH): items whose hash band collides are near-dup
    CANDIDATES for the expensive visual-verify stage, and the census
    of multi-item bands (with their cross-source spread) is the
    dedup-planning number. The hash here is the deterministic
    stand-in (md5 band of the payload bytes — the container ships no
    image libs; a real pHash is a drop-in for the hash expression),
    but the PLUMBING is the real thing: binary column in, band key
    out, band-keyed census, no decode, payload never shuffles.

    Scale: one projection computes the band (bytes → 8 hex chars →
    {PHASH_BITS}-bit band); the census is a band-keyed hash aggregate
    whose exchange carries (band, counts) — never payload bytes; the
    head is a bounded TopK.
    """
    d = load_table(spark, sf_dir, "documents")
    with_media = d.withColumn(
        "media",
        media_struct(F.encode("text", "utf-8"), F.lit("text/plain")),
    )
    band = (
        F.conv(F.substring(F.md5(F.col("media.data")), 1, 8), 16, 10)
        .cast("long")
        % (1 << PHASH_BITS)
    )
    return (
        with_media.select("source", band.alias("phash_band"))
        .groupBy("phash_band")
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .filter(F.col("n_items") >= 2)
        .orderBy(F.col("n_items").desc(), "phash_band")
        .limit(40)
    )


# Deterministic modality headers planted by doc_id % 4 — real magic
# bytes (PNG / JPEG / RIFF) ahead of the text-byte payload stand-in.
_MAGICS = (
    ("image/png", "89504E47"),
    ("image/jpeg", "FFD8FFE0"),
    ("audio/riff", "52494646"),
    ("text/plain", None),  # no header — raw text bytes
)


@query(
    "payload_magic_byte_census",
    oracle="""
    WITH tagged AS (
      SELECT source,
             CASE doc_id % 4
               WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
               WHEN 2 THEN 'audio/riff' ELSE 'text/plain' END AS assigned,
             CASE doc_id % 4
               WHEN 0 THEN '\\x89\\x50\\x4E\\x47'::BLOB || encode(text)
               WHEN 1 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB || encode(text)
               WHEN 2 THEN '\\x52\\x49\\x46\\x46'::BLOB || encode(text)
               ELSE encode(text) END AS payload
      FROM documents
    ),
    sniffed AS (
      SELECT source, assigned, payload,
             CASE upper(substr(hex(payload), 1, 8))
               WHEN '89504E47' THEN 'image/png'
               WHEN 'FFD8FFE0' THEN 'image/jpeg'
               WHEN '52494646' THEN 'audio/riff'
               ELSE 'text/plain' END AS detected
      FROM tagged
    )
    SELECT detected,
           CAST(count(*) AS BIGINT)                             AS n_payloads,
           CAST(sum(octet_length(payload)) AS BIGINT)           AS total_bytes,
           CAST(sum(CASE WHEN detected = assigned THEN 1 ELSE 0 END)
                AS BIGINT)                                      AS n_match,
           round(sum(CASE WHEN detected = assigned THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4)                 AS match_rate
    FROM sniffed
    GROUP BY detected
    ORDER BY detected
    """,
)
def payload_magic_byte_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte modality sniffing over binary payloads (X3 — the
    content-type ROUTER a multimodal ingest runs before choosing a
    decoder): classify each payload by its leading magic bytes (PNG
    ‰PNG, JPEG FF D8 FF, RIFF) and census detected modality vs the
    declared one — mismatches are exactly the mislabeled/corrupted
    payloads that crash a decode stage at scale, so this census runs
    FIRST. Payload headers are planted deterministically (doc_id % 4)
    ahead of the text-byte stand-in (container has no codecs — the
    X3 posture), so the detection path — binary concat, binary
    substring, hex compare — is the real plumbing a magic-byte
    router uses, and match_rate 1.0 is the planted self-check.

    Exactness: byte slices hex-compare as strings identically in both
    engines; counts and byte totals are integers.

    Scale: one projection computes header + classification in-row (no
    UDF — binary ops are JVM expressions inside codegen); the census
    is a |modalities|-group hash aggregate with map-side combine;
    payloads never shuffle (only their lengths and 4-byte prefixes
    feed the aggregate).
    """
    d = load_table(spark, sf_dir, "documents")
    text_bytes = F.encode("text", "utf-8")

    def header(hexstr: str):
        return F.lit(bytes.fromhex(hexstr))

    assigned = (
        F.when(F.col("doc_id") % 4 == 0, _MAGICS[0][0])
        .when(F.col("doc_id") % 4 == 1, _MAGICS[1][0])
        .when(F.col("doc_id") % 4 == 2, _MAGICS[2][0])
        .otherwise(_MAGICS[3][0])
    )
    payload = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(header("89504E47"), text_bytes))
        .when(F.col("doc_id") % 4 == 1, F.concat(header("FFD8FFE0"), text_bytes))
        .when(F.col("doc_id") % 4 == 2, F.concat(header("52494646"), text_bytes))
        .otherwise(text_bytes)
    )
    tagged = d.select(
        "source", assigned.alias("assigned"), payload.alias("payload")
    )
    prefix_hex = F.upper(F.hex(F.expr("substring(payload, 1, 4)")))
    detected = (
        F.when(prefix_hex == "89504E47", "image/png")
        .when(prefix_hex == "FFD8FFE0", "image/jpeg")
        .when(prefix_hex == "52494646", "audio/riff")
        .otherwise("text/plain")
    )
    sniffed = tagged.select(
        "assigned", detected.alias("detected"), F.length("payload").alias("nb")
    )
    return (
        sniffed.groupBy("detected")
        .agg(
            F.count("*").alias("n_payloads"),
            F.sum("nb").cast("long").alias("total_bytes"),
            F.sum((F.col("detected") == F.col("assigned")).cast("int"))
            .cast("long")
            .alias("n_match"),
            F.round(
                F.sum((F.col("detected") == F.col("assigned")).cast("int"))
                / F.count("*").cast("double"),
                4,
            ).alias("match_rate"),
        )
        .orderBy("detected")
    )


# Deterministic stand-in image dimensions (the container has no codec
# libs, so dims derive from stable columns the way duration_ms does in
# multimodal_frame_sample): varied aspect ratios, 64..1216 px wide.
IMG_W_SQL = "64 + (doc_id % 37) * 32"
IMG_H_SQL = "64 + ((doc_id * 7 + 3) % 41) * 24"
# Aspect ladder normalized to a COMMON denominator (bh = 144) so the
# nearest-bucket argmin compares |w·144 − h·bw| across buckets without
# per-bucket denominators: 1:1→144, 4:3→192, 3:4→108, 16:9→256,
# 9:16→81. Tie → lower index.
ASPECT_BUCKETS = [("1:1", 144), ("4:3", 192), ("3:4", 108), ("16:9", 256), ("9:16", 81)]
_AB_DEN = 144


def _aspect_case_sql() -> str:
    ds = [f"abs(w * {_AB_DEN} - h * {bw})" for _, bw in ASPECT_BUCKETS]
    mind = f"least({', '.join(ds)})"
    whens = "".join(
        f" WHEN {d} = md THEN '{name}'"
        for d, (name, _) in zip(ds, ASPECT_BUCKETS)
    )
    return f"CASE{whens} END", mind


@query(
    "aspect_bucket_plan",
    oracle=f"""
    WITH img AS (
      SELECT doc_id, {IMG_W_SQL} AS w, {IMG_H_SQL} AS h FROM documents
    ),
    m AS (
      SELECT w, h, {_aspect_case_sql()[1]} AS md FROM img
    ),
    assigned AS (
      SELECT w, h, {_aspect_case_sql()[0]} AS bucket,
             CASE WHEN bucket = '1:1' THEN 144 WHEN bucket = '4:3' THEN 192
                  WHEN bucket = '3:4' THEN 108 WHEN bucket = '16:9' THEN 256
                  ELSE 81 END AS bw
      FROM m
    ),
    padded AS (
      SELECT bucket,
             w * h AS px,
             CASE WHEN w * {_AB_DEN} < h * bw
                  THEN ((h * bw + {_AB_DEN} - 1) // {_AB_DEN}) * h - w * h
                  ELSE ((w * {_AB_DEN} + bw - 1) // bw) * w - w * h
             END AS pad
      FROM assigned
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(px) AS BIGINT) AS total_px,
           CAST(sum(pad) AS BIGINT) AS pad_px,
           round(CAST(sum(pad) AS DOUBLE) / (sum(px) + sum(pad)), 6)
             AS pad_share
    FROM padded
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def aspect_bucket_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing plan (X3 — the vision-training batching
    standard: group images into a fixed ladder of aspect buckets so a
    batch letterboxes to ONE canvas instead of the worst-case square,
    e.g. SDXL's bucketed sampling): assign each image to the nearest
    ladder ratio and price the padding each bucket still pays.
    pad_share is the number a data engineer tunes the ladder against.

    Exactness: dims are deterministic integer stand-ins (no codecs in
    this container — same convention as duration_ms in
    multimodal_frame_sample); the nearest-bucket argmin compares
    |w·144 − h·bw| over a COMMON denominator so no per-bucket
    rationals; letterbox padding uses integer ceil-division; one
    float division per bucket at the end.

    Scale: pure projection + 5-way CASE per row, one hash agg on the
    5-value bucket key — no shuffle beyond the final tiny agg; the
    payload column is never touched (column-pruned scan).
    """
    d = load_table(spark, sf_dir, "documents")
    w = (64 + (F.col("doc_id") % 37) * 32).cast("long")
    h = (64 + ((F.col("doc_id") * 7 + 3) % 41) * 24).cast("long")
    img = d.select(w.alias("w"), h.alias("h"))
    ds = [
        F.abs(F.col("w") * _AB_DEN - F.col("h") * bw).alias(f"d{i}")
        for i, (_, bw) in enumerate(ASPECT_BUCKETS)
    ]
    img = img.select("w", "h", *ds)
    mind = F.least(*[F.col(f"d{i}") for i in range(len(ASPECT_BUCKETS))])
    bucket = F.when(F.col("d0") == mind, ASPECT_BUCKETS[0][0])
    for i, (name, _) in list(enumerate(ASPECT_BUCKETS))[1:]:
        bucket = bucket.when(F.col(f"d{i}") == mind, name)
    bw_of = F.when(F.col("bucket") == ASPECT_BUCKETS[0][0], ASPECT_BUCKETS[0][1])
    for name, bwv in ASPECT_BUCKETS[1:]:
        bw_of = bw_of.when(F.col("bucket") == name, bwv)
    assigned = img.select("w", "h", bucket.alias("bucket")).withColumn(
        "bw", bw_of.cast("long")
    )
    px = F.col("w") * F.col("h")
    pad = F.when(
        F.col("w") * _AB_DEN < F.col("h") * F.col("bw"),
        F.floor((F.col("h") * F.col("bw") + _AB_DEN - 1) / _AB_DEN) * F.col("h") - px,
    ).otherwise(
        F.floor((F.col("w") * _AB_DEN + F.col("bw") - 1) / F.col("bw")) * F.col("w")
        - px
    )
    return (
        assigned.select("bucket", px.alias("px"), pad.cast("long").alias("pad"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum("px").cast("long").alias("total_px"),
            F.sum("pad").cast("long").alias("pad_px"),
            F.round(
                F.sum("pad").cast("double") / (F.sum("px") + F.sum("pad")), 6
            ).alias("pad_share"),
        )
        .orderBy("bucket")
    )


VIT_PATCH = 14  # ViT-style patch side; tokens = ceil(w/14)·ceil(h/14) + 1


@query(
    "vision_token_budget",
    oracle=f"""
    WITH img AS (
      SELECT source,
             ((({IMG_W_SQL}) + {VIT_PATCH} - 1) // {VIT_PATCH})
             * ((({IMG_H_SQL}) + {VIT_PATCH} - 1) // {VIT_PATCH}) + 1 AS toks
      FROM documents
    ),
    per_src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_images,
             CAST(sum(toks) AS BIGINT) AS total_tokens,
             CAST(max(toks) AS BIGINT) AS max_tokens
      FROM img GROUP BY source
    )
    SELECT source, n_images, total_tokens, max_tokens,
           round(CAST(total_tokens AS DOUBLE)
                 / (SELECT sum(total_tokens) FROM per_src), 6)
             AS budget_share
    FROM per_src
    ORDER BY source
    """,
)
def vision_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision token budgeting (X3): ViT patch arithmetic — each image
    costs ceil(w/p)·ceil(h/p)+1 sequence tokens — rolled up per
    source with each source's share of the corpus token budget. THE
    capacity-planning number for multimodal training runs (token
    budgets are set in tokens, not images; a 4k scan costs ~100× a
    thumbnail) computed from metadata alone, payloads untouched.

    Exactness: integer ceil-division patch counts, integer sums, one
    share division against the broadcast one-row total.

    Scale: metadata-only projection (payload column pruned), one hash
    agg to |sources| rows, total broadcast back — nothing data-sized
    after the agg.
    """
    d = load_table(spark, sf_dir, "documents")
    w = 64 + (F.col("doc_id") % 37) * 32
    h = 64 + ((F.col("doc_id") * 7 + 3) % 41) * 24
    toks = (
        F.floor((w + VIT_PATCH - 1) / VIT_PATCH)
        * F.floor((h + VIT_PATCH - 1) / VIT_PATCH)
        + 1
    ).cast("long")
    per_src = d.select("source", toks.alias("toks")).groupBy("source").agg(
        F.count("*").cast("long").alias("n_images"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.max("toks").cast("long").alias("max_tokens"),
    )
    tot = per_src.agg(F.sum("total_tokens").cast("long").alias("grand"))
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_images",
            "total_tokens",
            "max_tokens",
            F.round(
                F.col("total_tokens").cast("double") / F.col("grand"), 6
            ).alias("budget_share"),
        )
        .orderBy("source")
    )


PHASH_NEARDUP_BITS = 15  # band width (4 bands over the 60-bit hash)
PHASH_HAM_T = 8  # visual-duplicate verdict threshold on the full hash


@query(
    "multimodal_phash_near_dup",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS ph
      FROM documents
    ),
    bands AS (
      SELECT doc_id, ph, b.b AS band_idx,
             (ph >> (b.b * {PHASH_NEARDUP_BITS}))
               & {(1 << PHASH_NEARDUP_BITS) - 1} AS band_val
      FROM h CROSS JOIN unnest(range(0, 4)) AS b(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             bit_count(xor(a.ph, c.ph)) AS ham
      FROM bands a JOIN bands c
        ON a.band_idx = c.band_idx AND a.band_val = c.band_val
       AND a.doc_id < c.doc_id
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM h)
    SELECT n.n_items,
           CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           CAST(sum(CASE WHEN ham <= {PHASH_HAM_T} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_pairs,
           CAST(min(ham) AS BIGINT) AS min_hamming
    FROM cand CROSS JOIN n
    GROUP BY n.n_items
    """,
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash NEAR-DUP verification census — the stage AFTER
    ``multimodal_phash_buckets``' blocking: the 60-bit payload hash is
    cut into 4 bands of {PHASH_NEARDUP_BITS} bits, any shared band
    makes a candidate pair (an image near-dup differs in a few hash
    bits, so some band survives intact — the MinHash-LSH banding
    argument applied to Hamming space), and each candidate is verified
    by full-hash Hamming distance <= {PHASH_HAM_T}. The hash is the
    deterministic md5 stand-in (no image libs in the container; a real
    pHash drops into the same expression), so verified duplicates are
    exactly the identical payloads — the PLUMBING (band fan-out,
    band-keyed candidate join, bit_count(xor) verify, payloads never
    shuffled) is the production visual-dedup pipeline.

    Exactness: the hash, bands, pair set, and Hamming distances are
    identical integer arithmetic in both engines; the census is
    integer counts (min_hamming NULL only if no band ever collides).

    Scale: the pair join keys on (band_idx, band_val) — work is the
    sum of squared bucket sizes, never all-pairs; the exchange
    carries 8-byte hashes, not payloads; the verify is one xor per
    candidate.
    """
    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("long")
        .alias("ph"),
    )
    h = scoped_persist(h)
    bands = h.select(
        "doc_id",
        "ph",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band_idx"),
    ).select(
        "doc_id",
        "ph",
        "band_idx",
        F.expr(
            f"shiftright(ph, cast(band_idx * {PHASH_NEARDUP_BITS} as int))"
        ).bitwiseAND(F.lit((1 << PHASH_NEARDUP_BITS) - 1)).alias("band_val"),
    )
    a = bands.select(
        "band_idx", "band_val", F.col("doc_id").alias("id_a"), F.col("ph").alias("ph_a")
    )
    c = bands.select(
        "band_idx", "band_val", F.col("doc_id").alias("id_b"), F.col("ph").alias("ph_b")
    )
    cand = (
        a.join(c, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).alias("ham"),
        )
        .distinct()
    )
    n = h.agg(F.count("*").cast("long").alias("n_items"))
    return cand.crossJoin(F.broadcast(n)).groupBy("n_items").agg(
        F.count("*").cast("long").alias("n_candidate_pairs"),
        F.sum((F.col("ham") <= PHASH_HAM_T).cast("int"))
        .cast("long")
        .alias("n_dup_pairs"),
        F.min("ham").cast("long").alias("min_hamming"),
    )
