"""X3 — multimodal column conventions (SURVEY.md §2.D).

Media travels as opaque ``binary`` payloads + typed metadata structs;
embeddings as ``array<float>``. Heavy per-item work (decode, resize,
frame-sample, feature-extract) runs as Arrow-batched ``mapInPandas``
over the binary column — the ONLY sane shape at 100 TB:

* payloads never transit the driver;
* one Python worker per partition, Arrow batches amortize transfer;
* partition sizing by bytes, not rows — large media means
  ``spark.sql.files.maxPartitionBytes`` and/or a pre-``repartition``
  on a size-aware key so a partition's payloads fit executor memory;
* metadata-only queries (filter by mime/width/duration) never touch
  the payload column — columnar parquet reads just the struct.

The actual codec libraries (PIL/ffmpeg/torchaudio) are not in this
container, so the decode step is a clearly-marked stub
(``NotImplementedError``) and tests exercise the REAL plumbing —
schema, batching, UDF signatures — through a deterministic fake
feature extractor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical media column schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8


def media_struct(data: Column, mime: Column, width=None, height=None, duration_ms=None) -> Column:
    """Assemble a media column from parts (the X3 write-side helper)."""
    return F.struct(
        data.alias("data"),
        mime.alias("mime"),
        F.struct(
            (width if width is not None else F.lit(None).cast("int")).alias("width"),
            (height if height is not None else F.lit(None).cast("int")).alias("height"),
            (duration_ms if duration_ms is not None else F.lit(None).cast("int")).alias(
                "duration_ms"
            ),
        ).alias("meta"),
    )


def decode_image(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Decode image payloads to (height, width, channels) tensors.

    STUB: the imaging libraries are not available in this
    environment. The distributed shape is identical to
    :func:`extract_features` — ``mapInPandas`` over Arrow batches of
    the binary column — swap the body for PIL/torchvision in a real
    deployment.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; see extract_features for the identical mapInPandas "
        "plumbing with a deterministic fake"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real encoder: md5-seeded floats.

    Same bytes → same vector, any environment — which is exactly what
    the tests need to validate partitioning/batching/schema without a
    model. Public-math only.
    """
    digest = hashlib.md5(payload or b"").digest()
    return [
        round(int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0, 6)
        for i in range(dim)
    ]


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Feature-extract every payload via Arrow-batched ``mapInPandas``.

    The real-model version changes ONE line (the encoder call); the
    Spark plumbing — batch iteration, binary handling, output schema —
    is what this validates. Output: (id, n_bytes, feature array).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[media_col].map(lambda m: m["data"] if m is not None else b"")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "feature": payloads.map(_fake_features),
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, FEATURES_SCHEMA)


def resize_media(
    df: DataFrame, width: int, height: int, media_col: str = "media"
) -> DataFrame:
    """Resize every image payload to ``width×height`` (X3 resize lane).

    Real plumbing, stubbed codec: binary in → binary out with the
    metadata struct updated to the target dimensions. The fake
    "resampled" payload is the payload digest repeated to the target
    byte budget (w·h/64) — deterministic, so tests can assert sizes
    and schemas without PIL; a real deployment swaps `_resample` for
    an actual decode→resize→encode.
    """
    target_len = max(1, (width * height) // 64)

    def _resample(payload: bytes) -> bytes:
        digest = hashlib.md5(payload or b"").digest()
        return (digest * (target_len // len(digest) + 1))[:target_len]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[media_col] = out[media_col].map(
                lambda m: {
                    "data": _resample(m["data"] if m else b""),
                    "mime": (m or {}).get("mime"),
                    "meta": {"width": width, "height": height, "duration_ms": None},
                }
            )
            yield out

    return df.mapInPandas(run, df.schema)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Sample one frame every ``every_ms`` from each video payload
    (X3 frame-sample lane) — the row-expanding ``mapInPandas`` shape:
    one input row fans out to ``duration_ms // every_ms + 1`` frame
    rows (t=0 always sampled). Frames are 16-byte digest stubs keyed
    on (payload, ts); a real deployment replaces the digest with an
    ffmpeg seek+decode at ts.

    Scale: fan-out happens executor-side inside the Arrow batch — no
    explode of a driver-built array, no shuffle; downstream ops see an
    ordinary DataFrame of frames.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for _, row in pdf.iterrows():
                m = row[media_col]
                data = m["data"] if m else b""
                duration = (m.get("meta") or {}).get("duration_ms") if m else None
                n = (int(duration) // every_ms + 1) if duration is not None else 1
                for k in range(n):
                    ts = k * every_ms
                    ids.append(row[id_col])
                    idxs.append(k)
                    tss.append(ts)
                    frames.append(
                        hashlib.md5((data or b"") + ts.to_bytes(8, "big")).digest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.select(id_col, media_col).mapInPandas(run, FRAMES_SCHEMA)
