"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata structs, plus decode / feature-extract / resize /
frame-sample stages as Arrow-batched ``mapInPandas`` operators.

Beyond-reference operators (the reference has no binary/media surface;
SURVEY.md §7.2 step 8 / BASELINE north star). The Spark-side plumbing —
schemas, partitioning, UDF signatures, Arrow batch shapes — is real and
tested; the actual pixel/sample decoding is STUBBED with a deterministic
fake because image/audio libraries are not in this container (clearly
marked below; drop-in replace ``_fake_decode`` with PIL/librosa calls).

100-TB design notes
-------------------
- Binary payloads ride Parquet/``binaryFile`` scans; metadata extraction
  (``with_media_metadata``) is pure Catalyst (length/sha2/magic-number
  prefix match) — narrow, codegen'd, zero Python.
- Decode/feature stages are ``mapInPandas`` so each Arrow batch crosses
  the JVM↔Python boundary once; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
  (batch rows × max payload) fits executor memory (e.g. 64 rows for
  ~10 MB images).
- Media rows are large and skewed: ``repartition`` by a hash of the id
  (not by file path) before heavy decode stages so one executor doesn't
  get all the 4K videos; emitted features are small, so downstream
  shuffles carry features, not payloads — project payloads away
  immediately after decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Magic-number prefixes → format tag (hex of the payload's first bytes).
_MAGIC: dict[str, str] = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "1A45DFA3": "mkv/webm",
    "00000018": "mp4",
    "00000020": "mp4",
    "4F676753": "ogg",
    "494433": "mp3",
}


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest raw media files as binary rows via Spark's ``binaryFile``
    source: columns ``path, modificationTime, length, content``.
    Partitioning comes from file splits; small-file explosion should be
    compacted to Parquet with this reader + ``attach_media_metadata``
    once, then served from Parquet."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def with_media_metadata(
    df: DataFrame, binary_col: str = "content", out_col: str = "media_meta"
) -> DataFrame:
    """Attach a typed metadata struct derived JVM-side from the payload:
    ``{byte_len, sha256, format}`` — no Python, no shuffle."""
    b = F.col(binary_col)
    prefix = F.upper(F.hex(F.substring(b, 1, 4)))
    fmt = F.lit("unknown")
    # longest prefixes first so e.g. FFD8FF wins over shorter accidental hits
    for magic, tag in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        fmt = F.when(F.substring(prefix, 1, len(magic)) == magic, F.lit(tag)).otherwise(fmt)
    meta = F.struct(
        F.length(b).cast("long").alias("byte_len"),
        F.sha2(b, 256).alias("sha256"),
        fmt.alias("format"),
    )
    return df.withColumn(out_col, meta)


# ---------------------------------------------------------------------------
# Decode / feature stages (Arrow-batched; decode core is STUBBED)
# ---------------------------------------------------------------------------

IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("decode_status", StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decode — deterministic fake dimensions from the payload hash.

    Real implementation: ``PIL.Image.open(io.BytesIO(payload)).size``.
    The container has no imaging libraries, so tests exercise the full
    Arrow path with this stand-in; swap the body, keep the signature.
    """
    h = hashlib.sha256(payload or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3


def decode_images(
    df: DataFrame, id_col: str = "id", binary_col: str = "content"
) -> DataFrame:
    """Decode image payloads to (width, height, channels) via
    ``mapInPandas`` — one Arrow batch in, one out; payload column is
    projected away on output so downstream stages shuffle only metadata.
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            dims = [_fake_decode(p) for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "decode_status": ["ok_stub"] * len(pdf),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, IMAGE_DECODE_SCHEMA)


MEDIA_EMBED_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def embed_media(
    df: DataFrame, id_col: str = "id", binary_col: str = "content", dim: int = 16
) -> DataFrame:
    """Feature-extract stage: payload → fixed-dim float vector.

    STUB features: bytes of the sha256 digest scaled to [0,1) —
    deterministic, schema-correct. Real implementation: a vision/audio
    model over the decoded tensor (still one ``mapInPandas`` stage)."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            vecs = []
            for p in pdf[binary_col]:
                digest = hashlib.sha256(p or b"").digest()
                raw = (digest * ((dim // len(digest)) + 1))[:dim]
                vecs.append([b / 255.0 for b in raw])
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "embedding": vecs})

    return df.select(id_col, binary_col).mapInPandas(batches, MEDIA_EMBED_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "id",
    binary_col: str = "content",
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling stage for video payloads: one output row per
    sampled frame (id, frame_idx, frame_ts_ms).

    STUB: frame count is derived deterministically from payload length
    (1 frame per 4 KiB, capped). Real implementation: container demux
    (pyav/ffmpeg) inside the same ``mapInPandas`` generator — the
    row-explosion shape (N input rows → ≤N×max_frames output rows) and
    schema are what downstream code depends on, and those are real."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, idxs, tss = [], [], []
            for rid, p in zip(pdf[id_col], pdf[binary_col]):
                n = min(max_frames, max(1, len(p or b"") // 4096))
                for i in range(n):
                    ids.append(int(rid))
                    idxs.append(i)
                    tss.append(i * every_ms)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized", BinaryType()),
        StructField("resize_status", StringType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    id_col: str = "id",
    binary_col: str = "content",
) -> DataFrame:
    """Resize stage: payload → fixed-dimension payload + final dims.

    STUB core: the output payload is a deterministic sha256-seeded byte
    string of the correct nominal size (w*h*3 capped at 4 KiB so tests
    stay light). Real implementation: ``PIL.Image.open(...).resize((w,
    h))`` re-encoded inside this same generator — the Spark-side shape
    is what matters and is real: one ``mapInPandas`` Arrow stage, input
    payload projected away, output schema static. At 100 TB, resize runs
    after a repartition-by-id-hash so skewed payload sizes spread evenly
    (see PLANS.md multimodal note)."""
    import pandas as pd

    nominal = min(target_width * target_height * 3, 4096)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = []
            for p in pdf[binary_col]:
                digest = hashlib.sha256(p or b"").digest()
                payloads.append((digest * ((nominal // len(digest)) + 1))[:nominal])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": pd.Series([target_width] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_height] * len(pdf), dtype="int32"),
                    "resized": payloads,
                    "resize_status": ["ok_stub"] * len(pdf),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, RESIZE_SCHEMA)
