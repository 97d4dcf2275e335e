"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract is real and tested — schema, partitioning,
Arrow batch shape, UDF signatures — while the actual media decode is
stubbed (no image/audio libraries in this container): ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder derives plausible metadata from the bytes.

Scale notes: media blobs dominate row size, so feature extraction uses
``mapInPandas`` (Arrow-batched, streaming batches — never a collect),
``spark.sql.files.maxPartitionBytes`` bounds scan partitions, and
outputs drop the blob column as early as possible (column pruning does
the rest)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("data", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

_MAGIC = {
    b"\x89PNG": ("image", "png"),
    b"\xff\xd8\xff": ("image", "jpeg"),
    b"RIFF": ("audio", "wav"),
    b"ID3": ("audio", "mp3"),
    b"\x00\x00\x00\x18": ("video", "mp4"),
    b"IMG0": ("image", "fake"),  # the deterministic test format
    b"AUD0": ("audio", "fake"),
    b"VID0": ("video", "fake"),
}

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("sniffed_format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def sniff_format(data: bytes | None) -> str | None:
    if not data:
        return None
    for magic, (_, fmt) in _MAGIC.items():
        if data.startswith(magic):
            return fmt
    return "unknown"


def decode_media(data: bytes, fake: bool = False) -> dict:
    """Decode a media blob to (width, height, ...) metadata.

    Real decode requires PIL/ffmpeg — not available here. ``fake=True``
    derives deterministic dimensions from the content hash so the full
    distributed plumbing can be exercised end-to-end."""
    if not fake:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg; run with fake=True in this environment"
        )
    h = hashlib.md5(data).digest()
    return {"width": 64 + h[0] % 192, "height": 64 + h[1] % 192}


def synth_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from the documents table:
    payload = 4-byte magic + utf-8 text; kind rotates by doc_id."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), 3) + 1).cast("int"),
    )
    magic = F.element_at(
        F.array(F.lit("IMG0"), F.lit("AUD0"), F.lit("VID0")),
        (F.pmod(F.col("doc_id"), 3) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        kind.alias("kind"),
        F.concat(magic, F.col(text_col)).cast("binary").alias("data"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Column-wise pandas ``map`` per batch for the vectorizable parts
    (sha / sniff / length); only the decode itself is per-blob by
    nature (a real PIL/ffmpeg call is per-item regardless)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf["data"].map(lambda d: bytes(d) if d is not None else b"")
            dims = data.map(
                lambda d: decode_media(d, fake=fake_decode) if d else {}
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": data.map(len).astype("int64"),
                    "sha": data.map(lambda d: hashlib.sha256(d).hexdigest()),
                    "sniffed_format": data.map(sniff_format),
                    "width": dims.map(lambda m: m.get("width")),
                    "height": dims.map(lambda m: m.get("height")),
                },
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


class EmbedModel:
    """Pluggable media/text embedding hook (the CLIP-shaped seam,
    mirroring :class:`~beats_spark.corpus.textstats.LangScorer`): a real
    encoder subclasses this and implements :meth:`embed_batch`; the
    engine never imports a model library itself.

    ``embed_media(media, model)`` runs the model Arrow-batch-wise over
    the binary column and emits (media_id, embedding array<double>) —
    the shape the similarity/ANN operators consume directly."""

    dim: int = 8

    def embed_batch(self, blobs: "pd.Series") -> "pd.Series":
        """bytes Series → Series of list[float] (len == self.dim)."""
        raise NotImplementedError


class FakeEmbedModel(EmbedModel):
    """Deterministic stand-in: md5-derived unit-free components, so the
    distributed plumbing (batching, schema, downstream ANN joins) is
    exercised end-to-end without a model library."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def embed_batch(self, blobs: pd.Series) -> pd.Series:
        def one(d: bytes) -> list[float]:
            h = hashlib.md5(d or b"").digest()
            return [h[i % 16] / 255.0 for i in range(self.dim)]

        return blobs.map(one)


def embed_media(media: DataFrame, model: EmbedModel) -> DataFrame:
    """(media_id, embedding): run ``model`` over the blob column in
    Arrow batches; output feeds the cosine/ANN operators as-is."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["data"].map(lambda d: bytes(d) if d is not None else b"")
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "embedding": model.embed_batch(blobs)}
            )

    return media.mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    offset (the decode itself is the stubbed step). Pure JVM explode —
    the fan-out happens before any Python."""
    n = F.octet_length("data")
    idx = F.sequence(
        F.lit(0), F.least(F.floor(n / every_n_bytes).cast("int"), F.lit(max_frames - 1))
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(idx).alias("frame_no"), "data")
        .withColumn("frame_offset", F.col("frame_no") * every_n_bytes)
        .select("media_id", "frame_no", "frame_offset")
    )
