"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The Spark-side contract (schema, partition sizing, UDF signatures,
batch shape) is real and tested; the actual media decode is STUBBED —
this container has no image/audio libraries. Each stub either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
(``fake=True``), so pipelines are testable end-to-end and a real
decoder (PIL/torchaudio/ffmpeg) can be dropped into the marked seam.

Scale notes: media rows are large, so the operators repartition by
byte-size budget rather than row count (`target_partition_bytes`), and
every transform is a narrow map — no shuffles beyond the explicit
repartition. Feature vectors come back as ``array<float>`` ready for
operators.similarity.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "decode_images",
    "extract_features",
    "resize_images",
    "sample_frames",
]

#: One row per media object: content + typed metadata. At 100 TB the
#: content column dominates; metadata stays pruned-away unless queried.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_table(df: DataFrame, id_col: str, content_col: str, media_type: str) -> DataFrame:
    """Normalize an arbitrary (id, binary) DataFrame to MEDIA_SCHEMA."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(content_col).cast("binary").alias("content"),
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("string").alias("mime"),
        F.length(F.col(content_col).cast("binary")).cast("long").alias("n_bytes"),
        F.lit(None).cast(
            "struct<width:int,height:int,duration_ms:bigint>"
        ).alias("meta"),
    )


def _size_partitions(df: DataFrame, target_partition_bytes: int) -> DataFrame:
    """Repartition so each task holds ~``target_partition_bytes`` of
    media content.

    One tiny aggregation job measures total content bytes (sum of
    lengths — column-pruned, so the scan reads only lengths where the
    format stores them; no rows reach the driver), then hash-partitions
    on ``media_id`` into ``ceil(total/target)`` partitions, floored at
    the cluster's default parallelism so small inputs still spread.
    """
    total = df.select(
        F.sum(F.coalesce(F.length("content"), F.lit(0))).alias("b")
    ).first()["b"] or 0
    want = max(
        df.sparkSession.sparkContext.defaultParallelism,
        -(-total // max(1, target_partition_bytes)),  # ceil
    )
    return df.repartition(int(want), "media_id")


def decode_images(
    df: DataFrame,
    fake: bool = False,
    target_partition_bytes: int = 256 << 20,
) -> DataFrame:
    """content -> decoded (width, height, pixels-digest) per image.

    Arrow-batched ``mapInPandas``; the decode seam is the inner
    ``_decode`` function. STRICT mode raises NotImplementedError (no
    image libs in this container); ``fake=True`` derives a
    deterministic pseudo-decode from the bytes so the plumbing is
    testable.
    """
    out_schema = (
        "media_id long, width int, height int, pixel_digest string"
    )

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        def _decode(buf: bytes) -> tuple[int, int, str]:
            if not fake:
                # Real implementation: PIL.Image.open(io.BytesIO(buf))
                raise NotImplementedError(
                    "image decode requires an imaging library; "
                    "run with fake=True for the deterministic stub"
                )
            # sha256, not sha1: every engine with a sha256() can
            # replicate the fake decode, so the pipeline is
            # oracle-checkable end-to-end (DuckDB has no sha1).
            digest = hashlib.sha256(buf or b"").hexdigest()
            w = 1 + (len(buf or b"") % 1024)
            h = 1 + (int(digest[:4], 16) % 1024)
            return w, h, digest[:16]

        for pdf in batches:
            decoded = [_decode(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "pixel_digest": [d[2] for d in decoded],
                }
            )

    return _size_partitions(
        df.select("media_id", "content"), target_partition_bytes
    ).mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
    target_partition_bytes: int = 256 << 20,
) -> DataFrame:
    """content -> resized image bytes at (width, height) per image.

    Same Arrow-batched ``mapInPandas`` shape as ``decode_images``; the
    resize seam is the inner ``_resize``. STRICT mode raises
    NotImplementedError (no imaging libs in this container);
    ``fake=True`` emits a deterministic surrogate — sha256(bytes +
    dims) stretched to exactly ``width*height`` bytes — so batch
    plumbing, output sizing, and downstream byte-budget partitioning
    are all real and testable.
    """
    out_schema = "media_id long, width int, height int, content binary"

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        def _resize(buf: bytes) -> bytes:
            if not fake:
                # Real implementation: PIL Image.resize((width, height))
                raise NotImplementedError(
                    "image resize requires an imaging library; "
                    "run with fake=True for the deterministic stub"
                )
            seed = hashlib.sha256(
                (buf or b"") + f"{width}x{height}".encode()
            ).digest()
            need = width * height
            return (seed * (need // len(seed) + 1))[:need]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": width,
                    "height": height,
                    "content": [_resize(b) for b in pdf["content"]],
                }
            )

    return _size_partitions(
        df.select("media_id", "content"), target_partition_bytes
    ).mapInPandas(run, out_schema)


def extract_features(
    df: DataFrame,
    dim: int = 64,
    fake: bool = False,
    target_partition_bytes: int = 256 << 20,
) -> DataFrame:
    """content -> feature vector ``array<float>`` (embedding seam).

    ``fake=True`` produces a deterministic hash-derived vector, unit
    length, so downstream similarity operators are exercised for real.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import hashlib
        import math

        import pandas as pd

        def _embed(buf: bytes) -> list[float]:
            if not fake:
                raise NotImplementedError(
                    "feature extraction requires a model runtime; "
                    "run with fake=True for the deterministic stub"
                )
            raw = []
            seed = buf or b""
            for i in range(dim):
                h = hashlib.sha1(seed + i.to_bytes(4, "big")).digest()
                raw.append(int.from_bytes(h[:4], "big") / 2**31 - 1.0)
            norm = math.sqrt(sum(x * x for x in raw)) or 1.0
            return [x / norm for x in raw]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "features": [_embed(b) for b in pdf["content"]],
                }
            )

    return _size_partitions(
        df.select("media_id", "content"), target_partition_bytes
    ).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    fake: bool = False,
    target_partition_bytes: int = 256 << 20,
) -> DataFrame:
    """video content -> one row per sampled frame (frame_idx, ts_ms,
    frame binary). Frame extraction is the stub seam; ``fake=True``
    slices the byte stream deterministically."""
    out_schema = "media_id long, frame_idx int, ts_ms long, frame binary"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def _frames(buf: bytes) -> list[tuple[int, int, bytes]]:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires ffmpeg; run with fake=True"
                )
            buf = buf or b""
            n = max(1, min(4, len(buf) // 16))
            step = max(1, len(buf) // n)
            return [
                (i, i * every_ms, buf[i * step : (i + 1) * step][:16])
                for i in range(n)
            ]

        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                for idx, ts, frame in _frames(buf):
                    rows.append((mid, idx, ts, frame))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]
            )

    return _size_partitions(
        df.select("media_id", "content"), target_partition_bytes
    ).mapInPandas(run, out_schema)
