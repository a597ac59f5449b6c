"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The Spark-side contract (schema, partition sizing, UDF signatures,
batch shape) is real and tested. Image decode is REAL for the netpbm
family (PGM/PPM, :func:`decode_pnm` — pure stdlib, r10): the
``multimodal_pipeline`` catalog entry runs it end-to-end on
synthesized P5 bytes with an oracle that recomputes the pixel digest.
Other formats (JPEG/PNG, audio, video frames) stay stubbed — this
container has no imaging/av libraries — raising
``NotImplementedError`` in strict mode or producing a deterministic
fake (``fake=True``), so those pipelines are testable end-to-end and
a real decoder (PIL/torchaudio/ffmpeg) drops into the marked seam.

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
    "decode_pnm",
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


def decode_pnm(buf: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib decoder for the binary/ASCII netpbm formats (PGM
    ``P2``/``P5``, PPM ``P3``/``P6`` — the one image family decodable
    with zero dependencies): returns ``(width, height, pixel_bytes)``
    where ``pixel_bytes`` is the raw 8-bit sample stream (1 byte per
    sample grayscale, 3 bytes per pixel RGB) — the canonical form the
    pipeline digests.

    Full header grammar: tokens separated by whitespace, ``#`` comments
    run to end-of-line, exactly one whitespace byte after maxval before
    binary pixel data. 8-bit samples only (maxval <= 255); a 16-bit
    maxval raises ValueError rather than silently mis-slicing. Sample
    count must equal width*height*channels exactly.
    """
    if len(buf) < 2 or buf[0:1] != b"P" or buf[1:2] not in b"2356":
        raise ValueError(f"not a PGM/PPM buffer: {buf[:2]!r}")
    magic = buf[:2].decode()
    channels = 3 if magic in ("P3", "P6") else 1
    pos = 2

    def _token() -> bytes:
        nonlocal pos
        while pos < len(buf):
            c = buf[pos : pos + 1]
            if c == b"#":
                while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        return buf[start:pos]

    width, height, maxval = (int(_token()) for _ in range(3))
    if width < 1 or height < 1:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if not 0 < maxval <= 255:
        raise ValueError(f"only 8-bit samples supported, maxval={maxval}")
    need = width * height * channels
    if magic in ("P5", "P6"):
        pos += 1  # exactly one whitespace byte after maxval
        data = buf[pos:]
        if len(data) != need:
            raise ValueError(
                f"pixel payload {len(data)} B != expected {need} B"
            )
        return width, height, bytes(data)
    samples = buf[pos:].split()
    if len(samples) != need:
        raise ValueError(
            f"{len(samples)} ASCII samples != expected {need}"
        )
    vals = [int(s) for s in samples]
    if any(v < 0 or v > maxval for v in vals):
        raise ValueError("sample out of range")
    return width, height, bytes(vals)


def decode_images(
    df: DataFrame,
    fake: bool = False,
    target_partition_bytes: int = 256 << 20,
) -> DataFrame:
    """content -> decoded (width, height, pixels-digest) per image.

    Arrow-batched ``mapInPandas``; the decode seam is the inner
    ``_decode`` function. STRICT mode (``fake=False``) runs a REAL
    decoder for the netpbm family (:func:`decode_pnm` — PGM/PPM,
    pure stdlib) and raises NotImplementedError for any other format
    (JPEG/PNG need an imaging library this container lacks; drop
    PIL into the marked seam). ``fake=True`` derives a deterministic
    pseudo-decode from the bytes so non-netpbm plumbing stays
    testable. ``pixel_digest`` is sha256 over the DECODED 8-bit
    sample stream (strict) or over the raw buffer (fake).
    """
    out_schema = (
        "media_id long, width int, height int, pixel_digest string"
    )

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        def _decode(buf: bytes) -> tuple[int, int, str]:
            if not fake:
                b = buf or b""
                if b[:1] == b"P" and b[1:2] in b"2356":
                    w, h, pixels = decode_pnm(b)
                    return w, h, hashlib.sha256(pixels).hexdigest()[:16]
                # Real implementation for other formats:
                # PIL.Image.open(io.BytesIO(buf))
                raise NotImplementedError(
                    "only netpbm (PGM/PPM) decodes without an imaging "
                    "library; run with fake=True for the deterministic "
                    "stub on other formats"
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
