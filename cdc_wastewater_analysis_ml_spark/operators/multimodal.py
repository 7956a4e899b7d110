"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (SURVEY §7 phase 4 / task brief): media travels as a ``binary`` column
with a metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas iterators over ``mapInPandas`` — the Spark-side
plumbing (schema, partitioning, UDF signature, batch shape) is real and
tested, while the codec itself is pluggable:

- the real decoders (Pillow / torchaudio / pyav) are NOT in this container,
  so ``decoder=None`` uses a deterministic fake (md5-derived dimensions /
  features) and ``decoder="strict"`` raises NotImplementedError at the first
  batch — the two stub behaviors clearly marked per the brief;
- a caller with the libs installed passes ``decoder=callable`` mapping
  ``bytes -> dict`` matching the output schema.

Scale notes: ``mapInPandas`` streams Arrow batches (no per-row pickling);
binary payloads never hit the driver; ``spark.sql.files.maxPartitionBytes``
controls bytes-per-task for wide binary scans; feature extraction is a
narrow map — no shuffle at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_s", DoubleType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _fake_decode(payload: bytes, n_features: int = 8) -> dict:
    """Deterministic stand-in for a real image decode: dimensions and a
    feature vector derived from the payload digest.  CLEARLY A STUB — real
    decoding needs Pillow/torch, absent in this container."""
    digest = hashlib.md5(payload or b"").digest()
    return {
        "width": 1 + digest[0] % 64,
        "height": 1 + digest[1] % 64,
        "features": [b / 255.0 for b in digest[:n_features]],
    }


def decode_images(
    df: DataFrame,
    decoder: Callable[[bytes], dict] | None | str = None,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """payload → (width, height, features) via Arrow-batched ``mapInPandas``.

    ``decoder=None`` → deterministic fake; ``decoder="strict"`` → raise
    NotImplementedError (stub marker); callable → real codec.

    **Real-codec injection recipe (JPEG/PNG via Pillow — not installable in
    this container, so documented rather than defaulted; the stdlib-PNG
    decoder in the tests proves the plumbing end-to-end):**

    .. code-block:: python

        def pillow_decode(payload: bytes, n_features: int = 8) -> dict:
            import io
            import PIL.Image  # import INSIDE the UDF: ships by reference,
            img = PIL.Image.open(io.BytesIO(payload))   # workers just need
            img.load()                                  # pillow installed
            small = img.convert("L").resize((n_features, 1))
            return {
                "width": img.width,
                "height": img.height,
                "features": [p / 255.0 for p in small.getdata()],
            }

        decode_images(media, decoder=pillow_decode)

    Cluster-side requirements: Pillow on every executor's Python (pip in
    the image, ``--archives`` conda-pack, or a cluster-wide env) — the
    closure itself is cloudpickled, only the ``PIL`` import resolves
    worker-side.  The same pattern extends to audio (soundfile → PCM
    stats) and video (PyAV → ``sample_video_frames``'s frame iterator);
    keep per-batch decode bounded via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
    large (decoded frames are the memory spike, not the bytes column).
    """
    if decoder == "strict":

        def _strict(_: bytes) -> dict:
            raise NotImplementedError(
                "image decoding requires Pillow/torchvision — not installed; "
                "pass decoder=<callable> or use the deterministic fake"
            )

        decode = _strict
    elif decoder is None:
        # Local def (not the module-level _fake_decode) so cloudpickle ships
        # the UDF by value — workers need no access to this package.
        def _local_fake(payload: bytes, n_features: int = 8) -> dict:
            import hashlib as _hashlib

            digest = _hashlib.md5(payload or b"").digest()
            return {
                "width": 1 + digest[0] % 64,
                "height": 1 + digest[1] % 64,
                "features": [b / 255.0 for b in digest[:n_features]],
            }

        decode = _local_fake
    else:
        decode = decoder

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    every_s: float = 1.0,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plan: one row per sampled frame timestamp.

    The frame *positions* come from metadata (duration), so this stage is a
    pure Catalyst explode — no decode needed; the downstream decode of each
    frame goes through :func:`decode_images` on the exploded relation.
    """
    n_frames = F.greatest(
        (F.col("meta_duration_s") / F.lit(every_s)).cast("int"), F.lit(1)
    )
    return (
        df.filter(F.col("modality") == "video")
        .select(
            id_col,
            "payload",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("frame_time_s", F.col("frame_idx") * F.lit(every_s))
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Per-modality payload statistics — pure built-ins (codegen'd), the
    'is this corpus sane' gate before expensive decoding."""
    return df.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.sum(F.col("payload").isNull().cast("int")).alias("null_payloads"),
    )


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (32, 32),
    resizer: Callable[[bytes, tuple[int, int]], bytes] | None | str = None,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """payload → resized payload via Arrow-batched ``mapInPandas``.

    ``resizer=None`` → deterministic fake (truncate/pad the byte stream to
    ``target[0]*target[1]`` bytes — CLEARLY A STUB: a real implementation
    plugs Pillow's ``Image.resize`` in as ``resizer``); ``"strict"`` raises
    NotImplementedError.  The Spark-side plumbing — schema, batching, binary
    round-trip — is the real, tested part.
    """
    if resizer == "strict":

        def _strict(_p: bytes, _t: tuple[int, int]) -> bytes:
            raise NotImplementedError(
                "image resizing requires Pillow — not installed; pass "
                "resizer=<callable> or use the deterministic fake"
            )

        fn_resize = _strict
    elif resizer is None:

        def _local_fake(p: bytes, t: tuple[int, int]) -> bytes:
            size = t[0] * t[1]
            p = p or b""
            return (p[:size] if len(p) >= size else p + b"\x00" * (size - len(p)))

        fn_resize = _local_fake
    else:
        fn_resize = resizer

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("payload_resized", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    w, h = target

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "payload_resized": [fn_resize(p, (w, h)) for p in pdf[payload_col]],
                    "width": w,
                    "height": h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)
