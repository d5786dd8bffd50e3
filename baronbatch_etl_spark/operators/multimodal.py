"""Multimodal column conventions + processing plumbing (north-star
family). Images/audio/video ride through the engine as opaque
``binary`` columns with a typed metadata struct; decode/feature
steps are Arrow-batched ``mapInPandas`` operators.

The container has no image/audio libraries, so the actual decoders
are STUBS (clearly marked); everything around them — schema, batch
iteration, partitioning, output shape — is real and tested. Swapping
`_decode_image_stub` for a PIL/torchvision call is the only change a
real deployment makes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every binary payload.
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def _decode_image_stub(payload: bytes) -> None:
    """STUB — image decode needs PIL/libjpeg, absent in this
    container. A real deployment replaces this with
    ``PIL.Image.open(io.BytesIO(payload))``."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; see module docstring"
    )


def _fake_features(byte_len: int) -> list[float]:
    """Deterministic fake embedding derived from payload length —
    stands in for the decoder+encoder so the distributed plumbing
    (batching, schema, partitioning) is fully exercised."""
    return [float((byte_len * (i + 7)) % 256) for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps whole Arrow batches in flight (no per-row
    serde); at 100 TB this is the pattern for any Python-side media
    op — the batch iterator bounds memory regardless of file count.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["payload"].map(lambda p: 0 if p is None else len(p))
            if use_real_decoder:  # pragma: no cover — stub raises
                pdf["payload"].map(_decode_image_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": lens.astype("int64"),
                    "features": lens.map(_fake_features),
                }
            )

    return media.mapInPandas(op, FEATURES_SCHEMA)


def frame_sample_offsets(
    media: DataFrame, n_frames: int = 4
) -> DataFrame:
    """Video frame-sampling plumbing: evenly spaced sample timestamps
    from the duration metadata (first/…/last-exclusive convention,
    offset_i = i·duration/n). The actual frame decode is the stubbed
    step (`_decode_image_stub`); offset planning — the distributed
    part — is a pure column expression, so a 100 TB video corpus
    plans its sampling at scan speed and only the decoder fans out."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0).cast("long"))
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.floor(i * dur / F.lit(n_frames)).cast("long"),
    )
    return media.select(
        "media_id",
        dur.alias("duration_ms"),
        offsets.alias("frame_offsets_ms"),
    )


def resize_spec(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning from width/height metadata: target dimensions
    preserving aspect ratio, longest side capped at ``max_side``
    (integer math only — portable). The pixel work is the stubbed
    decoder's job; this computes the plan column-side."""
    w = F.coalesce(F.col("meta.width"), F.lit(0))
    h = F.coalesce(F.col("meta.height"), F.lit(0))
    longest = F.greatest(w, h)
    scale_num = F.when(longest > max_side, F.lit(max_side)).otherwise(longest)
    tw = F.when(longest > 0, F.floor(w * scale_num / longest)).otherwise(F.lit(0))
    th = F.when(longest > 0, F.floor(h * scale_num / longest)).otherwise(F.lit(0))
    return media.select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        tw.cast("int").alias("target_width"),
        th.cast("int").alias("target_height"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a binary payload (the
    fixture tables carry no real media; this exercises the identical
    binary-column path)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
