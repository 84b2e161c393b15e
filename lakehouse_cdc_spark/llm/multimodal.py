"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the raw bytes live in a
``binary`` column (or an object-store path column for >röw-group-sized
assets); every transform is an Arrow-batched ``mapInPandas`` over a
declared output schema, so Spark plans the pipeline like any other
columnar job (partition-parallel, spill-safe, no driver involvement).

The decode kernels themselves need codec libraries that are NOT in
this container, so ``decode_image_meta`` ships two modes:

- ``fake=False`` (production): raises NotImplementedError where the
  real decoder (e.g. PIL/ffmpeg) would be called — clearly-marked stub.
- ``fake=True`` (tests): a deterministic stand-in derived from the
  bytes themselves, so the Spark-side plumbing (schema, batching,
  partitioning, UDF signature) is fully exercised and asserted.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata schema attached to every binary payload
BINARY_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("mime", T.StringType()),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def attach_binary(
    df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream"
) -> DataFrame:
    """Project a column into an opaque binary payload + metadata struct
    (the storage shape multimodal tables use: payload alongside typed,
    pruneable metadata so queries never touch bytes they don't need)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.md5(payload).alias("content_md5"),
            F.lit(mime).alias("mime"),
        ),
    )


def decode_image_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Arrow-batched "decode" of image payloads → (id, width, height,
    channels).  Real decoding is stubbed (no codec libs in this
    container); ``fake=True`` derives deterministic dimensions from the
    payload bytes so the mapInPandas plumbing is testable end-to-end.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image decode requires a codec library (PIL/turbojpeg) "
                    "not present in this environment; pass fake=True for "
                    "the deterministic test kernel"
                )
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": payloads.map(lambda b: 16 + (len(b) % 64)).astype("int32"),
                    "height": payloads.map(lambda b: 16 + ((len(b) // 64) % 64)).astype(
                        "int32"
                    ),
                    "channels": payloads.map(lambda b: 1 + (b[0] % 3) if len(b) else 1)
                    .astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_META_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_nth: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling *plan* for video payloads: one output row per
    sampled frame index.  The frame extraction itself is the stubbed
    decode; the fan-out (posexplode over the sample index) is the real
    Spark-side shape — rows multiply on executors, never the driver."""
    n_frames = (F.octet_length("payload") % 100 + 1).alias("n_frames")
    with_frames = df.select(id_col, "payload", n_frames)
    idx = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(every_nth)
    )
    return with_frames.select(
        id_col, F.posexplode(idx).alias("pos", "frame_index")
    ).drop("pos")
