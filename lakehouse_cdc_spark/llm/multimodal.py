"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the raw bytes live in a
``binary`` column (or an object-store path column for >röw-group-sized
assets); every transform is an Arrow-batched ``mapInPandas`` over a
declared output schema, so Spark plans the pipeline like any other
columnar job (partition-parallel, spill-safe, no driver involvement).

Decode support is tiered by codec availability:

- **BMP (uncompressed) decodes FOR REAL, zero external deps**:
  :func:`decode_bmp_stats` parses the BITMAPFILEHEADER /
  BITMAPINFOHEADER byte layout with numpy — 24-bit BGR and 8-bit
  paletted grayscale, 4-byte row padding, bottom-up or top-down rows
  — and reduces each image to exact integer pixel statistics.
  :func:`bmp_bytes` builds real BMP files deterministically from an
  id, so the whole encode→decode path is oracle-checkable: the
  closed-form pixel function is reproducible in SQL while the decoder
  itself only ever sees honest bytes.
- Compressed codecs (JPEG/PNG/ffmpeg) need libraries NOT in this
  container; ``decode_image_meta(fake=True)`` remains the
  deterministic stand-in that exercises the identical plumbing
  (schema, batching, partitioning, UDF signature) for those.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------- BMP codec
# Deterministic fixture geometry/pixels, closed-form so a SQL oracle
# can reproduce the decoded statistics without any codec:
#   gray     = (doc_id % 4 == 0)          -> 8-bit paletted, else 24-bit BGR
#   width    = 4 + doc_id % 13            (4..16)
#   height   = 4 + (doc_id * 7) % 11      (4..14)
#   pixel value at channel c, column x, TOP-DOWN row y:
#            (doc_id + 3x + 5y + 11c) % 256


def _bmp_geometry(doc_id: int) -> tuple[int, int, int]:
    w = 4 + doc_id % 13
    h = 4 + (doc_id * 7) % 11
    channels = 1 if doc_id % 4 == 0 else 3
    return w, h, channels


def bmp_bytes(doc_id: int) -> bytes:
    """A REAL .bmp file for the deterministic fixture image: proper
    file + info headers, 4-byte-padded rows stored bottom-up, and for
    the grayscale variant a 256-entry identity BGRA palette.  Any BMP
    viewer opens these."""
    w, h, channels = _bmp_geometry(doc_id)
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(channels)[None, None, :]
    pix = ((doc_id + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)  # (h, w, ch)
    row_bytes = w * channels
    stride = (row_bytes + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = pix.reshape(h, row_bytes)
    data = rows[::-1].tobytes()  # bottom-up row order
    palette = b""
    if channels == 1:
        idx = np.arange(256, dtype=np.uint8)
        palette = np.stack([idx, idx, idx, np.zeros(256, np.uint8)], 1).tobytes()
    data_off = 14 + 40 + len(palette)
    bpp = 8 * channels
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(data), 0, 0, data_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, bpp, 0, len(data), 2835, 2835,
        256 if channels == 1 else 0, 0,
    )
    return file_hdr + info_hdr + palette + data


def _parse_bmp(b: bytes) -> np.ndarray:
    """Parse BMP bytes → (h, w, channels) uint8 array in top-down row
    order.  Supports the uncompressed 24-bit and 8-bit-paletted
    layouts; raises ValueError with the offending field otherwise."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_off = struct.unpack_from("<I", b, 10)[0]
    dib_size, w, h_raw = struct.unpack_from("<Iii", b, 14)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if dib_size < 40 or compression != 0 or bpp not in (8, 24):
        raise ValueError(
            f"unsupported BMP (dib={dib_size}, bpp={bpp}, "
            f"compression={compression}); only uncompressed 8/24-bit"
        )
    h = abs(h_raw)
    stride = (w * (bpp // 8) + 3) // 4 * 4
    rows = np.frombuffer(b, np.uint8, stride * h, data_off).reshape(h, stride)
    if h_raw > 0:  # bottom-up file → flip to top-down
        rows = rows[::-1]
    if bpp == 24:
        return rows[:, : w * 3].reshape(h, w, 3)
    # palette sits immediately after the DIB header (14 + dib_size),
    # NOT at a fixed 54: V4/V5 headers (dib 108/124) are legal here
    palette = np.frombuffer(b, np.uint8, 1024, 14 + dib_size).reshape(256, 4)
    return palette[rows[:, :w], 0][:, :, None]  # B channel of each entry


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_wsum", T.LongType()),
    ]
)


def encode_bmp_fixture(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Attach a real BMP payload per row (Arrow-batched; the encode
    happens executor-side, exactly where a real ingest would decode
    object-store bytes)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    payload_col: [bmp_bytes(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, f"{id_col} long, {payload_col} binary"
    )


def decode_bmp_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image decode, zero external deps: parse each BMP payload's
    headers/palette/padding with numpy and reduce to exact integer
    pixel statistics — ``px_sum`` (orientation-invariant) and
    ``px_wsum`` = Σ (1+x)(1+2y)·value over TOP-DOWN coordinates, which
    is wrong unless the decoder honors BMP's bottom-up row order and
    strips the row padding.  All-integer outputs => bit-exact on any
    engine, so the stage sits on the oracle surface like any
    relational operator."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, chs, sums, wsums = [], [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                pix = _parse_bmp(bytes(payload)).astype(np.int64)
                h, w, ch = pix.shape
                wx = (1 + np.arange(w))[None, :, None]
                wy = (1 + 2 * np.arange(h))[:, None, None]
                ids.append(int(doc_id))
                ws.append(w)
                hs.append(h)
                chs.append(ch)
                sums.append(int(pix.sum()))
                wsums.append(int((wx * wy * pix).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(chs, dtype="int32"),
                    "px_sum": pd.Series(sums, dtype="int64"),
                    "px_wsum": pd.Series(wsums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_STATS_SCHEMA)


def decode_image_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Arrow-batched decode of image payloads → (id, width, height,
    channels).  ``fake=False`` parses REAL BMP headers
    (:func:`_parse_bmp`); ``fake=True`` derives deterministic
    dimensions from the payload bytes so the mapInPandas plumbing is
    exercisable on non-image payloads too (the stand-in for codecs
    this container lacks)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                recs = []
                for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                    pix = _parse_bmp(bytes(payload))
                    recs.append((int(doc_id), pix.shape[1], pix.shape[0], pix.shape[2]))
                yield pd.DataFrame(
                    recs, columns=["doc_id", "width", "height", "channels"]
                ).astype(
                    {"doc_id": "int64", "width": "int32",
                     "height": "int32", "channels": "int32"}
                )
                continue
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


# ---------------------------------------------------------------- WAV codec
# Second REAL modality, same design as BMP: RIFF/WAVE PCM16 files built
# deterministically from an id with closed-form samples, so a SQL
# oracle reproduces the DECODED statistics while the decoder only ever
# sees honest bytes.  Fixture geometry:
#   n_samples   = 64 + doc_id % 129          (64..192 frames)
#   sample_rate = 8000 + (doc_id % 3) * 4000 (8/12/16 kHz)
#   channels    = 1 + doc_id % 2             (mono / stereo)
#   sample(i,c) = ((doc_id * 31 + i * 17 + c * 101) % 4096) - 2048


def _wav_geometry(doc_id: int) -> tuple[int, int, int]:
    n = 64 + doc_id % 129
    sr = 8000 + (doc_id % 3) * 4000
    ch = 1 + doc_id % 2
    return n, sr, ch


def wav_bytes(doc_id: int) -> bytes:
    """A REAL .wav file for the deterministic fixture clip: RIFF
    header, canonical 16-byte PCM fmt chunk, interleaved little-endian
    int16 frames.  Any audio player opens these."""
    n, sr, ch = _wav_geometry(doc_id)
    i = np.arange(n)[:, None]
    c = np.arange(ch)[None, :]
    s = ((doc_id * 31 + i * 17 + c * 101) % 4096) - 2048  # (n, ch)
    data = s.astype("<i2").tobytes()  # interleaved frames
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16
    )
    data_ck = struct.pack("<4sI", b"data", len(data)) + data
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data_ck), b"WAVE")
    return riff + fmt + data_ck


def _parse_wav(b: bytes) -> tuple[int, np.ndarray]:
    """Parse WAV bytes → (sample_rate, (n_frames, channels) int16
    array) by walking RIFF chunks (fmt may precede or follow other
    chunks; odd-sized chunks carry a pad byte).  PCM16 only; raises
    ValueError with the offending field otherwise."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, bits={bits}); PCM16 only"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # odd chunks are padded
    if sr is None or data is None:
        raise ValueError("missing fmt or data chunk")
    frames = np.frombuffer(data, "<i2")
    return sr, frames.reshape(-1, ch)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("amp_sum_abs", T.LongType()),
        T.StructField("amp_sumsq", T.LongType()),
        T.StructField("amp_max", T.IntegerType()),
    ]
)


def encode_wav_fixture(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Attach a real WAV payload per row (Arrow-batched, executor-side
    — the audio twin of encode_bmp_fixture)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    payload_col: [wav_bytes(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, f"{id_col} long, {payload_col} binary"
    )


def decode_wav_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode, zero external deps: walk the RIFF chunk list,
    de-interleave PCM16 frames with numpy, and reduce each clip to
    exact integer amplitude statistics (Σ|s|, Σs², max s).  Get the
    chunk walk, endianness, or interleaving wrong and the sums break
    the oracle hash.  All-integer outputs => bit-exact on any engine."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "id", "nf", "ch", "sr", "sabs", "ssq", "smax")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                sr, s = _parse_wav(bytes(payload))
                s64 = s.astype(np.int64)
                out["id"].append(int(doc_id))
                out["nf"].append(s.shape[0])
                out["ch"].append(s.shape[1])
                out["sr"].append(sr)
                out["sabs"].append(int(np.abs(s64).sum()))
                out["ssq"].append(int((s64 * s64).sum()))
                out["smax"].append(int(s64.max()))
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "n_frames": out["nf"],
                    "channels": out["ch"],
                    "sample_rate": out["sr"],
                    "amp_sum_abs": out["sabs"],
                    "amp_sumsq": out["ssq"],
                    "amp_max": out["smax"],
                }
            )

    return df.mapInPandas(batches, AUDIO_STATS_SCHEMA)


# ------------------------------------------------------------ resize

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("px_sum_resized", T.LongType()),
        T.StructField("top_left", T.IntegerType()),
        T.StructField("bottom_right", T.IntegerType()),
    ]
)


def resize_bmp_stats(
    df: DataFrame,
    out_w: int = 4,
    out_h: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL nearest-neighbor downscale inside ``mapInPandas``: decode
    the BMP, gather out[y][x] = in[y*h//out_h][x*w//out_w] (integer
    source coordinates — exact selection, no interpolation arithmetic),
    and reduce the thumbnail to integer stats.  Channel 0 only (the
    luma-proxy a thumbnail index stores).  Getting the source-index
    floor math wrong shifts which pixels survive and breaks the oracle
    hash."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("id", "s", "tl", "br")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                pix = _parse_bmp(bytes(payload)).astype(np.int64)
                h, w, _ = pix.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                thumb = pix[np.ix_(ys, xs)][:, :, 0]
                out["id"].append(int(doc_id))
                out["s"].append(int(thumb.sum()))
                out["tl"].append(int(thumb[0, 0]))
                out["br"].append(int(thumb[-1, -1]))
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "px_sum_resized": out["s"],
                    "top_left": out["tl"],
                    "bottom_right": out["br"],
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


# ------------------------------------------------------- video frames
# Deterministic "video" container: b"VID0" + u32 frame count, then per
# frame u32 length + a real BMP whose pixel seed is doc_id * 31 + f.
#   n_frames = 6 + doc_id % 5


def video_bytes(doc_id: int) -> bytes:
    n = 6 + doc_id % 5
    frames = [bmp_bytes(doc_id * 31 + f) for f in range(n)]
    out = [b"VID0", struct.pack("<I", n)]
    for fb in frames:
        out.append(struct.pack("<I", len(fb)))
        out.append(fb)
    return b"".join(out)


VIDEO_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("sampled_px_sum", T.LongType()),
    ]
)


def encode_video_fixture(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Attach a real multi-frame container per row (Arrow-batched)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    payload_col: [video_bytes(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(
        batches, f"{id_col} long, {payload_col} binary"
    )


def sample_video_frames(
    df: DataFrame,
    stride: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL frame sampling: walk the container's length-prefixed frame
    list, decode only every ``stride``-th frame (the decode-cost saver
    video pipelines rely on — skipped frames are never parsed), and
    reduce the sampled frames to one integer stat row per clip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("id", "nf", "ns", "s")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if b[:4] != b"VID0":
                    raise ValueError("not a VID0 container")
                n = struct.unpack_from("<I", b, 4)[0]
                pos, total, sampled = 8, 0, 0
                for f in range(n):
                    ln = struct.unpack_from("<I", b, pos)[0]
                    pos += 4
                    if f % stride == 0:
                        pix = _parse_bmp(b[pos : pos + ln]).astype(np.int64)
                        total += int(pix.sum())
                        sampled += 1
                    pos += ln
                out["id"].append(int(doc_id))
                out["nf"].append(n)
                out["ns"].append(sampled)
                out["s"].append(total)
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "n_frames": out["nf"],
                    "n_sampled": out["ns"],
                    "sampled_px_sum": out["s"],
                }
            )

    return df.mapInPandas(batches, VIDEO_SAMPLE_SCHEMA)


# ------------------------------------------------------------- aHash

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def ahash_bmp(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Average-hash perceptual image signature: decode, 8x8
    nearest-neighbor downscale (channel 0), threshold each cell
    against the integer FLOOR of the thumbnail mean, pack the 64
    bits row-major into one bigint.  Near-identical images agree on
    most bits; equal hashes are duplicate candidates.  Everything is
    integer selection + integer division, so the signature is
    bit-identical across engines and partitionings."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                pix = _parse_bmp(bytes(payload)).astype(np.int64)
                h, w, _ = pix.shape
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(8) * w) // 8
                thumb = pix[np.ix_(ys, xs)][:, :, 0]
                mean_floor = int(thumb.sum()) // 64
                bits = (thumb > mean_floor).astype(np.uint64).ravel()
                sig = 0
                for i, bval in enumerate(bits):
                    sig |= int(bval) << i
                # keep in signed-bigint range the same way both engines
                # do: interpret the 64-bit pattern as two's complement
                if sig >= 1 << 63:
                    sig -= 1 << 64
                ids.append(int(doc_id))
                hashes.append(sig)
            yield pd.DataFrame({id_col: ids, "ahash": hashes})

    return df.mapInPandas(batches, AHASH_SCHEMA)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def dhash_bmp(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Difference-hash perceptual image signature — the GRADIENT
    sibling of :func:`ahash_bmp`: decode, 9x8 nearest-neighbor
    downscale (channel 0, one extra column), and each of the 64 bits
    records whether a cell is strictly brighter than its right
    neighbor.  dHash is robust where aHash is weak (global brightness
    / contrast shifts cancel out of the pairwise comparisons — a
    re-exposed copy keeps its gradient signs), so real image-dedup
    cascades run both and candidate on either.  Pure integer
    selection + comparison: bit-identical on any engine or
    partitioning."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                pix = _parse_bmp(bytes(payload)).astype(np.int64)
                h, w, _ = pix.shape
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                thumb = pix[np.ix_(ys, xs)][:, :, 0]
                bits = (thumb[:, :8] > thumb[:, 1:]).astype(np.uint64).ravel()
                sig = 0
                for i, bval in enumerate(bits):
                    sig |= int(bval) << i
                if sig >= 1 << 63:  # two's-complement bigint, like ahash
                    sig -= 1 << 64
                ids.append(int(doc_id))
                hashes.append(sig)
            yield pd.DataFrame({id_col: ids, "dhash": hashes})

    return df.mapInPandas(batches, DHASH_SCHEMA)


# ----------------------------------------------------- audio fingerprint

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("audio_fp", T.LongType()),
    ]
)

_AFP_BLOCK = 16  # frames per energy block


def audio_fingerprint(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Energy-delta audio fingerprint (the Shazam-style primitive at
    its simplest): channel-0 samples are cut into 16-frame blocks,
    each block reduced to its integer energy (sum of squares), and
    bit j of the signature records whether block j+1's energy exceeds
    block j's.  Loudness-invariant by construction (monotone under
    gain applied uniformly) and exact-integer throughout, so the
    fingerprint is engine- and partitioning-identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nbs, fps = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                _, s = _parse_wav(bytes(payload))
                ch0 = s[:, 0].astype(np.int64)
                nb = len(ch0) // _AFP_BLOCK
                blocks = ch0[: nb * _AFP_BLOCK].reshape(nb, _AFP_BLOCK)
                energy = (blocks * blocks).sum(axis=1)
                sig = 0
                for j in range(nb - 1):
                    if energy[j + 1] > energy[j]:
                        sig |= 1 << j
                ids.append(int(doc_id))
                nbs.append(nb)
                fps.append(sig)
            yield pd.DataFrame(
                {id_col: ids, "n_blocks": nbs, "audio_fp": fps}
            )

    return df.mapInPandas(batches, AUDIO_FP_SCHEMA)


# ----------------------------------------------------------- scene cuts

SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_cuts", T.IntegerType()),
        T.StructField("max_frame_diff", T.LongType()),
    ]
)

_SCENE_CUT_THRESHOLD = 3000  # Σ|Δ| over the 8x8 grid that counts as a cut


def detect_scene_cuts(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Scene-cut detection over the multi-frame container: every frame
    reduces to the same 8x8 channel-0 grid the image hash uses, and a
    cut is declared where the L1 distance between CONSECUTIVE frame
    grids exceeds the threshold — the shot-boundary primitive video
    curation uses to pick representative frames.  Comparing on the
    fixed grid makes frames of different native geometries comparable
    and keeps the math exact-integer."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("id", "nf", "nc", "mx")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if b[:4] != b"VID0":
                    raise ValueError("not a VID0 container")
                n = struct.unpack_from("<I", b, 4)[0]
                pos, grids = 8, []
                for _f in range(n):
                    ln = struct.unpack_from("<I", b, pos)[0]
                    pos += 4
                    pix = _parse_bmp(b[pos : pos + ln]).astype(np.int64)
                    h, w, _c = pix.shape
                    ys = (np.arange(8) * h) // 8
                    xs = (np.arange(8) * w) // 8
                    grids.append(pix[np.ix_(ys, xs)][:, :, 0])
                    pos += ln
                diffs = [
                    int(np.abs(grids[j + 1] - grids[j]).sum())
                    for j in range(n - 1)
                ]
                out["id"].append(int(doc_id))
                out["nf"].append(n)
                out["nc"].append(
                    sum(1 for d in diffs if d > _SCENE_CUT_THRESHOLD)
                )
                out["mx"].append(max(diffs) if diffs else 0)
            yield pd.DataFrame(
                {
                    id_col: out["id"],
                    "n_frames": out["nf"],
                    "n_cuts": out["nc"],
                    "max_frame_diff": out["mx"],
                }
            )

    return df.mapInPandas(batches, SCENE_CUT_SCHEMA)


# ----------------------------------------------------------- audio VAD

VAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_active", T.IntegerType()),
        T.StructField("n_segments", T.IntegerType()),
        T.StructField("max_run", T.IntegerType()),
    ]
)


def audio_active_segments(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Energy-threshold voice-activity segmentation — the step an
    audio curation pipeline runs right after decode to cut a clip
    into keep-worthy segments: channel-0 energy per 16-frame block
    (same blocking as :func:`audio_fingerprint`), a block is ACTIVE
    when its energy strictly exceeds the clip's floor-mean block
    energy (gain-invariant: the threshold scales with the clip's own
    loudness, so re-gained copies segment identically; a perfectly
    UNIFORM clip has no block strictly above its own mean and reports
    zero segments), and consecutive active blocks merge into segments.
    Clips shorter than one block (``nb == 0``) emit the all-zero row
    rather than raising — a throwing kernel kills the whole
    task+retry cycle (same tolerance as :func:`audio_fingerprint`).
    Emits per clip: block count, active count, segment count, and the
    longest active run — all exact integers."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nbs, nas, nss, mrs = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                _, s = _parse_wav(bytes(payload))
                ch0 = s[:, 0].astype(np.int64)
                nb = len(ch0) // _AFP_BLOCK
                if nb == 0:
                    ids.append(int(doc_id))
                    nbs.append(0)
                    nas.append(0)
                    nss.append(0)
                    mrs.append(0)
                    continue
                blocks = ch0[: nb * _AFP_BLOCK].reshape(nb, _AFP_BLOCK)
                energy = (blocks * blocks).sum(axis=1)
                thr = int(energy.sum()) // nb
                act = energy > thr
                n_active = int(act.sum())
                n_segments = 0
                max_run = 0
                run = 0
                for a in act:
                    if a:
                        run += 1
                        if run == 1:
                            n_segments += 1
                        max_run = max(max_run, run)
                    else:
                        run = 0
                ids.append(int(doc_id))
                nbs.append(nb)
                nas.append(n_active)
                nss.append(n_segments)
                mrs.append(max_run)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_blocks": nbs,
                    "n_active": nas,
                    "n_segments": nss,
                    "max_run": mrs,
                }
            )

    return df.mapInPandas(batches, VAD_SCHEMA)


# ------------------------------------------------- decode quarantine

QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.IntegerType()),
        T.StructField("reason", T.StringType()),
        T.StructField("px_count", T.LongType()),
    ]
)


def decode_bmp_quarantine(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode with a QUARANTINE lane — the media twin of the CDC
    poison-message split (cdc/decode.py's DLQ): every payload either
    decodes (ok=1, exact pixel count) or lands in the quarantine lane
    (ok=0, reason) WITHOUT failing the batch.  A corrupt byte stream
    in a 100 TB media crawl is a certainty, and a kernel that throws
    kills the whole task+retry cycle; catching per-row keeps the
    pipeline flowing and the quarantine table queryable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, oks, reasons, pxs = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(doc_id))
                try:
                    arr = _parse_bmp(bytes(payload))
                    oks.append(1)
                    reasons.append(None)
                    pxs.append(int(arr.size))
                except Exception:  # noqa: BLE001 — quarantine, never raise
                    oks.append(0)
                    reasons.append("decode-error")
                    pxs.append(0)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "ok": oks,
                    "reason": reasons,
                    "px_count": pxs,
                }
            )

    return df.mapInPandas(batches, QUARANTINE_SCHEMA)
