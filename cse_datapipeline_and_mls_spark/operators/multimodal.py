"""Multimodal column plumbing (north-star X5).

Image/audio/video payloads are opaque ``binary`` columns plus a typed
metadata struct. The Spark-side plumbing — schema, partitioning, Arrow
batch shape through ``mapInPandas`` — is real and tested. The codec
step is real for all three modalities (stdlib only, no third-party
libs): ``audio`` parses RIFF/WAVE containers via ``wave``, ``image``
decodes grayscale-8 PNGs via ``struct``/``zlib`` (signature, chunk
walk, IHDR, inflate, de-filter), and ``video`` parses uncompressed
YUV4MPEG2 (Y4M) streams — ASCII stream header, per-picture FRAME
markers, luma-only (``Cmono``) planes.

Scale posture: binary payloads ride the normal columnar path (parquet
binary + Arrow), so a 100 TB media table scans/partitions like any other
table; per-batch Python cost is amortized by Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``), and decode/resize
parallelism is the scan parallelism — no shuffle anywhere in the media
pipeline until an explicit aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
    ]
)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: each document's UTF-8 bytes stand in
    for an opaque payload. Gives tests a real binary column with real
    Arrow transfer without any codec dependency."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            # deterministic fake duration for videos (100 ms per char) so
            # the frame-sampling fan-out has real metadata to explode on
            F.when(
                F.col("doc_id") % 3 == 2, (F.length("text") * 100).cast("long")
            ).alias("duration_ms"),
        ).alias("meta"),
    )


def synth_wav_from_documents(docs: DataFrame, rate: int = 8000) -> DataFrame:
    """REAL RIFF/WAVE payloads: each document's UTF-8 bytes become the
    8-bit PCM sample stream of a genuine mono WAV file (stdlib ``wave``
    writer, 44-byte canonical header), so the audio decode path
    exercises real container parsing while the decoded sample stats
    stay SQL-replayable — the samples ARE the text bytes (VERDICT r5
    #5's oracle trick). Synthesis runs in the same Arrow-batched
    ``mapInPandas`` shape the ingest path uses; ``duration_ms`` in the
    metadata is derived JVM-side from the payload length."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as wavelib

        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                buf = io.BytesIO()
                w = wavelib.open(buf, "wb")
                try:
                    w.setnchannels(1)
                    w.setsampwidth(1)  # 8-bit unsigned PCM: samples == bytes
                    w.setframerate(rate)
                    w.writeframes(text.encode("utf-8"))
                finally:
                    w.close()
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "audio",
                    "content": payloads,
                }
            )

    raw = docs.select("doc_id", "text").mapInPandas(
        op, schema="media_id long, modality string, content binary"
    )
    n_samples = F.octet_length("content") - F.lit(_WAV_HEADER_BYTES)
    return raw.withColumn(
        "meta",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.floor(n_samples * 1000 / rate).cast("long").alias("duration_ms"),
        ),
    )


# Canonical PCM WAV header written by the stdlib wave module:
# RIFF chunk descriptor (12) + fmt subchunk (24) + data header (8).
_WAV_HEADER_BYTES = 44

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def synth_png_from_documents(docs: DataFrame) -> DataFrame:
    """REAL PNG payloads (VERDICT r6 #5, the image twin of
    ``synth_wav_from_documents``): each document's UTF-8 bytes become
    the single pixel row of a genuine 8-bit grayscale PNG — width =
    byte count, height 1, filter byte 0, zlib-compressed IDAT,
    CRC-correct chunks — written with stdlib ``struct``/``zlib`` only.
    Because the pixels ARE the text bytes, post-decode statistics
    replay exactly in SQL over the text column, while the payload walks
    a real container format (signature, chunk framing, CRCs, inflate).
    Same Arrow-batched ``mapInPandas`` shape as the ingest path."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                pix = text.encode("utf-8")
                ihdr = struct.pack(">IIBBBBB", len(pix), 1, 8, 0, 0, 0, 0)
                idat = zlib.compress(b"\x00" + pix)  # filter 0 + scanline
                payloads.append(
                    PNG_SIGNATURE
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", idat)
                    + chunk(b"IEND", b"")
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "image",
                    "content": payloads,
                }
            )

    raw = docs.select("doc_id", "text").mapInPandas(
        op, schema="media_id long, modality string, content binary"
    )
    # width/height stay NULL in the synth metadata on purpose: the
    # decode path (png_info) is the source of truth the queries pin
    return raw.withColumn(
        "meta",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def synth_rgb_png_from_documents(docs: DataFrame) -> DataFrame:
    """Truecolor twin of :func:`synth_png_from_documents` (VERDICT r10
    item 9): each document's UTF-8 bytes, TRUNCATED to a multiple of 3,
    become the interleaved R,G,B samples of a genuine 8-bit truecolor
    PNG (color type 2) — width = byte_count // 3, height 1, filter 0,
    zlib IDAT, CRC-correct chunks, stdlib only. Byte i of the text is
    channel i % 3 of pixel i // 3, so per-channel statistics replay
    exactly in SQL over the text column. Documents shorter than 3
    bytes are dropped (a 0-width PNG is not a valid image); the SQL
    twin applies the same ``length(text) >= 3`` filter."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        for pdf in batches:
            ids, payloads = [], []
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    # same drop as <3-byte docs; the SQL twin's
                    # length(text) >= 3 filter drops NULL identically
                    continue
                pix = text.encode("utf-8")
                w = len(pix) // 3
                if w == 0:
                    continue
                pix = pix[: 3 * w]
                ihdr = struct.pack(">IIBBBBB", w, 1, 8, 2, 0, 0, 0)
                idat = zlib.compress(b"\x00" + pix)  # filter 0 + scanline
                ids.append(int(mid))
                payloads.append(
                    PNG_SIGNATURE
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", idat)
                    + chunk(b"IEND", b"")
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "modality": "image",
                    "content": payloads,
                }
            )

    raw = docs.select("doc_id", "text").mapInPandas(
        op, schema="media_id long, modality string, content binary"
    )
    return raw.withColumn(
        "meta",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


RGB_STATS_SCHEMA = (
    "media_id long, width int, height int, color_type int, n_pixels long, "
    "r_mean double, g_mean double, b_mean double, luma_mean double"
)


def extract_rgb_stats(media: DataFrame, decoder=None) -> DataFrame:
    """Per-channel statistics for truecolor payloads in ONE
    ``mapInPandas`` pass: IHDR fields plus post-decode R/G/B channel
    means and the Rec.601 luma mean (0.299 R + 0.587 G + 0.114 B of
    the channel means — exact double arithmetic of three exact-int
    ratios). Same injection contract as :func:`extract_image_stats`
    (``decoder`` defaults to :func:`decode_media`). Map-only plan:
    scan parallelism is the decode parallelism, zero shuffles."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        dec = decoder or decode_media
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)
                width, height, _, color_type = png_info(payload)
                if color_type != 2:
                    raise ValueError(
                        f"extract_rgb_stats: expected truecolor (color "
                        f"type 2), got {color_type}"
                    )
                vals = np.asarray(dec(payload, "image")).reshape(-1, 3)
                # channel sums are exact int64; each mean is ONE IEEE
                # division, so the stats hash-replay from SQL
                sums = vals.astype(np.int64).sum(axis=0)
                n = vals.shape[0]
                r, g, b = (float(s) / n for s in sums)
                out.append(
                    (
                        int(mid), width, height, int(color_type), int(n),
                        r, g, b, 0.299 * r + 0.587 * g + 0.114 * b,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "color_type",
                    "n_pixels", "r_mean", "g_mean", "b_mean", "luma_mean",
                ],
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        op, schema=RGB_STATS_SCHEMA
    )


def png_info(content: bytes) -> tuple[int, int, int, int]:
    """Parse a PNG IHDR with stdlib ``struct``: returns (width, height,
    bit_depth, color_type). Raises ValueError on a non-PNG payload or a
    malformed/missing IHDR — a decoder must reject, not guess."""
    import struct

    payload = bytes(content)
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("png_info: not a PNG payload")
    if payload[12:16] != b"IHDR" or len(payload) < 33:
        raise ValueError("png_info: IHDR is not the first chunk")
    width, height, bit_depth, color_type = struct.unpack(">IIBB", payload[16:26])
    return width, height, bit_depth, color_type


def decode_media(content: bytes, modality: str):
    """Codec step behind the swap point.

    ``audio`` is REAL: RIFF/WAVE containers are parsed with the stdlib
    ``wave`` module (header walk + PCM frame read — no third-party
    codec), returning the sample stream as uint8 (8-bit) or int16
    (16-bit). Anything that is not a RIFF payload raises ValueError —
    a decoder must reject, not guess.

    ``image`` is REAL for PNG (grayscale-8, non-interlaced, filter 0 —
    what ``synth_png_from_documents`` writes): signature check, chunk
    walk, IHDR parse, IDAT concatenation, ``zlib`` inflate, and
    per-scanline de-filter, all stdlib; returns the pixel stream as
    uint8. Other color types / bit depths / filters raise — a partial
    decoder that guessed would corrupt silently.

    ``video`` is REAL for uncompressed YUV4MPEG2 (Y4M, ``Cmono``
    luma-only — what ``synth_y4m_from_documents`` writes): stream
    header parse, per-picture FRAME-marker walk, plane slicing, all
    stdlib; returns the frames as a (n_frames, width*height) uint8
    array. Non-Y4M payloads, non-mono colorspaces, and truncated
    frames raise ValueError — a decoder must reject, not guess.
    Swapping in a codec library for compressed formats changes no
    plumbing (bytes in, array out), which the fake-codec contract
    test asserts by injecting a stand-in decoder."""
    if modality == "image":
        import struct
        import zlib

        import numpy as np

        payload = bytes(content)
        width, height, bit_depth, color_type = png_info(payload)
        if bit_depth != 8 or color_type not in (0, 2):
            raise ValueError(
                f"decode_media(image): only grayscale-8 or truecolor-8 "
                f"(color types 0/2) PNG supported "
                f"(got bit_depth={bit_depth}, color_type={color_type})"
            )
        channels = 3 if color_type == 2 else 1
        pos, idat = 8, b""
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += payload[pos + 8 : pos + 8 + ln]
            elif tag == b"IHDR":
                (interlace,) = struct.unpack(">B", payload[pos + 20 : pos + 21])
                if interlace != 0:
                    raise ValueError("decode_media(image): interlaced PNG unsupported")
            elif tag == b"IEND":
                break
            pos += 12 + ln
        raw = zlib.decompress(idat)
        stride = channels * width + 1
        if len(raw) != height * stride:
            raise ValueError("decode_media(image): scanline size mismatch")
        rows = []
        for r in range(height):
            line = raw[r * stride : (r + 1) * stride]
            if line[0] != 0:
                raise ValueError(
                    f"decode_media(image): only filter 0 supported (got {line[0]})"
                )
            rows.append(np.frombuffer(line, dtype=np.uint8)[1:])
        if not rows:
            return np.zeros(0, dtype=np.uint8)
        return np.concatenate(rows)
    if modality == "audio":
        import io
        import wave as wavelib

        import numpy as np

        payload = bytes(content)
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("decode_media(audio): not a RIFF/WAVE payload")
        w = wavelib.open(io.BytesIO(payload), "rb")
        try:
            frames = w.readframes(w.getnframes())
            width = w.getsampwidth()
        finally:
            w.close()
        if width not in (1, 2):
            raise ValueError(f"decode_media(audio): unsupported sample width {width}")
        return np.frombuffer(frames, dtype=np.uint8 if width == 1 else np.int16)
    if modality == "video":
        import numpy as np

        payload = bytes(content)
        width, height, _, _, n_frames = y4m_info(payload)
        fsz = width * height
        out = np.zeros((n_frames, fsz), dtype=np.uint8)
        pos = payload.find(b"\n", 10) + 1
        for f in range(n_frames):
            fnl = payload.find(b"\n", pos + 5)
            out[f] = np.frombuffer(payload[fnl + 1 : fnl + 1 + fsz], dtype=np.uint8)
            pos = fnl + 1 + fsz
        return out
    raise ValueError(f"decode_media: unsupported modality {modality!r}")


def extract_features(
    media: DataFrame,
    decoder=None,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Per-payload feature extraction via ``mapInPandas`` — the Arrow
    batch path a real decoder would use (bytes → decode → embed).

    ``decoder`` is the codec swap point: a ``(bytes, modality) -> array``
    callable (``decode_media`` once codec libs exist). With a decoder the
    stats run over the DECODED sample values (``n_bytes`` becomes the
    decoded sample count); without one they run over the raw payload
    bytes. Either way the batch shape, output schema, and zero-shuffle
    map-only plan are identical — swapping in a real codec changes no
    Spark-side plumbing, which is exactly what the swap-point test
    asserts by injecting a fake decoder."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, modality, content in zip(pdf["media_id"], pdf["modality"], pdf["content"]):
                if decoder is None:
                    vals = np.frombuffer(content, dtype=np.uint8)
                else:
                    vals = np.asarray(decoder(bytes(content), modality)).ravel()
                if vals.size:
                    _, counts = np.unique(vals, return_counts=True)
                    p = counts / vals.size
                    entropy = float(-(p * np.log2(p)).sum())
                    mean = float(vals.mean())
                else:
                    entropy, mean = 0.0, 0.0
                out.append((int(mid), modality, int(vals.size), mean, entropy))
            yield pd.DataFrame(
                out, columns=["media_id", "modality", "n_bytes", "byte_mean", "byte_entropy"]
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("pixel_mean", T.DoubleType()),
        T.StructField("pixel_entropy", T.DoubleType()),
    ]
)


def extract_image_stats(media: DataFrame, decoder=None) -> DataFrame:
    """Decode-side image statistics in ONE ``mapInPandas`` pass: IHDR
    header fields (``png_info``) plus post-decode pixel stats (count,
    mean, Shannon entropy) per payload — header parse and full decode
    pinned by the same output row, no second pass / no join back to the
    (re-derivable) media frame. ``decoder`` defaults to
    :func:`decode_media`; injecting a fake decoder exercises the
    contract without the codec, same as ``extract_features``. Map-only
    plan: scan parallelism is the decode parallelism, zero shuffles."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        dec = decoder or decode_media
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)
                width, height, bit_depth, _ = png_info(payload)
                vals = np.asarray(dec(payload, "image")).ravel()
                if vals.size:
                    _, counts = np.unique(vals, return_counts=True)
                    p = counts / vals.size
                    entropy = float(-(p * np.log2(p)).sum())
                    mean = float(vals.mean())
                else:
                    entropy, mean = 0.0, 0.0
                out.append(
                    (int(mid), width, height, bit_depth, int(vals.size), mean, entropy)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "bit_depth",
                    "n_pixels", "pixel_mean", "pixel_entropy",
                ],
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        op, schema=IMAGE_STATS_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video: one output row per sampled
    offset. Offsets come from the metadata duration (a real build would
    seek-decode at each offset via ``decode_media``); payload-less rows
    are produced for media without duration. Pure built-in explode — the
    fan-out happens JVM-side."""
    offsets = F.sequence(
        F.lit(0),
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
        F.lit(every_ms),
    )
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(offsets).alias("frame_offset_ms"),
    )


def encode_gray8_png(pixels, width: int, height: int) -> bytes:
    """Encode a uint8 pixel stream (row-major, ``height`` filter-0
    scanlines of ``width``) as a genuine grayscale-8 PNG with stdlib
    ``struct``/``zlib`` — signature, CRC-correct IHDR/IDAT/IEND. The
    inverse of ``decode_media('image')`` (round-trip asserted in
    tests); also the encoder the resize leg re-emits through, so a
    resized payload walks the full container format again."""
    import struct
    import zlib

    import numpy as np

    pix = np.asarray(pixels, dtype=np.uint8).reshape(height, width)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + pix[r].tobytes() for r in range(height))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_images(
    media: DataFrame,
    out_w: int,
    out_h: int = 1,
    decoder=None,
) -> DataFrame:
    """Nearest-neighbor image resize — the feature-extraction
    pre-processing step (thumbnail / fixed-input-size normalization)
    run as a REAL decode → resample → re-encode round trip: each PNG
    payload is decoded (``decode_media``), sampled at
    ``src = floor(dst * in / out)`` per axis (the exactly-replayable
    nearest-neighbor convention — pure integer index math, no
    filtering kernel, so an oracle can recompute every output pixel),
    and re-emitted as a genuine grayscale-8 PNG of (out_w, out_h) via
    :func:`encode_gray8_png`, metadata updated to match.

    Scale: one Arrow-batched ``mapInPandas`` — map-only, zero
    shuffles; decode/resize parallelism IS the scan parallelism, and
    output rows carry the (smaller) resized payload, so the stage
    SHRINKS the data — exactly what you want before shipping features
    to a shuffle. Works for down- and up-sampling (duplicate source
    indices)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        dec = decoder or decode_media
        for pdf in batches:
            ids, payloads = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)
                in_w, in_h, _, _ = png_info(payload)
                if in_w < 1 or in_h < 1:
                    # a decoder must reject, not guess: a zero-pixel
                    # axis has no nearest neighbor to sample
                    raise ValueError(
                        f"resize_images: media_id={int(mid)} has empty "
                        f"pixel axis (width={in_w}, height={in_h})"
                    )
                vals = np.asarray(dec(payload, "image")).reshape(in_h, in_w)
                rows = (np.arange(out_h) * in_h) // out_h
                cols = (np.arange(out_w) * in_w) // out_w
                resized = vals[np.ix_(rows, cols)]
                ids.append(int(mid))
                payloads.append(encode_gray8_png(resized, out_w, out_h))
            yield pd.DataFrame(
                {"media_id": ids, "modality": "image", "content": payloads}
            )

    raw = media.filter(F.col("modality") == "image").mapInPandas(
        op, schema="media_id long, modality string, content binary"
    )
    return raw.withColumn(
        "meta",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(out_w).cast("int").alias("width"),
            F.lit(out_h).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_frame_rms(
    media: DataFrame, frame_samples: int = 100, decoder=None
) -> DataFrame:
    """Frame-level audio energy — the frame-sampling pattern for AUDIO
    (the energy/VAD feature every audio pipeline computes first): each
    payload is decoded (real RIFF/WAVE parse via ``decode_media``),
    the sample stream is cut into non-overlapping ``frame_samples``
    frames (trailing partial frame dropped — fixed-size frames keep
    the feature matrix rectangular), and each frame emits its RMS.

    Determinism: the per-frame sum of squares is computed in EXACT
    int64 (bounded by frame_samples·255² « 2^53 for 8-bit PCM), so the
    only float op is the final sqrt(sumsq/n) — bit-identical to a SQL
    replay regardless of summation order (numpy's pairwise mean would
    NOT be). Scale: one map-only Arrow-batched pass; the fan-out to
    frames happens inside the batch, output rows are 4 scalars each."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        dec = decoder or decode_media
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                vals = np.asarray(dec(bytes(content), "audio")).ravel()
                n_full = vals.size // frame_samples
                if n_full == 0:
                    continue
                frames = (
                    vals[: n_full * frame_samples]
                    .astype(np.int64)
                    .reshape(n_full, frame_samples)
                )
                sumsq = (frames * frames).sum(axis=1)  # exact int64
                for f in range(n_full):
                    out.append(
                        (
                            int(mid),
                            f,
                            frame_samples,
                            math.sqrt(sumsq[f] / float(frame_samples)),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "n_samples", "rms"]
            )

    return media.filter(F.col("modality") == "audio").mapInPandas(
        op, schema=AUDIO_FRAME_SCHEMA
    )


Y4M_SIGNATURE = b"YUV4MPEG2 "


def synth_y4m_from_documents(
    docs: DataFrame, frame_w: int = 8, frame_h: int = 2, fps: int = 25
) -> DataFrame:
    """REAL YUV4MPEG2 (Y4M) payloads — the video twin of
    ``synth_wav_from_documents`` / ``synth_png_from_documents``
    (VERDICT r7 #2): each document's UTF-8 bytes become the luma
    planes of a genuine uncompressed Y4M stream — ASCII stream header
    (``YUV4MPEG2 W.. H.. F..:1 Ip A1:1 Cmono``), one ``FRAME`` marker
    per picture, ``frame_w*frame_h`` Y-plane bytes each (``Cmono`` =
    luma-only, the container's grayscale colorspace, matching the
    gray8 PNG leg). The trailing partial frame is dropped (fixed-size
    pictures — same rectangularity rationale as ``audio_frame_rms``),
    so a doc of n bytes yields floor(n / (w*h)) frames and the decoded
    pixel stream is EXACTLY the doc's first n_frames*w*h bytes —
    SQL-replayable end to end like the WAV/PNG legs.

    Same Arrow-batched ``mapInPandas`` shape as the other synths;
    ``duration_ms`` = n_frames * 1000 / fps is derived JVM-side."""
    if frame_w < 1 or frame_h < 1 or fps < 1:
        raise ValueError("synth_y4m_from_documents: frame_w/frame_h/fps must be >= 1")
    fsz = frame_w * frame_h
    header = f"YUV4MPEG2 W{frame_w} H{frame_h} F{fps}:1 Ip A1:1 Cmono\n".encode()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                pix = text.encode("utf-8")
                n_frames = len(pix) // fsz
                parts = [header]
                for f in range(n_frames):
                    parts.append(b"FRAME\n")
                    parts.append(pix[f * fsz : (f + 1) * fsz])
                payloads.append(b"".join(parts))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "video",
                    "content": payloads,
                }
            )

    raw = docs.select("doc_id", "text").mapInPandas(
        op, schema="media_id long, modality string, content binary"
    )
    return raw.withColumn(
        "meta",
        F.struct(
            F.lit("video/x-yuv4mpeg").alias("mime"),
            F.lit(frame_w).cast("int").alias("width"),
            F.lit(frame_h).cast("int").alias("height"),
            (
                F.floor(
                    (F.length("content") - F.lit(len(header)))
                    / (fsz + 6)  # per frame: 'FRAME\n' + fsz luma bytes
                    * 1000
                    / fps
                )
            ).cast("long").alias("duration_ms"),
        ),
    )


def y4m_info(content: bytes) -> tuple[int, int, int, int, int]:
    """Parse a YUV4MPEG2 stream header + frame walk with stdlib only:
    returns (width, height, fps_num, fps_den, n_frames). Accepts only
    ``Cmono`` (luma-only) streams — for 4:2:0/4:2:2 the plane math
    differs and a guess would mis-slice every frame; raises ValueError
    on a non-Y4M payload, a malformed header, an unsupported
    colorspace, or a truncated frame — a decoder must reject, not
    guess."""
    payload = bytes(content)
    if payload[:10] != Y4M_SIGNATURE:
        raise ValueError("y4m_info: not a YUV4MPEG2 payload")
    nl = payload.find(b"\n", 10)
    if nl < 0:
        raise ValueError("y4m_info: unterminated stream header")
    width = height = fps_num = fps_den = None
    colorspace = "420jpeg"  # the Y4M default when C is absent
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif key == b"C":
            colorspace = val.decode("ascii", "replace")
    if not width or not height or not fps_num or not fps_den:
        raise ValueError("y4m_info: header missing W/H/F parameters")
    if colorspace != "mono":
        raise ValueError(
            f"y4m_info: only Cmono (luma-only) supported (got C{colorspace})"
        )
    fsz = width * height
    pos, n_frames = nl + 1, 0
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m_info: expected FRAME marker")
        fnl = payload.find(b"\n", pos + 5)
        if fnl < 0:
            raise ValueError("y4m_info: unterminated FRAME header")
        if fnl + 1 + fsz > len(payload):
            raise ValueError("y4m_info: truncated frame payload")
        pos = fnl + 1 + fsz
        n_frames += 1
    return width, height, fps_num, fps_den, n_frames


VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("pixel_mean", T.DoubleType()),
        T.StructField("pixel_entropy", T.DoubleType()),
    ]
)


def extract_video_stats(media: DataFrame, decoder=None) -> DataFrame:
    """Decode-side video statistics in ONE ``mapInPandas`` pass — the
    video twin of ``extract_image_stats``: stream-header fields
    (``y4m_info``: geometry, frame count, fps-derived duration) plus
    post-decode luma stats (pixel count, mean, Shannon entropy) over
    ALL frames, per payload. Header walk and full decode are pinned by
    the same output row. Map-only plan: decode parallelism is the scan
    parallelism, zero shuffles."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        dec = decoder or decode_media
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)
                width, height, fps_num, fps_den, n_frames = y4m_info(payload)
                vals = np.asarray(dec(payload, "video")).ravel()
                if vals.size:
                    _, counts = np.unique(vals, return_counts=True)
                    p = counts / vals.size
                    entropy = float(-(p * np.log2(p)).sum())
                    mean = float(vals.mean())
                else:
                    entropy, mean = 0.0, 0.0
                duration_ms = n_frames * 1000 * fps_den // fps_num
                out.append(
                    (
                        int(mid), width, height, int(n_frames),
                        int(duration_ms), int(vals.size), mean, entropy,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "n_frames",
                    "duration_ms", "n_pixels", "pixel_mean", "pixel_entropy",
                ],
            )

    return media.filter(F.col("modality") == "video").mapInPandas(
        op, schema=VIDEO_STATS_SCHEMA
    )


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def video_frame_means(media: DataFrame, decoder=None) -> DataFrame:
    """Per-frame mean luma — the frame-sampling pattern for VIDEO (the
    brightness curve shot-boundary detection thresholds): each payload
    is decoded (real Y4M parse via ``decode_media``) and every frame
    emits its mean pixel value.

    Determinism: the per-frame pixel sum is computed in EXACT int64
    (≤ w*h*255 « 2^53), so the only float op is the final sum/n
    division — bit-identical to a SQL replay regardless of summation
    order (same contract as ``audio_frame_rms``). Scale: one map-only
    Arrow-batched pass; the frame fan-out happens inside the batch."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        dec = decoder or decode_media
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames = np.asarray(dec(bytes(content), "video"))
                if frames.size == 0:
                    continue
                n_frames, fsz = frames.shape
                sums = frames.astype(np.int64).sum(axis=1)  # exact int64
                for f in range(n_frames):
                    out.append((int(mid), f, fsz, sums[f] / float(fsz)))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "n_pixels", "frame_mean"]
            )

    return media.filter(F.col("modality") == "video").mapInPandas(
        op, schema=VIDEO_FRAME_SCHEMA
    )
