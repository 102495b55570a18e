"""Multimodal plumbing tests (X5): binary columns, Arrow batch path,
frame-sampling fan-out, and the explicit codec stub."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "abc"), (1, "hello world"), (2, ""), (3, "aaaa")],
        "doc_id long, text string",
    )
    return MM.synth_media_from_documents(docs)


def test_binary_column_schema(media):
    dtypes = dict(media.dtypes)
    assert dtypes["content"] == "binary"
    assert dtypes["modality"] == "string"
    mods = {r["media_id"]: r["modality"] for r in media.collect()}
    assert mods == {0: "image", 1: "audio", 2: "video", 3: "image"}


def test_extract_features_byte_stats(media):
    out = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert out[0]["n_bytes"] == 3
    assert out[2]["n_bytes"] == 0 and out[2]["byte_entropy"] == 0.0
    # 'aaaa' -> single symbol -> zero entropy, mean == ord('a')
    assert out[3]["byte_entropy"] == 0.0
    assert math.isclose(out[3]["byte_mean"], 97.0)
    # 'hello world': entropy strictly positive
    assert out[1]["byte_entropy"] > 0


def test_frame_sampling_fanout(spark):
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(b"x"), ("video/mp4", None, None, 3500)),
            (2, "image", bytearray(b"y"), ("image/png", 8, 8, None)),
            (3, "video", bytearray(b"z"), ("video/mp4", None, None, None)),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = MM.sample_frames(media, every_ms=1000).collect()
    frames = {}
    for r in out:
        frames.setdefault(r["media_id"], []).append(r["frame_offset_ms"])
    assert sorted(frames[1]) == [0, 1000, 2000, 3000]
    assert frames[3] == [0]  # no duration -> single frame at t=0
    assert 2 not in frames  # images don't sample


def test_decode_media_rejects_garbage():
    # every modality raises ValueError on garbage (a real decoder
    # rejects, it doesn't fall through to fake), as does an unknown
    # modality name
    with pytest.raises(ValueError):
        MM.decode_media(b"bytes", "video")
    with pytest.raises(ValueError):
        MM.decode_media(b"bytes", "image")
    with pytest.raises(ValueError):
        MM.decode_media(b"bytes", "3d-pointcloud")


def test_codec_swap_point_composes(media, monkeypatch):
    """The swap-point contract: injecting a decoder (as a real build
    would swap decode_media) changes only the decoded values flowing
    into the features — same mapInPandas plan, same output schema, rows
    for every payload including empty ones."""

    def _fake_decoder(content: bytes, modality: str):
        # Stand-in codec: image → 2×2 'pixels', audio/video → a float
        # waveform — exactly the (bytes, modality) -> array contract
        # decode_media will satisfy when codec libraries exist. Nested so
        # cloudpickle ships it by VALUE to executor pythons (a test
        # module isn't importable there).
        import numpy as np

        raw = np.frombuffer(content, dtype=np.uint8)
        if modality == "image":
            px = np.resize(raw if raw.size else np.zeros(1, np.uint8), 4)
            return px.reshape(2, 2)
        return (raw.astype(np.float64) - 128.0) / 128.0

    monkeypatch.setattr(MM, "decode_media", _fake_decoder)
    out = {
        r["media_id"]: r
        for r in MM.extract_features(media, decoder=MM.decode_media).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    # schema is the stable FEATURE_SCHEMA regardless of decoder
    assert list(MM.extract_features(media, decoder=MM.decode_media).columns) == [
        "media_id", "modality", "n_bytes", "byte_mean", "byte_entropy",
    ]
    # image 'abc' decodes to 4 resized pixels (2x2), not 3 raw bytes
    assert out[0]["modality"] == "image" and out[0]["n_bytes"] == 4
    # audio 'hello world' decodes to a centered waveform: mean shifted
    # from the raw byte mean into [-1, 1]
    assert out[1]["modality"] == "audio" and -1.0 <= out[1]["byte_mean"] <= 1.0
    assert out[1]["n_bytes"] == 11
    # empty video payload still yields a row with zeroed stats
    assert out[2]["n_bytes"] == 0 and out[2]["byte_entropy"] == 0.0
    # without a decoder the raw-bytes path is unchanged
    raw = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert raw[0]["n_bytes"] == 3 and math.isclose(raw[3]["byte_mean"], 97.0)


def test_decode_media_real_wav_roundtrip():
    """The audio leg is a REAL decode: stdlib wave writer -> decode_media
    recovers exactly the sample bytes; 16-bit payloads come back int16;
    non-RIFF bytes are rejected."""
    import io
    import struct
    import wave as wavelib

    import numpy as np

    def make_wav(frames: bytes, width: int) -> bytes:
        buf = io.BytesIO()
        w = wavelib.open(buf, "wb")
        try:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(8000)
            w.writeframes(frames)
        finally:
            w.close()
        return buf.getvalue()

    payload = make_wav(b"hello wav", 1)
    assert payload[:4] == b"RIFF"
    got = MM.decode_media(payload, "audio")
    assert got.dtype == np.uint8 and bytes(got) == b"hello wav"

    samples16 = struct.pack("<4h", -32768, -1, 0, 32767)
    got16 = MM.decode_media(make_wav(samples16, 2), "audio")
    assert got16.dtype == np.int16 and list(got16) == [-32768, -1, 0, 32767]

    with pytest.raises(ValueError):
        MM.decode_media(b"not a riff payload at all........", "audio")


def test_synth_wav_documents_decode_to_text_bytes(spark):
    """End-to-end: synth real WAVs from documents, decode through the
    mapInPandas feature path, stats equal the text-byte stats and the
    metadata duration matches samples/rate."""
    docs = spark.createDataFrame(
        [(0, "abc"), (1, "hello world"), (2, "aaaa")],
        "doc_id long, text string",
    )
    media = MM.synth_wav_from_documents(docs, rate=8000)
    rows = {r["media_id"]: r for r in media.collect()}
    # real RIFF containers, 44-byte canonical header + one byte per char
    assert bytes(rows[0]["content"])[:4] == b"RIFF"
    assert len(rows[1]["content"]) == 44 + 11
    assert rows[1]["meta"]["mime"] == "audio/wav"
    assert rows[1]["meta"]["duration_ms"] == 11 * 1000 // 8000
    feats = {
        r["media_id"]: r
        for r in MM.extract_features(media, decoder=MM.decode_media).collect()
    }
    assert feats[0]["n_bytes"] == 3
    assert feats[2]["byte_entropy"] == 0.0 and math.isclose(feats[2]["byte_mean"], 97.0)
    assert feats[1]["n_bytes"] == 11 and feats[1]["byte_entropy"] > 0


def _make_png(pix: bytes, width: int, height: int, *, filt: int = 0,
              bit_depth: int = 8, color_type: int = 0) -> bytes:
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    raw = b"".join(
        bytes([filt]) + pix[r * width:(r + 1) * width] for r in range(height)
    )
    return (MM.PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_decode_media_real_png_roundtrip():
    import numpy as np

    pix = bytes(range(200)) * 3  # 600 bytes -> 3 rows of 200
    png = _make_png(pix, 200, 3)
    assert MM.png_info(png) == (200, 3, 8, 0)
    vals = MM.decode_media(png, "image")
    assert vals.dtype == np.uint8
    assert bytes(vals.tobytes()) == pix  # de-filter strips row filter bytes


def test_decode_media_png_rejects_unsupported():
    # color type 2 (truecolor) is SUPPORTED since r11 — the reject set
    # is now palette (3), gray+alpha (4), RGBA (6), odd bit depths
    png_rgba = _make_png(b"\x01\x02\x03\x04" * 4, 4, 1, color_type=6)
    with pytest.raises(ValueError, match="color types 0/2"):
        MM.decode_media(png_rgba, "image")
    png_pal = _make_png(bytes(4), 4, 1, color_type=3)
    with pytest.raises(ValueError, match="color types 0/2"):
        MM.decode_media(png_pal, "image")
    png_filt = _make_png(bytes(8), 4, 2, filt=1)
    with pytest.raises(ValueError, match="filter 0"):
        MM.decode_media(png_filt, "image")
    with pytest.raises(ValueError, match="not a PNG"):
        MM.png_info(b"GIF89a....")


def test_decode_media_truecolor_png_roundtrip():
    import numpy as np

    # 2x2 RGB image: scanlines are 3*width bytes, NOT width — the
    # stride bug this leg exists to pin
    pix = bytes(range(12))  # 4 pixels x 3 channels
    # build with correct truecolor stride: width=2, height=2 -> each
    # raw scanline is 6 bytes; _make_png slices by its width param, so
    # pass width=6 rows-of-bytes but patch the IHDR via real builder
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raw = b"\x00" + pix[:6] + b"\x00" + pix[6:]
    png = (MM.PNG_SIGNATURE + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert MM.png_info(png) == (2, 2, 8, 2)
    vals = MM.decode_media(png, "image")
    assert vals.dtype == np.uint8
    assert bytes(vals.tobytes()) == pix


def test_synth_rgb_png_documents_channel_means(spark):
    """End-to-end: synth writes REAL truecolor PNGs; extract_rgb_stats
    decodes them and the per-channel means equal the numpy stats of
    the raw text bytes split by position mod 3."""
    import numpy as np

    texts = [(1, "hello png rgb!"), (2, "aAbBcC" * 10), (3, "xy")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    media = MM.synth_rgb_png_from_documents(docs)
    rows = {r["media_id"]: r for r in MM.extract_rgb_stats(media).collect()}
    assert 3 not in rows  # 2-byte doc dropped (0-width image)
    for doc_id, text in texts[:2]:
        b = np.frombuffer(text.encode(), dtype=np.uint8)
        n = len(b) // 3
        b = b[: 3 * n].reshape(-1, 3)
        r = rows[doc_id]
        assert (r["width"], r["height"], r["color_type"]) == (n, 1, 2)
        assert r["n_pixels"] == n
        for col, ch in [("r_mean", 0), ("g_mean", 1), ("b_mean", 2)]:
            assert math.isclose(r[col], float(b[:, ch].mean()))
        want_luma = (0.299 * b[:, 0].mean() + 0.587 * b[:, 1].mean()
                     + 0.114 * b[:, 2].mean())
        assert math.isclose(r["luma_mean"], float(want_luma))


def test_synth_png_documents_decode_to_text_bytes(spark):
    """End-to-end: synth writes REAL PNGs; extract_image_stats decodes
    them and the stats equal the driver-side numpy stats of the raw
    text bytes — container framing is lossless."""
    import numpy as np

    docs = spark.createDataFrame(
        [(1, "hello png"), (2, "aAbB" * 25)], "doc_id long, text string"
    )
    media = MM.synth_png_from_documents(docs)
    rows = {r["media_id"]: r for r in MM.extract_image_stats(media).collect()}
    for doc_id, text in [(1, "hello png"), (2, "aAbB" * 25)]:
        b = np.frombuffer(text.encode(), dtype=np.uint8)
        r = rows[doc_id]
        assert (r["width"], r["height"], r["bit_depth"]) == (len(text), 1, 8)
        assert r["n_pixels"] == len(text)
        assert math.isclose(r["pixel_mean"], float(b.mean()))
        _, counts = np.unique(b, return_counts=True)
        p = counts / b.size
        assert math.isclose(r["pixel_entropy"], float(-(p * np.log2(p)).sum()))


def test_encode_gray8_png_roundtrip_2d():
    import numpy as np

    from cse_datapipeline_and_mls_spark.operators.multimodal import (
        decode_media,
        encode_gray8_png,
        png_info,
    )

    pix = np.arange(24, dtype=np.uint8).reshape(4, 6)
    payload = encode_gray8_png(pix, 6, 4)
    assert png_info(payload) == (6, 4, 8, 0)
    back = decode_media(payload, "image")
    assert (back.reshape(4, 6) == pix).all()


def test_resize_images_nearest_neighbor_2d(spark):
    # 4x6 gradient image -> 2x3: src index = floor(dst * in / out)
    import numpy as np

    from cse_datapipeline_and_mls_spark.operators import multimodal as MM

    pix = np.arange(24, dtype=np.uint8).reshape(4, 6)
    payload = MM.encode_gray8_png(pix, 6, 4)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))], "media_id long, modality string, content binary"
    )
    out = MM.resize_images(media, out_w=3, out_h=2).collect()
    assert len(out) == 1
    resized = MM.decode_media(bytes(out[0].content), "image").reshape(2, 3)
    rows = (np.arange(2) * 4) // 2   # [0, 2]
    cols = (np.arange(3) * 6) // 3   # [0, 2, 4]
    assert (resized == pix[np.ix_(rows, cols)]).all()
    assert out[0].meta.width == 3 and out[0].meta.height == 2


def test_resize_images_upsample(spark):
    import numpy as np

    from cse_datapipeline_and_mls_spark.operators import multimodal as MM

    pix = np.array([[10, 200]], dtype=np.uint8)
    payload = MM.encode_gray8_png(pix, 2, 1)
    media = spark.createDataFrame(
        [(7, "image", bytearray(payload))], "media_id long, modality string, content binary"
    )
    out = MM.resize_images(media, out_w=4, out_h=1).collect()
    resized = MM.decode_media(bytes(out[0].content), "image")
    # floor([0,1,2,3] * 2 / 4) = [0,0,1,1]
    assert list(resized) == [10, 10, 200, 200]


def test_resize_images_rejects_zero_width_png(spark):
    """A zero-pixel axis must be rejected with a descriptive error, not
    a numpy IndexError from sampling an empty axis (ADVICE r7)."""
    import numpy as np
    import pytest

    from cse_datapipeline_and_mls_spark.operators import multimodal as MM

    payload = MM.encode_gray8_png(np.zeros((1, 0), dtype=np.uint8), 0, 1)
    media = spark.createDataFrame(
        [(3, "image", bytearray(payload))], "media_id long, modality string, content binary"
    )
    with pytest.raises(Exception, match="empty pixel axis"):
        MM.resize_images(media, out_w=2, out_h=1).collect()


def test_audio_frame_rms_hand_computed(spark):
    import io
    import math
    import wave as wavelib

    from cse_datapipeline_and_mls_spark.operators import multimodal as MM

    # 250 samples: frames of 100 -> 2 full frames, 50 trailing dropped
    samples = bytes(range(100)) + bytes([200] * 100) + bytes([255] * 50)
    buf = io.BytesIO()
    w = wavelib.open(buf, "wb")
    w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
    w.writeframes(samples); w.close()
    media = spark.createDataFrame(
        [(3, "audio", bytearray(buf.getvalue()))],
        "media_id long, modality string, content binary",
    )
    rows = MM.audio_frame_rms(media, frame_samples=100).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 1]
    rms0 = math.sqrt(sum(i * i for i in range(100)) / 100.0)
    assert rows[0].rms == pytest.approx(rms0)
    assert rows[1].rms == pytest.approx(200.0)


def test_decode_media_real_y4m_roundtrip():
    """The video leg is a REAL decode: a hand-built YUV4MPEG2 stream
    (Cmono) comes back as exact (n_frames, w*h) luma planes; malformed
    headers, non-mono colorspaces, and truncated frames are rejected."""
    import numpy as np

    header = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 Cmono\n"
    f0, f1 = bytes(range(8)), bytes(range(100, 108))
    payload = header + b"FRAME\n" + f0 + b"FRAME\n" + f1
    assert MM.y4m_info(payload) == (4, 2, 25, 1, 2)
    got = MM.decode_media(payload, "video")
    assert got.dtype == np.uint8 and got.shape == (2, 8)
    assert bytes(got[0]) == f0 and bytes(got[1]) == f1

    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        MM.decode_media(b"RIFF....WAVE", "video")
    with pytest.raises(ValueError, match="only Cmono"):
        MM.y4m_info(b"YUV4MPEG2 W4 H2 F25:1 C420jpeg\n")
    with pytest.raises(ValueError, match="only Cmono"):
        # C absent -> the Y4M default 420jpeg, still rejected
        MM.y4m_info(b"YUV4MPEG2 W4 H2 F25:1\n")
    with pytest.raises(ValueError, match="truncated frame"):
        MM.y4m_info(header + b"FRAME\n" + f0[:5])
    with pytest.raises(ValueError, match="expected FRAME"):
        MM.y4m_info(header + b"GARBAGE\n" + f0)
    with pytest.raises(ValueError, match="missing W/H/F"):
        MM.y4m_info(b"YUV4MPEG2 W4 H2 Cmono\n")


def test_synth_y4m_documents_decode_to_text_bytes(spark):
    """synth -> decode round trip over Spark: frames are exactly the
    doc's first floor(n/16)*16 bytes; duration metadata matches the
    fps math; the partial trailing frame is dropped."""
    docs = spark.createDataFrame(
        [(1, "a" * 16 + "b" * 16 + "cut"), (2, "short")], "doc_id long, text string"
    )
    media = MM.synth_y4m_from_documents(docs, frame_w=8, frame_h=2, fps=25)
    rows = {r.media_id: r for r in media.collect()}
    got = MM.decode_media(bytes(rows[1].content), "video")
    assert got.shape == (2, 16)
    assert bytes(got[0]) == b"a" * 16 and bytes(got[1]) == b"b" * 16
    assert rows[1].meta.duration_ms == 80  # 2 frames @ 25 fps
    assert rows[1].meta.width == 8 and rows[1].meta.height == 2
    # 5 bytes < one 16-byte frame -> a valid zero-frame stream
    assert MM.decode_media(bytes(rows[2].content), "video").shape == (0, 16)
    assert rows[2].meta.duration_ms == 0


def test_extract_video_stats_and_frame_means(spark):
    import math

    docs = spark.createDataFrame(
        [(7, "\x01\x03" * 8 + "\x05" * 16 + "xx")], "doc_id long, text string"
    )
    media = MM.synth_y4m_from_documents(docs, frame_w=4, frame_h=4, fps=10)
    stats = MM.extract_video_stats(media).collect()
    assert len(stats) == 1
    s = stats[0]
    assert (s.width, s.height, s.n_frames, s.duration_ms) == (4, 4, 2, 200)
    assert s.n_pixels == 32 and math.isclose(s.pixel_mean, (8 * 1 + 8 * 3 + 16 * 5) / 32)
    # three symbols at p = 1/4, 1/4, 1/2
    assert math.isclose(s.pixel_entropy, 0.25 * 2 + 0.25 * 2 + 0.5 * 1)
    means = {r.frame_idx: r.frame_mean for r in MM.video_frame_means(media).collect()}
    assert means == {0: 2.0, 1: 5.0}


def test_y4m_roundtrip_property(spark):
    """Property-style sweep: for random byte payloads and frame
    geometries, synth -> decode recovers exactly the first
    floor(n/(w*h)) frames of the payload and y4m_info agrees."""
    import random

    import numpy as np

    rng = random.Random(42)
    cases = []
    for _ in range(12):
        w, h = rng.randint(1, 9), rng.randint(1, 5)
        n = rng.randint(0, 6 * w * h + 3)
        payload_text = "".join(chr(rng.randint(32, 126)) for _ in range(n))
        cases.append((w, h, payload_text))
    for i, (w, h, text) in enumerate(cases):
        docs = spark.createDataFrame([(i, text)], "doc_id long, text string")
        media = MM.synth_y4m_from_documents(docs, frame_w=w, frame_h=h, fps=10)
        payload = bytes(media.collect()[0].content)
        fsz = w * h
        expect_frames = len(text.encode()) // fsz
        got_w, got_h, fn, fd, n_frames = MM.y4m_info(payload)
        assert (got_w, got_h, fn, fd, n_frames) == (w, h, 10, 1, expect_frames)
        decoded = MM.decode_media(payload, "video")
        assert decoded.shape == (expect_frames, fsz)
        if expect_frames:
            flat = np.asarray(decoded).ravel().tobytes()
            assert flat == text.encode()[: expect_frames * fsz]
