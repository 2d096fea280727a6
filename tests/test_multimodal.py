"""Multimodal plumbing: binary payload column, Arrow-batched extraction,
real stdlib codecs (PPM/BMP/WAV) + explicit compressed-format boundary."""

from __future__ import annotations

import hashlib

import pytest

from kafkastreamingetl_spark.operators.multimodal import (
    _fake_decode,
    decode_image,
    extract_features,
    resize_payloads,
    sample_frames,
    with_binary_payload,
)


def test_jpeg_is_the_remaining_explicit_boundary():
    """JPEG needs a DCT codec this container lacks — the boundary is an
    explicit NotImplementedError, not a silent None. PNG left this club
    in round 14 (stdlib zlib decode); a PNG signature over garbage now
    parses-and-fails to None like any other corrupt payload."""
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    assert decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32) is None


# ---------------------------------------------------------------------------
# Real stdlib codecs (round 13): PPM / BMP / WAV on planted payloads
# ---------------------------------------------------------------------------


def _ppm(width, height, pixels, comment=False):
    head = b"P6\n"
    if comment:
        head += b"# planted comment\n"
    head += b"%d %d\n255\n" % (width, height)
    return head + bytes(pixels)


def _bmp24(width, height, rows_top_down):
    """24-bit BI_RGB BMP, BOTTOM-UP storage (positive height), from
    top-down (r, g, b) row lists — the orientation trap decode must undo."""
    import struct

    stride = (width * 3 + 3) & ~3
    body = b""
    for row in reversed(rows_top_down):  # file stores bottom row first
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR
        body += line + b"\x00" * (stride - len(line))
    pixel_offset = 14 + 40
    size = pixel_offset + len(body)
    return (
        b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_offset)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
        + body
    )


def _wav16(sample_rate, samples):
    import struct

    data = struct.pack("<%dh" % len(samples), *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_ppm_decode_known_pixels():
    # 2x2: red, green / blue, white — with a header comment
    px = [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    d = decode_image(_ppm(2, 2, px, comment=True))
    assert (d["format"], d["width"], d["height"]) == ("ppm", 2, 2)
    assert d["px00"] == (255, 0, 0)
    assert abs(d["mean_r"] - (255 + 255) / 4) < 1e-9
    assert abs(d["mean_g"] - (255 + 255) / 4) < 1e-9
    assert abs(d["mean_b"] - (255 + 255) / 4) < 1e-9


def test_ppm_truncated_pixels_returns_none():
    assert decode_image(_ppm(4, 4, [0] * 10)) is None
    assert decode_image(b"P6\n0 2\n255\n") is None


def test_bmp_decode_undoes_bottom_up_and_bgr():
    # 3x2 top-down rows; stride padding exercised (3*3=9 -> 12 bytes/row)
    top = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    bottom = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    d = decode_image(_bmp24(3, 2, [top, bottom]))
    assert (d["format"], d["width"], d["height"]) == ("bmp", 3, 2)
    # px00 must be the TOP-LEFT pixel in RGB despite bottom-up BGR storage
    assert d["px00"] == (255, 0, 0)
    assert abs(d["mean_r"] - (255 + 10 + 40 + 70) / 6) < 1e-9
    assert abs(d["mean_b"] - (255 + 30 + 60 + 90) / 6) < 1e-9


def test_bmp_compressed_or_wrong_depth_returns_none():
    import struct

    raw = bytearray(_bmp24(2, 2, [[(0, 0, 0)] * 2] * 2))
    struct.pack_into("<H", raw, 28, 8)  # biBitCount = 8
    assert decode_image(bytes(raw)) is None
    raw = bytearray(_bmp24(2, 2, [[(0, 0, 0)] * 2] * 2))
    struct.pack_into("<I", raw, 30, 1)  # biCompression = BI_RLE8
    assert decode_image(bytes(raw)) is None


def test_wav_decode_known_samples():
    from kafkastreamingetl_spark.operators.multimodal import decode_audio

    d = decode_audio(_wav16(8000, [0, 1000, -1000, 500]))
    assert (d["format"], d["n_channels"], d["sample_rate"], d["bits"]) == (
        "wav", 1, 8000, 16,
    )
    assert d["n_samples"] == 4
    assert d["duration_ms"] == (4 * 1000) // 8000
    assert abs(d["mean_abs_amplitude"] - (0 + 1000 + 1000 + 500) / 4) < 1e-9


def test_wav_garbage_returns_none():
    from kafkastreamingetl_spark.operators.multimodal import decode_audio

    assert decode_audio(b"RIFFxxxxNOPE") is None
    assert decode_audio(b"not audio at all") is None
    # float32 WAV (audioFormat=3) is a compressed-adjacent out-of-scope
    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    assert decode_audio(bad) is None


def test_decode_features_spark_lane_matches_local_decoder(spark):
    """The mapInPandas lane must agree with the plain-Python decoder on
    every planted payload class: decodable PPM, decodable BMP, garbage,
    NULL — and never fail the task on the undecodable ones."""
    from kafkastreamingetl_spark.operators.multimodal import (
        decode_audio_features,
        decode_image_features,
    )

    px = [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    payloads = [
        (1, _ppm(2, 2, px)),
        (2, _bmp24(3, 2, [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
                          [(10, 20, 30), (40, 50, 60), (70, 80, 90)]])),
        (3, b"not an image"),
        (4, None),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_image_features(df).collect()}
    ref1 = decode_image(payloads[0][1])
    assert got[1].format == "ppm" and got[1].width == 2
    assert abs(got[1].mean_r - ref1["mean_r"]) < 1e-9
    assert got[1].px00_rgb == "ff0000"
    assert got[2].format == "bmp" and got[2].px00_rgb == "ff0000"
    assert got[3].format is None and got[3].width is None
    assert got[4].format is None

    wav_rows = [(1, _wav16(16000, [100, -200, 300])), (2, b"junk"), (3, None)]
    adf = spark.createDataFrame(wav_rows, "doc_id long, payload binary")
    agot = {r.doc_id: r for r in decode_audio_features(adf).collect()}
    assert agot[1].sample_rate == 16000 and agot[1].n_samples == 3
    assert abs(agot[1].mean_abs_amplitude - 200.0) < 1e-9
    assert agot[2].format is None and agot[3].format is None


def test_extract_features_binary_path(spark):
    rows = [(1, "hello world"), (2, "café bytes")]  # non-ASCII exercised
    df = with_binary_payload(spark.createDataFrame(rows, ["doc_id", "text"]))
    assert dict(df.dtypes)["payload"] == "binary"
    got = {r.doc_id: r for r in extract_features(df).collect()}
    for doc_id, text in rows:
        raw = text.encode("utf-8")
        digest = hashlib.md5(raw).hexdigest()
        r = got[doc_id]
        assert r.n_bytes == len(raw)  # bytes, not chars (café: 10 vs 9)
        assert r.content_md5 == digest
        assert (r.fake_width, r.fake_height) == _fake_decode(digest)


def test_resize_is_one_to_one_and_bounded(spark):
    rows = [(1, "x" * 100), (2, "short")]
    df = with_binary_payload(spark.createDataFrame(rows, ["doc_id", "text"]))
    got = {r.doc_id: r for r in resize_payloads(df, target_bytes=64).collect()}
    assert len(got) == 2  # 1:1 contract
    assert got[1].n_bytes_in == 100 and got[1].n_bytes_out == 64
    assert bytes(got[1].payload_resized) == b"x" * 64
    assert got[2].n_bytes_out == 5  # shorter than target: untouched
    assert bytes(got[2].payload_resized) == b"short"


def test_frame_sampling_stride_and_indices(spark):
    # 100 bytes -> 4 frames of 32 (last partial); stride 2 keeps idx 0, 2
    df = with_binary_payload(
        spark.createDataFrame([(1, "ab" * 50)], ["doc_id", "text"])
    )
    got = sorted(
        sample_frames(df, frame_bytes=32, stride=2).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in got] == [0, 2]
    assert all(r.n_frames_total == 4 for r in got)
    assert len(bytes(got[0].frame_bytes)) == 32
    assert len(bytes(got[1].frame_bytes)) == 32
    assert bytes(got[1].frame_bytes) == ("ab" * 50).encode()[64:96]


def test_null_payload_propagates_not_crashes(spark):
    """A null binary cell must propagate as null features / null resize
    output and contribute zero frames — bytes(None) in the worker would
    otherwise fail the whole task."""
    from kafkastreamingetl_spark.operators.multimodal import (
        extract_features,
        resize_payloads,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, b"hello world"), (2, None)], "doc_id long, payload binary"
    )
    feats = {r.doc_id: r for r in extract_features(df).collect()}
    assert feats[1].content_md5 is not None
    assert feats[2].content_md5 is None and feats[2].n_bytes is None

    rs = {r.doc_id: r for r in resize_payloads(df).collect()}
    assert rs[1].payload_resized is not None
    assert rs[2].payload_resized is None and rs[2].n_bytes_in is None

    frames = sample_frames(df).collect()
    assert all(r.doc_id == 1 for r in frames)
    assert len(frames) > 0


def test_arrow_lane_matches_pandas_lane(spark):
    """extract_features_arrow (mapInArrow, zero pandas round-trip) returns
    byte-identical features to the mapInPandas lane, nulls included."""
    from kafkastreamingetl_spark.operators.multimodal import (
        extract_features,
        extract_features_arrow,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "payload bytes here")],
        "doc_id long, text string",
    )
    payloads = with_binary_payload(docs)
    a = extract_features(payloads)
    b = extract_features_arrow(payloads)
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_arrow_lane_accepts_non_bigint_ids(spark):
    """An int32 id column must not crash the Arrow lane: _slim casts ids
    to bigint JVM-side so both lanes see the declared schema."""
    from kafkastreamingetl_spark.operators.multimodal import (
        extract_features_arrow,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "def")], "doc_id int, text string"
    )
    rows = extract_features_arrow(with_binary_payload(docs)).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    assert all(r.n_bytes == 3 for r in rows)


def test_bmp_top_down_negative_height():
    """biHeight < 0 = top-down storage: px00 must come from the FIRST
    stored row and means must be identical to the bottom-up twin."""
    import struct

    top = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    bottom = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    raw = bytearray(_bmp24(3, 2, [top, bottom]))
    # flip to top-down: negate height and reorder rows to top-first
    struct.pack_into("<i", raw, 22, -2)
    stride = 12
    off = 54
    rows = bytes(raw[off : off + stride]), bytes(raw[off + stride : off + 2 * stride])
    raw[off : off + stride] = rows[1]          # top row stored first now
    raw[off + stride : off + 2 * stride] = rows[0]
    d_td = decode_image(bytes(raw))
    d_bu = decode_image(_bmp24(3, 2, [top, bottom]))
    assert d_td["px00"] == d_bu["px00"] == (255, 0, 0)
    for k in ("mean_r", "mean_g", "mean_b", "width", "height"):
        assert d_td[k] == d_bu[k], k


def test_wav_stereo_and_8bit():
    import struct

    from kafkastreamingetl_spark.operators.multimodal import decode_audio

    # stereo 16-bit: 2 frames of (L, R) — n_samples counts FRAMES
    data = struct.pack("<4h", 100, -100, 300, -300)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    d = decode_audio(wav)
    assert d["n_channels"] == 2 and d["n_samples"] == 2
    assert abs(d["mean_abs_amplitude"] - 200.0) < 1e-9

    # 8-bit mono: unsigned with 128 offset
    data8 = bytes([128, 138, 118, 128])
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt8) + 8 + len(data8))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
        + b"data" + struct.pack("<I", len(data8)) + data8
    )
    d8 = decode_audio(wav8)
    assert d8["bits"] == 8 and d8["n_samples"] == 4
    assert abs(d8["mean_abs_amplitude"] - 5.0) < 1e-9


def _png(width, height, rows_top_down, *, alpha=False, filters=None,
         bit_depth=8, color_type=None, interlace=0, split_idat=True):
    """Planted PNG: per-row filter ENCODE (the inverse of the decoder's
    unfilter, PNG spec §9), zlib-deflated scanlines, proper CRCs.
    ``filters[y]`` picks each row's filter so one payload can exercise
    all five unfilter paths."""
    import struct
    import zlib

    n_ch = 4 if alpha else 3
    ct = color_type if color_type is not None else (6 if alpha else 2)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, ct, 0, 0,
                       interlace)
    stride = width * n_ch
    raw = bytearray()
    prev = bytes(stride)
    filters = filters or [0] * height
    for y, row in enumerate(rows_top_down):
        line = bytes(v for px in row for v in px)
        f = filters[y]
        enc = bytearray(line)
        if f == 1:
            for i in range(stride - 1, n_ch - 1, -1):
                enc[i] = (enc[i] - line[i - n_ch]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - n_ch] if i >= n_ch else 0
                enc[i] = (enc[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - n_ch] if i >= n_ch else 0
                b = prev[i]
                c = prev[i - n_ch] if i >= n_ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (enc[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc)
        prev = line
    idat = zlib.compress(bytes(raw))
    mid = len(idat) // 2 if split_idat else len(idat)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    out += chunk(b"IDAT", idat[:mid])
    if split_idat:
        out += chunk(b"IDAT", idat[mid:])
    return out + chunk(b"IEND", b"")


def test_png_decode_exercises_all_five_filters():
    """One 3×5 RGB payload, one row per filter type (None/Sub/Up/Average/
    Paeth) + IDAT split across two chunks: decode must undo every filter
    and reassemble the stream."""
    import random

    rng = random.Random(14)
    px = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(3)] for _ in range(5)]
    d = decode_image(_png(3, 5, px, filters=[0, 1, 2, 3, 4]))
    assert (d["format"], d["width"], d["height"]) == ("png", 3, 5)
    assert d["px00"] == px[0][0]
    n = 15
    assert abs(d["mean_r"] - sum(p[0] for r in px for p in r) / n) < 1e-9
    assert abs(d["mean_g"] - sum(p[1] for r in px for p in r) / n) < 1e-9
    assert abs(d["mean_b"] - sum(p[2] for r in px for p in r) / n) < 1e-9


def test_png_rgba_alpha_ignored_in_rgb_stats():
    px = [[(10, 20, 30, 255), (40, 50, 60, 0)],
          [(70, 80, 90, 128), (100, 110, 120, 7)]]
    d = decode_image(_png(2, 2, px, alpha=True, filters=[0, 4]))
    assert (d["format"], d["width"], d["height"]) == ("png", 2, 2)
    assert d["px00"] == (10, 20, 30)
    assert abs(d["mean_r"] - (10 + 40 + 70 + 100) / 4) < 1e-9
    assert abs(d["mean_b"] - (30 + 60 + 90 + 120) / 4) < 1e-9


def test_png_agrees_with_bmp_and_ppm_on_identical_pixels():
    """The three decoders are independent code paths over the same pixel
    semantics — identical planted pixels must yield identical stats."""
    import random

    rng = random.Random(99)
    px = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(4)] for _ in range(3)]
    flat = [c for row in px for p in row for c in p]
    d_png = decode_image(_png(4, 3, px, filters=[2, 3, 1]))
    d_ppm = decode_image(_ppm(4, 3, flat))
    d_bmp = decode_image(_bmp24(4, 3, px))
    for k in ("width", "height", "mean_r", "mean_g", "mean_b", "px00"):
        assert d_png[k] == d_ppm[k] == d_bmp[k], k


def test_png_unsupported_variants_return_none():
    """Palette / 16-bit / Adam7 / truncated / corrupt-deflate payloads are
    data-quality facts (None), not task failures — same contract as the
    compressed-BMP branch."""
    px = [[(1, 2, 3)]]
    assert decode_image(_png(1, 1, px, bit_depth=16)) is None
    assert decode_image(_png(1, 1, px, interlace=1)) is None
    assert decode_image(_png(1, 1, px, color_type=3)) is None
    good = _png(2, 2, [[(0, 0, 0)] * 2] * 2, split_idat=False)
    assert decode_image(good[:-30]) is None  # truncated mid-IDAT
    # corrupt the deflate stream body (IHDR is 8+25 bytes in)
    bad = bytearray(good)
    bad[8 + 25 + 8 + 2] ^= 0xFF
    assert decode_image(bytes(bad)) is None


def test_codec_property_roundtrip_random_images():
    """Property check (seeded, no hypothesis dependency churn): random
    small PPM and BMP payloads decode to exactly the planted dimensions,
    means, and top-left pixel."""
    import random

    rng = random.Random(1313)
    for trial in range(25):
        w, h = rng.randint(1, 9), rng.randint(1, 7)
        px = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
               for _ in range(w)] for _ in range(h)]
        flat = [c for row in px for p in row for c in p]
        want_r = sum(p[0] for row in px for p in row) / (w * h)
        want_b = sum(p[2] for row in px for p in row) / (w * h)

        d = decode_image(_ppm(w, h, flat, comment=trial % 2 == 0))
        assert (d["width"], d["height"]) == (w, h)
        assert abs(d["mean_r"] - want_r) < 1e-9
        assert d["px00"] == px[0][0]

        d2 = decode_image(_bmp24(w, h, px))
        assert (d2["width"], d2["height"]) == (w, h)
        assert abs(d2["mean_b"] - want_b) < 1e-9
        assert d2["px00"] == px[0][0]
        assert abs(d2["mean_r"] - d["mean_r"]) < 1e-9

        d3 = decode_image(
            _png(w, h, px, filters=[rng.randrange(5) for _ in range(h)],
                 alpha=False)
        )
        assert (d3["width"], d3["height"]) == (w, h)
        assert abs(d3["mean_r"] - d["mean_r"]) < 1e-9
        assert abs(d3["mean_b"] - want_b) < 1e-9
        assert d3["px00"] == px[0][0]
