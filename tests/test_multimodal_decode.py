"""Real-format multimodal decode: handcrafted BMP / P6 / P5 payloads go
through the same Arrow-batched mapInPandas kernel as the registry query and
come back with their actual dimensions; non-image payloads take the
deterministic stub."""

from __future__ import annotations

import struct

import pytest

from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
    DECODED_SCHEMA,
    _decode_stub,
    _parse_bmp,
    _parse_jpeg,
    _parse_png,
    _parse_pnm,
    _parse_wav,
    decode_image_batch,
)


def make_bmp(width: int, height: int, bpp: int = 24) -> bytes:
    """Minimal valid uncompressed BMP (BITMAPINFOHEADER, bottom-up)."""
    row_bytes = (width * (bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    raster = row_bytes * height
    offset = 14 + 40
    file_size = offset + raster
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, raster, 2835, 2835, 0, 0)
    return header + dib + bytes(raster)


def make_pnm(magic: bytes, width: int, height: int, maxval: int = 255) -> bytes:
    channels = 3 if magic == b"P6" else 1
    bytes_per = 1 if maxval < 256 else 2
    raster = width * height * channels * bytes_per
    return magic + f"\n# comment\n{width} {height}\n{maxval}\n".encode() + bytes(raster)


def make_wav(
    n_channels: int,
    rate: int,
    n_frames: int,
    bits: int = 16,
    extra_chunk: bytes = b"",
) -> bytes:
    """Minimal valid PCM WAV; `extra_chunk` (a fully-formed RIFF chunk, e.g.
    a LIST) is inserted between fmt and data to exercise the chunk walk."""
    block_align = n_channels * (bits // 8)
    data = bytes(n_frames * block_align)
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_channels, rate, rate * block_align, block_align, bits
    )
    data_chunk = b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")
    body = b"WAVE" + fmt + extra_chunk + data_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_bmp_header_parses_exact_dimensions():
    assert _parse_bmp(make_bmp(7, 5)) == (7, 5, 3, "bmp")
    assert _parse_bmp(make_bmp(640, 480, bpp=32)) == (640, 480, 4, "bmp")
    # top-down BMP stores negative height
    payload = bytearray(make_bmp(4, 6))
    struct.pack_into("<i", payload, 22, -6)
    assert _parse_bmp(bytes(payload)) == (4, 6, 3, "bmp")


def test_pnm_header_parses_exact_dimensions():
    assert _parse_pnm(make_pnm(b"P6", 3, 2)) == (3, 2, 3, "ppm")
    assert _parse_pnm(make_pnm(b"P5", 9, 4)) == (9, 4, 1, "pgm")
    assert _parse_pnm(make_pnm(b"P6", 2, 2, maxval=65535)) == (2, 2, 3, "ppm")


@pytest.mark.parametrize(
    "corrupt",
    [
        lambda b: b[:-1],  # truncated raster → size mismatch
        lambda b: b"BM" + b[2:20],  # too short for a header
        lambda b: b"BMW are great cars, truly the best ever made",  # text
    ],
)
def test_invalid_bmp_rejected(corrupt):
    assert _parse_bmp(corrupt(make_bmp(7, 5))) is None


def test_pnm_strictness():
    good = make_pnm(b"P6", 3, 2)
    assert _parse_pnm(good + b"\x00") is None  # trailing garbage
    assert _parse_pnm(b"P6 is my favourite chess opening, truly") is None
    assert _parse_pnm(b"P4\n3 2\n255\n" + bytes(18)) is None  # bitmap PBM


def test_wav_header_parses_exact_fields():
    # (width=sample_rate, height=n_frames, channels=n_channels, "wav")
    assert _parse_wav(make_wav(2, 44100, 100)) == (44100, 100, 2, "wav")
    assert _parse_wav(make_wav(1, 8000, 7, bits=8)) == (8000, 7, 1, "wav")
    # a LIST chunk between fmt and data must be walked over, not rejected
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    assert _parse_wav(make_wav(2, 22050, 3, extra_chunk=lst)) == (22050, 3, 2, "wav")
    # odd-sized chunk bodies carry a pad byte (8-bit mono, odd frame count)
    assert _parse_wav(make_wav(1, 8000, 5, bits=8)) == (8000, 5, 1, "wav")


def test_wav_matches_stdlib_wave_writer():
    """Cross-check against Python's own wave module as an independent
    producer of the format."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(bytes(2 * 2 * 250))
    assert _parse_wav(buf.getvalue()) == (16000, 250, 2, "wav")


@pytest.mark.parametrize(
    "corrupt",
    [
        lambda b: b[:-1],  # truncated → RIFF size mismatch
        lambda b: b + b"\x00",  # trailing garbage → chunk walk overshoots
        lambda b: b[:20] + struct.pack("<H", 85) + b[22:],  # non-PCM (mu-law)
        lambda b: b"RIFF you a new one, said the carpenter",  # text
        lambda b: b[:40],  # data chunk body cut off
    ],
)
def test_invalid_wav_rejected(corrupt):
    assert _parse_wav(corrupt(make_wav(2, 44100, 100))) is None


def test_decode_through_spark_plumbing(spark):
    rows = [
        (1, make_bmp(7, 5)),
        (2, make_pnm(b"P6", 3, 2)),
        (3, make_pnm(b"P5", 9, 4)),
        (4, b"just some text payload"),
        (5, make_wav(2, 44100, 10)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in df.mapInPandas(decode_image_batch, schema=DECODED_SCHEMA).collect()
    }
    assert (out[1]["width"], out[1]["height"], out[1]["channels"], out[1]["format"]) == (7, 5, 3, "bmp")
    assert (out[2]["width"], out[2]["height"], out[2]["channels"], out[2]["format"]) == (3, 2, 3, "ppm")
    assert (out[3]["width"], out[3]["height"], out[3]["channels"], out[3]["format"]) == (9, 4, 1, "pgm")
    stub = _decode_stub(rows[3][1])
    assert (out[4]["width"], out[4]["height"], out[4]["channels"], out[4]["format"]) == stub
    assert (out[5]["width"], out[5]["height"], out[5]["channels"], out[5]["format"]) == (44100, 10, 2, "wav")
    assert out[1]["n_bytes"] == len(rows[0][1])


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        w=st.integers(1, 512),
        h=st.integers(1, 512),
        bpp=st.sampled_from([8, 24, 32]),
    )
    @settings(max_examples=60, deadline=None)
    def test_bmp_parser_roundtrip_property(w, h, bpp):
        assert _parse_bmp(make_bmp(w, h, bpp)) == (w, h, bpp // 8, "bmp")

    @given(
        magic=st.sampled_from([b"P5", b"P6"]),
        w=st.integers(1, 256),
        h=st.integers(1, 256),
        maxval=st.sampled_from([1, 255, 256, 65535]),
    )
    @settings(max_examples=60, deadline=None)
    def test_pnm_parser_roundtrip_property(magic, w, h, maxval):
        channels = 3 if magic == b"P6" else 1
        fmt = "ppm" if channels == 3 else "pgm"
        assert _parse_pnm(make_pnm(magic, w, h, maxval)) == (w, h, channels, fmt)

    @given(
        n_ch=st.integers(1, 8),
        rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
        n_frames=st.integers(0, 1000),
        bits=st.sampled_from([8, 16, 24, 32]),
    )
    @settings(max_examples=60, deadline=None)
    def test_wav_parser_roundtrip_property(n_ch, rate, n_frames, bits):
        assert _parse_wav(make_wav(n_ch, rate, n_frames, bits)) == (
            rate,
            n_frames,
            n_ch,
            "wav",
        )

    @given(payload=st.binary(max_size=200))
    @settings(max_examples=120, deadline=None)
    def test_parsers_never_crash_on_garbage(payload):
        # strict validation: arbitrary bytes either parse to a plausible
        # header or are rejected — never an exception
        for parse in (_parse_bmp, _parse_pnm, _parse_wav, _parse_png, _parse_jpeg):
            out = parse(payload)
            assert out is None or (out[0] > 0 and out[1] >= 0)

except ImportError:  # pragma: no cover — hypothesis is available in CI image
    pass


def make_png(w, h, color_type=2):
    import struct, zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # one filtered scanline per row, zlib-compressed (valid but unread)
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = (b"\x00" + b"\x7f" * (w * nch)) * h
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg(w, h, ncomp=3):
    import struct

    sof = struct.pack(">BBHHB", 8, 0, 0, 0, 0)  # placeholder, rebuilt below
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + b"\x01\x11\x00" * ncomp
    seg_sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    seg_app0 = b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    sos = b"\x01\x01\x00\x00\x3f\x00"
    seg_sos = b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    entropy = b"\x12\x34\x56"  # fake entropy-coded bytes (no FF markers)
    return b"\xff\xd8" + seg_app0 + seg_sof + seg_sos + entropy + b"\xff\xd9"


def test_png_header_parses_exact_dimensions():
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        _parse_png,
    )

    assert _parse_png(make_png(17, 9, color_type=2)) == (17, 9, 3, "png")
    assert _parse_png(make_png(1, 1, color_type=0)) == (1, 1, 1, "png")
    assert _parse_png(make_png(5, 3, color_type=6)) == (5, 3, 4, "png")


def test_png_strictness():
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        _parse_png,
    )

    good = make_png(4, 4)
    assert _parse_png(good) is not None
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF  # flip an IHDR byte -> CRC mismatch
    assert _parse_png(bytes(corrupted)) is None
    assert _parse_png(good[:-4]) is None  # truncated after IEND length
    assert _parse_png(good + b"x") is None  # trailing junk after IEND


def test_jpeg_header_parses_exact_dimensions():
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        _parse_jpeg,
    )

    assert _parse_jpeg(make_jpeg(640, 480, 3)) == (640, 480, 3, "jpeg")
    assert _parse_jpeg(make_jpeg(28, 28, 1)) == (28, 28, 1, "jpeg")


def test_jpeg_strictness():
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        _parse_jpeg,
    )

    good = make_jpeg(10, 10)
    assert _parse_jpeg(good) is not None
    assert _parse_jpeg(good[:-2]) is None  # missing EOI
    broken = bytearray(good)
    broken[2] = 0x00  # segment must start with FF
    assert _parse_jpeg(bytes(broken)) is None


def test_jpeg_fill_bytes_between_segments():
    """Regression: the spec allows runs of 0xFF fill/padding bytes before a
    marker byte; the walk must skip them instead of rejecting the stream
    (which sent valid JPEGs to the deterministic stub with fabricated
    dimensions)."""
    import struct

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        _parse_jpeg,
    )

    sof = struct.pack(">BHHB", 8, 33, 44, 3) + b"\x01\x11\x00" * 3
    seg_sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    sos = b"\x01\x01\x00\x00\x3f\x00"
    seg_sos = b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # three fill 0xFF bytes before the SOF marker byte
    padded = b"\xff\xd8" + b"\xff\xff\xff" + seg_sof + seg_sos + b"\x12" + b"\xff\xd9"
    assert _parse_jpeg(padded) == (44, 33, 3, "jpeg")


def test_nn_resize_known_case():
    """Hand-computed nearest-neighbor: 4x4 ramp to 2x2 picks rows/cols
    {0,2} (floor(i*4/2) = 0,2) — the canonical floor-index mapping."""
    import numpy as np

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import _nn_resize

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = _nn_resize(img, 2, 2)
    assert out.tolist() == [[0, 2], [8, 10]]


def test_resize_p5_real_payload_roundtrip():
    """A genuine binary PGM resizes for real: output is valid P5 with the
    target dims and exactly the pixels the floor mapping selects; non-P5
    payloads return None instead of garbage."""
    import numpy as np

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        _nn_resize,
        resize_p5,
    )

    src = np.arange(256, dtype=np.uint8).reshape(16, 16)
    payload = b"P5 16 16 255 " + src.tobytes()
    out = resize_p5(payload, out_h=4, out_w=4)
    assert out is not None and out.startswith(b"P5 4 4 255 ")
    pix = np.frombuffer(out.split(maxsplit=4)[4], dtype=np.uint8).reshape(4, 4)
    assert (pix == _nn_resize(src, 4, 4)).all()
    assert resize_p5(b"JUNK" + payload) is None
    assert resize_p5(b"P5 16 16 255 " + src.tobytes()[:10]) is None  # truncated


def test_synthetic_gray_mapping():
    """pixel(r, c) = bytes[(r*w + c) % n] with w = min(n, 32), h = 16 —
    the contract the SQL oracles re-derive."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        SYN_H,
        _synthetic_gray,
    )

    b = b"abcde"
    img = _synthetic_gray(b)
    assert img.shape == (SYN_H, 5)
    for r in range(SYN_H):
        for c in range(5):
            assert img[r, c] == b[(r * 5 + c) % 5]
    assert _synthetic_gray(b"") is None


def test_resize_and_feature_kernels_through_spark(spark):
    """End-to-end mapInPandas: every non-empty doc yields one thumbnail row
    (8x8, weighted sum consistent with the plain sum bounds) and one
    feature row (histogram partitions n_pix, min <= mean <= max)."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        THUMB,
        q_feature_stats,
        q_resize_thumbnail,
    )

    sf = "/root/testdata/sf0.001"
    rs = q_resize_thumbnail(spark, sf).collect()
    assert len(rs) > 0
    for r in rs:
        assert (r.out_w, r.out_h) == (THUMB, THUMB)
        assert 0 <= r.pix_sum <= 255 * THUMB * THUMB
        # weighted sum bounds: sum*1 <= wsum <= sum*64
        assert r.pix_sum <= r.pix_wsum <= r.pix_sum * THUMB * THUMB
    fs = q_feature_stats(spark, sf).collect()
    assert len(fs) == len(rs)
    for r in fs:
        assert r.hist0 + r.hist1 + r.hist2 + r.hist3 == r.n_pix
        assert r.min_pix * 1000 <= r.mean_milli <= r.max_pix * 1000


def test_jpeg_fill_bytes_before_eoi_do_not_crash():
    """A degenerate JPEG whose fill-byte run reaches the trailing EOI must
    fall through to None (stub path), not raise struct.error from reading
    past the buffer."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        _parse_jpeg,
    )

    assert _parse_jpeg(b"\xff\xd8\xff\xff\xff\xff\xd9") is None


def test_resize_p5_accepts_whitespace_valued_first_pixels():
    """PNM raster starts after exactly ONE whitespace byte; pixels that
    happen to be 0x20/0x0a must not be eaten as header separators."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        resize_p5,
    )

    pix = bytes([0x20, 0x0A]) + bytes((i % 251 for i in range(16 * 16 - 2)))
    out = resize_p5(b"P5 16 16 255 " + pix)
    assert out is not None
    # round-trip: output parses as P5 again and keeps the 8x8 shape
    assert out.startswith(b"P5 8 8 255 ")
    assert len(out) - len(b"P5 8 8 255 ") == 64


def test_resize_p5_rejects_zero_dims_and_wide_maxval():
    """Zero-dimension rasters and maxval > 255 (2-byte samples) must
    return None, not crash or silently misdecode the raster as uint8."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        resize_p5,
    )

    assert resize_p5(b"P5 0 16 255 ") is None
    assert resize_p5(b"P5 16 0 255 " + bytes(16)) is None
    assert resize_p5(b"P5 16 16 65535 " + bytes(512)) is None
    assert resize_p5(b"P5 16 16 0 " + bytes(256)) is None
    assert resize_p5(b"P5 4 4 255 " + bytes(range(16))) is not None


def test_phash_dedup_constructed(spark, tmp_path):
    """Hand-computed dHash: text 'ab' -> 16x2 image alternating 97|98 ->
    8x9 grid has its only rising gradient at column 4 of every row, so
    bits {4,12,20,28} set in BOTH halves (positions i*8+4, hi half mod
    32): hi == lo == 0x10101010. Identical docs group; 'ba' (falling
    gradient) hashes differently and is excluded as a singleton."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        q_phash_dedup,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["ab", "ab", "ba"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = [
        (r.dhash_hi, r.dhash_lo, r.n_images, r.canonical_doc_id)
        for r in q_phash_dedup(spark, str(tmp_path)).collect()
    ]
    assert got == [(0x10101010, 0x10101010, 2, 1)]


def test_audio_energy_constructed(spark, tmp_path):
    """Hand-computed frame energies, including the odd-length PCM case
    whose RIFF pad byte the strict container walk requires: 'ab' ->
    (97-128)^2 + (98-128)^2 = 1861; 'abc' (odd) adds (99-128)^2 -> 2702."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        q_audio_energy,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["ab", "abc"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = sorted(
        (r.doc_id, r.frame_no, r.n_samples, r.energy)
        for r in q_audio_energy(spark, str(tmp_path)).collect()
    )
    assert got == [(1, 0, 2, 1861), (2, 0, 3, 2702)]


def test_png_pixel_codec_roundtrips_and_rejects_corruption(spark):
    """The REAL PNG pixel codec (stdlib zlib, all five filters): bit-exact
    round-trip on adversarial images (flat, extreme, random, thin, large),
    and strict rejection — never misdecode — of CRC corruption and
    truncation."""
    import numpy as np

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        png_decode_gray,
        png_encode_gray,
    )

    rng = np.random.default_rng(7)
    cases = [
        np.zeros((16, 32), dtype=np.uint8),
        np.full((16, 32), 255, dtype=np.uint8),
        rng.integers(0, 256, (16, 32), dtype=np.uint8),
        rng.integers(0, 256, (5, 1), dtype=np.uint8),
        rng.integers(0, 256, (1, 7), dtype=np.uint8),
        rng.integers(0, 256, (100, 200), dtype=np.uint8),
    ]
    for i, img in enumerate(cases):
        dec = png_decode_gray(png_encode_gray(img))
        assert dec is not None and np.array_equal(dec, img), f"case {i}"
    good = png_encode_gray(cases[2])
    bad = bytearray(good)
    bad[60] ^= 0xFF
    assert png_decode_gray(bytes(bad)) is None  # CRC mismatch -> reject
    assert png_decode_gray(good[:-5]) is None  # truncation -> reject
    assert png_decode_gray(b"\x89PNG\r\n\x1a\n" + b"x" * 64) is None
    # every truncation point must reject cleanly, never raise — including
    # cuts that land inside a chunk's 4-byte CRC field
    for cut in range(8, len(good)):
        assert png_decode_gray(good[:cut]) is None, cut


def test_jpeg_codec_entropy_exact_and_psnr(spark):
    """The REAL baseline JPEG codec: entropy round-trip returns BIT-EXACT
    quantized coefficients on adversarial images (flat, extreme, noise,
    odd dims, 1x1, large, smooth ramp); pixel decode meets PSNR floors
    (lossless on flat, high on smooth content, bounded on noise — the
    JPEG-characteristic profile); corrupted scans are rejected."""
    import numpy as np

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.jpegcodec import (
        decode_gray_coefficients,
        decode_gray_jpeg,
        encode_gray_jpeg,
        quantized_blocks,
    )

    rng = np.random.default_rng(11)
    ramp = np.tile(np.arange(256, dtype=np.uint8), (32, 1))[:, :80]
    cases = {
        "flat0": np.zeros((16, 32), dtype=np.uint8),
        "flat255": np.full((16, 32), 255, dtype=np.uint8),
        "noise": rng.integers(0, 256, (16, 32), dtype=np.uint8),
        "odd": rng.integers(0, 256, (7, 5), dtype=np.uint8),
        "one": rng.integers(0, 256, (1, 1), dtype=np.uint8),
        "big": rng.integers(0, 256, (64, 96), dtype=np.uint8),
        "ramp": ramp,
    }
    floors = {"flat0": 99, "flat255": 99, "noise": 18, "odd": 15,
              "one": 99, "big": 18, "ramp": 40}
    for name, img in cases.items():
        payload = encode_gray_jpeg(img)
        dec = decode_gray_coefficients(payload)
        assert dec is not None, name
        assert np.array_equal(dec[0], quantized_blocks(img)), name
        pix = decode_gray_jpeg(payload)
        assert pix is not None and pix.shape == img.shape, name
        mse = float(np.mean((pix.astype(float) - img.astype(float)) ** 2))
        psnr = 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)
        assert psnr >= floors[name], (name, psnr)
    good = encode_gray_jpeg(cases["noise"])
    assert decode_gray_coefficients(good[:-4]) is None  # missing EOI
    assert decode_gray_coefficients(b"\xff\xd8" + b"A" * 40) is None
    # non-baseline SOF (progressive) must be rejected, not misdecoded
    bad = bytearray(good)
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC2
    assert decode_gray_coefficients(bytes(bad)) is None


def test_spread_is_noop_when_already_partitioned(spark):
    """_spread only fires on under-partitioned scans: a frame with >=
    defaultParallelism partitions passes through IDENTICALLY (no extra
    shuffle in any real-scale plan). Since r16 the target is sized from
    the estimated input bytes (~16 KiB per task, capped at the core
    count): a TINY single-split frame stays near-unsplit (no core-count
    fan-out of Arrow worker spins for toy inputs), while a BULKY
    single-split frame still spreads to one partition per core."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.multimodal import (
        _spread,
    )

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000).withColumnRenamed("id", "doc_id").repartition(
        max(target, 2)
    )
    assert _spread(wide) is wide
    tiny = spark.range(0, 10).withColumnRenamed("id", "doc_id").coalesce(1)
    assert _spread(tiny).rdd.getNumPartitions() < target
    # ~8 MB of longs in one split: byte rule saturates at the core cap
    bulky = spark.range(0, 1_000_000).withColumnRenamed("id", "doc_id").coalesce(1)
    assert _spread(bulky).rdd.getNumPartitions() == target
