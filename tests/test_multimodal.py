"""Real PPM decode kernel: parser unit tests + Arrow-batched pipeline pins.

The driver gate (queries/multimodal.py) validates width/height/byte_len/mean
against the analytic DuckDB oracle; these tests cover what the oracle can't:
the parser's handling of real netpbm variations (comments, 16-bit maxval,
truncation) and the payload content_md5 the gate projects out (this DuckDB
build has no md5(BLOB)).
"""

import hashlib

import pytest

from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
    MediaDecodeError,
    decode_image,
    decode_ppm,
    extract_media_features,
    synthesize_ppm_media,
)


def _ppm(w, h, raster, header=None, maxval=255):
    return (header or b"P6\n%d %d\n%d\n" % (w, h, maxval)) + bytes(raster)


def test_decode_ppm_known_raster():
    # 2x1 RGB: pixels (0,128,255), (1,2,3) -> mean = 389 / (6*255)
    p = _ppm(2, 1, [0, 128, 255, 1, 2, 3])
    w, h, mean = decode_ppm(p)
    assert (w, h) == (2, 1)
    assert mean == 389 / (6 * 255)


def test_decode_ppm_comment_and_whitespace_variants():
    # netpbm allows comments and arbitrary whitespace between header tokens
    p = _ppm(1, 1, [9, 9, 9], header=b"P6 # comment\n# full line\n 1\t1 \n255\n")
    assert decode_ppm(p) == (1, 1, 27 / (3 * 255))


def test_decode_ppm_16bit_maxval():
    # maxval > 255 -> 2 bytes per sample, big-endian
    raster = [0x01, 0x00, 0x00, 0x02, 0x00, 0x03]  # samples 256, 2, 3
    p = _ppm(1, 1, raster, maxval=65535)
    w, h, mean = decode_ppm(p)
    assert (w, h) == (1, 1)
    assert mean == (256 + 2 + 3) / (3 * 65535)


def test_decode_ppm_rejects_malformed():
    with pytest.raises(MediaDecodeError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(MediaDecodeError, match="truncated PPM raster"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00\x00")
    with pytest.raises(MediaDecodeError, match="truncated PPM header"):
        decode_ppm(b"P6\n2 2")
    with pytest.raises(MediaDecodeError, match="non-numeric"):
        decode_ppm(b"P6\n2 x\n255\n" + b"\x00" * 6)


def test_decode_image_dispatch():
    assert decode_image(_ppm(1, 1, [0, 0, 0]))[:2] == (1, 1)
    # PNG now routes to the REAL decoder: a bare signature is a malformed
    # PNG (decode error), not an unimplemented format
    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        MediaDecodeError,
    )

    with pytest.raises(MediaDecodeError):
        decode_image(b"\x89PNG\r\n\x1a\n")
    # JPEG also routes to a real decoder now: truncated payload = decode
    # error, not unimplemented
    with pytest.raises(MediaDecodeError):
        decode_image(b"\xff\xd8\xff\xe0rest")
    # GIF routes to the real LZW decoder as of round 5: a bare signature is
    # a malformed GIF (decode error), not an unimplemented format
    with pytest.raises(MediaDecodeError):
        decode_image(b"GIF89a...")
    # a genuinely unimplemented format (TIFF) still raises NotImplementedError
    with pytest.raises(NotImplementedError, match="no codec"):
        decode_image(b"II*\x00rest")


def test_decode_wav_known_samples():
    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        decode_wav,
    )

    samples = [0, 1000, -1000, 32767]
    data = b"".join(s.to_bytes(2, "little", signed=True) for s in samples)
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    # extra LIST chunk before data: the decoder must WALK chunks, not assume
    # a fixed 44-byte layout
    chunks = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"LIST" + (4).to_bytes(4, "little") + b"INFO"
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    wav = b"RIFF" + len(chunks).to_bytes(4, "little") + chunks
    rate, ch, n, rms = decode_wav(wav)
    assert (rate, ch, n) == (8000, 1, 4)
    import math

    assert rms == math.sqrt(sum(s * s for s in samples) / 4)


def test_decode_wav_rejects_malformed():
    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        decode_wav,
    )

    with pytest.raises(MediaDecodeError, match="not a RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    with pytest.raises(MediaDecodeError, match="missing fmt/data"):
        decode_wav(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")
    # fmt claiming mu-law must be refused, not mis-decoded
    fmt = (
        (7).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = (
        b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + (2).to_bytes(4, "little") + b"\x00\x00"
    )
    with pytest.raises(MediaDecodeError, match="unsupported WAV encoding"):
        decode_wav(b"RIFF" + len(chunks).to_bytes(4, "little") + chunks)


def test_resize_nearest_known_raster():
    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        resize_nearest,
    )

    # 2x2 RGB downsampled to 1x1 must pick the top-left pixel (0*2//1 == 0)
    raster = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    assert resize_nearest(raster, 2, 2, 1, 1) == bytes([1, 2, 3])
    # 1x1 upsampled to 2x2 replicates the single pixel
    assert resize_nearest(bytes([9, 8, 7]), 1, 1, 2, 2) == bytes([9, 8, 7] * 4)
    with pytest.raises(MediaDecodeError, match="raster size"):
        resize_nearest(raster, 3, 3, 1, 1)


def test_synthesized_payloads_decode_end_to_end(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_media_features(synthesize_ppm_media(docs))
    rows = {r["media_id"]: r for r in feats.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert rows.keys() == src.keys()
    for doc_id, text in src.items():
        # independently rebuild the payload and check EVERY feature column,
        # including the content_md5 the driver gate can't verify
        hd = hashlib.md5(text.encode()).digest()
        w, h = 4 + hd[0] % 13, 4 + hd[1] % 13
        raster = bytes((doc_id * 31 + i * 7) % 256 for i in range(3 * w * h))
        payload = b"P6\n%d %d\n255\n" % (w, h) + raster
        r = rows[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert r["byte_len"] == len(payload)
        assert r["content_md5"] == hashlib.md5(payload).hexdigest()
        assert r["mean_intensity"] == sum(raster) / (len(raster) * 255)
        assert r["media_type"] == "image"


def test_decode_wav_empty_data_chunk_raises_decode_error():
    """A structurally valid WAV whose data chunk is empty (legal: a fresh
    recording) must honor the MediaDecodeError contract, not divide by
    zero computing RMS."""
    import struct

    import pytest as _pytest

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        MediaDecodeError,
        decode_wav,
    )

    fmt_body = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", 0)
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with _pytest.raises(MediaDecodeError, match="empty data chunk"):
        decode_wav(payload)


def _bmp_24(width, height, bgr_rows, top_down=False):
    """Minimal BITMAPINFOHEADER 24-bit BMP: bgr_rows is bottom-up row-major
    BGR bytes WITHOUT padding; padding is added per the 4-byte rule."""
    stride = (3 * width + 3) & ~3
    pad = b"\x00" * (stride - 3 * width)
    body = b"".join(bytes(r) + pad for r in bgr_rows)
    h = -height if top_down else height
    info = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    off = 14 + 40
    hdr = b"BM" + (off + len(body)).to_bytes(4, "little") + b"\x00" * 4 + off.to_bytes(4, "little")
    return hdr + info + body


def test_decode_bmp_known_pixels():
    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
    )

    # 2x2, rows bottom-up, BGR; values chosen so the mean is exact
    rows = [[10, 20, 30, 40, 50, 60], [70, 80, 90, 100, 110, 120]]
    bmp = _bmp_24(2, 2, rows)
    w, h, mean = decode_bmp(bmp)
    assert (w, h) == (2, 2)
    assert mean == sum(sum(r) for r in rows) / (12 * 255)
    assert decode_image(bmp) == (w, h, mean)  # dispatch hits the BMP path
    # padding must be EXCLUDED from the mean: odd width forces 3-byte pad
    rows3 = [[255, 255, 255]]
    bmp3 = _bmp_24(1, 1, rows3)
    assert decode_bmp(bmp3) == (1, 1, 1.0)
    # top-down (negative height) variant decodes with positive dimensions
    assert decode_bmp(_bmp_24(2, 2, rows, top_down=True))[:2] == (2, 2)


def test_decode_bmp_rejects_malformed():
    import pytest

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        MediaDecodeError,
        decode_bmp,
    )

    with pytest.raises(MediaDecodeError):
        decode_bmp(b"PNG\x00" + b"\x00" * 60)
    with pytest.raises(MediaDecodeError):
        decode_bmp(b"BM" + b"\x00" * 10)  # truncated headers
    ok = _bmp_24(2, 2, [[0] * 6, [0] * 6])
    with pytest.raises(MediaDecodeError):
        decode_bmp(ok[:-3])  # truncated pixel array
    bad_bpp = bytearray(ok)
    bad_bpp[28] = 32  # declare 32bpp
    with pytest.raises(MediaDecodeError):
        decode_bmp(bytes(bad_bpp))


# -- property pins for the numpy-vectorized kernels (round 4): the
# vectorized forms must match the straightforward per-sample/per-pixel
# reference loops bit-for-bit on arbitrary payloads --------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    st.integers(1, 8),
    st.integers(1, 8),
    st.integers(1, 6),
    st.integers(1, 6),
    st.binary(min_size=0, max_size=0),
)
def test_resize_matches_per_pixel_loop(src_w, src_h, out_w, out_h, _):
    import numpy as np

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        resize_nearest,
    )

    rng = np.random.default_rng(src_w * 1000 + src_h * 100 + out_w * 10 + out_h)
    raster = bytes(rng.integers(0, 256, 3 * src_w * src_h, dtype=np.uint8))
    got = resize_nearest(raster, src_w, src_h, out_w, out_h)
    # reference loop (the pre-vectorization implementation)
    ref = bytearray(3 * out_w * out_h)
    o = 0
    for y in range(out_h):
        sy = y * src_h // out_h
        for x in range(out_w):
            sx = x * src_w // out_w
            src = 3 * (sy * src_w + sx)
            ref[o : o + 3] = raster[src : src + 3]
            o += 3
    assert got == bytes(ref)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64))
def test_wav_rms_matches_per_sample_loop(samples):
    import math
    import struct

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        decode_wav,
    )

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate, ch, n, rms = decode_wav(wav)
    sq = sum(s * s for s in samples)  # reference integer accumulation
    assert (rate, ch, n) == (8000, 1, len(samples))
    assert rms == math.sqrt(sq / len(samples))


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 6), st.integers(1, 6), st.booleans())
def test_ppm_mean_matches_per_sample_loop(w, h, sixteen_bit):
    import numpy as np

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        decode_ppm,
    )

    rng = np.random.default_rng(w * 100 + h * 10 + sixteen_bit)
    if sixteen_bit:
        maxval, raster = 65535, bytes(rng.integers(0, 256, 6 * w * h, dtype=np.uint8))
        samples = [
            (raster[2 * i] << 8) | raster[2 * i + 1] for i in range(3 * w * h)
        ]
    else:
        maxval, raster = 255, bytes(rng.integers(0, 256, 3 * w * h, dtype=np.uint8))
        samples = list(raster)
    ppm = f"P6\n{w} {h}\n{maxval}\n".encode() + raster
    got = decode_ppm(ppm)
    assert got == (w, h, sum(samples) / (len(samples) * maxval))


def test_decode_png_roundtrip_all_filters():
    """encode_png/decode_png are exact inverses for every PNG filter type
    (None/Sub/Up/Average/Paeth) on random rasters — the mean must equal the
    integer pixel sum computed outside the codec."""
    import numpy as np

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for f in range(5):
        for (w, h) in [(1, 1), (4, 5), (16, 9)]:
            rows = rng.integers(0, 256, size=(h, 3 * w), dtype=np.uint8)
            got = decode_png(encode_png(rows, f))
            assert got == (w, h, int(rows.sum(dtype=np.int64)) / (rows.size * 255))


def test_decode_png_rejects_malformed():
    import numpy as np
    import pytest

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        MediaDecodeError,
        decode_png,
        encode_png,
    )

    vals = (np.arange(3 * 6 * 7, dtype=np.int64) % 256).astype(np.uint8).reshape(7, 18)
    good = encode_png(vals, 4)
    with pytest.raises(MediaDecodeError):  # truncated mid-chunk
        decode_png(good[:20])
    bad_crc = bytearray(good)
    bad_crc[40] ^= 0xFF
    with pytest.raises(MediaDecodeError):
        decode_png(bytes(bad_crc))
    with pytest.raises(MediaDecodeError):  # wrong signature entirely
        decode_png(b"\x89PNGnope" + good[8:])


def test_decode_image_dispatches_png():
    import numpy as np

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    rows = np.full((2, 6), 128, dtype=np.uint8)
    assert decode_image(encode_png(rows, 2)) == (2, 2, 128 / 255)


def test_decode_png_rejects_zlib_bomb():
    """A valid IHDR with an IDAT that deflate-expands far past the declared
    raster size must raise MediaDecodeError, not allocate the inflated
    stream (bounded decompressobj)."""
    import zlib

    import numpy as np
    import pytest

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        MediaDecodeError,
        decode_png,
        encode_png,
        _png_chunk,
        _PNG_SIG,
    )

    # 2x2 IHDR but an IDAT holding ~64 MB of zeros (compresses to ~64 KB)
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    bomb = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (64 << 20)))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(MediaDecodeError, match="scanline volume"):
        decode_png(bomb)
    # and a stream that inflates SHORT of the raster also raises
    short = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 3))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(MediaDecodeError, match="scanline volume"):
        decode_png(short)
    # the exact-size stream still decodes
    rows = np.zeros((2, 6), dtype=np.uint8)
    assert decode_png(encode_png(rows, 0)) == (2, 2, 0.0)


def test_decode_jpeg_dc_only_exact():
    """DC-only baseline JPEG with levels ≡ 0 (mod 8) and flat quant: every
    reconstructed block is the exact constant level/8 + 128, including the
    clamp at 0/255."""
    import numpy as np

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_gray_dc,
    )

    rng = np.random.default_rng(3)
    for (w, h) in [(8, 8), (16, 8), (24, 32)]:
        levels = (rng.integers(-12, 13, size=(h // 8, w // 8)) * 8).astype(np.int64)
        got = decode_jpeg(encode_jpeg_gray_dc(levels, w, h))
        pix = np.repeat(np.repeat(levels // 8 + 128, 8, 0), 8, 1)
        assert got == (w, h, int(pix.sum()) / (pix.size * 255))
    # clamp extremes: levels -1024 / +1016 hit pixel 0 / 255 exactly
    levels = np.array([[-1024, 1016], [0, 8]], dtype=np.int64)
    got = decode_jpeg(encode_jpeg_gray_dc(levels, 16, 16))
    pix = np.clip(np.array([[-128, 127], [0, 1]]) + 128, 0, 255).repeat(8, 0).repeat(8, 1)
    assert got == (16, 16, int(pix.sum()) / (pix.size * 255))


def test_decode_jpeg_general_ac_path_matches_reference():
    """Hand-assembled scans with random AC coefficients, long zero runs
    (ZRL), and a random quant table must match an independently-written
    dequant + de-zigzag + IDCT reference bit-for-bit."""
    import numpy as np

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        _JPEG_AC_LUMA_BITS,
        _JPEG_AC_LUMA_VALS,
        _JPEG_DC_LUMA_BITS,
        _JPEG_DC_LUMA_VALS,
        _ZIGZAG,
        _BitWriter,
        _huffman_encode_table,
        decode_jpeg,
    )

    def encode_general(blocks_zz, w, h, quant):
        seg = bytearray(b"\xff\xd8")

        def chunk(marker, body):
            seg.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

        chunk(0xDB, bytes([0]) + bytes(quant))
        chunk(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
        chunk(0xC4, bytes([0x00]) + bytes(_JPEG_DC_LUMA_BITS) + bytes(_JPEG_DC_LUMA_VALS))
        chunk(0xC4, bytes([0x10]) + bytes(_JPEG_AC_LUMA_BITS) + bytes(_JPEG_AC_LUMA_VALS))
        chunk(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        dc_enc = _huffman_encode_table(_JPEG_DC_LUMA_BITS, _JPEG_DC_LUMA_VALS)
        ac_enc = _huffman_encode_table(_JPEG_AC_LUMA_BITS, _JPEG_AC_LUMA_VALS)
        wtr = _BitWriter()
        pred = 0
        for zz in blocks_zz:
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = abs(diff).bit_length()
            c, ln = dc_enc[s]
            wtr.write(c, ln)
            if s:
                wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            k = 1
            while k < 64:
                run = 0
                while k < 64 and zz[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    break
                while run >= 16:
                    c, ln = ac_enc[0xF0]
                    wtr.write(c, ln)
                    run -= 16
                v = int(zz[k])
                s = abs(v).bit_length()
                c, ln = ac_enc[(run << 4) | s]
                wtr.write(c, ln)
                wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                k += 1
            if zz[63] == 0:
                c, ln = ac_enc[0x00]
                wtr.write(c, ln)
        seg.extend(wtr.flush())
        seg.extend(b"\xff\xd9")
        return bytes(seg)

    def reference(blocks_zz, w, h, quant):
        m = np.zeros((8, 8))
        for u in range(8):
            cu = (0.5 / np.sqrt(2.0)) if u == 0 else 0.5
            for x in range(8):
                m[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16)
        bw = w // 8
        img = np.zeros((h, w), dtype=np.int64)
        for bi, zz in enumerate(blocks_zz):
            by, bx = divmod(bi, bw)
            co = np.zeros(64)
            for k in range(64):
                co[_ZIGZAG[k]] = zz[k] * quant[k]
            blk = m.T @ co.reshape(8, 8) @ m
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(blk).astype(np.int64) + 128, 0, 255
            )
        return img

    rng = np.random.default_rng(11)
    quant = list(rng.integers(1, 20, 64))
    for _ in range(3):
        blocks = []
        for _b in range(4):
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = rng.integers(-100, 100)
            for pos in rng.choice(np.arange(1, 64), size=5, replace=False):
                zz[pos] = rng.integers(-30, 31)
            blocks.append(zz)
        ref = reference(blocks, 16, 16, quant)
        got = decode_jpeg(encode_general(blocks, 16, 16, quant))
        assert got == (16, 16, int(ref.sum()) / (ref.size * 255))


def test_decode_jpeg_rejects_malformed():
    import numpy as np
    import pytest

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        MediaDecodeError,
        decode_image,
        decode_jpeg,
        encode_jpeg_gray_dc,
    )

    good = encode_jpeg_gray_dc(np.zeros((1, 1), dtype=np.int64), 8, 8)
    with pytest.raises(MediaDecodeError):
        decode_jpeg(good[:30])  # truncated mid-segment
    with pytest.raises(MediaDecodeError):
        decode_jpeg(b"\x89PNGnope")  # wrong magic
    with pytest.raises(MediaDecodeError):
        decode_jpeg(good[:-10])  # scan cut before all blocks decode
    # dispatch now routes JPEG magic to the real decoder
    assert decode_image(good) == (8, 8, 128 / 255)


def test_decode_jpeg_marker_walk_robustness():
    """Truncated segment bodies raise MediaDecodeError (never IndexError);
    T.81-legal 0xFF fill bytes and standalone TEM/RST markers in the header
    walk are tolerated; encoder DC-category overflow raises a clear error."""
    import numpy as np
    import pytest

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        MediaDecodeError,
        decode_jpeg,
        encode_jpeg_gray_dc,
    )

    for payload in (
        b"\xff\xd8\xff\xc0\x00\x03\x08",  # SOF0 body shorter than its fields
        b"\xff\xd8\xff\xc0\x00\x02",  # zero-body SOF0
        b"\xff\xd8\xff\xc4\x00\x05\x00\x01\x02",  # DHT shorter than 17 bytes
        b"\xff\xd8\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        b"\xff\xda\x00\x04\x01\x01",  # SOS body shorter than its fields
    ):
        with pytest.raises(MediaDecodeError):
            decode_jpeg(payload)

    good = encode_jpeg_gray_dc(np.array([[8]], dtype=np.int64), 8, 8)
    ref = decode_jpeg(good)
    assert decode_jpeg(good[:2] + b"\xff" + good[2:]) == ref  # fill byte
    assert decode_jpeg(good[:2] + b"\xff\x01" + good[2:]) == ref  # TEM

    with pytest.raises(ValueError, match="category 12"):
        encode_jpeg_gray_dc(np.array([[-1024, 1024]], dtype=np.int64), 16, 8)


def test_decode_jpeg_color_dc_only_exact():
    """4:2:0 color JPEG with DC-only levels ≡ 0 (mod 8): every plane block
    is an exact constant; decoded mean must equal the independent plane
    reconstruction + fixed-point YCbCr→RGB conversion bit-for-bit."""
    import numpy as np

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        _ycbcr_to_rgb,
        decode_jpeg,
        encode_jpeg_color_dc,
    )

    rng = np.random.default_rng(11)
    for (w, h) in [(16, 16), (32, 16), (48, 32)]:
        yl = (rng.integers(-100, 101, size=(h // 8, w // 8)) * 8).astype(np.int64)
        cbl = (rng.integers(-100, 101, size=(h // 16, w // 16)) * 8).astype(np.int64)
        crl = (rng.integers(-100, 101, size=(h // 16, w // 16)) * 8).astype(np.int64)
        got = decode_jpeg(encode_jpeg_color_dc(yl, cbl, crl, w, h))
        yp = np.clip(yl // 8 + 128, 0, 255).repeat(8, 0).repeat(8, 1)
        cbp = np.clip(cbl // 8 + 128, 0, 255).repeat(16, 0).repeat(16, 1)
        crp = np.clip(crl // 8 + 128, 0, 255).repeat(16, 0).repeat(16, 1)
        rgb = _ycbcr_to_rgb(yp, cbp, crp)
        assert got == (w, h, int(rgb.sum()) / (rgb.size * 255))


def test_ycbcr_fixed_point_matches_floor_formula():
    """The int64 arithmetic shift in _ycbcr_to_rgb must agree with the
    FLOOR(x/65536.0) form the oracle SQL uses, across negative offsets."""
    import numpy as np

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        _ycbcr_to_rgb,
    )

    y = np.full((41, 41), 128, dtype=np.int64)
    cb, cr = np.meshgrid(np.arange(108, 149), np.arange(108, 149))
    rgb = _ycbcr_to_rgb(y, cb.astype(np.int64), cr.astype(np.int64))
    import math

    for i in range(41):
        for j in range(41):
            cb_, cr_ = int(cb[i, j]) - 128, int(cr[i, j]) - 128
            r = 128 + math.floor((91881 * cr_ + 32768) / 65536)
            g = 128 + math.floor((-22554 * cb_ - 46802 * cr_ + 32768) / 65536)
            b = 128 + math.floor((116130 * cb_ + 32768) / 65536)
            assert (rgb[0, i, j], rgb[1, i, j], rgb[2, i, j]) == (r, g, b)


def test_decode_jpeg_color_rejects_malformed():
    """Scan/frame component mismatch, bad sampling factors, and truncated
    color scans fail loudly; grayscale behavior is unchanged."""
    import numpy as np
    import pytest

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        MediaDecodeError,
        decode_image,
        decode_jpeg,
        encode_jpeg_color_dc,
    )

    z2 = np.zeros((2, 2), dtype=np.int64)
    z1 = np.zeros((1, 1), dtype=np.int64)
    good = encode_jpeg_color_dc(z2, z1, z1, 16, 16)
    assert decode_jpeg(good) == (16, 16, 128 * 3 / (3 * 255))
    assert decode_image(good) == (16, 16, 128 / 255)

    with pytest.raises(MediaDecodeError):
        decode_jpeg(good[:-8])  # color scan cut before all MCUs decode

    # frame says 3 components, scan says 1 → loud mismatch
    sos = good.find(b"\xff\xda")
    bad = good[:sos] + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00" + good[sos + 12 :]
    with pytest.raises(MediaDecodeError, match="component count differs"):
        decode_jpeg(bad)

    # sampling factor 0 is out of the 1..4 range
    sof = good.find(b"\xff\xc0")
    mut = bytearray(good)
    mut[sof + 11] = 0x02  # component 1 hv 0x22 -> 0x02 (h=0)
    with pytest.raises(MediaDecodeError, match="sampling factors"):
        decode_jpeg(bytes(mut))

    with pytest.raises(ValueError, match="mod 16"):
        encode_jpeg_color_dc(z2, z1, z1, 8, 8)


def test_perceptual_hash_known_images(spark):
    """aHash kernel truth on hand-built rasters: a constant image sets every
    bit (g*64 >= total is equality everywhere); a half-black/half-white
    image sets exactly the bright half, big-endian packed."""
    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        perceptual_hash,
    )

    flat = _ppm(8, 8, [7] * (3 * 64))
    # top 4 rows black, bottom 4 rows white -> bits 0..31 = 0, 32..63 = 1
    split = _ppm(8, 8, [0] * (3 * 32) + [255] * (3 * 32))
    media = spark.createDataFrame(
        [(1, "image", bytearray(flat), "s"), (2, "image", bytearray(split), "s")],
        MEDIA_SCHEMA,
    )
    got = {r.media_id: r for r in perceptual_hash(media).collect()}

    assert (got[1].hash_hi, got[1].hash_lo, got[1].n_set) == (2**32 - 1, 2**32 - 1, 64)
    assert (got[2].hash_hi, got[2].hash_lo, got[2].n_set) == (0, 2**32 - 1, 32)
    # hamming distance via xor bit_count on the packed halves = 32
    h = bin(got[1].hash_hi ^ got[2].hash_hi).count("1") + bin(
        got[1].hash_lo ^ got[2].hash_lo
    ).count("1")
    assert h == 32


# -- GIF / LZW (round 5) --------------------------------------------------------


def test_gif_lzw_roundtrip_stress():
    """encode->decode identity over adversarial inputs: random bytes, tiny
    alphabets (deep table growth), arithmetic sequences, and constant runs
    (the KwKwK code path) — including lengths that land the final table add
    exactly on a power of two, where the tail phantom-tick convention is
    what keeps the EOI widths aligned."""
    import random

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    for seed in range(120):
        rng = random.Random(seed)
        n = rng.randrange(1, 3000)
        kind = seed % 4
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            data = bytes(rng.randrange(4) for _ in range(n))
        elif kind == 2:
            data = bytes((i * 7 + seed) % 256 for i in range(n))
        else:
            data = bytes([seed % 256]) * n
        assert _gif_lzw_decode(_gif_lzw_encode(data, 8), 8) == data, (seed, kind, n)


def test_decode_gif_known_image():
    """A hand-assembled 3x2 GIF with a grayscale palette decodes to the
    exact dimensions and mean; extension blocks are skipped; malformed
    variants raise MediaDecodeError."""
    import pytest

    from etl_process_for_detecting_fraudulent_transactions_spark.operators.multimodal import (
        MediaDecodeError,
        _gif_lzw_encode,
        decode_gif,
    )

    idx = bytes([0, 255, 10, 20, 30, 40])  # 3x2
    gct = bytes(v for j in range(256) for v in (j, j, j))
    lzw = _gif_lzw_encode(idx, 8)
    blocks = bytes([len(lzw)]) + lzw + b"\x00"
    ext = b"\x21\xfe\x03abc\x00"  # comment extension: must be skipped
    gif = (
        b"GIF89a"
        + (3).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0xF7, 0, 0]) + gct
        + ext
        + b"\x2c" + bytes(4)
        + (3).to_bytes(2, "little") + (2).to_bytes(2, "little") + b"\x00"
        + bytes([8]) + blocks + b"\x3b"
    )
    w, h, mean = decode_gif(gif)
    assert (w, h) == (3, 2)
    assert mean == sum(idx) / (len(idx) * 255)

    with pytest.raises(MediaDecodeError):
        decode_gif(b"GIF89a" + gif[6:20])  # truncated
    with pytest.raises(MediaDecodeError):
        decode_gif(gif.replace(b"\x00" + bytes([8]), b"\x40" + bytes([8]), 1))
    with pytest.raises(MediaDecodeError):
        decode_gif(b"NOPE" + gif[4:])
