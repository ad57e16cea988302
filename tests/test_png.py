"""Pure-numpy PNG codec: round-trips, every scanline filter, error paths."""

import struct
import zlib

import numpy as np
import pytest

from ocr_machine_ray.functions.images import decode_external
from ocr_machine_ray.functions.png import (
    _SIG,
    _chunk,
    png_decode,
    png_encode,
)


def _encode_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-rolled encoder applying a given filter type per scanline —
    produces the streams a third-party encoder would, so the decoder's
    filter support is tested against independently constructed input."""
    h, w = img.shape
    out = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        line = img[y].astype(np.int32)
        f = ftypes[y % len(ftypes)]
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - np.concatenate(([0], line[:-1]))
        elif f == 2:
            filt = line - prev
        elif f == 3:
            left = np.concatenate(([0], line[:-1]))
            filt = line - ((left + prev) >> 1)
        else:  # 4: Paeth
            filt = np.empty(w, dtype=np.int32)
            for x in range(w):
                a = int(line[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                filt[x] = line[x] - pred
        out.append(f)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_gray():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    assert (png_decode(png_encode(img)) == img).all()


def test_roundtrip_rgb():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 9, 3), dtype=np.uint8)
    out = png_decode(png_encode(img))
    assert out.shape == img.shape and (out == img).all()


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_all_filters(ftypes):
    rng = np.random.default_rng(sum(ftypes) + 7)
    img = rng.integers(0, 256, (20, 31), dtype=np.uint8)
    data = _encode_with_filters(img, ftypes)
    assert (png_decode(data) == img).all()


def test_decode_external_routes_png():
    img = np.arange(96 * 64, dtype=np.uint8).reshape(64, 96) % 251
    assert (decode_external(png_encode(img), "png") == img).all()


def test_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JUNKJUNK" + b"\x00" * 40)


def test_bad_crc():
    data = bytearray(png_encode(np.zeros((4, 4), dtype=np.uint8)))
    data[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(data))


def test_truncated_idat():
    img = np.zeros((4, 4), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0)  # claims 5 rows
    data = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(4 * (1 + 4))))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT size"):
        png_decode(data)


def test_other_codecs_still_stub():
    # Baseline JPEG is real now (functions/jpeg.py); a truncated payload the
    # codec rejects falls through to the PIL/cv2 gate and then the stub.
    with pytest.raises(NotImplementedError):
        decode_external(b"\xff\xd8\xff", "jpeg")
    # Video demux remains a documented stub regardless of libraries.
    with pytest.raises(NotImplementedError):
        decode_external(b"\x00\x00\x00\x18ftypmp42", "mp4")


class TestPnm:
    def test_pgm_roundtrip_via_decode_external(self):
        import numpy as np
        from ocr_machine_ray.functions.images import decode_external
        from ocr_machine_ray.functions.png import pnm_encode

        img = np.random.default_rng(7).integers(0, 256, (24, 80), dtype=np.uint8)
        assert np.array_equal(decode_external(pnm_encode(img), "pgm"), img)

    def test_ppm_rgb_roundtrip(self):
        import numpy as np
        from ocr_machine_ray.functions.png import pnm_decode, pnm_encode

        rgb = np.random.default_rng(8).integers(0, 256, (12, 9, 3), dtype=np.uint8)
        assert np.array_equal(pnm_decode(pnm_encode(rgb)), rgb)

    def test_comment_and_whitespace_header(self):
        import numpy as np
        from ocr_machine_ray.functions.png import pnm_decode

        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        data = b"P5 # inline\n# full line comment\n 4\t3 \n255\n" + img.tobytes()
        assert np.array_equal(pnm_decode(data), img)

    def test_rejects_ascii_variants(self):
        import pytest
        from ocr_machine_ray.functions.png import pnm_decode

        with pytest.raises(ValueError):
            pnm_decode(b"P2\n2 2\n255\n0 1 2 3")
