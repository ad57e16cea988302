"""Pure-Python MJPEG-in-AVI container codec (RIFF, Microsoft AVI 1.0).

Closes the last media-format stub (S1 residual): images already decode
through the real PNG/JPEG codecs (functions/png.py, functions/jpeg.py);
this adds the VIDEO container so `video_frame_sample` / `video_shot_detect`
demux a real interchange format instead of opaque fixed-stride frame
bytes. Motion-JPEG was chosen because every frame is a baseline JPEG the
existing codec already reads — the reference's whole media front end is
rasterize/recompress (``fake_scan.py:216-272``, ``create_bbox_chunked.py:51``),
and MJPEG is exactly that shape as a video format.

Format knowledge is public: RIFF chunking (same container family as the
WAV codec in functions/wav.py), the AVI main/stream headers (``avih``,
``strh``/``strf``) and the ``movi``/``idx1`` layout are documented in the
Microsoft AVI RIFF reference and OpenDML AVI extensions.

Scope — AVI 1.0, one video stream:
- encode: ``avi_encode(frames, width, height, fps)`` writes RIFF('AVI ')
  with hdrl (avih + strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)),
  a movi LIST of ``00dc`` chunks (one JPEG per frame, word-aligned), and
  a full idx1 keyframe index.
- decode: ``avi_decode(payload)`` walks the RIFF tree, reads the headers,
  collects ``00dc``/``00db`` frame chunks (including inside ``rec `` LISTs),
  and returns the raw per-frame JPEG payloads plus container metadata.
  Every parse failure raises AviError (the same contract JpegError gives
  decode_external's fall-through).
"""

from __future__ import annotations

import struct


class AviError(ValueError):
    pass


_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + little-endian size + payload + even padding."""
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_encode(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Mux pre-encoded JPEG frames into a single-stream MJPEG AVI."""
    if not frames:
        raise AviError("avi_encode needs at least one frame")
    if width <= 0 or height <= 0 or fps <= 0:
        raise AviError("width/height/fps must be positive")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,      # dwMicroSecPerFrame
        max_bytes * fps,       # dwMaxBytesPerSec (upper bound)
        0,                     # dwPaddingGranularity
        _AVIF_HASINDEX,        # dwFlags
        n,                     # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_bytes,             # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,            # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"MJPG",
        0,                     # dwFlags
        0, 0,                  # wPriority, wLanguage
        0,                     # dwInitialFrames
        1, fps,                # dwScale / dwRate = frame period
        0,                     # dwStart
        n,                     # dwLength (frames)
        max_bytes,             # dwSuggestedBufferSize
        0,                     # dwQuality (driver default)
        0,                     # dwSampleSize (0: variable-size samples)
        0, 0, width, height,   # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                    # biSize
        width, height,
        1, 24,                 # biPlanes, biBitCount
        b"MJPG",               # biCompression
        width * height * 3,    # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    index = bytearray()
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        offset = 4 + len(movi_payload)
        movi_payload += _chunk(b"00dc", f)
        index += struct.pack(
            "<4sIII", b"00dc", _AVIIF_KEYFRAME, offset, len(f)
        )
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(b"idx1", bytes(index))

    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for chunks in [start, end)."""
    i = start
    while i + 8 <= end:
        fourcc = buf[i : i + 4]
        (size,) = struct.unpack_from("<I", buf, i + 4)
        body = i + 8
        if body + size > end:
            raise AviError(
                f"chunk {fourcc!r} at {i} overruns its parent "
                f"({body + size} > {end})"
            )
        yield fourcc, body, size
        i = body + size + (size & 1)  # word alignment


def avi_decode(payload: bytes) -> tuple[list[bytes], dict]:
    """Demux an AVI: ([jpeg_frame_bytes, ...], metadata).

    Metadata keys: width, height, n_frames (from avih), fps (from strh
    scale/rate when present), handler (fourcc string). The frame count in
    the header is cross-checked against the chunks actually found."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise AviError("not a RIFF file")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if payload[8:12] != b"AVI ":
        raise AviError(f"not an AVI (form {payload[8:12]!r})")
    end = min(8 + riff_size, len(payload))

    meta: dict = {"handler": None, "fps": None}
    frames: list[bytes] = []
    saw_avih = saw_movi = False

    def walk_list(body: int, size: int) -> None:
        nonlocal saw_movi
        list_type = payload[body : body + 4]
        inner_start, inner_end = body + 4, body + size
        if list_type == b"movi":
            saw_movi = True
            for fcc, b, s in _walk_chunks(payload, inner_start, inner_end):
                if fcc == b"LIST" and payload[b : b + 4] == b"rec ":
                    walk_list(b, s)
                elif fcc[2:4] in (b"dc", b"db"):
                    frames.append(payload[b : b + s])
        elif list_type in (b"hdrl", b"strl"):
            for fcc, b, s in _walk_chunks(payload, inner_start, inner_end):
                if fcc == b"LIST":
                    walk_list(b, s)
                else:
                    read_header(fcc, b, s)

    def read_header(fourcc: bytes, body: int, size: int) -> None:
        nonlocal saw_avih
        if fourcc == b"avih":
            if size < 40:
                raise AviError("avih header too short")
            vals = struct.unpack_from("<10I", payload, body)
            meta["n_frames"] = vals[4]
            meta["width"] = vals[8]
            meta["height"] = vals[9]
            saw_avih = True
        elif fourcc == b"strh":
            if size < 32:
                raise AviError("strh header too short")
            fcc_type = payload[body : body + 4]
            if fcc_type == b"vids":
                meta["handler"] = payload[body + 4 : body + 8].decode(
                    "ascii", "replace"
                )
                scale, rate = struct.unpack_from("<II", payload, body + 20)
                if scale:
                    meta["fps"] = rate // scale

    for fourcc, body, size in _walk_chunks(payload, 12, end):
        if fourcc == b"LIST":
            walk_list(body, size)
        # idx1 / JUNK / INFO: index not needed for a full sequential demux

    if not saw_avih:
        raise AviError("no avih header")
    if not saw_movi:
        raise AviError("no movi list")
    if meta.get("n_frames") != len(frames):
        raise AviError(
            f"header frame count {meta.get('n_frames')} != "
            f"{len(frames)} frame chunks in movi"
        )
    return frames, meta


def is_avi(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )
