"""Native AVI (RIFF) video container codec — uncompressed 24-bit DIB
frames, no external libraries.

The video-side sibling of the WAV codec (``xesmf_spark.wav``) and the
BMP/PNG/JPEG image codecs: enough of the real AVI container format
(public spec: RIFF 'AVI ' -> LIST 'hdrl' {avih, LIST 'strl' {strh,
strf}} -> LIST 'movi' {'00db' frames} -> 'idx1') to round-trip
uncompressed RGB frame stacks byte-exactly and to exercise every
container-walking path a production frame sampler needs: nested LIST
recursion, unknown-chunk skipping (JUNK/idx1), RIFF even-byte padding,
bottom-up BGR row order, and 4-byte DIB row stride padding.

Gates follow the codec-family discipline: recognized-but-non-native
profiles (compressed '00dc' frames, bpp != 24, biCompression != BI_RGB,
multiple streams) raise ``NotImplementedError`` LOUDLY; structurally
broken payloads raise ``ValueError``. Reference for the stand-in role:
xESMF has no media path at all — this models the opaque-binary +
typed-metadata convention of SURVEY.md §2D at 100 TB scale.
"""

from __future__ import annotations

import struct

import numpy as np

_BI_RGB = 0


def _dib_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def _chunk(tag: bytes, payload: bytes) -> bytes:
    if len(tag) != 4:
        raise ValueError(f"chunk tag must be 4 bytes, got {tag!r}")
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(subtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", subtype + payload)


def encode_avi(frames: "np.ndarray", fps: int = 10) -> bytes:
    """Encode an ``(n, h, w, 3)`` uint8 RGB top-down frame stack as a
    spec-shaped AVI: avih + strh('vids'/'DIB ') + strf(BITMAPINFOHEADER
    24bpp BI_RGB) headers, one '00db' chunk per frame (bottom-up BGR
    rows, stride padded to 4 bytes), a JUNK chunk (exercises skipping),
    and an idx1 index."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"frames must be (n, h, w, 3) uint8, got {arr.shape}")
    n, h, w, _ = arr.shape
    if n < 1 or h < 1 or w < 1:
        raise ValueError(f"empty frame stack {arr.shape}")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    stride = _dib_stride(w)
    frame_bytes = stride * h

    dibs = []
    for f in range(n):
        # top-down RGB -> bottom-up BGR with per-row zero padding
        bgr = arr[f, ::-1, :, ::-1]
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        dibs.append(rows.tobytes())

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"DIB ",
        0,  # dwFlags
        0, 0,  # priority, language
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate  (fps = rate / scale)
        0,  # dwStart
        n,  # dwLength
        frame_bytes,  # dwSuggestedBufferSize
        0,  # dwQuality
        0,  # dwSampleSize
        0, 0, int(w), int(h),  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        w,
        h,  # positive = bottom-up
        1,  # biPlanes
        24,  # biBitCount
        _BI_RGB,  # biCompression
        frame_bytes,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    junk = _chunk(b"JUNK", b"xesmf_spark avi writer")
    movi_payload = b"".join(_chunk(b"00db", d) for d in dibs)
    movi = _list(b"movi", movi_payload)
    # idx1 offsets are relative to the 'movi' subtype fourcc start
    idx, off = [], 4
    for d in dibs:
        idx.append(struct.pack("<4sIII", b"00db", 0x10, off, len(d)))
        off += 8 + len(d) + (len(d) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + junk + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(b: bytes, pos: int, end: int):
    """Yield (tag, start, size) for the chunk sequence in b[pos:end],
    honoring RIFF even padding."""
    while pos + 8 <= end:
        tag = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        start = pos + 8
        yield tag, start, size
        pos = start + size + (size & 1)


def decode_avi(payload: bytes) -> tuple:
    """Decode an AVI payload to ``(frames, fps)`` with ``frames`` an
    ``(n, h, w, 3)`` uint8 RGB top-down array.

    Chunk walk: LIST 'hdrl' is recursed for avih/strh/strf, unknown
    chunks (JUNK, idx1, vendor chunks) are skipped, LIST 'movi'
    supplies the '00db' frame chunks in order.  Native profile is
    single-stream 24bpp BI_RGB DIB video; compressed frames ('00dc'),
    other bit depths, non-BI_RGB compression, and multi-stream files
    gate with NotImplementedError.  Structurally broken payloads
    (bad magic, missing headers, truncated frame chunks) raise
    ValueError."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = bpp = compression = n_streams = 0
    rate = scale = 0
    saw_avih = saw_strf = False
    frames_raw: list[bytes] = []

    for tag, start, size in _walk(b, 12, len(b)):
        end = min(start + size, len(b))
        if tag != b"LIST":
            continue  # JUNK / idx1 / vendor chunks skip
        subtype = b[start : start + 4]
        if subtype == b"hdrl":
            for t2, s2, z2 in _walk(b, start + 4, end):
                if t2 == b"avih":
                    if s2 + 28 > len(b):
                        raise ValueError("truncated avih chunk")
                    n_streams = struct.unpack_from("<I", b, s2 + 24)[0]
                    saw_avih = True
                elif t2 == b"LIST" and b[s2 : s2 + 4] == b"strl":
                    for t3, s3, z3 in _walk(b, s2 + 4, min(s2 + z2, len(b))):
                        if t3 == b"strh":
                            if s3 + 32 > len(b):
                                raise ValueError("truncated strh chunk")
                            fcc = b[s3 : s3 + 4]
                            if fcc != b"vids":
                                raise NotImplementedError(
                                    f"AVI gate: only 'vids' streams are "
                                    f"native; found {fcc!r}"
                                )
                            scale, rate = struct.unpack_from("<II", b, s3 + 20)
                        elif t3 == b"strf":
                            if s3 + 20 > len(b):
                                raise ValueError("truncated strf chunk")
                            (_, width, height, _, bpp, compression) = (
                                struct.unpack_from("<IiiHHI", b, s3)
                            )
                            saw_strf = True
        elif subtype == b"movi":
            for t2, s2, z2 in _walk(b, start + 4, end):
                if t2 == b"00dc":
                    raise NotImplementedError(
                        "AVI gate: compressed '00dc' frames are not native "
                        "(only uncompressed '00db' DIB)"
                    )
                if t2 == b"00db":
                    if s2 + z2 > len(b):
                        raise ValueError("truncated frame chunk")
                    frames_raw.append(b[s2 : s2 + z2])

    if not saw_avih or not saw_strf:
        raise ValueError("missing avih/strf header chunks")
    if n_streams != 1:
        raise NotImplementedError(
            f"AVI gate: only single-stream files are native; "
            f"header declares {n_streams}"
        )
    if bpp != 24 or compression != _BI_RGB:
        raise NotImplementedError(
            f"AVI gate: only 24bpp BI_RGB DIB is native; payload is "
            f"{bpp}bpp compression={compression}"
        )
    if width < 1 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    stride = _dib_stride(width)
    need = stride * height
    out = np.empty((len(frames_raw), height, width, 3), dtype=np.uint8)
    for i, fr in enumerate(frames_raw):
        if len(fr) < need:
            raise ValueError(
                f"frame {i}: {len(fr)} bytes < required {need}"
            )
        rows = np.frombuffer(fr[:need], dtype=np.uint8).reshape(height, stride)
        out[i] = rows[:, : width * 3].reshape(height, width, 3)[::-1, :, ::-1]
    fps = rate // scale if scale else 0
    if fps < 1:
        raise ValueError(f"bad frame rate rate={rate} scale={scale}")
    return out, int(fps)
