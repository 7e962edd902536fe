"""Multimodal columns: opaque binary payloads + typed metadata.

The engine's convention for image/audio/video at 100-TB scale: media
lives in a ``payload BINARY`` column (or object-store URIs resolved by
``spark.read.format('binaryFile')``), with typed metadata columns
(format, width, n_frames, sample_rate, ...) alongside. All media
compute runs in Arrow-batched Python (``mapInPandas``) — the payloads
never pass through row-at-a-time Python, and the JVM treats them as
opaque byte arrays (no codec work JVM-side).

Codec support is layered: uncompressed 24-bit BMP, PNG (bit depth 8,
gray/RGB/RGBA, all five scanline filters), and Huffman-coded JPEG
(baseline SOF0, extended-sequential SOF1, and PROGRESSIVE SOF2 — gray,
4:4:4, 4:2:0, 4:2:2; ``xesmf_spark.jpeg``) decode NATIVELY (pure
numpy + stdlib — no codec library needed, so the dominant interchange
formats including crawl-typical progressive JPEG work everywhere;
round-trip tested via the encoder twins ``encode_bmp``/``encode_png``/
``jpeg.encode_jpeg``/``jpeg.encode_jpeg_progressive``); arithmetic-
coded JPEG and other formats dispatch to PIL when importable and raise
loudly otherwise (PIL/librosa/ffmpeg are absent in this container).
``_fake_decode`` remains the deterministic stand-in so the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is
testable even for gated formats.

Operators:
- ``attach_payload``    — demo payload column from a text column
- ``extract_features``  — per-payload numeric features via mapInPandas
- ``sample_frames``     — fixed-stride frame sampling (one row per
                          frame) — the explode-shaped media op
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def encode_bmp(arr: "np.ndarray") -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (BITMAPINFOHEADER, BI_RGB, bottom-up rows, 4-byte row padding).
    Pure numpy + struct — the test/fixture twin of the BMP branch in
    :func:`decode_image`."""
    import struct

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"need (H, W, 3) uint8, got {a.shape}")
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3
    img = np.zeros((h, row_bytes), dtype=np.uint8)
    img[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = img.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(arr: "np.ndarray", filters=None) -> bytes:
    """Encode a uint8 array — (H, W) gray, (H, W, 3) RGB or (H, W, 4)
    RGBA — as a PNG (bit depth 8, no interlace).  ``filters`` picks
    the per-row filter type (int or list); default cycles 0..4 so a
    round-trip exercises EVERY unfilter path in :func:`decode_image`.
    Pure stdlib zlib + numpy — the fixture twin of the native PNG
    decoder, like ``encode_bmp`` for the BMP branch."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3, 4):
        raise ValueError(f"need (H,W[,1|3|4]) uint8, got {a.shape}")
    h, w, ch = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    if filters is None:
        row_filters = [(y % 5) for y in range(h)]
    elif isinstance(filters, int):
        row_filters = [filters] * h
    else:
        row_filters = list(filters)
        if len(row_filters) != h:
            raise ValueError(f"filters must have {h} entries")
    raw = a.reshape(h, w * ch).astype(np.int64)
    zero = np.zeros(w * ch, dtype=np.int64)
    out = bytearray()
    for y, ft in enumerate(row_filters):
        line, prev = raw[y], (raw[y - 1] if y > 0 else zero)
        left = np.concatenate([np.zeros(ch, np.int64), line[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if ft == 0:
            f = line
        elif ft == 1:
            f = line - left
        elif ft == 2:
            f = line - prev
        elif ft == 3:
            f = line - (left + prev) // 2
        elif ft == 4:
            pred = np.array(
                [_paeth(int(left[i]), int(prev[i]), int(ul[i])) for i in range(len(line))],
                dtype=np.int64,
            )
            f = line - pred
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out.append(ft)
        out.extend((f % 256).astype(np.uint8).tobytes())

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def _png_decode(payload: bytes) -> "np.ndarray":
    """Native PNG decode — pure stdlib zlib inflate + numpy unfilter
    (all five filter types 0/none, 1/sub, 2/up, 3/average, 4/Paeth),
    bit depth 8, color types 0 (gray), 2 (RGB), 6 (RGBA), no
    interlace — the dominant real-world PNG shapes.  Filters 0/1/2
    unfilter vectorized (cumsum-per-byte-lane for sub); 3/4 walk
    pixels left-to-right (inherently sequential recurrences) with the
    byte lanes vectorized."""
    import struct
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"native PNG path handles bit depth 8, no interlace "
            f"(got depth={depth}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 6: 4}.get(color_type)
    if ch is None:
        raise NotImplementedError(
            f"native PNG path handles color types 0/2/6, got {color_type}"
        )
    stride = w * ch
    lines = zlib.decompress(bytes(idat))
    if len(lines) != h * (stride + 1):
        raise ValueError(
            f"PNG scanline payload is {len(lines)} bytes, want {h * (stride + 1)}"
        )
    sl = np.frombuffer(lines, dtype=np.uint8).reshape(h, stride + 1)
    fts = sl[:, 0]
    rows = sl[:, 1:].astype(np.int64)
    recon = np.zeros((h, stride), dtype=np.int64)
    zero = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line, prev = rows[y], (recon[y - 1] if y > 0 else zero)
        ft = int(fts[y])
        if ft == 0:
            recon[y] = line
        elif ft == 1:
            # sub: recon[x] = line[x] + recon[x-ch] -> per-lane cumsum
            recon[y] = np.cumsum(line.reshape(w, ch), axis=0).reshape(stride) % 256
        elif ft == 2:
            recon[y] = (line + prev) % 256
        elif ft == 3:
            r = recon[y]
            left = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                s = x * ch
                cur = (line[s : s + ch] + (left + prev[s : s + ch]) // 2) % 256
                r[s : s + ch] = cur
                left = cur
        elif ft == 4:
            r = recon[y]
            left = np.zeros(ch, dtype=np.int64)
            ul = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                s = x * ch
                pr = prev[s : s + ch]
                pred = np.array(
                    [_paeth(int(left[i]), int(pr[i]), int(ul[i])) for i in range(ch)],
                    dtype=np.int64,
                )
                cur = (line[s : s + ch] + pred) % 256
                r[s : s + ch] = cur
                left, ul = cur, pr.copy()
        else:
            raise ValueError(f"bad PNG filter type {ft} on row {y}")
    img = recon.astype(np.uint8).reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to an (H, W, C) uint8 array.

    Uncompressed 24-bit BMP and PNG (bit depth 8, gray/RGB/RGBA, all
    five scanline filters, no interlace) decode NATIVELY (pure
    numpy + stdlib zlib — header parse, inflate, unfilter), so the two
    dominant interchange formats work without any codec library.
    Everything else dispatches to PIL when importable and raises
    otherwise (this container has no codecs)."""
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _png_decode(payload)
    if len(payload) >= 2 and payload[:2] == b"\xff\xd8":
        # Huffman-coded JPEG (baseline SOF0/SOF1 + progressive SOF2)
        # decodes natively (xesmf_spark.jpeg); the arithmetic-coded and
        # lossless SOF variants raise a loud NotImplementedError inside
        from xesmf_spark.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if len(payload) >= 2 and payload[:2] == b"BM":
        import struct

        offset = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            raise ValueError(f"unsupported BMP core header (size {hdr_size})")
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if compression != 0 or bpp != 24:
            raise NotImplementedError(
                f"native BMP path handles uncompressed 24-bit only "
                f"(got bpp={bpp}, compression={compression})"
            )
        bottom_up = h > 0
        h = abs(h)
        row_bytes = (w * 3 + 3) & ~3
        img = np.frombuffer(payload, dtype=np.uint8, count=h * row_bytes, offset=offset)
        img = img.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            img = img[::-1]
        return np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB
    if not HAVE_PIL:
        raise NotImplementedError(
            "non-BMP/PNG image decoding requires PIL; this environment has "
            "no codecs — use encode_bmp/encode_png/_fake_decode for tests"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(payload)))  # pragma: no cover


def _fake_decode(payload: bytes, width: int = 16) -> np.ndarray:
    """Deterministic stand-in decoder: interpret the payload bytes as a
    row-major uint8 'image' of fixed width (truncated/padded). Keeps
    every downstream shape real without codecs."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    h = max(1, len(arr) // width)
    arr = arr[: h * width]
    if len(arr) < width:
        arr = np.pad(arr, (0, width - len(arr)))
        h = 1
    return arr.reshape(h, width)


def _decode_or_fake(payload: bytes) -> np.ndarray:
    """Decode recognized image payloads LOUDLY; fake-decode the rest.

    A payload carrying a known codec signature (PNG / JPEG SOI / BMP)
    that then fails to decode must raise — NotImplementedError for the
    documented codec gates (arithmetic-coded JPEG, non-24bpp BMP) and
    ValueError for recognized-but-corrupt streams — never be silently
    replaced by deterministic junk pixels. ``_fake_decode`` remains the
    stand-in ONLY for payloads with no known signature (e.g. the
    synthetic ``documents`` table's text bytes)."""
    if (
        payload[: len(_PNG_SIG)] == _PNG_SIG
        or payload[:2] == b"\xff\xd8"
        or payload[:2] == b"BM"
    ):
        return decode_image(payload)
    return _fake_decode(payload)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo payload: utf-8 bytes of a text column as the opaque binary,
    with format metadata — stands in for decoded media blobs."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("raw/utf8").alias("format"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("payload_md5", StringType()),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Numeric features per payload via Arrow-batched ``mapInPandas``:
    byte stats + fake-decoded 'image' dimensions + content digest.

    The kernel sees a pandas DataFrame per Arrow batch — one vectorized
    pass per batch, no per-row Python in the JVM boundary. At scale this
    is the map-only stage you fuse feature extraction into right after
    a binaryFile scan (no shuffle)."""
    import hashlib

    id_out = [f.name for f in FEATURE_SCHEMA.fields][0]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                arr = np.frombuffer(b, dtype=np.uint8)
                img = _fake_decode(b)
                rows.append(
                    (
                        int(did),
                        len(b),
                        int(arr.sum()),
                        float(arr.mean()) if len(arr) else 0.0,
                        int(img.shape[0]),
                        int(img.shape[1]),
                        hashlib.md5(b).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select(F.col(id_col).alias(id_out), F.col(payload_col)).mapInPandas(
        kernel, FEATURE_SCHEMA
    )


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
    ]
)


WAV_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("format", StringType()),
    ]
)


def attach_wav_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo WAV payload column: each document's utf-8 bytes become
    int16 PCM samples (consecutive byte pairs, little-endian — the same
    stand-in interpretation as :func:`audio_window_stats`), containered
    as a real RIFF/WAVE file via :func:`xesmf_spark.wav.encode_wav`.
    Deterministic per doc so an SQL oracle can replay the samples from
    the text column:

    - ``sample_rate = 8000 + 4000 * (doc_id % 3)``  (8/12/16 kHz)
    - even ``doc_id`` → stereo: the sample stream deframes into
      (L, R) pairs, odd tail dropped; odd ``doc_id`` → mono
    - extra LIST + odd-length chunks exercise the decoder's
      unknown-chunk skip and even-padding paths on every payload
    """
    from xesmf_spark.wav import encode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                raw = str(text).encode("utf-8")
                x = np.frombuffer(
                    raw[: len(raw) - (len(raw) % 2)], dtype="<i2"
                )
                if did % 2 == 0:
                    x = x[: (len(x) // 2) * 2].reshape(-1, 2)
                ids.append(did)
                payloads.append(
                    encode_wav(
                        x,
                        sample_rate=8000 + 4000 * (did % 3),
                        extra_chunks=(
                            (b"LIST", b"INFOISFTxesmf_spark"),  # odd => padded
                            (b"note", b"demo"),
                        ),
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "format": "audio/wav",
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, WAV_PAYLOAD_SCHEMA
    )


WAV_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("window_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
    ]
)


def wav_audio_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window: int = 256,
) -> DataFrame:
    """Windowed audio features over REAL WAV containers: decode each
    payload with the native RIFF/PCM16 codec
    (:func:`xesmf_spark.wav.decode_wav` — chunk walk, header parse,
    loud non-PCM16 gates), downmix multi-channel frames to mono by
    arithmetic mean (float64 — exact for the int16 inputs), then emit
    per-``window`` RMS energy and zero-crossing rate exactly like
    :func:`audio_window_stats`, plus the parsed header fields
    (``sample_rate``, ``n_channels``) so container parsing itself is
    value-checked.

    Shape: one Arrow-batched ``mapInPandas`` pass; map-only, fuses
    behind the scan with no shuffle at any scale. Decode gates
    propagate (a non-PCM16 WAV fails the job loudly, per the
    image-codec discipline — never silent junk features)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    from xesmf_spark.wav import decode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srs, chs, widx, ns, rms, zcr = [], [], [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, sr = decode_wav(bytes(payload))
                ch = frames.shape[1]
                x = frames.astype(np.float64).mean(axis=1)
                for w in range(0, len(x), window):
                    seg = x[w : w + window]
                    ids.append(int(did))
                    srs.append(sr)
                    chs.append(ch)
                    widx.append(w // window)
                    ns.append(len(seg))
                    rms.append(float(np.sqrt(np.mean(seg * seg))))
                    s = seg >= 0
                    zcr.append(
                        float(np.mean(s[1:] != s[:-1])) if len(seg) > 1 else 0.0
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(srs, dtype="int32"),
                    "n_channels": pd.Series(chs, dtype="int32"),
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "zcr": pd.Series(zcr, dtype="float64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)).mapInPandas(
        kernel, WAV_WINDOW_SCHEMA
    )


def audio_window_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window: int = 256,
) -> DataFrame:
    """Windowed audio features over an opaque payload column: the
    payload is interpreted as PCM16 little-endian mono (the raw-audio
    contract; compressed codecs would decode upstream of this operator
    and are gated like ``decode_image``), split into fixed ``window``-
    sample windows (tail kept short), and each window yields RMS energy
    and zero-crossing rate — the standard first-stage audio features of
    a training-data pipeline (silence trim, speech/music heuristics).

    Shape: one Arrow-batched ``mapInPandas`` pass, per-payload work is
    a numpy reshape + two vectorized reductions; output is the
    explode-shaped one-row-per-window table. Map-only — fuses into the
    binaryFile scan with no shuffle at any scale.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, ns, rms, zcr = [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                x = np.frombuffer(b[: len(b) - (len(b) % 2)], dtype="<i2").astype(
                    np.float64
                )
                if len(x) == 0:
                    continue
                for w in range(0, len(x), window):
                    seg = x[w : w + window]
                    ids.append(int(did))
                    widx.append(w // window)
                    ns.append(len(seg))
                    rms.append(float(np.sqrt(np.mean(seg * seg))))
                    # sign changes between consecutive samples (zeros
                    # count as non-negative), per window
                    s = seg >= 0
                    zcr.append(
                        float(np.mean(s[1:] != s[:-1])) if len(seg) > 1 else 0.0
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "zcr": pd.Series(zcr, dtype="float64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)).mapInPandas(
        kernel, AUDIO_WINDOW_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 64,
    stride: int = 4,
) -> DataFrame:
    """Fixed-stride 'frame' sampling: emit every ``stride``-th
    ``frame_bytes`` chunk of each payload as its own row — the
    explode-shaped media op (video frame-sample / audio windowing).
    Output rows >> input rows; at scale follow with repartition to
    rebalance before expensive per-frame work."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n_frames = max(1, len(b) // frame_bytes)
                for k in range(0, n_frames, stride):
                    out_ids.append(int(did))
                    out_idx.append(k)
                    out_frames.append(b[k * frame_bytes : (k + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)).mapInPandas(
        kernel, FRAME_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    out_h: int = 8,
    out_w: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize each payload's image to (out_h, out_w) via Arrow-batched
    ``mapInPandas`` — the normalize-resolution stage of an image
    pipeline. Decode uses the real codec when present (PIL) and the
    deterministic stand-in otherwise; the RESAMPLE itself is real math
    either way: vectorized nearest-neighbor index sampling (one fancy
    index per image, no per-pixel Python). Emits the resized pixel
    buffer as row-major bytes with its dims — a map-only stage that
    fuses behind the scan, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, bufs = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                # recognized signatures decode for real (and fail loud);
                # unrecognized payloads use the deterministic stand-in
                img = _decode_or_fake(b)
                if img.ndim == 3:
                    img = img.mean(axis=2).astype(np.uint8)
                h, w = img.shape
                ri = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                ci = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                small = img[np.ix_(ri, ci)]
                ids.append(int(did))
                hs.append(out_h)
                ws.append(out_w)
                bufs.append(small.tobytes())
            yield pd.DataFrame(
                {"doc_id": ids, "height": hs, "width": ws, "pixels": bufs}
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)).mapInPandas(
        kernel, RESIZE_SCHEMA
    )


def ahash_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual AVERAGE-HASH (aHash) per image: decode -> grayscale
    -> 8x8 nearest-neighbor thumbnail (the :func:`resize_images`
    kernel), then bit b = (pixel_b > floor(mean)) packed row-major into
    two 32-bit halves ``hash_lo`` (pixels 0-31) and ``hash_hi``
    (32-63).  Two halves, not one 64-bit word: bit 63 would drive a
    BIGINT negative and engines disagree on signed shifts — two
    positive halves stay engine-exact, and Hamming distance is just
    popcount(xor) summed over halves.

    This is the image-side analogue of the text SimHash: identical
    images hash identically (exact dup groups = a hash equi-join),
    near-identical images differ in few bits (band the halves exactly
    like :func:`xesmf_spark.pipeline.simhash_pairs` for a
    Hamming-radius join at scale).  Everything after the thumbnail is
    JVM Column arithmetic — the Python kernel touches each image once.

    Output: (doc_id, hash_lo, hash_hi) — BIGINT halves in [0, 2^32)."""
    resized = resize_images(df, out_h=8, out_w=8, id_col=id_col, payload_col=payload_col)
    hx = resized.withColumn("hx", F.hex("pixels"))
    bv = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.conv(F.col("hx").substr(i * 2 + F.lit(1), F.lit(2)), 16, 10).cast(
            "long"
        ),
    )
    withm = hx.withColumn("bv", bv).withColumn(
        "m", F.expr("aggregate(bv, 0L, (a, x) -> a + x) div 64L")
    )
    half = (
        "aggregate(sequence({lo}, {hi}), 0L, "
        "(a, i) -> a + IF(element_at(bv, i + 1) > m, shiftleft(1L, i - {lo}), 0L))"
    )
    return withm.select(
        F.col("doc_id"),
        F.expr(half.format(lo=0, hi=31)).alias("hash_lo"),
        F.expr(half.format(lo=32, hi=63)).alias("hash_hi"),
    )


def hamming_pairs(
    hashes: DataFrame,
    radius: int = 3,
    id_col: str = "doc_id",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Banded Hamming-radius SELF-JOIN over 64-bit perceptual hashes
    stored as two 32-bit halves (``hash_lo``/``hash_hi`` — the
    :func:`ahash_images` layout): returns (id_a, id_b, hamming) for
    every pair within Hamming ``radius``, id_a < id_b.

    EXACTNESS (pigeonhole, the :func:`xesmf_spark.pipeline.
    simhash_pairs` argument applied to the image side): with
    ``radius + 1`` equal-width bands over the 64 bits, a pair within
    the radius differs in at most ``radius`` bit positions touching at
    most ``radius`` bands, so at least one band matches exactly and
    the pair surfaces from the band equi-join; the popcount-of-XOR
    verify then makes precision exact — 100% recall AND precision at
    the radius. ``radius + 1`` must be a power of two in [2, 64] so
    every band lies wholly inside one 32-bit half.

    Scale shape: banding is a pure projection exploding ``radius + 1``
    small rows per image; the candidate join is an equi-join on
    (band, band_hash) — shuffle keyed on small ints, broadcastable
    when one side is a probe set. ``max_bucket`` is the same skew
    valve as the text LSH joins: degenerate buckets (e.g. every
    all-black thumbnail hashing to 0) are dropped BEFORE the join —
    run exact-hash dedup first, as those groups are already exact
    dups."""
    n_bands = radius + 1
    width = 64 // n_bands
    if 64 % n_bands or 32 % width:
        raise ValueError(
            f"radius + 1 must be a power of two in [2, 64], got {n_bands}"
        )
    mask = (1 << width) - 1
    per_half = 32 // width
    band_structs = []
    for g in range(n_bands):
        src = "hash_lo" if g < per_half else "hash_hi"
        off = (g % per_half) * width
        band_structs.append(
            F.struct(
                F.lit(g).alias("band"),
                F.shiftright(F.col(src), off)
                .bitwiseAND(F.lit(mask))
                .alias("bh"),
            )
        )
    bands = hashes.select(
        F.col(id_col),
        "hash_lo",
        "hash_hi",
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select(
        id_col,
        "hash_lo",
        "hash_hi",
        F.col("bb.band").alias("band"),
        F.col("bb.bh").alias("bh"),
    )
    if max_bucket is not None:
        # valve as a window count over the SAME (band, bh) key the
        # self-join uses — one exchange shared by both join sides (AQE
        # exchange reuse) instead of size-aggregate + join-back
        from pyspark.sql import Window

        bands = (
            bands.withColumn(
                "bucket_n",
                F.count(F.lit(1)).over(Window.partitionBy("band", "bh")),
            )
            .filter(F.col("bucket_n") <= max_bucket)
            .drop("bucket_n")
        )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.hash_lo").alias("lo_a"),
            F.col("a.hash_hi").alias("hi_a"),
            F.col("b.hash_lo").alias("lo_b"),
            F.col("b.hash_hi").alias("hi_b"),
        )
    )
    # verify BEFORE distinct: popcount is a cheap projection and the
    # radius filter shrinks the dedup shuffle to true pairs only
    hamming = (
        F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    ).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= radius)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def ahash_dedup_pairs(
    df: DataFrame,
    radius: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash Hamming distance:
    :func:`ahash_images` (decode -> gray -> 8x8 -> aHash halves)
    composed with :func:`hamming_pairs` (pigeonhole-banded radius
    join). One Python decode pass per image; everything after is JVM
    Column arithmetic and equi-joins — the image twin of the text
    SimHash dedup pipeline."""
    return hamming_pairs(
        ahash_images(df, id_col=id_col, payload_col=payload_col),
        radius=radius,
        id_col="doc_id",
        max_bucket=max_bucket,
    )


WAV_RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sr_in", IntegerType()),
        StructField("n_in", IntegerType()),
        StructField("n_out", IntegerType()),
        StructField("window_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms_scaled", DoubleType()),
        StructField("zcr", DoubleType()),
    ]
)


def wav_resample_stats(
    df: DataFrame,
    sr_out: int = 8000,
    window: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Sample-rate conversion — the normalize-rate stage every audio
    pipeline runs before feature extraction — done in EXACT integer
    arithmetic: decode the WAV (native codec), downmix to DOUBLED mono
    numerators ``w = 2·mono`` (stereo mean keeps w integral), then
    linear-interpolation resample to ``sr_out`` keeping the scaled
    numerator

        W(j) = w[x0]·(sr_out − rem) + w[x1]·rem,
        x0 = (j·sr_in) DIV sr_out,  rem = (j·sr_in) MOD sr_out,
        x1 = min(x0 + 1, n−1),  n_out = (n−1)·sr_out DIV sr_in + 1

    — every W(j) is a plain BIGINT (signal scaled by 2·sr_out), so the
    per-window RMS/ZCR reduce over exact integers and both engines
    agree bit-for-bit (``rms_scaled`` = RMS of the scaled signal;
    divide by 2·sr_out for physical units). BIGINT headroom: the
    window's Σ W² tops out ≈ 32·(2·8000·32768)² ≈ 8.8e18 < 2^63 at
    the defaults — larger windows or rates need a smaller scale.

    One Arrow-batched map-only pass, fused behind the scan — the same
    zero-shuffle contract as every media kernel here."""
    if window < 1 or not (1 <= sr_out <= 192_000):
        raise ValueError(f"bad window={window} / sr_out={sr_out}")
    from xesmf_spark.wav import decode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "sr_in", "n_in", "n_out", "window_idx",
                "n_samples", "rms_scaled", "zcr",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, sr_in = decode_wav(bytes(payload))
                n = frames.shape[0]
                if n == 0:
                    continue
                ch = frames.shape[1]
                w = frames.astype(np.int64).sum(axis=1)
                if ch == 1:
                    w = 2 * w
                elif ch != 2:
                    # mean over ch channels: scale by 2/ch keeps
                    # integrality only for ch in (1, 2) — gate loudly
                    raise NotImplementedError(
                        f"integer resample supports mono/stereo, got {ch}"
                    )
                n_out = (n - 1) * sr_out // sr_in + 1
                j = np.arange(n_out, dtype=np.int64)
                x0 = (j * sr_in) // sr_out
                rem = (j * sr_in) % sr_out
                x1 = np.minimum(x0 + 1, n - 1)
                W = w[x0] * (sr_out - rem) + w[x1] * rem
                for wi in range(0, n_out, window):
                    seg = W[wi : wi + window]
                    rows["doc_id"].append(int(did))
                    rows["sr_in"].append(int(sr_in))
                    rows["n_in"].append(n)
                    rows["n_out"].append(int(n_out))
                    rows["window_idx"].append(wi // window)
                    rows["n_samples"].append(len(seg))
                    # exact int64 Σ W² (headroom documented above),
                    # single double division + sqrt at the end
                    ssq = int(np.sum(seg * seg, dtype=np.int64))
                    # float(ssq) FIRST: SQL computes CAST(ssq AS
                    # DOUBLE)/n; python int/int true division is
                    # correctly rounded on the exact rational and can
                    # differ in the last ulp once ssq > 2^53
                    rows["rms_scaled"].append(
                        float(np.sqrt(float(ssq) / len(seg)))
                    )
                    s = seg >= 0
                    rows["zcr"].append(
                        float(np.mean(s[1:] != s[:-1])) if len(seg) > 1 else 0.0
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "sr_in": pd.Series(rows["sr_in"], dtype="int32"),
                    "n_in": pd.Series(rows["n_in"], dtype="int32"),
                    "n_out": pd.Series(rows["n_out"], dtype="int32"),
                    "window_idx": pd.Series(rows["window_idx"], dtype="int32"),
                    "n_samples": pd.Series(rows["n_samples"], dtype="int32"),
                    "rms_scaled": pd.Series(rows["rms_scaled"], dtype="float64"),
                    "zcr": pd.Series(rows["zcr"], dtype="float64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)).mapInPandas(
        kernel, WAV_RESAMPLE_SCHEMA
    )


def resize_images_bilinear(
    df: DataFrame,
    out_h: int = 8,
    out_w: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Bilinear resize in EXACT fixed-point integers — the quality
    upgrade over :func:`resize_images`' nearest-neighbor sampling
    (training pipelines default to bilinear/area): with the half-pixel
    convention, the source y-coordinate of output row r is the
    rational ny/Dy where

        ny = max((2r+1)·H − OH, 0),  Dy = 2·OH,
        y0 = ny DIV Dy,  fy = ny MOD Dy,  y1 = min(y0+1, H−1)

    (same for x), and the output pixel is the ROUNDED integer
    combination

        (p00·(Dx−fx)·(Dy−fy) + p01·fx·(Dy−fy) + p10·(Dx−fx)·fy
         + p11·fx·fy + Dx·Dy/2) DIV (Dx·Dy)

    — no floats anywhere, so an SQL engine replays every byte.
    Grayscale first (truncated channel mean), like the nearest twin.
    Map-only Arrow pass fused behind the scan."""
    if out_h < 1 or out_w < 1:
        raise ValueError(f"bad output dims {out_h}x{out_w}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dy, dx = 2 * out_h, 2 * out_w
        den = dx * dy
        for pdf in batches:
            ids, hs, ws, bufs = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _decode_or_fake(bytes(payload))
                if img.ndim == 3:
                    img = img.mean(axis=2).astype(np.uint8)
                g = img.astype(np.int64)
                h, w = g.shape
                ny = np.maximum((2 * np.arange(out_h) + 1) * h - out_h, 0)
                nx = np.maximum((2 * np.arange(out_w) + 1) * w - out_w, 0)
                y0, fy = ny // dy, ny % dy
                x0, fx = nx // dx, nx % dx
                y1 = np.minimum(y0 + 1, h - 1)
                x1 = np.minimum(x0 + 1, w - 1)
                fyc, fxc = fy[:, None], fx[None, :]
                v = (
                    g[np.ix_(y0, x0)] * (dx - fxc) * (dy - fyc)
                    + g[np.ix_(y0, x1)] * fxc * (dy - fyc)
                    + g[np.ix_(y1, x0)] * (dx - fxc) * fyc
                    + g[np.ix_(y1, x1)] * fxc * fyc
                    + den // 2
                ) // den
                ids.append(int(did))
                hs.append(out_h)
                ws.append(out_w)
                bufs.append(v.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {"doc_id": ids, "height": hs, "width": ws, "pixels": bufs}
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)).mapInPandas(
        kernel, RESIZE_SCHEMA
    )


AVI_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("format", StringType()),
    ]
)

#: demo video geometry: 6x6 RGB frames => 108 text bytes per frame.
#: width 6 gives an 18-byte DIB row -> 2 pad bytes per row, so the
#: container's stride-padding path is exercised on every payload.
_AVI_W = 6
_AVI_H = 6
_AVI_FRAME_BYTES = _AVI_H * _AVI_W * 3
_AVI_MAX_FRAMES = 6


def attach_avi_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo AVI payload column: each document's utf-8 bytes become
    consecutive 6x6 RGB frames (108 bytes each, row-major, up to 6
    frames) containered as a real AVI file via
    :func:`xesmf_spark.avi.encode_avi` — deterministic per doc so an
    SQL oracle can replay every pixel from the text column (ASCII
    corpus, chars == bytes):

    - ``fps = 5 + doc_id % 3``
    - frame f's pixel (y, x, c) = text byte ``108·f + 18·y + 3·x + c``
    - docs shorter than one frame emit NO payload row (the honest
      too-short gate; the oracle states the same bound)

    The encoder's bottom-up BGR DIB rows + 4-byte stride padding are
    undone exactly by the decoder, so decoded pixels == text bytes."""
    from xesmf_spark.avi import encode_avi

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                raw = str(text).encode("utf-8")
                n = min(len(raw) // _AVI_FRAME_BYTES, _AVI_MAX_FRAMES)
                if n < 1:
                    continue
                arr = (
                    np.frombuffer(raw[: n * _AVI_FRAME_BYTES], dtype=np.uint8)
                    .reshape(n, _AVI_H, _AVI_W, 3)
                )
                ids.append(did)
                payloads.append(encode_avi(arr, fps=5 + did % 3))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "format": "video/avi",
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, AVI_PAYLOAD_SCHEMA
    )


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("mean_r_milli", LongType()),
        StructField("mean_g_milli", LongType()),
        StructField("mean_b_milli", LongType()),
    ]
)


def video_frame_stats(
    df: DataFrame,
    stride: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Fixed-stride VIDEO frame sampling over real AVI containers: walk
    the container (:func:`xesmf_spark.avi.decode_avi` — nested LISTs,
    JUNK/idx1 skipping, DIB stride/flip), keep every ``stride``-th
    frame, and emit exact per-channel means in milli units
    (``(1000·Σ channel bytes) div (h·w)`` BIGINT — no float).  The
    parsed container fields (n_frames, fps) ride along so container
    parsing itself is value-checked, the wav_audio_stats discipline.

    Scale shape: ONE map-only Arrow pass fused behind the scan — no
    shuffle at any scale; at web scale follow with repartition before
    per-frame heavy work (the sample_frames note)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    from xesmf_spark.avi import decode_avi

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in VIDEO_FRAME_SCHEMA.fields}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, fps = decode_avi(bytes(payload))
                n, h, w, _ = frames.shape
                px = h * w
                for f in range(0, n, stride):
                    sums = frames[f].reshape(px, 3).astype(np.int64).sum(axis=0)
                    out["doc_id"].append(int(did))
                    out["n_frames"].append(n)
                    out["fps"].append(fps)
                    out["frame_idx"].append(f)
                    out["mean_r_milli"].append(int(1000 * sums[0]) // px)
                    out["mean_g_milli"].append(int(1000 * sums[1]) // px)
                    out["mean_b_milli"].append(int(1000 * sums[2]) // px)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, VIDEO_FRAME_SCHEMA
    )
