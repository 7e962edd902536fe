"""Native RIFF/WAVE (PCM16) codec — the audio-side analogue of the
BMP/PNG/JPEG image codecs in :mod:`xesmf_spark.multimodal` /
:mod:`xesmf_spark.jpeg`.

Reference parity note: the reference engine (xESMF) has no media
pipeline at all — this module is part of the beyond-reference
training-data-pipeline surface the blueprint (SURVEY.md §2E) requires:
audio arrives as opaque ``binary`` WAV payloads and must be decoded to
PCM sample frames before windowed feature extraction
(:func:`xesmf_spark.multimodal.wav_audio_stats`).

Same layering discipline as the image codecs:

- ``encode_wav`` is the pure numpy + struct FIXTURE TWIN: it writes a
  canonical RIFF container (fmt + data, optional extra chunks, odd-size
  pad bytes) so round-trip tests pin every decoder path without any
  third-party audio library.
- ``decode_wav`` walks the chunk list the way the RIFF spec demands
  (unknown chunks skipped, odd chunk sizes padded to even), parses the
  ``fmt `` header, and returns interleaved-deframed int16 samples.
- Anything that is a real WAV but outside the PCM16 profile (IEEE
  float, A-law/mu-law, ADPCM, 8/24/32-bit PCM, WAVE_FORMAT_EXTENSIBLE)
  raises a LOUD ``NotImplementedError`` naming the gate — never junk
  samples. Payloads that are not RIFF/WAVE at all raise ``ValueError``.

Everything here is per-payload CPU work invoked from Arrow-batched
``mapInPandas`` kernels — the JVM ships opaque bytes, Python touches
each payload exactly once, no shuffle is introduced at any scale.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3
_ALAW = 6
_MULAW = 7
_EXTENSIBLE = 0xFFFE

_FORMAT_NAMES = {
    _IEEE_FLOAT: "IEEE float (format 3)",
    _ALAW: "A-law (format 6)",
    _MULAW: "mu-law (format 7)",
    _EXTENSIBLE: "WAVE_FORMAT_EXTENSIBLE (format 0xFFFE)",
}


def encode_wav(
    samples: "np.ndarray",
    sample_rate: int = 8000,
    extra_chunks: tuple = (),
) -> bytes:
    """Encode int16 PCM samples as a RIFF/WAVE payload.

    ``samples`` is ``(n,)`` mono or ``(n, ch)`` frames (channels
    interleaved on disk, per the WAV spec). ``extra_chunks`` is an
    optional tuple of ``(tag4: bytes, payload: bytes)`` written between
    ``fmt `` and ``data`` — fixtures use it to exercise the decoder's
    unknown-chunk skipping and odd-size padding paths."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"need (n,) or (n, ch) int16 samples, got shape {a.shape}")
    n, ch = a.shape
    if ch < 1 or ch > 0xFFFF:
        raise ValueError(f"channel count out of range: {ch}")
    if not (1 <= int(sample_rate) <= 0xFFFFFFFF):
        raise ValueError(f"sample_rate out of range: {sample_rate}")
    block_align = ch * 2
    byte_rate = int(sample_rate) * block_align
    fmt = struct.pack(
        "<HHIIHH", _PCM, ch, int(sample_rate), byte_rate, block_align, 16
    )
    data = a.tobytes()  # row-major == frame-interleaved for (n, ch)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        if len(tag) != 4:
            raise ValueError(f"chunk tag must be 4 bytes, got {tag!r}")
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    body = chunk(b"fmt ", fmt)
    for tag, payload in extra_chunks:
        body += chunk(bytes(tag), bytes(payload))
    body += chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(payload: bytes) -> tuple:
    """Decode a RIFF/WAVE payload to ``(frames, sample_rate)`` where
    ``frames`` is an ``(n, ch)`` int16 array (mono comes back as
    ``(n, 1)``).

    Chunk walk follows the RIFF rules: chunks appear in any order,
    unknown chunks are skipped, and every chunk is padded to an even
    byte boundary (the pad byte is NOT counted in the declared size).
    A truncated final chunk reads as far as the payload allows — the
    data chunk is clipped to whole frames. Non-PCM16 profiles gate
    loudly (NotImplementedError); structurally-broken payloads raise
    ValueError."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_seen = False
    audio_format = n_channels = sample_rate = bits = block_align = 0
    data = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        start = pos + 8
        end = min(start + size, len(b))
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too short: {size} bytes")
            if start + 16 > len(b):
                raise ValueError(
                    "truncated fmt chunk: declared size "
                    f"{size} but only {len(b) - start} bytes remain"
                )
            audio_format, n_channels, sample_rate, _rate, block_align, bits = (
                struct.unpack_from("<HHIIHH", b, start)
            )
            fmt_seen = True
        elif tag == b"data":
            data = b[start:end]
        pos = start + size + (size & 1)  # pad to even
    if not fmt_seen:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    if audio_format != _PCM:
        name = _FORMAT_NAMES.get(audio_format, f"format {audio_format}")
        raise NotImplementedError(
            f"WAV gate: only PCM16 is native; payload is {name}"
        )
    if bits != 16:
        raise NotImplementedError(
            f"WAV gate: only 16-bit PCM is native; payload is {bits}-bit"
        )
    if n_channels < 1:
        raise ValueError("fmt declares zero channels")
    frame_bytes = n_channels * 2
    if block_align not in (0, frame_bytes):
        raise ValueError(
            f"block_align {block_align} inconsistent with "
            f"{n_channels} x 16-bit channels"
        )
    n_frames = len(data) // frame_bytes
    frames = np.frombuffer(
        data[: n_frames * frame_bytes], dtype="<i2"
    ).reshape(n_frames, n_channels)
    return frames, int(sample_rate)
