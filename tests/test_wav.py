"""Native RIFF/WAVE codec: encode/decode round-trips (mono, stereo,
odd sizes, extra/unknown chunks, pad bytes), loud gates for non-PCM16
profiles, and the Spark-side wav_audio_stats operator differentially
against a local numpy replay."""

import struct

import numpy as np
import pytest

from xesmf_spark.wav import decode_wav, encode_wav


def test_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(11)
    for ch in (1, 2, 3):
        for n in (0, 1, 7, 256):
            x = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
            frames, sr = decode_wav(encode_wav(x, sample_rate=44100))
            assert sr == 44100
            assert frames.shape == (n, ch)
            assert np.array_equal(frames, x)


def test_mono_1d_input_and_header_fields():
    x = np.arange(-5, 5, dtype=np.int16)
    payload = encode_wav(x, sample_rate=16000)
    # fmt fields: PCM(1), 1 channel, rate, byte_rate, block_align, 16 bits
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    i = payload.index(b"fmt ") + 8
    fmt = struct.unpack_from("<HHIIHH", payload, i)
    assert fmt == (1, 1, 16000, 32000, 2, 16)
    frames, sr = decode_wav(payload)
    assert frames.shape == (10, 1) and sr == 16000
    assert np.array_equal(frames[:, 0], x)


def test_extra_chunks_skipped_and_odd_padding():
    x = np.array([[100, -100], [2000, -2000]], dtype=np.int16)
    # odd-length chunk BEFORE data forces the pad-byte advance; a second
    # chunk after it only parses right if padding was honored
    payload = encode_wav(
        x, extra_chunks=((b"junk", b"\xff" * 7), (b"LIST", b"INFO"))
    )
    frames, sr = decode_wav(payload)
    assert np.array_equal(frames, x)
    # chunk sizes in the container are the declared (unpadded) sizes
    j = payload.index(b"junk") + 4
    assert struct.unpack_from("<I", payload, j)[0] == 7


def test_gates_and_structural_errors():
    x = np.zeros(4, dtype=np.int16)
    good = encode_wav(x)

    # IEEE float gate: rewrite audio_format in place
    i = good.index(b"fmt ") + 8
    float_wav = bytearray(good)
    struct.pack_into("<H", float_wav, i, 3)
    with pytest.raises(NotImplementedError, match="IEEE float"):
        decode_wav(bytes(float_wav))

    # 24-bit gate: rewrite bits per sample
    b24 = bytearray(good)
    struct.pack_into("<H", b24, i + 14, 24)
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_wav(bytes(b24))

    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    # RIFF/WAVE but no chunks at all
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    # fmt present, data missing
    no_data = good[: good.index(b"data")]
    with pytest.raises(ValueError, match="missing data"):
        decode_wav(no_data)


def test_truncated_data_clips_to_whole_frames():
    x = np.arange(8, dtype=np.int16).reshape(4, 2)
    payload = encode_wav(x)
    # chop 3 bytes off the end: last frame is partial and must drop
    frames, _ = decode_wav(payload[:-3])
    assert frames.shape == (3, 2)
    assert np.array_equal(frames, x[:3])


def test_wav_audio_stats_differential(spark):
    from xesmf_spark.multimodal import wav_audio_stats

    rng = np.random.RandomState(3)
    rows, local = [], {}
    for did, ch in ((0, 1), (1, 2), (2, 3)):
        n = 50 + 31 * did
        x = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
        rows.append((did, bytearray(encode_wav(x, sample_rate=8000 + did))))
        local[did] = (x.astype(np.float64).mean(axis=1), 8000 + did, ch)
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = wav_audio_stats(df, window=16).collect()
    got = {
        (r["doc_id"], r["window_idx"]): r
        for r in out
    }
    n_expected = 0
    for did, (mono, sr, ch) in local.items():
        for w in range(0, len(mono), 16):
            seg = mono[w : w + 16]
            r = got[(did, w // 16)]
            n_expected += 1
            assert r["sample_rate"] == sr and r["n_channels"] == ch
            assert r["n_samples"] == len(seg)
            assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(seg * seg))))
            s = seg >= 0
            want_zcr = float(np.mean(s[1:] != s[:-1])) if len(seg) > 1 else 0.0
            assert r["zcr"] == pytest.approx(want_zcr)
    assert len(out) == n_expected


def test_wav_audio_stats_gate_propagates(spark):
    from xesmf_spark.multimodal import wav_audio_stats

    good = encode_wav(np.zeros(4, dtype=np.int16))
    i = good.index(b"fmt ") + 8
    bad = bytearray(good)
    struct.pack_into("<H", bad, i, 7)  # mu-law
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bad)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="mu-law"):
        wav_audio_stats(df, window=4).collect()


def test_attach_wav_payload_deterministic(spark):
    from xesmf_spark.multimodal import attach_wav_payload, wav_audio_stats

    docs = spark.createDataFrame(
        [(0, "stereo doc with enough text!"), (1, "mono doc text here"), (3, "x")],
        "doc_id long, text string",
    )
    wavs = {r["doc_id"]: bytes(r["payload"]) for r in attach_wav_payload(docs).collect()}
    # doc 0: even => stereo at 8000 Hz; text 28 bytes -> 14 samples -> 7 frames
    f0, sr0 = decode_wav(wavs[0])
    assert (sr0, f0.shape) == (8000, (7, 2))
    raw = "stereo doc with enough text!".encode()
    assert np.array_equal(
        f0.reshape(-1), np.frombuffer(raw, dtype="<i2")
    )
    # doc 1: odd => mono at 12000 Hz; 18 bytes -> 9 samples
    f1, sr1 = decode_wav(wavs[1])
    assert (sr1, f1.shape) == (12000, (9, 1))
    # doc 3: 1 byte -> zero samples; mono at 8000 Hz (3 % 3 == 0)
    f3, sr3 = decode_wav(wavs[3])
    assert (sr3, f3.shape) == (8000, (0, 1))
    # and the stats pass over attached payloads emits no rows for doc 3
    out = wav_audio_stats(attach_wav_payload(docs), window=4)
    assert sorted({r["doc_id"] for r in out.collect()}) == [0, 1]


def test_wav_resample_stats_matches_local_replay(spark):
    """wav_resample_stats: the scaled integer numerators equal a local
    replay at 2/3, 1/2 and identity ratios; identity resampling keeps
    exactly the doubled input signal; non-mono/stereo gates loudly."""
    from xesmf_spark.multimodal import wav_resample_stats

    rng = np.random.RandomState(5)
    rows, srs = [], {0: 16000, 1: 12000, 2: 8000}
    sigs = {}
    for did, sr in srs.items():
        n = 70 + 13 * did
        x = rng.randint(-32768, 32768, n).astype(np.int16)
        sigs[did] = x
        rows.append((did, bytearray(encode_wav(x, sample_rate=sr))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {}
    for r in wav_resample_stats(df, sr_out=8000, window=16).collect():
        got.setdefault(r["doc_id"], {})[r["window_idx"]] = r

    for did, sr in srs.items():
        x = sigs[did].astype(np.int64)
        w = 2 * x
        n = len(x)
        n_out = (n - 1) * 8000 // sr + 1
        j = np.arange(n_out, dtype=np.int64)
        x0 = (j * sr) // 8000
        rem = (j * sr) % 8000
        x1 = np.minimum(x0 + 1, n - 1)
        W = w[x0] * (8000 - rem) + w[x1] * rem
        if sr == 8000:  # identity ratio: scaled copy of the input
            assert np.array_equal(W, 8000 * w)
        for wi in range(0, n_out, 16):
            seg = W[wi : wi + 16]
            r = got[did][wi // 16]
            assert (r["sr_in"], r["n_in"], r["n_out"]) == (sr, n, n_out)
            assert r["n_samples"] == len(seg)
            ssq = int(np.sum(seg * seg, dtype=np.int64))
            assert r["rms_scaled"] == float(np.sqrt(float(ssq) / len(seg)))
            s = seg >= 0
            want = float(np.mean(s[1:] != s[:-1])) if len(seg) > 1 else 0.0
            assert r["zcr"] == pytest.approx(want)

    tri = spark.createDataFrame(
        [(9, bytearray(encode_wav(np.zeros((4, 3), dtype=np.int16))))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="mono/stereo"):
        wav_resample_stats(tri, sr_out=8000).collect()


def test_truncated_fmt_chunk_raises_valueerror():
    """A fmt chunk whose declared size is >= 16 but whose payload is
    cut off must raise the documented ValueError, not struct.error
    (ADVICE r12)."""
    x = np.arange(4, dtype=np.int16)
    payload = encode_wav(x)
    fmt_at = payload.index(b"fmt ")
    # cut inside the 16-byte fmt payload (8 bytes past the header)
    truncated = payload[: fmt_at + 8 + 8]
    with pytest.raises(ValueError, match="truncated fmt"):
        decode_wav(truncated)
