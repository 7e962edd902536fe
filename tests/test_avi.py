"""Native AVI container codec: round-trips, container-walking paths,
and the loud profile gates (the wav.py test discipline)."""

import struct

import numpy as np
import pytest

from xesmf_spark.avi import decode_avi, encode_avi


def test_roundtrip_shapes_and_fps():
    rng = np.random.default_rng(11)
    for n, h, w in [(1, 1, 1), (3, 6, 6), (2, 5, 7), (4, 8, 6)]:
        x = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        fr, fps = decode_avi(encode_avi(x, fps=7))
        assert fps == 7
        assert np.array_equal(fr, x), (n, h, w)


def test_stride_padding_roundtrip():
    # width 6 -> 18-byte rows -> 2 pad bytes per row; width 7 -> 21 -> 3
    for w in (6, 7):
        x = np.arange(2 * 4 * w * 3, dtype=np.uint8).reshape(2, 4, w, 3)
        fr, _ = decode_avi(encode_avi(x, fps=5))
        assert np.array_equal(fr, x)


def test_unknown_chunks_skipped_and_idx1_present():
    x = np.zeros((2, 3, 3, 3), dtype=np.uint8)
    payload = encode_avi(x, fps=5)
    assert b"JUNK" in payload and b"idx1" in payload
    fr, _ = decode_avi(payload)
    assert fr.shape == (2, 3, 3, 3)


def test_structural_gates():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"OggS" + b"\x00" * 40)
    with pytest.raises(ValueError, match="missing avih"):
        decode_avi(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    x = np.zeros((1, 4, 4, 3), dtype=np.uint8)
    good = encode_avi(x, fps=5)
    # truncate inside the single frame chunk -> the movi walk sees a
    # declared size larger than the remaining bytes
    db_at = good.index(b"00db")
    with pytest.raises(ValueError, match="truncated frame|frame 0"):
        decode_avi(good[: db_at + 8 + 10])
    with pytest.raises(ValueError):
        encode_avi(np.zeros((0, 2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_avi(np.zeros((1, 2, 2, 4), dtype=np.uint8))


def test_profile_gates():
    x = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    good = bytearray(encode_avi(x, fps=5))
    # flip the frame tag to compressed '00dc'
    at = bytes(good).index(b"00db")
    compressed = bytes(good[:at]) + b"00dc" + bytes(good[at + 4 :])
    with pytest.raises(NotImplementedError, match="00dc"):
        decode_avi(compressed)
    # declare 32 bpp in strf (offset: biBitCount is 14 bytes into strf)
    at = bytes(good).index(b"strf") + 8 + 14
    bpp32 = bytearray(good)
    bpp32[at:at + 2] = struct.pack("<H", 32)
    with pytest.raises(NotImplementedError, match="24bpp"):
        decode_avi(bytes(bpp32))
    # declare 2 streams in avih (dwStreams is 24 bytes into avih)
    at = bytes(good).index(b"avih") + 8 + 24
    two = bytearray(good)
    two[at:at + 4] = struct.pack("<I", 2)
    with pytest.raises(NotImplementedError, match="single-stream"):
        decode_avi(bytes(two))
    # declare an audio stream in strh
    at = bytes(good).index(b"strh") + 8
    auds = bytearray(good)
    auds[at:at + 4] = b"auds"
    with pytest.raises(NotImplementedError, match="vids"):
        decode_avi(bytes(auds))


def test_video_frame_stats_matches_local_replay(spark):
    """attach_avi_payload + video_frame_stats == a pure-python replay
    from the text bytes (the query's oracle contract)."""
    from xesmf_spark.multimodal import attach_avi_payload, video_frame_stats

    texts = [
        (1, "a" * 120),            # 1 frame
        (2, "xyz" * 120),          # 3 frames, stride keeps 0 and 2
        (3, "s" * 50),             # too short -> no payload row
        (4, "q" * (108 * 9)),      # capped at 6 frames -> 0, 2, 4
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["frame_idx"]): (
            r["n_frames"],
            r["fps"],
            r["mean_r_milli"],
            r["mean_g_milli"],
            r["mean_b_milli"],
        )
        for r in video_frame_stats(attach_avi_payload(df), stride=2).collect()
    }
    exp = {}
    for did, text in texts:
        b = text.encode()
        n = min(len(b) // 108, 6)
        for f in range(0, n, 2):
            fb = b[f * 108 : (f + 1) * 108]
            sums = [sum(fb[3 * k + c] for k in range(36)) for c in range(3)]
            exp[(did, f)] = (
                n,
                5 + did % 3,
                *[(1000 * s) // 36 for s in sums],
            )
    assert got == exp
    assert (3, 0) not in got  # too-short doc emits nothing
