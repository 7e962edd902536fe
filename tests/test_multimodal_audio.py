"""audio_window_stats: differential test against a local numpy
computation on the same PCM16 bytes, plus shape/edge cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xesmf_spark.multimodal import audio_window_stats


def _pcm16(samples):
    return np.asarray(samples, dtype="<i2").tobytes()


@pytest.fixture(scope="module")
def audio_df(spark):
    rng = np.random.RandomState(7)
    rows = []
    for did in range(5):
        n = 100 + 137 * did  # non-multiple of the window on purpose
        rows.append((did, bytearray(_pcm16(rng.randint(-32768, 32767, n)))))
    rows.append((99, bytearray(b"\x01")))  # single odd byte -> zero samples
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_matches_local_numpy(spark, audio_df):
    win = 64
    got = {
        (r["doc_id"], r["window_idx"]): (r["n_samples"], r["rms"], r["zcr"])
        for r in audio_window_stats(audio_df, window=win).collect()
    }
    for row in audio_df.collect():
        b = bytes(row["payload"])
        x = np.frombuffer(b[: len(b) - (len(b) % 2)], dtype="<i2").astype(np.float64)
        n_windows = 0
        for w in range(0, len(x), win):
            seg = x[w : w + win]
            k = (row["doc_id"], w // win)
            ns, rms, zcr = got[k]
            assert ns == len(seg)
            assert rms == pytest.approx(float(np.sqrt(np.mean(seg**2))), abs=1e-12)
            s = seg >= 0
            want_zcr = float(np.mean(s[1:] != s[:-1])) if len(seg) > 1 else 0.0
            assert zcr == pytest.approx(want_zcr, abs=1e-12)
            n_windows += 1
        assert sum(1 for k in got if k[0] == row["doc_id"]) == n_windows


def test_empty_payload_yields_no_rows(spark, audio_df):
    out = audio_window_stats(audio_df).filter(F.col("doc_id") == 99)
    assert out.count() == 0


def test_constant_signal(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_pcm16([1000] * 32)))], "doc_id long, payload binary"
    )
    [r] = audio_window_stats(df, window=32).collect()
    assert r["rms"] == pytest.approx(1000.0)
    assert r["zcr"] == 0.0
