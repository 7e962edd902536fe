"""Tests for the multimodal binary-column plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xesmf_spark import multimodal as MM


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = MM.attach_payload(docs.limit(50))
    p.persist().count()
    return p


def test_extract_features_matches_direct(spark, payloads):
    rows = {r.doc_id: r for r in MM.extract_features(payloads).collect()}
    src = {r.doc_id: bytes(r.payload) for r in payloads.collect()}
    assert set(rows) == set(src)
    for did, b in src.items():
        arr = np.frombuffer(b, dtype=np.uint8)
        r = rows[did]
        assert r.n_bytes == len(b)
        assert r.byte_sum == int(arr.sum())
        assert abs(r.mean_byte - float(arr.mean())) < 1e-12
        assert r.width == 16
        assert r.height == max(1, len(b) // 16)


def test_sample_frames_shape(spark, payloads):
    frames = MM.sample_frames(payloads, frame_bytes=64, stride=4)
    got = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    src = {r.doc_id: bytes(r.payload) for r in payloads.collect()}
    for r in got.collect():
        n_frames = max(1, len(src[r.doc_id]) // 64)
        expect = len(range(0, n_frames, 4))
        assert r.n == expect
    # frame content round-trips
    f0 = {r.doc_id: bytes(r.frame) for r in frames.filter("frame_idx = 0").collect()}
    for did, b in src.items():
        assert f0[did] == b[:64]


def test_decode_image_gated(spark):
    if not MM.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            MM.decode_image(b"\x00" * 100)


def test_fake_decode_shapes():
    assert MM._fake_decode(b"x" * 160).shape == (10, 16)
    assert MM._fake_decode(b"x" * 7).shape == (1, 16)
    assert MM._fake_decode(b"x" * 170).shape == (10, 16)  # truncates remainder


def test_binaryfile_source_into_extract_features(spark, tmp_path):
    """The real object-store ingestion path: spark.read.format
    ('binaryFile') over a directory of media blobs, doc ids carved from
    the file path JVM-side, content wired straight into the
    extract_features mapInPandas kernel — the no-shuffle scan+featurize
    stage the module doc promises."""
    import hashlib

    blobs = {i: bytes([i * 7 % 256]) * (50 + 13 * i) for i in range(8)}
    for i, b in blobs.items():
        (tmp_path / f"doc-{i:04d}.bin").write_bytes(b)

    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(tmp_path))
        .select(
            F.regexp_extract(F.col("path"), r"doc-(\d+)\.bin$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )
    got = {r.doc_id: r for r in MM.extract_features(src).collect()}
    assert set(got) == set(blobs)
    for i, b in blobs.items():
        assert got[i].n_bytes == len(b)
        assert got[i].payload_md5 == hashlib.md5(b).hexdigest()
        assert got[i].byte_sum == sum(b)


def test_resize_images_shapes_and_determinism(spark):
    """resize_images: every output buffer is exactly out_h*out_w bytes,
    deterministic, and equals the numpy nearest-neighbor resample of the
    stand-in decode computed locally."""
    import numpy as np

    from xesmf_spark import multimodal as MM

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    pay = MM.attach_payload(docs)
    out = {r.doc_id: r for r in MM.resize_images(pay, out_h=6, out_w=5).collect()}
    src = {r.doc_id: bytes(r.payload) for r in pay.collect()}
    assert set(out) == set(src)
    for did, r in out.items():
        assert (r.height, r.width) == (6, 5)
        assert len(bytes(r.pixels)) == 30
        img = MM._fake_decode(src[did])
        h, w = img.shape
        ri = np.minimum((np.arange(6) * h) // 6, h - 1)
        ci = np.minimum((np.arange(5) * w) // 5, w - 1)
        assert bytes(r.pixels) == img[np.ix_(ri, ci)].tobytes()


def test_bmp_roundtrip_exact():
    """encode_bmp -> decode_image must be the identity for RGB arrays,
    including odd widths (4-byte row padding) and 1-pixel edges."""
    import numpy as np

    rng = np.random.default_rng(7)
    for shape in [(5, 7, 3), (1, 1, 3), (8, 8, 3), (3, 2, 3)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = MM.decode_image(MM.encode_bmp(arr))
        assert back.shape == arr.shape
        assert (back == arr).all(), shape


def test_bmp_topdown_and_unsupported():
    """Negative height = top-down row order; compressed/low-bpp BMPs
    must be rejected loudly, not mis-decoded."""
    import struct

    import numpy as np

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = bytearray(MM.encode_bmp(arr))
    # flip height sign => rows stored top-down; re-decode must unflip
    h = struct.unpack_from("<i", payload, 22)[0]
    struct.pack_into("<i", payload, 22, -h)
    flipped = MM.decode_image(bytes(payload))
    assert (flipped == arr[::-1]).all()
    # 8-bit bpp is not the native path
    struct.pack_into("<H", payload, 28, 8)
    with pytest.raises(NotImplementedError):
        MM.decode_image(bytes(payload))


def test_resize_images_decodes_real_bmp(spark):
    """A BMP payload goes through the REAL decode (grayscale mean of
    actual RGB pixels), not the byte-soup fallback — verified against a
    direct numpy computation of the same nearest-neighbor resample."""
    import numpy as np

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(MM.encode_bmp(arr)))], "doc_id long, payload binary"
    )
    out = MM.resize_images(df, out_h=4, out_w=4).collect()[0]
    gray = arr.mean(axis=2).astype(np.uint8)
    ri = np.minimum((np.arange(4) * 10) // 4, 9)
    ci = np.minimum((np.arange(4) * 6) // 4, 5)
    expect = gray[np.ix_(ri, ci)].tobytes()
    assert bytes(out["pixels"]) == expect
    assert (out["height"], out["width"]) == (4, 4)


def test_ahash_identical_and_near_images(spark):
    """Identical images hash identically; a tiny perturbation moves
    few bits (small Hamming distance over both halves); a very
    different image moves many."""
    import numpy as np

    from xesmf_spark.multimodal import ahash_images, encode_bmp

    r = np.arange(16)[:, None, None]
    c = np.arange(16)[None, :, None]
    ch = np.arange(3)[None, None, :]
    base = ((3 + 7 * r + 13 * c + 29 * ch) % 256).astype(np.uint8)
    pert = base.copy()
    pert[0, 0, :] = (pert[0, 0, :] + 1) % 256
    other = ((200 + 31 * r + 17 * c + 5 * ch) % 256).astype(np.uint8)
    rows = [
        (1, bytearray(encode_bmp(base))),
        (2, bytearray(encode_bmp(base))),
        (3, bytearray(encode_bmp(pert))),
        (4, bytearray(encode_bmp(other))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    h = {r_.doc_id: (r_.hash_lo, r_.hash_hi) for r_ in ahash_images(df).collect()}
    assert h[1] == h[2]
    assert all(0 <= v < (1 << 32) for pair in h.values() for v in pair)

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert ham(h[1], h[3]) <= 4  # one-pixel change moves at most a few bits
    assert ham(h[1], h[4]) >= 8  # a different image is far


def test_ahash_dedup_pairs_equals_brute_force(spark):
    """The pigeonhole-banded Hamming join returns EXACTLY the
    brute-force all-pairs result at the radius (100% recall is the
    pigeonhole theorem; precision comes from the popcount verify).
    Planted exact copies must surface at hamming=0 and a one-step
    perturbed copy at its true small distance."""
    import numpy as np

    from xesmf_spark.multimodal import ahash_dedup_pairs, ahash_images, encode_bmp

    r = np.arange(16)[:, None, None]
    c = np.arange(16)[None, :, None]
    ch = np.arange(3)[None, None, :]

    def img(d, pert):
        dlt = ((r + c) % 7 == 0).astype(np.int64) if pert else 0
        return ((d + 7 * r + 13 * c + 29 * ch + dlt) % 256).astype(np.uint8)

    rows = [(d, bytearray(encode_bmp(img(d, False)))) for d in range(24)]
    rows += [(d + 1000, bytearray(encode_bmp(img(d, False)))) for d in range(0, 24, 6)]
    rows += [(d + 2000, bytearray(encode_bmp(img(d, True)))) for d in range(3, 24, 6)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    RADIUS = 3
    got = {
        (p.id_a, p.id_b): p.hamming
        for p in ahash_dedup_pairs(df, radius=RADIUS).collect()
    }

    # brute force over the actual hashes
    hs = {h.doc_id: (h.hash_lo, h.hash_hi) for h in ahash_images(df).collect()}
    ids = sorted(hs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(hs[a][0] ^ hs[b][0]).count("1") + bin(hs[a][1] ^ hs[b][1]).count("1")
            if d <= RADIUS:
                want[(a, b)] = d
    assert got == want
    # planted exact copies are in, at distance zero
    for d in range(0, 24, 6):
        assert got[(d, d + 1000)] == 0


def test_hamming_pairs_radius_validation_and_exact_copy(spark):
    from xesmf_spark.multimodal import hamming_pairs

    hashes = spark.createDataFrame(
        [(1, 5, 9), (2, 5, 9), (3, 5, 8)],  # 3 differs from 1/2 by 1 bit
        "doc_id long, hash_lo long, hash_hi long",
    )
    got = {(p.id_a, p.id_b): p.hamming for p in hamming_pairs(hashes, radius=1).collect()}
    assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hamming_pairs(hashes, radius=2)  # 3 bands don't tile 64 bits


def test_png_roundtrip_exact_all_filters():
    """encode_png -> decode_image is the identity for gray/RGB/RGBA
    arrays under every scanline filter type and the cycling default,
    including 1-pixel edges (no left/up neighbors)."""
    import numpy as np

    rng = np.random.default_rng(11)
    for shape in [(16, 16, 3), (16, 16, 4), (16, 16), (1, 1, 3), (5, 3, 3), (7, 1, 4), (2, 9)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for filters in [None, 0, 1, 2, 3, 4]:
            back = MM.decode_image(MM.encode_png(arr, filters=filters))
            assert back.shape == arr.shape, (shape, filters)
            assert (back == arr).all(), (shape, filters)


def test_png_rejects_unsupported_loudly():
    """16-bit depth, interlace, palette color and truncated IDAT are
    rejected, never mis-decoded."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    good = MM.encode_png(arr)

    def patch_ihdr(payload, **fields):
        # IHDR data starts at 16 (8 sig + 4 len + 4 tag)
        w, h, depth, ct, comp, filt, il = struct.unpack(">IIBBBBB", payload[16:29])
        d = dict(w=w, h=h, depth=depth, ct=ct, comp=comp, filt=filt, il=il)
        d.update(fields)
        ihdr = struct.pack(
            ">IIBBBBB", d["w"], d["h"], d["depth"], d["ct"], d["comp"], d["filt"], d["il"]
        )
        crc = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        return payload[:16] + ihdr + crc + payload[33:]

    with _pytest.raises(NotImplementedError):
        MM.decode_image(patch_ihdr(good, depth=16))
    with _pytest.raises(NotImplementedError):
        MM.decode_image(patch_ihdr(good, il=1))
    with _pytest.raises(NotImplementedError):
        MM.decode_image(patch_ihdr(good, ct=3))  # palette
    # truncated IDAT -> zlib error or scanline-size mismatch, not junk
    with _pytest.raises(Exception):
        MM._png_decode(good[:-20])


def test_resize_images_decodes_real_png(spark):
    """The Arrow resize kernel consumes PNG payloads through the same
    decode_image dispatch as BMP — format-invisible results."""
    import numpy as np

    r = np.arange(16)[:, None, None]
    c = np.arange(16)[None, :, None]
    ch = np.arange(3)[None, None, :]
    img = ((3 + 7 * r + 13 * c + 29 * ch) % 256).astype(np.uint8)
    rows = [
        (0, bytearray(MM.encode_bmp(img))),
        (1, bytearray(MM.encode_png(img))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: bytes(r.pixels) for r in MM.resize_images(df, out_h=8, out_w=8).collect()}
    assert out[0] == out[1]


def test_jpeg_bitstream_lossless_and_kernels_match():
    """decode_jpeg(encode_jpeg(x)) == expected_reconstruction(x)
    BYTE-EXACT for gray / RGB 4:4:4 / 4:2:0 / 4:2:2 across qualities and
    non-multiple-of-16 dims: proves the Huffman + zigzag + DC-pred +
    byte-stuffing layer lossless and both sides' DCT/color kernels
    identical (the encode_png discipline transposed to a lossy codec).
    Also pins the loss itself: q100 on a smooth gradient stays within
    a couple of counts of the source."""
    from xesmf_spark.jpeg import decode_jpeg, encode_jpeg, expected_reconstruction

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(24, 33), dtype=np.uint8)
    noise = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    smooth = np.zeros((37, 53, 3), np.uint8)
    smooth[..., 0] = np.linspace(0, 255, 53, dtype=np.uint8)[None, :]
    smooth[..., 1] = np.linspace(0, 255, 37, dtype=np.uint8)[:, None]
    smooth[..., 2] = 128
    one = np.full((1, 1), 200, dtype=np.uint8)  # single-block edge case
    for img in (gray, one):
        for q in (35, 75, 100):
            dec = decode_jpeg(encode_jpeg(img, quality=q))
            assert np.array_equal(dec, expected_reconstruction(img, quality=q)), q
            assert dec.shape == img.shape
    for img in (noise, smooth):
        for sub in ("4:4:4", "4:2:0", "4:2:2"):
            for q in (35, 75, 100):
                dec = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
                exp = expected_reconstruction(img, quality=q, subsampling=sub)
                assert np.array_equal(dec, exp), (sub, q)
                assert dec.shape == img.shape
    # loss bound sanity: q100 4:4:4 smooth within 6 counts of source
    dec = decode_jpeg(encode_jpeg(smooth, quality=100))
    assert int(np.abs(dec.astype(int) - smooth.astype(int)).max()) <= 6


def test_jpeg_rejects_arithmetic_and_junk_loudly():
    """Arithmetic-coded SOF variants raise NotImplementedError naming
    the gate; a baseline stream with a flipped SOF2 marker is a
    MALFORMED progressive stream (its DC scan claims Se=63) and raises
    ValueError; non-JPEG bytes raise ValueError; decode_image
    dispatches JPEG by SOI signature; SOF1 (extended sequential,
    8-bit) decodes identically to SOF0."""
    import pytest as _pytest

    from xesmf_spark.jpeg import decode_jpeg, encode_jpeg

    img = np.zeros((8, 8), dtype=np.uint8)
    good = encode_jpeg(img)
    i = good.index(b"\xff\xc0")
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(good[:i] + b"\xff\xc9" + good[i + 2 :])
    with _pytest.raises(ValueError, match="flipped SOF2"):
        decode_jpeg(good[:i] + b"\xff\xc2" + good[i + 2 :])
    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    # decode_image routes by signature; SOF1 == SOF0 at 8-bit
    assert MM.decode_image(good).shape == (8, 8)
    s1 = good[:i] + b"\xff\xc1" + good[i + 2 :]
    assert np.array_equal(decode_jpeg(s1), decode_jpeg(good))


def test_jpeg_progressive_roundtrip_byte_exact():
    """decode_jpeg(encode_jpeg_progressive(x, q, sub)) must equal
    expected_reconstruction(x, q, sub) EXACTLY — proves the whole
    progressive entropy layer (spectral selection, successive
    approximation, EOB runs, refinement correction bits, restart
    cadence) lossless, the baseline byte-exactness discipline
    extended to SOF2."""
    from xesmf_spark.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
        expected_reconstruction,
    )

    rng = np.random.default_rng(23)
    r = np.arange(64)[:, None]
    c = np.arange(64)[None, :]
    smooth = ((r + c) // 2).astype(np.uint8)  # long EOB runs, EOBn>1
    cases = [
        (rng.integers(0, 256, size=(17, 23), dtype=np.uint8), 80, "4:4:4", 0),
        (smooth, 5, "4:4:4", 0),  # quality 5: giant EOB runs
        (np.full((40, 48, 3), 98, dtype=np.uint8), 80, "4:2:0", 0),  # constant
        (rng.integers(0, 256, size=(33, 49, 3), dtype=np.uint8), 35, "4:2:0", 0),
        (rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8), 90, "4:2:2", 0),
        # restart markers inside every scan type
        (rng.integers(0, 256, size=(33, 41, 3), dtype=np.uint8), 75, "4:2:0", 2),
        (smooth[:33, :41], 40, "4:4:4", 1),
    ]
    for img, q, sub, ri in cases:
        kw = {"quality": q, "restart_interval": ri}
        if img.ndim == 3:
            kw["subsampling"] = sub
        payload = encode_jpeg_progressive(img, **kw)
        assert payload[:2] == b"\xff\xd8" and b"\xff\xc2" in payload
        exp = expected_reconstruction(img, quality=q, subsampling=sub)
        assert np.array_equal(decode_jpeg(payload), exp), (img.shape, q, sub, ri)
    # a custom no-successive-approximation script also round-trips
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(
        img,
        quality=85,
        scans=(
            ((0, 1, 2), 0, 0, 0, 0),
            ((0,), 1, 63, 0, 0),
            ((1,), 1, 63, 0, 0),
            ((2,), 1, 63, 0, 0),
        ),
    )
    assert np.array_equal(
        decode_jpeg(payload), expected_reconstruction(img, quality=85)
    )


def test_jpeg_progressive_fuzz_byte_exact():
    """Seeded fuzz over random (shape, quality, subsampling, restart,
    scan-script) configs — every decode must equal the reference
    reconstruction EXACTLY (the baseline fuzz discipline extended to
    SOF2; catches interaction bugs a fixed matrix misses: odd sizes ×
    restarts × banded scripts × low quality EOB runs)."""
    from xesmf_spark.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
        expected_reconstruction,
    )

    rng = np.random.default_rng(31)
    subs = ["4:4:4", "4:2:0", "4:2:2"]
    for trial in range(12):
        h = int(rng.integers(8, 50))
        w = int(rng.integers(8, 50))
        gray = trial % 4 == 0
        shape = (h, w) if gray else (h, w, 3)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        q = int(rng.integers(5, 96))
        sub = "4:4:4" if gray else subs[int(rng.integers(0, 3))]
        ri = int(rng.integers(0, 4))  # 0 = no restarts
        kw = {"quality": q, "restart_interval": ri}
        if not gray:
            kw["subsampling"] = sub
        if trial % 5 == 4:
            # random custom band split at full precision
            split = int(rng.integers(2, 62))
            kw["scans"] = tuple(
                [(tuple(range(1 if gray else 3)), 0, 0, 0, 0)]
                + [
                    ((c,), 1, split, 0, 0)
                    for c in range(1 if gray else 3)
                ]
                + [
                    ((c,), split + 1, 63, 0, 0)
                    for c in range(1 if gray else 3)
                ]
            )
        payload = encode_jpeg_progressive(img, **kw)
        exp = expected_reconstruction(img, quality=q, subsampling=sub)
        assert np.array_equal(decode_jpeg(payload), exp), (
            trial, shape, q, sub, ri,
        )


def test_jpeg_progressive_adversarial_inputs_fail_loudly():
    """Truncated or corrupted progressive streams must raise promptly
    or decode to validly-shaped pixels (a flipped entropy byte that
    still parses is lossy garbage-in-garbage-out, the standard codec
    contract) — never hang, never return a wrong shape.  A stream cut
    BETWEEN scans decodes the partially-refined image (the defining
    progressive property: render what arrived)."""
    import pytest as _pytest

    from xesmf_spark.jpeg import decode_jpeg, encode_jpeg_progressive

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    good = encode_jpeg_progressive(img, quality=80, subsampling="4:2:0")
    base = decode_jpeg(good)
    for frac in (0.3, 0.6, 0.9):
        with _pytest.raises(ValueError):
            decode_jpeg(good[: int(len(good) * frac)])
    # corrupt one byte inside each scan's entropy data
    sos = []
    p = good.find(b"\xff\xda")
    while p >= 0:
        sos.append(p)
        p = good.find(b"\xff\xda", p + 2)
    for sp in sos[:4]:
        b = bytearray(good)
        b[sp + 20] ^= 0xFF
        try:
            out = decode_jpeg(bytes(b))
            assert out.shape == base.shape
        except ValueError:
            pass  # loud failure is equally acceptable
    # a clean cut between scans renders the partial refinement
    partial = good[: sos[3]] + b"\xff\xd9"
    out = decode_jpeg(partial)
    assert out.shape == base.shape and not np.array_equal(out, base)


def test_jpeg_progressive_through_resize_kernel(spark):
    """A real progressive payload flows through the Arrow resize
    kernel exactly like baseline — the r14 'biggest capability hole'
    (a crawl corpus is heavily progressive) is closed at the Spark
    boundary, not just the kernel."""
    from xesmf_spark.jpeg import encode_jpeg_progressive, expected_reconstruction
    from xesmf_spark.multimodal import resize_images

    r = np.arange(16)[:, None, None]
    c = np.arange(16)[None, :, None]
    ch = np.arange(3)[None, None, :]
    img = ((3 + 7 * r + 13 * c + 29 * ch) % 256).astype(np.uint8)
    rows = [
        (0, bytearray(encode_jpeg_progressive(img, quality=90))),
        (1, bytearray(encode_jpeg_progressive(img, quality=90, subsampling="4:2:0"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        rw.doc_id: np.frombuffer(bytes(rw.pixels), dtype=np.uint8).reshape(8, 8)
        for rw in resize_images(df, out_h=8, out_w=8).collect()
    }
    for did, sub in ((0, "4:4:4"), (1, "4:2:0")):
        exp = expected_reconstruction(img, quality=90, subsampling=sub)
        gray = exp.mean(axis=2).astype(np.uint8)
        want = gray[np.ix_((np.arange(8) * 16) // 8, (np.arange(8) * 16) // 8)]
        assert np.array_equal(out[did], want), sub


def test_resize_images_decodes_real_jpeg(spark):
    """The Arrow resize kernel consumes JPEG payloads through the same
    decode_image dispatch as BMP/PNG, and the result equals the
    numpy-side reference resize of the expected reconstruction —
    format plumbing invisible, loss pinned to the codec."""
    from xesmf_spark.jpeg import encode_jpeg, expected_reconstruction

    r = np.arange(16)[:, None, None]
    c = np.arange(16)[None, :, None]
    ch = np.arange(3)[None, None, :]
    img = ((3 + 7 * r + 13 * c + 29 * ch) % 256).astype(np.uint8)
    rows = [
        (0, bytearray(encode_jpeg(img, quality=90))),
        (1, bytearray(encode_jpeg(img, quality=90, subsampling="4:2:0"))),
        (2, bytearray(encode_jpeg(img, quality=90, subsampling="4:2:2"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        rw.doc_id: np.frombuffer(bytes(rw.pixels), dtype=np.uint8).reshape(8, 8)
        for rw in MM.resize_images(df, out_h=8, out_w=8).collect()
    }
    for did, sub in ((0, "4:4:4"), (1, "4:2:0"), (2, "4:2:2")):
        exp = expected_reconstruction(img, quality=90, subsampling=sub)
        gray = exp.mean(axis=2).astype(np.uint8)
        want = gray[np.ix_((np.arange(8) * 16) // 8, (np.arange(8) * 16) // 8)]
        assert np.array_equal(out[did], want), sub


def test_jpeg_restart_markers_roundtrip():
    """restart_interval emits DRI + RSTn (byte-aligned, DC predictors
    reset) and the decoder's restart path reproduces the no-restart
    pixels exactly — same image, with and without restarts, for gray,
    4:4:4 and 4:2:0 and intervals that do and do not divide the MCU
    count; wraps past RST7 to exercise the marker cycle."""
    from xesmf_spark.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(40, 80), dtype=np.uint8)  # 5x10 = 50 MCUs
    rgb = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    cases = [(gray, "4:4:4"), (rgb, "4:4:4"), (rgb, "4:2:0"), (rgb, "4:2:2")]
    for img, sub in cases:
        base = decode_jpeg(encode_jpeg(img, quality=80, subsampling=sub))
        for ri in (1, 3, 7):  # ri=1 with 50 MCUs cycles RST0..7 wrapping
            payload = encode_jpeg(
                img, quality=80, subsampling=sub, restart_interval=ri
            )
            assert b"\xff\xdd" in payload  # DRI present
            if ri == 1:  # >= 2 MCUs everywhere, so RST0 must appear
                assert b"\xff\xd0" in payload
            assert np.array_equal(decode_jpeg(payload), base), (sub, ri)


def test_jpeg_truncated_payload_fails_loudly():
    """A truncated entropy stream must raise promptly (never hang or
    return junk silently)."""
    import pytest as _pytest

    from xesmf_spark.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    good = encode_jpeg(img, quality=80)
    with _pytest.raises(Exception):
        decode_jpeg(good[: len(good) // 2])


def test_jpeg_fill_bytes_and_standalone_markers():
    """Spec-legal FF fill padding between segments (B.1.1.2) and
    length-less standalone markers (TEM 0xFF01, a stray RSTn outside
    the scan) must parse cleanly — third-party baseline encoders emit
    both (r11 ADVICE)."""
    from xesmf_spark.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    good = encode_jpeg(img, quality=85)
    base = decode_jpeg(good)
    # inject, right after SOI: FF-fill padding, a TEM marker, a stray
    # RST4, more fill — all before the first real segment
    doctored = good[:2] + b"\xff\xff\xff\x01\xff\xd4\xff\xff\xff" + good[2:]
    assert np.array_equal(decode_jpeg(doctored), base)


def test_jpeg_fill_bytes_inside_entropy_stream_before_rst():
    """Spec-legal FF fill immediately BEFORE an RSTn inside the
    entropy-coded data (B.1.1.2) must decode on the default LUT engine
    too, not just the bitwise twin whose align_restart skips fill
    (r14 ADVICE: _entropy_segments used to treat FF FF as end-of-scan
    and hard-fail with 'missing restart segments')."""
    from xesmf_spark.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    good = encode_jpeg(img, quality=80, restart_interval=1)
    base = decode_jpeg(good)
    # find the first RSTn in the scan (after SOS) and pad fill ahead
    sos = good.find(b"\xff\xda")
    assert sos > 0
    rst = -1
    for m in range(0xD0, 0xD8):
        p = good.find(bytes([0xFF, m]), sos)
        if p >= 0 and (rst < 0 or p < rst):
            rst = p
    assert rst > 0
    doctored = good[:rst] + b"\xff\xff" + good[rst:]
    for engine in ("lut", "bitwise"):
        assert np.array_equal(decode_jpeg(doctored, engine=engine), base), engine


def test_jpeg_lut_cache_is_bounded():
    """The module-level Huffman LUT cache must stay bounded: real
    corpora carry per-image optimized tables (~2 MB each as Python
    lists), so unbounded growth is an executor OOM-by-leak (r14
    ADVICE).  Also checks LRU refresh keeps a hot key resident."""
    from xesmf_spark import jpeg as J

    J._LUT_CACHE.clear()
    # synthesize >cap distinct single-code tables: bits=[1,0,...,0],
    # vals=[v] — each valid on its own, all distinct cache keys
    bits = bytes([1] + [0] * 15)
    first = J._fast_lut(bits, bytes([0]))
    for v in range(1, J._LUT_CACHE_CAP + 40):
        if v % 7 == 0:
            assert J._fast_lut(bits, bytes([0])) is first  # LRU refresh
        J._fast_lut(bits, bytes([v]))
        assert len(J._LUT_CACHE) <= J._LUT_CACHE_CAP
    # the hot key survived eviction pressure via recency refresh
    assert (bits + b"\x00" + bytes([0])) in J._LUT_CACHE
    J._LUT_CACHE.clear()


def test_resize_kernel_raises_on_gated_signature_payloads(spark):
    """A payload CARRYING a known codec signature that fails to decode
    must fail the job loudly (r11 ADVICE: no silent _fake_decode junk
    for recognized-but-gated streams); signature-less payloads still
    take the deterministic stand-in."""
    import pytest as _pytest

    from xesmf_spark.jpeg import encode_jpeg
    from xesmf_spark.multimodal import _decode_or_fake, resize_images

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    arith = bytearray(encode_jpeg(img))
    i = bytes(arith).find(b"\xff\xc0")
    arith[i + 1] = 0xC9  # flip SOF0 -> SOF9 (arithmetic-coded)

    # kernel-level: the loud gate propagates
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        _decode_or_fake(bytes(arith))
    # signature-less bytes still fake-decode (documents-table payloads)
    assert _decode_or_fake(b"plain text payload").ndim == 2

    # job-level: the Spark task must surface the gate, not junk pixels
    df = spark.createDataFrame([(0, bytes(arith))], "doc_id long, payload binary")
    with _pytest.raises(Exception, match="arithmetic|NotImplementedError"):
        resize_images(df).collect()


def test_bilinear_resize_matches_fixed_point_replay(spark):
    """resize_images_bilinear: output bytes equal a local fixed-point
    replay at a fractional ratio (16->6); an exact 2x downsample
    reduces to the 2x2 box average; constant images stay constant."""
    import numpy as np

    from xesmf_spark.multimodal import encode_bmp, resize_images_bilinear

    rng = np.random.RandomState(21)
    imgs = {
        0: rng.randint(0, 256, (16, 16, 3)).astype(np.uint8),
        1: np.full((16, 16, 3), 137, dtype=np.uint8),
        2: rng.randint(0, 256, (10, 14, 3)).astype(np.uint8),
    }
    df = spark.createDataFrame(
        [(d, bytearray(encode_bmp(a))) for d, a in imgs.items()],
        "doc_id long, payload binary",
    )

    def replay(img, oh, ow):
        g = img.mean(axis=2).astype(np.uint8).astype(np.int64)
        h, w = g.shape
        dy, dx = 2 * oh, 2 * ow
        den = dx * dy
        ny = np.maximum((2 * np.arange(oh) + 1) * h - oh, 0)
        nx = np.maximum((2 * np.arange(ow) + 1) * w - ow, 0)
        y0, fy = ny // dy, (ny % dy)[:, None]
        x0, fx = nx // dx, (nx % dx)[None, :]
        y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
        return (
            g[np.ix_(y0, x0)] * (dx - fx) * (dy - fy)
            + g[np.ix_(y0, x1)] * fx * (dy - fy)
            + g[np.ix_(y1, x0)] * (dx - fx) * fy
            + g[np.ix_(y1, x1)] * fx * fy
            + den // 2
        ) // den

    for oh, ow in ((6, 6), (8, 8), (5, 7)):
        got = {
            r["doc_id"]: np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(oh, ow)
            for r in resize_images_bilinear(df, out_h=oh, out_w=ow).collect()
        }
        for d, img in imgs.items():
            assert np.array_equal(got[d], replay(img, oh, ow).astype(np.uint8)), (
                d, oh, ow,
            )
    # exact 2x: fy == fx == half everywhere -> 2x2 box average
    g16 = imgs[0].mean(axis=2).astype(np.uint8).astype(np.int64)
    box = (
        g16.reshape(8, 2, 8, 2).sum(axis=(1, 3)) * 64 + 128
    ) // 256
    got8 = {
        r["doc_id"]: np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(8, 8)
        for r in resize_images_bilinear(df, out_h=8, out_w=8).collect()
    }
    assert np.array_equal(got8[0], box.astype(np.uint8))
    assert (got8[1] == 137).all()
