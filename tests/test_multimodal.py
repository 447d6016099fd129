"""Multimodal binary-column tests (north-star surface): REAL decode
kernels for codec-free formats (PPM images parse to numpy and resample
for real; PCM16 WAV decodes via stdlib wave with FFT features), stub
kernels only where a codec lib would be required (video containers) —
plus the Spark contracts: schemas, Arrow batch iteration,
metadata-first pruning, executor-side row explosion."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from cdc_makanmana_spark.multimodal import (
    IMAGE_FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_image_features,
    resize_images,
    sample_frames,
    synthetic_media_table,
)
from cdc_makanmana_spark.multimodal import kernels


def test_ppm_round_trip_and_resize_kernel():
    """encode→decode is the identity; nearest-neighbor resize matches
    a hand-computed numpy reference (no Spark involved — the kernel is
    real image processing)."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (10, 6, 3)).astype(np.uint8)
    assert (kernels.decode_ppm(kernels.encode_ppm(arr)) == arr).all()
    # comment-bearing header still parses
    payload = b"P6\n# a comment\n6 10\n255\n" + arr.tobytes()
    assert (kernels.decode_ppm(payload) == arr).all()

    small = kernels.resize_nearest(arr, 3, 5)
    assert small.shape == (5, 3, 3)
    ys = (np.arange(5) * 10 // 5).clip(0, 9)
    xs = (np.arange(3) * 6 // 3).clip(0, 5)
    assert (small == arr[ys][:, xs]).all()


def _ref_encode_png(arr, color_type, filters):
    """Test-local PNG writer (independent of BOTH the engine's
    encode_png and the fixture generator's): filters each row with the
    spec's forward transform, one filter type per row from
    ``filters``. arr is (h, w, ch) int; ch must match color_type."""
    import struct
    import zlib

    h, w, ch = arr.shape
    px = arr.astype(np.int64)
    body = b""
    prev = np.zeros((w, ch), dtype=np.int64)
    for y in range(h):
        cur = px[y]
        left = np.vstack([np.zeros((1, ch), dtype=np.int64), cur[:-1]])
        upleft = np.vstack([np.zeros((1, ch), dtype=np.int64), prev[:-1]])
        f = filters[y % len(filters)]
        if f == 0:
            out = cur
        elif f == 1:
            out = (cur - left) % 256
        elif f == 2:
            out = (cur - prev) % 256
        elif f == 3:
            out = (cur - (left + prev) // 2) % 256
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            out = (cur - pred) % 256
        body += bytes([f]) + out.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(body))
            + chunk(b"IEND", b""))


def test_png_decode_all_filters_and_color_types():
    """decode_png reconstructs reference pixels through every spec row
    filter (None/Sub/Up/Average/Paeth — each pinned as the ONLY filter
    of a whole image, so no path hides behind another) and every
    supported color type (gray→RGB replication, RGB, gray+alpha,
    RGBA with alpha dropped); png_dims reads the header without
    inflating; corrupt/unsupported payloads raise instead of decoding
    garbage. Reference encoder is test-local code, independent of the
    engine's and the fixture generator's."""
    import pytest
    import zlib

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    # each filter type alone, then all five cycling
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = kernels.decode_png(_ref_encode_png(rgb, 2, filters))
        assert (got == rgb).all(), f"filters={filters}"
    assert kernels.png_dims(_ref_encode_png(rgb, 2, [4])) == (7, 9)
    # grayscale (type 0) replicates to RGB
    gray = rng.integers(0, 256, (5, 8, 1)).astype(np.uint8)
    got = kernels.decode_png(_ref_encode_png(gray, 0, [1, 4]))
    assert (got == np.repeat(gray, 3, axis=2)).all()
    # gray+alpha (type 4): alpha dropped, gray replicated
    ga = rng.integers(0, 256, (5, 8, 2)).astype(np.uint8)
    got = kernels.decode_png(_ref_encode_png(ga, 4, [2, 3]))
    assert (got == np.repeat(ga[:, :, :1], 3, axis=2)).all()
    # RGBA (type 6): alpha dropped
    rgba = rng.integers(0, 256, (6, 4, 4)).astype(np.uint8)
    got = kernels.decode_png(_ref_encode_png(rgba, 6, [0, 4]))
    assert (got == rgba[:, :, :3]).all()
    # engine encoder round-trips through the decoder
    assert (kernels.decode_png(kernels.encode_png(rgb)) == rgb).all()
    # rejection paths: bad signature, CRC corruption, palette type
    with pytest.raises(ValueError, match="not a PNG"):
        kernels.decode_png(b"P6\n1 1\n255\n\x00\x00\x00")
    good = bytearray(_ref_encode_png(rgb, 2, [0]))
    good[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        kernels.decode_png(bytes(good))
    import struct

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    pal = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="color type"):
        kernels.decode_png(pal)


def test_wav_round_trip_and_audio_features():
    """PCM16 WAV round-trips through the stdlib container within
    quantization error, and the FFT feature finds a planted tone."""
    rate = 8000
    t = np.arange(rate) / rate
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, got_rate = kernels.decode_wav_pcm16(kernels.encode_wav_pcm16(tone, rate))
    assert got_rate == rate
    assert np.abs(samples - tone).max() < 1e-3
    dur, rms, zcr, dom = kernels.audio_features(samples, rate)
    assert abs(dur - 1.0) < 1e-9
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(dom - 440.0) < 2.0


def test_synthetic_media_table_deterministic(spark):
    a = synthetic_media_table(spark, n=12, seed=7).collect()
    b = synthetic_media_table(spark, n=12, seed=7).collect()
    assert a == b
    assert {r.kind for r in a} == {"image", "audio", "video"}
    for r in a:
        p = bytes(r.payload)
        if r.kind == "image":
            img = kernels.decode_ppm(p)  # valid PPM
            assert img.shape == (r.meta.height, r.meta.width, 3)
        elif r.kind == "audio":
            assert p[:4] == b"RIFF"  # valid WAV container
        else:
            assert len(p) == r.meta.width * r.meta.height * 3  # fake bytes


def test_decode_image_features_real_kernel(spark):
    media = synthetic_media_table(spark, n=12)
    feats = decode_image_features(media, dim=8)
    assert feats.schema == IMAGE_FEATURE_SCHEMA
    rows = feats.collect()
    # only kind == 'image' rows reach the decode stage
    assert len(rows) == media.filter(F.col("kind") == "image").count()
    # features equal a locally-computed numpy reference per image
    local = {
        r.media_id: kernels.image_features(kernels.decode_ppm(bytes(r.payload)), 8)
        for r in media.filter(F.col("kind") == "image").collect()
    }
    for r in rows:
        assert len(r.feature) == 8
        assert all(0.0 <= v <= 1.0 for v in r.feature)
        assert np.abs(np.array(r.feature) - np.array(local[r.media_id])).max() < 1e-6


def test_decode_audio_features_real_kernel(spark):
    from cdc_makanmana_spark.multimodal.binary import decode_audio_features

    media = synthetic_media_table(spark, n=12)
    rows = decode_audio_features(media).collect()
    assert len(rows) == media.filter(F.col("kind") == "audio").count()
    for r in rows:
        assert abs(r.duration_s - 0.5) < 1e-6
        assert 0.2 < r.rms < 0.7          # 0.6-amplitude sine + light noise
        assert 100.0 <= r.dominant_hz <= 2200.0  # planted 200-2100 Hz tone


def test_resize_images_contract(spark):
    media = synthetic_media_table(spark, n=9)
    out = resize_images(media, 32, 32)
    assert out.schema == MEDIA_SCHEMA
    originals = {r.media_id: r for r in media.collect()}
    for r in out.collect():
        assert r.meta.width == 32 and r.meta.height == 32
        p = bytes(r.payload)
        if r.meta.codec == "ppm":
            img = kernels.resize_nearest(
                kernels.decode_ppm(bytes(originals[r.media_id].payload)), 32, 32
            )
            assert (kernels.decode_ppm(p) == img).all()  # real resample
        else:
            assert len(p) == 32 * 32 * 3  # stub path keeps the size contract


def test_sample_frames_explodes_per_frame(spark):
    media = synthetic_media_table(spark, n=12)
    vids = media.filter(F.col("kind") == "video").select("media_id", "meta.n_frames")
    expected = {
        r.media_id: len(range(0, r.n_frames, 2)) for r in vids.collect()
    }
    frames = sample_frames(media, every_nth=2)
    counts = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == expected
    # frame indices are the sampled ones and payloads are non-empty slices
    for r in frames.collect():
        assert r.frame_idx % 2 == 0
        assert len(bytes(r.frame_payload)) > 0


def test_read_media_dir_from_files(spark, tmp_path):
    """binaryFile ingest: PPM/WAV files land as typed media rows with
    header-parsed dims; unknown extensions pass through opaque; the
    decode stage runs unchanged on the ingested table."""
    import numpy as np

    from cdc_makanmana_spark.multimodal import kernels
    from cdc_makanmana_spark.multimodal.binary import (
        decode_image_features,
        read_media_dir,
    )

    d = tmp_path / "media"
    d.mkdir()
    arr = np.zeros((5, 7, 3), dtype=np.uint8)
    arr[:, :, 0] = 200
    (d / "img.ppm").write_bytes(kernels.encode_ppm(arr))
    (d / "snd.wav").write_bytes(
        kernels.encode_wav_pcm16(np.sin(np.linspace(0, 20, 800)), 8000)
    )
    (d / "blob.xyz").write_bytes(b"\x00\x01\x02")
    (d / "bad.ppm").write_bytes(b"P6 not really")
    (d / "README").write_bytes(b"dotless filename")

    media = read_media_dir(spark, str(d))
    rows = {r["meta"]["codec"]: r for r in media.collect()}
    # dot-less basename: empty-extension opaque binary, never a path leak
    assert rows[""]["kind"] == "binary"
    assert rows["ppm"]["kind"] == "image"
    assert (rows["ppm"]["meta"]["width"], rows["ppm"]["meta"]["height"]) == (7, 5)
    assert rows["pcm16"]["kind"] == "audio"
    assert rows["xyz"]["kind"] == "binary"
    assert rows["corrupt-ppm"]["kind"] == "binary"  # quarantined, not crashed
    assert len({r["media_id"] for r in rows.values()}) == 5

    feats = decode_image_features(media.filter(F.col("kind") == "image")).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 8
    # red-dominant image: first channel-mean feature ~200/255
    assert abs(feats[0]["feature"][0] - 200 / 255) < 0.02


def test_image_ahash_near_duplicates(spark):
    """Perceptual-hash dedup: a lightly-noised re-encode of an image
    must pair with its original at small Hamming distance; a
    structurally different image must not."""
    import numpy as np

    from cdc_makanmana_spark.multimodal import kernels
    from cdc_makanmana_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        image_ahash,
        image_near_duplicates,
    )

    yy, xx = np.mgrid[0:40, 0:40]
    base = np.stack([xx * 6, yy * 6, (xx + yy) * 3], axis=2).astype(np.uint8)
    noisy = base.copy()
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 40, (10, 2))
    for r, c in idx:  # touch 10 of 1600 pixels
        noisy[r, c] = 255 - noisy[r, c]
    different = base[::-1, ::-1].copy()  # 180° rotation — different layout
    rows = [
        (1, "image", bytearray(kernels.encode_ppm(base)), ("ppm", 40, 40, 1)),
        (2, "image", bytearray(kernels.encode_ppm(noisy)), ("ppm", 40, 40, 1)),
        (3, "image", bytearray(kernels.encode_ppm(different)), ("ppm", 40, 40, 1)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    hashes = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    assert len(hashes) == 3

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_duplicates(media, max_distance=6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_hamming_pairs_matches_bruteforce(spark):
    """The signature-agnostic pair core: complete recall within the
    distance bound on arbitrary 64-bit values, including identical
    signatures and sign-bit (negative long) values."""
    from itertools import combinations

    from cdc_makanmana_spark.operators.dedup import hamming_pairs

    vals = [
        0, 1, 3, 7, (1 << 63) - 1, -(1 << 63), -(1 << 63) + 5, -1, -9,
        0x0F0F0F0F0F0F0F0F, 0x0F0F0F0F0F0F0F0E, 42, 42,
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, sig long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(df, "sig", "id", max_distance=3).collect()
    }
    expect = {}
    for (i, a), (j, b) in combinations(enumerate(vals), 2):
        d = bin((a & (1 << 64) - 1) ^ (b & (1 << 64) - 1)).count("1")
        if d <= 3:
            expect[(min(i, j), max(i, j))] = d
    assert got == expect


def test_audio_fingerprint_near_duplicates(spark):
    """Spectral-fingerprint dedup: the same tone mix re-recorded with
    different low-level noise (and different gain) pairs at small
    Hamming distance; different tonal content does not."""
    import numpy as np

    from cdc_makanmana_spark.multimodal import kernels
    from cdc_makanmana_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        audio_fingerprint,
        audio_near_duplicates,
    )

    rate = 8000
    t = np.arange(rate) / rate
    tone = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 950 * t)
    rng = np.random.default_rng(11)
    a = tone + 0.01 * rng.standard_normal(len(t))
    b = 0.8 * tone + 0.01 * np.random.default_rng(12).standard_normal(len(t))
    c = 0.5 * np.sin(2 * np.pi * 1800 * t) + 0.2 * np.sin(2 * np.pi * 300 * t)
    rows = [
        (1, "audio", bytearray(kernels.encode_wav_pcm16(a, rate)), ("pcm16", 0, 0, 1)),
        (2, "audio", bytearray(kernels.encode_wav_pcm16(b, rate)), ("pcm16", 0, 0, 1)),
        (3, "audio", bytearray(kernels.encode_wav_pcm16(c, rate)), ("pcm16", 0, 0, 1)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fps = {r["media_id"]: r["afp"] for r in audio_fingerprint(media).collect()}
    assert len(fps) == 3
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_duplicates(media, max_distance=2).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_video_near_duplicates_by_frame_hashes(spark):
    """Video tier of the multimodal dedup trio: an exact copy shares
    every sampled-frame hash, a half-trimmed copy still shares the
    leading frames, an unrelated video pairs with neither."""
    import hashlib as _hl

    from cdc_makanmana_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        video_frame_hashes,
        video_near_duplicates,
    )

    def _chain(seed: bytes, blocks: int = 200) -> bytes:
        out, h = b"", _hl.sha256(seed).digest()
        for _ in range(blocks):
            out += h
            h = _hl.sha256(h).digest()
        return out  # 6400 bytes, aperiodic -> frames hash distinctly

    base = _chain(b"clipA")
    other = _chain(b"clipB")
    rows = [
        (1, "video", bytearray(base), ("fake", 64, 64, 8)),
        (2, "video", bytearray(base), ("fake", 64, 64, 8)),        # exact copy
        (3, "video", bytearray(base[: len(base) // 2]), ("fake", 64, 64, 4)),  # trim
        (4, "video", bytearray(other), ("fake", 64, 64, 8)),       # unrelated
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fh = video_frame_hashes(media, every_nth=2)
    per = {r.media_id: r.n for r in fh.groupBy("media_id").count().withColumnRenamed("count", "n").collect()}
    assert per[1] == 4 and per[3] == 2  # 8 frames sampled every 2nd; 4 frames -> 2
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in video_near_duplicates(media, min_shared_frames=2).collect()
    }
    assert pairs.get((1, 2)) == 4          # copy shares all sampled hashes
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs
    # the trim shares its sampled frames with the full clip iff the
    # slicing grid aligns; at half length + half frames it does
    assert pairs.get((1, 3), 0) >= 2


def test_media_fixture_fingerprints_match_engine(spark):
    """q110's certification spine: the committed reference-fingerprint
    parquet (written by scripts/gen_media_fixtures.py from the SOURCE
    arrays with its own implementations) must match what the engine's
    binaryFile → mapInPandas kernel path computes from the committed
    FILES, for every fixture — any drift in header parsing, resample
    index math, FFT banding, or bit packing shows up here (and in the
    driver's q110 hash)."""
    import os

    import pyarrow.parquet as pq

    from cdc_makanmana_spark.multimodal.binary import (
        audio_fingerprint,
        image_ahash,
        read_media_dir,
    )
    from cdc_makanmana_spark.plans.queries import (
        _MEDIA_FIXTURE_DIR,
        _MEDIA_FP_PARQUET,
    )

    assert os.path.isdir(_MEDIA_FIXTURE_DIR), "run scripts/gen_media_fixtures.py"
    ref = pq.read_table(_MEDIA_FP_PARQUET).to_pydict()
    ref_img = {
        m: f for m, k, f in zip(ref["media_id"], ref["kind"], ref["fp"]) if k == "image"
    }
    ref_aud = {
        m: f for m, k, f in zip(ref["media_id"], ref["kind"], ref["fp"]) if k == "audio"
    }
    media = read_media_dir(spark, _MEDIA_FIXTURE_DIR, id_from="stem_digits")
    got_img = {r.media_id: r.ahash for r in image_ahash(media).collect()}
    got_aud = {r.media_id: r.afp for r in audio_fingerprint(media).collect()}
    assert got_img == ref_img and len(got_img) == 64
    assert got_aud == ref_aud and len(got_aud) == 64

    # the fused single-scan pass (q110's served plan) must agree with
    # the per-modality operators bit-for-bit
    from cdc_makanmana_spark.multimodal.binary import media_fingerprints

    fused = media_fingerprints(media).collect()
    assert {r.media_id: r.fp for r in fused if r.kind == "image"} == ref_img
    assert {r.media_id: r.fp for r in fused if r.kind == "audio"} == ref_aud
    assert len(fused) == 128


def test_q110_planted_pairs_complete(spark):
    """q110 returns EXACTLY the planted duplicate pairs: 10 exact + 14
    perturbed per modality, nothing else (unplanted floors are 20/13
    bits vs thresholds 6/3 — see the generator's separation report)."""
    from cdc_makanmana_spark.plans.queries import QUERIES

    out = {
        (r.kind, r.id_a, r.id_b): r.hamming
        for r in QUERIES["q110_multimodal_neardup"](spark, "/root/testdata/sf0.001").collect()
    }
    planted = set()
    for kind, base0 in (("image", 1), ("audio", 101)):
        for i in range(10):
            planted.add((kind, base0 + i, base0 + 40 + i))
        for i in range(14):
            planted.add((kind, base0 + 10 + i, base0 + 50 + i))
    assert set(out) == planted
    # exact copies pair at hamming 0 through the identical-signature
    # tier — unless one side rides the lossy JPEG container (r9), where
    # the pixels legitimately drift a few bits but stay under threshold
    def is_jpeg(mid: int) -> bool:
        return mid % 3 == 2 and mid % 9 != 1

    for i in range(10):
        if not is_jpeg(1 + i) and not is_jpeg(41 + i):
            assert out[("image", 1 + i, 41 + i)] == 0
        else:
            assert 0 <= out[("image", 1 + i, 41 + i)] <= 6
    assert all(out[("audio", 101 + i, 141 + i)] == 0 for i in range(10))


def test_y4m_round_trip_kernel():
    """encode_y4m → decode_y4m is exact, and the decoder rejects what
    it can't faithfully read (non-mono colourspace, truncated frame,
    foreign bytes)."""
    import numpy as np
    import pytest

    from cdc_makanmana_spark.multimodal import kernels

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (5, 24, 32)).astype(np.uint8)
    payload = kernels.encode_y4m(frames)
    back = kernels.decode_y4m(payload)
    assert back.shape == (5, 24, 32)
    assert (back == frames).all()
    with pytest.raises(ValueError):
        kernels.decode_y4m(b"P6\n1 1\n255\nxxx")
    with pytest.raises(ValueError):
        kernels.decode_y4m(payload[:-10])  # truncated final frame
    with pytest.raises(ValueError):
        kernels.decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C420jpeg\nFRAME\n" + b"\0" * 6)


def test_q111_planted_pairs_complete(spark):
    """q111 returns EXACTLY the planted video pairs: 6 exact copies
    (share all 4 sampled frames) + 8 partial copies (2 of 8 frames
    re-cut → >= 2 shared sampled frames), nothing else (unplanted
    pairs share 0 frame hashes — generator separation report)."""
    from cdc_makanmana_spark.plans.queries import QUERIES

    out = {
        (r.id_a, r.id_b): r.n_shared
        for r in QUERIES["q111_video_neardup"](spark, "/root/testdata/sf0.001").collect()
    }
    planted = {(201 + i, 225 + i) for i in range(6)}
    planted |= {(207 + i, 231 + i) for i in range(8)}
    assert set(out) == planted
    # exact copies share every sampled frame (8 frames, every 2nd)
    assert all(out[(201 + i, 225 + i)] == 4 for i in range(6))
    assert all(2 <= out[(207 + i, 231 + i)] <= 4 for i in range(8))


def test_read_media_dir_stem_digit_ids(spark, tmp_path):
    """stem_digits id mode: ids parse from the first digit run of the
    basename; digit-less names get NULL (never a silent 0 collision)."""
    import numpy as np

    from cdc_makanmana_spark.multimodal import kernels
    from cdc_makanmana_spark.multimodal.binary import read_media_dir

    d = tmp_path / "m"
    d.mkdir()
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    (d / "img_00017.ppm").write_bytes(kernels.encode_ppm(arr))
    (d / "clip42x.wav").write_bytes(
        kernels.encode_wav_pcm16(np.zeros(100), 8000)
    )
    (d / "nodigits.ppm").write_bytes(kernels.encode_ppm(arr))
    ids = {
        r["meta"]["codec"]: r["media_id"]
        for r in read_media_dir(spark, str(d), id_from="stem_digits").collect()
    }
    assert ids["pcm16"] == 42
    import pytest as _pytest

    with _pytest.raises(ValueError, match="id_from"):
        read_media_dir(spark, str(d), id_from="bogus")


# ---- JPEG (baseline DCT decode, round 9) -----------------------------------


def _gen_module():
    """The fixture generator IS the independent JPEG encoder the
    decoder is tested against (separate code, shared spec)."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "gen_media_fixtures.py",
    )
    spec = importlib.util.spec_from_file_location("gen_media_fixtures", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_jpeg_decode_variants_match_expected():
    """decode_jpeg reproduces the encoder's expected-decoded pixels
    EXACTLY (dequant → IDCT → round/clip is spec-pinned arithmetic)
    across 4:4:4, 4:2:0 subsampling, grayscale, and restart-marker
    streams, on non-multiple-of-16 dims (MCU padding crop)."""
    gen = _gen_module()

    for i in (0, 3, 5):
        arr = gen.make_image(i)  # 32/48/64-px sides, seeded
        for kw in (
            {"quality": 96},
            {"quality": 95, "subsample": True},
            {"quality": 96, "gray": True},
            {"quality": 94, "restart_interval": 2},
            {"quality": 75, "restart_interval": 3, "subsample": True},
        ):
            if kw.get("subsample") and (arr.shape[0] % 2 or arr.shape[1] % 2):
                continue
            data, expected = gen.encode_jpeg_with_expected(arr, **kw)
            got = kernels.decode_jpeg(data)
            assert got.shape == expected.shape
            assert (got == expected).all(), kw
            assert kernels.jpeg_dims(data) == (arr.shape[1], arr.shape[0])


def test_jpeg_padding_crop_odd_dims():
    """48x40 at 4:2:0 → MCU grid 16-aligned (3x3 MCUs cover 48x48);
    the decoder must crop the replication-padded rows/cols away."""
    import numpy as np

    gen = _gen_module()
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (40, 48, 3)).astype(np.uint8)
    data, expected = gen.encode_jpeg_with_expected(arr, quality=90, subsample=True)
    got = kernels.decode_jpeg(data)
    assert got.shape == (40, 48, 3)
    assert (got == expected).all()


def test_jpeg_scope_rejections():
    """Out-of-scope streams raise ValueError by marker — progressive
    (SOF2), 16-bit quant tables, truncation — and never mis-decode."""
    import pytest

    gen = _gen_module()
    arr = gen.make_image(1)
    data, _ = gen.encode_jpeg_with_expected(arr, quality=92)

    with pytest.raises(ValueError, match="SOI"):
        kernels.decode_jpeg(b"\x00" + data)
    # a baseline stream RELABELED as SOF2 is malformed progressive
    # (its single scan claims the full 0..63 band with Ss=0): the
    # progressive path must reject it, not mis-decode
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Se"):
        kernels.decode_jpeg(prog)
    # ...while dims-only parsing legitimately succeeds on SOF2 now
    assert kernels.jpeg_dims(prog) == kernels.jpeg_dims(data)
    # frame types outside the supported pair still reject by marker
    sof9 = data.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="SOF9"):
        kernels.decode_jpeg(sof9)
    with pytest.raises(ValueError, match="SOF9"):
        kernels.jpeg_dims(sof9)
    # 16-bit DQT: flip Pq of the first quant table
    i = data.index(b"\xff\xdb") + 4
    bad = data[:i] + bytes([data[i] | 0x10]) + data[i + 1 :]
    with pytest.raises(ValueError, match="16-bit"):
        kernels.decode_jpeg(bad)
    with pytest.raises(ValueError):
        kernels.decode_jpeg(data[: len(data) // 2])  # truncated scan


def test_jpeg_progressive_decode_matches_expected():
    """SOF2 streams (DC-first Al=1 → DC-refine → spectral-split AC
    band scans with EOBn runs) decode to EXACTLY the expected pixels
    across 4:4:4, 4:2:0, grayscale and restart-interval variants —
    and byte-for-byte the same pixels as the baseline encoding of the
    same quantized coefficients."""
    gen = _gen_module()

    for i in (0, 3, 5):
        arr = gen.make_image(i)
        for kw in (
            {"quality": 96},
            {"quality": 95, "subsample": True},
            {"quality": 96, "gray": True},
            {"quality": 94, "restart_interval": 2},
            {"quality": 75, "restart_interval": 3, "subsample": True},
        ):
            if kw.get("subsample") and (arr.shape[0] % 2 or arr.shape[1] % 2):
                continue
            data, expected = gen.encode_jpeg_with_expected(
                arr, progressive=True, **kw
            )
            if not kw.get("restart_interval"):
                sa_data, sa_expected = gen.encode_jpeg_with_expected(
                    arr, progressive=True, ac_sa=True, **kw
                )
                assert (sa_expected == expected).all()
                assert (kernels.decode_jpeg(sa_data) == expected).all(), kw
            assert data[:4] != b"\xff\xd8\xff\xc0"
            assert b"\xff\xc2" in data  # SOF2 on the wire
            got = kernels.decode_jpeg(data)
            assert got.shape == expected.shape
            assert (got == expected).all(), kw
            assert kernels.jpeg_dims(data) == (arr.shape[1], arr.shape[0])
            # same coefficients → same pixels as the baseline container
            base, base_expected = gen.encode_jpeg_with_expected(arr, **kw)
            assert (base_expected == expected).all()
            assert (kernels.decode_jpeg(base) == got).all()


def test_jpeg_progressive_malformed_scan_headers_raise():
    """Malformed progressive scan headers raise ValueError: a DC scan
    claiming a nonzero Se, and a multi-component AC scan."""
    import pytest

    gen = _gen_module()
    arr = gen.make_image(1)
    data, _ = gen.encode_jpeg_with_expected(arr, progressive=True, quality=92)
    # first SOS is the interleaved DC scan: corrupt its Se byte
    pos = data.index(b"\xff\xda")
    ns = data[pos + 4]
    se_at = pos + 6 + 2 * ns
    bad = data[:se_at] + bytes([63]) + data[se_at + 1 :]
    with pytest.raises(ValueError, match="Se"):
        kernels.decode_jpeg(bad)


def test_jpeg_corrupt_payloads_raise_valueerror_not_indexerror():
    """Every malformed-payload class raises ValueError (the contract
    read_media_dir's corrupt-downgrade relies on), never IndexError:
    fill-byte run past EOF, lying DHT/SOF segment lengths, and a
    header-valid stream whose entropy scan is truncated mid-MCU (the
    zero-padded lookahead must not decode garbage silently)."""
    import pytest

    gen = _gen_module()

    # fill-byte loop walking off the payload end
    with pytest.raises(ValueError):
        kernels.decode_jpeg(b"\xff\xd8" + b"\xff" * 10)
    with pytest.raises(ValueError):
        kernels.jpeg_dims(b"\xff\xd8" + b"\xff" * 10)

    arr = gen.make_image(1)
    data, _ = gen.encode_jpeg_with_expected(arr, quality=92)

    # DHT whose symbol table is shorter than its count row claims:
    # zero the payload after counts but keep the segment length
    i = data.index(b"\xff\xc4")
    seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
    lying = data[:i] + b"\xff\xc4\x00\x13" + data[i + 4 : i + 4 + 17] + data[i + 2 + seg_len :]
    with pytest.raises(ValueError):
        kernels.decode_jpeg(lying)

    # SOF0 cut short (claims 3 components, provides none)
    j = data.index(b"\xff\xc0")
    sof_short = data[:j] + b"\xff\xc0\x00\x08" + data[j + 4 : j + 10] + data[j + 2 + int.from_bytes(data[j + 2 : j + 4], "big") :]
    with pytest.raises(ValueError):
        kernels.decode_jpeg(sof_short)

    # header-valid, scan truncated mid-MCU: must raise, not return
    # wrong pixels (keep SOI..SOS headers + a sliver of entropy data)
    k = data.index(b"\xff\xda")
    sos_len = int.from_bytes(data[k + 2 : k + 4], "big")
    scan_start = k + 2 + sos_len
    truncated = data[: scan_start + 2] + b"\xff\xd9"
    with pytest.raises(ValueError):
        kernels.decode_jpeg(truncated)


def test_jpeg_ingest_and_fingerprint_path(spark, tmp_path):
    """read_media_dir classifies .jpg payloads (SOF0-only dims in the
    metadata pass), corrupt JPEG downgrades to binary, and the aHash
    kernel fingerprints the decoded pixels — matching the generator's
    independent expected-pixel hash."""
    from cdc_makanmana_spark.multimodal.binary import image_ahash, read_media_dir

    gen = _gen_module()
    arr = gen.make_image(2)
    data, expected = gen.encode_jpeg_with_expected(arr, quality=96)
    d = tmp_path / "m"
    d.mkdir()
    (d / "img_00005.jpg").write_bytes(data)
    (d / "img_00006.jpg").write_bytes(data[:40])  # truncated → corrupt
    media = read_media_dir(spark, str(d), id_from="stem_digits")
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[5]["kind"] == "image"
    assert rows[5]["meta"]["codec"] == "jpeg"
    assert rows[5]["meta"]["width"] == arr.shape[1]
    assert rows[6]["kind"] == "binary"
    assert rows[6]["meta"]["codec"] == "corrupt-jpeg"
    got = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    assert got[5] == gen.ahash64(expected)


def test_media_fingerprints_dir_matches_staged_chain(spark):
    """The r10 fused scan→classify→fingerprint pass must be
    row-identical to the staged read_media_dir → media_fingerprints
    chain on the committed fixture mix (PPM/PNG/baseline+progressive
    JPEG/WAV present), for both id derivations — the optimization only
    removes the second payload crossing, never a row or a bit."""
    from cdc_makanmana_spark.multimodal.binary import (
        media_fingerprints,
        media_fingerprints_dir,
        read_media_dir,
    )
    from cdc_makanmana_spark.plans.queries import _MEDIA_FIXTURE_DIR

    for id_from in ("stem_digits", "path_hash"):
        staged = sorted(
            tuple(r)
            for r in media_fingerprints(
                read_media_dir(
                    spark,
                    _MEDIA_FIXTURE_DIR,
                    glob="*.{ppm,png,jpg,wav}",
                    id_from=id_from,
                )
            ).collect()
        )
        fused = sorted(
            tuple(r)
            for r in media_fingerprints_dir(
                spark,
                _MEDIA_FIXTURE_DIR,
                glob="*.{ppm,png,jpg,wav}",
                id_from=id_from,
            ).collect()
        )
        assert fused == staged and len(fused) > 0


def test_video_frame_hashes_dir_matches_staged_chain(spark, tmp_path):
    """The r10 fused scan→decode→sample→hash video pass must be
    row-identical to the staged read_media_dir → video_frame_hashes
    chain on the committed Y4M fixtures — including the corrupt-payload
    downgrade (a truncated Y4M drops in both paths) and the every_nth
    sampling indexes. The fusion removes two payload boundary crossings
    and the per-frame PPM encode/parse round-trip, never a row or a
    bit (encode_ppm/decode_ppm is lossless and the ×3-replicated gray
    channel mean is exactly the gray value in float64)."""
    import shutil

    from cdc_makanmana_spark.multimodal.binary import (
        read_media_dir,
        video_frame_hashes,
        video_frame_hashes_dir,
    )
    from cdc_makanmana_spark.plans.queries import _MEDIA_FIXTURE_DIR

    d = tmp_path / "m"
    d.mkdir()
    n_good = 0
    for name in sorted(os.listdir(_MEDIA_FIXTURE_DIR)):
        if name.endswith(".y4m"):
            shutil.copy(os.path.join(_MEDIA_FIXTURE_DIR, name), d / name)
            n_good += 1
        if n_good >= 6:
            break
    # corrupt payload: header fails to parse → downgraded/skip in both
    (d / "vid_09999.y4m").write_bytes(b"YUV4MPEG2 garbage")

    for every_nth, id_from in ((2, "stem_digits"), (3, "path_hash")):
        staged = sorted(
            tuple(r)
            for r in video_frame_hashes(
                read_media_dir(spark, str(d), glob="*.y4m", id_from=id_from),
                every_nth=every_nth,
            ).collect()
        )
        fused = sorted(
            tuple(r)
            for r in video_frame_hashes_dir(
                spark, str(d), glob="*.y4m", id_from=id_from, every_nth=every_nth
            ).collect()
        )
        assert fused == staged and len(fused) > 0
