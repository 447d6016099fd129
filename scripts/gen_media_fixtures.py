"""Deterministic media fixture generator for q110 (multimodal near-dup
on the oracle surface).

Writes, from ONE seeded pass:
- ``fixtures/media/img_<id>.{ppm,png}`` — real images (seeded
  gradients + noise), including planted exact copies and
  noise-perturbed near-dups. The CONTAINER is mixed per id (P6 PPM /
  RGB PNG with all five row filters cycling / RGBA PNG) while the
  pixels stay the encoding-independent arrays — so planted duplicates
  cross containers and the q110 hash certifies that the engine's PPM
  parse and its zlib-inflate+unfilter PNG decode reconstruct the SAME
  pixels;
- ``fixtures/media/aud_<id>.wav``  — real PCM16 WAV clips (seeded sine
  mixes), with the same planting scheme;
- ``fixtures/media_fingerprints.parquet`` — (media_id, kind, fp): the
  64-bit perceptual fingerprint of every file, computed HERE from the
  source arrays by this script's own implementations — deliberately
  separate code from ``cdc_makanmana_spark.multimodal`` — so the q110
  oracle replays the near-dup pairing over fingerprints the engine
  never produced. If the engine's binaryFile → mapInPandas → kernel
  path drifts (header parsing, resampling, FFT banding, bit packing),
  the Spark fingerprints stop matching these and the driver hash diff
  fails.

Fingerprint specs (shared contract, independent code):
- image aHash: nearest-neighbor resample to 8x8 (index map
  ``i*src//8``), per-cell luminance = RGB mean, bit i set iff cell i >
  grid mean; 64 bits, two's-complement into signed int64.
- audio fingerprint: power spectrum of the PCM16-quantized samples,
  64 log-spaced bands on [50 Hz, 0.9*Nyquist], bit i set iff band
  energy > across-band mean (gain-invariant).

Also writes, for q111 (video near-dup):
- ``fixtures/media/vid_<id>.y4m`` — real YUV4MPEG2 ``Cmono`` raw
  videos (8 seeded gray frames each; Y4M is the public uncompressed
  container, decodable without codec libraries), including planted
  exact copies and PARTIAL copies (a subset of frames replaced — the
  "trimmed/re-cut copy" shape video_near_duplicates pairs on: shared
  EXACT frame hashes, not per-frame noise);
- ``fixtures/media_frame_hashes.parquet`` — (media_id, frame_idx,
  fhash): every frame's aHash computed HERE from the source arrays by
  this script's own implementation, so the q111 oracle replays frame
  sampling + postings pairing over hashes the engine never produced.

Run: ``python scripts/gen_media_fixtures.py`` (idempotent — fixed
seed, rewrites the same bytes).
"""

from __future__ import annotations

import hashlib
import io
import os
import wave

import numpy as np

SEED = 2026
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
MEDIA_DIR = os.path.join(OUT_DIR, "fixtures", "media")
FP_PARQUET = os.path.join(OUT_DIR, "fixtures", "media_fingerprints.parquet")

N_BASE = 40  # base items per modality
N_EXACT = 10  # planted exact copies (hamming 0)
N_NEAR = 14  # planted noise-perturbed near-dups (small hamming)

FH_PARQUET = os.path.join(OUT_DIR, "fixtures", "media_frame_hashes.parquet")
N_VBASE = 24  # base videos
N_VEXACT = 6  # planted exact video copies
N_VPART = 8  # planted partial copies (2 of 8 frames replaced)
V_FRAMES = 8
V_W, V_H = 32, 24


def _rng(tag: str) -> np.random.Generator:
    h = hashlib.sha256(f"{SEED}:{tag}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "big"))


# ---- independent fingerprint implementations (NOT the engine's) -----------


def ahash64(arr: np.ndarray) -> int:
    """8x8 average-hash of an (h, w, 3) uint8 array; signed int64."""
    h, w, _ = arr.shape
    ys = np.clip(np.arange(8) * h // 8, 0, h - 1)
    xs = np.clip(np.arange(8) * w // 8, 0, w - 1)
    lum = arr[ys][:, xs].astype(np.float64).mean(axis=2)
    bits = (lum > lum.mean()).flatten()
    v = 0
    for i in range(64):
        if bits[i]:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_fp64(samples: np.ndarray, rate: int) -> int:
    """64-band log-spaced spectral-energy sign fingerprint; signed
    int64. ``samples`` must already be PCM16-quantized floats."""
    n = len(samples)
    spec = np.abs(np.fft.rfft(samples)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    lo, hi = 50.0, max(rate / 2.0 * 0.9, 100.0)
    edges = np.geomspace(lo, hi, 65)
    energy = np.empty(64)
    for b in range(64):
        mask = (freqs >= edges[b]) & (freqs < edges[b + 1])
        energy[b] = spec[mask].sum() if mask.any() else 0.0
    thresh = energy.mean()
    v = 0
    for i in range(64):
        if energy[i] > thresh:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def pcm16_roundtrip(samples: np.ndarray) -> np.ndarray:
    """Quantize float samples exactly as a PCM16 WAV write+read does."""
    q = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    return q.astype(np.float64) / 32767.0


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def encode_png_mixed_filters(arr: np.ndarray, alpha: np.ndarray | None = None) -> bytes:
    """INDEPENDENT PNG writer (NOT the engine's encode_png): 8-bit
    RGB (or RGBA when ``alpha`` is given), with the row filter type
    CYCLING through all five spec filters (row % 5: None, Sub, Up,
    Average, Paeth) so the engine's unfilter paths are all exercised
    by the committed fixtures, not just filter 0. The filter step is
    the ENCODER-side forward transform (raw - predictor mod 256); a
    decoder that gets any predictor wrong reconstructs different
    pixels and the q110 fingerprint hash diff fails."""
    import struct
    import zlib

    h, w, _ = arr.shape
    px = arr.astype(np.int64)
    if alpha is not None:
        px = np.concatenate([px, alpha.astype(np.int64)[:, :, None]], axis=2)
    ch = px.shape[2]
    color_type = 6 if ch == 4 else 2
    rows = []
    prev = np.zeros((w, ch), dtype=np.int64)
    for y in range(h):
        cur = px[y]
        f = y % 5
        if f == 0:
            out = cur
        elif f == 1:  # Sub
            left = np.vstack([np.zeros((1, ch), dtype=np.int64), cur[:-1]])
            out = (cur - left) % 256
        elif f == 2:  # Up
            out = (cur - prev) % 256
        elif f == 3:  # Average
            left = np.vstack([np.zeros((1, ch), dtype=np.int64), cur[:-1]])
            out = (cur - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.vstack([np.zeros((1, ch), dtype=np.int64), cur[:-1]])
            upleft = np.vstack([np.zeros((1, ch), dtype=np.int64), prev[:-1]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = (cur - pred) % 256
        rows.append(bytes([f]) + out.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + chunk(b"IEND", b"")
    )


def image_file_bytes(mid: int, arr: np.ndarray) -> tuple[str, bytes]:
    """(filename, bytes) for image ``mid``: the CONTAINER varies by id
    (mid % 3 == 0 → RGB PNG with cycling filters; mid % 9 == 1 → RGBA
    PNG with a deterministic alpha ramp the engine must drop;
    otherwise P6 PPM) while the PIXELS — and hence the reference
    fingerprint — stay the encoding-independent array. Planted copies
    thus cross containers (a PPM base's exact copy can land as a PNG):
    the near-dup pairing certifies decode equivalence across formats."""
    if mid % 3 == 0:
        return f"img_{mid:05d}.png", encode_png_mixed_filters(arr)
    if mid % 9 == 1:
        h, w, _ = arr.shape
        alpha = ((np.arange(w)[None, :] * 255) // max(w - 1, 1)) * np.ones(
            (h, 1), dtype=np.int64
        )
        return f"img_{mid:05d}.png", encode_png_mixed_filters(arr, alpha=alpha)
    return f"img_{mid:05d}.ppm", encode_ppm(arr)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def encode_y4m(frames: np.ndarray) -> bytes:
    """(n, h, w) uint8 → YUV4MPEG2 Cmono bytes (independent writer)."""
    n, h, w = frames.shape
    head = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 Cmono\n" % (w, h)
    return head + b"".join(
        b"FRAME\n" + frames[k].astype(np.uint8).tobytes() for k in range(n)
    )


def frame_ahash64(frame: np.ndarray) -> int:
    """aHash of a gray (h, w) frame == ahash64 of its gray→RGB stack
    (the engine emits sampled Y4M frames as R=G=B PPMs)."""
    return ahash64(np.repeat(frame[:, :, None], 3, axis=2))


# ---- content generation -----------------------------------------------------


def make_image(i: int) -> np.ndarray:
    rng = _rng(f"img:{i}")
    w = 32 + int(rng.integers(0, 3)) * 16
    h = 32 + int(rng.integers(0, 3)) * 16
    yy, xx = np.mgrid[0:h, 0:w]
    angle = rng.uniform(0, 2 * np.pi)
    ramp = (np.cos(angle) * xx / max(w - 1, 1) + np.sin(angle) * yy / max(h - 1, 1))
    ramp = (ramp - ramp.min()) / max(ramp.ptp(), 1e-9)
    base = np.stack(
        [
            (ramp * 255),
            ((1 - ramp) * 255),
            rng.integers(0, 256, (h, w)).astype(np.float64),
        ],
        axis=2,
    )
    # a few random rectangles so the luminance grid is content-bearing
    for _ in range(int(rng.integers(2, 6))):
        y0, x0 = int(rng.integers(0, h // 2)), int(rng.integers(0, w // 2))
        y1, x1 = y0 + int(rng.integers(4, h // 2)), x0 + int(rng.integers(4, w // 2))
        base[y0:y1, x0:x1] = rng.uniform(0, 255, 3)
    return np.clip(base, 0, 255).astype(np.uint8)


def perturb_image(arr: np.ndarray, i: int) -> np.ndarray:
    rng = _rng(f"imgp:{i}")
    noise = rng.integers(-10, 11, arr.shape)
    return np.clip(arr.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def make_audio(i: int, rate: int = 8000) -> np.ndarray:
    """Spectrally RICH clip: ~16 tones spread across the band range so
    roughly half the fingerprint's 64 log bands carry above-mean energy
    — a sparse 2-3-tone mix activates so few bands that unrelated clips
    collide within small Hamming distance (the audio_near_duplicates
    docstring's caveat, measured: 239 unrelated pairs within 3 bits)."""
    rng = _rng(f"aud:{i}")
    t = np.arange(rate // 2) / rate  # 0.5 s
    s = np.zeros_like(t)
    for _ in range(16):
        freq = float(np.exp(rng.uniform(np.log(60), np.log(3500))))
        s += float(rng.uniform(0.1, 0.3)) * np.sin(
            2 * np.pi * freq * t + float(rng.uniform(0, 2 * np.pi))
        )
    return 0.8 * s / max(np.abs(s).max(), 1e-9)


def perturb_audio(samples: np.ndarray, i: int) -> np.ndarray:
    """Additive noise + mild gain change: strong enough to flip a few
    borderline band bits (so the near tier exercises the cross-value
    blocking, not just the identical-signature tier), far below the
    content-difference floor."""
    rng = _rng(f"audp:{i}")
    gain = float(rng.uniform(0.9, 1.1))
    return np.clip(
        gain * samples + 0.05 * rng.standard_normal(len(samples)), -1, 1
    )


def make_frame(tag: str, w: int = V_W, h: int = V_H) -> np.ndarray:
    """One seeded gray frame: oriented ramp + rectangles (the image
    recipe's luminance structure, single channel)."""
    rng = _rng(tag)
    yy, xx = np.mgrid[0:h, 0:w]
    angle = rng.uniform(0, 2 * np.pi)
    ramp = np.cos(angle) * xx / max(w - 1, 1) + np.sin(angle) * yy / max(h - 1, 1)
    ramp = (ramp - ramp.min()) / max(ramp.ptp(), 1e-9)
    base = ramp * 255
    for _ in range(int(rng.integers(2, 5))):
        y0, x0 = int(rng.integers(0, h // 2)), int(rng.integers(0, w // 2))
        y1, x1 = y0 + int(rng.integers(4, h // 2)), x0 + int(rng.integers(4, w // 2))
        base[y0:y1, x0:x1] = rng.uniform(0, 255)
    return np.clip(base, 0, 255).astype(np.uint8)


def make_video(i: int, n_frames: int = V_FRAMES) -> np.ndarray:
    return np.stack([make_frame(f"vid:{i}:f{f}") for f in range(n_frames)])


def partial_copy(frames: np.ndarray, i: int) -> np.ndarray:
    """A re-cut copy: 2 of the frames replaced with fresh content —
    shares the other frames' hashes EXACTLY (>= 2 even if both
    replacements land on sampled positions at every_nth=2) (the pairing signal
    video_near_duplicates counts), unlike per-pixel noise which would
    flip hash bits and share nothing."""
    rng = _rng(f"vidp:{i}")
    out = frames.copy()
    for f in sorted(rng.choice(frames.shape[0], size=2, replace=False)):
        out[int(f)] = make_frame(f"vidp:{i}:f{int(f)}")
    return out


def main(scale: int = 1, out_root: str | None = None, v_frames: int = V_FRAMES) -> None:
    """``scale`` multiplies every base/planted count (the media-volume
    knob for the organic performance series); ``out_root`` redirects
    output (NEVER point a scale>1 run at the committed fixtures — the
    1x layout, ids and bytes are the certified oracle surface).
    ``v_frames`` is the duration knob for videos. At scale 1 with the
    default out_root this is byte-identical to the committed fixtures
    (fixed seed), and the planted/unplanted separation reports run;
    at scale>1 the audio/video id bases move to 10M/20M (the 1x bases
    101/201 would collide with >100 images) and the O(n²) reports are
    skipped."""
    media_dir = MEDIA_DIR if out_root is None else os.path.join(out_root, "media")
    fp_parquet = (
        FP_PARQUET
        if out_root is None
        else os.path.join(out_root, "media_fingerprints.parquet")
    )
    fh_parquet = (
        FH_PARQUET
        if out_root is None
        else os.path.join(out_root, "media_frame_hashes.parquet")
    )
    n_base, n_exact, n_near = N_BASE * scale, N_EXACT * scale, N_NEAR * scale
    n_vbase, n_vexact, n_vpart = N_VBASE * scale, N_VEXACT * scale, N_VPART * scale
    aud_base0 = 101 if scale == 1 else 10_000_000
    vid_base0 = 201 if scale == 1 else 20_000_000
    os.makedirs(media_dir, exist_ok=True)
    rows: list[tuple[int, str, int]] = []

    # images: ids 1..N; exact copies N+1.., near-dups after that
    images: dict[int, np.ndarray] = {}
    next_id = 1
    for i in range(n_base):
        images[next_id] = make_image(i)
        next_id += 1
    for i in range(n_exact):
        images[next_id] = images[1 + i]  # copy of base i
        next_id += 1
    for i in range(n_near):
        images[next_id] = perturb_image(images[1 + n_exact + i], i)
        next_id += 1
    for mid, arr in images.items():
        fname, data = image_file_bytes(mid, arr)
        with open(os.path.join(media_dir, fname), "wb") as f:
            f.write(data)
        rows.append((mid, "image", ahash64(arr)))

    # audio: ids disjoint from image ids
    audio: dict[int, np.ndarray] = {}
    next_id = aud_base0
    for i in range(n_base):
        audio[next_id] = make_audio(i)
        next_id += 1
    for i in range(n_exact):
        audio[next_id] = audio[aud_base0 + i]
        next_id += 1
    for i in range(n_near):
        audio[next_id] = perturb_audio(audio[aud_base0 + n_exact + i], i)
        next_id += 1
    rate = 8000
    for mid, s in audio.items():
        with open(os.path.join(media_dir, f"aud_{mid:05d}.wav"), "wb") as f:
            f.write(encode_wav(s, rate))
        rows.append((mid, "audio", audio_fp64(pcm16_roundtrip(s), rate)))

    # videos: ids disjoint from image/audio ids
    videos: dict[int, np.ndarray] = {}
    next_id = vid_base0
    for i in range(n_vbase):
        videos[next_id] = make_video(i, n_frames=v_frames)
        next_id += 1
    for i in range(n_vexact):
        videos[next_id] = videos[vid_base0 + i]
        next_id += 1
    for i in range(n_vpart):
        videos[next_id] = partial_copy(videos[vid_base0 + n_vexact + i], i)
        next_id += 1
    fh_rows: list[tuple[int, int, int]] = []
    for mid, frames in videos.items():
        with open(os.path.join(media_dir, f"vid_{mid:05d}.y4m"), "wb") as f:
            f.write(encode_y4m(frames))
        for fi in range(frames.shape[0]):
            fh_rows.append((mid, fi, frame_ahash64(frames[fi])))

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "fp": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, fp_parquet)
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([r[0] for r in fh_rows], pa.int64()),
                "frame_idx": pa.array([r[1] for r in fh_rows], pa.int32()),
                "fhash": pa.array([r[2] for r in fh_rows], pa.int64()),
            }
        ),
        fh_parquet,
    )

    # report planted-vs-unplanted separation (generation-time sanity;
    # O(n²) in Python — 1x only, scale runs are performance fixtures)
    if scale == 1:
        def planted_pairs(base0: int) -> set[tuple[int, int]]:
            p = {(base0 + i, base0 + n_base + i) for i in range(n_exact)}
            p |= {
                (base0 + n_exact + i, base0 + n_base + n_exact + i)
                for i in range(n_near)
            }
            return p

        for kind, base0 in (("image", 1), ("audio", aud_base0)):
            fps = {r[0]: r[2] for r in rows if r[1] == kind}
            ids = sorted(fps)
            planted = planted_pairs(base0)
            pd_, ud = [], []
            for ai, a in enumerate(ids):
                for b in ids[ai + 1 :]:
                    d = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
                    (pd_ if (a, b) in planted else ud).append(d)
            pd_.sort()
            ud.sort()
            print(f"{kind}: planted max={pd_[-1]} (all={pd_}); "
                  f"unplanted min={ud[0]} p1={ud[len(ud)//100]} median={ud[len(ud)//2]}")
        # video sharing report at the engine's every_nth=2 sampling:
        # planted pairs must share >= min_shared sampled-frame hashes;
        # unrelated pairs must share none (exact 64-bit collisions
        # across seeded content would show up here)
        vids = sorted(videos)
        sampled = {
            m: {h for (mm, fi, h) in fh_rows if mm == m and fi % 2 == 0}
            for m in vids
        }
        vplanted = {
            (vid_base0 + i, vid_base0 + n_vbase + i) for i in range(n_vexact)
        } | {
            (vid_base0 + n_vexact + i, vid_base0 + n_vbase + n_vexact + i)
            for i in range(n_vpart)
        }
        pshared, ushared = [], []
        for ai, a in enumerate(vids):
            for b in vids[ai + 1 :]:
                n = len(sampled[a] & sampled[b])
                (pshared if (a, b) in vplanted else ushared).append(n)
        print(
            f"video: planted shared sampled-frames min={min(pshared)} "
            f"(all={sorted(pshared)}); unplanted max={max(ushared)}"
        )
    n_png = sum(1 for m in images if m % 3 == 0 or m % 9 == 1)
    print(f"wrote {len(images)} images ({n_png} png, {len(images) - n_png} ppm) "
          f"+ {len(audio)} wavs + {len(videos)} y4m videos to {media_dir}")
    print(f"wrote {len(rows)} fingerprints to {fp_parquet}")
    print(f"wrote {len(fh_rows)} frame hashes to {fh_parquet}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=1,
                    help="media-count multiplier (1 = committed fixtures)")
    ap.add_argument("--out", default=None,
                    help="output root (required for scale > 1; contains "
                         "media/ + the two reference parquets)")
    ap.add_argument("--frames", type=int, default=V_FRAMES,
                    help="frames per video (duration knob)")
    a = ap.parse_args()
    if a.scale != 1 and a.out is None:
        ap.error("--scale > 1 requires --out (never overwrite the "
                 "committed 1x fixtures with a scale run)")
    main(scale=a.scale, out_root=a.out, v_frames=a.frames)
