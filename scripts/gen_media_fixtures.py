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


# ---- independent baseline JPEG encoder (NOT the engine's decoder) ---------
#
# Writes real baseline-sequential JPEGs (SOF0, canonical huffman,
# optional 4:2:0 subsampling / grayscale / restart intervals) and
# returns, alongside the bytes, the EXPECTED DECODED PIXELS — computed
# from the quantized coefficients by the spec's reconstruction math
# (dequant → IDCT → level shift → round/clip → replication upsample →
# BT.601), never by parsing the bytes back. JPEG is lossy, so the
# reference fingerprint must hash what a correct decoder OUTPUTS, not
# the source array; the engine's marker/huffman/scan machinery stays
# independently certified because this side never reads the stream it
# wrote. Huffman tables here are per-image fixed-length canonical
# tables (every used symbol at one code length) — deliberately NOT the
# Annex K typical tables, so the engine's generic DHT handling is
# exercised, not a hardcoded-table shortcut.

_J_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K example quantization tables (natural order)
_J_QLUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_J_QCHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _j_quality(base: np.ndarray, q: int) -> np.ndarray:
    """libjpeg-convention quality scaling of a base table."""
    s = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


def _j_dct_m() -> np.ndarray:
    y, v = np.mgrid[0:8, 0:8]
    m = 0.5 * np.cos((2 * y + 1) * v * np.pi / 16)
    m[:, 0] *= 1 / np.sqrt(2)
    return m


_J_M = _j_dct_m()


def _j_pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a 2-D plane to (ph, pw)."""
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _j_block_grid(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 → (H//8, W//8, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _j_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _JBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush_padded(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _j_symbolize_block(zz: np.ndarray, pred: int) -> tuple[int, list, list]:
    """One quantized zigzag block → (new_pred, dc_records, ac_records)
    where records are (symbol, value_bits, n_value_bits)."""
    dc = int(zz[0])
    diff = dc - pred
    t = _j_cat(diff)
    dcrec = [(t, diff if diff >= 0 else diff + (1 << t) - 1, t)]
    acrec = []
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acrec.append((0xF0, 0, 0))  # ZRL
            run -= 16
        s = _j_cat(v)
        acrec.append(((run << 4) | s, v if v >= 0 else v + (1 << s) - 1, s))
        run = 0
    if last_nz < 63:
        acrec.append((0x00, 0, 0))  # EOB
    return dc, dcrec, acrec


def _j_huff(symbols: set) -> tuple[list, list, dict]:
    """Fixed-length canonical huffman table over the used symbols:
    (counts[16], ordered_symbols, {symbol: (code, length)})."""
    import math as _math

    syms = sorted(symbols)
    length = max(2, _math.ceil(_math.log2(len(syms) + 1)))
    counts = [0] * 16
    counts[length - 1] = len(syms)
    codes = {s: (i, length) for i, s in enumerate(syms)}
    return counts, syms, codes


def encode_jpeg_with_expected(
    arr: np.ndarray,
    quality: int = 92,
    subsample: bool = False,
    gray: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    ac_sa: bool = False,
) -> tuple[bytes, np.ndarray]:
    """(jpeg_bytes, expected_decoded_rgb) for an (h, w, 3) uint8 array.

    ``progressive=True`` emits an SOF2 stream with the scan script
    DC-first(Al=1, interleaved) → DC-refine(Ah=1) → per-component AC
    band scans (luma split 1-5 / 6-63 to exercise spectral selection;
    chroma full-band), EOBn run codes accumulated across all-zero
    bands. Same quantized coefficients as the baseline form, so the
    expected decoded pixels are identical for the coded block grid —
    and the padded MCU blocks whose AC a progressive stream never
    codes are exactly the rows/cols the decoder crops."""
    import struct

    h, w, _ = arr.shape
    rgb = arr.astype(np.float64)
    yy = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": yy}]
    else:
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128.0
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128.0
        if subsample:
            # 2x2 mean chroma downsample (encoder-side convention)
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            comps = [
                {"id": 1, "h": 2, "v": 2, "tq": 0, "plane": yy},
                {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
                {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr},
            ]
        else:
            comps = [
                {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": yy},
                {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
                {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr},
            ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qt = {0: _j_quality(_J_QLUM, quality), 1: _j_quality(_J_QCHROM, quality)}

    # forward DCT + quantize, blocks kept on the component block grid
    for c in comps:
        ph, pw = mcuy * c["v"] * 8, mcux * c["h"] * 8
        plane = _j_pad_to(c["plane"], ph, pw) - 128.0
        bg = _j_block_grid(plane)  # (by, bx, 8, 8)
        # forward: F = M.T @ s @ M per block
        coeffs = np.einsum("yv,abyx,xu->abvu", _J_M, bg, _J_M)
        qnat = qt[c["tq"]].reshape(64)
        c["zz"] = np.round(coeffs.reshape(bg.shape[0], bg.shape[1], 64) / qnat).astype(
            np.int64
        )[:, :, :]  # natural order still
        c["zz"] = c["zz"][:, :, _J_ZZ]  # → zigzag order

    if progressive:
        return (
            _j_encode_progressive(
                comps, qt, h, w, mcux, mcuy, gray, restart_interval, ac_sa
            ),
            _j_expected_pixels(comps, qt, h, w, hmax, vmax, gray),
        )

    # MCU-interleaved symbol stream (two passes: tables, then bits)
    dc_syms: dict[int, set] = {0: set(), 1: set()}
    ac_syms: dict[int, set] = {0: set(), 1: set()}
    preds = [0] * len(comps)
    n_mcu_done = 0
    stream: list[tuple] = []  # (class_id, dcrec, acrec) per block in order
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu_done and n_mcu_done % restart_interval == 0:
                preds = [0] * len(comps)
                stream.append(("RST", (n_mcu_done // restart_interval - 1) % 8))
            for ci, c in enumerate(comps):
                cls = 0 if ci == 0 else 1
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = c["zz"][my * c["v"] + by, mx * c["h"] + bx]
                        preds[ci], dcrec, acrec = _j_symbolize_block(zz, preds[ci])
                        dc_syms[cls].update(s for s, _, _ in dcrec)
                        ac_syms[cls].update(s for s, _, _ in acrec)
                        stream.append((cls, dcrec, acrec))
            n_mcu_done += 1

    n_classes = 1 if gray else 2
    dc_tables = {c: _j_huff(dc_syms[c]) for c in range(n_classes)}
    ac_tables = {c: _j_huff(ac_syms[c]) for c in range(n_classes)}

    bw = _JBitWriter()
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body)

    # DQT (zigzag order on the wire)
    for tq in range(n_classes):
        zzq = qt[tq].reshape(64)[_J_ZZ]
        seg(0xDB, bytes([tq]) + bytes(int(x) for x in zzq))
    # SOF0
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    seg(0xC0, bytes(sof))
    # DHT
    for cls in range(n_classes):
        for tc, tables in ((0, dc_tables), (1, ac_tables)):
            counts, syms, _codes = tables[cls]
            seg(0xC4, bytes([(tc << 4) | cls]) + bytes(counts) + bytes(syms))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    # SOS
    sos = bytearray([len(comps)])
    for ci, c in enumerate(comps):
        cls = 0 if ci == 0 else 1
        sos += bytes([c["id"], (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    for rec in stream:
        if rec[0] == "RST":
            bw.flush_padded()
            out.extend(bw.buf)
            bw = _JBitWriter()
            out.extend(b"\xff" + bytes([0xD0 + rec[1]]))
            continue
        cls, dcrec, acrec = rec
        for sym, val, nbits in dcrec:
            code, length = dc_tables[cls][2][sym]
            bw.write(code, length)
            bw.write(val, nbits)
        for sym, val, nbits in acrec:
            code, length = ac_tables[cls][2][sym]
            bw.write(code, length)
            bw.write(val, nbits)
    bw.flush_padded()
    out.extend(bw.buf)
    out.extend(b"\xff\xd9")  # EOI

    return bytes(out), _j_expected_pixels(comps, qt, h, w, hmax, vmax, gray)


def _j_expected_pixels(comps, qt, h, w, hmax, vmax, gray) -> np.ndarray:
    """Expected decoded pixels: the spec's reconstruction from the
    quantized coefficients (shared arithmetic, independent code)."""
    planes = {}
    for c in comps:
        zz = c["zz"].reshape(-1, 64)
        dz = zz * qt[c["tq"]].reshape(64)[_J_ZZ][None, :]
        nat = np.zeros_like(dz)
        nat[:, _J_ZZ] = dz
        spatial = np.einsum("yv,nvu,xu->nyx", _J_M, nat.reshape(-1, 8, 8), _J_M)
        px = np.clip(np.round(spatial + 128.0), 0, 255)
        nby, nbx = c["zz"].shape[0], c["zz"].shape[1]
        plane = (
            px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes[c["id"]] = plane[:h, :w]
    if gray:
        g = planes[1].astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y_, cb_, cr_ = (planes[i].astype(np.float64) for i in (1, 2, 3))
    r = y_ + 1.402 * (cr_ - 128.0)
    g = y_ - 0.344136 * (cb_ - 128.0) - 0.714136 * (cr_ - 128.0)
    b = y_ + 1.772 * (cb_ - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _j_comp_grid_dims(c, hmax, vmax, w, h):
    """Non-interleaved block-grid dims (bw, bh): ceil(component sample
    dims / 8) — the progressive AC scans' unit walk (padded MCU blocks
    beyond it are never AC-coded; the decoder crops them)."""
    cw = -(-(w * c["h"]) // hmax)
    ch = -(-(h * c["v"]) // vmax)
    return -(-cw // 8), -(-ch // 8)


def _j_band_records(zz: np.ndarray, ss: int, se: int) -> tuple[list, bool]:
    """One block's AC band [ss..se] → (records, needs_eob) with
    (symbol, value_bits, n_bits) records; needs_eob when the band ends
    in zeros (the block then opens/extends an EOB run)."""
    nz = [k for k in range(ss, se + 1) if zz[k] != 0]
    if not nz:
        return [], True
    recs = []
    run = 0
    for k in range(ss, nz[-1] + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            recs.append((0xF0, 0, 0))  # ZRL
            run -= 16
        s = _j_cat(v)
        recs.append(((run << 4) | s, v if v >= 0 else v + (1 << s) - 1, s))
        run = 0
    return recs, nz[-1] < se


def _j_encode_progressive(
    comps, qt, h, w, mcux, mcuy, gray, restart_interval, ac_sa=False
) -> bytes:
    if ac_sa and restart_interval:
        raise ValueError("ac_sa fixtures don't combine with restart intervals")
    """SOF2 byte stream from the quantized coefficient grids. Scan
    script: interleaved DC first (Al=1) → DC refinement (Ah=1, raw
    bits) → per-component AC band scans (component 0 split 1-5/6-63,
    the rest full 1-63), Al=0 — spectral selection + DC successive
    approximation, the subset the engine's decoder declares. EOBn run
    codes accumulate across consecutive all-zero bands (capped 2^14);
    restart intervals, when set, count scan units (MCUs for the DC
    scans, blocks for AC) and reset predictors/EOB state per spec."""
    import struct

    n_classes = 1 if gray else 2

    # --- symbol streams per scan: items are ("SYM", kind, cls, sym,
    # val, nbits) / ("RAW", bit) / ("RST",) -------------------------------
    def dc_units():
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = []
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blocks.append((ci, my * c["v"] + by, mx * c["h"] + bx))
                yield blocks

    def dc_first_scan(al):
        items = []
        preds = [0] * len(comps)
        n_done = 0
        for blocks in dc_units():
            if restart_interval and n_done and n_done % restart_interval == 0:
                preds = [0] * len(comps)
                items.append(("RST",))
            for ci, by, bx in blocks:
                c = comps[ci]
                cls = 0 if ci == 0 else 1
                dc = int(c["zz"][by, bx, 0]) >> al  # arithmetic shift
                diff = dc - preds[ci]
                preds[ci] = dc
                t = _j_cat(diff)
                items.append(
                    ("SYM", "dc", cls, t, diff if diff >= 0 else diff + (1 << t) - 1, t)
                )
            n_done += 1
        return items

    def dc_refine_scan(al):
        items = []
        n_done = 0
        for blocks in dc_units():
            if restart_interval and n_done and n_done % restart_interval == 0:
                items.append(("RST",))
            for ci, by, bx in blocks:
                c = comps[ci]
                items.append(("RAW", (int(c["zz"][by, bx, 0]) >> al) & 1))
            n_done += 1
        return items

    def ac_scan(ci, ss, se, al=0):
        c = comps[ci]
        cls = 0 if ci == 0 else 1
        bw, bh = _j_comp_grid_dims(c, max(x["h"] for x in comps), max(x["v"] for x in comps), w, h)
        blocks = [(by, bx) for by in range(bh) for bx in range(bw)]

        def band(by, bx):
            zz = c["zz"][by, bx]
            if al == 0:
                return zz
            # AC point transform: toward-zero division by 2^Al (T.81
            # G.1.2.2 — NOT the DC arithmetic shift)
            return np.sign(zz) * (np.abs(zz) >> al)

        items = []
        i = 0
        seg_left = restart_interval or len(blocks)
        while i < len(blocks):
            if seg_left == 0:
                items.append(("RST",))
                seg_left = restart_interval
            # how many units remain in this restart segment
            seg_take = min(seg_left, len(blocks) - i)
            j = i
            while j < i + seg_take:
                by, bx = blocks[j]
                recs, needs_eob = _j_band_records(band(by, bx), ss, se)
                for sym, val, nbits in recs:
                    items.append(("SYM", "ac", cls, sym, val, nbits))
                if needs_eob:
                    g = 1
                    while (
                        j + g < i + seg_take
                        and g < (1 << 14)
                        and not _j_band_records(
                            band(*blocks[j + g]), ss, se
                        )[0]
                        and _j_band_records(
                            band(*blocks[j + g]), ss, se
                        )[1]
                    ):
                        g += 1
                    r = g.bit_length() - 1
                    items.append(("SYM", "ac", cls, r << 4, g - (1 << r), r))
                    j += g
                else:
                    j += 1
            seg_left -= seg_take
            i += seg_take
        return items

    def ac_refine_scan(ci, ss, se, al):
        """AC successive-approximation refinement scan (Ah=al+1,
        Al=al): a SIMULATION of the decoder walk — newly-significant
        coefficients (|T|>>al == 1) place ±1<<al after a run of
        zero-HISTORY positions, correction bits (|T|>>al & 1) ride
        already-significant positions in walk order, runs of
        no-placement blocks accumulate into EOBn codes whose
        correction bits follow in block order."""
        c = comps[ci]
        cls = 0 if ci == 0 else 1
        bw, bh = _j_comp_grid_dims(
            c, max(x["h"] for x in comps), max(x["v"] for x in comps), w, h
        )
        blocks = [(by, bx) for by in range(bh) for bx in range(bw)]

        def classify(zz):
            hist, newsig, corr = [], [], []
            for k in range(ss, se + 1):
                t = abs(int(zz[k])) >> al
                hist.append(t > 1)
                newsig.append(t == 1)
                corr.append(t & 1)
            return hist, newsig, corr

        def block_items(zz):
            """Items for one block WITH placements; returns (items,
            had_placement)."""
            hist, newsig, corr = classify(zz)
            items = []
            k = 0  # offset into the band
            n = se - ss + 1
            while k < n:
                nxt = next((j for j in range(k, n) if newsig[j]), None)
                if nxt is None:
                    break
                run = 0
                buffered = []
                j = k
                while j < nxt:
                    if hist[j]:
                        buffered.append(("RAW", corr[j]))
                    else:
                        run += 1
                        if run == 16:
                            items.append(("SYM", "ac", cls, 0xF0, 0, 0))
                            items.extend(buffered)
                            buffered = []
                            run = 0
                    j += 1
                sign = 1 if int(zz[ss + nxt]) > 0 else 0
                items.append(("SYM", "ac", cls, (run << 4) | 1, 0, 0))
                items.append(("RAW", sign))
                items.extend(buffered)
                k = nxt + 1
            return items, k  # k = band offset after last placement

        items = []
        i = 0
        while i < len(blocks):
            zz = c["zz"][blocks[i][0], blocks[i][1]]
            hist, newsig, corr = classify(zz)
            if any(newsig):
                blk_items, k_after = block_items(zz)
                items.extend(blk_items)
                # terminal EOB0 + remaining corrections, unless the
                # last placement landed exactly on the band end
                if k_after < se - ss + 1:
                    items.append(("SYM", "ac", cls, 0x00, 0, 0))
                    for j in range(k_after, se - ss + 1):
                        if hist[j]:
                            items.append(("RAW", corr[j]))
                i += 1
                continue
            # run of placement-free blocks → one EOBn, corrections in
            # block order
            g = 0
            eob_corr = []
            while i + g < len(blocks) and g < (1 << 14):
                zzg = c["zz"][blocks[i + g][0], blocks[i + g][1]]
                hg, ng, cg = classify(zzg)
                if any(ng):
                    break
                eob_corr.extend(
                    ("RAW", cg[j]) for j in range(se - ss + 1) if hg[j]
                )
                g += 1
            r = g.bit_length() - 1
            items.append(("SYM", "ac", cls, r << 4, g - (1 << r), r))
            items.extend(eob_corr)
            i += g
        return items

    scans = [
        ((list(range(len(comps))), 0, 0, 0, 1), dc_first_scan(1)),
        ((list(range(len(comps))), 0, 0, 1, 0), dc_refine_scan(0)),
    ]
    if ac_sa:
        # AC at two precisions: first scans at Al=1 (toward-zero point
        # transform), then Ah=1→Al=0 refinement scans
        scans.append((([0], 1, 5, 0, 1), ac_scan(0, 1, 5, al=1)))
        scans.append((([0], 6, 63, 0, 1), ac_scan(0, 6, 63, al=1)))
        for ci in range(1, len(comps)):
            scans.append((([ci], 1, 63, 0, 1), ac_scan(ci, 1, 63, al=1)))
        scans.append((([0], 1, 5, 1, 0), ac_refine_scan(0, 1, 5, 0)))
        scans.append((([0], 6, 63, 1, 0), ac_refine_scan(0, 6, 63, 0)))
        for ci in range(1, len(comps)):
            scans.append((([ci], 1, 63, 1, 0), ac_refine_scan(ci, 1, 63, 0)))
    else:
        scans.append((([0], 1, 5, 0, 0), ac_scan(0, 1, 5)))
        scans.append((([0], 6, 63, 0, 0), ac_scan(0, 6, 63)))
        for ci in range(1, len(comps)):
            scans.append((([ci], 1, 63, 0, 0), ac_scan(ci, 1, 63)))

    # --- huffman tables from the union of each class's used symbols ------
    dc_syms: dict[int, set] = {c: set() for c in range(n_classes)}
    ac_syms: dict[int, set] = {c: set() for c in range(n_classes)}
    for _hdr, items in scans:
        for it in items:
            if it[0] == "SYM":
                _tag, kind, cls, sym = it[0], it[1], it[2], it[3]
                (dc_syms if kind == "dc" else ac_syms)[cls].add(sym)
    dc_tables = {c: _j_huff(s or {0}) for c, s in dc_syms.items()}
    ac_tables = {c: _j_huff(s or {0}) for c, s in ac_syms.items()}

    # --- byte assembly ----------------------------------------------------
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body)

    for tq in range(n_classes):
        zzq = qt[tq].reshape(64)[_J_ZZ]
        seg(0xDB, bytes([tq]) + bytes(int(x) for x in zzq))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    seg(0xC2, bytes(sof))
    for cls in range(n_classes):
        for tc, tables in ((0, dc_tables), (1, ac_tables)):
            counts, syms, _codes = tables[cls]
            seg(0xC4, bytes([(tc << 4) | cls]) + bytes(counts) + bytes(syms))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    for (comp_idx, ss, se, ah, al), items in scans:
        sos = bytearray([len(comp_idx)])
        for ci in comp_idx:
            cls = 0 if ci == 0 else 1
            sos += bytes([comps[ci]["id"], (cls << 4) | cls])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(sos))
        bw_ = _JBitWriter()
        rst_n = 0
        for it in items:
            if it[0] == "RST":
                bw_.flush_padded()
                out.extend(bw_.buf)
                bw_ = _JBitWriter()
                out.extend(b"\xff" + bytes([0xD0 + rst_n % 8]))
                rst_n += 1
                continue
            if it[0] == "RAW":
                bw_.write(it[1], 1)
                continue
            _tag, kind, cls, sym, val, nbits = it
            code, length = (dc_tables if kind == "dc" else ac_tables)[cls][2][sym]
            bw_.write(code, length)
            bw_.write(val, nbits)
        bw_.flush_padded()
        out.extend(bw_.buf)
    out.extend(b"\xff\xd9")
    return bytes(out)


def jpeg_file_bytes(mid: int, arr: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Deterministic JPEG variant for image ``mid``: cycles 4:4:4 /
    4:2:0 / grayscale / restart-marker streams, each alternating
    baseline (SOF0) and progressive (SOF2) CONTAINERS by (mid // 12)
    parity, so every decoder path — including the progressive DC
    successive-approximation + spectral-selection scans — is exercised
    by committed fixtures. Progressive reuses the same quantized
    coefficients, so a variant's expected decoded pixels (what the
    fingerprint hashes) are identical either way; only the wire bytes
    differ. The grayscale container is used only when the CONTENT is
    channel-equal (see make_image) — wrapping color pixels in a gray
    JPEG legitimately moves the perceptual hash and would break
    planted-pair separation."""
    v = mid % 12
    prog = (mid // 12) % 2 == 1
    # of the progressive ids, alternate spectral-selection-only and
    # full successive-approximation (AC Al=1 first + Ah=1 refinement)
    sa = prog and (mid // 24) % 2 == 0
    if v == 5 and arr.shape[0] % 2 == 0 and arr.shape[1] % 2 == 0:
        return encode_jpeg_with_expected(
            arr, quality=95, subsample=True, progressive=prog, ac_sa=sa
        )
    if v == 8 and np.array_equal(arr[:, :, 0], arr[:, :, 1]) and np.array_equal(
        arr[:, :, 1], arr[:, :, 2]
    ):
        return encode_jpeg_with_expected(
            arr, quality=96, gray=True, progressive=prog, ac_sa=sa
        )
    if v == 11:
        return encode_jpeg_with_expected(
            arr, quality=94, restart_interval=0 if sa else 2,
            progressive=prog, ac_sa=sa
        )
    return encode_jpeg_with_expected(arr, quality=96, progressive=prog, ac_sa=sa)


def image_file_bytes(mid: int, arr: np.ndarray) -> tuple[str, bytes, np.ndarray]:
    """(filename, bytes, fingerprint_pixels) for image ``mid``: the
    CONTAINER varies by id (mid % 3 == 0 → RGB PNG with cycling
    filters; mid % 9 == 1 → RGBA PNG with a deterministic alpha ramp
    the engine must drop; mid % 3 == 2 → baseline JPEG cycling
    4:4:4 / 4:2:0 / grayscale / restart-interval variants; otherwise
    P6 PPM). For the lossless containers the fingerprint pixels ARE
    the source array; for JPEG they are the expected decoded pixels
    (dequant→IDCT reconstruction) — lossy coding means the reference
    fingerprint must hash what a correct decoder outputs. Planted
    copies cross containers (a PPM base's exact copy can land as a
    JPEG): the near-dup pairing certifies decode equivalence across
    all three formats."""
    if mid % 3 == 0:
        return f"img_{mid:05d}.png", encode_png_mixed_filters(arr), arr
    if mid % 9 == 1:
        h, w, _ = arr.shape
        alpha = ((np.arange(w)[None, :] * 255) // max(w - 1, 1)) * np.ones(
            (h, 1), dtype=np.int64
        )
        return f"img_{mid:05d}.png", encode_png_mixed_filters(arr, alpha=alpha), arr
    if mid % 3 == 2:
        data, expected = jpeg_file_bytes(mid, arr)
        return f"img_{mid:05d}.jpg", data, expected
    return f"img_{mid:05d}.ppm", encode_ppm(arr), arr


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
    # 8x8-blocky noise channel (piecewise constant): content-bearing
    # for the luminance grid like the old per-pixel noise, but JPEG
    # quantization preserves flat blocks near-exactly — per-pixel
    # noise is precisely the signal lossy coding discards, and it made
    # planted JPEG copies drift past the unplanted floor (measured:
    # planted max 36 vs floor 18 with per-pixel noise; 8-blocky keeps
    # planted pairs tight across all three containers)
    bn = rng.integers(0, 256, (h // 8 + 1, w // 8 + 1)).astype(np.float64)
    blocky = np.repeat(np.repeat(bn, 8, axis=0), 8, axis=1)[:h, :w]
    base = np.stack(
        [
            (ramp * 255),
            ((1 - ramp) * 255),
            blocky,
        ],
        axis=2,
    )
    # a few random rectangles so the luminance grid is content-bearing
    for _ in range(int(rng.integers(2, 6))):
        y0, x0 = int(rng.integers(0, h // 2)), int(rng.integers(0, w // 2))
        y1, x1 = y0 + int(rng.integers(4, h // 2)), x0 + int(rng.integers(4, w // 2))
        base[y0:y1, x0:x1] = rng.uniform(0, 255, 3)
    out = np.clip(base, 0, 255).astype(np.uint8)
    if i % 7 == 3:
        # grayscale-CONTENT images (R=G=B): the population the
        # grayscale-JPEG container variant can wrap without changing
        # the perceptual hash — for color content, dropping chroma
        # legitimately moves aHash luminance (channel mean ≠ BT.601 Y)
        # and a planted pair crossing a gray container drifts past the
        # unplanted floor (measured 16-23 vs floor 16)
        lum = out.astype(np.float64).mean(axis=2)
        out = np.repeat(
            np.clip(np.round(lum), 0, 255).astype(np.uint8)[:, :, None], 3, axis=2
        )
    return out


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
        fname, data, fp_px = image_file_bytes(mid, arr)
        with open(os.path.join(media_dir, fname), "wb") as f:
            f.write(data)
        rows.append((mid, "image", ahash64(fp_px)))

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
    n_jpg = sum(1 for m in images if m % 3 == 2 and m % 9 != 1)
    print(f"wrote {len(images)} images ({n_png} png, {n_jpg} jpg, "
          f"{len(images) - n_png - n_jpg} ppm) "
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
