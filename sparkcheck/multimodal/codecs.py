"""Pure-numpy media codecs — REAL decode/feature paths for the formats
that need no native media library: PCM WAV (RIFF) and uncompressed
24-bit BMP. Compressed codecs (JPEG/PNG/MP4/Opus) still require
PIL/pyav and stay behind the documented stub in binary.py.

Everything here is deterministic byte-level work (struct + numpy), so
the multimodal pipeline's decode slot is exercised end-to-end with real
parsing, real failure modes (truncated headers, wrong magic), and real
signal math (FFT spectral centroid, nearest-neighbor resize) — not just
an md5 fake.

Encoders exist for test/bench synthesis: encode→decode round-trips are
asserted bit-identical in tests/test_similarity_multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaDecodeError(ValueError):
    """Malformed or unsupported payload (the decode_ok=False path)."""


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM16 mono/stereo)

def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float samples in [-1, 1] → PCM16 mono RIFF/WAVE bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm16), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(pcm16),
    )
    return hdr + pcm16


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 bytes → (sample_rate, float64 samples in [-1,1]).
    Walks the chunk list (fmt may not be first); mono-mixes stereo."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise MediaDecodeError("short fmt chunk")
            fmt_code, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_code != 1 or bits != 16:
                raise MediaDecodeError(f"unsupported WAV encoding (fmt={fmt_code}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise MediaDecodeError("missing fmt/data chunk")
    pcm = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2").astype(np.float64)
    if channels and channels > 1:
        pcm = pcm[: len(pcm) - (len(pcm) % channels)].reshape(-1, channels).mean(axis=1)
    return int(rate), pcm / 32768.0


def wav_features(payload: bytes) -> list[float]:
    """8 real audio features: [duration_s, rms, peak, zero_crossing_rate,
    spectral_centroid_hz, sample_rate, log10(n_samples+1), 1.0(=audio)].
    Centroid via numpy rFFT magnitude — actual signal math."""
    rate, x = decode_wav(payload)
    n = len(x)
    if n == 0:
        raise MediaDecodeError("empty audio stream")
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zcr = float(np.mean(np.signbit(x[:-1]) != np.signbit(x[1:]))) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    centroid = float((freqs * mag).sum() / mag.sum()) if mag.sum() > 0 else 0.0
    return [n / rate, rms, peak, zcr, centroid, float(rate),
            float(np.log10(n + 1)), 1.0]


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24 bpp, uncompressed, bottom-up)

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit uncompressed BMP bytes."""
    a = np.asarray(img, dtype=np.uint8)
    h, w, _ = a.shape
    row_pad = (-(w * 3)) % 4
    stride = w * 3 + row_pad
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pix = rows.tobytes()
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return hdr + dib + pix


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB array."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise MediaDecodeError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    size, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if size < 40 or bpp != 24 or comp != 0:
        raise MediaDecodeError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flipped = h > 0
    h = abs(h)
    # crafted/corrupt headers: non-positive dims would escape as raw
    # numpy IndexError/ZeroDivisionError downstream instead of the
    # module's documented decode-failure contract
    if w <= 0 or h <= 0:
        raise MediaDecodeError(f"invalid BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(payload) < need:
        raise MediaDecodeError("truncated BMP pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    img = rows[:, :, ::-1]  # BGR → RGB
    return img[::-1] if flipped else img


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps (no PIL)."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[yi][:, xi]


def bmp_features(payload: bytes, thumb: int = 8) -> list[float]:
    """8 real image features: [width, height, mean_r, mean_g, mean_b,
    std_gray, aspect_ratio, 2.0(=image)] — computed on a nearest-
    neighbor thumbnail (the resize step a real pipeline runs)."""
    img = decode_bmp(payload)
    h, w = img.shape[:2]
    t = resize_nearest(img, thumb, thumb).astype(np.float64) / 255.0
    gray = t.mean(axis=2)
    return [float(w), float(h), float(t[:, :, 0].mean()), float(t[:, :, 1].mean()),
            float(t[:, :, 2].mean()), float(gray.std()), w / h, 2.0]


def sniff_media(payload: bytes) -> str:
    """'wav' | 'bmp' | 'jpeg' | 'unknown' from magic bytes."""
    if payload is None:
        return "unknown"
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if len(payload) >= 2 and payload[:2] == b"BM":
        return "bmp"
    if len(payload) >= 3 and payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"
