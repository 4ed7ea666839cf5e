"""Pure-python/numpy media codecs: 24-bit BMP and PCM-16 WAV.

No external media library ships in this environment, but these two formats
need none — BMP is a header + raw pixel rows (numpy slicing) and WAV is
stdlib ``wave``.  They make the multimodal operators REAL end-to-end for
image/audio payloads: actual pixel decode, actual downsampling, actual PCM
frame slicing — while compressed formats (JPEG/PNG/H.264) stay behind the
``HAVE_MEDIA_LIBS`` guard in :mod:`ocr_spark.operators.multimodal`.

Everything here is deterministic: same payload → same array → same
features, which is what the pipeline's rerun-digest guarantees require.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


# ---------------------------------------------------------------------------
# BMP (Windows BITMAPINFOHEADER, 24-bit uncompressed)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray | None:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB; None if not one."""
    b = payload
    if len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = int.from_bytes(b[10:14], "little")
    hdr_sz = int.from_bytes(b[14:18], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0 or hdr_sz < 40 or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    if len(b) < data_off + stride * h:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, :w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
    return px[::-1] if bottom_up else px


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP bytes."""
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    bgr = rgb[..., ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    pixel_data = rows[::-1].tobytes()  # bottom-up
    data_off = 14 + 40
    file_sz = data_off + len(pixel_data)
    header = (b"BM" + struct.pack("<IHHI", file_sz, 0, 0, data_off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pixel_data), 2835, 2835, 0, 0))
    return header + pixel_data


def downsample_bmp(payload: bytes, max_px: int) -> tuple[bytes, int, int] | None:
    """Real area downsample of a BMP to fit max_px; (bytes, w, h) or None."""
    px = decode_bmp(payload)
    if px is None:
        return None
    h, w = px.shape[:2]
    factor = -(-max(w, h) // max_px)  # ceil division
    if factor <= 1:
        return payload, w, h
    nh, nw = h // factor, w // factor
    if nh == 0 or nw == 0:
        return payload, w, h
    cropped = px[:nh * factor, :nw * factor].astype(np.uint32)
    small = (cropped.reshape(nh, factor, nw, factor, 3)
             .mean(axis=(1, 3)).astype(np.uint8))
    return encode_bmp(small), nw, nh


# ---------------------------------------------------------------------------
# WAV (PCM-16, stdlib wave)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """PCM-16 WAV → (samples int16 [n] mono-mixed, framerate); None if not."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            if wf.getsampwidth() != 2:
                return None
            rate = wf.getframerate()
            nch = wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
        # a truncated/corrupt data chunk can leave a partial frame — trim to
        # whole frames instead of letting frombuffer/reshape raise and kill
        # the Spark task (one bad blob must never be job-fatal)
        frame_bytes = 2 * max(1, nch)
        raw = raw[:len(raw) // frame_bytes * frame_bytes]
        pcm = np.frombuffer(raw, dtype="<i2")
        if nch > 1:
            pcm = pcm.reshape(-1, nch).mean(axis=1).astype(np.int16)
    except (wave.Error, EOFError, ValueError):
        return None
    return pcm, rate


def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """Mono int16 samples → PCM-16 WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(pcm, dtype="<i2").tobytes())
    return buf.getvalue()
