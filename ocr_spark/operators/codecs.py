"""Pure-python/numpy media codecs: 24-bit BMP, PNG, and PCM-16 WAV.

No external media library ships in this environment, but these formats
need none — BMP is a header + raw pixel rows (numpy slicing), PNG is
stdlib ``zlib`` + per-row unfiltering (numpy), and WAV is stdlib
``wave``.  They make the multimodal operators REAL end-to-end for
image/audio payloads: actual pixel decode, actual downsampling, actual
PCM frame slicing — while the remaining compressed formats (JPEG/H.264)
stay behind the ``HAVE_MEDIA_LIBS`` guard in
:mod:`ocr_spark.operators.multimodal`.

Everything here is deterministic: same payload → same array → same
features, which is what the pipeline's rerun-digest guarantees require.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

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
# PNG (stdlib zlib inflate + numpy row unfiltering — RFC 2083)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray | None:
    """PNG → (h, w, 3) uint8 RGB; None for non-PNG/unsupported variants.

    Real decode: chunk walk → concatenated-IDAT inflate (stdlib zlib) →
    per-row unfilter (None/Sub/Up/Average/Paeth, the full RFC 2083 set;
    Sub/Up vectorized with numpy's wrap-around uint8 accumulate, the
    left-dependent Average/Paeth per-pixel) → color-type normalization
    (gray/palette expanded, alpha dropped).  Supported: bit depth 8, all
    five color types, non-interlaced — the overwhelmingly common web PNG.
    Interlaced/1-2-4-16-bit images return None (stub path downstream).
    """
    b = payload
    if not b.startswith(_PNG_SIG):
        return None
    pos, n = len(_PNG_SIG), len(b)
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    plte = None
    try:
        while pos + 8 <= n:
            clen = int.from_bytes(b[pos:pos + 4], "big")
            ctag = b[pos + 4:pos + 8]
            data = b[pos + 8:pos + 8 + clen]
            if len(data) < clen:
                return None
            pos += 12 + clen  # len + tag + data + crc (crc not verified)
            if ctag == b"IHDR":
                if clen != 13:
                    return None
                w, h = (int.from_bytes(data[0:4], "big"),
                        int.from_bytes(data[4:8], "big"))
                depth, ctype = data[8], data[9]
                interlace = data[12]
            elif ctag == b"PLTE":
                plte = np.frombuffer(data, dtype=np.uint8)
                if plte.size % 3:
                    return None
                plte = plte.reshape(-1, 3)
            elif ctag == b"IDAT":
                idat += data
            elif ctag == b"IEND":
                break
        if (w is None or not w or not h or depth != 8 or interlace != 0
                or ctype not in _PNG_CHANNELS or not idat):
            return None
        ch = _PNG_CHANNELS[ctype]
        raw = zlib.decompress(bytes(idat))
        stride = w * ch
        if len(raw) < h * (1 + stride):
            return None
        rows = np.frombuffer(raw, dtype=np.uint8,
                             count=h * (1 + stride)).reshape(h, 1 + stride)
        filters = rows[:, 0]
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            cur = rows[y, 1:].copy()
            f = filters[y]
            if f == 0:                       # None
                recon = cur
            elif f == 1:                     # Sub: per-lane prefix sum mod 256
                recon = np.add.accumulate(
                    cur.reshape(w, ch), axis=0, dtype=np.uint8).reshape(stride)
            elif f == 2:                     # Up
                recon = cur + prev           # uint8 wraps mod 256
            elif f == 3:                     # Average (left-serial)
                recon = cur
                recon[:ch] = ((recon[:ch].astype(np.int32)
                               + prev[:ch] // 2) & 0xFF).astype(np.uint8)
                for i in range(ch, stride):
                    recon[i] = (int(recon[i]) + (int(recon[i - ch])
                                                 + int(prev[i])) // 2) & 0xFF
            elif f == 4:                     # Paeth (left-serial)
                recon = cur
                for i in range(stride):
                    a = int(recon[i - ch]) if i >= ch else 0
                    bb = int(prev[i])
                    c = int(prev[i - ch]) if i >= ch else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        bb if pb <= pc else c)
                    recon[i] = (int(recon[i]) + pred) & 0xFF
            else:
                return None
            out[y] = recon
            prev = recon
    except (zlib.error, ValueError):
        return None
    px = out.reshape(h, w, ch)
    if ctype == 2:                # RGB
        return px
    if ctype == 6:                # RGBA → drop alpha
        return np.ascontiguousarray(px[..., :3])
    if ctype == 0:                # gray
        return np.repeat(px, 3, axis=2)
    if ctype == 4:                # gray+alpha
        return np.repeat(px[..., :1], 3, axis=2)
    if ctype == 3:                # palette
        if plte is None or int(px.max()) >= len(plte):
            return None
        return plte[px[..., 0]]
    return None


def encode_png(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (color type 2, filter None rows)."""
    h, w = rgb.shape[:2]
    body = np.empty((h, 1 + w * 3), dtype=np.uint8)
    body[:, 0] = 0  # filter: None
    body[:, 1:] = np.asarray(rgb, dtype=np.uint8).reshape(h, w * 3)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
            + chunk(b"IEND", b""))


def decode_image(payload: bytes) -> tuple[np.ndarray, str] | None:
    """(pixels, format) for any format the pure-python codecs handle."""
    px = decode_bmp(payload)
    if px is not None:
        return px, "bmp"
    px = decode_png(payload)
    if px is not None:
        return px, "png"
    return None


def downsample_image(payload: bytes, max_px: int
                     ) -> tuple[bytes, int, int] | None:
    """Real area downsample of a BMP or PNG to fit ``max_px``, re-encoded
    in the SAME container; (bytes, w, h) or None for other formats."""
    decoded = decode_image(payload)
    if decoded is None:
        return None
    px, fmt = decoded
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
    encode = encode_bmp if fmt == "bmp" else encode_png
    return encode(small), nw, nh


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
