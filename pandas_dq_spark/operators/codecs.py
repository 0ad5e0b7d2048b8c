"""Dependency-free media codecs (struct + numpy only).

BMP (uncompressed 24-bit BI_RGB) and WAV (PCM 8/16-bit) need no
PIL/soundfile/ffmpeg, so multimodal ``decode_mode="real"`` decodes
them for real; formats that genuinely require external libraries
(JPEG/PNG/MP3/MP4) still raise ``NotImplementedError`` at the decode
call site (operators/multimodal.py).

These are byte-layout parsers, not UDFs: they run inside the
mapInPandas Arrow batches, one call per document, all numpy after the
header parse.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_format(payload: bytes) -> str:
    """Cheap magic-byte sniff: 'bmp' | 'wav' | 'unknown'."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ---------------------------------------------------------------- BMP


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP to an (h, w, 3) uint8
    RGB array.  Handles 4-byte row padding and both bottom-up
    (positive height, the common case) and top-down storage."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        # a crafted negative biWidth would otherwise surface as a
        # confusing numpy frombuffer/reshape error (ADVICE r04)
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    row_bytes = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    need = pix_off + row_bytes * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * height,
                        offset=pix_off)
    rows = raw.reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)
    if not top_down:
        img = img[::-1]
    # BMP stores BGR
    return img[:, :, ::-1].copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    bottom-up BMP."""
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    # RGB -> BGR, bottom-up row order, rows padded to 4 bytes
    bgr = img[::-1, :, ::-1].astype(np.uint8)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pix = rows.tobytes()
    pix_off = 14 + 40
    file_size = pix_off + len(pix)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    return header + info + pix


# ---------------------------------------------------------------- WAV


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV (8-bit unsigned or 16-bit signed, any channel
    count — channels are averaged down to mono) to
    ``(float64 waveform in [-1, 1], sample_rate)``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"only PCM WAV supported (format={audio_format})"
        )
    if bits == 16:
        arr = np.frombuffer(data[: len(data) & ~1], dtype="<i2").astype(
            np.float64
        ) / 32768.0
    elif bits == 8:
        arr = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    else:
        raise NotImplementedError(f"unsupported PCM width: {bits} bits")
    if channels > 1:
        usable = (arr.size // channels) * channels
        arr = arr[:usable].reshape(-1, channels).mean(axis=1)
    return arr, sample_rate


def encode_wav(wave: np.ndarray, sample_rate: int) -> bytes:
    """Encode a mono float waveform in [-1, 1] as 16-bit PCM WAV."""
    pcm = np.clip(np.round(wave * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
