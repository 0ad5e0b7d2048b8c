"""Dependency-free media codecs (struct + numpy + stdlib zlib only).

BMP (uncompressed 24-bit BI_RGB), WAV (PCM 8/16-bit), and
non-interlaced 8-bit PNG need no PIL/soundfile/ffmpeg, so multimodal
``decode_mode="real"`` decodes them for real; formats that genuinely
require external libraries (JPEG/MP3/MP4) still raise
``NotImplementedError`` at the decode call site
(operators/multimodal.py).

These are byte-layout parsers, not UDFs: they run inside the
mapInPandas Arrow batches, one call per document, all numpy after the
header parse.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_format(payload: bytes) -> str:
    """Cheap magic-byte sniff: 'bmp' | 'wav' | 'png' | 'unknown'."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
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


# ---------------------------------------------------------------- PNG
#
# zlib is stdlib, so non-interlaced 8-bit PNG needs no PIL (VERDICT
# r04 item 5): inflate the IDAT stream, then undo the per-scanline
# filters.  None/Up are single numpy ops; Sub is a per-byte-lane
# cumsum (mod-256 prefix sum); Average/Paeth depend on the
# just-reconstructed left neighbor, so those scanlines fall back to a
# scalar loop — encoders in the wild overwhelmingly emit 0-2.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> channel count (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}  # channels -> color type


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    c = tag + body
    return (
        struct.pack(">I", len(body)) + c
        + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG (grayscale / gray+alpha /
    RGB / RGBA) to an (h, w, channels) uint8 array."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    width = height = None
    idat = []
    while pos + 8 <= n:
        (size,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or ctype not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"only 8-bit gray/RGB/alpha PNG supported "
                    f"(depth={depth}, color_type={ctype})"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise NotImplementedError(
                    "interlaced or non-standard PNG not supported"
                )
            ch = _PNG_CHANNELS[ctype]
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size  # len + tag + body + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid PNG dimensions {width}x{height}")
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up (uint8 addition wraps mod 256 by itself)
            cur = line + prev
        elif ft == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            cur = line
            for lane in range(ch):
                seg = cur[lane::ch].astype(np.int64)
                cur[lane::ch] = (np.cumsum(seg) & 0xFF).astype(np.uint8)
        elif ft == 3:  # Average — sequential in x
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth — sequential in x
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, ch)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w[, channels]) uint8 array as a non-interlaced
    8-bit PNG.  ``filter_type`` selects the per-scanline filter (0-4)
    — non-zero types exist to exercise every decoder unfilter path in
    tests; 0 (None) is the production default."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in _PNG_COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    rows = img.reshape(h, w * ch).astype(np.uint8)
    stride = w * ch
    scan = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = rows[y].astype(np.int64)
        left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pr = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = cur - pr
        else:
            raise ValueError(f"unknown PNG filter type {filter_type}")
        scan.append(filter_type)
        scan.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLOR_TYPE[ch], 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _png_chunk(b"IEND", b"")
    )
