"""Pure-Python media header parsing (no codec libraries needed).

Real decode of the container-header metadata a training-data pipeline
filters on — image dimensions and audio duration — for the formats
whose headers are trivially parseable from bytes: BMP, PNG (IHDR),
GIF87a/89a, and WAV (RIFF fmt/data chunks). Full pixel/sample decode
(resize, resample, frame sampling) still needs codec libs and stays
behind the documented fake in ``operators/multimodal.py``; header
metadata, however, is REAL for these formats.
"""

from __future__ import annotations

import struct
from typing import Optional


class MediaHeader:
    __slots__ = ("format", "width", "height", "duration_ms", "sample_rate", "n_channels")

    def __init__(self, format: str, width=None, height=None, duration_ms=None, sample_rate=None, n_channels=None):
        self.format = format
        self.width = width
        self.height = height
        self.duration_ms = duration_ms
        self.sample_rate = sample_rate
        self.n_channels = n_channels


def parse_media_header(payload: bytes) -> Optional[MediaHeader]:
    """Sniff magic bytes and parse the header. Returns None for
    unrecognized formats (caller decides the fallback)."""
    if len(payload) < 12:
        return None
    if payload[:2] == b"BM" and len(payload) >= 26:
        # BITMAPINFOHEADER at offset 14: biWidth/biHeight int32 LE
        width, height = struct.unpack_from("<ii", payload, 18)
        return MediaHeader("bmp", width=width, height=abs(height))
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        # first chunk must be IHDR: length(4) type(4) width(4) height(4) BE
        if payload[12:16] == b"IHDR":
            width, height = struct.unpack_from(">II", payload, 16)
            return MediaHeader("png", width=width, height=height)
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        width, height = struct.unpack_from("<HH", payload, 6)
        return MediaHeader("gif", width=width, height=height)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _parse_wav(payload)
    return None


def _parse_wav(payload: bytes) -> Optional[MediaHeader]:
    """Walk RIFF chunks for fmt (rate/channels/block align) and data
    (byte length) -> duration in ms."""
    pos = 12
    rate = channels = byte_rate = None
    data_len = None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (chunk_len,) = struct.unpack_from("<I", payload, pos + 4)
        if chunk_id == b"fmt " and pos + 24 <= len(payload):
            _fmt, channels, rate, byte_rate = struct.unpack_from("<HHII", payload, pos + 8)
        elif chunk_id == b"data":
            data_len = chunk_len
        pos += 8 + chunk_len + (chunk_len & 1)  # chunks are word-aligned
    if rate and byte_rate and data_len is not None:
        return MediaHeader(
            "wav",
            duration_ms=round(data_len * 1000 / byte_rate),
            sample_rate=rate,
            n_channels=channels,
        )
    return None


# --- deterministic builders (test/bench payload synthesis) ---------------


def build_bmp(width: int, height: int) -> bytes:
    """Minimal valid 24-bit BMP with zeroed pixels."""
    row = width * 3
    padded = (row + 3) & ~3
    pixel_bytes = padded * height
    file_size = 54 + pixel_bytes
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    return header + info + b"\x00" * pixel_bytes


def build_png(width: int, height: int) -> bytes:
    """Valid 8-bit grayscale PNG (zlib IDAT of zero scanlines)."""
    import binascii
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def build_wav(n_samples: int, rate: int = 8000, channels: int = 1) -> bytes:
    """Valid 16-bit PCM WAV of silence."""
    block = channels * 2
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body
