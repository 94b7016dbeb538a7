"""Pure-Python media decode (no codec libraries needed).

Two decode tiers, both REAL:

* **header metadata** — image dimensions and audio duration — for
  BMP, PNG (IHDR), GIF87a/89a, and WAV (RIFF fmt/data chunks);
* **pixel/sample payloads** (round 4): 24-bit uncompressed BMP rows
  (bottom-up, word-padded), PNG via stdlib ``zlib`` inflate + scanline
  unfilter (bit depth 8; gray / gray+alpha / RGB / RGBA, filters
  0–4), GIF via a from-scratch LZW decoder (variable-width LSB-first
  codes, clear/end, KwKwK, 12-bit cap, interlacing), AVI
  uncompressed-DIB frame streams, 16-bit PCM WAV samples, and —
  round 5 — JPEG via the from-scratch baseline + progressive T.81
  codec in :mod:`.jpeg`. Round 6 adds an MPEG audio (MP3) frame-header
  walk — pure bit math over the 4-byte frame headers (version, layer,
  bitrate/sample-rate indices, padding), skipping an ID3v2 prefix —
  which yields REAL duration/bitrate/sample-rate metadata without
  decoding any audio, and an MP4 (ISO-BMFF) box walk whose avcC H.264
  SPS is bit-parsed for real coded dimensions (:mod:`.h264` —
  Exp-Golomb, frame-cropping calculus). Every format this repo sniffs
  decodes (or measures) for real; the only remaining stubs are MP3
  *audio samples* and H.264 *slice decode* (genuinely impossible
  without codec libraries), documented in ``operators/multimodal.py``.
"""

from __future__ import annotations

import struct
from typing import List, Optional


class MediaHeader:
    __slots__ = ("format", "width", "height", "duration_ms", "sample_rate", "n_channels", "n_frames", "frame_ms")

    def __init__(
        self,
        format: str,
        width=None,
        height=None,
        duration_ms=None,
        sample_rate=None,
        n_channels=None,
        n_frames=None,
        frame_ms=None,
    ):
        self.format = format
        self.width = width
        self.height = height
        self.duration_ms = duration_ms
        self.sample_rate = sample_rate
        self.n_channels = n_channels
        self.n_frames = n_frames
        self.frame_ms = frame_ms


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
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return _parse_avi(payload)
    if payload[4:8] == b"ftyp":
        return _parse_mp4(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import parse_jpeg_header

        dims = parse_jpeg_header(payload)
        if dims is not None:
            return MediaHeader("jpeg", width=dims[0], height=dims[1])
        return None
    if payload[:3] == b"ID3" or (payload[0] == 0xFF and payload[1] & 0xE0 == 0xE0):
        # JPEG is dispatched above (\xff\xd8 has the 0xD8 & 0xE0 == 0xC0
        # second byte, which never matches the MPEG sync's 0xE0), so a
        # leading 11-bit sync run — or an ID3v2 tag — means MPEG audio
        return _parse_mp3(payload)
    return None


# MPEG audio frame-header tables (ISO/IEC 11172-3 / 13818-3). Layer III
# only — the .mp3 container. Index 0 is "free format" and 15 is invalid;
# both stop the walk.
_MP3_BITRATES_V1_L3 = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2_L3 = (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _parse_mp3(payload: bytes) -> Optional[MediaHeader]:
    """MPEG-1/2/2.5 Layer III frame-header walk: duration, bitrate,
    sample rate, and channel count WITHOUT decoding audio — each 4-byte
    header fixes its own frame length, so the walk is an O(n_frames)
    skip over pure bit math (reference parity: fundus has no audio
    path at all; this serves the training-pipeline media profiler).
    Accepts an ID3v2 prefix; stops at the first non-frame byte;
    requires >= 1 valid frame. VBR-safe: per-frame samples/rate
    accumulate independently."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        # ID3v2 size is a 28-bit syncsafe integer (7 bits per byte)
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                return None
            size = (size << 7) | b
        pos = 10 + size
    n_frames = 0
    duration = 0.0  # seconds, per-frame samples/rate accumulated
    first_rate = first_bitrate = channels = None
    while pos + 4 <= len(payload) and n_frames < 1_000_000:
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or b1 & 0xE0 != 0xE0:
            break
        version = (b1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
        layer = (b1 >> 1) & 3  # 1=Layer III
        if version == 1 or layer != 1:
            break
        bitrate_idx = b2 >> 4
        rate_idx = (b2 >> 2) & 3
        if bitrate_idx in (0, 15) or rate_idx == 3:
            break
        padding = (b2 >> 1) & 1
        rate = _MP3_RATES[version][rate_idx]
        if version == 3:
            bitrate = _MP3_BITRATES_V1_L3[bitrate_idx] * 1000
            samples, coef = 1152, 144
        else:
            bitrate = _MP3_BITRATES_V2_L3[bitrate_idx] * 1000
            samples, coef = 576, 72
        frame_len = coef * bitrate // rate + padding
        if frame_len <= 4 or pos + frame_len > len(payload):
            break
        if n_frames == 0:
            first_rate, first_bitrate = rate, bitrate
            channels = 1 if (b3 >> 6) == 3 else 2
        n_frames += 1
        duration += samples / rate
        pos += frame_len
    if n_frames == 0:
        return None
    return MediaHeader(
        "mp3",
        duration_ms=round(duration * 1000),
        sample_rate=first_rate,
        n_channels=channels,
        n_frames=n_frames,
    )


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Iterate (chunk_id, data_start, data_end) over a RIFF chunk run;
    chunks are word-aligned."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        yield cid, pos + 8, min(pos + 8 + clen, end)
        pos += 8 + clen + (clen & 1)


def _parse_avi(payload: bytes) -> Optional[MediaHeader]:
    """AVI main header (LIST hdrl -> avih): frame period, frame count,
    dimensions -> real duration/fps metadata for the video modality."""
    for cid, s, e in _riff_chunks(payload, 12, len(payload)):
        if cid == b"LIST" and payload[s : s + 4] == b"hdrl":
            for cid2, s2, e2 in _riff_chunks(payload, s + 4, e):
                if cid2 == b"avih" and e2 - s2 >= 40:
                    usec, _mx, _pad, _flags, total = struct.unpack_from("<IIIII", payload, s2)
                    width, height = struct.unpack_from("<II", payload, s2 + 32)
                    frame_ms = max(usec // 1000, 1)
                    return MediaHeader(
                        "avi",
                        width=width,
                        height=height,
                        duration_ms=total * frame_ms,
                        n_frames=total,
                        frame_ms=frame_ms,
                    )
    return None


def _mp4_boxes(buf: bytes, pos: int, end: int):
    """Iterate (type, payload_start, payload_end) over an ISO-BMFF box
    run (ISO 14496-12 §4.2): 32-bit size, size==1 -> 64-bit largesize,
    size==0 -> to end of enclosing box. Malformed sizes stop the walk
    (refuse, never mis-walk)."""
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def _parse_mp4(payload: bytes) -> Optional[MediaHeader]:
    """ISO-BMFF / MP4 structural walk + H.264 SPS bit parse: duration
    from ``mvhd`` (movie-timescale math), frame count / frame period
    from the video track's ``stts``, and coded WIDTH/HEIGHT from the
    avcC sample description's SPS via the from-scratch Exp-Golomb
    parser in :mod:`.h264` — all pure byte/bit math, no codec library.
    Falls back to the ``avc1`` visual-sample-entry dimension fields
    when no SPS parses. Slice decode stays refused. Strict: a payload
    whose bytes 4:8 merely HAPPEN to read ``ftyp`` (e.g. document
    text) fails the moov/mvhd requirement and returns None."""
    from .h264 import parse_sps

    end = len(payload)
    duration_ms = width = height = None
    n_frames = frame_ms = None
    saw_mvhd = False
    for btype, s, e in _mp4_boxes(payload, 0, end):
        if btype != b"moov":
            continue
        for b2, s2, e2 in _mp4_boxes(payload, s, e):
            if b2 == b"mvhd" and e2 - s2 >= 20:
                version = payload[s2]
                if version == 1 and e2 - s2 >= 32:
                    timescale = int.from_bytes(payload[s2 + 20 : s2 + 24], "big")
                    duration = int.from_bytes(payload[s2 + 24 : s2 + 32], "big")
                else:
                    timescale = int.from_bytes(payload[s2 + 12 : s2 + 16], "big")
                    duration = int.from_bytes(payload[s2 + 16 : s2 + 20], "big")
                if timescale == 0:
                    return None
                duration_ms = duration * 1000 // timescale
                saw_mvhd = True
            elif b2 == b"trak" and width is None:
                got = _parse_mp4_video_trak(payload, s2, e2, parse_sps)
                if got is not None:
                    width, height, n_frames, frame_ms = got
    if not saw_mvhd:
        return None
    return MediaHeader(
        "mp4",
        width=width,
        height=height,
        duration_ms=duration_ms,
        n_frames=n_frames,
        frame_ms=frame_ms,
    )


def _parse_mp4_video_trak(buf: bytes, s: int, e: int, parse_sps):
    """trak -> mdia -> (mdhd timescale, hdlr 'vide', minf/stbl ->
    stsd avc1/avcC SPS dims, stts frame count+period). Returns
    (width, height, n_frames, frame_ms) or None for non-video traks."""
    for b2, s2, e2 in _mp4_boxes(buf, s, e):
        if b2 != b"mdia":
            continue
        # ISO-BMFF does not mandate child order inside mdia (mdhd may
        # legally follow minf), so collect every fact in one pass over
        # the children and only THEN derive frame_ms — a
        # sequential-dependence read of mdhd-before-stbl would drop the
        # frame schedule for a legal file.
        media_timescale = None
        is_video = False
        width = height = n_frames = None
        delta0 = None
        for b3, s3, e3 in _mp4_boxes(buf, s2, e2):
            if b3 == b"mdhd" and e3 - s3 >= 20:
                version = buf[s3]
                if version == 1:
                    # full v1 mdhd is 32+ bytes (64-bit times); a
                    # 20..31-byte v1 box is malformed — refuse rather
                    # than int.from_bytes a short slice into garbage
                    if e3 - s3 < 32:
                        continue
                    off = s3 + 20
                else:
                    off = s3 + 12
                media_timescale = int.from_bytes(buf[off : off + 4], "big") or None
            elif b3 == b"hdlr" and e3 - s3 >= 12:
                is_video = buf[s3 + 8 : s3 + 12] == b"vide"
            elif b3 == b"minf":
                for b4, s4, e4 in _mp4_boxes(buf, s3, e3):
                    if b4 != b"stbl":
                        continue
                    for b5, s5, e5 in _mp4_boxes(buf, s4, e4):
                        if b5 == b"stsd" and e5 - s5 >= 8:
                            got = _parse_mp4_stsd(buf, s5, e5, parse_sps)
                            if got is not None:
                                width, height = got
                        elif b5 == b"stts" and e5 - s5 >= 16:
                            n_entries = int.from_bytes(buf[s5 + 4 : s5 + 8], "big")
                            total = 0
                            for i in range(min(n_entries, (e5 - s5 - 8) // 8)):
                                cnt = int.from_bytes(buf[s5 + 8 + 8 * i : s5 + 12 + 8 * i], "big")
                                dlt = int.from_bytes(buf[s5 + 12 + 8 * i : s5 + 16 + 8 * i], "big")
                                total += cnt
                                if delta0 is None:
                                    delta0 = dlt
                            n_frames = total or None
        frame_ms = None
        if delta0 and media_timescale:
            frame_ms = delta0 * 1000 // media_timescale or None
        if is_video and (width is not None or n_frames is not None):
            return width, height, n_frames, frame_ms
    return None


def _parse_mp4_stsd(buf: bytes, s: int, e: int, parse_sps):
    """stsd -> first visual sample entry: prefer the avcC SPS coded
    dimensions (authoritative, crop applied); fall back to the entry's
    own width/height uint16 fields."""
    for btype, s2, e2 in _mp4_boxes(buf, s + 8, e):
        if e2 - s2 < 78:
            continue
        # VisualSampleEntry: 6 reserved + data_ref(2) + pre_defined/
        # reserved(16) + width(2) + height(2) at payload offset 24
        entry_w = int.from_bytes(buf[s2 + 24 : s2 + 26], "big")
        entry_h = int.from_bytes(buf[s2 + 26 : s2 + 28], "big")
        for b3, s3, e3 in _mp4_boxes(buf, s2 + 78, e2):
            if b3 != b"avcC" or e3 - s3 < 7:
                continue
            n_sps = buf[s3 + 5] & 0x1F
            pos = s3 + 6
            for _ in range(n_sps):
                if pos + 2 > e3:
                    break
                ln = int.from_bytes(buf[pos : pos + 2], "big")
                sps = parse_sps(buf[pos + 2 : pos + 2 + ln])
                if sps is not None:
                    return sps["width"], sps["height"]
                pos += 2 + ln
        if entry_w and entry_h:
            return entry_w, entry_h
    return None


def decode_avi_frames(payload: bytes) -> Optional[List[List[List[int]]]]:
    """Decode uncompressed-DIB ('00db') AVI frames to a list of
    top-left-origin luma grids — REAL video frame decode for the one
    AVI flavor that needs no codec (raw 24-bit BGR, bottom-up,
    word-padded rows, exactly the BMP pixel-array layout). Compressed
    streams ('00dc' or any fourcc handler) return None.

    Decompression-bomb bound: the per-frame cap alone would let a long
    (or crafted) AVI materialize frames x pixels Python lists far past
    worker memory (each decoded luma value costs ~10-30x its source
    byte), so the TOTAL pixel budget across all frames is also capped
    at MAX_DECODE_PIXELS — refused, not truncated, matching the
    refuse-don't-misdecode policy of the image decoders (a truncated
    frame list would silently disagree with the header's n_frames
    schedule in media_frame_sample)."""
    header = _parse_avi(payload)
    if header is None or not header.width or not header.height:
        return None
    import numpy as np

    w, h = header.width, header.height
    if w * h > MAX_DECODE_PIXELS:
        return None
    budget_frames = MAX_DECODE_PIXELS // (w * h)
    if header.n_frames and header.n_frames > budget_frames:
        return None
    padded = (w * 3 + 3) & ~3
    frames: List[List[List[int]]] = []
    for cid, s, e in _riff_chunks(payload, 12, len(payload)):
        if cid == b"LIST" and payload[s : s + 4] == b"movi":
            for cid2, s2, e2 in _riff_chunks(payload, s + 4, e):
                if cid2 == b"00dc":
                    return None  # compressed stream -> needs a codec
                if cid2 != b"00db":
                    continue
                if e2 - s2 < padded * h:
                    return None
                if len(frames) >= budget_frames:
                    # movi carries more frames than the header declared
                    # AND the budget allows — refuse the whole payload
                    return None
                arr = np.frombuffer(payload, np.uint8, padded * h, s2).reshape(h, padded)
                frames.append(arr[::-1, : w * 3].reshape(h, w, 3)[..., 2].tolist())
    return frames or None


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


# --- pixel / sample decode (round 4 — REAL, stdlib only) ----------------


#: refuse to materialize more pixels than this from an untrusted
#: payload (64 MP ~ 64 MB of luma): the dimensions come from
#: attacker-controlled headers, and GIF LZW in particular can expand
#: ~4000x from compressed bytes.
MAX_DECODE_PIXELS = 64_000_000


def decode_image_luma(payload: bytes) -> Optional[List[List[int]]]:
    """Decode pixels to a top-left-origin 2D luma grid (first channel —
    exact for grayscale, a real decoded channel for RGB). Supports
    24-bit uncompressed BMP, 8-bit-depth PNG (color types 0/2/4/6,
    scanline filters 0-4, sequential AND Adam7-interlaced), GIF
    (from-scratch LZW incl. interlacing; partial-screen first frames
    compose onto the background color), and both baseline sequential
    AND progressive JPEG (from-scratch Huffman + dequant + IDCT incl.
    spectral selection / successive approximation, :mod:`.jpeg`).
    24-bit/8-bit-palette/RLE8 BMP all decode (see
    :func:`_decode_bmp_luma`). Returns None for RLE4/bitfields BMP,
    arithmetic-coded/12-bit JPEG, and dimensions over
    MAX_DECODE_PIXELS."""
    header = parse_media_header(payload)
    if header is None or header.width is None:
        return None
    if header.format == "bmp":
        return _decode_bmp_luma(payload)
    if header.format == "png":
        return _decode_png_luma(payload)
    if header.format == "gif":
        return _decode_gif_luma(payload)
    if header.format == "jpeg":
        from .jpeg import decode_jpeg_luma

        return decode_jpeg_luma(payload)
    return None


def _decode_bmp_luma(payload: bytes) -> Optional[List[List[int]]]:
    """24-bit uncompressed, 8-bit uncompressed-palette, and 8-bit RLE8
    (BI_RLE8, round 5 — the common compressed BMP flavor) all decode;
    other depths/compressions (RLE4, bitfields, embedded PNG/JPEG)
    are refused."""
    if len(payload) < 34:  # header + the info fields read below
        return None
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    (info_size,) = struct.unpack_from("<I", payload, 14)
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if width <= 0 or height_raw == 0:
        return None
    height = abs(height_raw)
    if width * height > MAX_DECODE_PIXELS:
        return None
    import numpy as np

    if bpp == 24 and compression == 0:
        padded = (width * 3 + 3) & ~3
        if len(payload) < data_offset + padded * height:
            return None
        arr = np.frombuffer(payload, np.uint8, padded * height, data_offset).reshape(height, padded)
        # 24-bit BMP stores BGR; take R (offset 2) so "first channel"
        # means the same channel as PNG's channel 0 across formats
        rows = arr[:, : width * 3].reshape(height, width, 3)[..., 2]
        if height_raw > 0:  # positive height = bottom-up storage
            rows = rows[::-1]
        return rows.tolist()
    if bpp == 8 and compression in (0, 1):
        if len(payload) < 54:  # through biClrUsed + palette start
            return None
        # palette: BGRA quads right after the info header; take the R
        # channel (offset 2), same first-channel convention
        pal_off = 14 + info_size
        (n_colors,) = struct.unpack_from("<I", payload, 46)
        n_colors = n_colors or 256
        if len(payload) < pal_off + 4 * n_colors:
            return None
        pal = [payload[pal_off + 4 * i + 2] for i in range(n_colors)]
        if compression == 0:
            padded = (width + 3) & ~3
            if len(payload) < data_offset + padded * height:
                return None
            arr = np.frombuffer(payload, np.uint8, padded * height, data_offset).reshape(
                height, padded
            )[:, :width]
            if (arr >= n_colors).any():
                return None
            lut = np.asarray(pal, dtype=np.uint8)
            rows = lut[arr]
            if height_raw > 0:
                rows = rows[::-1]
            return rows.tolist()
        # BI_RLE8: (count, index) repeat pairs; escape 0 + {0: end of
        # line, 1: end of bitmap, 2: delta (skipped pixels keep the
        # fill value 0), n>=3: literal run, word-aligned}. Always
        # bottom-up per spec (negative height is invalid for RLE).
        if height_raw < 0:
            return None
        # delta/EOL-skipped pixels are INDEX 0 per the GDI convention,
        # which maps through the palette — not raw luma 0 (review
        # finding: diverged on non-black-first palettes)
        fill = pal[0] if n_colors else 0
        grid = [[fill] * width for _ in range(height)]
        x, y = 0, 0  # y counts from the BOTTOM row
        pos = data_offset
        while pos + 1 < len(payload):
            n, b = payload[pos], payload[pos + 1]
            pos += 2
            if n:
                if x + n > width or y >= height:
                    return None
                row = grid[height - 1 - y]
                if b >= n_colors:
                    return None
                v = pal[b]
                for i in range(n):
                    row[x + i] = v
                x += n
            elif b == 0:  # end of line
                x, y = 0, y + 1
            elif b == 1:  # end of bitmap
                return grid
            elif b == 2:  # delta
                if pos + 2 > len(payload):
                    return None
                x += payload[pos]
                y += payload[pos + 1]
                pos += 2
                if x > width or y > height:
                    return None
            else:  # literal run of b indices, word-aligned
                if pos + b > len(payload) or x + b > width or y >= height:
                    return None
                row = grid[height - 1 - y]
                for i in range(b):
                    idx = payload[pos + i]
                    if idx >= n_colors:
                        return None
                    row[x + i] = pal[idx]
                x += b
                pos += b + (b & 1)
        return None  # ran out of data before the end-of-bitmap escape
    return None


_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, offset: int, width: int, height: int, channels: int):
    """Invert PNG scanline filters 0-4 over one (sub-)image of
    ``height`` scanlines of ``width`` pixels starting at ``offset`` in
    the inflated stream. Returns (pixel lines as bytearrays, offset
    past the sub-image) or None on a bad filter byte / short stream."""
    stride = width * channels
    if len(raw) < offset + height * (1 + stride):
        return None
    lines = []
    prev = bytearray(stride)
    pos = offset
    for _y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            return None
        lines.append(line)
        prev = line
    return lines, pos


def _decode_png_luma(payload: bytes) -> Optional[List[List[int]]]:
    import zlib

    if len(payload) < 29:  # through the IHDR interlace byte
        return None
    width, height = struct.unpack_from(">II", payload, 16)
    bit_depth, color_type = payload[24], payload[25]
    compression, filter_method, interlace = payload[26], payload[27], payload[28]
    if bit_depth != 8 or color_type not in (0, 2, 4, 6):
        return None
    # Non-zero compression/filter methods are reserved; interlace 1 is
    # Adam7 (decoded below, round 5 — previously refused).
    if compression != 0 or filter_method != 0 or interlace not in (0, 1):
        return None
    if not width or not height or width * height > MAX_DECODE_PIXELS:
        return None
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    # walk chunks, concatenate IDAT
    pos = 8
    idat = b""
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IEND":
            break
        pos += 12 + clen
    # the seven Adam7 passes are independently filtered sub-images
    # stored back to back; the sequential layout is the degenerate
    # single full-coverage pass
    if interlace:
        passes = [
            (x0, y0, -(-(width - x0) // dx), -(-(height - y0) // dy))
            for x0, y0, dx, dy in _ADAM7
            if width > x0 and height > y0
        ]
        steps = [(dx, dy) for (x0, y0, dx, dy) in _ADAM7 if width > x0 and height > y0]
    else:
        passes = [(0, 0, width, height)]
        steps = [(1, 1)]
    try:
        # bound the inflate to exactly the pixel data we need: a
        # crafted few-hundred-KB IDAT can otherwise inflate to
        # gigabytes inside the Python worker (decompression bomb —
        # these decoders run on untrusted crawled payloads)
        need = sum(ph * (1 + pw * channels) for _x0, _y0, pw, ph in passes)
        raw = zlib.decompressobj().decompress(idat, need)
    except zlib.error:
        return None
    grid = [[0] * width for _ in range(height)]
    offset = 0
    for (x0, y0, pw, ph), (dx, dy) in zip(passes, steps):
        res = _png_unfilter(raw, offset, pw, ph, channels)
        if res is None:
            return None
        lines, offset = res
        for j, line in enumerate(lines):
            y = y0 + j * dy
            row = grid[y]
            for i in range(pw):
                row[x0 + i * dx] = line[i * channels]
    return grid


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> Optional[List[int]]:
    """GIF-flavor LZW: LSB-first variable-width codes starting at
    ``min_code + 1`` bits, clear/end codes, code width grows when the
    dictionary reaches the current width's capacity (12-bit max)."""
    if not 2 <= min_code <= 11:
        return None
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    table: dict = {i: (i,) for i in range(clear)}
    next_code = end + 1
    out: List[int] = []
    prev: Optional[tuple] = None
    bitpos = 0
    total_bits = len(data) * 8

    def read_code() -> Optional[int]:
        nonlocal bitpos
        if bitpos + code_size > total_bits:
            return None
        v = 0
        for i in range(code_size):
            if (data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1:
                v |= 1 << i
        bitpos += code_size
        return v

    while len(out) < max_pixels:
        code = read_code()
        if code is None or code == end:
            break
        if code == clear:
            code_size = min_code + 1
            table = {i: (i,) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
            out.extend(entry)
            prev = entry
            continue
        if code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None
        out.extend(entry)
        if next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out[:max_pixels] if len(out) >= max_pixels else None


def _lzw_encode(indices: List[int], min_code: int) -> bytes:
    """GIF-flavor LZW compressor (the builder's half; the decoder above
    is its inverse — the encoder's width bump lags one entry because
    the decoder's table is one entry behind). Sequences are tracked as
    their CODE and the table is keyed by ``(prefix_code << 12) | symbol``
    (codes and symbols are both < 4096, so 12 bits is collision-free
    for every legal ``min_code``) — int keys and a bit accumulator
    instead of tuple keys and a bit list (~10x: the synthetic corpus
    LZW-encodes millions of pixels)."""
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    table: dict = {}
    next_code = end + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    it = iter(indices)
    w = next(it, None)
    if w is not None:
        for k in it:
            key = (w << 12) | k
            c = table.get(key)
            if c is not None:
                w = c
                continue
            emit(w)
            if next_code < 4096:
                table[key] = next_code
                next_code += 1
                if next_code == (1 << code_size) + 1 and code_size < 12:
                    code_size += 1
            else:
                emit(clear)
                table.clear()
                next_code = end + 1
                code_size = min_code + 1
            w = k
        emit(w)
    emit(end)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _decode_gif_luma(payload: bytes) -> Optional[List[List[int]]]:
    """Real GIF decode: logical screen + color tables + LZW'd image
    data -> top-left-origin luma grid (first palette channel, R) of
    the LOGICAL SCREEN. Handles interlaced images; animated GIFs yield
    the first frame; a first frame smaller than the screen (common in
    animations) is composed onto the background color at its
    (left, top) offset — round 5, previously refused."""
    if len(payload) < 13:
        return None
    screen_w, screen_h = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    gct = None
    pos = 13
    if flags & 0x80:
        size = 2 ** ((flags & 7) + 1)
        if pos + 3 * size > len(payload):
            return None
        gct = payload[pos : pos + 3 * size]
        pos += 3 * size
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + data sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                return None
            img_x, img_y, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
            iflags = payload[pos + 9]
            pos += 10
            # the frame must FIT inside the logical screen and be
            # non-empty; anything else is malformed (refused, not
            # clipped or fabricated-as-background — review finding)
            if w == 0 or h == 0 or img_x + w > screen_w or img_y + h > screen_h:
                return None
            if not screen_w or not screen_h or screen_w * screen_h > MAX_DECODE_PIXELS:
                return None
            table = gct
            if iflags & 0x80:
                size = 2 ** ((iflags & 7) + 1)
                if pos + 3 * size > len(payload):
                    return None
                table = payload[pos : pos + 3 * size]
                pos += 3 * size
            if table is None or w == 0 or h == 0:
                return None
            if pos >= len(payload):
                return None
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                n = payload[pos]
                data += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            indices = _lzw_decode(bytes(data), min_code, w * h)
            if indices is None or len(indices) < w * h:
                return None  # truncated pixel stream -> refuse
            rows = [
                [table[3 * indices[yy * w + xx]] if 3 * indices[yy * w + xx] < len(table) else 0 for xx in range(w)]
                for yy in range(h)
            ]
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
                deinterlaced: List[Optional[List[int]]] = [None] * h
                for src, dst in enumerate(order):
                    deinterlaced[dst] = rows[src]
                rows = [r for r in deinterlaced if r is not None]
                if len(rows) != h:
                    return None
            if (img_x, img_y) == (0, 0) and (w, h) == (screen_w, screen_h):
                return rows
            # partial-screen frame: compose onto the background color
            # (header byte 11 indexes the global color table; 0 luma
            # when there is no GCT, per the spec's "no meaning" case)
            bg_idx = payload[11]
            bg = gct[3 * bg_idx] if gct is not None and 3 * bg_idx < len(gct) else 0
            screen = [[bg] * screen_w for _ in range(screen_h)]
            for yy in range(h):
                screen[img_y + yy][img_x : img_x + w] = rows[yy]
            return screen
        else:  # trailer (0x3B) or garbage
            return None
    return None


def decode_wav_samples(payload: bytes) -> Optional[List[int]]:
    """Decode 16-bit PCM WAV to a list of first-channel samples
    (signed ints)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (chunk_len,) = struct.unpack_from("<I", payload, pos + 4)
        if chunk_id == b"fmt " and pos + 24 <= len(payload):
            fmt_code, channels = struct.unpack_from("<HH", payload, pos + 8)
            (bits,) = struct.unpack_from("<H", payload, pos + 22)
            if fmt_code != 1:  # PCM only
                return None
        elif chunk_id == b"data":
            data = payload[pos + 8 : pos + 8 + chunk_len]
        pos += 8 + chunk_len + (chunk_len & 1)
    if data is None or bits != 16 or not channels:
        return None
    import numpy as np

    block = channels * 2
    n = len(data) // block
    return np.frombuffer(data, "<i2", n * channels)[::channels].tolist()


def resize_nearest(rows: List[List[int]], out_w: int, out_h: int) -> List[List[int]]:
    """Nearest-neighbor resample (floor sampling grid):
    ``out[oy][ox] = src[oy*h//out_h][ox*w//out_w]`` — the exact formula
    the DuckDB oracle replays."""
    h, w = len(rows), len(rows[0])
    return [[rows[oy * h // out_h][ox * w // out_w] for ox in range(out_w)] for oy in range(out_h)]


# --- deterministic builders (test/bench payload synthesis) ---------------


def synthetic_luma(seed: int, x: int, y: int) -> int:
    """Closed-form pixel value used by the synthetic builders (and
    replayed by the DuckDB oracles): ``(seed + 3x + 7y) mod 256``."""
    return (seed + 3 * x + 7 * y) % 256


def _luma_grid(seed: int, width: int, height: int):
    """Vectorized ``synthetic_luma`` grid (numpy uint8, h x w) — the
    builders synthesize millions of pixels per bench corpus."""
    import numpy as np

    xs = np.arange(width, dtype=np.int64)
    ys = np.arange(height, dtype=np.int64)
    return ((seed + 3 * xs[None, :] + 7 * ys[:, None]) % 256).astype(np.uint8)


def _bgr_pixel_array(grid, padded: int) -> bytes:
    """Gray grid -> bottom-up, word-padded 24-bit BGR pixel array (the
    BMP / uncompressed-AVI-frame layout)."""
    import numpy as np

    h, w = grid.shape
    buf = np.zeros((h, padded), dtype=np.uint8)
    buf[:, : w * 3] = np.repeat(grid[::-1][:, :, None], 3, axis=2).reshape(h, w * 3)
    return buf.tobytes()


def synthetic_sample(seed: int, i: int) -> int:
    """Closed-form PCM sample: ``((seed*31 + i*17) mod 65536) - 32768``."""
    return ((seed * 31 + i * 17) % 65536) - 32768


def build_bmp(width: int, height: int, seed: Optional[int] = None) -> bytes:
    """Valid 24-bit BMP; pixels are ``synthetic_luma(seed, x, y)`` gray
    when ``seed`` is given, zeros otherwise."""
    padded = (width * 3 + 3) & ~3
    pixel_bytes = padded * height
    file_size = 54 + pixel_bytes
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    if seed is None:
        return header + info + b"\x00" * pixel_bytes
    return header + info + _bgr_pixel_array(_luma_grid(seed, width, height), padded)


def build_bmp_rle8(width: int, height: int, seed: Optional[int] = None) -> bytes:
    """Valid 8-bit RLE8-compressed BMP with a grayscale palette (index
    i -> (i,i,i)); pixel (x, y) carries ``synthetic_luma`` when
    ``seed`` is given. Encoding alternates repeat pairs and literal
    runs so the decoder's both paths are exercised."""
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    grid = _luma_grid(seed, width, height) if seed is not None else None
    data = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = [int(grid[y][x]) if grid is not None else 0 for x in range(width)]
        x = 0
        while x < width:
            # repeat pair for runs of equal values, literal run otherwise
            run = 1
            while x + run < width and row[x + run] == row[x] and run < 255:
                run += 1
            if run >= 2 or width - x == 1:
                data += bytes((run, row[x]))
                x += run
            else:
                lit = 0
                while (
                    x + lit < width
                    and lit < 255
                    and (x + lit + 1 >= width or row[x + lit + 1] != row[x + lit])
                ):
                    lit += 1
                lit = max(lit, 3) if x + 3 <= width else lit
                if lit >= 3:
                    data += bytes((0, lit)) + bytes(row[x : x + lit])
                    if lit & 1:
                        data += b"\x00"
                    x += lit
                else:
                    for i in range(lit):
                        data += bytes((1, row[x + i]))
                    x += lit
        data += b"\x00\x00"  # end of line
    data += b"\x00\x01"  # end of bitmap
    data_offset = 54 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", data_offset + len(data), 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 1, len(data), 2835, 2835, 256, 0
    )
    return header + info + palette + bytes(data)


def build_png(
    width: int, height: int, seed: Optional[int] = None, interlaced: bool = False
) -> bytes:
    """Valid 8-bit grayscale PNG; pixels are ``synthetic_luma`` when
    ``seed`` is given, zeros otherwise (zlib IDAT, filter 0).
    ``interlaced=True`` stores the SAME pixels in Adam7 layout — seven
    independently-filtered sub-images (round 5: the decoder
    reassembles them; previously refused)."""
    import binascii
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 1 if interlaced else 0)
    if seed is None:
        import numpy as np

        grid = np.zeros((height, width), dtype=np.uint8)
    else:
        grid = _luma_grid(seed, width, height)
    if interlaced:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            if width <= x0 or height <= y0:
                continue
            sub = grid[y0::dy, x0::dx]
            parts += [b"\x00" + sub[j].tobytes() for j in range(sub.shape[0])]
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + grid[y].tobytes() for y in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def build_gif(
    width: int,
    height: int,
    seed: Optional[int] = None,
    interlaced: bool = False,
    frame_box=None,
    background: int = 0,
) -> bytes:
    """Valid GIF89a with a 256-entry grayscale palette (index i ->
    (i,i,i)) and REAL LZW-compressed pixel data; pixel (x, y) carries
    ``synthetic_luma(seed, x, y)`` when ``seed`` is given.
    ``frame_box=(left, top, fw, fh)`` emits a PARTIAL-SCREEN first
    frame (the animation shape): the descriptor covers only the box,
    whose pixel (fx, fy) carries ``synthetic_luma(seed, fx, fy)``, and
    ``background`` is the screen's background color index."""
    fx0, fy0, fw, fh = frame_box if frame_box is not None else (0, 0, width, height)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    screen = struct.pack("<HHBBB", width, height, 0x80 | 0x70 | 0x07, background & 0xFF, 0)
    if seed is None:
        pixels = [0] * (fw * fh)
    else:
        pixels = _luma_grid(seed, fw, fh).reshape(-1).tolist()
    if interlaced:
        order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, fh, step)]
        pixels = [pixels[src_row * fw + x] for src_row in order for x in range(fw)]
    iflags = 0x40 if interlaced else 0
    descriptor = b"\x2c" + struct.pack("<HHHHB", fx0, fy0, fw, fh, iflags)
    lzw = _lzw_encode(pixels, 8)
    sub_blocks = b"".join(
        bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255] for i in range(0, len(lzw), 255)
    )
    return b"GIF89a" + screen + palette + descriptor + b"\x08" + sub_blocks + b"\x00" + b"\x3b"


def build_avi(
    width: int, height: int, n_frames: int, frame_ms: int = 40, seed: Optional[int] = None
) -> bytes:
    """Valid minimal AVI with uncompressed 24-bit DIB frames; frame f's
    pixel (x, y) carries ``synthetic_luma(seed + 11*f, x, y)`` gray
    when ``seed`` is given, zeros otherwise."""
    padded = (width * 3 + 3) & ~3

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    frames = []
    for f in range(n_frames):
        if seed is None:
            frames.append(b"\x00" * (padded * height))
        else:
            frames.append(_bgr_pixel_array(_luma_grid(seed + 11 * f, width, height), padded))

    avih = struct.pack(
        "<IIIIIIIIII", frame_ms * 1000, 0, 0, 0, n_frames, 0, 1, 0, width, height
    ) + b"\x00" * 16
    strh = b"vids" + b"DIB " + b"\x00" * 48
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, padded * height, 0, 0, 0, 0)
    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)
    movi = b"movi" + b"".join(chunk(b"00db", fr) for fr in frames)
    body_bytes = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(body_bytes)) + body_bytes


_MP4_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def build_mp4(
    width: int, height: int, n_frames: int, frame_ms: int = 40, seed: Optional[int] = None
) -> bytes:
    """Valid minimal ISO-BMFF MP4 with one H.264 video track whose
    avcC carries a REAL High-monochrome SPS encoding exactly
    ``width x height`` (kernel/h264.py — odd dimensions round-trip via
    4:0:0 1x1 crop units). Movie duration is closed-form:
    ``n_frames * frame_ms`` ms at movie timescale 1000. The mdat
    payload is seed-derived filler standing in for CABAC/CAVLC slice
    data — the structural walk never reads it, and slice decode is
    honestly refused (codec-library-bound)."""
    from .h264 import build_pps, build_sps

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    sps, pps = build_sps(width, height), build_pps()
    duration = n_frames * frame_ms

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version/flags
        + b"\x00" * 8  # creation/modification (epoch zero: deterministic)
        + struct.pack(">II", 1000, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate 1.0, volume 1.0
        + b"\x00" * 8
        + _MP4_UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x03"  # v0, enabled|in-movie
        + b"\x00" * 8
        + struct.pack(">II", 1, 0)  # track_ID, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, reserved
        + _MP4_UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),  # 16.16 display dims
    )
    mdhd = box(
        b"mdhd",
        b"\x00\x00\x00\x00"
        + b"\x00" * 8
        + struct.pack(">II", 1000, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"video\x00")
    avcc = box(
        b"avcC",
        bytes((1, sps[1], sps[2], sps[3], 0xFF, 0xE1))
        + struct.pack(">H", len(sps))
        + sps
        + b"\x01"
        + struct.pack(">H", len(pps))
        + pps,
    )
    avc1 = box(
        b"avc1",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
        + avcc,
    )
    # one fake length-prefixed IDR NAL per frame (structural stand-in)
    frame_size = 24
    s = seed or 0
    frames = [
        struct.pack(">I", frame_size - 4)
        + bytes((0x65,))
        + bytes(((s * 31 + f * 11 + j * 17) % 256) for j in range(frame_size - 5))
        for f in range(n_frames)
    ]
    stsd = box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + avc1)
    stts = box(
        b"stts", b"\x00\x00\x00\x00" + struct.pack(">III", 1, n_frames, frame_ms)
    )
    stsc = box(b"stsc", b"\x00\x00\x00\x00" + struct.pack(">IIII", 1, 1, n_frames, 1))
    stsz = box(b"stsz", b"\x00\x00\x00\x00" + struct.pack(">II", frame_size, n_frames))
    stbl_partial = stsd + stts + stsc + stsz
    vmhd = box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
    dinf = box(
        b"dinf",
        box(b"dref", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + box(b"url ", b"\x00\x00\x00\x01")),
    )
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomavc1")
    # stco needs the absolute mdat payload offset; sizes are all fixed
    # once the box tree above is, so compute it from the assembled size
    def assemble(chunk_offset: int) -> bytes:
        stco = box(b"stco", b"\x00\x00\x00\x00" + struct.pack(">II", 1, chunk_offset))
        stbl = box(b"stbl", stbl_partial + stco)
        minf = box(b"minf", vmhd + dinf + stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        mdat = box(b"mdat", b"".join(frames))
        return ftyp + moov + mdat

    probe = assemble(0)
    mdat_payload_at = len(probe) - n_frames * frame_size
    return assemble(mdat_payload_at)


def build_wav(n_samples: int, rate: int = 8000, channels: int = 1, seed: Optional[int] = None) -> bytes:
    """Valid 16-bit PCM WAV; samples are ``synthetic_sample`` when
    ``seed`` is given, silence otherwise."""
    block = channels * 2
    if seed is None:
        data = b"\x00" * (n_samples * block)
    else:
        data = b"".join(
            struct.pack("<h", synthetic_sample(seed, i)) * channels for i in range(n_samples)
        )
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_mp3(
    n_frames: int,
    version: int = 1,
    rate: int = 32000,
    bitrate: int = 64000,
    seed: Optional[int] = None,
    id3: bool = False,
) -> bytes:
    """Valid MPEG Layer III stream: ``n_frames`` frames with real
    headers (version 1 = MPEG-1 @ 1152 samples/frame, 2 = MPEG-2 @
    576) and deterministic seed-derived payload bytes (the header walk
    never reads them — they stand in for Huffman-coded audio). The
    padding bit alternates by frame index so the walker's
    variable-frame-length path is exercised. With ``id3`` a 32-byte
    ID3v2.4 tag prefixes the stream. duration_ms parses back to
    ``round(n_frames * samples * 1000 / rate)`` — closed form for the
    DuckDB oracle."""
    ver_bits, table, samples, coef = (
        (3, _MP3_BITRATES_V1_L3, 1152, 144) if version == 1 else (2, _MP3_BITRATES_V2_L3, 576, 72)
    )
    bitrate_idx = table.index(bitrate // 1000)
    rate_idx = _MP3_RATES[ver_bits].index(rate)
    out = bytearray()
    if id3:
        pad = 22  # tag body: 32 total - 10 header
        out += b"ID3\x04\x00\x00" + bytes((0, 0, 0, pad)) + b"\x00" * pad
    for i in range(n_frames):
        padding = i & 1
        frame_len = coef * bitrate // rate + padding
        b1 = 0xE0 | (ver_bits << 3) | (1 << 1) | 1  # layer III, no CRC
        b2 = (bitrate_idx << 4) | (rate_idx << 2) | (padding << 1)
        b3 = 0xC0  # single-channel mode
        out += bytes((0xFF, b1, b2, b3))
        body = frame_len - 4
        s = seed or 0
        out += bytes(((s * 31 + i * 11 + j * 17) % 256) for j in range(body))
    return bytes(out)
