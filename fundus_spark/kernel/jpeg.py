"""From-scratch baseline JPEG (ITU-T T.81 / JFIF) encoder + decoder.

JPEG is the dominant image format in any real crawl, so a multimodal
pipeline whose image decode NULLs every JPEG is blind to most of its
images — this module closes that gap for baseline sequential DCT
streams (SOF0): marker parse -> DQT dequant tables -> DHT Huffman
tables -> MCU entropy decode (with restart markers and byte
un-stuffing) -> dequantize -> 2D IDCT -> level shift -> plane
reassembly -> crop. Progressive (SOF2), arithmetic-coded, hierarchical,
and 12-bit-precision streams are refused (``None``), never mis-decoded
— the same refuse-don't-guess policy as the PNG/GIF decoders in
:mod:`.media`.

The encoder is a real forward pipeline (level shift -> 2D DCT ->
quantize -> zigzag -> Huffman), not a byte template: it encodes
arbitrary grids, supports grayscale and YCbCr 4:4:4 / 4:2:0, and emits
its own canonical Huffman tables in DHT segments (fixed-length-per-
class canonical codes). Carrying custom tables is fully spec-conformant
— a baseline decoder MUST take its tables from DHT — and keeps this
module free of any transcribed spec tables; the decoder therefore
handles arbitrary DHT tables, not just its sibling encoder's.

Exactness contract used by the oracles: an image whose every 8x8 block
is CONSTANT round-trips bit-exactly. A constant block (value ``v``,
level-shifted ``d = v - 128``) has a single nonzero DCT coefficient
``S00 = 8d``; with the flat quantization table ``Q = 8`` the quantized
DC is exactly ``d`` (integer), every AC coefficient quantizes to zero
(float epsilons ~1e-13 round away), and the IDCT of a DC-only block is
exactly constant ``d`` again. The synthetic builders exploit this:
``build_jpeg(width, height, seed)`` carries pixel
``(x, y) -> synthetic_luma(seed, x//8, y//8)`` (block-constant), so
DuckDB oracles can replay decoded pixel sums in closed form even
though JPEG is a lossy codec in general.

No counterpart exists in the reference (fundus delegates all image
handling to URL lists; see
``/root/reference/src/fundus/parser/data.py`` Image — metadata only).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

from .media import MAX_DECODE_PIXELS

# zigzag index order: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZIGZAG: List[Tuple[int, int]] = []
_r = _c = 0
for _k in range(64):
    _ZIGZAG.append((_r, _c))
    if (_r + _c) % 2 == 0:  # moving up-right
        if _c == 7:
            _r += 1
        elif _r == 0:
            _c += 1
        else:
            _r -= 1
            _c += 1
    else:  # moving down-left
        if _r == 7:
            _c += 1
        elif _c == 0:
            _r += 1
        else:
            _r += 1
            _c -= 1
del _r, _c, _k

_FLAT_Q = [8] * 64  # flat table; Q[0]=8 makes constant blocks exact


def _dct_matrix():
    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            m[u, x] = (0.353553390593273762 if u == 0 else 0.5) * __import__("math").cos(
                (2 * x + 1) * u * 3.14159265358979323846 / 16
            )
    return m


_DCT_M = None


def _dct_m():
    global _DCT_M
    if _DCT_M is None:
        _DCT_M = _dct_matrix()
    return _DCT_M


# ---------------------------------------------------------------------------
# canonical Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """JPEG canonical code assignment (T.81 C.2): symbol -> (code, length)."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[vi]] = (code, length)
            vi += 1
            code += 1
        code <<= 1
    return out


def _decode_table(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[vi]
            vi += 1
            code += 1
        code <<= 1
    return table


# encoder-side tables: fixed-length canonical codes over the full
# legal symbol alphabet of each class (spec-valid: a DHT length count
# is one byte so <= 255 codes per length; Kraft sum < 1; no all-ones
# code). DC: 12 categories at 4 bits. AC: the 162 legal run/size
# symbols (EOB, ZRL, run 0-15 x size 1-10) at 8 bits (162/256 < 1).
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc = self.nbits = 0


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _value_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _fdct_quant_all(plane, q):
    """Forward DCT + quantize EVERY 8x8 block of a level-shifted plane
    (dims multiples of 8) in one vectorized pass; returns an
    (blocks_y, blocks_x, 64) int array of zigzag-ordered quantized
    coefficients. The per-block Python-loop version cost ~10 ms per
    image at fixture sizes — two orders over the whole-corpus einsum."""
    import numpy as np

    h, w = plane.shape
    bh, bw = h // 8, w // 8
    blocks = (
        np.asarray(plane, dtype=np.float64).reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    )
    m = np.asarray(_dct_m())
    s = np.einsum("ux,ijxy,vy->ijuv", m, blocks, m)
    zz_index = np.array([r * 8 + c for r, c in _ZIGZAG])
    zz = s.reshape(bh, bw, 64)[:, :, zz_index]
    return np.rint(zz / np.asarray(q, dtype=np.float64)).astype(np.int64)


def _encode_block(coeffs, dc_pred, writer, dc_codes, ac_codes) -> int:
    """Entropy-encode one block from its 64 zigzag quantized coeffs
    (numpy int row). Work is proportional to NONZERO coefficients —
    DC-only blocks (the synthetic corpus) cost two symbols."""
    import numpy as np

    diff = int(coeffs[0]) - dc_pred
    t = _category(diff)
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(_value_bits(diff, t), t)
    run = 0
    nz = np.nonzero(coeffs[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        t = _category(v)
        code, length = ac_codes[(run << 4) | t]
        writer.write(code, length)
        writer.write(_value_bits(v, t), t)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(coeffs[0])


def _pad_to_blocks(plane, bw: int, bh: int):
    """Edge-replicate a (h, w) grid to (bh*8, bw*8) — the padding the
    spec prescribes keeps constant blocks constant."""
    import numpy as np

    a = np.asarray(plane, dtype=np.int64)
    h, w = a.shape
    out = np.empty((bh * 8, bw * 8), dtype=np.int64)
    out[:h, :w] = a
    if bw * 8 > w:
        out[:h, w:] = a[:, w - 1 : w]
    if bh * 8 > h:
        out[h:, :] = out[h - 1 : h, :]
    return out


def encode_jpeg(
    y_plane,
    width: int,
    height: int,
    gray: bool = False,
    subsampling: Tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode a (height, width) luma grid as a baseline JFIF stream.
    Color output carries neutral chroma (Cb = Cr = 128) — gray pixels
    through a real 3-component YCbCr scan; ``subsampling`` (1, 1) is
    4:4:4, (2, 2) is 4:2:0. ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (decoder resilience surface)."""
    import numpy as np

    hs, vs = subsampling
    if gray:
        comps = [(1, 1, 1, 0)]  # id, h, v, qtab
    else:
        comps = [(1, hs, vs, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    planes = {}
    y = np.asarray(y_plane, dtype=np.int64)
    planes[1] = _pad_to_blocks(y, mcus_x * hmax, mcus_y * vmax) - 128
    if not gray:
        cw, ch = mcus_x * 8, mcus_y * 8
        planes[2] = np.zeros((ch, cw), dtype=np.int64)  # 128 - 128
        planes[3] = np.zeros((ch, cw), dtype=np.int64)

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    # one vectorized DCT+quantize pass per component plane; the MCU
    # loop below only walks precomputed coefficient rows
    coeff_planes = {cid: _fdct_quant_all(planes[cid], _FLAT_Q) for cid, _, _, _ in comps}

    writer = _BitWriter()
    preds = {cid: 0 for cid, _, _, _ in comps}
    mcu_idx = 0
    rst = 0
    body = bytearray()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.flush()
                body += writer.buf
                writer = _BitWriter()
                body += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = {cid: 0 for cid, _, _, _ in comps}
            for cid, ch_, cv, _tq in comps:
                for by in range(cv):
                    for bx in range(ch_):
                        coeffs = coeff_planes[cid][my * cv + by, mx * ch_ + bx]
                        preds[cid] = _encode_block(coeffs, preds[cid], writer, dc_codes, ac_codes)
            mcu_idx += 1
    writer.flush()
    body += writer.buf

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes([0]) + bytes(_FLAT_Q))  # DQT, table 0, 8-bit
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, ch_, cv, tq in comps:
        sof += bytes([cid, (ch_ << 4) | cv, tq])
    out += seg(0xC0, sof)  # SOF0 baseline
    dht = bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    out += seg(0xC4, dht)  # one DHT with both classes, id 0
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    sos = bytes([len(comps)])
    for cid, _, _, _tq in comps:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    out += seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def build_jpeg(
    width: int,
    height: int,
    seed: Optional[int] = None,
    gray: bool = False,
    subsampling: Tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Valid baseline JFIF whose pixel (x, y) carries the BLOCK-constant
    value ``synthetic_luma(seed, x // 8, y // 8)`` when ``seed`` is
    given (zeros otherwise) — constant 8x8 blocks round-trip exactly
    (module docstring), so decoded content is closed-form replayable."""
    import numpy as np

    if seed is None:
        grid = np.zeros((height, width), dtype=np.int64)
    else:
        bx = np.arange(width, dtype=np.int64) // 8
        by = np.arange(height, dtype=np.int64) // 8
        grid = (seed + 3 * bx[None, :] + 7 * by[:, None]) % 256
    return encode_jpeg(
        grid, width, height, gray=gray, subsampling=subsampling, restart_interval=restart_interval
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 un-stuffing;
    stops (raises EOFError) at any real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise EOFError
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 < len(self.data) and self.data[self.pos + 1] == 0x00:
                self.pos += 2  # stuffed byte
            else:
                raise EOFError  # a real marker terminates the segment
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> Optional[int]:
        """Discard partial byte, expect an RST marker next; returns the
        marker's low nibble or None if the stream is malformed."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            return None
        m = self.data[self.pos + 1]
        if 0xD0 <= m <= 0xD7:
            self.pos += 2
            return m & 0x0F
        return None


def _huff_decode(reader: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(reader, dc_table, ac_table, pred: int, q, idct_m):
    import numpy as np

    coeffs = np.zeros((8, 8), dtype=np.float64)
    t = _huff_decode(reader, dc_table)
    diff = _extend(reader.bits(t), t) if t else 0
    dc = pred + diff
    coeffs[0, 0] = dc * q[0]
    k = 1
    while k < 64:
        sym = _huff_decode(reader, ac_table)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError("bad AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        r, c = _ZIGZAG[k]
        coeffs[r, c] = _extend(reader.bits(size), size) * q[k]
        k += 1
    # IDCT: s = M^T S M with the orthonormal DCT-II matrix
    return idct_m.T @ coeffs @ idct_m, dc


def parse_jpeg_header(payload: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the SOF segment of any DCT JPEG flavor, or
    None — header geometry parses even for streams the full decoder
    refuses (progressive), matching the other formats' header-first
    contract in :func:`.media.parse_media_header`."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            return None
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(payload):
                return None
            height, width = struct.unpack_from(">HH", payload, pos + 5)
            return (width, height)
        pos += 2 + seglen
    return None


def decode_jpeg_luma(payload: bytes) -> Optional[List[List[int]]]:
    """Full baseline decode -> the Y (luma) plane as a top-left-origin
    grid, cropped to the SOF dimensions. Supports 1- or 3-component
    scans, arbitrary DHT Huffman tables, 8- or 16-bit DQT precision,
    sampling factors 1-2 per axis (4:4:4 / 4:2:0 / 4:2:2), restart
    markers, and multi-segment DQT/DHT. Returns None for progressive /
    arithmetic / hierarchical / 12-bit streams, dimension bombs
    (> MAX_DECODE_PIXELS), and any malformed entropy data — refused,
    never mis-decoded. Chroma planes are entropy-decoded (the stream
    position depends on them) but only Y is materialized to pixels:
    "luma" here is literally the Y channel, the same channel the
    RGB-family decoders approximate by their first channel."""
    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    qtables: Dict[int, List[int]] = {}
    dc_tables: Dict[int, Dict] = {}
    ac_tables: Dict[int, Dict] = {}
    restart_interval = 0
    frame = None  # (width, height, [(cid, h, v, tq)])
    pos = 2
    try:
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                return None  # EOI before any scan
            if pos + 4 > len(payload):
                return None
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            seg = payload[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT (possibly several tables)
                i = 0
                while i < len(seg):
                    prec, tid = seg[i] >> 4, seg[i] & 0x0F
                    i += 1
                    if prec == 0:
                        qtables[tid] = list(seg[i : i + 64])
                        i += 64
                    else:
                        qtables[tid] = [
                            struct.unpack_from(">H", seg, i + 2 * k)[0] for k in range(64)
                        ]
                        i += 128
            elif marker == 0xC4:  # DHT (possibly several tables)
                i = 0
                while i + 17 <= len(seg):
                    cls, tid = seg[i] >> 4, seg[i] & 0x0F
                    bits = list(seg[i + 1 : i + 17])
                    n = sum(bits)
                    vals = list(seg[i + 17 : i + 17 + n])
                    if len(vals) < n:
                        return None
                    (dc_tables if cls == 0 else ac_tables)[tid] = _decode_table(bits, vals)
                    i += 17 + n
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", seg, 0)
            elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
                precision = seg[0]
                if precision != 8:
                    return None
                height, width = struct.unpack_from(">HH", seg, 1)
                ncomp = seg[5]
                comps = []
                for c in range(ncomp):
                    cid = seg[6 + c * 3]
                    hv = seg[7 + c * 3]
                    comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + c * 3]))
                frame = (width, height, comps)
            elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return None  # progressive / arithmetic / hierarchical
            elif marker == 0xDA:  # SOS -> entropy-coded data follows
                if frame is None:
                    return None
                width, height, comps = frame
                if not width or not height or width * height > MAX_DECODE_PIXELS:
                    return None
                ns = seg[0]
                scan = []
                by_id = {c[0]: c for c in comps}
                for c in range(ns):
                    cid = seg[1 + c * 2]
                    tt = seg[2 + c * 2]
                    if cid not in by_id:
                        return None
                    _, ch_, cv, tq = by_id[cid]
                    if not (1 <= ch_ <= 2 and 1 <= cv <= 2):
                        return None
                    scan.append((cid, ch_, cv, tq, tt >> 4, tt & 0x0F))
                hmax = max(s[1] for s in scan)
                vmax = max(s[2] for s in scan)
                mcus_x = -(-width // (8 * hmax))
                mcus_y = -(-height // (8 * vmax))
                planes = {
                    cid: np.zeros((mcus_y * cv * 8, mcus_x * ch_ * 8), dtype=np.float64)
                    for cid, ch_, cv, _tq, _td, _ta in scan
                }
                preds = {cid: 0 for cid, *_ in scan}
                reader = _BitReader(payload, pos + 2 + seglen)
                idct_m = np.asarray(_dct_m())
                mcu_idx = 0
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                            if reader.align_to_marker() is None:
                                return None
                            preds = {cid: 0 for cid, *_ in scan}
                        for cid, ch_, cv, tq, td, ta in scan:
                            q = qtables.get(tq)
                            dc_t = dc_tables.get(td)
                            ac_t = ac_tables.get(ta)
                            if q is None or dc_t is None or ac_t is None:
                                return None
                            for by in range(cv):
                                for bx in range(ch_):
                                    block, preds[cid] = _decode_block(
                                        reader, dc_t, ac_t, preds[cid], q, idct_m
                                    )
                                    py = (my * cv + by) * 8
                                    px = (mx * ch_ + bx) * 8
                                    planes[cid][py : py + 8, px : px + 8] = block
                        mcu_idx += 1
                # luma = the FIRST frame component (Y by JFIF convention)
                ycid, ych, ycv = scan[0][0], scan[0][1], scan[0][2]
                yw = -(-width * ych // hmax)
                yh = -(-height * ycv // vmax)
                # crop the component plane to its true size, then map
                # full-resolution pixels onto it (identity when Y is
                # full-resolution, i.e. always for Y as max-sampled)
                plane = planes[ycid][:yh, :yw]
                out = np.clip(np.round(plane + 128), 0, 255).astype(np.int64)
                if yw != width or yh != height:
                    xs = (np.arange(width) * yw) // width
                    ys = (np.arange(height) * yh) // height
                    out = out[ys][:, xs]
                return out[:height, :width].tolist()
            pos += 2 + seglen
    except (EOFError, ValueError, IndexError, struct.error):
        return None
    return None
