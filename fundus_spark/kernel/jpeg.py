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
# code). DC: 12 categories at 4 bits. AC: the 176 legal symbols —
# EOB/EOBn (r<<4 for r 0-14, progressive end-of-band runs), ZRL, and
# run 0-15 x size 1-10 — at 8 bits (176/256 < 1).
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = (
    [r << 4 for r in range(15)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
)


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


class _ScanEncoder:
    """One entropy-coded scan: bit writing + RSTn emission + the
    progressive EOB-run/pending-correction-bit buffer (T.81 G.1.2)."""

    def __init__(self, dc_codes, ac_codes) -> None:
        self.dc_codes = dc_codes
        self.ac_codes = ac_codes
        self.body = bytearray()
        self.writer = _BitWriter()
        self.rst = 0
        self.eobrun = 0
        self.pending: List[int] = []

    def sym_ac(self, sym: int) -> None:
        code, length = self.ac_codes[sym]
        self.writer.write(code, length)

    def flush_eobrun(self) -> None:
        if self.eobrun:
            n = self.eobrun.bit_length() - 1
            self.sym_ac(n << 4)
            if n:
                self.writer.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.pending:
            self.writer.write(b, 1)
        self.pending = []

    def bump_eobrun(self, correction_bits) -> None:
        self.eobrun += 1
        self.pending.extend(correction_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()

    def restart(self) -> None:
        self.flush_eobrun()
        self.writer.flush()
        self.body += self.writer.buf
        self.writer = _BitWriter()
        self.body += bytes([0xFF, 0xD0 + (self.rst % 8)])
        self.rst += 1

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.writer.flush()
        self.body += self.writer.buf
        return bytes(self.body)

    # ---- per-block emitters ----

    def dc_first(self, dc_shifted: int, pred: int) -> int:
        diff = dc_shifted - pred
        t = _category(diff)
        code, length = self.dc_codes[t]
        self.writer.write(code, length)
        if t:
            self.writer.write(_value_bits(diff, t), t)
        return dc_shifted

    def dc_refine(self, dc: int, al: int) -> None:
        self.writer.write((dc >> al) & 1, 1)

    def ac_first(self, row, ss: int, se: int, al: int) -> None:
        shifted = [int(row[k]) // (1 << al) if row[k] >= 0 else -((-int(row[k])) >> al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(shifted) if v]
        if not nz:
            self.bump_eobrun([])
            return
        self.flush_eobrun()
        r = 0
        for i in range(nz[-1] + 1):
            v = shifted[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                self.sym_ac(0xF0)  # ZRL
                r -= 16
            t = _category(v)
            self.sym_ac((r << 4) | t)
            self.writer.write(_value_bits(v, t), t)
            r = 0
        if nz[-1] != se - ss:
            self.bump_eobrun([])

    def ac_refine(self, row, ss: int, se: int, al: int) -> None:
        absvals = [abs(int(row[k])) >> al for k in range(ss, se + 1)]
        eob = -1
        for i, v in enumerate(absvals):
            if v == 1:
                eob = i
        r = 0
        br: List[int] = []
        emitted = False
        for i, temp in enumerate(absvals):
            if temp == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                self.flush_eobrun()
                self.sym_ac(0xF0)
                r -= 16
                for b in br:
                    self.writer.write(b, 1)
                br = []
            if temp > 1:  # already significant -> buffered correction bit
                br.append(temp & 1)
                continue
            # newly significant
            self.flush_eobrun()
            self.sym_ac((r << 4) | 1)
            self.writer.write(1 if row[ss + i] > 0 else 0, 1)
            for b in br:
                self.writer.write(b, 1)
            br = []
            r = 0
            emitted = True
        if r > 0 or br:
            self.bump_eobrun(br)
        elif not emitted and not absvals:
            self.bump_eobrun([])


def _arith_shift(v: int, al: int) -> int:
    """T.81 DC point transform: arithmetic right shift (floor)."""
    return v >> al


def encode_jpeg(
    y_plane,
    width: int,
    height: int,
    gray: bool = False,
    subsampling: Tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    progressive: bool = False,
    successive: bool = False,
) -> bytes:
    """Encode a (height, width) luma grid as a JFIF stream.

    Color output carries neutral chroma (Cb = Cr = 128) — gray pixels
    through a real 3-component YCbCr scan; ``subsampling`` (1, 1) is
    4:4:4, (2, 2) is 4:2:0. ``restart_interval`` > 0 emits DRI + RSTn
    markers (decoder resilience surface).

    ``progressive=True`` emits an SOF2 multi-scan stream: one
    interleaved DC scan, then one AC scan (Ss=1..63, non-interleaved)
    per component — spectral selection, the common progressive layout.
    ``successive=True`` additionally transmits both bands at reduced
    precision first (Al=1) and then a refinement scan each (Ah=1,
    Al=0) — the full successive-approximation protocol incl. EOB runs
    and correction bits. The coefficients transmitted are IDENTICAL to
    the baseline stream's, so baseline and progressive decodes of the
    same grid are pixel-identical — the property the tests pin."""
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

    # one vectorized DCT+quantize pass per component plane; the scan
    # loops below only walk precomputed coefficient rows
    coeff_planes = {cid: _fdct_quant_all(planes[cid], _FLAT_Q) for cid, _, _, _ in comps}

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sos_header(scan_comps, ss, se, ah, al) -> bytes:
        hdr = bytes([len(scan_comps)])
        for cid in scan_comps:
            hdr += bytes([cid, 0x00])  # DC table 0, AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, hdr)

    def interleaved_blocks():
        """(cid, bi, bj, is_restart_boundary) in MCU order."""
        mcu_idx = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                boundary = bool(restart_interval) and mcu_idx and mcu_idx % restart_interval == 0
                first = True
                for cid, ch_, cv, _tq in comps:
                    for by in range(cv):
                        for bx in range(ch_):
                            yield cid, my * cv + by, mx * ch_ + bx, boundary and first
                            first = False
                mcu_idx += 1

    scans: List[bytes] = []
    if not progressive:
        enc = _ScanEncoder(dc_codes, ac_codes)
        preds = {cid: 0 for cid, _, _, _ in comps}
        for cid, bi, bj, at_rst in interleaved_blocks():
            if at_rst:
                enc.restart()
                preds = {cid_: 0 for cid_, _, _, _ in comps}
            preds[cid] = _encode_block(coeff_planes[cid][bi, bj], preds[cid], enc.writer, dc_codes, ac_codes)
        scans.append(sos_header([c[0] for c in comps], 0, 63, 0, 0) + enc.finish())
    else:
        al1 = 1 if successive else 0
        # DC first scan (interleaved, Al=al1)
        enc = _ScanEncoder(dc_codes, ac_codes)
        preds = {cid: 0 for cid, _, _, _ in comps}
        for cid, bi, bj, at_rst in interleaved_blocks():
            if at_rst:
                enc.restart()
                preds = {cid_: 0 for cid_, _, _, _ in comps}
            preds[cid] = enc.dc_first(_arith_shift(int(coeff_planes[cid][bi, bj][0]), al1), preds[cid])
        scans.append(sos_header([c[0] for c in comps], 0, 0, 0, al1) + enc.finish())
        if successive:
            # DC refinement scan (interleaved, Ah=1, Al=0): raw bits
            enc = _ScanEncoder(dc_codes, ac_codes)
            for cid, bi, bj, at_rst in interleaved_blocks():
                if at_rst:
                    enc.restart()
                enc.dc_refine(int(coeff_planes[cid][bi, bj][0]), 0)
            scans.append(sos_header([c[0] for c in comps], 0, 0, 1, 0) + enc.finish())
        # per-component AC scans over the component's OWN block grid
        for cid, ch_, cv, _tq in comps:
            cw = -(-width * ch_ // hmax)
            chh = -(-height * cv // vmax)
            nbx, nby = -(-cw // 8), -(-chh // 8)

            def component_blocks():
                unit = 0
                for bi in range(nby):
                    for bj in range(nbx):
                        yield bi, bj, bool(restart_interval) and unit and unit % restart_interval == 0
                        unit += 1

            enc = _ScanEncoder(dc_codes, ac_codes)
            for bi, bj, at_rst in component_blocks():
                if at_rst:
                    enc.restart()
                enc.ac_first(coeff_planes[cid][bi, bj], 1, 63, al1)
            scans.append(sos_header([cid], 1, 63, 0, al1) + enc.finish())
            if successive:
                enc = _ScanEncoder(dc_codes, ac_codes)
                for bi, bj, at_rst in component_blocks():
                    if at_rst:
                        enc.restart()
                    enc.ac_refine(coeff_planes[cid][bi, bj], 1, 63, 0)
                scans.append(sos_header([cid], 1, 63, 1, 0) + enc.finish())

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes([0]) + bytes(_FLAT_Q))  # DQT, table 0, 8-bit
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, ch_, cv, tq in comps:
        sof += bytes([cid, (ch_ << 4) | cv, tq])
    out += seg(0xC2 if progressive else 0xC0, sof)
    dht = bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    out += seg(0xC4, dht)  # one DHT with both classes, id 0
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    for scan_bytes in scans:
        out += scan_bytes
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def build_jpeg(
    width: int,
    height: int,
    seed: Optional[int] = None,
    gray: bool = False,
    subsampling: Tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    progressive: bool = False,
    successive: bool = False,
) -> bytes:
    """Valid JFIF (baseline SOF0 or progressive SOF2 — see
    :func:`encode_jpeg`) whose pixel (x, y) carries the BLOCK-constant
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
        grid,
        width,
        height,
        gray=gray,
        subsampling=subsampling,
        restart_interval=restart_interval,
        progressive=progressive,
        successive=successive,
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


def _decode_block_full(reader, dc_table, ac_table, pred: int, out_row) -> int:
    """Baseline (sequential) block decode into a 64-slot zigzag
    coefficient row (raw quantized ints — dequant + IDCT happen once,
    vectorized, at reconstruction)."""
    t = _huff_decode(reader, dc_table)
    diff = _extend(reader.bits(t), t) if t else 0
    dc = pred + diff
    out_row[0] = dc
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
        out_row[k] = _extend(reader.bits(size), size)
        k += 1
    return dc


class _ScanState:
    """Progressive decode state retained ACROSS scans: per-component
    zigzag coefficient stores (filled in by successive spectral bands /
    approximation bits) plus the AC end-of-band run counter."""

    __slots__ = ("coef", "eobrun")

    def __init__(self) -> None:
        self.coef = {}
        self.eobrun = 0


def _ac_first(reader, ac_table, row, ss, se, al, state) -> None:
    if state.eobrun > 0:
        state.eobrun -= 1
        return
    k = ss
    while k <= se:
        sym = _huff_decode(reader, ac_table)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r < 15:
                state.eobrun = (1 << r) - 1
                if r:
                    state.eobrun += reader.bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        row[k] = _extend(reader.bits(s), s) << al
        k += 1


def _ac_refine(reader, ac_table, row, ss, se, al, state) -> None:
    """Successive-approximation AC refinement (T.81 G.1.2.3): already-
    significant coefficients receive one correction bit when crossed;
    newly-significant ones arrive as run/1 symbols with a sign bit;
    EOB runs carry the trailing correction bits. Python ints are
    two's-complement-infinite, so the & / |= bit tests on negative
    coefficients behave exactly like the C reference arithmetic."""
    p1 = 1 << al
    k = ss
    if state.eobrun == 0:
        while k <= se:
            sym = _huff_decode(reader, ac_table)
            r, s = sym >> 4, sym & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    state.eobrun = 1 << r
                    if r:
                        state.eobrun += reader.bits(r)
                    break  # fall through to the trailing-correction loop
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad refinement symbol")
                val = p1 if reader.bit() else -p1
            while k <= se:
                if row[k] != 0:
                    if reader.bit():
                        if (row[k] & p1) == 0:
                            row[k] += p1 if row[k] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                row[k] = val
            k += 1
    if state.eobrun > 0:
        while k <= se:
            if row[k] != 0:
                if reader.bit():
                    if (row[k] & p1) == 0:
                        row[k] += p1 if row[k] >= 0 else -p1
            k += 1
        state.eobrun -= 1


def parse_jpeg_header(payload: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the SOF segment of any DCT JPEG flavor, or
    None — header geometry parses even for streams the full decoder
    refuses (arithmetic-coded, 12-bit), matching the other formats'
    header-first contract in :func:`.media.parse_media_header`."""
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
    """Full DCT decode -> the Y (luma) plane as a top-left-origin grid,
    cropped to the SOF dimensions. Supports baseline sequential (SOF0,
    SOF1) AND progressive (SOF2) streams — spectral selection,
    successive approximation (DC + AC refinement scans, EOB runs), 1-
    or 3-component frames, arbitrary DHT Huffman tables, 8- or 16-bit
    DQT precision, sampling factors 1-2 per axis (4:4:4 / 4:2:0 /
    4:2:2), restart markers, and multi-segment DQT/DHT. All scans
    accumulate into per-component coefficient stores; dequantization +
    IDCT run ONCE, vectorized, at EOI. Returns None for arithmetic-
    coded / hierarchical / 12-bit streams, dimension bombs
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
    frame = None  # (width, height, [(cid, h, v, tq)], progressive)
    state = _ScanState()
    preds: Dict[int, int] = {}
    saw_scan = False
    pos = 2
    try:
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:  # EOI -> reconstruct
                break
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
            elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
                precision = seg[0]
                if precision != 8:
                    return None
                height, width = struct.unpack_from(">HH", seg, 1)
                if not width or not height or width * height > MAX_DECODE_PIXELS:
                    return None
                ncomp = seg[5]
                comps = []
                for c in range(ncomp):
                    cid = seg[6 + c * 3]
                    hv = seg[7 + c * 3]
                    ch_, cv = hv >> 4, hv & 0x0F
                    if not (1 <= ch_ <= 2 and 1 <= cv <= 2):
                        return None
                    comps.append((cid, ch_, cv, seg[8 + c * 3]))
                frame = (width, height, comps, marker == 0xC2)
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-width // (8 * hmax))
                mcus_y = -(-height // (8 * vmax))
                for cid, ch_, cv, _tq in comps:
                    state.coef[cid] = np.zeros((mcus_y * cv, mcus_x * ch_, 64), dtype=np.int64)
                preds = {cid: 0 for cid, *_ in comps}
            elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return None  # lossless / arithmetic / hierarchical
            elif marker == 0xDA:  # SOS: decode one scan
                if frame is None:
                    return None
                width, height, comps, progressive = frame
                by_id = {c[0]: c for c in comps}
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-width // (8 * hmax))
                mcus_y = -(-height // (8 * vmax))
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cid = seg[1 + c * 2]
                    tt = seg[2 + c * 2]
                    if cid not in by_id:
                        return None
                    _, ch_, cv, tq = by_id[cid]
                    scan.append((cid, ch_, cv, tq, tt >> 4, tt & 0x0F))
                ss, se = seg[1 + ns * 2], seg[2 + ns * 2]
                ahal = seg[3 + ns * 2]
                ah, al = ahal >> 4, ahal & 0x0F
                if not progressive:
                    ss, se, ah, al = 0, 63, 0, 0
                if ss > se or se > 63 or (ss == 0 and se != 0 and progressive):
                    return None
                preds = {cid: 0 for cid, *_ in comps}
                state.eobrun = 0
                reader = _BitReader(payload, pos + 2 + seglen)

                def do_block(cid, bi, bj, td, ta):
                    row = state.coef[cid][bi, bj]
                    if not progressive:
                        dc_t, ac_t = dc_tables.get(td), ac_tables.get(ta)
                        if dc_t is None or ac_t is None:
                            raise ValueError("missing table")
                        preds[cid] = _decode_block_full(reader, dc_t, ac_t, preds[cid], row)
                    elif ss == 0 and ah == 0:  # DC first
                        dc_t = dc_tables.get(td)
                        if dc_t is None:
                            raise ValueError("missing DC table")
                        t = _huff_decode(reader, dc_t)
                        diff = _extend(reader.bits(t), t) if t else 0
                        preds[cid] += diff
                        row[0] = preds[cid] << al
                    elif ss == 0:  # DC refinement: one raw bit
                        if reader.bit():
                            row[0] |= 1 << al
                    elif ah == 0:  # AC first
                        ac_t = ac_tables.get(ta)
                        if ac_t is None:
                            raise ValueError("missing AC table")
                        _ac_first(reader, ac_t, row, ss, se, al, state)
                    else:  # AC refinement
                        ac_t = ac_tables.get(ta)
                        if ac_t is None:
                            raise ValueError("missing AC table")
                        _ac_refine(reader, ac_t, row, ss, se, al, state)

                def do_restart():
                    if reader.align_to_marker() is None:
                        raise ValueError("missing restart marker")
                    for c in preds:
                        preds[c] = 0
                    state.eobrun = 0

                if ns == 1 and progressive and ss > 0:
                    # non-interleaved AC scan: covers the component's
                    # OWN block grid (not MCU-padded)
                    cid, ch_, cv, tq, td, ta = scan[0]
                    cw = -(-width * ch_ // hmax)
                    chh = -(-height * cv // vmax)
                    nbx, nby = -(-cw // 8), -(-chh // 8)
                    unit = 0
                    for bi in range(nby):
                        for bj in range(nbx):
                            if restart_interval and unit and unit % restart_interval == 0:
                                do_restart()
                            do_block(cid, bi, bj, td, ta)
                            unit += 1
                else:
                    mcu_idx = 0
                    for my in range(mcus_y):
                        for mx in range(mcus_x):
                            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                                do_restart()
                            for cid, ch_, cv, _tq, td, ta in scan:
                                for by in range(cv):
                                    for bx in range(ch_):
                                        do_block(cid, my * cv + by, mx * ch_ + bx, td, ta)
                            mcu_idx += 1
                saw_scan = True
                pos = reader.pos
                continue
            pos += 2 + seglen
        if frame is None or not saw_scan:
            return None
        # ---- reconstruction: dequant + IDCT once, vectorized ----
        width, height, comps, _prog = frame
        ycid, ych, ycv, ytq = comps[0]
        q = qtables.get(ytq)
        if q is None:
            return None
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        zz_index = np.array([r * 8 + c for r, c in _ZIGZAG])
        m = np.asarray(_dct_m())
        coef = state.coef[ycid].astype(np.float64) * np.asarray(q, dtype=np.float64)
        nby, nbx = coef.shape[0], coef.shape[1]
        natural = np.zeros((nby, nbx, 64))
        natural[:, :, zz_index] = coef
        s_mat = natural.reshape(nby, nbx, 8, 8)
        blocks = np.einsum("ux,ijuv,vy->ijxy", m, s_mat, m)
        plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        yw = -(-width * ych // hmax)
        yh = -(-height * ycv // vmax)
        out = np.clip(np.round(plane[:yh, :yw] + 128), 0, 255).astype(np.int64)
        if yw != width or yh != height:
            xs = (np.arange(width) * yw) // width
            ys = (np.arange(height) * yh) // height
            out = out[ys][:, xs]
        return out[:height, :width].tolist()
    except (EOFError, ValueError, IndexError, struct.error):
        return None
    return None
