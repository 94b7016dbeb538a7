"""From-scratch H.264 (ITU-T Rec. H.264 / ISO 14496-10) sequence
parameter set codec — the pure-bit-math half of the video modality.

Like the round-6 MP3 frame-header walk, this extracts REAL stream
metadata (coded width/height, profile, level) without any codec
library: an SPS is a few dozen Exp-Golomb-coded syntax elements, and
the picture dimensions are closed-form in ``pic_width_in_mbs_minus1``,
``pic_height_in_map_units_minus1`` and the frame-cropping offsets
(spec 7.4.2.1.1).  Actual slice/macroblock *decode* stays honestly
refused (``operators/multimodal.py``) — CABAC/CAVLC residual decoding
is genuinely codec-library territory.

The builder emits a High-profile monochrome SPS (``profile_idc=100``,
``chroma_format_idc=0``): with 4:0:0 the crop units are 1 luma sample
in both axes (CropUnitX=1, CropUnitY=2-frame_mbs_only_flag), so ANY
width/height — odd ones included — is exactly expressible, which keeps
the synthetic-corpus dimension oracle closed-form. (4:2:0 can only
crop in 2-sample steps horizontally.)

Reference parity note: fundus has no video path at all
(``src/fundus/parser/utility.py`` stops at <img> metadata); this
serves the training-data media profiler the reference lacks.
"""

from __future__ import annotations

from typing import Optional

# profiles whose SPS carries the chroma/bit-depth/scaling-matrix block
# (spec 7.3.2.1.1 "if( profile_idc == 100 || ... )")
_HIGH_PROFILES = frozenset({100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135})


def strip_emulation_prevention(data: bytes) -> bytes:
    """NAL byte stream -> RBSP: drop the 0x03 in every 00 00 03 run."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue  # emulation_prevention_three_byte
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def insert_emulation_prevention(rbsp: bytes) -> bytes:
    """RBSP -> NAL byte stream: escape 00 00 0x with 00 00 03 0x."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    """MSB-first bit reader with Exp-Golomb (spec 9.1) helpers."""

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0  # bit position

    def u(self, n: int) -> Optional[int]:
        end = self._pos + n
        if end > len(self._data) * 8:
            return None
        val = 0
        for i in range(self._pos, end):
            val = (val << 1) | ((self._data[i >> 3] >> (7 - (i & 7))) & 1)
        self._pos = end
        return val

    def ue(self) -> Optional[int]:
        zeros = 0
        total = len(self._data) * 8
        while self._pos < total:
            if (self._data[self._pos >> 3] >> (7 - (self._pos & 7))) & 1:
                break
            zeros += 1
            self._pos += 1
            if zeros > 31:  # no sane SPS element needs more
                return None
        else:
            return None
        self._pos += 1  # the terminating 1 bit
        if zeros == 0:
            return 0
        rest = self.u(zeros)
        if rest is None:
            return None
        return (1 << zeros) - 1 + rest

    def se(self) -> Optional[int]:
        k = self.ue()
        if k is None:
            return None
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitWriter:
    def __init__(self):
        self._bits = []

    def u(self, val: int, n: int) -> "_BitWriter":
        for i in range(n - 1, -1, -1):
            self._bits.append((val >> i) & 1)
        return self

    def ue(self, val: int) -> "_BitWriter":
        code = val + 1
        n = code.bit_length()
        return self.u(0, n - 1).u(code, n)

    def rbsp_trailing(self) -> bytes:
        self._bits.append(1)  # rbsp_stop_one_bit
        while len(self._bits) % 8:
            self._bits.append(0)
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            byte = 0
            for b in self._bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def _skip_scaling_list(r: _BitReader, size: int) -> bool:
    """scaling_list() (spec 7.3.2.1.1.1): only the delta_scale stream
    matters for advancing the cursor."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            delta = r.se()
            if delta is None:
                return False
            nxt = (last + delta + 256) % 256
        if nxt != 0:
            last = nxt
    return True


def parse_sps(nal: bytes) -> Optional[dict]:
    """Parse an SPS NAL unit (header byte included, emulation bytes
    in place) to ``{"profile_idc", "level_idc", "width", "height",
    "frame_mbs_only"}``.  Returns None on any malformed / truncated
    stream — refuse, never misdecode."""
    if len(nal) < 4 or nal[0] & 0x1F != 7 or nal[0] & 0x80:
        return None
    r = _BitReader(strip_emulation_prevention(nal[1:]))
    profile_idc = r.u(8)
    r.u(8)  # constraint_set flags + reserved_zero_2bits
    level_idc = r.u(8)
    if r.ue() is None or profile_idc is None or level_idc is None:  # sps_id
        return None
    chroma_format_idc, separate_colour_plane = 1, 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc is None or chroma_format_idc > 3:
            return None
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        if r.ue() is None or r.ue() is None:  # bit_depth_{luma,chroma}_minus8
            return None
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        scaling = r.u(1)
        if scaling:
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                present = r.u(1)
                if present is None:
                    return None
                if present and not _skip_scaling_list(r, 16 if i < 6 else 64):
                    return None
    if r.ue() is None:  # log2_max_frame_num_minus4
        return None
    poc_type = r.ue()
    if poc_type == 0:
        if r.ue() is None:  # log2_max_pic_order_cnt_lsb_minus4
            return None
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        if r.se() is None or r.se() is None:
            return None
        n_cycle = r.ue()
        if n_cycle is None:
            return None
        for _ in range(n_cycle):
            if r.se() is None:
                return None
    elif poc_type is None:
        return None
    if r.ue() is None:  # max_num_ref_frames
        return None
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pw = r.ue()
    ph = r.ue()
    fmof = r.u(1)
    if pw is None or ph is None or fmof is None:
        return None
    if not fmof:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    cropping = r.u(1)
    crop_l = crop_r = crop_t = crop_b = 0
    if cropping:
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
        if crop_b is None or crop_l is None or crop_r is None or crop_t is None:
            return None
    elif cropping is None:
        return None
    # frame cropping -> sample dimensions (spec 7.4.2.1.1 / Table 6-1)
    chroma_array_type = 0 if separate_colour_plane else chroma_format_idc
    if chroma_array_type == 0:
        crop_x, crop_y = 1, 2 - fmof
    else:
        sub_w = 2 if chroma_array_type in (1, 2) else 1
        sub_h = 2 if chroma_array_type == 1 else 1
        crop_x, crop_y = sub_w, sub_h * (2 - fmof)
    width = (pw + 1) * 16 - crop_x * (crop_l + crop_r)
    height = (2 - fmof) * (ph + 1) * 16 - crop_y * (crop_t + crop_b)
    if width <= 0 or height <= 0:
        return None
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
        "frame_mbs_only": fmof,
    }


def build_sps(width: int, height: int, level_idc: int = 10) -> bytes:
    """Minimal High-profile MONOCHROME SPS NAL encoding exactly
    ``width x height`` (crop units are 1x1 under 4:0:0, so odd
    dimensions round-trip; see module docstring).  ``pic_order_cnt_type
    = 2`` keeps the POC block empty."""
    if width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive")
    mbs_w = -(-width // 16)
    mbs_h = -(-height // 16)
    crop_r = mbs_w * 16 - width
    crop_b = mbs_h * 16 - height
    w = _BitWriter()
    w.u(100, 8)  # profile_idc = High
    w.u(0, 8)  # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)  # sps_id
    w.ue(0)  # chroma_format_idc = 0 (monochrome)
    w.ue(0).ue(0)  # bit depths (8-bit)
    w.u(0, 1)  # qpprime_y_zero_transform_bypass
    w.u(0, 1)  # seq_scaling_matrix_present
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type = 2 (no further POC syntax)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num
    w.ue(mbs_w - 1)
    w.ue(mbs_h - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1).ue(0).ue(crop_r).ue(0).ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present
    return b"\x67" + insert_emulation_prevention(w.rbsp_trailing())


def build_pps() -> bytes:
    """Minimal syntactically-valid PPS NAL (entropy CAVLC, one slice
    group) so the synthetic avcC carries a complete parameter set."""
    w = _BitWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(0, 1)  # entropy_coding_mode_flag = CAVLC
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0).ue(0)  # num_ref_idx_l{0,1}_default_active_minus1
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 2)  # weighted_bipred_idc
    w.ue(0)  # pic_init_qp_minus26 (se(0) == ue(0) bit pattern)
    w.ue(0)  # pic_init_qs_minus26
    w.ue(0)  # chroma_qp_index_offset
    w.u(0, 1)  # deblocking_filter_control_present
    w.u(0, 1)  # constrained_intra_pred
    w.u(0, 1)  # redundant_pic_cnt_present
    return b"\x68" + insert_emulation_prevention(w.rbsp_trailing())
