"""Pure-numpy baseline JPEG codec (no image library in the container).

Closes the reference-parity asterisk on A1/I1: the reference ingests
tf_flowers JPEGs (`01. Ingest.py:35` — `pathGlobFilter "*.jpg"`); this
engine previously decoded PNG only. Encoder and decoder here implement
baseline sequential DCT JPEG (ITU T.81) with the spec's Annex K example
tables — enough to generate deterministic JPEG fixtures and decode real
baseline files (grayscale or YCbCr, any sampling factors, restart
markers). Progressive/arithmetic/12-bit variants still raise
NotImplementedError — swapping in PIL on a real cluster replaces only
`decode_jpeg_gray`, not the Spark plumbing above it.

Everything here runs inside mapInPandas batches (or fixture generation) —
never on the driver against real data.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Spec constants (ITU T.81 Annex K — public)
# --------------------------------------------------------------------------
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

STD_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

# (bits[1..16], values) for the Annex K luminance Huffman tables
STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
STD_DC_VALS = list(range(12))
STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: block_dct = C @ X @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (0.5 * (1 / np.sqrt(2) if _u == 0 else 1.0)
                      * np.cos((2 * _x + 1) * _u * np.pi / 16))


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical Huffman construction."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for bit-serial decoding."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


def _scaled_qt(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex K luminance table."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((STD_QT_LUMA * s + 50) // 100, 1, 255)


# --------------------------------------------------------------------------
# Encoder (grayscale baseline — the fixture generator)
# --------------------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def encode_jpeg_gray(px: np.ndarray, quality: int = 75) -> bytes:
    """Encode a (h, w) uint8 array as a baseline grayscale JPEG with the
    spec's example Huffman tables and an IJG-quality-scaled quant table."""
    h, w = px.shape
    qt = _scaled_qt(quality)  # natural order; zigzag only at serialization
    qt2d = qt.reshape(8, 8)
    dc_codes = _canonical_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _canonical_codes(STD_AC_BITS, STD_AC_VALS)

    # pad to 8x8 blocks by edge replication
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(px.astype(np.float64) - 128.0, ((0, ph - h), (0, pw - w)), mode="edge")

    bw = _BitWriter()
    dc_pred = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8]
            coeffs = _C @ block @ _C.T
            q = np.round(coeffs / qt2d).astype(int)
            zz = q.flatten()[ZIGZAG]
            # DC
            diff = int(zz[0]) - dc_pred
            dc_pred = int(zz[0])
            cat = _category(diff)
            code, ln = dc_codes[cat]
            bw.write(code, ln)
            if cat:
                bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
            # AC
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                cat = _category(v)
                code, ln = ac_codes[(run << 4) | cat]
                bw.write(code, ln)
                bw.write(v if v > 0 else v + (1 << cat) - 1, cat)
                run = 0
            if run:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    # DQT entries are zigzag-ordered per spec (decoders dequantize the
    # zigzag-ordered coefficient vector directly against them)
    dqt = seg(0xFFDB, b"\x00" + bytes(int(qt[ZIGZAG[i]]) for i in range(64)))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xFFC4, b"\x00" + bytes(STD_DC_BITS) + bytes(STD_DC_VALS)) + seg(
        0xFFC4, b"\x10" + bytes(STD_AC_BITS) + bytes(STD_AC_VALS)
    )
    sos = seg(0xFFDA, b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"


# --------------------------------------------------------------------------
# Decoder (baseline sequential: gray or YCbCr, any sampling, restarts)
# --------------------------------------------------------------------------
class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker (RST handled by caller via sync; EOI = done):
                    # un-consume and feed 1-padding like a truncated stream
                    self.pos -= 1
                    b = 0xFF  # caller stops via marker detection
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    return
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 1  # padding past end
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def at_marker(self) -> bool:
        return (
            self.nbits == 0
            and self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] != 0x00
        )

    def sync_to_rst(self) -> None:
        """Skip to just past the next RSTn marker and reset bit state."""
        self.acc = self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: huffman code not found")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def jpeg_size(content: bytes) -> tuple[int, int]:
    """Parse (width, height) from the SOF segment — header-only metadata
    decode, the JPEG analogue of png_size."""
    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("not a JPEG: bad marker stream")
        marker = content[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2):
            h, w = struct.unpack(">HH", content[pos + 5 : pos + 9])
            return int(w), int(h)
        if marker == 0xD9 or marker == 0xDA:
            break
        (length,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        pos += 2 + length
    raise ValueError("not a JPEG: no SOF segment")


def decode_jpeg_gray(content: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w) uint8 grayscale. For color images
    the returned plane is the Y (luma) channel — exactly what the
    downstream perceptual-hash/feature ops consume. Supports multiple
    quant/huffman tables, arbitrary sampling factors, and restart
    intervals; rejects progressive (SOF2) and arithmetic coding."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}  # (class, id)
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad marker stream")
        marker = content[pos + 1]
        (seg_len,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        payload = content[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                prec, tid = payload[p] >> 4, payload[p] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables need a real codec")
                qts[tid] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8).astype(
                    np.float64
                )
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            comps = []
            for i in range(ncomp):
                cid, samp, qid = payload[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "qid": qid}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG is supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tclass, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                huff[(tclass, tid)] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            scan_tables = {}
            for i in range(ns):
                cid, tsel = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_tables[cid] = (tsel >> 4, tsel & 0x0F)
            data_start = pos + 2 + seg_len
            return _decode_scan(
                content, data_start, h, w, comps, qts, huff, scan_tables, restart_interval
            )
        elif marker == 0xD9:
            break
        pos += 2 + seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(content, data_start, h, w, comps, qts, huff, scan_tables, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    }
    br = _BitReader(content[data_start:])
    dc_pred = {c["id"]: 0 for c in comps}
    inv_zz = ZIGZAG  # natural position of k-th zigzag coefficient
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_to_rst()
                dc_pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_tab = huff[(0, scan_tables[c["id"]][0])]
                ac_tab = huff[(1, scan_tables[c["id"]][1])]
                qt = qts[c["qid"]]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz = np.zeros(64)
                        cat = _huff_decode(br, dc_tab)
                        diff = _extend(br.receive(cat), cat) if cat else 0
                        dc_pred[c["id"]] += diff
                        zz[0] = dc_pred[c["id"]]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            cat = sym & 0x0F
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.receive(cat), cat)
                            k += 1
                        coeffs = np.zeros(64)
                        coeffs[inv_zz] = zz * qt
                        block = _C.T @ coeffs.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # luma plane, upsampled to full res if subsampled, cropped to (h, w)
    luma = comps[0]
    plane = planes[luma["id"]]
    if luma["h"] < hmax or luma["v"] < vmax:
        plane = np.repeat(np.repeat(plane, vmax // luma["v"], 0), hmax // luma["h"], 1)
    return np.clip(np.round(plane[:h, :w]), 0, 255).astype(np.uint8)
