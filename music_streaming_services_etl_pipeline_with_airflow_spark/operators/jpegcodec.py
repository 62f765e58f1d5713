"""REAL baseline JPEG codec — pure Python + numpy, zero codec libraries.

Scope: 8-bit grayscale, baseline sequential DCT (SOF0), the interchange
format's standard Huffman and luminance quantization tables (ITU-T T.81
Annex K — public spec constants), no subsampling, no restart markers.
This is the strict-subset philosophy of the PNG codec next door
(multimodal.png_decode_gray): the HARD parts — bit-level Huffman entropy
coding with byte stuffing, DC prediction, run/size AC coding with
ZRL/EOB, zigzag, quantization, and the DCT pair — are all real; the
branches a general decoder adds (chroma planes, progressive scans,
restart intervals) are rejected, never misdecoded.

Exactness contract: JPEG is lossy pixel-wise (quantization), but the
ENTROPY LAYER is exact — ``decode_gray_coefficients(encode_gray_jpeg(x))``
returns bit-identical quantized DCT coefficients to what the encoder
emitted. That is the property the round-trip query pins with a value-hash
oracle; pixel fidelity is additionally pinned in pytest via a PSNR floor.

Reference for parity: the reference pipeline has no media handling at
all (SURVEY §2 — CSV/RDS rows only); this module belongs to the
multimodal extension surface the engine adds for training-data work.
"""

from __future__ import annotations

import struct

import numpy as np

# --- ITU-T T.81 Annex K public constants -----------------------------------

# K.1 luminance quantization table (quality 50 base), in natural order
QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# K.3.1 — DC luminance: BITS (# codes of length 1..16) and HUFFVAL
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# K.3.2 — AC luminance
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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

# zigzag scan order (natural index for each zigzag position)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix
_N = 8
_DCT = np.zeros((_N, _N))
for _k in range(_N):
    for _n in range(_N):
        _DCT[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / (2 * _N))
_DCT[0, :] *= np.sqrt(1.0 / _N)
_DCT[1:, :] *= np.sqrt(2.0 / _N)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2: canonical Huffman codes from the BITS/HUFFVAL lists.
    Returns {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _build_codes(DC_BITS, DC_VALS)
_AC_ENC = _build_codes(AC_BITS, AC_VALS)


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code) -> symbol} for the bit-serial decoder."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


_DC_DEC = _decode_table(DC_BITS, DC_VALS)
_AC_DEC = _decode_table(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                return False  # a real marker inside the scan: stop
            self.pos += 1  # skip the stuffed 0x00
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def read(self, n: int) -> int | None:
        while self.nbits < n:
            if not self._fill():
                return None
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int | None:
        code = 0
        for length in range(1, 17):
            bit = self.read(1)
            if bit is None:
                return None
            code = (code << 1) | bit
            if (length, code) in table:
                return table[(length, code)]
        return None


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: (size category, amplitude bits) for a coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    amp = v if v >= 0 else v + (1 << size) - 1
    return size, amp


def _extend(amp: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def _to_blocks(img: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to multiples of 8 and split into 8x8 blocks,
    row-major over the block grid."""
    h, w = img.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(
        img.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, bh, bw


def quantized_blocks(img: np.ndarray) -> np.ndarray:
    """(n_blocks, 8, 8) int64 quantized DCT coefficients — the encoder's
    exact output, and the array the coefficient-level decoder must
    reproduce bit-for-bit."""
    blocks, _, _ = _to_blocks(img)
    shifted = blocks - 128.0
    coefs = _DCT @ shifted @ _DCT.T
    # round half away from zero (symmetric; keeps -0.5/0.5 engine-stable)
    q = np.sign(coefs) * np.floor(np.abs(coefs) / QTABLE + 0.5)
    return q.astype(np.int64)


def encode_gray_jpeg(img: np.ndarray) -> bytes:
    """Baseline JFIF bytes for an 8-bit grayscale image."""
    h, w = img.shape
    q = quantized_blocks(img)
    zz = q.reshape(-1, 64)[:, ZIGZAG]

    bw_ = _BitWriter()
    pred = 0
    for row in zz:
        # DC: difference category + amplitude
        diff = int(row[0]) - pred
        pred = int(row[0])
        size, amp = _magnitude(diff)
        c, ln = _DC_ENC[size]
        bw_.write(c, ln)
        if size:
            bw_.write(amp, size)
        # AC: run/size with ZRL and EOB
        run = 0
        last_nz = 0
        nz = np.nonzero(row[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for i in range(1, last_nz + 1):
            v = int(row[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = _AC_ENC[0xF0]  # ZRL: 16 zeros
                bw_.write(c, ln)
                run -= 16
            size, amp = _magnitude(v)
            c, ln = _AC_ENC[(run << 4) | size]
            bw_.write(c, ln)
            bw_.write(amp, size)
            run = 0
        if last_nz < 63:
            c, ln = _AC_ENC[0x00]  # EOB
            bw_.write(c, ln)
    scan = bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qz = QTABLE.reshape(64)[ZIGZAG]  # DQT stores zigzag order
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(int(x) for x in qz))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += scan + b"\xff\xd9"  # EOI
    return out


def _parse_segments(payload: bytes):
    """Walk SOI..SOS strictly; return (h, w, qtable, scan_bytes) or None.
    Rejects anything outside the encoder's subset (progressive, chroma,
    custom-table ids, missing EOI)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    h = w = None
    qt = None
    dc_ok = ac_ok = False
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + length]
        if len(data) != length - 2:
            return None
        if marker == 0xDB:
            if data[0] != 0x00 or len(data) != 65:
                return None
            qt = np.zeros(64, dtype=np.int64)
            qt[ZIGZAG] = np.frombuffer(data[1:], dtype=np.uint8)
            qt = qt.reshape(8, 8)
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", data[:6])
            if prec != 8 or ncomp != 1 or data[6:9] != b"\x01\x11\x00":
                return None
        elif marker in (0xC1, 0xC2, 0xC3):  # non-baseline SOF: reject
            return None
        elif marker == 0xC4:
            if data[0] == 0x00:
                dc_ok = (
                    list(data[1:17]) == DC_BITS
                    and list(data[17:]) == DC_VALS
                )
            elif data[0] == 0x10:
                ac_ok = (
                    list(data[1:17]) == AC_BITS
                    and list(data[17:]) == AC_VALS
                )
            else:
                return None
        elif marker == 0xDA:
            if data != b"\x01\x01\x00\x00\x3f\x00":
                return None
            scan_start = pos + 2 + length
            if (
                h is None
                or qt is None
                or not (dc_ok and ac_ok)
                or payload[-2:] != b"\xff\xd9"
            ):
                return None
            return h, w, qt, payload[scan_start:-2]
        pos += 2 + length
    return None


def decode_gray_coefficients(payload: bytes):
    """Entropy-decode a baseline grayscale JPEG back to its quantized DCT
    coefficient blocks — EXACT: bit-identical to the encoder's
    quantized_blocks output. Returns (coefs (n,8,8) int64, h, w, qtable)
    or None for anything outside the subset."""
    parsed = _parse_segments(payload)
    if parsed is None:
        return None
    h, w, qt, scan = parsed
    bh, bw_ = -(-h // 8), -(-w // 8)
    n = bh * bw_
    out = np.zeros((n, 64), dtype=np.int64)
    br = _BitReader(scan)
    pred = 0
    for b in range(n):
        size = br.read_symbol(_DC_DEC)
        if size is None:
            return None
        amp = br.read(size) if size else 0
        if amp is None:
            return None
        pred += _extend(amp, size)
        out[b, 0] = pred
        i = 1
        while i < 64:
            sym = br.read_symbol(_AC_DEC)
            if sym is None:
                return None
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                i += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            i += run
            if i >= 64 or size == 0:
                return None
            amp = br.read(size)
            if amp is None:
                return None
            out[b, i] = _extend(amp, size)
            i += 1
    coefs = np.zeros((n, 64), dtype=np.int64)
    coefs[:, ZIGZAG] = out
    return coefs.reshape(n, 8, 8), h, w, qt


def decode_gray_jpeg(payload: bytes):
    """Full pixel decode: entropy decode + dequantize + IDCT + level shift
    + clamp. Lossy vs the encoder's input (that is JPEG), exact vs the
    coefficients. Returns (h, w) uint8 or None."""
    dec = decode_gray_coefficients(payload)
    if dec is None:
        return None
    coefs, h, w, qt = dec
    deq = coefs.astype(np.float64) * qt
    pix = _DCT.T @ deq @ _DCT + 128.0
    pix = np.clip(np.floor(pix + 0.5), 0, 255).astype(np.uint8)
    bh, bw_ = -(-h // 8), -(-w // 8)
    full = (
        pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
    )
    return full[:h, :w]
