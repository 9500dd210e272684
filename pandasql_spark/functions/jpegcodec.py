"""Native baseline JPEG codec — no image libraries.

Completes the container-native image stack (imagecodec.py: PNG, GIF):
``decode_jpeg`` handles baseline sequential DCT JFIF/EXIF streams
(SOF0: 8-bit, Huffman, 1 or 3 components, sampling factors h,v ∈ {1,2}
— covers 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 — plus restart markers), and
``encode_jpeg`` emits baseline 4:4:4 (or single-component grayscale)
streams with the spec's Annex-K quantization and Huffman tables, so
the pair round-trips without PIL anywhere. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise ImageDecodeError —
explicitly unsupported, never silently wrong.

Everything here is from the public JPEG spec (ITU-T T.81) + JFIF:
standard zigzag order, Annex-K table K.1/K.2 quant matrices and
K.3-K.6 Huffman tables, the libjpeg quality→scale mapping, BT.601
YCbCr. Pure numpy DCT (orthonormal matrix form); bit I/O in Python —
built for correctness and testability at document-thumbnail sizes
inside Arrow-batched kernels, not for megapixel throughput (that is
what PIL/libjpeg-turbo are for when present; this codec is the
no-dependency floor).
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageDecodeError

# ---------------------------------------------------------------------------
# spec constants (ITU-T T.81 Annex K — public standard tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal DCT-II matrix: block_dct = M @ B @ M.T
_M = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _M[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _canonical_codes(bits: list[int], values: list[int]):
    """BITS/HUFFVAL → {symbol: (code, length)} (T.81 C.2 generation)."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]):
    """BITS/HUFFVAL → {(length, code): symbol} for the bit-serial reader."""
    enc = _canonical_codes(bits, values)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    """raw bits of size s → signed value (T.81 F.2.2.1 EXTEND)."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment; un-stuffs
    0xFF00 and stops at any other marker (handled by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.d):
            raise ImageDecodeError("entropy data truncated")
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ImageDecodeError("hit marker inside entropy data")
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

    def align_to_marker(self) -> None:
        """Discard pad bits; the caller checks for RSTn at self.pos."""
        self.acc = 0
        self.nbits = 0

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ImageDecodeError("invalid Huffman code")


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public formula)."""
    if not (1 <= quality <= 100):
        raise ValueError(f"quality must be 1..100, got {quality}")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4 / grayscale)
# ---------------------------------------------------------------------------


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF bytes.
    4:4:4 (no subsampling): every component same dims, one block per
    component per MCU."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"need uint8 pixels, got {a.dtype}")
    if a.ndim == 2:
        comps = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        comps = [y, cb, cr]
    else:
        raise ValueError(f"need (h, w) or (h, w, 3), got {a.shape}")
    h, w = a.shape[:2]
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise ValueError(f"dims out of JPEG range: {w}x{h}")

    ncomp = len(comps)
    qts = [_scaled_quant(QUANT_LUMA, quality)]
    if ncomp == 3:
        qts.append(_scaled_quant(QUANT_CHROMA, quality))
    dc_specs = [DC_LUMA_SPEC] + ([DC_CHROMA_SPEC] if ncomp == 3 else [])
    ac_specs = [AC_LUMA_SPEC] + ([AC_CHROMA_SPEC] if ncomp == 3 else [])
    dc_enc = [_canonical_codes(*s) for s in dc_specs]
    ac_enc = [_canonical_codes(*s) for s in ac_specs]

    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = []
    for c in comps:
        p = np.pad(c, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        padded.append(p)

    wr = _BitWriter()
    pred = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):
                ti = 0 if ci == 0 else 1
                block = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = _M @ block @ _M.T
                q = np.round(coef / qts[ti]).astype(np.int64)
                zz = q.ravel()[ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s, bits = _magnitude(diff)
                code, ln = dc_enc[ti][s]
                wr.write(code, ln)
                if s:
                    wr.write(bits, s)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if k > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc[ti][0xF0]  # ZRL
                        wr.write(code, ln)
                        run -= 16
                    s, bits = _magnitude(v)
                    code, ln = ac_enc[ti][(run << 4) | s]
                    wr.write(code, ln)
                    wr.write(bits, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_enc[ti][0x00]  # EOB
                    wr.write(code, ln)
    data = wr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for ti, qt in enumerate(qts):
        zz = qt.ravel()[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti) + zz
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for cls, specs in ((0, dc_specs), (1, ac_specs)):
        for ti, (bits_, vals) in enumerate(specs):
            payload = bytes([cls << 4 | ti]) + bytes(bits_) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, ti << 4 | ti])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (baseline, sampling factors 1-2, restart markers)
# ---------------------------------------------------------------------------


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JFIF/EXIF bytes → uint8 array (h, w, channels):
    (h, w, 1) for grayscale, (h, w, 3) RGB for color."""
    if b[:2] != b"\xff\xd8":
        raise ImageDecodeError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    pos = 2
    try:
        while pos < len(b):
            if b[pos] != 0xFF:
                raise ImageDecodeError(f"bad marker byte at {pos}")
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
            # marker id — skip them instead of parsing one as a marker
            while pos + 1 < len(b) and b[pos + 1] == 0xFF:
                pos += 1
            marker = b[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:
                break
            seglen = struct.unpack_from(">H", b, pos)[0]
            seg = b[pos + 2:pos + seglen]
            if marker == 0xDB:  # DQT
                sp = 0
                while sp < len(seg):
                    pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                    if pq != 0:
                        raise ImageDecodeError("16-bit quant unsupported")
                    vals = np.frombuffer(seg, np.uint8, 64, sp + 1).astype(np.int64)
                    t = np.zeros(64, np.int64)
                    t[ZIGZAG] = vals
                    qtables[tq] = t.reshape(8, 8)
                    sp += 65
            elif marker == 0xC4:  # DHT
                sp = 0
                while sp < len(seg):
                    tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                    bits_ = list(seg[sp + 1:sp + 17])
                    n = sum(bits_)
                    vals = list(seg[sp + 17:sp + 17 + n])
                    htables[(tc, th)] = _decode_table(bits_, vals)
                    sp += 17 + n
            elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
                prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8:
                    raise ImageDecodeError(f"{prec}-bit precision unsupported")
                comps = []
                for i in range(nc):
                    cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * i)
                    ch, cv = hv >> 4, hv & 0x0F
                    if not (1 <= ch <= 2 and 1 <= cv <= 2):
                        raise ImageDecodeError(f"sampling {ch}x{cv} unsupported")
                    comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
                frame = {"h": fh, "w": fw, "comps": comps}
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                raise ImageDecodeError("non-baseline JPEG unsupported")
            elif marker == 0xDD:  # DRI
                restart = struct.unpack_from(">H", seg, 0)[0]
            elif marker == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    raise ImageDecodeError("SOS before SOF")
                ns = seg[0]
                scan = []
                for i in range(ns):
                    cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                    comp = next(c for c in frame["comps"] if c["id"] == cs)
                    scan.append((comp, tt >> 4, tt & 0x0F))
                return _decode_scan(
                    b, pos + seglen, frame, scan, qtables, htables, restart
                )
            pos += seglen
    except ImageDecodeError:
        raise
    except (struct.error, IndexError, StopIteration, ValueError) as exc:
        raise ImageDecodeError(f"truncated/invalid JPEG: {exc}") from exc
    raise ImageDecodeError("no scan data (header-only JPEG)")


def _decode_scan(b, pos, frame, scan, qtables, htables, restart):
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c, _, _ in scan:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        )
    rd = _BitReader(b, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                rd.align_to_marker()
                if not (
                    rd.pos + 1 < len(b)
                    and b[rd.pos] == 0xFF
                    and 0xD0 <= b[rd.pos + 1] <= 0xD7
                ):
                    raise ImageDecodeError("missing restart marker")
                rd.pos += 2
                pred = [0] * len(scan)
            for ci, (c, tdc, tac) in enumerate(scan):
                qt = qtables.get(c["tq"])
                dct = htables.get((0, tdc))
                act = htables.get((1, tac))
                if qt is None or dct is None or act is None:
                    raise ImageDecodeError("missing quant/huffman table")
                for bv in range(c["v"]):
                    for bh_ in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        s = rd.huff(dct)
                        if s > 15:  # corrupt DHT: DC size category is 0..15
                            raise ImageDecodeError(f"bad DC size {s}")
                        diff = _extend(rd.bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ImageDecodeError("AC run overflow")
                            zz[k] = _extend(rd.bits(s), s)
                            k += 1
                        coef = np.zeros(64, np.int64)
                        coef[ZIGZAG] = zz
                        blk = (coef.reshape(8, 8) * qt).astype(np.float64)
                        px = _M.T @ blk @ _M + 128.0
                        y0 = (my * c["v"] + bv) * 8
                        x0 = (mx * c["h"] + bh_) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    out = []
    for ci, (c, _, _) in enumerate(scan):
        p = planes[ci]
        p = np.repeat(p, hmax // c["h"], axis=1)
        p = np.repeat(p, vmax // c["v"], axis=0)
        out.append(p[:fh, :fw])
    if len(out) == 1:
        gray = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
