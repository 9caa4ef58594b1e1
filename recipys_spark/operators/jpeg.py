"""Baseline sequential JPEG codec, pure numpy + stdlib.

The last multimodal decode tier (VERDICT r3 #5): JPEG is the commonest
web-corpus image format, so the engine ships a dependency-free baseline
decoder rather than a stub. Everything here is public knowledge from
ITU-T T.81 (the JPEG spec): Annex K quantization/Huffman tables, zigzag
order, the DCT-II/III transform pair, JFIF YCbCr conversion.

Scope (documented, checked, erroring clearly outside it):

- decode: baseline DCT sequential (SOF0), 8-bit, 1 or 3 components,
  arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 all work via the
  general interleaved-MCU loop), restart markers (DRI/RSTn). Quant and
  Huffman tables are read from the FILE (DQT/DHT), not assumed — a
  foreign encoder's custom tables decode correctly.
- rejected with a clear error: progressive (SOF2), arithmetic coding,
  12-bit precision, 4-component CMYK.
- encode (fixture generator): quality-scaled Annex K tables, 4:4:4 or
  grayscale, the standard Huffman tables.

Per-block DCT/IDCT run as one numpy matmul pair; the entropy decode is
bit-serial Python — fine for the mapInPandas feature tier where decode
cost is per-payload and embarrassingly parallel across Arrow batches;
wire an optimized codec (Pillow-SIMD, nvJPEG) behind the same
``decode_jpeg(payload) -> ndarray`` signature for production density.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

# -- ITU-T T.81 Annex K tables (public spec constants) ----------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# (BITS counts per code length 1..16, HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: F = D @ block @ D.T,
    block = D.T @ F @ D (DCT-III is its transpose/inverse)."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    d = np.cos((2 * n + 1) * k * np.pi / 16.0)
    d[0] *= np.sqrt(1.0 / 2.0)
    return d * 0.5


_DCT = _dct_matrix()


def quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality scaling of an Annex K table (public formula)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255)


# -- canonical Huffman construction (T.81 C.1–C.2) --------------------------


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) from the BITS/HUFFVAL form."""
    codes = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """((length, code) -> symbol) for the bit-serial decoder."""
    out = {}
    for sym, (code, length) in _canonical_codes(bits, vals).items():
        out[(length, code)] = sym
    return out


# -- bit I/O with 0xFF byte stuffing ---------------------------------------


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
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s

    def append_marker(self, second_byte: int) -> None:
        self.pad_to_byte()
        self.out += bytes([0xFF, second_byte])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers
    (0xFF followed by non-zero, non-RST)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            raise ValueError("hit marker inside entropy segment")
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.acc = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Drop partial byte, expect a marker; returns its second byte."""
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            raise ValueError("expected marker")
        m = d[self.pos + 1]
        self.pos += 2
        return m

    def decode_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> "tuple[int, int]":
    """Signed value -> (category t, t-bit code) per T.81 F.1.2.1."""
    t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


# -- encoder (fixture generator) -------------------------------------------


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _encode_block(bw, block, qtab, dc_codes, ac_codes, pred):
    coef = _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T
    q = np.round(coef / qtab).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    t, code = _magnitude(diff)
    c, ln = dc_codes[t]
    bw.write(c, ln)
    if t:
        bw.write(code, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            if i > last_nz:
                c, ln = ac_codes[0x00]  # EOB
                bw.write(c, ln)
                break
            run += 1
            if run == 16:
                c, ln = ac_codes[0xF0]  # ZRL
                bw.write(c, ln)
                run = 0
            continue
        t, code = _magnitude(v)
        c, ln = ac_codes[(run << 4) | t]
        bw.write(c, ln)
        bw.write(code, t)
        run = 0
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 HxW (gray) or HxWx3 (RGB) -> baseline JFIF bytes with
    quality-scaled Annex K tables — the fixture generator for the real
    decode tier (every byte from the spec, no codec library).

    ``subsampling``: "444" (one 8x8 block per component per MCU) or
    "420" (2x2 luma blocks + box-mean-downsampled chroma — the web
    default). ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs, exercising the decoder's resync path."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"expected HxW or HxWx3 uint8, got {img.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = subsampling == "420" and not gray
    h, w = img.shape[:2]
    ql = quality_scale(QUANT_LUMA, quality)
    qc = quality_scale(QUANT_CHROMA, quality)

    out = bytearray(JPEG_MAGIC)
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, ql),) + (() if gray else ((1, qc),)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in q.reshape(64)[ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hv = 0x22 if (sub and cid == 1) else 0x11
        out += bytes([cid, hv, 0 if cid == 1 else 1])
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x00 if cid == 1 else 0x11])
    out += b"\x00\x3f\x00"

    planes = (
        [img.astype(np.float64)]
        if gray
        else [rgb_to_ycbcr(img)[..., i] for i in range(3)]
    )
    # per-component sampling factors and MCU grid
    hs = [2 if (sub and i == 0) else 1 for i in range(ncomp)]
    vs = list(hs)
    hmax, vmax = max(hs), max(vs)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    def pad_plane(p, ph, pw):
        pp = np.empty((ph, pw))
        sh, sw = p.shape
        pp[:sh, :sw] = p
        pp[sh:, :sw] = p[sh - 1 : sh, :]  # edge-replicate pad
        pp[:, sw:] = pp[:, sw - 1 : sw]
        return pp

    comp_planes = []
    for ci, p in enumerate(planes):
        if sub and ci > 0:
            # box-mean 2x2 downsample on an edge-padded even grid
            ep = pad_plane(p, -(-h // 2) * 2, -(-w // 2) * 2)
            p = ep.reshape(ep.shape[0] // 2, 2, ep.shape[1] // 2, 2).mean(axis=(1, 3))
        comp_planes.append(pad_plane(p, mcuy * vs[ci] * 8, mcux * hs[ci] * 8))

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.append_marker(0xD0 + (mcu_count // restart_interval - 1) % 8)
                preds = [0] * ncomp
            for ci in range(ncomp):
                qtab = ql if ci == 0 else qc
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for by in range(vs[ci]):
                    for bx in range(hs[ci]):
                        y0 = (my * vs[ci] + by) * 8
                        x0 = (mx * hs[ci] + bx) * 8
                        block = comp_planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            writer, block, qtab, dc, ac, preds[ci]
                        )
            mcu_count += 1
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# -- decoder ----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> uint8 HxW (gray) or HxWx3 (RGB).

    Tables come from the file's own DQT/DHT segments; the interleaved
    MCU loop handles any sampling factors (4:4:4/4:2:2/4:2:0) with
    nearest-neighbor chroma upsampling, plus DRI/RSTn restart markers.
    Progressive/arithmetic/12-bit streams raise ValueError naming the
    unsupported mode."""
    if not payload or payload[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them, or a foreign encoder's padding would be
        # misread as marker id 0xFF with a bogus segment length
        while payload[pos + 1] == 0xFF and pos + 2 < len(payload):
            pos += 1
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(payload):
            # the fill-byte skip advanced past the outer bound check —
            # keep the documented error type, not a struct.error
            raise ValueError("truncated segment after fill bytes")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline is 8)")
                tab = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int64)
                qtabs[tq] = tab[UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                htabs[tc_th] = _decode_table(bits, vals)
                i += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"only 8-bit precision supported, got {prec}")
            if nc not in (1, 3):
                raise ValueError(f"1 or 3 components supported, got {nc}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (marker 0xFF{marker:02X}): only "
                "baseline sequential (SOF0/SOF1) is implemented — "
                "progressive and arithmetic-coded streams need a full codec"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = {}
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan[cs] = (tdta >> 4, tdta & 0x0F)
            return _decode_scan(payload, pos, frame, scan, qtabs, htabs, restart_interval)
        # other markers (APPn, COM) skipped
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qtabs, htabs, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_tab = htabs.get(0x00 | td)
                ac_tab = htabs.get(0x10 | ta)
                if dc_tab is None or ac_tab is None:
                    raise ValueError("missing Huffman table for scan")
                qtab = qtabs.get(c["tq"])
                if qtab is None:
                    raise ValueError("missing quant table for component")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dc_tab)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef = (zz * qtab.reshape(64)[ZIGZAG]).astype(np.float64)
                        blk = np.zeros(64)
                        blk[ZIGZAG] = coef
                        pix = _DCT.T @ blk.reshape(8, 8) @ _DCT + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(np.stack(full, axis=-1))
