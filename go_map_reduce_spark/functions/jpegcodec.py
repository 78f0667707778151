"""Dependency-free baseline JPEG (ITU-T T.81) grayscale codec.

Everything here is the public T.81 machinery, implemented fresh:
marker segments (SOI/APP0/DQT/SOF0/DHT/SOS/EOI), zigzag ordering
(generated algorithmically, not a hand-typed table), quantization,
2-D DCT/IDCT as numpy matrix products, DC differential coding,
run-length AC coding with EOB/ZRL, canonical Huffman code
construction from (BITS, HUFFVAL) per Annex C, and entropy-coded-
segment byte stuffing (0xFF -> 0xFF 0x00).

The Huffman tables are NOT the Annex K examples: the encoder emits its
own complete canonical tables (all 12 DC categories at 4 bits, all 162
AC symbols at 8 bits) and ships them in DHT — which is exactly what
forces the decoder to BUILD its tables from the bitstream the way
every real JPEG decoder must, instead of special-casing known
constants.

Scope: baseline sequential DCT, 8-bit — grayscale (1 component),
YCbCr 4:4:4 (3 interleaved components), or YCbCr 4:2:0 (the dominant
real-world layout: 16x16 MCUs of four Y blocks + one Cb + one Cr,
2x2-averaged chroma, nearest-neighbor upsample on decode). JFIF
conversion matrix, per-component DC predictors, edge-replication
padding. Progressive JPEG remains out of scope
(multimodal.decode_image keeps its PIL gate for it).
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# zigzag order (generated, 64 entries: zigzag index -> (row, col))
# --------------------------------------------------------------------------


def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    r = c = 0
    for _ in range(64):
        order.append((r, c))
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


ZIGZAG = _zigzag_order()

# --------------------------------------------------------------------------
# Huffman tables: complete canonical specs shipped via DHT
# --------------------------------------------------------------------------

# DC: 12 category symbols (0..11), every code 4 bits long.
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))

# AC: the 162 baseline symbols — EOB (0x00), ZRL (0xF0) and
# (run 0..15, size 1..10) — every code 8 bits long.
AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
AC_BITS = [0] * 7 + [len(AC_VALS)] + [0] * 8


def build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex-C canonical construction: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decoding."""
    return {
        (length, code): sym for sym, (code, length) in build_codes(bits, vals).items()
    }


# --------------------------------------------------------------------------
# bit IO with entropy-segment byte stuffing
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((code >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:  # pad with 1-bits per T.81 F.1.2.3
            self.write(1, 1)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("marker inside entropy-coded segment")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def expect_restart(self, n: int) -> None:
        """Byte-align and consume the RSTn marker (T.81 E.1.4: restart
        markers sit on byte boundaries between entropy-coded
        segments); verifies the modulo-8 sequence number."""
        self._n = 0  # discard padding bits of the finished segment
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != (
            0xD0 | (n % 8)
        ):
            raise ValueError(
                f"expected RST{n % 8} at offset {self.pos}, found "
                f"{self.data[self.pos:self.pos + 2].hex()}"
            )
        self.pos += 2


def _category(v: int) -> int:
    s = 0
    a = abs(v)
    while a:
        a >>= 1
        s += 1
    return s


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _dct_matrix():
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


def _encode_block(w: "_BitWriter", block, q, m, prev_dc: int) -> int:
    """Forward-DCT, quantize, and entropy-encode one 8x8 block (DC
    differential against ``prev_dc``); returns the new DC predictor."""
    import numpy as np

    dc_codes = build_codes(DC_BITS, DC_VALS)
    ac_codes = build_codes(AC_BITS, AC_VALS)
    coef = m @ (block - 128.0) @ m.T
    qc = np.rint(coef / q).astype(np.int64)
    zz = [int(qc[r, c]) for (r, c) in ZIGZAG]
    diff = zz[0] - prev_dc
    s = _category(diff)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    k, run = 1, 0
    while k < 64:
        v = zz[k]
        if v == 0:
            run += 1
        else:
            while run > 15:
                zc, zl = ac_codes[0xF0]  # ZRL
                w.write(zc, zl)
                run -= 16
            s = _category(v)
            code, length = ac_codes[(run << 4) | s]
            w.write(code, length)
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        k += 1
    if run:
        ec, el = ac_codes[0x00]  # EOB
        w.write(ec, el)
    return zz[0]


def encode_jpeg_gray(
    width: int,
    height: int,
    pixels: bytes,
    quant: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, ``width*height`` bytes)
    as a baseline JFIF stream. ``quant`` is the 64-entry quantization
    table in natural (row-major) order; default all-ones (maximum
    fidelity — constant blocks round-trip exactly).
    ``restart_interval`` > 0 emits a DRI segment and byte-aligned RSTn
    markers every that-many MCUs (T.81 E.1.4 — the error-resilience
    feature most camera JPEGs carry), resetting the DC predictor at
    each restart."""
    import numpy as np

    quant = quant or [1] * 64
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    # pad to 8x8 multiples by edge replication
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    img = np.pad(img, ((0, ph - height), (0, pw - width)), mode="edge")
    m = _dct_matrix()
    q = np.array(quant, dtype=np.float64).reshape(8, 8)

    w = _BitWriter()
    prev_dc = 0
    mcu = rst = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.flush()  # byte-align the finished entropy segment
                w.out += bytes([0xFF, 0xD0 | (rst % 8)])
                rst += 1
                prev_dc = 0  # predictors reset at every restart
            block = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64)
            prev_dc = _encode_block(w, block, q, m, prev_dc)
            mcu += 1
    w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_quant = bytes(quant[r * 8 + c] for (r, c) in ZIGZAG)
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    out += seg(0xFFDB, b"\x00" + zz_quant)  # DQT, table 0, 8-bit
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    )  # SOF0: 1 component, no subsampling
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))  # DHT DC 0
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))  # DHT AC 0
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += bytes(w.out)
    out += b"\xff\xd9"  # EOI
    return out


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def _decode_block(r: _BitReader, dc_map, ac_map, prev_dc: int):
    """Entropy-decode one 8x8 block: returns (zigzag coeffs, new DC)."""
    zz = [0] * 64
    s = r.read_symbol(dc_map)
    diff = r.read_bits(s) if s else 0
    if s and diff < (1 << (s - 1)):
        diff -= (1 << s) - 1  # extend negative
    prev_dc += diff
    zz[0] = prev_dc
    k = 1
    while k < 64:
        rs = r.read_symbol(ac_map)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        size = rs & 0x0F
        if k > 63:
            raise ValueError("AC run overflows block")
        v = r.read_bits(size)
        if v < (1 << (size - 1)):
            v -= (1 << size) - 1
        zz[k] = v
        k += 1
    return zz, prev_dc


def _block_pixels(zz, q, m):
    """Dequantize + dezigzag + IDCT + level shift -> 8x8 float block."""
    import numpy as np

    coef = np.zeros((8, 8))
    for i, (rr, cc) in enumerate(ZIGZAG):
        coef[rr, cc] = zz[i]
    return m.T @ (coef * q) @ m + 128.0


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG (grayscale, or YCbCr 4:4:4 interleaved):
    marker walk, DQT/DHT table builds, Huffman entropy decode with
    per-component DC prediction, dequantize, dezigzag, IDCT, level
    shift, color conversion for 3 components, clamp, crop. Returns
    (width, height, bits-per-pixel [8|24], row-major bytes)."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant = None
    width = height = ncomp = None
    dc_map = ac_map = None
    scan_at = None
    dri = 0  # restart interval in MCUs (0 = no restarts)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        data = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT
            if data[0] & 0xF0:
                raise ValueError("16-bit quant tables unsupported")
            zz_q = list(data[1:65])
            quant = [0] * 64
            for i, (r, c) in enumerate(ZIGZAG):
                quant[r * 8 + c] = zz_q[i]
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack_from(">BHHB", data, 0)
            if precision != 8 or ncomp not in (1, 3):
                raise ValueError("only 8-bit 1- or 3-component baseline supported")
            # component specs follow: (id, H/V, Tq) triples from data[6]
            samp = tuple(data[7 + 3 * ci] for ci in range(ncomp))
            if samp not in ((0x11,), (0x11, 0x11, 0x11), (0x22, 0x11, 0x11)):
                raise ValueError(
                    f"unsupported sampling layout {samp} (4:4:4 or 4:2:0 only)"
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG frame unsupported")
        elif marker == 0xC4:  # DHT (may carry several tables)
            at = 0
            while at < len(data):
                tc_th = data[at]
                bits = list(data[at + 1 : at + 17])
                n = sum(bits)
                vals = list(data[at + 17 : at + 17 + n])
                table = build_decode_map(bits, vals)
                if tc_th >> 4 == 0:
                    dc_map = table
                else:
                    ac_map = table
                at += 17 + n
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            scan_at = pos + 2 + length
            break
        pos += 2 + length
    if None in (quant, width, dc_map, ac_map, scan_at):
        raise ValueError("JPEG stream missing required segments")

    m = _dct_matrix()
    q = np.array(quant, dtype=np.float64).reshape(8, 8)
    r = _BitReader(payload, scan_at)
    prev_dc = [0] * ncomp
    mcu = rst = 0

    def _maybe_restart():
        nonlocal mcu, rst
        if dri and mcu and mcu % dri == 0:
            r.expect_restart(rst)
            rst += 1
            for ci in range(ncomp):
                prev_dc[ci] = 0
        mcu += 1

    if samp == (0x22, 0x11, 0x11):  # 4:2:0 — 16x16 MCU: 4 Y + Cb + Cr
        ph, pw = -(-height // 16) * 16, -(-width // 16) * 16
        yplane = np.zeros((ph, pw), dtype=np.float64)
        cplanes = [
            np.zeros((ph // 2, pw // 2), dtype=np.float64) for _ in range(2)
        ]
        for my in range(ph // 16):
            for mx in range(pw // 16):
                _maybe_restart()
                for dy in (0, 1):
                    for dx in (0, 1):
                        zz, prev_dc[0] = _decode_block(r, dc_map, ac_map, prev_dc[0])
                        yy, xx = my * 16 + dy * 8, mx * 16 + dx * 8
                        yplane[yy : yy + 8, xx : xx + 8] = _block_pixels(zz, q, m)
                for ci in (1, 2):
                    zz, prev_dc[ci] = _decode_block(r, dc_map, ac_map, prev_dc[ci])
                    cy, cx = my * 8, mx * 8
                    cplanes[ci - 1][cy : cy + 8, cx : cx + 8] = _block_pixels(
                        zz, q, m
                    )
        # nearest-neighbor chroma upsample back to luma resolution
        planes = [yplane] + [
            np.repeat(np.repeat(p, 2, axis=0), 2, axis=1) for p in cplanes
        ]
    else:
        ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
        planes = [np.zeros((ph, pw), dtype=np.float64) for _ in range(ncomp)]
        for by in range(ph // 8):
            for bx in range(pw // 8):
                _maybe_restart()
                for ci in range(ncomp):  # interleaved MCU: one block per comp
                    zz, prev_dc[ci] = _decode_block(r, dc_map, ac_map, prev_dc[ci])
                    planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _block_pixels(zz, q, m)
                    )
    if ncomp == 1:
        out = np.clip(np.rint(planes[0][:height, :width]), 0, 255).astype(np.uint8)
        return width, height, 8, out.tobytes()
    y = planes[0][:height, :width]
    cb = planes[1][:height, :width] - 128.0
    cr = planes[2][:height, :width] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return width, height, 24, out.tobytes()


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, int, bytes]:
    """Single-component convenience wrapper over ``decode_jpeg``."""
    w, h, bpp, px = decode_jpeg(payload)
    if bpp != 8:
        raise ValueError("expected a grayscale JPEG")
    return w, h, bpp, px


# --------------------------------------------------------------------------
# color (YCbCr 4:4:4) encoder
# --------------------------------------------------------------------------


def encode_jpeg_color(
    width: int, height: int, rgb: bytes, quant: list[int] | None = None
) -> bytes:
    """Encode 8-bit RGB pixels (row-major, ``width*height*3`` bytes) as
    a baseline YCbCr 4:4:4 JFIF stream: JFIF color conversion, three
    interleaved components per MCU with independent DC predictors, one
    shared quant and Huffman table set (table 0 for everything — legal
    baseline, and it keeps the decoder honest about reading the
    component-to-table mappings from SOS)."""
    import numpy as np

    quant = quant or [1] * 64
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(
        np.float64
    )
    r_, g_, b_ = img[..., 0], img[..., 1], img[..., 2]
    planes = [
        0.299 * r_ + 0.587 * g_ + 0.114 * b_,  # Y
        128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_,  # Cb
        128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_,  # Cr
    ]
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    planes = [
        np.pad(
            np.clip(np.rint(p), 0, 255),
            ((0, ph - height), (0, pw - width)),
            mode="edge",
        )
        for p in planes
    ]
    m = _dct_matrix()
    q = np.array(quant, dtype=np.float64).reshape(8, 8)
    w = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(3):  # interleaved MCU
                block = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                prev_dc[ci] = _encode_block(w, block, q, m, prev_dc[ci])
    w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_quant = bytes(quant[r * 8 + c] for (r, c) in ZIGZAG)
    out = b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + zz_quant)
    comps = b"".join(bytes([cid, 0x11, 0x00]) for cid in (1, 2, 3))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3) + comps)
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")
    out += bytes(w.out)
    out += b"\xff\xd9"
    return out


# --------------------------------------------------------------------------
# 4:2:0 chroma-subsampled color encoder + MCU-aware decode support
# --------------------------------------------------------------------------


def encode_jpeg_color_420(
    width: int, height: int, rgb: bytes, quant: list[int] | None = None
) -> bytes:
    """Encode 8-bit RGB as baseline YCbCr 4:2:0 — the dominant
    real-world JPEG layout: each MCU carries four Y blocks (2x2) and
    one Cb + one Cr block covering the same 16x16 pixel area, chroma
    planes averaged 2x2 before the DCT. Y samples at 0x22, chroma at
    0x11."""
    import numpy as np

    quant = quant or [1] * 64
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(
        np.float64
    )
    r_, g_, b_ = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
    cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
    ph, pw = -(-height // 16) * 16, -(-width // 16) * 16
    pad = lambda p: np.pad(  # noqa: E731
        p, ((0, ph - height), (0, pw - width)), mode="edge"
    )
    y = np.clip(np.rint(pad(y)), 0, 255)
    # chroma: pad first, then 2x2 block mean (the subsampling step)
    sub = lambda p: np.clip(  # noqa: E731
        np.rint(pad(p).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))), 0, 255
    )
    cb, cr = sub(cb), sub(cr)
    m = _dct_matrix()
    q = np.array(quant, dtype=np.float64).reshape(8, 8)
    w = _BitWriter()
    prev = [0, 0, 0]  # per-component DC predictors
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for dy in (0, 1):  # four Y blocks, raster order within MCU
                for dx in (0, 1):
                    yy, xx = my * 16 + dy * 8, mx * 16 + dx * 8
                    prev[0] = _encode_block(
                        w, y[yy : yy + 8, xx : xx + 8], q, m, prev[0]
                    )
            cy, cx = my * 8, mx * 8
            prev[1] = _encode_block(w, cb[cy : cy + 8, cx : cx + 8], q, m, prev[1])
            prev[2] = _encode_block(w, cr[cy : cy + 8, cx : cx + 8], q, m, prev[2])
    w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_quant = bytes(quant[r * 8 + c] for (r, c) in ZIGZAG)
    out = b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + zz_quant)
    comps = bytes([1, 0x22, 0x00]) + bytes([2, 0x11, 0x00]) + bytes([3, 0x11, 0x00])
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3) + comps)
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")
    out += bytes(w.out)
    out += b"\xff\xd9"
    return out
