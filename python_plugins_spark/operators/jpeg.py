"""Pure-numpy baseline JPEG codec (grayscale) — no external libs.

Round 4 made WAV/BMP/PPM decode REAL with hand-rolled stdlib codecs;
JPEG stayed behind the ``decode_stub_features`` env gate because no
codec library ships in this container. This module lifts that gap for
the grayscale baseline-sequential subset of ITU-T T.81 with nothing
but numpy:

- **encoder** (:func:`jpeg_encode_gray`): level shift, 8x8 blocked
  DCT-II (one numpy matrix sandwich ``M @ block @ M.T``), Annex-K
  luminance quantization (IJG quality scaling), zigzag, DC-difference
  + run-length AC Huffman coding with the Annex-K luminance tables,
  0xFF byte stuffing, JFIF/DQT/SOF0/DHT/SOS framing;
- **decoder** (:func:`jpeg_decode_gray`): full marker parse (DQT with
  8/16-bit entries, SOF0, DHT canonical rebuild, SOS), stuffed-byte
  bit reader, DC prediction, dequantize, IDCT, clamp, edge-block crop.

Scope is precise, refusals are loud: baseline sequential (SOF0),
single component, no subsampling, no restart intervals. Progressive /
chroma JPEGs raise ``ValueError`` with the reason — the decode is
either real or absent, never silently wrong.

Determinism contract: quantization rounds HALF AWAY FROM ZERO
(``trunc(x/q + sign*0.5)``) — the same convention as Spark's
``round()`` and DuckDB's ``round()`` — so registry oracles can
reproduce the DC-only quantization chain in closed form.

Spark integration is the repo's standard multimodal shape: payloads
are synthesized and decoded inside Arrow-batched ``mapInPandas``
stages (see ``synth_jpeg_payloads`` / ``decode_jpeg_block_means``),
bytes cross the JVM boundary once per batch. At 100 TB both stages
are narrow maps — no shuffle anywhere in the codec path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

# ---------------------------------------------------------------- tables

#: Annex K.1 luminance quantization table (row-major).
QUANT_LUMA = np.array(
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

#: Annex K.3 luminance DC table: (counts per code length 1..16, symbols).
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))

#: Annex K.5 luminance AC table.
AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_VALS = (
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
)


def _zigzag_order() -> np.ndarray:
    """Flat indices of the 8x8 zigzag walk, derived (not hardcoded):
    diagonals d = r+c, even diagonals walked bottom-left -> top-right."""
    order = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        cells = [(d - c, c) for c in rng]  # increasing column
        if d % 2 == 0:
            cells = cells  # even: up-right == increasing column
        else:
            cells = cells[::-1]
        order.extend(r * 8 + c for r, c in cells)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()

# Orthonormal-per-JPEG DCT matrix: F = M f M^T, f = M^T F M.
_M = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) from the DHT (BITS, HUFFVAL) form."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(DC_BITS, DC_VALS)
_AC_CODES = _canonical_codes(AC_BITS, AC_VALS)


def quality_scaled_quant(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex-K table (quality 50 == Annex K
    verbatim, the property the registry oracle leans on)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (QUANT_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255)


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Element-wise round half away from zero — the convention shared
    with Spark/DuckDB ``round()`` so oracles can mirror quantization."""
    return np.trunc(x + np.sign(x) * 0.5)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # T.81 byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def jpeg_encode_gray(pixels: np.ndarray, quality: int = 50) -> bytes:
    """Baseline-sequential grayscale JPEG of an (h, w) uint8 array."""
    pix = np.asarray(pixels)
    if pix.ndim != 2:
        raise ValueError("jpeg_encode_gray expects a 2-D grayscale array")
    h, w = pix.shape
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError(f"bad dimensions {h}x{w}")
    q = quality_scaled_quant(quality)

    # pad to 8-multiples by edge replication (the spec's recommendation)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = pix
    if pw > w:
        padded[:h, w:] = padded[:h, w - 1: w]
    if ph > h:
        padded[h:, :] = padded[h - 1: h, :]
    padded -= 128.0

    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by: by + 8, bx: bx + 8]
            coef = _M @ block @ _M.T
            qc = round_half_away(coef / q).astype(np.int64)
            zz = qc.ravel()[ZIGZAG]

            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            size = _category(diff)
            code, length = _DC_CODES[size]
            bw.put(code, length)
            if size:
                bw.put(_amplitude_bits(diff, size), size)

            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for i in range(1, last + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = _AC_CODES[0xF0]  # ZRL
                    bw.put(c, ln)
                    run -= 16
                size = _category(v)
                c, ln = _AC_CODES[(run << 4) | size]
                bw.put(c, ln)
                bw.put(_amplitude_bits(v, size), size)
                run = 0
            if last < 63:
                c, ln = _AC_CODES[0x00]  # EOB
                bw.put(c, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    zz_q = q.ravel()[ZIGZAG].astype(np.uint8).tobytes()
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + zz_q)  # DQT, table 0, 8-bit
    out += seg(
        0xC0,  # SOF0: 8-bit precision, 1 component, no subsampling
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x01" + b"\x01\x11\x00",
    )
    out += seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xDA, b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def jpeg_decode_gray(payload: bytes) -> np.ndarray:
    """Decode a grayscale baseline JPEG produced by any conformant
    encoder within this module's scope. Returns (h, w) uint8.
    Malformed or truncated input always raises ``ValueError``."""
    try:
        return _decode_gray(bytes(payload))
    except IndexError as exc:  # short reads anywhere in the parse
        raise ValueError("truncated or malformed JPEG") from exc


def _decode_gray(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_qtab = comp_dc = comp_ac = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("reached EOI before SOS")
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        ln = int.from_bytes(data[pos: pos + 2], "big")
        body = data[pos + 2: pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                n = 64 * (2 if pq else 1)
                raw = body[i: i + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals
                quant[tq] = tab.reshape(8, 8)
                i += n
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = body[i + 1: i + 17]
                nv = sum(bits)
                vals = body[i + 17: i + 17 + nv]
                codes = _canonical_codes(tuple(bits), tuple(vals))
                huff[(tc, th)] = {
                    (code, length): sym for sym, (code, length) in codes.items()
                }
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp != 1:
                raise ValueError(
                    f"grayscale baseline only: {ncomp} components unsupported"
                )
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported for single component")
            comp_qtab = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0) supported"
            )
        elif marker == 0xDD:  # DRI
            if int.from_bytes(body[:2], "big") != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if body[0] != 1:
                raise ValueError("single-component scan expected")
            comp_dc = body[2] >> 4
            comp_ac = body[2] & 0xF
            pos += ln
            break
        pos += ln
    else:
        raise ValueError("no SOS marker found")

    if h is None or comp_qtab not in quant:
        raise ValueError("missing SOF0/DQT before scan")
    dc_tab = huff.get((0, comp_dc))
    ac_tab = huff.get((1, comp_ac))
    if dc_tab is None or ac_tab is None:
        raise ValueError("missing Huffman tables for scan")
    q = quant[comp_qtab]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.empty((ph, pw), dtype=np.float64)
    br = _BitReader(data, pos)
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = np.zeros(64, dtype=np.int64)
            size = _decode_symbol(br, dc_tab)
            diff = _extend(br.bits(size), size) if size else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _decode_symbol(br, ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run overflows block")
                zz[k] = _extend(br.bits(size), size)
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[ZIGZAG] = zz
            block = _M.T @ (coef.reshape(8, 8) * q) @ _M
            out[by: by + 8, bx: bx + 8] = block
    pix = np.clip(round_half_away(out + 128.0), 0, 255).astype(np.uint8)
    return pix[:h, :w]


# ------------------------------------------------------- Spark operators


def synth_jpeg_payloads(
    df, id_col: str = "doc_id", quality: int = 50
):
    """16x16 grayscale JPEG per row, REAL encoder, Arrow-batched. Each
    of the four 8x8 blocks is constant ``(id * 37 + b * 11) % 256`` —
    constant blocks quantize to a DC-only spectrum, which keeps the
    decode side EXACTLY reproducible in closed form (the registry
    oracle's contract) while still driving the full bitstream path:
    nonzero DC diffs, byte stuffing, EOBs, both Huffman tables."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for rid in pdf[id_col]:
                rid = int(rid)
                img = np.empty((16, 16), dtype=np.uint8)
                for b, (by, bx) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
                    img[by: by + 8, bx: bx + 8] = (rid * 37 + b * 11) % 256
                ids.append(rid)
                payloads.append(jpeg_encode_gray(img, quality))
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    return df.select(id_col).mapInPandas(synth, schema)


def decode_jpeg_block_means(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """REAL JPEG decode per row; emits dimensions + the mean of each
    8x8 block as exact integers (constant blocks decode to constant
    values, so the mean IS the reconstructed level)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("b00", T.IntegerType()),
            T.StructField("b01", T.IntegerType()),
            T.StructField("b10", T.IntegerType()),
            T.StructField("b11", T.IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = jpeg_decode_gray(bytes(payload))
                hh, ww = img.shape
                out[id_col].append(int(rid))
                out["width"].append(ww)
                out["height"].append(hh)
                for name, (by, bx) in zip(
                    ("b00", "b01", "b10", "b11"), ((0, 0), (0, 8), (8, 0), (8, 8))
                ):
                    blk = img[by: by + 8, bx: bx + 8].astype(np.int64)
                    if not (blk == blk.ravel()[0]).all():
                        raise ValueError(
                            f"constant fixture decoded non-constant at id={rid}"
                        )
                    out[name].append(int(blk.ravel()[0]))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(decode, schema)
