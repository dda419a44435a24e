"""REAL baseline JPEG codec (ITU-T T.81, SOF0, Huffman, 4:4:4 / gray)
in pure Python + numpy — closes the round-4 "JPEG pixel decode" seam
without external libraries.

Scope (exactly the fixture surface this repo needs, spec-true where it
counts):

- ``encode_jpeg_baseline``: grayscale (H,W) or RGB (H,W,3) uint8 →
  baseline JFIF bytes. 8×8 float DCT (orthonormal matrix form), Annex K
  quantization tables scaled by a quality knob, zig-zag, DC-prediction +
  run/size AC entropy coding with CANONICAL HUFFMAN TABLES COMPUTED
  FROM THE DATA (emitted in DHT, so no reliance on remembering the
  Annex K code tables), byte stuffing, no subsampling (4:4:4), no
  restart markers.
- ``decode_jpeg_baseline``: the inverse — marker walk (DQT/SOF0/DHT/
  SOS), Huffman decode, dequantize, inverse zig-zag, IDCT, YCbCr→RGB,
  crop to the frame dimensions. Returns ``None`` for anything outside
  the supported subset (progressive, subsampled, arithmetic, DRI) so
  callers can fall back — the optional-dependency seam contract of
  ``operators/multimodal.py``.

The Huffman-table builder uses the T.81 K.3 length-limiting adjustment
and libjpeg's reserved-symbol trick (a pseudo-symbol that absorbs the
all-ones code, which the standard forbids for real symbols).

Scale note: this runs inside the same ``mapInPandas`` Arrow batches as
the PNG codec — one Python worker per partition, payload bytes never
leave the executor; the codec choice is a per-row function, invisible
to the Spark plan.

Round-trip accuracy is bounded by the quantization table: at
``quality=100`` (all-ones tables) the only loss is DCT float rounding,
max ±2 per sample — asserted in tests/test_codecs.py.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --- 8x8 orthonormal DCT matrix: forward F = C @ B @ C.T --------------
_C = np.array(
    [
        [math.sqrt((1 if u == 0 else 2) / 8) * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)
    ]
)

# zig-zag scan order, generated (not recalled): diagonals of constant
# i+j, odd diagonals walked top-right→bottom-left, even ones reversed.
_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _rng = list(range(max(0, _s - 7), min(_s, 7) + 1))
    for _i in (_rng if _s % 2 == 1 else reversed(_rng)):
        _ZIGZAG.append((_i, _s - _i))

# Annex K quantization tables (the encoder's choice; carried in DQT so
# decode correctness never depends on them).
_QLUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
])
_QCHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
])


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _bit_length(v: int) -> int:
    return int(abs(v)).bit_length()


# --- canonical Huffman from symbol frequencies (T.81 K.2/K.3) ---------

def _huffman_spec(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """(bits[1..16], huffval) from symbol frequencies: build a Huffman
    code, limit lengths to 16 with the standard adjustment, and reserve
    the all-ones code via a pseudo-symbol 256 that is dropped at the
    end (libjpeg's trick)."""
    import heapq
    import itertools

    counter = itertools.count()
    entries = [(max(f, 1), next(counter), sym) for sym, f in freqs.items()]
    entries.append((1, next(counter), 256))  # reserved pseudo-symbol
    if len(entries) == 1:
        lengths = {entries[0][2]: 1}
    else:
        heap = [(f, i, ("leaf", sym)) for f, i, sym in entries]
        heapq.heapify(heap)
        while len(heap) > 1:
            f1, _, n1 = heapq.heappop(heap)
            f2, _, n2 = heapq.heappop(heap)
            heapq.heappush(heap, (f1 + f2, next(counter), ("node", n1, n2)))
        lengths = {}

        def walk(node, depth):
            if node[0] == "leaf":
                lengths[node[1]] = max(depth, 1)
            else:
                walk(node[1], depth + 1)
                walk(node[2], depth + 1)

        walk(heap[0][2], 0)

    max_len = max(lengths.values())
    bits = [0] * (max_len + 2)
    for length in lengths.values():
        bits[length] += 1
    # K.3 length-limiting: push pairs of too-long codes up the tree
    i = len(bits) - 1
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    bits = bits[: 17] + [0] * max(0, 17 - len(bits))
    # drop the reserved symbol's code: the longest used length loses one
    for length in range(16, 0, -1):
        if bits[length] > 0:
            bits[length] -= 1
            break
    # huffval: real symbols ordered by (original code length, symbol)
    huffval = [sym for sym in sorted(lengths, key=lambda s: (lengths[s], s)) if sym != 256]
    return bits[1:17], huffval


def _assign_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical assignment (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


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
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _blocks(channel: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad to multiples of 8 (edge replicate) and return
    (blocks[n,8,8], blocks_h, blocks_w)."""
    h, w = channel.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(channel, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )
    return blocks, bh, bw


def _encode_channel_coeffs(channel: np.ndarray, q: np.ndarray) -> np.ndarray:
    blocks, _, _ = _blocks(channel.astype(np.float64) - 128.0)
    coeffs = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    return np.round(coeffs / q).astype(np.int32)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_jpeg_baseline(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode uint8 grayscale (H,W) or RGB (H,W,3) to baseline JFIF."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
        qids = [0]
        qtables = [_scaled_q(_QLUMA, quality)]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qids = [0, 1, 1]
        qtables = [_scaled_q(_QLUMA, quality), _scaled_q(_QCHROMA, quality)]

    # quantized coefficients per component
    comp_coeffs = [
        _encode_channel_coeffs(p, qtables[qids[ci]]) for ci, p in enumerate(planes)
    ]

    # entropy symbols: two passes — collect frequencies, then emit.
    zz_rows = [zz[0] for zz in _ZIGZAG]
    zz_cols = [zz[1] for zz in _ZIGZAG]

    def block_symbols(coeffs: np.ndarray):
        """Yield per-block (dc_diff, ac_list) in scan order."""
        prev_dc = 0
        for blk in coeffs:
            seq = blk[zz_rows, zz_cols]
            dc = int(seq[0])
            yield dc - prev_dc, seq[1:]
            prev_dc = dc

    dc_freq = [{}, {}]
    ac_freq = [{}, {}]

    def ac_runs(ac: np.ndarray):
        nz = np.nonzero(ac)[0]
        pos = 0
        for idx in nz:
            run = int(idx) - pos
            while run >= 16:
                yield 0xF0, 0
                run -= 16
            v = int(ac[idx])
            yield (run << 4) | _bit_length(v), v
            pos = int(idx) + 1
        if pos < 63:
            yield 0x00, 0  # EOB

    for ci, coeffs in enumerate(comp_coeffs):
        tid = 0 if qids[ci] == 0 else 1
        for dc_diff, ac in block_symbols(coeffs):
            s = _bit_length(dc_diff)
            dc_freq[tid][s] = dc_freq[tid].get(s, 0) + 1
            for sym, _v in ac_runs(ac):
                ac_freq[tid][sym] = ac_freq[tid].get(sym, 0) + 1

    n_tables = 1 if gray else 2
    dc_specs = [_huffman_spec(dc_freq[t]) for t in range(n_tables)]
    ac_specs = [_huffman_spec(ac_freq[t]) for t in range(n_tables)]
    dc_codes = [_assign_codes(*spec) for spec in dc_specs]
    ac_codes = [_assign_codes(*spec) for spec in ac_specs]

    # --- emit the stream ---
    out = bytearray(b"\xff\xd8")  # SOI
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for qid in range(n_tables):
        body = bytes([qid]) + bytes(
            int(qtables[qid][i, j]) for i, j in _ZIGZAG
        )
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])  # 1x1 sampling
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for cls, specs in ((0, dc_specs), (1, ac_specs)):
        for tid, (bits, huffval) in enumerate(specs):
            body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval)
            out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if qids[ci] == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    # interleaved MCU order: with 1x1 sampling, one block per component
    # per MCU, components in SOF order
    n_blocks = comp_coeffs[0].shape[0]
    iters = [block_symbols(c) for c in comp_coeffs]
    for _ in range(n_blocks):
        for ci in range(ncomp):
            tid = 0 if qids[ci] == 0 else 1
            dc_diff, ac = next(iters[ci])
            s = _bit_length(dc_diff)
            code, length = dc_codes[tid][s]
            bw.write(code, length)
            if s:
                v = dc_diff if dc_diff > 0 else dc_diff + (1 << s) - 1
                bw.write(v, s)
            for sym, v in ac_runs(ac):
                code, length = ac_codes[tid][sym]
                bw.write(code, length)
                s2 = sym & 0x0F
                if s2:
                    vv = v if v > 0 else v + (1 << s2) - 1
                    bw.write(vv, s2)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # marker: treat as end of entropy data, feed 1-bits
                    self.pos -= 1
                    byte = 0xFF
                    self.acc = (self.acc << 8) | byte
                    self.nbits += 8
                    return
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 1  # past end: pad
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huffman_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_baseline(payload: bytes) -> np.ndarray | None:
    """Decode a baseline (SOF0, Huffman, 1x1-sampled) JPEG to uint8
    pixels: (H,W) for 1 component, (H,W,3) RGB for 3. Returns None for
    anything outside the supported subset (caller falls back).

    Truncated or corrupt payloads also return None: one malformed JPEG
    in a corpus must hit the fallback, not fail the whole Spark task
    that ``resize_images`` runs it under."""
    try:
        return _decode_jpeg_baseline(payload)
    except (struct.error, IndexError, ValueError, MemoryError):
        return None


def _decode_jpeg_baseline(payload: bytes) -> np.ndarray | None:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF, 0xDD):
            return None  # non-baseline / restart intervals: unsupported
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0x0F
                if pq != 0 or len(b) < 65:
                    return None
                q = np.zeros((8, 8), dtype=np.int32)
                for k, (i, j) in enumerate(_ZIGZAG):
                    q[i, j] = b[1 + k]
                qtables[tq] = q
                b = b[65:]
        elif marker == 0xC0:  # SOF0
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp not in (1, 3):
                return None
            comps = []
            for ci in range(ncomp):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    return None  # subsampled: unsupported
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                cls, tid = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                n = sum(bits)
                huffval = list(b[17 : 17 + n])
                codes = _assign_codes(bits, huffval)
                htables[(cls, tid)] = {(ln, code): sym for sym, (code, ln) in codes.items()}
                b = b[17 + n :]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tids = body[1 + 2 * ci : 3 + 2 * ci]
                scan_comps.append((cid, tids >> 4, tids & 0x0F))
            scan = (scan_comps, payload[pos + 2 + seg_len :])
            break
        pos += 2 + seg_len
    if frame is None or scan is None:
        return None
    h, w, comps = frame
    scan_comps, entropy = scan
    if len(scan_comps) != len(comps):
        return None
    # Corrupt/crafted SOF0 guard: a ~200-byte payload can DECLARE up to
    # 65535x65535 (4.3 Gpx -> 67M blocks), which would allocate ~34 GB
    # of planes and spin the pure-Python entropy loop for hours inside
    # a Spark task. (a) hard pixel cap; (b) every (block, component)
    # unit consumes >= 2 Huffman bits (two 1-bit codes minimum), so the
    # declared block count must fit the entropy bytes actually present —
    # without this, _BitReader's 1-padding past end-of-data lets a tiny
    # payload "decode" millions of blocks from no real bits.
    if h * w > 64_000_000:
        return None
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    n_blocks = bh * bw_
    if n_blocks * len(comps) > max(len(entropy), 1) * 4:
        return None
    br = _BitReader(entropy)
    zz_rows = [zz[0] for zz in _ZIGZAG]
    zz_cols = [zz[1] for zz in _ZIGZAG]
    planes = [np.zeros((n_blocks, 8, 8), dtype=np.float64) for _ in comps]
    prev_dc = [0] * len(comps)
    for b in range(n_blocks):
        for ci, (cid, tq) in enumerate(comps):
            _, dc_t, ac_t = scan_comps[ci]
            dct = htables.get((0, dc_t))
            act = htables.get((1, ac_t))
            q = qtables.get(tq)
            if dct is None or act is None or q is None:
                return None
            s = _decode_huffman_symbol(br, dct)
            if s is None or s > 11:  # baseline DC categories are 0..11
                return None
            diff = _extend(br.read_bits(s), s) if s else 0
            prev_dc[ci] += diff
            if not -(1 << 31) < prev_dc[ci] < (1 << 31):
                return None  # DC walked off int32: corrupt stream
            seq = np.zeros(64, dtype=np.int32)
            seq[0] = prev_dc[ci]
            k = 1
            while k < 64:
                sym = _decode_huffman_symbol(br, act)
                if sym is None:
                    return None
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                k += run
                if k >= 64 or size == 0 or size > 10:  # baseline AC sizes are 1..10
                    return None
                seq[k] = _extend(br.read_bits(size), size)
                k += 1
            blk = np.zeros((8, 8), dtype=np.float64)
            blk[zz_rows, zz_cols] = seq
            planes[ci][b] = blk * q
    # IDCT + reassemble
    out_planes = []
    for coeffs in planes:
        # inverse: B = C.T @ F @ C, i.e. b[x,y] = Σ_u Σ_v C[u,x]·F[u,v]·C[v,y]
        spatial = np.einsum("ux,nuv,vy->nxy", _C, coeffs, _C)
        img = (
            spatial.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        out_planes.append(img[:h, :w] + 128.0)
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(out_planes, axis=-1)
    return _ycbcr_to_rgb(ycc)
