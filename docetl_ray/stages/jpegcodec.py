"""Pure-Python/numpy JPEG decoder: baseline and progressive.

Completes the stdlib image-codec set (``imagecodec.py``): JFIF baseline
sequential DCT (SOF0) and progressive DCT (SOF2) — 8-bit precision,
grayscale or YCbCr with any 1-2× sampling factors, restart markers,
standard huffman entropy coding; progressive spectral selection and
successive approximation (DC and AC first + refinement scans, EOB
runs) per T.81 §G.  Arithmetic coding, hierarchical (SOF3+) and 12-bit
inputs are rejected with ``ValueError``.

This is a correctness-first decoder: the entropy loop is Python-level
(the rest is numpy), so throughput is ~1 MB/s — fine for tests and
small assets.  At production scale you'd swap libjpeg-turbo in at the
same ``decode_image`` seam; the point here is that ``fake=False`` JPEG
rows decode for real with zero third-party dependencies.

Format reference: ITU-T T.81 (public spec); no reference-repo code is
involved — the reference delegates image handling to PIL entirely.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# 8x8 DCT-III basis for the inverse transform: block = C.T @ coef @ C
_K = np.arange(8)
_C = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * \
    np.where(_K[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


class _HuffTable:
    """Canonical JPEG huffman table -> (code -> symbol) keyed by
    (bit-length, code value), plus a max length for the reader."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with FF00
    byte-unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker = None  # set when a marker interrupts the stream

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bits = (self.bits << 8) | 0xFF  # pad per spec
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                    self.bits = (self.bits << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker: record and pad
                self.marker = nxt
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.bits = (self.bits << 8) | byte
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")

    def align_to_marker(self):
        """Drop buffered bits and consume an RST marker byte pair."""
        self.bits = 0
        self.nbits = 0
        self.marker = None
        # skip to the FF xx pair in the raw stream
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map the received bits to a signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (H, W, C) uint8 (C = 1 grayscale or 3 RGB)."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    coefs = None  # progressive: per-component (by, bx, 64) zigzag int32
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos: pos + 2])
        seg = payload[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(seg[p + 1: p + 65], np.uint8).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = seg[p + 1: p + 17]
                total = sum(counts)
                symbols = seg[p + 17: p + 17 + total]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(counts, symbols)
                p += 17 + total
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": height, "w": width, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) or progressive (SOF2) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cid, tables = seg[1 + 2 * i: 3 + 2 * i]
                scan[cid] = (tables >> 4, tables & 0xF)
            if not frame["progressive"]:
                if ns != len(frame["comps"]):
                    raise ValueError(
                        "non-interleaved (multi-scan) baseline JPEG unsupported")
                if any(c["id"] not in scan for c in frame["comps"]):
                    raise ValueError("JPEG scan is missing frame components")
                return _decode_scan(payload, pos + seglen, frame, scan, qt,
                                    huff_dc, huff_ac, restart_interval)
            # progressive: accumulate coefficients scan by scan (T.81 §G)
            if any(cid not in {c["id"] for c in frame["comps"]} for cid in scan):
                raise ValueError("JPEG scan names unknown component")
            if coefs is None:
                hmax = max(c["h"] for c in frame["comps"])
                vmax = max(c["v"] for c in frame["comps"])
                mcus_x = -(-frame["w"] // (8 * hmax))
                mcus_y = -(-frame["h"] // (8 * vmax))
                coefs = [
                    np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
                    for c in frame["comps"]
                ]
            ss, se, ahal = seg[1 + 2 * ns: 4 + 2 * ns]
            pos = _decode_scan_progressive(
                payload, pos + seglen, frame, scan, ss, se,
                ahal >> 4, ahal & 0xF, huff_dc, huff_ac,
                restart_interval, coefs,
            )
            # resync: step to the next real marker (skip pad bytes and
            # any stray FF00 stuffing the reader left behind)
            while pos + 1 < n and not (
                payload[pos] == 0xFF
                and payload[pos + 1] != 0x00
                and not 0xD0 <= payload[pos + 1] <= 0xD7
            ):
                pos += 1
            continue
        elif marker == 0xD9:  # EOI
            break
        pos += seglen
    if coefs is not None:
        return _reconstruct_progressive(frame, coefs, qt)
    raise ValueError("JPEG has no scan data")


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    comps = frame["comps"]
    height, width = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-width // mcu_w)
    mcus_y = -(-height // mcu_h)

    planes = []
    for c in comps:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_marker()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = huff_dc[scan[c["id"]][0]]
                ac_t = huff_ac[scan[c["id"]][1]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        size = reader.decode(dc_t)
                        pred[ci] += _extend(reader.read(size), size)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_t)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coef[k] = _extend(reader.read(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.int64)
                        block[ZIGZAG] = coef * q
                        px = _idct2(block.reshape(8, 8).astype(np.float64))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0: y0 + 8, x0: x0 + 8] = px
            mcu_count += 1

    return _finish(frame, planes)


def _scan_blocks(frame, in_scan):
    """Block-coordinate iteration order for one progressive scan ->
    (units, mcus) where ``units`` is a list of MCUs, each a list of
    (component-index, block-row, block-col).  Interleaved (multi-
    component) scans walk the full MCU grid including edge padding
    blocks; single-component scans walk only the component's own
    ceil(comp_dim/8) grid (T.81 §A.2.2-A.2.3)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    units = []
    if len(in_scan) == 1:
        ci, c = in_scan[0]
        comp_w = -(-frame["w"] * c["h"] // hmax)  # ceil(w * h_c / hmax)
        comp_h = -(-frame["h"] * c["v"] // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        for by in range(bh):
            for bx in range(bw):
                units.append([(ci, by, bx)])
    else:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                mcu = []
                for ci, c in in_scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            mcu.append((ci, my * c["v"] + by, mx * c["h"] + bx))
                units.append(mcu)
    return units


def _decode_scan_progressive(payload, pos, frame, scan, ss, se, ah, al,
                             huff_dc, huff_ac, restart_interval, coefs) -> int:
    """Decode ONE progressive scan into the accumulated coefficient
    arrays and return the stream position after its entropy data.

    Follows T.81 §G.2 (and the public libjpeg jdphuff.c structure): DC
    first scans huffman-code the point-transformed diffs, DC refinement
    scans send one raw bit per block, AC first scans code (run, size)
    with EOB-run escapes, AC refinement scans interleave newly-significant
    coefficients with correction bits for already-significant ones."""
    comps = frame["comps"]
    in_scan = [(ci, c) for ci, c in enumerate(comps) if c["id"] in scan]
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if not is_dc and len(in_scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not is_dc and ss > se or se > 63:
        raise ValueError("bad progressive spectral selection range")
    if ah != 0 and ah != al + 1:
        raise ValueError("successive approximation must refine one bit")

    reader = _BitReader(payload, pos)
    units = _scan_blocks(frame, in_scan)
    pred = {ci: 0 for ci, _ in in_scan}
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    for ui, mcu in enumerate(units):
        if restart_interval and ui and ui % restart_interval == 0:
            reader.align_to_marker()
            pred = {ci: 0 for ci, _ in in_scan}
            eobrun = 0
        for ci, by, bx in mcu:
            blk = coefs[ci][by, bx]
            if is_dc:
                if ah == 0:  # DC first
                    dc_t = huff_dc.get(scan[comps[ci]["id"]][0])
                    if dc_t is None:
                        raise ValueError("missing DC huffman table")
                    size = reader.decode(dc_t)
                    pred[ci] += _extend(reader.read(size), size)
                    blk[0] = pred[ci] << al
                else:  # DC refinement: one raw bit per block
                    if reader.read(1):
                        blk[0] = int(blk[0]) | p1
                continue
            ac_t = huff_ac.get(scan[comps[ci]["id"]][1])
            if ac_t is None:
                raise ValueError("missing AC huffman table")
            if ah == 0:  # AC first scan
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode(ac_t)
                    run, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << run) - 1
                        if run:
                            eobrun += reader.read(run)
                        break
                    k += run
                    if k > se:
                        raise ValueError("JPEG AC index overflow")
                    blk[k] = _extend(reader.read(size), size) << al
                    k += 1
                continue
            # AC refinement scan (T.81 §G.2.2 / jdphuff decode_mcu_AC_refine)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode(ac_t)
                    run, size = rs >> 4, rs & 0xF
                    val = 0
                    if size == 0:
                        if run != 15:
                            eobrun = 1 << run
                            if run:
                                eobrun += reader.read(run)
                            break
                        # ZRL: advance over 16 zero-history coefficients
                    else:
                        if size != 1:
                            raise ValueError("bad AC refinement magnitude")
                        val = p1 if reader.read(1) else m1
                    while k <= se:
                        cur = int(blk[k])
                        if cur != 0:
                            if reader.read(1) and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                # EOB band: correction bits only for the rest of the band
                while k <= se:
                    cur = int(blk[k])
                    if cur != 0:
                        if reader.read(1) and (cur & p1) == 0:
                            blk[k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                eobrun -= 1
    return reader.pos


def _reconstruct_progressive(frame, coefs, qt) -> np.ndarray:
    """Dequantize + inverse-DCT the accumulated coefficient planes
    (vectorized einsum over all blocks) and finish like baseline."""
    planes = []
    for ci, c in enumerate(frame["comps"]):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("JPEG quant table missing")
        deq = coefs[ci].astype(np.float64) * q[np.newaxis, np.newaxis, :]
        nat = np.zeros_like(deq)
        nat[..., ZIGZAG] = deq  # zigzag -> natural order
        by, bx = nat.shape[:2]
        blocks = nat.reshape(by, bx, 8, 8)
        px = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C)
        planes.append(px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return _finish(frame, planes)


def _finish(frame, planes) -> np.ndarray:
    """Shared tail: upsample planes to full resolution, crop to the
    frame dimensions, color-convert (grayscale or YCbCr -> RGB)."""
    comps = frame["comps"]
    height, width = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:height, :width])
    if len(comps) == 1:
        return np.clip(out_planes[0], 0, 255).round() \
            .astype(np.uint8)[..., None]
    if len(comps) != 3:
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255) \
        .round().astype(np.uint8)
