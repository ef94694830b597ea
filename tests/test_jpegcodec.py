"""Baseline JPEG decoder (stages/jpegcodec.py) round-trips.

The test encodes JPEGs itself (forward DCT + canonical huffman + byte
stuffing — ~T.81 Annex F in miniature) so fixtures need no imaging
library.  With an all-ones quant table the pipeline is lossless up to
DCT/color-convert float rounding, so tolerances are a few counts."""

import struct

import numpy as np
import pytest

from docetl_ray.stages.imagecodec import decode_image
from docetl_ray.stages.jpegcodec import ZIGZAG, _C, decode_jpeg

rng = np.random.default_rng(11)


# -- minimal baseline encoder -------------------------------------------------

def _huff_spec(symbols):
    """Canonical table with every symbol at code length 9 (keeps the
    all-ones code unused, as T.81 requires)."""
    counts = [0] * 16
    counts[8] = len(symbols)  # length 9 (index 8)
    enc = {s: (9, i) for i, s in enumerate(symbols)}
    return bytes(counts), bytes(symbols), enc


DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc &= (1 << self.n) - 1

    def pad(self):
        if self.n:
            self.write(0xFF, 8 - self.n)


def _fdct_q(block, q):
    coef = _C @ (block - 128.0) @ _C.T
    return np.round(coef / q.reshape(8, 8)).astype(np.int64)


def _emit_block(w, zz, pred, dc_enc, ac_enc):
    diff = int(zz[0]) - pred
    size = int(abs(diff)).bit_length()
    ln, code = dc_enc[size]
    w.write(code, ln)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_enc[0xF0]
            w.write(code, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        ln, code = ac_enc[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_enc[0x00]
        w.write(code, ln)
    return int(zz[0])


def encode_jpeg(img, *, qval=1, sampling=None, restart_interval=0):
    """img: (H, W, 1|3) uint8.  sampling: [(h, v), ...] per component."""
    h, w_, c = img.shape
    sampling = sampling or [(1, 1)] * c
    q = np.full(64, qval, dtype=np.int64)

    # color convert + build per-component planes (downsampled by box mean)
    f = img.astype(np.float64)
    if c == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128 + 0.5 * r - 0.418688 * g - 0.081312 * b]
    else:
        planes = [f[..., 0]]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x, mcus_y = -(-w_ // (8 * hmax)), -(-h // (8 * vmax))
    comp_planes = []
    for (sh, sv), p in zip(sampling, planes):
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:  # box-downsample (pad to divisible first)
            py = -(-p.shape[0] // ry) * ry
            px = -(-p.shape[1] // rx) * rx
            pp = np.pad(p, ((0, py - p.shape[0]), (0, px - p.shape[1])), mode="edge")
            p = pp.reshape(py // ry, ry, px // rx, rx).mean(axis=(1, 3))
        th, tw = mcus_y * 8 * sv, mcus_x * 8 * sh
        comp_planes.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                                  mode="edge"))

    dc_counts, dc_syms, dc_enc = _huff_spec(DC_SYMS)
    ac_counts, ac_syms, ac_enc = _huff_spec(AC_SYMS)

    def seg(marker, data):
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    out = bytearray(b"\xff\xd8")
    # uniform table: zigzag order == natural order byte-wise
    out += seg(0xDB, bytes([0]) + bytes(q.tolist()))
    sof = struct.pack(">BHHB", 8, h, w_, c)
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + dc_counts + dc_syms)
    out += seg(0xC4, bytes([0x10]) + ac_counts + ac_syms)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([c]) + b"".join(bytes([i + 1, 0x00]) for i in range(c)) + b"\x00\x3f\x00"
    out += seg(0xDA, sos)

    w = _BitWriter()
    pred = [0] * c
    rst = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.pad()
                out += w.out
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                w = _BitWriter()
                pred = [0] * c
            for ci, (sh, sv) in enumerate(sampling):
                for by in range(sv):
                    for bx in range(sh):
                        y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                        block = comp_planes[ci][y0: y0 + 8, x0: x0 + 8]
                        coef = _fdct_q(block, q)
                        zz = coef.reshape(64)[ZIGZAG]
                        pred[ci] = _emit_block(w, zz, pred[ci], dc_enc, ac_enc)
            mcu_count += 1
    w.pad()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# -- tests ---------------------------------------------------------------------

def test_grayscale_roundtrip():
    img = rng.integers(0, 256, size=(24, 17, 1), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (24, 17, 1)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_rgb_444_roundtrip():
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (16, 16, 3)
    # q=1: only DCT + YCbCr rounding
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_rgb_420_subsampled_roundtrip():
    # chroma constant over 2x2 cells so 4:2:0 downsample/upsample is exact
    small = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
    payload = encode_jpeg(img, sampling=[(2, 2), (1, 1), (1, 1)])
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_non_mcu_aligned_dimensions():
    # 4:2:2 horizontal chroma downsampling is only information-preserving
    # when pixel pairs share a color: build 13 cols from 7 doubled cols
    # (the odd final column pairs with its own edge-pad replicate)
    small = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    img = np.repeat(small, 2, axis=1)[:, :13]
    out = decode_jpeg(encode_jpeg(img, sampling=[(2, 1), (1, 1), (1, 1)]))
    assert out.shape == (11, 13, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_restart_markers():
    img = rng.integers(0, 256, size=(32, 32, 1), dtype=np.uint8)
    payload = encode_jpeg(img, restart_interval=2)
    assert b"\xff\xd0" in payload  # RST0 actually emitted
    out = decode_jpeg(payload)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_quantized_lossy_but_close():
    img = rng.integers(0, 256, size=(16, 16, 1), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, qval=4))
    err = np.abs(out.astype(float) - img.astype(float))
    assert err.mean() < 4.0


def test_sniffer_routes_jpeg():
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    arr, fmt = decode_image(encode_jpeg(img))
    assert fmt == "jpeg" and arr.shape == (8, 8, 3)


def test_progressive_rejected():
    img = rng.integers(0, 256, size=(8, 8, 1), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_truncated_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0junk")


def test_non_interleaved_scan_rejected():
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    i = payload.index(b"\xff\xda")
    # rewrite the 3-component SOS into a 1-component one (spec-legal
    # multi-scan layout this decoder deliberately rejects)
    old_len = struct.unpack(">H", payload[i + 2: i + 4])[0]
    new_sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00]) + \
        b"\x00\x3f\x00"
    payload[i: i + 2 + old_len] = new_sos
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(bytes(payload))
