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
# include (r << 4) | 0 EOBn symbols (r = 1..14) for progressive EOB runs
AC_SYMS = [0x00, 0xF0] + [r << 4 for r in range(1, 15)] + \
    [(r << 4) | s for r in range(16) for s in range(1, 11)]


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


def _coef_blocks(img, qval, sampling):
    """Quantized zigzag coefficient blocks per component on the padded
    MCU grid -> (coefs [(by, bx, 64) int64], q, mcus_x, mcus_y)."""
    h, w_, c = img.shape
    q = np.full(64, qval, dtype=np.int64)
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
    coefs = []
    for (sh, sv), p in zip(sampling, planes):
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:  # box-downsample (pad to divisible first)
            py = -(-p.shape[0] // ry) * ry
            px = -(-p.shape[1] // rx) * rx
            pp = np.pad(p, ((0, py - p.shape[0]), (0, px - p.shape[1])), mode="edge")
            p = pp.reshape(py // ry, ry, px // rx, rx).mean(axis=(1, 3))
        th, tw = mcus_y * 8 * sv, mcus_x * 8 * sh
        plane = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                       mode="edge")
        by, bx = th // 8, tw // 8
        blocks = np.empty((by, bx, 64), dtype=np.int64)
        for y in range(by):
            for x in range(bx):
                coef = _fdct_q(plane[8 * y: 8 * y + 8, 8 * x: 8 * x + 8], q)
                blocks[y, x] = coef.reshape(64)[ZIGZAG]
        coefs.append(blocks)
    return coefs, q, mcus_x, mcus_y


def _seg(marker, data):
    return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data


def _headers(img, q, sampling, sof_marker, restart_interval):
    h, w_, c = img.shape
    dc_counts, dc_syms, _ = _huff_spec(DC_SYMS)
    ac_counts, ac_syms, _ = _huff_spec(AC_SYMS)
    out = bytearray(b"\xff\xd8")
    # uniform table: zigzag order == natural order byte-wise
    out += _seg(0xDB, bytes([0]) + bytes(q.tolist()))
    sof = struct.pack(">BHHB", 8, h, w_, c)
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += _seg(sof_marker, sof)
    out += _seg(0xC4, bytes([0x00]) + dc_counts + dc_syms)
    out += _seg(0xC4, bytes([0x10]) + ac_counts + ac_syms)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    return out


def encode_jpeg(img, *, qval=1, sampling=None, restart_interval=0):
    """img: (H, W, 1|3) uint8.  sampling: [(h, v), ...] per component."""
    c = img.shape[2]
    sampling = sampling or [(1, 1)] * c
    coefs, q, mcus_x, mcus_y = _coef_blocks(img, qval, sampling)
    _, _, dc_enc = _huff_spec(DC_SYMS)
    _, _, ac_enc = _huff_spec(AC_SYMS)
    out = _headers(img, q, sampling, 0xC0, restart_interval)
    sos = bytes([c]) + b"".join(bytes([i + 1, 0x00]) for i in range(c)) + b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

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
                        zz = coefs[ci][my * sv + by, mx * sh + bx]
                        pred[ci] = _emit_block(w, zz, pred[ci], dc_enc, ac_enc)
            mcu_count += 1
    w.pad()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# -- minimal progressive encoder ------------------------------------------------

class _ProgWriter(_BitWriter):
    """Bit writer with AC-refinement helpers: pending EOB-run state and
    the correction bits buffered behind it (libjpeg's BE buffer)."""

    def __init__(self):
        super().__init__()
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def flush_eobrun(self, ac_enc):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            ln, code = ac_enc[r << 4]
            self.write(code, ln)
            if r:
                self.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.pending_bits:
            self.write(bit, 1)
        self.pending_bits = []


def _emit_ac_first(w, zz, ss, se, al, ac_enc):
    """AC first scan for one block: point-transformed values with EOB
    runs accumulated across blocks (flush with w.flush_eobrun)."""
    vals = [int(np.sign(zz[k])) * (abs(int(zz[k])) >> al)
            for k in range(ss, se + 1)]
    nz = [i for i, v in enumerate(vals) if v]
    if not nz:
        w.eobrun += 1
        if w.eobrun == 0x7FFF:
            w.flush_eobrun(ac_enc)
        return
    w.flush_eobrun(ac_enc)
    run = 0
    for i in range(nz[-1] + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_enc[0xF0]
            w.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        ln, code = ac_enc[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if nz[-1] < se - ss:
        w.eobrun += 1


def _emit_ac_refine(w, zz, ss, se, al, ac_enc):
    """AC refinement scan for one block (libjpeg jcphuff
    encode_mcu_AC_refine structure): newly-significant coefficients get
    (run|1) codes + sign, already-significant ones append correction
    bits; trailing state rides the shared EOB run."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = max((i for i, t in enumerate(absv) if t == 1), default=-1)
    run = 0
    br: list[int] = []  # correction bits since the last emitted symbol
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            w.flush_eobrun(ac_enc)
            ln, code = ac_enc[0xF0]
            w.write(code, ln)
            run -= 16
            for bit in br:
                w.write(bit, 1)
            br = []
        if t > 1:  # history coefficient: one correction bit
            br.append(t & 1)
            continue
        # newly significant (scaled magnitude exactly 1)
        w.flush_eobrun(ac_enc)
        ln, code = ac_enc[(run << 4) | 1]
        w.write(code, ln)
        w.write(0 if int(zz[ss + i]) < 0 else 1, 1)
        for bit in br:
            w.write(bit, 1)
        br = []
        run = 0
    if run > 0 or br:
        w.eobrun += 1
        w.pending_bits.extend(br)
        if w.eobrun == 0x7FFF:
            w.flush_eobrun(ac_enc)


def encode_jpeg_progressive(img, *, qval=1, sampling=None, dc_al=1, ac_al=1,
                            ac_split=32, restart_interval=0):
    """Progressive (SOF2) encoder covering every decoder path: an
    interleaved DC-first scan at ``Al=dc_al`` + DC refinement bit scans,
    then per-component AC-first scans at ``Al=ac_al`` over two spectral
    bands (split at ``ac_split``) + AC refinement scans.  Transmits all
    coefficient bits, so the decode equals the baseline decode of the
    same image exactly."""
    c = img.shape[2]
    sampling = sampling or [(1, 1)] * c
    coefs, q, mcus_x, mcus_y = _coef_blocks(img, qval, sampling)
    _, _, dc_enc = _huff_spec(DC_SYMS)
    _, _, ac_enc = _huff_spec(AC_SYMS)
    out = _headers(img, q, sampling, 0xC2, restart_interval)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    h, w_ = img.shape[:2]

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def mcu_iter():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                units = []
                for ci, (sh, sv) in enumerate(sampling):
                    for by in range(sv):
                        for bx in range(sh):
                            units.append((ci, my * sv + by, mx * sh + bx))
                yield units

    def comp_iter(ci):
        sh, sv = sampling[ci]
        comp_w = -(-w_ * sh // hmax)  # ceil(w * h_c / hmax)
        comp_h = -(-h * sv // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        for by in range(bh):
            for bx in range(bw):
                yield [(ci, by, bx)]

    def run_scan(units_fn, body):
        nonlocal out
        w = _ProgWriter()
        rst = 0
        state = {"pred": [0] * c}
        for ui, units in enumerate(units_fn()):
            if restart_interval and ui and ui % restart_interval == 0:
                w.flush_eobrun(ac_enc)
                w.pad()
                out += w.out
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                w = _ProgWriter()
                state["pred"] = [0] * c
            for ci, by, bx in units:
                body(w, state, ci, coefs[ci][by, bx])
        w.flush_eobrun(ac_enc)
        w.pad()
        out += w.out

    # scan 1: interleaved DC first at Al=dc_al (arithmetic-shifted diffs)
    out += sos([i + 1 for i in range(c)], 0, 0, 0, dc_al)

    def dc_first(w, state, ci, zz):
        v = int(zz[0]) >> dc_al
        diff = v - state["pred"][ci]
        state["pred"][ci] = v
        size = abs(diff).bit_length()
        ln, code = dc_enc[size]
        w.write(code, ln)
        if size:
            w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)

    run_scan(mcu_iter, dc_first)

    # DC refinement scans: one raw bit per block per precision level
    for al in range(dc_al - 1, -1, -1):
        out += sos([i + 1 for i in range(c)], 0, 0, al + 1, al)
        run_scan(mcu_iter,
                 lambda w, state, ci, zz, _al=al: w.write((int(zz[0]) >> _al) & 1, 1))

    # AC scans: per component, two spectral bands, first + refinements
    bands = [(1, ac_split), (ac_split + 1, 63)] if 1 <= ac_split < 63 else [(1, 63)]
    for ci in range(c):
        for ss, se in bands:
            out += sos([ci + 1], ss, se, 0, ac_al)
            run_scan(lambda ci=ci: comp_iter(ci),
                     lambda w, state, _ci, zz, _ss=ss, _se=se:
                     _emit_ac_first(w, zz, _ss, _se, ac_al, ac_enc))
    for al in range(ac_al - 1, -1, -1):
        for ci in range(c):
            for ss, se in bands:
                out += sos([ci + 1], ss, se, al + 1, al)
                run_scan(lambda ci=ci: comp_iter(ci),
                         lambda w, state, _ci, zz, _ss=ss, _se=se, _al=al:
                         _emit_ac_refine(w, zz, _ss, _se, _al, ac_enc))

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


def test_progressive_matches_baseline_gray():
    img = rng.integers(0, 256, size=(24, 17, 1), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(prog, base)  # same coefficients -> same pixels


def test_progressive_matches_baseline_rgb_420():
    small = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)[:17, :13]
    sampling = [(2, 2), (1, 1), (1, 1)]
    base = decode_jpeg(encode_jpeg(img, sampling=sampling))
    prog = decode_jpeg(encode_jpeg_progressive(img, sampling=sampling))
    assert prog.shape == (17, 13, 3)
    assert np.array_equal(prog, base)


def test_progressive_quantized_and_deep_approximation():
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, qval=3))
    prog = decode_jpeg(encode_jpeg_progressive(img, qval=3, dc_al=2, ac_al=2))
    assert np.array_equal(prog, base)


def test_progressive_spectral_selection_only():
    # ac_al=0 / dc_al=0: no refinement scans — bands + EOB runs only
    img = rng.integers(0, 256, size=(16, 24, 1), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img, dc_al=0, ac_al=0,
                                               ac_split=5))
    assert np.array_equal(prog, base)


def test_progressive_restart_markers():
    img = rng.integers(0, 256, size=(32, 32, 1), dtype=np.uint8)
    payload = encode_jpeg_progressive(img, restart_interval=3)
    assert b"\xff\xd0" in payload
    assert np.array_equal(decode_jpeg(payload),
                          decode_jpeg(encode_jpeg(img)))


def test_progressive_flat_image_eob_runs():
    # constant image: every AC band is all-zero -> maximal EOB runs
    img = np.full((40, 40, 1), 130, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(img)),
                          decode_jpeg(encode_jpeg(img)))


def test_progressive_via_sniffer():
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    arr, fmt = decode_image(encode_jpeg_progressive(img))
    assert fmt == "jpeg" and arr.shape == (8, 8, 3)


def test_unsupported_sof_rejected():
    img = rng.integers(0, 256, size=(8, 8, 1), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC9  # SOF9: arithmetic coding
    with pytest.raises(ValueError, match="SOF"):
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
