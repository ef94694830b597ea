"""GIF decoder (stages/imagecodec.decode_gif): LZW, palettes,
interlacing, sub-frame composition.  The test encodes GIFs itself with
a real dictionary-building LZW encoder (LSB-first, dynamic widths),
so round-trips validate both directions of the table discipline."""

import struct

import numpy as np
import pytest

from docetl_ray.stages.imagecodec import decode_gif, decode_image

rng = np.random.default_rng(23)


class _BitWriterLSB:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = self.n = 0


def lzw_encode(indices, min_code_size):
    clear = 1 << min_code_size
    end = clear + 1
    w = _BitWriterLSB()
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    w.write(clear, width)
    cur = b""
    for px in bytes(indices):
        cand = cur + bytes([px])
        if cand in table:
            cur = cand
            continue
        w.write(table[cur], width)
        table[cand] = next_code
        next_code += 1
        # the decoder's table count trails the encoder's next_code by one
        # (its first code after a clear adds no entry), so widen one code
        # later than the naive next_code == 1<<width
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:  # table full: reset
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([px])
    if cur:
        w.write(table[cur], width)
    w.write(end, width)
    w.flush()
    return bytes(w.out)


def encode_gif(img_idx, palette, *, interlace=False, frame_box=None,
               screen=None, extension=True):
    """img_idx: (h, w) uint8 palette indices; palette: (n, 3) uint8."""
    h, w = img_idx.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length() - 1)  # 2 << f >= n
    while (2 << size_field) < n:
        size_field += 1
    sw, sh = screen or (w, h)
    left, top = (frame_box or (0, 0))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | size_field, 0, 0)
    pal = np.zeros((2 << size_field, 3), np.uint8)
    pal[:n] = palette
    out += pal.tobytes()
    if extension:  # graphics control extension: decoder must skip it
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h,
                                 0x40 if interlace else 0x00)
    if interlace:
        rows = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                               np.arange(2, h, 4), np.arange(1, h, 2)])
        img_idx = img_idx[rows]
    min_code = max(2, size_field + 1)
    out.append(min_code)
    data = lzw_encode(img_idx.reshape(-1), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_roundtrip_4color():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                       np.uint8)
    idx = rng.integers(0, 4, size=(13, 9), dtype=np.uint8)
    out = decode_gif(encode_gif(idx, palette))
    np.testing.assert_array_equal(out, palette[idx])


def test_gif_roundtrip_256color_compressible():
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    # long runs force real dictionary growth and width escalation
    idx = np.repeat(rng.integers(0, 256, size=(40,), dtype=np.uint8), 60) \
        .reshape(40, 60)
    out = decode_gif(encode_gif(idx, palette))
    np.testing.assert_array_equal(out, palette[idx])


def test_gif_table_reset_path():
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    # high-entropy 128x128: the dictionary hits 4096 and must reset
    idx = rng.integers(0, 256, size=(128, 128), dtype=np.uint8)
    out = decode_gif(encode_gif(idx, palette))
    np.testing.assert_array_equal(out, palette[idx])


def test_gif_interlaced():
    palette = np.array([[i, i, i] for i in range(16)], np.uint8)
    idx = rng.integers(0, 16, size=(19, 7), dtype=np.uint8)
    out = decode_gif(encode_gif(idx, palette, interlace=True))
    np.testing.assert_array_equal(out, palette[idx])


def test_gif_subframe_composited_on_screen():
    palette = np.array([[255, 255, 255], [0, 0, 0]], np.uint8)
    idx = np.ones((2, 3), np.uint8)
    out = decode_gif(encode_gif(idx, palette, frame_box=(4, 5),
                                screen=(10, 9)))
    assert out.shape == (9, 10, 3)
    assert (out[5:7, 4:7] == 0).all()      # the frame
    assert (out[0, 0] == [255, 255, 255]).all()  # index-0 background


def test_gif_via_sniffer_and_garbage():
    palette = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.zeros((4, 4), np.uint8)
    arr, fmt = decode_image(encode_gif(idx, palette))
    assert fmt == "gif" and arr.shape == (4, 4, 3)
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a\x00")  # truncated


def test_gif_background_color_index_used():
    from docetl_ray.stages.imagecodec import decode_gif as _dg

    palette = np.array([[255, 255, 255], [0, 0, 0], [7, 8, 9]], np.uint8)
    idx = np.ones((2, 3), np.uint8)
    payload = bytearray(encode_gif(idx, palette, frame_box=(4, 5),
                                   screen=(10, 9)))
    payload[11] = 2  # background color index byte in the screen descriptor
    out = _dg(bytes(payload))
    assert (out[0, 0] == [7, 8, 9]).all()   # bg index honored
    assert (out[5:7, 4:7] == 0).all()       # frame untouched


def test_gif_subframe_local_palette_background_from_global():
    """The background color index refers to the GLOBAL color table even
    when the frame carries a LOCAL palette (GIF89a spec §18)."""
    global_pal = np.array([[255, 255, 255], [0, 0, 0], [10, 20, 30]],
                          np.uint8)
    local_pal = np.array([[200, 0, 0], [0, 200, 0], [99, 99, 99]], np.uint8)
    idx = np.ones((2, 3), np.uint8)  # frame pixels = local color #1 green
    payload = bytearray(encode_gif(idx, global_pal, frame_box=(4, 5),
                                   screen=(10, 9)))
    payload[11] = 2  # background = GLOBAL #2 = [10, 20, 30]
    # graft a local color table onto the image descriptor: set the
    # local-table flag (bit 7) + size, then insert the palette bytes
    desc = payload.index(b"\x2c")
    packed = desc + 9  # descriptor packed byte
    size_field = 1  # 2 << 1 = 4 entries
    payload[packed] = 0x80 | size_field
    lp = np.zeros((2 << size_field, 3), np.uint8)
    lp[:3] = local_pal
    payload[packed + 1: packed + 1] = lp.tobytes()
    out = decode_gif(bytes(payload))
    assert (out[5:7, 4:7] == [0, 200, 0]).all()  # frame uses LOCAL palette
    assert (out[0, 0] == [10, 20, 30]).all()     # bg from GLOBAL palette
