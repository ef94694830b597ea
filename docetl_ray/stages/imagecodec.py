"""Pure-stdlib image/audio decoders for the multimodal stages.

The reference treats image/audio decoding as a library call (PIL /
librosa / ffmpeg — none present here).  But several common formats are
decodable with nothing beyond ``zlib`` + numpy:

- PNG — zlib-compressed filtered scanlines (RFC 2083): 8-bit depth,
  color types gray / gray+alpha / RGB / RGBA / palette (PLTE), all five
  scanline filters (none/sub/up/average/paeth), non-interlaced or
  Adam7-interlaced.
- BMP — uncompressed 24/32-bit BITMAPINFOHEADER, bottom-up or top-down.
- PPM / PGM — binary P6 / P5, maxval <= 255.
- GIF — 87a/89a first frame: pure-Python LZW, global/local palettes,
  interlacing; transparency index renders as the palette color.
- WAV — PCM RIFF via the stdlib ``wave`` module (8/16/32-bit).
- JPEG — baseline sequential AND progressive (SOF2, spectral selection
  + successive approximation) via ``jpegcodec.py`` (pure-Python huffman
  entropy decode + numpy IDCT; arithmetic coding unsupported).

These power the REAL (``fake=False``) decode path of
``stages/multimodal.py``; WebP and inter-frame video codecs stay
honestly stubbed (MJPEG-in-AVI decodes via ``avi_mjpeg_frames`` + the
JPEG decoder).  Decoders
return ``(array, format)`` with ``array`` shaped (H, W, C) uint8, or
raise ``ValueError`` on unsupported input — actor-pool callers decide
whether to skip or fail the row.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channel count (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_defilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering.  Vertical-only filters (none/up) are
    vectorized per row; left-dependent ones (sub/average/paeth) walk the
    row in C-speed numpy int16 arithmetic per pixel column group."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1: pos + 1 + stride].astype(np.int16)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int16) if y > 0 else np.zeros(stride, np.int16)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:  # Sub
                    v = line[x] + a
                elif ftype == 3:  # Average
                    v = line[x] + ((a + b) >> 1)
                elif ftype == 4:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                else:
                    raise ValueError(f"unknown PNG filter {ftype}")
                cur[x] = v & 0xFF
        out[y] = cur.astype(np.uint8)
    return out


#: Adam7 interlace passes: (row start, row step, col start, col step)
_ADAM7 = [(0, 8, 0, 8), (0, 8, 4, 8), (4, 8, 0, 4), (0, 4, 2, 4),
          (2, 4, 0, 2), (0, 2, 1, 2), (1, 2, 0, 1)]


def decode_png(payload: bytes) -> np.ndarray:
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos: pos + 4])
        ctype = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or (color_type not in _PNG_CHANNELS and color_type != 3):
        raise ValueError(
            f"unsupported PNG (depth={bit_depth}, color_type={color_type}); "
            "sub-8-bit/16-bit need a full decoder")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    channels = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 1:  # Adam7: 7 independently-filtered sub-images
        img = np.zeros((height, width, channels), dtype=np.uint8)
        off = 0
        for r0, rs, c0, cs in _ADAM7:
            ph = len(range(r0, height, rs))
            pw = len(range(c0, width, cs))
            if ph == 0 or pw == 0:
                continue
            stride = pw * channels
            size = ph * (stride + 1)
            sub = _png_defilter(raw[off: off + size], ph, stride, channels)
            img[r0::rs, c0::cs] = sub.reshape(ph, pw, channels)
            off += size
        if off != raw.size:
            raise ValueError("PNG Adam7 data size mismatch")
    elif interlace == 0:
        stride = width * channels
        if raw.size != height * (stride + 1):
            raise ValueError("PNG scanline data size mismatch")
        img = _png_defilter(raw, height, stride, channels).reshape(
            height, width, channels)
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if color_type == 3:
        img = plte[img[..., 0]]  # palette indices -> RGB
    return img


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    (header_size,) = struct.unpack("<I", payload[14:18])
    if header_size < 40:
        raise ValueError("BMP core header unsupported")
    width, height = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    channels = bpp // 8
    row_size = (width * channels + 3) & ~3  # rows pad to 4 bytes
    img = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * height, offset=data_offset
    ).reshape(height, row_size)[:, : width * channels]
    img = img.reshape(height, width, channels)
    if bottom_up:
        img = img[::-1]
    # BMP stores BGR(A) -> return RGB(A)
    rgb = img[..., [2, 1, 0]] if channels == 3 else img[..., [2, 1, 0, 3]]
    return np.ascontiguousarray(rgb)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P5 (gray) / P6 (RGB), maxval <= 255."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    channels = 1 if payload[:2] == b"P5" else 3
    # header = magic, width, height, maxval — whitespace/comment separated
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos: pos + 1].isspace():
            pos += 1
        if payload[pos: pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos: pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return np.frombuffer(payload, np.uint8, count=width * height * channels,
                         offset=pos).reshape(height, width, channels)


def _gif_lzw(data: bytes, min_code_size: int, npixels: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first bit packing, dynamic code width 3-12
    bits, CLEAR resets the table.  Returns palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(npixels, dtype=np.uint8)
    n_out = 0
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    acc = nbits = pos = 0
    while n_out < npixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # freeze at cap (deferred-clear GIFs)
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        take = min(len(entry), npixels - n_out)
        out[n_out: n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        # widen once the next code to assign (len(table)) would not fit
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if n_out < npixels:
        raise ValueError("GIF pixel data ended early")
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a as (H, W, 3) uint8 RGB."""
    if payload[:4] != b"GIF8" or len(payload) < 14:
        raise ValueError("not a GIF (or truncated header)")
    sw, sh, packed, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(payload, np.uint8, count=3 * n,
                                   offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack("<HHHHB",
                                                     payload[pos: pos + 9])
            pos += 9
            pal = global_pal
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(payload, np.uint8, count=3 * n,
                                    offset=pos).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data.extend(payload[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw(bytes(data), min_code_size, w * h).reshape(h, w)
            if ipacked & 0x40:  # interlaced: 4-pass row shuffle
                rows = np.concatenate([np.arange(0, h, 8),
                                       np.arange(4, h, 8),
                                       np.arange(2, h, 4),
                                       np.arange(1, h, 2)])
                deinter = np.empty_like(idx)
                deinter[rows] = idx
                idx = deinter
            # first frame only; compose onto the logical screen if
            # smaller.  The background color index refers to the GLOBAL
            # color table (GIF89a spec §18) — the frame may use a LOCAL
            # palette, so compose in RGB space, not index space
            if (left, top, w, h) != (0, 0, sw, sh):
                if global_pal is not None and bg < len(global_pal):
                    bg_rgb = global_pal[bg]
                else:
                    bg_rgb = np.zeros(3, dtype=np.uint8)
                full = np.empty((sh, sw, 3), dtype=np.uint8)
                full[:] = bg_rgb
                full[top: top + h, left: left + w] = pal[idx]
                return full
            return pal[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"corrupt GIF block 0x{block:02x}")
    raise ValueError("GIF has no image data")


def decode_image(payload: bytes) -> tuple[np.ndarray, str]:
    """Sniff + decode -> ((H, W, C) uint8, format name).

    Guarantees the module contract that bad input raises ``ValueError``:
    low-level errors from truncated/corrupt payloads (struct.error,
    zlib.error, IndexError, ...) are normalized here so callers like the
    multimodal stage's ``on_error="skip"`` can rely on one exception
    type."""
    try:
        if payload[:8] == _PNG_SIG:
            return decode_png(payload), "png"
        if payload[:2] == b"BM":
            return decode_bmp(payload), "bmp"
        if payload[:2] in (b"P5", b"P6"):
            return decode_ppm(payload), "ppm"
        if payload[:4] == b"GIF8":
            return decode_gif(payload), "gif"
        if payload[:3] == b"\xff\xd8\xff":
            # baseline or progressive JPEG: pure-Python/numpy
            # huffman+IDCT (jpegcodec.py); arithmetic coding raises there
            from .jpegcodec import decode_jpeg

            return decode_jpeg(payload), "jpeg"
    except ValueError:
        raise
    except (struct.error, zlib.error, IndexError, KeyError, OverflowError,
            EOFError) as e:
        raise ValueError(f"corrupt or truncated image payload: {e}") from e
    raise ValueError("unrecognized image format")


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic feature vector from a decoded image: per-channel
    mean/std (normalized to [0,1]) followed by a coarse grayscale grid
    (block means), truncated/padded to ``dim``."""
    h, w, c = img.shape
    f = np.asarray(img, dtype=np.float64) / 255.0
    parts = []
    for ch in range(min(c, 4)):
        parts += [float(f[..., ch].mean()), float(f[..., ch].std())]
    gray = f[..., : min(c, 3)].mean(axis=2)
    g = max(1, int(np.sqrt(max(0, dim - len(parts)))))
    ys = np.linspace(0, h, g + 1).astype(int)
    xs = np.linspace(0, w, g + 1).astype(int)
    for i in range(g):
        for j in range(g):
            cell = gray[ys[i]: max(ys[i] + 1, ys[i + 1]),
                        xs[j]: max(xs[j] + 1, xs[j + 1])]
            parts.append(float(cell.mean()))
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(parts))] = parts[:dim]
    return out


def avi_mjpeg_frames(payload: bytes) -> tuple[list[bytes], float]:
    """MJPEG-in-AVI: return (JPEG payloads in stream order, seconds per
    frame).  AVI is a RIFF container — video frames live in '00dc'/'00db'
    chunks under the 'movi' list and each MJPEG frame is a standalone
    baseline JPEG (decodable by ``jpegcodec``).  Non-MJPEG codecs surface
    as frames that fail the JPEG signature check -> ValueError.  This is
    the one video container decodable with the stdlib; anything needing
    inter-frame codecs (H.264 etc.) raises where ffmpeg would plug in."""
    if payload[:4] != b"RIFF" or payload[8:12] not in (b"AVI ", b"AVIX"):
        raise ValueError("not an AVI file")
    frames: list[bytes] = []
    spf = 1.0 / 25.0  # default frame duration; avih overrides below

    def walk(buf: bytes, start: int, end: int):
        nonlocal spf
        pos = start
        while pos + 8 <= end:
            fourcc = buf[pos: pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4: pos + 8])
            body = pos + 8
            if fourcc in (b"RIFF", b"LIST"):
                walk(buf, body + 4, min(body + size, end))
            elif fourcc == b"avih" and size >= 4:
                (usec,) = struct.unpack("<I", buf[body: body + 4])
                if usec > 0:
                    spf = usec / 1e6
            elif fourcc[2:4] in (b"dc", b"db"):  # compressed/uncompressed video
                frames.append(buf[body: body + size])
            pos = body + size + (size & 1)  # chunks pad to even

    walk(payload, 0, len(payload))
    if not frames:
        raise ValueError("AVI contains no video frames")
    if frames[0][:3] != b"\xff\xd8\xff":
        raise ValueError("AVI video stream is not MJPEG; needs ffmpeg")
    return frames, spf


_WAV_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float64 mono samples in [-1, 1], sample rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sampwidth, rate, nframes = (w.getnchannels(), w.getsampwidth(),
                                         w.getframerate(), w.getnframes())
        frames = w.readframes(nframes)
    if sampwidth not in _WAV_DTYPES:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    samples = np.frombuffer(frames, dtype=_WAV_DTYPES[sampwidth]).astype(np.float64)
    if sampwidth == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = (samples - 128.0) / 128.0
    else:
        samples = samples / float(2 ** (8 * sampwidth - 1))
    if nch > 1:
        samples = samples[: (samples.size // nch) * nch] \
            .reshape(-1, nch).mean(axis=1)
    return samples, rate


def wav_frame_energies(payload: bytes, num_frames: int) -> list[float]:
    """RMS energy of ``num_frames`` equal windows over the mono mixdown."""
    samples, _ = decode_wav(payload)
    if samples.size == 0:
        return [0.0] * num_frames
    bounds = np.linspace(0, samples.size, num_frames + 1).astype(int)
    out = []
    for i in range(num_frames):
        win = samples[bounds[i]: max(bounds[i] + 1, bounds[i + 1])]
        out.append(float(np.sqrt(np.mean(win * win))))
    return out
