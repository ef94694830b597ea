"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``.

Two decode paths:

- ``fake=True`` (default) — deterministic content-hash-derived features,
  so the Ray-side plumbing (schema, batch sizing, actor signature,
  output layout) is testable and the DuckDB correctness oracle can
  replicate the values bit-for-bit (``sql_parity``).
- ``fake=False`` — REAL decode for stdlib-decodable formats via
  ``stages/imagecodec.py`` / ``jpegcodec.py``: PNG/BMP/PPM/GIF and
  JPEG (baseline + progressive) images, PCM WAV audio, MJPEG-in-AVI
  video keyframes.  WebP and inter-frame video codecs remain honestly
  stubbed — those genuinely need libwebp/ffmpeg; their ``ValueError``
  is where such a decoder plugs in (``on_error="skip"`` drops
  undecodable rows instead of failing).

Batch-size guidance: binary payloads are wide — size ``batch_size`` so
``batch_size × mean_payload × concurrency`` fits the worker heap (see
module users; default 64 rows).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

IMAGE_META_TYPE = pa.struct(
    {"width": pa.int32(), "height": pa.int32(), "format": pa.string()}
)


class ImageFeatureStage:
    """Actor-pool stage: decode image bytes -> fixed-size feature vector.

    Use as ``ds.map_batches(ImageFeatureStage, batch_size=64,
    concurrency=N, num_cpus=1, batch_format="pyarrow")``.  Real decoder
    state (model weights, codec contexts) belongs in ``__init__`` — run
    once per actor, never per batch.
    """

    __name__ = "image_features"

    def __init__(self, *, dim: int = 16, fake: bool = True, bytes_col: str = "image",
                 sql_parity: bool = False, on_error: str = "raise"):
        self.dim = dim
        self.fake = fake
        self.bytes_col = bytes_col
        # sql_parity: md5-derived float64 features with 12-bit mantissas,
        # exactly replicable in DuckDB for the correctness oracle
        self.sql_parity = sql_parity
        self.on_error = on_error
        # heavier decoder/model state would load here, once per actor

    def _decode(self, payload: bytes | None) -> np.ndarray:
        dtype = np.float64 if self.sql_parity else np.float32
        if payload is None:
            return np.zeros(self.dim, dtype=dtype)
        if not self.fake:
            # real stdlib decode: PNG/BMP/PPM/GIF/baseline-JPEG
            # (imagecodec.py); undecodable formats raise ValueError —
            # handled per on_error in __call__
            from .imagecodec import decode_image, image_features

            img, self._last_format = decode_image(payload)
            self._last_shape = img.shape
            return image_features(img, self.dim)
        if self.sql_parity:
            import hashlib

            vals = np.empty(self.dim, dtype=np.float64)
            for i in range(self.dim):
                h = int.from_bytes(
                    hashlib.md5(payload + b":" + str(i).encode()).digest()[:8], "big"
                )
                vals[i] = (h % 4096) / 4096.0
            return vals
        # deterministic fake: crc32-seeded feature vector
        h = zlib.crc32(payload)
        vals = np.empty(self.dim, dtype=np.float32)
        x = np.uint64(h or 1)
        for i in range(self.dim):
            x = np.uint64((int(x) * 6364136223846793005 + 1442695040888963407) & (2**64 - 1))
            vals[i] = (int(x) >> 33) / 2**31 - 1.0
        return vals

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bytes_col].to_pylist()
        ftype = pa.list_(pa.float64() if self.sql_parity else pa.float32())
        if self.fake:
            feats = [self._decode(b).tolist() for b in payloads]
            sizes = [len(b) if b is not None else 0 for b in payloads]
            out = batch.drop_columns([self.bytes_col])  # project payload away early
            out = out.append_column("image_bytes_len", pa.array(sizes, pa.int64()))
            return out.append_column("image_features", pa.array(feats, ftype))
        # real decode path: true metadata columns; on_error="skip" drops
        # undecodable rows (e.g. JPEG without libjpeg) instead of failing
        keep, feats, sizes, widths, heights, formats = [], [], [], [], [], []
        for i, b in enumerate(payloads):
            try:
                vec = self._decode(b)
            except ValueError:
                if self.on_error == "skip":
                    continue
                raise
            keep.append(i)
            feats.append(vec.tolist())
            sizes.append(len(b) if b is not None else 0)
            if b is None:
                widths.append(0), heights.append(0), formats.append("empty")
            else:
                h, w = self._last_shape[:2]
                widths.append(w), heights.append(h)
                formats.append(self._last_format)
        out = batch.drop_columns([self.bytes_col]).take(pa.array(keep, pa.int64()))
        out = out.append_column("image_bytes_len", pa.array(sizes, pa.int64()))
        out = out.append_column("image_width", pa.array(widths, pa.int32()))
        out = out.append_column("image_height", pa.array(heights, pa.int32()))
        out = out.append_column("image_format", pa.array(formats, pa.string()))
        return out.append_column("image_features", pa.array(feats, ftype))


class AudioFrameSampleStage:
    """Actor-pool stage: sample N frames/windows from an audio payload;
    emits one row per sampled frame (``flat_map``-shaped: more rows out
    than in).  ``fake=False`` really decodes PCM WAV (module docstring);
    compressed audio raises/skips per ``on_error``.
    """

    __name__ = "audio_frames"

    def __init__(self, *, num_frames: int = 4, fake: bool = True, bytes_col: str = "audio",
                 sql_parity: bool = False, on_error: str = "raise"):
        self.num_frames = num_frames
        self.fake = fake
        self.bytes_col = bytes_col
        # sql_parity: md5-derived frame energies, exactly replicable in
        # DuckDB (md5(payload || ':' || frame) prefix % 10000 / 10000)
        self.sql_parity = sql_parity
        self.on_error = on_error

    def _energy(self, payload: bytes, f: int) -> float:
        if self.sql_parity:
            import hashlib

            h = int.from_bytes(
                hashlib.md5(payload + b":" + str(f).encode()).digest()[:8], "big"
            )
            return (h % 10_000) / 10_000.0
        return (zlib.crc32(payload, f) % 10_000) / 10_000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx, frame_no, energy = [], [], []
        payloads = batch[self.bytes_col].to_pylist()
        for i, b in enumerate(payloads):
            if not b:
                continue
            if self.fake:
                energies = [self._energy(b, f) for f in range(self.num_frames)]
            else:
                # real stdlib decode: PCM WAV windowed RMS (imagecodec.py);
                # compressed formats raise — skipped under on_error="skip"
                import wave

                from .imagecodec import wav_frame_energies

                try:
                    energies = wav_frame_energies(b, self.num_frames)
                except (ValueError, EOFError, wave.Error, struct.error):
                    if self.on_error == "skip":
                        continue
                    raise
            for f, en in enumerate(energies):
                idx.append(i)
                frame_no.append(f)
                energy.append(en)
        out = batch.drop_columns([self.bytes_col]).take(pa.array(idx, pa.int64()))
        out = out.append_column("frame_no", pa.array(frame_no, pa.int32()))
        return out.append_column("frame_energy", pa.array(energy, pa.float64()))


class VideoKeyframeStage:
    """Actor-pool stage: sample keyframes from a video payload and emit
    one row per keyframe with a feature vector (flat_map-shaped).

    ``fake=True`` derives deterministic frame timestamps/features from
    the payload hash (the oracle path); ``fake=False`` REALLY decodes
    MJPEG-in-AVI (RIFF walk + the baseline JPEG decoder — the one video
    container the stdlib can handle): evenly-sampled frames become
    ``image_features`` vectors at their stream timestamps.  Inter-frame
    codecs (H.264 etc.) raise ValueError where an ffmpeg/PyAV reader
    plugs in; ``on_error="skip"`` drops those rows.
    Batch sizing: video payloads are the widest rows — use small
    ``batch_size`` (default 8) so batch x concurrency fits worker heap.
    """

    __name__ = "video_keyframes"

    def __init__(self, *, num_keyframes: int = 3, dim: int = 8, fake: bool = True,
                 bytes_col: str = "video", sql_parity: bool = False,
                 on_error: str = "raise"):
        self.num_keyframes = num_keyframes
        self.dim = dim
        self.fake = fake
        self.bytes_col = bytes_col
        # sql_parity: md5-derived duration/features with small-integer
        # mantissas, exactly replicable in DuckDB for the oracle
        self.sql_parity = sql_parity
        self.on_error = on_error

    def _real_frames(self, payload: bytes):
        """Decode MJPEG-AVI and sample num_keyframes evenly; yields
        (timestamp_sec, feature_vector) per sampled frame."""
        from .imagecodec import avi_mjpeg_frames, decode_image, image_features

        frames, spf = avi_mjpeg_frames(payload)
        n = min(self.num_keyframes, len(frames))
        picks = np.linspace(0, len(frames) - 1, n).round().astype(int)
        for f in picks:
            # decode_image normalizes corrupt-frame errors to ValueError
            img, _ = decode_image(frames[f])
            yield float(f) * spf, image_features(img, self.dim).tolist()

    def _fake_frame(self, payload: bytes, f: int):
        if self.sql_parity:
            import hashlib

            hd = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
            dur = 1.0 + (hd % 600)
            ts = dur * (f + 0.5) / self.num_keyframes
            v = []
            for d in range(self.dim):
                hf = int.from_bytes(
                    hashlib.md5(payload + f":{f}:{d}".encode()).digest()[:8], "big"
                )
                v.append((hf % 4096) / 4096.0)
            return ts, v
        h = zlib.crc32(payload)
        dur = 1.0 + (h % 600)  # fake duration seconds
        ts = dur * (f + 0.5) / self.num_keyframes
        x = np.uint64((h + f * 2654435761) or 1)
        v32 = np.empty(self.dim, dtype=np.float32)
        for d in range(self.dim):
            x = np.uint64((int(x) * 6364136223846793005 + 1442695040888963407) & (2**64 - 1))
            v32[d] = (int(x) >> 33) / 2**31 - 1.0
        return ts, v32.tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx, frame_ts, feats = [], [], []
        for i, b in enumerate(batch[self.bytes_col].to_pylist()):
            if not b:
                continue
            if not self.fake:
                try:
                    # materialize BEFORE appending: _real_frames is a
                    # generator, so a mid-stream decode failure after
                    # direct appends would leave partial keyframe rows
                    # for a video the skip contract says was dropped
                    row_entries = list(self._real_frames(b))
                except ValueError:
                    if self.on_error == "skip":
                        continue
                    raise
                for ts, v in row_entries:
                    idx.append(i)
                    frame_ts.append(ts)
                    feats.append(v)
                continue
            for f in range(self.num_keyframes):
                ts, v = self._fake_frame(b, f)
                idx.append(i)
                frame_ts.append(ts)
                feats.append(v)
        ftype = pa.list_(pa.float64() if self.sql_parity else pa.float32())
        out = batch.drop_columns([self.bytes_col]).take(pa.array(idx, pa.int64()))
        out = out.append_column("keyframe_ts", pa.array(frame_ts, pa.float64()))
        return out.append_column("keyframe_features", pa.array(feats, ftype))


def image_pipeline(ds, *, bytes_col: str = "image", concurrency=(1, 4),
                   batch_size: int = 64, sql_parity: bool = False):
    """Canonical multimodal wiring: small batches, actor pool, payload
    projected away as soon as features exist."""
    return ds.map_batches(
        ImageFeatureStage,
        fn_constructor_kwargs={"bytes_col": bytes_col, "sql_parity": sql_parity},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
