"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata, processed
by actor-pool ``map_batches`` stages sized for large payloads (small
``batch_size``, fractional CPU). The Ray-side plumbing — schemas, actor
lifecycle, batch sizing, output layout — is real and tested; the codec
work itself is STUBBED because no image/audio library exists in this
container:

  * ``decode="fake"`` (default) produces a deterministic payload-hash
    derived pseudo-decode so tests can pin end-to-end behavior;
  * ``decode="strict"`` raises ``NotImplementedError`` at the exact
    point a real decoder (Pillow/libsndfile/ffmpeg) would be called.

Swapping in a real decoder touches ONLY ``_decode_image`` /
``_decode_audio``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from batch_geocode_ray.functions.hashing import splitmix64

IMAGE_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("image", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])

AUDIO_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("audio", pa.binary()),
    ("mime", pa.string()),
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int64()),
])


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: seeds a splitmix64 stream from the
    payload bytes -> (h, w) uint8 'pixels'. Stable across workers."""
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    n = h * w
    vals = splitmix64(np.arange(n, dtype=np.uint64) + seed)
    return (vals & np.uint64(0xFF)).astype(np.uint8).reshape(h, w)


class ImageFeatures:
    """Actor-pool stage: image binary -> fixed-size feature vector +
    thumbnail stats. Use small batch_size (payloads are big):
        ds.map_batches(ImageFeatures, batch_size=32,
                       concurrency=(1, 8), num_cpus=0.5)
    """

    def __init__(self, image_col: str = "image", decode: str = "fake",
                 feature_dim: int = 16, thumb: int = 8):
        self.image_col = image_col
        self.decode = decode
        self.feature_dim = feature_dim
        self.thumb = thumb
        # a real impl would load the model / codec tables here, once per actor

    def _decode_image(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if self.decode == "strict":
            raise NotImplementedError(
                "image decode requires Pillow/opencv (not in this container); "
                "run with decode='fake' for deterministic plumbing tests")
        return _fake_pixels(payload, min(h, 64), min(w, 64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.image_col].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        feats = np.zeros((batch.num_rows, self.feature_dim), dtype=np.float64)
        means = np.zeros(batch.num_rows)
        for i, (p, w, h) in enumerate(zip(payloads, widths, heights)):
            if p is None:
                continue
            px = self._decode_image(p, w or 64, h or 64)
            means[i] = float(px.mean())
            hist, _ = np.histogram(px, bins=self.feature_dim, range=(0, 256))
            feats[i] = hist / max(px.size, 1)
        keep = [c for c in batch.column_names if c != self.image_col]
        out = batch.select(keep)  # drop the heavy payload ASAP
        out = out.append_column("pixel_mean", pa.array(means, pa.float64()))
        out = out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float64()), self.feature_dim))
        return out


class AudioFrameSample:
    """Actor-pool stage: audio binary -> sampled 'frame' energies.
    Same stub contract as :class:`ImageFeatures`."""

    def __init__(self, audio_col: str = "audio", decode: str = "fake",
                 n_frames: int = 8):
        self.audio_col = audio_col
        self.decode = decode
        self.n_frames = n_frames

    def _decode_audio(self, payload: bytes, n_samples: int) -> np.ndarray:
        if self.decode == "strict":
            raise NotImplementedError(
                "audio decode requires libsndfile/ffmpeg (not in this "
                "container); run with decode='fake'")
        seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
        n = min(n_samples, 4096)
        vals = splitmix64(np.arange(n, dtype=np.uint64) + seed)
        return ((vals & np.uint64(0xFFFF)).astype(np.float64) - 32768.0) / 32768.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.audio_col].to_pylist()
        counts = batch["n_samples"].to_pylist()
        energies = np.zeros((batch.num_rows, self.n_frames), dtype=np.float64)
        for i, (p, n) in enumerate(zip(payloads, counts)):
            if p is None:
                continue
            wave = self._decode_audio(p, int(n or 4096))
            frames = np.array_split(wave, self.n_frames)
            energies[i] = [float((f * f).mean()) if len(f) else 0.0
                           for f in frames]
        keep = [c for c in batch.column_names if c != self.audio_col]
        out = batch.select(keep)
        out = out.append_column(
            "frame_energy", pa.FixedSizeListArray.from_arrays(
                pa.array(energies.ravel(), pa.float64()), self.n_frames))
        return out
