"""Multimodal column plumbing — opaque binary payloads + typed metadata.

The brief's pattern for image/audio/video at 100 TB: payloads are opaque
``binary`` columns with typed metadata columns beside them; decode /
feature-extract stages are actor pools with small batches (payloads are
large), and the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested even though the actual
codec libraries are absent from this container.

``MediaDecoder``/``ImageResizer`` try-import PIL per actor: when
Pillow is installed the image paths are REAL (decode → features /
resize → re-encode).  The AUDIO path is real unconditionally: stdlib
``wave`` PCM decode → per-segment RMS features (``fake=False`` +
kind="audio").  ``fake=True`` produces deterministic md5
pseudo-features so the distributed plumbing stays value-checkable
end-to-end, and ``fake=False`` raises ``NotImplementedError`` at the
exact point the remaining codec call goes (video still needs ffmpeg
and remains stubbed).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa


def _pil_image():
    """Pillow module if installed, else None (import-try gate)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),     # opaque encoded bytes
        ("width", pa.int32()),        # typed metadata travels beside payload
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def synthesize_media_table(n: int = 256, seed: int = 1234) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[rng.randint(0, 3, size=n)]
    payloads = [rng.bytes(int(ln)) for ln in rng.randint(512, 4096, size=n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.randint(64, 1024, size=n, dtype=np.int32)),
            "height": pa.array(rng.randint(64, 1024, size=n, dtype=np.int32)),
            "sample_rate": pa.array(
                np.where(kinds == "audio", 16_000, 0).astype(np.int32)
            ),
        }
    )


class MediaDecoder:
    """Actor-pool decode/feature stage (map_batches(MediaDecoder,
    concurrency=N, batch_size=small, batch_format="pyarrow")).

    __init__ is where a real build would load codecs/models once per
    actor; __call__ handles one Arrow batch of payloads.
    """

    def __init__(self, fake: bool = True, feature_dim: int = 8):
        self.fake = fake
        self.dim = feature_dim
        # per-actor codec load (once, in __init__ — not per batch)
        self.pil = _pil_image()

    def _decode_wav(self, payload: bytes) -> np.ndarray:
        """REAL audio path: stdlib ``wave`` PCM decode → per-segment RMS
        energy features (dim equal time buckets).  Handles 8/16-bit PCM,
        any channel count (downmixed); non-WAV bytes raise wave.Error —
        honest failure at the codec boundary, not a silent fake."""
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            nframes = w.getnframes()
            width = w.getsampwidth()
            ch = w.getnchannels()
            raw = w.readframes(nframes)
        if width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif width == 1:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise NotImplementedError(f"{8 * width}-bit PCM not supported")
        if ch > 1:
            x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1)
        if len(x) == 0:
            return np.zeros(self.dim, dtype=np.float64)
        segs = np.array_split(x, self.dim)
        return np.array(
            [np.sqrt(float((s * s).mean())) if len(s) else 0.0 for s in segs],
            dtype=np.float64,
        )

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if kind == "image" and self.pil is not None and not self.fake:
            import io

            img = self.pil.open(io.BytesIO(payload)).convert("L")
            row = np.asarray(img.resize((self.dim, 1)), dtype=np.float64)
            return row.reshape(self.dim) / 255.0
        if kind == "audio" and not self.fake:
            return self._decode_wav(payload)
        if not self.fake:
            raise NotImplementedError(
                "media codec not available for this kind in this environment; "
                "plug libjpeg/ffmpeg here"
            )
        # deterministic pseudo-features: 16-bit words of md5(hex(payload)).
        # Chosen over an RNG stand-in because any engine can recompute it —
        # DuckDB: md5_number_lower/upper(hex(payload)) >> (16*i) & 65535 —
        # so the whole distributed decode plumbing is value-checkable.
        digest = hashlib.md5(payload.hex().upper().encode("ascii")).digest()
        lo = int.from_bytes(digest[8:], "little")
        hi = int.from_bytes(digest[:8], "little")
        words = [(lo >> (16 * i)) & 0xFFFF for i in range(4)] + [
            (hi >> (16 * i)) & 0xFFFF for i in range(4)
        ]
        return np.array([words[i % 8] for i in range(self.dim)], dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.stack([self._decode(p, k) for p, k in zip(payloads, kinds)])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "features": pa.array(
                    [row.tolist() for row in np.round(feats, 6)],
                    pa.list_(pa.float64()),
                ),
            }
        )


class ImageResizer:
    """Actor-pool resize stage: real Ray plumbing, stubbed codec.

    With ``fake=True`` the payload is passed through and only the typed
    metadata is rewritten (a real build decodes, resizes with
    libjpeg/PIL, re-encodes); ``fake=False`` raises at the codec call.
    """

    def __init__(self, target_w: int = 256, target_h: int = 256, fake: bool = True):
        self.w = target_w
        self.h = target_h
        self.fake = fake
        self.pil = _pil_image()

    def _resize_real(self, batch: pa.Table) -> pa.Table:
        import io

        out = []
        for payload in batch["payload"].to_pylist():
            img = self.pil.open(io.BytesIO(payload))
            buf = io.BytesIO()
            img.resize((self.w, self.h)).save(buf, format=img.format or "PNG")
            out.append(buf.getvalue())
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array(np.full(n, self.w, dtype=np.int32)),
                "height": pa.array(np.full(n, self.h, dtype=np.int32)),
                "orig_width": batch["width"],
                "orig_height": batch["height"],
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            if self.pil is None:
                raise NotImplementedError("image codec not available; install Pillow")
            return self._resize_real(batch)
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": batch["payload"],  # real build: re-encoded bytes
                "width": pa.array(np.full(n, self.w, dtype=np.int32)),
                "height": pa.array(np.full(n, self.h, dtype=np.int32)),
                "orig_width": batch["width"],
                "orig_height": batch["height"],
            }
        )


class FrameSampler:
    """Video → frames flat-map stage: one output row per sampled frame.

    Deterministic frame positions (every ``stride``-th of ``n_frames``);
    with ``fake=True`` the "frame" is a crc-derived byte slice so the
    fan-out plumbing (schema, row multiplication, small batches) is real.
    """

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("video demuxer not available; plug ffmpeg here")
        ids, kinds, frames, payloads = [], [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            step = max(1, len(payload) // self.n_frames)
            for f in range(self.n_frames):
                ids.append(mid)
                kinds.append(kind)
                frames.append(f)
                payloads.append(payload[f * step : f * step + min(step, 256)])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "frame_idx": pa.array(frames, pa.int32()),
                "frame_payload": pa.array(payloads, pa.binary()),
            }
        )


def ensure_media_parquet(n: int = 256, seed: int = 1234) -> str:
    """Write the deterministic fake media corpus to a cached parquet file
    (atomic rename) so both the Ray query and the DuckDB oracle read the
    same bytes."""
    import pyarrow.parquet as pq

    path = f"/tmp/eap_ray_media/media_{n}_{seed}.parquet"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(synthesize_media_table(n, seed), tmp)
        os.replace(tmp, path)
    return path


def media_features(media_ds, concurrency: int = 2, batch_size: int = 32):
    """The decode stage wiring: small batches (large payloads), actor pool."""
    return media_ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency) if isinstance(concurrency, int) else concurrency,
        num_cpus=1,
    )
