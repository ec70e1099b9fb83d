"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio decode libraries are not in this container, so the decode
kernels are STUBBED (clearly marked) behind ``decoder="fake"`` — a
deterministic byte-hash feature extractor — while all the Ray-side
plumbing is real and tested: binary Arrow columns, actor-pool stages
with per-actor setup, small batch sizes for wide rows, fixed-size
feature output schema.

At scale: binary payloads make rows wide → ``batch_size`` must be small
(default 32) and blocks should not be split absurdly small
(``DataContext.target_max_block_size`` up). Feature extraction is a
stateful actor stage (model load once per actor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from kire_ray.functions.hashing import score01_md5

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEAT_DIM = 32


def synth_media(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": [f"m{i:06d}" for i in range(n)],
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.bytes(64 + int(rng.integers(0, 192))) for i in range(n)],
        "width": pa.array([int(rng.integers(16, 512)) for _ in range(n)], pa.int32()),
        "height": pa.array([int(rng.integers(16, 512)) for _ in range(n)], pa.int32()),
        "duration_ms": pa.array([int(rng.integers(0, 60000)) for _ in range(n)], pa.int32()),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``decoder="real"`` is a stub: the container has no image/audio
    libraries → NotImplementedError, by design. ``decoder="fake"``
    derives a deterministic FEAT_DIM-float feature from the payload
    bytes so the distributed plumbing (schema, batching, actor setup,
    output layout) is fully exercised and testable. The fake feature is
    md5-based (dim j = score01_md5 of ``md5(payload) || ':' || j``) so
    a DuckDB oracle can replay it bit-exactly from a persisted
    per-media payload_md5 column — the same SQL-parity promotion as the
    flagship pair scores (functions/hashing.py:score01_md5).
    """

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder

    def _decode(self, payload: bytes) -> list:
        if self.decoder == "real":
            # STUB: pillow / torchaudio / ffmpeg are not available in
            # this environment — plug the real decoder in here.
            raise NotImplementedError("real media decoding unavailable in this container")
        import hashlib

        h = hashlib.md5(payload).hexdigest()
        return [score01_md5(f"{h}:{j}") for j in range(FEAT_DIM)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch.column("payload").to_pylist()]
        out = batch.drop_columns(["payload"])  # features replace payload
        return out.append_column(
            "features",
            pa.array(feats, type=pa.list_(pa.float64(), FEAT_DIM)),
        )


def extract_media_features(
    media: "ray.data.Dataset", *, concurrency=(1, 4), batch_size: int = 32
) -> "ray.data.Dataset":
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: wide binary rows
        concurrency=concurrency,
    )


def frame_sample(
    media: "ray.data.Dataset", *, every_ms: int = 1000
) -> "ray.data.Dataset":
    """Video frame sampling plumbing: explode each video row into frame
    rows at a fixed cadence (decode itself is the stub above)."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized like audio_chunk: np.repeat over per-row frame
        # counts — no per-row python loop
        v = b[b["kind"] == "video"]
        if v.empty:
            return pd.DataFrame(
                {
                    "media_id": pd.Series([], dtype=str),
                    "frame_ms": pd.Series([], dtype=np.int64),
                }
            )
        dur = v["duration_ms"].to_numpy().clip(min=1)
        n_frames = -(-dur // every_ms)  # ceil
        ids = np.repeat(v["media_id"].to_numpy(), n_frames)
        offs = np.concatenate([np.arange(n) for n in n_frames]) * every_ms
        return pd.DataFrame({"media_id": ids, "frame_ms": offs})

    return media.map_batches(explode, batch_format="pandas")


def audio_chunk(
    media: "ray.data.Dataset", *, chunk_ms: int = 5000
) -> "ray.data.Dataset":
    """Audio chunking plumbing (the frame_sample analogue for audio):
    explode each audio row into fixed-length chunk rows with start/end
    offsets — the decode itself stays behind the stub. Vectorized:
    numpy repeat over per-row chunk counts, no per-row python loop."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        a = b[b["kind"] == "audio"]
        if a.empty:
            return pd.DataFrame(
                {
                    "media_id": pd.Series([], dtype=str),
                    "chunk_start_ms": pd.Series([], dtype=np.int64),
                    "chunk_end_ms": pd.Series([], dtype=np.int64),
                }
            )
        dur = a["duration_ms"].to_numpy().clip(min=1)
        n_chunks = -(-dur // chunk_ms)  # ceil
        ids = np.repeat(a["media_id"].to_numpy(), n_chunks)
        offs = np.concatenate([np.arange(n) for n in n_chunks]) * chunk_ms
        ends = np.minimum(offs + chunk_ms, np.repeat(dur, n_chunks))
        return pd.DataFrame(
            {"media_id": ids, "chunk_start_ms": offs, "chunk_end_ms": ends}
        )

    return media.map_batches(explode, batch_format="pandas")


class ImageResizer:
    """Actor-pool resize stage (the decode/encode is the same stub
    seam as ``MediaFeatureExtractor`` — no codec libraries in this
    container; ``mode="real"`` raises by design). The REAL parts, all
    exercised: aspect-preserving geometry (fit the longest side to
    ``max_side``, never upscale), the actor signature, and the byte
    plumbing (the fake path emits a deterministic payload whose length
    scales with the output pixel count, so downstream size accounting
    is testable).
    """

    def __init__(self, max_side: int = 224, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.max_side = max_side
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        b = batch.to_pandas()
        b = b[b["kind"] == "image"]
        if b.empty:
            return pa.table(
                {
                    "media_id": pa.array([], pa.string()),
                    "width": pa.array([], pa.int32()),
                    "height": pa.array([], pa.int32()),
                    "out_w": pa.array([], pa.int32()),
                    "out_h": pa.array([], pa.int32()),
                    "payload": pa.array([], pa.binary()),
                }
            )
        if self.mode == "real":
            # STUB: pillow/cv2 unavailable — plug the real resampler here
            raise NotImplementedError("real image resizing unavailable in this container")
        w = b["width"].to_numpy(np.int64)
        h = b["height"].to_numpy(np.int64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        ow = np.maximum(1, np.floor(w * scale + 0.5)).astype(np.int64)
        oh = np.maximum(1, np.floor(h * scale + 0.5)).astype(np.int64)
        payloads = []
        for p, n in zip(b["payload"], (ow * oh // 64).clip(min=1)):
            reps = -(-int(n) // max(len(p), 1))
            payloads.append((p * reps)[: int(n)])
        return pa.table(
            {
                "media_id": pa.array(b["media_id"].tolist(), pa.string()),
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "out_w": pa.array(ow, pa.int32()),
                "out_h": pa.array(oh, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def image_resize(
    media: "ray.data.Dataset", *, max_side: int = 224, concurrency=(1, 4),
    batch_size: int = 32,
) -> "ray.data.Dataset":
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: wide binary rows
        concurrency=concurrency,
    )
