"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media rides as an opaque ``binary`` column plus typed metadata — the
pattern a 100 TB multimodal corpus needs: Parquet stores the bytes
column-compressed, Spark never interprets them until a decode kernel runs,
and every kernel is an Arrow-batched ``mapInPandas`` pass (one Python
invocation per batch, never per row).

The actual codec work (JPEG decode, audio PCM, video frame extraction)
needs libraries this environment doesn't ship (PIL / ffmpeg / torchcodec),
so the decode step is STUBBED behind ``_decode_image_stub`` — a
deterministic fake that derives pixel statistics from the bytes — while
everything Spark-side is real and tested: schemas, batch iteration,
partition sizing, output shapes. Swapping the stub for a real codec
changes ONE function.

Schema contract:

    media:    media_id long, kind string ('image'|'audio'|'video'),
              payload binary, mime string, width int, height int,
              duration_ms int, sha256 string
    features: media_id long, feat array<float>, n_bytes long, ok boolean
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int, sha256 string"
)

FEATURES_SCHEMA = "media_id long, feat array<double>, n_bytes long, ok boolean"

THUMB_SCHEMA = (
    "media_id long, thumb_w int, thumb_h int, thumb_mean array<double>, ok boolean"
)

FRAMES_SCHEMA = "media_id long, frame_idx int, frame_ms int, frame_feat array<double>"


def synthesize_media(
    spark: SparkSession, n: int = 64, seed: int = 42, payload_bytes: int = 4096
) -> DataFrame:
    """Deterministic fake media table (no external data): payload bytes are
    seeded SHA-256 keystream, metadata derived from media_id."""
    rows = []
    kinds = ("image", "audio", "video")
    mimes = {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}
    for i in range(n):
        kind = kinds[i % 3]
        buf = bytearray()
        counter = 0
        while len(buf) < payload_bytes:
            buf += hashlib.sha256(f"{seed}:{i}:{counter}".encode()).digest()
            counter += 1
        payload = bytes(buf[:payload_bytes])
        rows.append(
            (
                i,
                kind,
                payload,
                mimes[kind],
                64 + (i % 8) * 16 if kind == "image" else 0,
                48 + (i % 8) * 16 if kind == "image" else 0,
                1000 + i * 250 if kind != "image" else 0,
                hashlib.sha256(payload).hexdigest(),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


try:  # real codec path when the deployment ships PIL (this container doesn't)
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # pragma: no cover - exercised via monkeypatch in tests
    _PIL_Image = None


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Image decode: real PIL when available, deterministic fake otherwise.

    With PIL installed, ``payload`` is decoded as a real image (any format
    PIL reads) and converted to H×W×3 uint8. Without it — this container —
    a deterministic fake derives pixels from the payload bytes, keeping the
    same contract so downstream resize/feature code is exercised for real.
    """
    if _PIL_Image is not None:
        import io

        try:
            img = _PIL_Image.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(img, np.uint8)
        except Exception:
            pass  # undecodable bytes (e.g. the synthetic corpus) -> fake path
    if width <= 0 or height <= 0:
        raise NotImplementedError("real decode requires PIL; stub needs dims")
    raw = np.frombuffer(payload, np.uint8)
    need = width * height * 3
    reps = -(-need // raw.size)
    return np.tile(raw, reps)[:need].reshape(height, width, 3)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """binary payload -> fixed-dim float feature vector, Arrow-batched.

    Feature = per-stripe byte means (stub for an embedding model). The
    kernel is pure numpy over each Arrow batch; at scale this stage is
    CPU-bound and embarrassingly parallel, so partition sizing (payload
    bytes per task, ``spark.sql.files.maxPartitionBytes``) is the only
    tuning knob.

    Means are computed as exact integer sums divided in float64 (dyadic
    for power-of-two stripe widths), so any engine — including the DuckDB
    driver oracle — reproduces the values bit-exactly."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes, oks = [], [], []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload, np.uint8) if payload is not None else np.empty(0, np.uint8)
                nbytes.append(b.size)
                if b.size == 0:
                    feats.append(np.zeros(dim, np.float64))
                    oks.append(False)
                    continue
                stripes = np.array_split(b.astype(np.int64), dim)
                feats.append(
                    np.array(
                        [s.sum() / float(s.size) if s.size else 0.0 for s in stripes],
                        np.float64,
                    )
                )
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat": feats,
                    "n_bytes": np.array(nbytes, np.int64),
                    "ok": oks,
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURES_SCHEMA)


def _block_means(img: np.ndarray, thumb: int) -> np.ndarray:
    """thumb×thumb block mean-pool of an H×W×3 image, float64, row-major
    cell order. Fully vectorized (one reshape+mean) when both dims divide
    evenly — the synthetic corpus's case — with a linspace-grid fallback
    for ragged shapes. Integer pixel sums are exact in float64, so the
    two paths agree bit-for-bit where both apply."""
    h, w, _ = img.shape
    if h % thumb == 0 and w % thumb == 0:
        return (
            img.astype(np.int64)
            .reshape(thumb, h // thumb, thumb, w // thumb, 3)
            .sum(axis=(1, 3, 4))
            / float((h // thumb) * (w // thumb) * 3)
        ).reshape(-1)
    ys = np.linspace(0, h, thumb + 1, dtype=int)
    xs = np.linspace(0, w, thumb + 1, dtype=int)
    return np.array(
        [
            img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
            for i in range(thumb)
            for j in range(thumb)
        ],
        np.float64,
    )


def thumbnail_stats(media: DataFrame, thumb: int = 8) -> DataFrame:
    """Image decode → resize-to-thumbnail → block means (mapInPandas).

    Decode is the stub; the resize (block mean-pool to ``thumb×thumb``)
    and the batch plumbing are real. Means are exact integer pixel sums
    divided in float64, so the DuckDB driver oracle (media_thumbs)
    value-checks them. Round-3: the kernel iterates plain column arrays
    (zip) with a vectorized reshape-pool per image — no ``iterrows``,
    no per-pixel Python."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            tw = np.full(ids.size, thumb, np.int32)
            th = np.full(ids.size, thumb, np.int32)
            oks = np.ones(ids.size, bool)
            means: list[np.ndarray] = []
            for i, (payload, w, h) in enumerate(
                zip(pdf["payload"], pdf["width"], pdf["height"])
            ):
                try:
                    img = _decode_image_stub(payload, int(w), int(h))
                    means.append(_block_means(img, thumb))
                except NotImplementedError:
                    tw[i] = th[i] = 0
                    oks[i] = False
                    means.append(np.zeros(thumb * thumb, np.float64))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "thumb_w": tw,
                    "thumb_h": th,
                    "thumb_mean": means,
                    "ok": oks,
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload", "width", "height"
    ).mapInPandas(kernel, THUMB_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 500, dim: int = 4) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp
    (mapInPandas returning a VARIABLE number of rows per input — the
    Spark-side shape a real ffmpeg frame extractor needs)."""

    w = 64 // dim  # dim divides 64 for every supported feature width

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, feats = [], [], [], []
            # per-media loop only (payload buffers differ per row); all
            # per-FRAME math is one vectorized gather + reshape per video
            # (round-3: the per-frame Python loop / iterrows is gone).
            # stub frame feature: windowed byte means keyed by ms
            # (exact int sums / float64 division — oracle-portable)
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                b = np.frombuffer(payload, np.uint8)
                if b.size < 64:
                    # zero-pad sub-window payloads: offs is 0 for every
                    # frame below, so each frame reads the whole (padded)
                    # buffer — without this the fancy-index gather runs
                    # past the buffer and raises IndexError (ADVICE r3)
                    b = np.concatenate([b, np.zeros(64 - b.size, np.uint8)])
                ms = np.arange(0, int(dur), every_ms, dtype=np.int64)
                if ms.size == 0:
                    continue
                offs = (ms * 37) % max(b.size - 64, 1)
                wins = b[offs[:, None] + np.arange(64)]  # (n_frames, 64)
                fmat = (
                    wins.astype(np.int64).reshape(ms.size, dim, w).sum(axis=2)
                    / float(w)
                )
                ids.append(np.full(ms.size, mid, np.int64))
                idxs.append(np.arange(ms.size, dtype=np.int64))
                mss.append(ms)
                feats.extend(fmat)
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "media_id": np.concatenate(ids),
                    "frame_idx": np.concatenate(idxs),
                    "frame_ms": np.concatenate(mss),
                    "frame_feat": feats,
                }
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(kernel, FRAMES_SCHEMA)
