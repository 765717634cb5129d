"""Multimodal columns (north-star §2.9): image/audio/video as opaque
``binary`` payloads with typed metadata, processed in Arrow-batched
``mapInPandas`` stages.

The container ships no image/audio codecs, so the DECODE step is stubbed
(SURVEY.md §2.9 / build brief): ``decode_payload`` raises
``NotImplementedError`` unless given a decoder, and ``fake_decoder`` provides
a deterministic md5-derived stand-in so every downstream stage — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested. Swapping
in Pillow/librosa later changes ONE injected callable, no plan changes.

Scale notes:
- payloads stay opaque bytes end-to-end; Parquet stores them as BYTE_ARRAY
  with metadata columns for pruning (filter on ``modality``/``n_bytes``
  BEFORE decode so the scan never materializes skipped blobs).
- ``mapInPandas`` streams Arrow record batches — peak memory is
  O(batch_size × payload), tuned via spark.sql.execution.arrow
  .maxRecordsPerBatch, not O(partition).
- feature vectors come back as ``array<float>`` ready for the similarity/
  dedup operators (operators/similarity.py), so modality pipelines compose:
  decode → embed → ann/near-dup.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# decoder(payload_bytes) -> np.ndarray (H, W, C) uint8 for images, (N,) float
# for audio. Injected; None → NotImplementedError (no codecs in container).
DecoderFn = Callable[[bytes], np.ndarray]

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("decoded", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: md5-seeded 8×8×3 uint8 'image'.
    Replaces e.g. ``PIL.Image.open`` until codecs are available."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


def attach_payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns computed JVM-side (no decode): size + hash for
    pruning, dedup, and integrity checks on opaque blobs."""
    p = F.col(payload_col)
    return df.withColumns(
        {
            "n_bytes": F.length(p).cast("bigint"),
            "payload_hash": F.md5(p),
        }
    )


def decode_payload(
    df: DataFrame,
    decoder: DecoderFn | None = None,
    *,
    payload_col: str = "payload",
) -> DataFrame:
    """Decode opaque payloads → shape metadata + raw pixel bytes.

    Arrow-batched mapInPandas: each pandas batch decodes payload-by-payload
    (codecs are per-item anyway); output rows align 1:1 with input rows.
    """
    if decoder is None:
        raise NotImplementedError(
            "no image/audio codecs in this container — inject a decoder "
            "(e.g. PIL-based) or use multimodal.fake_decoder for plumbing tests"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "item_id": [], "modality": [], "height": [],
                "width": [], "channels": [], "decoded": [],
            }
            for item_id, modality, payload in zip(
                pdf["item_id"], pdf["modality"], pdf[payload_col]
            ):
                out["item_id"].append(item_id)
                out["modality"].append(modality)
                if payload is None:
                    out["height"].append(None)
                    out["width"].append(None)
                    out["channels"].append(None)
                    out["decoded"].append(None)
                    continue
                arr = decoder(bytes(payload))
                h, w, c = (arr.shape + (1, 1))[:3]
                out["height"].append(h)
                out["width"].append(w)
                out["channels"].append(c)
                out["decoded"].append(arr.tobytes())
            yield pd.DataFrame(out)

    cols = ["item_id", "modality", payload_col]
    return df.select(*cols).mapInPandas(run, DECODED_SCHEMA)


def extract_features(
    df: DataFrame, dim: int = 16, *, payload_col: str = "payload"
) -> DataFrame:
    """Feature-extract stub: deterministic md5-derived float vector per
    payload (the real model swap-in is a different function body, same
    mapInPandas shape). Output feeds operators/similarity.py directly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                if payload is None:
                    feats.append(None)
                    continue
                digest = hashlib.md5(bytes(payload)).digest()
                raw = (digest * ((4 * dim) // len(digest) + 1))[: 4 * dim]
                vec = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                vec = vec.reshape(dim, 4).mean(axis=1) / 255.0
                feats.append(vec.tolist())
            yield pd.DataFrame({"item_id": pdf["item_id"], "feature": feats})

    return df.select("item_id", payload_col).mapInPandas(run, FEATURE_SCHEMA)


def resize_decoded(
    df: DataFrame, out_h: int, out_w: int, *, decoded_col: str = "decoded"
) -> DataFrame:
    """Nearest-neighbor resize over decoded pixel buffers — numpy-only, so it
    is REAL (not stubbed): works on any decoder's (H,W,C) uint8 output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for decoded, h, w, c in zip(
                pdf[decoded_col], pdf["height"], pdf["width"], pdf["channels"]
            ):
                if decoded is None:
                    out.append(None)
                    continue
                arr = np.frombuffer(bytes(decoded), dtype=np.uint8).reshape(
                    int(h), int(w), int(c)
                )
                ys = (np.arange(out_h) * h // out_h).astype(int)
                xs = (np.arange(out_w) * w // out_w).astype(int)
                out.append(arr[ys][:, xs].tobytes())
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "modality": pdf["modality"],
                    "height": out_h,
                    "width": out_w,
                    "channels": pdf["channels"],
                    "decoded": out,
                }
            )

    cols = ["item_id", "modality", "height", "width", "channels", decoded_col]
    return df.select(*cols).mapInPandas(run, DECODED_SCHEMA)


def sample_frames(
    df: DataFrame, n_frames: int, *, payload_col: str = "payload"
) -> DataFrame:
    """Frame-sample stub for video payloads: without a container decoder the
    payload is split into ``n_frames`` evenly-spaced byte windows (the real
    ffmpeg-backed sampler keeps the same 1→N row fan-out and schema)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for item_id, payload in zip(pdf["item_id"], pdf[payload_col]):
                if payload is None:
                    continue
                data = bytes(payload)
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    start = i * step
                    if start >= len(data):
                        break
                    ids.append(item_id)
                    idxs.append(i)
                    frames.append(data[start : start + step])
            yield pd.DataFrame(
                {"item_id": ids, "frame_index": idxs, "frame": frames}
            )

    return df.select("item_id", payload_col).mapInPandas(run, FRAME_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zcr", T.DoubleType(), True),
    ]
)


def fake_pcm_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in audio decoder: md5-seeded 2048-sample float32
    PCM in [-1, 1). Replaces e.g. ``soundfile.read`` until codecs are
    available — same injection contract as ``fake_decoder``."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return (rng.rand(2048).astype(np.float32) * 2.0) - 1.0


def frame_audio(
    df: DataFrame,
    decoder: DecoderFn | None = None,
    *,
    frame_length: int = 512,
    hop: int = 256,
    payload_col: str = "payload",
) -> DataFrame:
    """Audio payloads → overlapping analysis frames with per-frame RMS
    energy and zero-crossing rate (the canonical audio feature framing:
    frame_length window, hop stride, FULL frames only).

    Arrow-batched ``mapInPandas`` like ``decode_payload``: one pass, each
    item fans out to ~(n_samples - frame_length)/hop + 1 rows. Output is
    SCALAR columns only — per-frame vectors would be a second operator —
    so the frame table joins/aggregates like any relational input (and the
    driver harness can canonicalize it; arrays cannot be sort_values keys,
    the round-3 lesson)."""
    if decoder is None:
        raise NotImplementedError(
            "no audio codecs in this container — inject a decoder "
            "(e.g. soundfile-based) or use multimodal.fake_pcm_decoder"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "item_id": [], "frame_index": [], "n_samples": [],
                "rms": [], "zcr": [],
            }
            for item_id, payload in zip(pdf["item_id"], pdf[payload_col]):
                if payload is None:
                    continue
                pcm = decoder(bytes(payload)).astype(np.float64)
                n = len(pcm)
                i = 0
                idx = 0
                while i + frame_length <= n:
                    fr = pcm[i : i + frame_length]
                    out["item_id"].append(item_id)
                    out["frame_index"].append(idx)
                    out["n_samples"].append(frame_length)
                    out["rms"].append(float(np.sqrt(np.mean(fr * fr))))
                    out["zcr"].append(
                        float(np.mean(np.sign(fr[1:]) != np.sign(fr[:-1])))
                    )
                    i += hop
                    idx += 1
            yield pd.DataFrame(out)

    return df.select("item_id", payload_col).mapInPandas(run, AUDIO_FRAME_SCHEMA)
