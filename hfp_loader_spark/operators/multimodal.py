"""Multimodal columns: opaque binary payloads with typed metadata.

Extension tier (builder brief / SURVEY §2.11 "multimodal"): image/audio/
video content rides in ``binary`` columns next to a typed metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
Pandas functions over ``mapInPandas``.

The actual codec step is STUBBED (no image/audio libraries in this
environment): :func:`decode_payload` raises ``NotImplementedError`` unless
the deterministic fake decoder is requested.  Everything AROUND the codec —
the schema contract, the ``mapInPandas`` batch shape, partition sizing,
Arrow transfer, metadata struct typing — is real and tested; swapping the
fake for PIL/ffmpeg is a one-function change on the executors.

Scale notes:
- payload bytes move driver-free: scan → Arrow batch → Python worker →
  Arrow batch; nothing is collected;
- feature extraction is embarrassingly parallel: no shuffle at all, output
  partitioning inherits the scan;
- batch memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — at 100 TB with ~MB payloads, set it so batch_size × payload_size fits
  the worker (e.g. 64 × 4 MB);
- binary columns make parquet row groups huge: store payloads in their own
  column chunk (they already are) and NEVER prune-late — project payload
  off before any wide shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata contract for decoded media.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("md5_hex", StringType()),
        StructField("first_byte", IntegerType()),
        StructField("mean_byte", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("meta", MEDIA_META_SCHEMA),
        StructField("frame_offsets", ArrayType(IntegerType())),
        StructField("frame_digests", ArrayType(StringType())),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a ``binary`` payload column (UTF-8 bytes of the text column).

    Test-harness stand-in for real media bytes: deterministic, both
    engines can derive it, and downstream operators treat it as opaque.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_payload(payload: bytes, media_type: str = "image", fake: bool = False):
    """Codec stub.  Real deployments plug PIL/libav here.

    ``fake=True`` yields a deterministic pseudo-decode derived from the
    payload digest — shaped exactly like a real decode result so the
    Spark-side plumbing is fully exercisable.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic test decoder"
        )
    digest = hashlib.md5(payload).digest()
    return {
        "media_type": media_type,
        "width": 16 + digest[0] % 64,
        "height": 16 + digest[1] % 64,
        "n_channels": 1 + digest[2] % 3,
        "n_frames": 1 + digest[3] % 8,
    }


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Byte-level features via ``mapInPandas`` (Arrow-batched).

    Output is FEATURE_SCHEMA; each batch is processed as a whole pandas
    DataFrame — no per-row Python calls across the serialization boundary.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NULL payloads keep their row with empty-ish defaults (n_bytes 0,
        # NULL md5, -1 bytes) — the oracle states the same via
        # coalesce(nb, 0); a crash here takes the whole stage down
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "md5_hex": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if b is not None and len(b) else -1
                    ).astype("int32"),
                    "mean_byte": payloads.map(
                        lambda b: int(sum(b) // len(b))
                        if b is not None and len(b)
                        else -1
                    ).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(compute, FEATURE_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_windows", IntegerType()),
        StructField("zero_crossings", LongType()),
        StructField("peak", IntegerType()),
        StructField("rms", StringType()),  # round(·,4) as text → hash-stable
    ]
)


def audio_features(
    df: DataFrame,
    window_size: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """Audio feature extraction: payload bytes as unsigned 8-bit PCM.

    Per track: sample count, analysis-window count, zero-crossing count
    (sign changes around the 128 midline — the classic voiced/unvoiced
    discriminator), peak amplitude, RMS energy.  numpy-vectorized per
    Arrow batch inside ``mapInPandas``; a real decoder (libav/soundfile)
    replaces only the ``frombuffer`` line.  Embarrassingly parallel —
    no shuffle, output partitioning inherits the scan.
    """
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "n_samples": [],
                "n_windows": [],
                "zero_crossings": [],
                "peak": [],
                "rms": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:  # NULL payload: nothing to decode
                    continue
                x = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                ) - 128
                n = len(x)
                centered_sign = np.sign(x) >= 0
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(n)
                out["n_windows"].append(-(-n // window_size) if n else 0)
                out["zero_crossings"].append(
                    int(np.count_nonzero(centered_sign[1:] != centered_sign[:-1]))
                    if n > 1
                    else 0
                )
                out["peak"].append(int(np.abs(x).max()) if n else 0)
                out["rms"].append(
                    format(float(np.sqrt(np.mean(x.astype(np.float64) ** 2))), ".4f")
                    if n
                    else "0.0000"
                )
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(compute, AUDIO_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("meta", MEDIA_META_SCHEMA),
        StructField("target_width", IntegerType()),
        StructField("target_height", IntegerType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    id_col: str = "doc_id",
    fake_decode: bool = True,
) -> DataFrame:
    """Decode → resize → re-emit binary, via ``mapInPandas``.

    The fake "resize" nearest-neighbor-samples the payload bytes onto the
    target w×h grid — deterministic, and shaped exactly like a real
    thumbnailing pass (binary in, smaller binary out, metadata struct
    alongside).  Swapping in PIL's ``Image.resize`` touches only the
    inner function.  No shuffle: output partitioning inherits the scan,
    and the resized payload is SMALLER than the input, so this is the
    stage after which wide ops become affordable.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "meta": [],
                "target_width": [],
                "target_height": [],
                "resized": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:  # NULL payload: nothing to decode
                    continue
                b = bytes(payload)
                meta = decode_payload(b, "image", fake=fake_decode)
                n = max(len(b), 1)
                # nearest-neighbor sample onto the target grid
                total = target_width * target_height
                resized = bytes(
                    b[(i * n) // total] if b else 0 for i in range(total)
                )
                out["doc_id"].append(int(doc_id))
                out["meta"].append(meta)
                out["target_width"].append(target_width)
                out["target_height"].append(target_height)
                out["resized"].append(resized)
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(compute, RESIZED_SCHEMA)


def decode_and_sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    media_type: str = "video",
    n_samples: int = 4,
    fake_decode: bool = True,
) -> DataFrame:
    """Decode metadata + uniform frame sampling via ``mapInPandas``.

    Frames of the fake codec are equal byte-slices of the payload; the
    sampler picks ``n_samples`` uniformly spaced frames and emits their
    offsets and digests — the exact shape a real video pipeline produces
    (frame index + thumbnail/feature per frame).
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "meta": [], "frame_offsets": [], "frame_digests": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:  # NULL payload: nothing to decode
                    continue
                b = bytes(payload)
                meta = decode_payload(b, media_type, fake=fake_decode)
                n_frames = meta["n_frames"]
                frame_len = max(len(b) // n_frames, 1)
                step = max(n_frames // n_samples, 1)
                idxs = list(range(0, n_frames, step))[:n_samples]
                offsets = [i * frame_len for i in idxs]
                # digest of the frame slice's UPPERCASE-HEX (not raw bytes):
                # deterministic either way, but hex keeps the fake codec
                # SQL-restatable for ANY payload encoding — an oracle can
                # md5 a substring of hex(payload) while md5-over-BLOB-slice
                # has no SQL twin (and a VARCHAR slice breaks on multibyte)
                digests = [
                    hashlib.md5(
                        b[o : o + frame_len].hex().upper().encode()
                    ).hexdigest()[:16]
                    for o in offsets
                ]
                out["doc_id"].append(int(doc_id))
                out["meta"].append(meta)
                out["frame_offsets"].append(offsets)
                out["frame_digests"].append(digests)
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(compute, DECODED_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def blockhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """64-bit blockhash perceptual fingerprint of a binary payload.

    Blockhash-family pHash (Yang et al.'s block mean value hash, applied
    1-D): split the payload into 64 byte-ranges (byte i lands in bucket
    ``i*64 // n``), sum each, set bit j iff ``sum_j * 64 >= total`` —
    ALL-INTEGER arithmetic, so the fingerprint is bit-identical across
    engines and the DuckDB oracle can restate it exactly from
    ``hex(payload)`` (no float mean, no engine-specific hash — unlike
    token-simhash, which is oracle-checkable only by contract).  Similar
    payloads → similar byte-distributions → small Hamming distance, so
    the pigeonhole-banded join (``simhash_near_pairs``) applies as-is.

    Arrow-batched ``mapInPandas`` (numpy bincount per payload), matching
    the multimodal tier's decode plumbing; empty payloads are dropped
    (no bytes → no signal; the same rule the oracle states with
    ``WHERE nb > 0``).  Output: (doc_id, phash) — 8 bytes per document,
    so the downstream near-dup join shuffles fingerprints, never media.
    """
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:  # NULL payload ≡ empty: no signal
                    continue
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = len(b)
                if n == 0:
                    continue
                buckets = (np.arange(n, dtype=np.int64) * 64) // n
                sums = np.bincount(
                    buckets, weights=b.astype(np.int64), minlength=64
                ).astype(np.int64)
                total = int(sums.sum())
                fp = 0
                for j in range(64):
                    if int(sums[j]) * 64 >= total:
                        fp |= 1 << j
                if fp >= 1 << 63:  # wrap to signed int64 (two's complement)
                    fp -= 1 << 64
                ids.append(int(doc_id))
                fps.append(fp)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "phash": pd.Series(fps, dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(compute, PHASH_SCHEMA)
