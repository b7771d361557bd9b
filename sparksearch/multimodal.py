"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns beside typed metadata, with decode / feature-extract /
frame-sample as Arrow-batched Python over ``mapInPandas``. The image/audio
codecs are NOT in this container, so the decode step is a clearly-marked
stub (``NotImplementedError`` unless the deterministic-fake path is chosen)
— but everything Spark-side is real and tested: the binary column, the
schema, the partition-preserving mapInPandas plumbing, the Arrow batch
shapes, and the NumPy feature kernels.

The deterministic fake treats the payload bytes themselves as the "decoded"
signal (here payload = UTF-8 of the text column, so the DuckDB oracle can
recompute the same features from characters — real value checks, not just
row counts).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HIST_BINS = 16
FRAME_STRIDE = 7  # "frame-sample": every 7th byte


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque payload column + typed metadata the pipeline carries
    for every modality: DF[+payload:binary, media_type, n_bytes].

    In production the payload is the stored image/audio blob; here it is the
    document's UTF-8 bytes — same column type, same downstream plumbing."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/x-fake").alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
    )


def payload_meta(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Typed metadata extracted JVM-side from the binary column →
    DF[doc_id, n_bytes, payload_sha256, head_hex]. No Python boundary."""
    b = with_binary_payload(docs, text_col)
    return b.select(
        "doc_id",
        "n_bytes",
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 8))).alias("head_hex"),
    )


def decode_payload(batch: np.ndarray, media_type: str, deterministic_fake: bool):
    """The modality decode step. Real codecs (PIL/ffmpeg/soundfile) are not in
    this container — the real branch is a stub by design; the fake branch
    returns the raw bytes as the decoded signal (deterministic, testable)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg/soundfile — not available in this "
            "environment; pass deterministic_fake=True for the testable path"
        )
    return batch  # bytes ARE the fake signal


def byte_histogram(docs: DataFrame, text_col: str = "text", bins: int = HIST_BINS,
                   deterministic_fake: bool = True) -> DataFrame:
    """Feature-extract over the binary column → DF[doc_id, bin, n].

    mapInPandas: Arrow batches of (doc_id, payload) in, NumPy bincount of
    (byte % bins) per row out — the exact shape a real image-feature UDF has
    (decode → ndarray → per-item feature rows). Partition-preserving: no
    shuffle until the caller aggregates."""
    b = with_binary_payload(docs, text_col).select("doc_id", "payload", "media_type")

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, bin_ids, counts = [], [], []
            for doc_id, payload, mt in zip(
                pdf["doc_id"].values, pdf["payload"].values, pdf["media_type"].values
            ):
                sig = decode_payload(
                    np.frombuffer(payload, dtype=np.uint8), mt, deterministic_fake
                )
                h = np.bincount(sig % bins, minlength=bins)
                nz = np.nonzero(h)[0]
                ids.append(np.full(nz.size, doc_id, dtype=np.int64))
                bin_ids.append(nz.astype(np.int64))
                counts.append(h[nz].astype(np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "bin": np.concatenate(bin_ids),
                        "n": np.concatenate(counts),
                    }
                )

    return b.mapInPandas(extract, "doc_id long, bin long, n long")


def frame_sample(docs: DataFrame, text_col: str = "text", stride: int = FRAME_STRIDE,
                 max_frames: int = 8) -> DataFrame:
    """'Frame sampling' over the payload → DF[doc_id, frame_idx, frame_val]:
    every ``stride``-th byte, first ``max_frames`` — the video-keyframe
    access pattern (strided reads into an opaque buffer), JVM-side via
    higher-order functions so Catalyst keeps it in codegen."""
    b = with_binary_payload(docs, text_col)
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.least(
                F.lit(max_frames - 1),
                F.floor((F.col("n_bytes") - 1) / F.lit(stride)).cast("int"),
            ),
        ),
        lambda i: F.struct(
            i.cast("long").alias("frame_idx"),
            F.ascii(
                F.substring(F.col("payload").cast("string"), F.lit(1) + i * stride, 1)
            ).cast("long").alias("frame_val"),
        ),
    )
    return (
        b.filter(F.col("n_bytes") > 0)
        .select("doc_id", F.explode(frames).alias("f"))
        .select("doc_id", F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame_val").alias("frame_val"))
    )
