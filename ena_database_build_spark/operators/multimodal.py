"""Multimodal column plumbing (SURVEY.md §2.11).

Images/audio/video ride in the DataFrame as opaque ``BINARY`` payloads
with typed metadata columns.  Decode / feature-extract runs as
Arrow-batched ``mapInPandas`` — the Spark-side contract (schema,
batching, partitioning) is real and tested; the *codec* itself is
stubbed behind ``try: import`` because media libraries are not part of
this environment.  Swapping the stub for PIL/torchaudio changes only
the inner function body, not the plan.

Scale notes: payloads stay columnar (Arrow) end-to-end; decode
parallelism = partition count; ``spark.sql.files.maxPartitionBytes``
and ``maxRecordsPerBatch`` bound executor memory per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, media_type string, payload_bytes long, "
    "payload_digest string, width int, height int"
)


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: derives a (width, height) from the
    payload length so the plumbing is testable without a codec.

    Real implementation:

        try:
            from PIL import Image
        except ImportError:
            raise NotImplementedError("image codec not available here")
        im = Image.open(io.BytesIO(payload)); return im.size
    """
    if not payload:
        return 0, 0
    n = len(payload)
    return 64 + n % 64, 64 + (n // 64) % 64


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Test helper: fabricate a BINARY payload column from text so the
    multimodal path can run on the synthetic ``documents`` table."""
    return df.select(
        F.col(id_col),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: BINARY payload -> typed metadata row.

    One Arrow batch in, one out; constant memory per batch regardless of
    corpus size.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payloads (e.g. from NULL source text) decode as empty
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            dims = [_decode_image_stub(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "payload_bytes": [len(p) for p in payloads],
                    "payload_digest": [
                        hashlib.md5(p).hexdigest() for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


FEATURE_DIM = 16
FEATURE_SCHEMA = "doc_id long, feature array<float>"


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction: BINARY payload -> fixed-dim
    ``array<float>`` embedding column, Arrow-batched.

    The embedding here is a deterministic byte-histogram projection (a
    codec-free stand-in); a real extractor swaps the inner function for
    a model call (ONNX/torch forward over the batch) — schema, batch
    shape, and partitioning are identical, and the output feeds the
    existing similarity stack (`srp_buckets`, `cosine_topk`,
    `dedup_embedding`) unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                p = p if p is not None else b""
                hist = [0.0] * FEATURE_DIM
                for b in p:
                    hist[b % FEATURE_DIM] += 1.0
                n = float(len(p)) or 1.0
                feats.append([v / n for v in hist])
            yield pd.DataFrame({"doc_id": pdf[id_col], "feature": feats})

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_media(
    df: DataFrame, target_bytes: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas resize: BINARY payload -> BINARY payload of the
    target size (truncate-or-cycle stand-in for a real thumbnailer;
    the real version decodes, scales, and re-encodes inside the same
    batch function).  Output schema mirrors the input so resized
    payloads flow through the same decode/feature plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                p = p if p is not None else b""
                if not p:
                    out.append(b"")
                elif len(p) >= target_bytes:
                    out.append(p[:target_bytes])
                else:
                    reps = target_bytes // len(p) + 1
                    out.append((p * reps)[:target_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "payload": out,
                }
            )

    return df.mapInPandas(
        batches, schema="doc_id long, media_type string, payload binary"
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling skeleton: explode a (stubbed) frame
    index list and keep every ``every_n``-th.  With a real decoder the
    ``n_frames`` column comes from the container header."""
    with_frames = df.withColumn(
        "n_frames", (F.length("payload") % 300 + 1).cast("int")
    )
    return with_frames.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


PHASH_BITS = 16
PHASH_SCHEMA = "doc_id long, phash string"


def perceptual_hash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas perceptual hash: BINARY payload -> a 16-bit
    above-average-signature string, the aHash/pHash structure (real
    pHash takes DCT coefficient signs vs their mean; this codec-free
    stand-in takes byte-low-nibble histogram bins vs their mean —
    swapping in a real decode changes only the inner loop).

    The bit rule is INTEGER arithmetic end-to-end:
    ``bit_j = (16 * count_j > total_bytes)`` — no float ratios, so any
    engine derives the identical hash from the identical bytes (the
    oracle recomputes it from the hex dump in SQL).  Empty payloads
    hash to all-zeros.

    Identical-content payloads collide exactly; visually-near inputs
    (byte-histogram-near here) collide on most bits, so Hamming-band
    grouping over substrings of the hash gives near-dup image
    candidates the same way simhash bands do for text."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                p = p if p is not None else b""
                counts = [0] * PHASH_BITS
                for b in p:
                    counts[b % PHASH_BITS] += 1
                n = len(p)
                out.append(
                    "".join(
                        "1" if PHASH_BITS * c > n else "0" for c in counts
                    )
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "phash": out})

    return df.mapInPandas(batches, schema=PHASH_SCHEMA)
