"""Multimodal column plumbing (north-star extension surface).

Media are opaque ``binary`` columns + typed metadata. The container
has no image/audio codecs, so the decode kernel is a clearly-marked
STUB (deterministic fake derived from the byte content) — but the
Spark-side architecture is real and tested: schema, Arrow batch
shape, ``mapInPandas`` signature, and partition behavior are exactly
what a real decoder (PIL/ffmpeg in the executor image) would use.
Swap ``_fake_decode_bytes`` for the real kernel and nothing else
changes.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
decode is per-partition parallel with no shuffle. Feature outputs are
small & typed → downstream queries are ordinary columnar plans.
The binary column itself is synthesized from ``documents.text``
(utf-8 bytes) because the test tables carry no real media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

DECODE_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, n_frames int, mean_luma double"
)

#: set True only in an image-capable executor image; the container here
#: has no codecs, so the deterministic stub below stands in.
REAL_CODECS_AVAILABLE = False


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-typed as an opaque media blob + metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.lit("fake/blob").alias("mime"),
        F.octet_length("text").alias("byte_len"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    Input needs ``doc_id`` + ``media`` (binary); output one row per
    media item with extracted features.

    The kernel is deliberately SELF-CONTAINED (references only builtins
    + pandas): cloudpickle then ships it by value, so Python workers
    need no import of this package. A real decoder would replace
    ``fake_decode`` with e.g. ``PIL.Image.open(io.BytesIO(payload))``
    — unavailable in this container (REAL_CODECS_AVAILABLE above).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(payload: bytes) -> tuple[int, int, int, float]:
            # deterministic stub standing in for the codec kernel
            n = len(payload)
            return (
                16 + (n % 64),
                16 + ((n // 64) % 64),
                1 + (n % 3),
                float(sum(payload[:32]) % 256) / 255.0,
            )

        for pdf in batches:
            feats = [fake_decode(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(bytes(b)) for b in pdf["media"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                    "mean_luma": [f[3] for f in feats],
                }
            )

    return media.mapInPandas(kernel, schema=DECODE_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling plumbing: explode frame indices, keep every Nth.
    With a real video decoder the frame payload column would ride along
    as binary; here only indices flow (codec-free container)."""
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_n == 0)


RESIZE_MAX_DIM = 64
RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, resized_len long"
)


def resize_media(decoded_with_media: DataFrame, max_dim: int = RESIZE_MAX_DIM) -> DataFrame:
    """Aspect-preserving resize kernel via mapInPandas — the standard
    image-normalization stage before feature extraction. Computes
    scale = min(max_dim/w, max_dim/h, 1) and the output dims; the
    "resized payload" is a deterministic stub (payload truncated to
    out_w·out_h·3 RGB bytes) standing in for the real interpolation —
    swap the body for PIL's ``Image.resize`` in a codec-capable image
    and the schema, batch shape, and plan do not change. The payload
    column stays internal (binary outputs don't hash-compare across
    engines); the registered query exposes the dims, which the oracle
    recomputes exactly from the decode stub's arithmetic."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def dims(w: int, h: int) -> tuple[int, int]:
            scale = min(max_dim / w, max_dim / h, 1.0)
            return max(1, int(w * scale)), max(1, int(h * scale))

        for pdf in batches:
            out = [dims(int(w), int(h)) for w, h in zip(pdf["width"], pdf["height"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_w": [o[0] for o in out],
                    "out_h": [o[1] for o in out],
                    "resized_len": [o[0] * o[1] * 3 for o in out],
                }
            )

    return decoded_with_media.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def _q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pure-Catalyst face of the media pipeline: binary length + content
    # hash + prefix fingerprint, no Python. Oracle-checked.
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "mime",
        "byte_len",
        F.md5("media").alias("content_md5"),
        F.hex(F.substring("media", 1, 8)).alias("prefix_hex"),
    )


def _q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mapInPandas path — not SQL-expressible (Python kernel), so no
    # oracle entry: the driver records a rows-only check, and
    # tests/test_multimodal.py asserts determinism + feature ranges.
    return decode_media(media_table(spark, sf_dir))


def _q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full plumbing chain: binary → mapInPandas decode → frame-index
    # explode (every 2nd frame). The decode kernel is Python, but its
    # deterministic stub lets the oracle recompute n_frames in SQL —
    # so even the Python-kernel path is hash-diffed, not just row-counted.
    return frame_sample(decode_media(media_table(spark, sf_dir)), every_n=2)



def _q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # binary → decode → aspect-preserving resize. The stub decode's
    # dims are pure arithmetic on octet_length, so the oracle recomputes
    # the whole chain in SQL and this Python-kernel path is hash-diffed.
    return resize_media(decode_media(media_table(spark, sf_dir)))


QUERIES = {
    "q_multimodal_meta": _q_multimodal_meta,
    "q_multimodal_decode": _q_multimodal_decode,
    "q_multimodal_frames": _q_multimodal_frames,
    "q_multimodal_resize": _q_multimodal_resize,
}

ORACLE = {
    "q_multimodal_resize": """
WITH d AS (
  SELECT doc_id,
         16 + (octet_length(encode(text)) % 64) AS w,
         16 + ((octet_length(encode(text)) // 64) % 64) AS h
  FROM documents
),
r AS (
  SELECT doc_id, w, h,
         greatest(1, CAST(floor(w * least(64.0 / w, 64.0 / h, 1.0)) AS INTEGER)) AS out_w,
         greatest(1, CAST(floor(h * least(64.0 / w, 64.0 / h, 1.0)) AS INTEGER)) AS out_h
  FROM d
)
SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       out_w, out_h, CAST(out_w * out_h * 3 AS BIGINT) AS resized_len
FROM r
""",
    "q_multimodal_meta": """
SELECT doc_id, 'fake/blob' AS mime,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       md5(text) AS content_md5,
       upper(hex(substr(text, 1, 8))) AS prefix_hex
FROM documents
""",
    "q_multimodal_frames": """
WITH d AS (
  SELECT doc_id, 1 + (octet_length(encode(text)) % 3) AS nf FROM documents
)
SELECT doc_id, CAST(nf AS INTEGER) AS n_frames, CAST(u AS INTEGER) AS frame_idx
FROM d, unnest(range(0, nf)) AS t(u)
WHERE u % 2 = 0
""",
}
