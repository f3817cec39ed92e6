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
    # mapInPandas Python kernel — but the deterministic stub is pure
    # arithmetic over the payload bytes, and the corpus text is pure
    # ASCII (code point == byte, verified in the oracle itself via
    # strlen == length), so the FULL decode chain is SQL-recomputable
    # and hash-diffed (r2; was rows-only). tests/test_multimodal.py
    # additionally pins golden rows on fixed non-corpus payloads.
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



AUDIO_WINDOW = 256


def audio_energy(media: DataFrame, window: int = AUDIO_WINDOW) -> DataFrame:
    """Audio-style feature kernel: treat the byte stream as PCM-ish
    samples, frame into fixed windows, mean-square energy per window,
    per-item summary. Same mapInPandas architecture as decode/resize —
    a real implementation swaps the byte loop for numpy over decoded
    PCM. Energies are dyadic rationals (integer/2^8), so window sums
    are exact in double and the summary is order-independent —
    hash-diffable cross-engine. Items shorter than one window emit
    nothing (no partial-window energy), matching the oracle's GROUP BY.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                nwin = len(b) // window
                if nwin == 0:
                    continue
                energies = [
                    sum(x * x for x in b[i * window : (i + 1) * window]) / float(window)
                    for i in range(nwin)
                ]
                # raw doubles: rounding happens engine-side in the query
                # (Python round() is half-even; dyadic energies hit exact
                # halves constantly at 4 decimals)
                rows.append(
                    (int(doc_id), nwin, sum(energies) / nwin, max(energies))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_windows", "avg_energy", "max_energy"]
            )

    return media.mapInPandas(
        kernel, schema="doc_id long, n_windows int, avg_energy double, max_energy double"
    )


def _q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ASCII corpus: bytes == code points, so the oracle recomputes the
    # windowed energies with ascii() arithmetic — full-chain hash diff.
    out = audio_energy(media_table(spark, sf_dir))
    return out.withColumn("avg_energy", F.round("avg_energy", 4)).withColumn(
        "max_energy", F.round("max_energy", 4)
    )


QUERIES = {
    "q_multimodal_meta": _q_multimodal_meta,
    "q_multimodal_decode": _q_multimodal_decode,
    "q_multimodal_frames": _q_multimodal_frames,
    "q_multimodal_resize": _q_multimodal_resize,
    "q_multimodal_audio": _q_multimodal_audio,
}

ORACLE = {
    # mirrors the decode stub byte-for-byte: utf-8 payload of ASCII text
    # means ord(char) == byte value; strlen = byte length. mean_luma is
    # an exact small-int ratio (k/255) — identical double bits, no
    # rounding needed.
    "q_multimodal_decode": """
SELECT doc_id,
       CAST(strlen(text) AS INTEGER) AS byte_len,
       CAST(16 + strlen(text) % 64 AS INTEGER) AS width,
       CAST(16 + (strlen(text) // 64) % 64 AS INTEGER) AS height,
       CAST(1 + strlen(text) % 3 AS INTEGER) AS n_frames,
       CAST(coalesce(list_sum(list_transform(
              range(1, CAST(least(strlen(text), 32) AS INTEGER) + 1),
              i -> ascii(text[CAST(i AS INTEGER):CAST(i AS INTEGER)]))), 0) % 256
            AS DOUBLE) / 255.0 AS mean_luma
FROM documents
""",
    "q_multimodal_audio": """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
w AS (
  SELECT doc_id, text, CAST(u AS INTEGER) AS wi
  FROM d, unnest(range(0, n // 256)) AS t(u)
),
e AS (
  SELECT doc_id, wi,
         list_sum(list_transform(range(1, 257),
                  i -> ascii(text[CAST(wi*256 + i AS INTEGER):CAST(wi*256 + i AS INTEGER)])
                       * ascii(text[CAST(wi*256 + i AS INTEGER):CAST(wi*256 + i AS INTEGER)])))
           / 256.0 AS energy
  FROM w
)
SELECT doc_id, CAST(count(1) AS INTEGER) AS n_windows,
       round(sum(energy) / count(1), 4) AS avg_energy,
       round(max(energy), 4) AS max_energy
FROM e GROUP BY doc_id
""",
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
