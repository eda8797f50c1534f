"""Multimodal column plumbing — binary payloads with typed metadata.

Treats non-text modalities as opaque ``binary`` columns moved through
Arrow-batched ``mapInPandas`` stages. The decode/feature-extract steps
that need image/audio libraries are STUBBED (this container has none);
the Spark-side plumbing — schema, Arrow batch shape, partition-parallel
metadata extraction — is real and tested.

``multimodal_metadata`` is oracle-checked: the payload is the UTF-8
encoding of ``documents.text`` (a deterministic stand-in for image
bytes), pushed through the same mapInPandas boundary a real decoder
would use, then hashed/measured JVM-side — proving the binary column
survives the Arrow round-trip byte-exact (the same per-row invariant
the extraction stage guarantees for content, BASELINE.json input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citation_graph_spark.operators import register
from citation_graph_spark.tables import load_tables

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → media rows: (doc_id, media_type, payload binary)."""
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def roundtrip_payload(media: DataFrame) -> DataFrame:
    """Push binary payloads through an Arrow mapInPandas boundary —
    the slot where a real decoder (PIL/librosa/ffmpeg) would run."""

    def _passthrough(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        _passthrough, schema="doc_id long, media_type string, payload binary"
    )


def decode_image(media: DataFrame) -> DataFrame:
    """STUB: image decode → (doc_id, width, height, channels).

    Real implementation would run PIL inside mapInPandas per Arrow
    batch; the container has no imaging libraries, so this raises —
    callers gate on it (tests assert the raise)."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; plumbing is exercised via roundtrip_payload/"
        "fake_feature_extract"
    )


def fake_feature_extract(media: DataFrame) -> DataFrame:
    """Deterministic stand-in for a learned feature extractor: mean and
    max byte value per payload, computed vectorized per Arrow batch
    (numpy over the buffer — no per-row Python beyond the byte-buffer
    view)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            # one concatenated uint8 view over the whole Arrow batch:
            # per-payload reductions via np.add.reduceat on offsets —
            # no per-row Python beyond building the buffer view
            lens = pdf["payload"].str.len().to_numpy(dtype=np.int64)
            buf = np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8)
            offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
            sums = np.zeros(len(lens), dtype=np.float64)
            nonempty = lens > 0
            if buf.size:
                red = np.add.reduceat(buf.astype(np.int64), offsets[nonempty])
                sums[nonempty] = red
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": lens,
                    "mean_byte": sums / np.maximum(lens, 1),
                }
            )
            yield out

    return media.mapInPandas(
        _extract, schema="doc_id long, n_bytes long, mean_byte double"
    )


# --------------------------------------------------------------------------
@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata after an Arrow round-trip: byte length +
    sha256, both computed JVM-side on the payload that traveled through
    mapInPandas — byte-exactness is what makes the hash match the
    oracle's direct computation."""
    d = load_tables(spark, sf_dir)["documents"]
    media = roundtrip_payload(attach_payload(d))
    return media.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
    )
