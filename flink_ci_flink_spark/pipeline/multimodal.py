"""Multimodal column handling: opaque binary payloads + typed metadata.

North-star extension. Images/audio/video are carried as `binary` columns
with a metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over `mapInPandas` — the Spark-side
plumbing (schema, batching, partition behavior) is real and tested, while
the codec itself is STUBBED (image/audio libraries are not in this
container): `decode_stub_features` computes deterministic byte-level
features, and `decode_image` raises NotImplementedError at the exact point
a real codec (PIL/ffmpeg) would plug in.

Scale notes: mapInPandas streams Arrow batches — constant memory per task;
binary payloads never pass through the driver. Partition count follows the
input; repartition upstream if payload sizes are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the stubbed feature extractor.
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, head_hex string, byte_sum long, kind string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", kind: str = "blob") -> DataFrame:
    """Synthesize an opaque binary column + metadata struct from text (the
    corpus has no real media; payload = UTF-8 bytes, metadata mirrors what an
    image/audio column would carry)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit("utf-8").alias("codec"),
        ),
    )


def decode_stub_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads (deterministic
    stub: byte count, head bytes as hex, byte sum). Real decoders replace
    the body of `extract` only — schema/batching stay identical."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                    "byte_sum": payloads.map(lambda b: int(sum(bytes(b)))).astype("int64"),
                    "kind": pdf["media_meta"].map(lambda m: m["kind"]),
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(df: DataFrame, **kwargs) -> DataFrame:
    """Real image decode (resize / frame-sample). STUB: the container has no
    image/audio libraries; this is the integration point for PIL/ffmpeg."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "use decode_stub_features for the plumbing-verified path"
    )
