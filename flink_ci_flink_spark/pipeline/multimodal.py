"""Multimodal column handling: opaque binary payloads + typed metadata.

North-star extension. Images/audio/video are carried as `binary` columns
with a metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over `mapInPandas` — the Spark-side
plumbing (schema, batching, partition behavior) is real and tested.
`decode_image` REALLY decodes uncompressed 24-bit BMP (pure stdlib: header
parse + padded bottom-up pixel walk); compressed codecs (PNG/JPEG/ffmpeg
formats) stay honestly gated behind NotImplementedError since the container
has no image/audio libraries, with `decode_stub_features` keeping their
plumbing tested.

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


#: Output schema of the real BMP decoder.
BMP_FEATURE_SCHEMA = (
    "doc_id long, width integer, height integer, bpp integer, "
    "n_pixels long, px_sum long"
)


def _bmp_bytes(doc_id: int) -> bytes:
    """A real 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up, rows
    padded to 4 bytes — the public Windows BMP spec, stdlib-only). Width,
    height, and every pixel are deterministic functions of doc_id so an
    SQL oracle can recompute what the decoder reads back."""
    import struct

    w, h = 1 + doc_id % 13, 1 + doc_id % 7
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = bytearray()
        for x in range(w):
            row += bytes(
                (
                    (doc_id * 7 + x * 13 + y * 31) % 256,   # B
                    (doc_id * 11 + x * 17 + y * 5) % 256,   # G
                    (doc_id * 3 + x * 19 + y * 23) % 256,   # R
                )
            )
        rows.append(bytes(row) + b"\x00" * (stride - w * 3))
    return header + b"".join(rows)


def synthesize_bmp(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a real BMP payload per row (mapInPandas, Arrow-batched;
    payloads are built executor-side and never pass through the driver)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_bmp_bytes(int(d)) for d in ids]}
            )

    return df.mapInPandas(gen, "doc_id long, payload binary")


def decode_image(df: DataFrame, id_col: str = "doc_id", kind: str = "bmp") -> DataFrame:
    """Real image decode over binary payloads (pure stdlib, mapInPandas).

    Supports uncompressed 24-bit BMP end-to-end: parses the file +
    BITMAPINFOHEADER headers, walks the padded bottom-up pixel rows, and
    emits (width, height, bpp, n_pixels, px_sum) where px_sum totals every
    B/G/R byte excluding row padding. Other codecs (PNG/JPEG/audio/video)
    remain honestly gated: they need PIL/ffmpeg, absent in this container —
    `decode_stub_features` keeps their plumbing tested."""
    if kind != "bmp":
        raise NotImplementedError(
            f"codec {kind!r} needs PIL/ffmpeg (not in this environment); "
            "only uncompressed 24-bit BMP decodes natively"
        )
    import struct

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "bpp", "n_pixels", "px_sum")}
            for did, payload in zip(pdf[id_col].astype("int64"), pdf["payload"]):
                b = bytes(payload)
                if b[:2] != b"BM":
                    raise ValueError(f"doc {did}: not a BMP payload")
                off = struct.unpack_from("<I", b, 10)[0]
                _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
                if bpp != 24 or comp != 0:
                    raise ValueError(f"doc {did}: only uncompressed 24-bit BMP")
                stride = (w * 3 + 3) & ~3
                px_sum = 0
                for y in range(abs(h)):
                    row = b[off + y * stride : off + y * stride + w * 3]
                    px_sum += sum(row)
                out["doc_id"].append(int(did))
                out["width"].append(w)
                out["height"].append(abs(h))
                out["bpp"].append(bpp)
                out["n_pixels"].append(w * abs(h))
                out["px_sum"].append(px_sum)
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, BMP_FEATURE_SCHEMA)
