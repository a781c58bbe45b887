"""Multimodal columns (SURVEY §2.12 — NEW).

Images/audio/video as opaque ``binary`` payloads with a typed metadata
struct. The Spark-side plumbing (schema, partition sizing, Arrow-batched
UDF signatures) is real and tested; the actual codec calls are stubbed
behind clearly marked hooks because image/audio libraries are not in this
container — swap `_decode_image_stub` for PIL/libvips on a real cluster.

Scale notes: binary payloads blow past `spark.sql.files.maxPartitionBytes`
assumptions — repartition by count, not bytes (`rows_per_partition`), so an
Arrow batch of decoded frames fits executor memory. Metadata-only
transformations must never deserialize the payload column (column pruning
does this for free as long as ops stay declarative).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssis_to_pyspark_agent_spark.operators import operator

# Canonical multimodal column bundle: payload + typed metadata.
MEDIA_SCHEMA = (
    "media struct<uri:string, mime:string, width:int, height:int, "
    "duration_ms:bigint, n_frames:int>"
)


@operator("media.attach_meta")
def attach_meta(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Wrap a binary column with the typed metadata struct. Cheap/lazy:
    metadata extraction here is header-sniffing only (magic bytes for
    mime), never a full decode."""
    df: DataFrame = inputs[0]
    bin_col = config["binary_col"]
    uri_col = config.get("uri_col")
    head = F.hex(F.substring(F.col(bin_col), 1, 4))
    mime = (
        F.when(head.startswith("FFD8"), "image/jpeg")
        .when(head == "89504E47", "image/png")
        .when(head == "52494646", "audio/wav")
        .when(head == "4F676753", "audio/ogg")
        .otherwise("application/octet-stream")
    )
    meta = F.struct(
        (F.col(uri_col) if uri_col else F.lit(None).cast("string")).alias("uri"),
        mime.alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
        F.lit(None).cast("int").alias("n_frames"),
    )
    return df.withColumn(config.get("out", "media"), meta)


def _decode_image_stub(payload: bytes) -> dict[str, Any]:
    """DECODE HOOK (stub): replace with PIL/libvips on a real cluster.

    Deterministic fake: 'decodes' width/height from a hash of the payload
    so tests exercise the full Arrow round-trip with stable values.
    """
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "ok": True,
    }


@operator("media.decode")
def decode(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Decode payloads via mapInPandas (Arrow batches). Output adds
    decoded_width/decoded_height/decode_ok. `rows_per_partition` guards
    executor memory against wide binary rows."""
    df: DataFrame = inputs[0]
    bin_col = config["binary_col"]
    if n := config.get("rows_per_partition"):
        import math

        total = df.count()
        df = df.repartition(max(1, math.ceil(total / n)))

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["decoded_width int", "decoded_height int", "decode_ok boolean"]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf[bin_col].map(
                lambda b: _decode_image_stub(bytes(b) if b is not None else b"")
            )
            pdf = pdf.assign(
                decoded_width=[d["width"] for d in decoded],
                decoded_height=[d["height"] for d in decoded],
                decode_ok=[d["ok"] for d in decoded],
            )
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


@operator("media.features")
def features(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Feature-extraction hook: emits a deterministic pseudo-embedding
    (seeded from payload md5) of `dim` floats via a vectorized pandas
    transform — the exact plumbing a real CLIP/wav2vec batch would use
    (model inference per Arrow batch)."""
    df: DataFrame = inputs[0]
    bin_col = config["binary_col"]
    dim = config.get("dim", 8)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"features array<float>"]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct as _struct

        def feat(b) -> list[float]:
            # hex-string md5 chain (not digest-bytes): every step is
            # md5(VARCHAR), so an engine-neutral SQL oracle can re-derive
            # the exact pseudo-embedding (DuckDB has no md5(BLOB))
            payload = bytes(b) if b is not None else b""
            out: list[float] = []
            seed_hex = hashlib.md5(payload).hexdigest()
            while len(out) < dim:
                seed_hex = hashlib.md5(seed_hex.encode()).hexdigest()
                out.extend(
                    v / 2**31
                    for v in _struct.unpack("<4i", bytes.fromhex(seed_hex))
                )
            return out[:dim]

        for pdf in it:
            yield pdf.assign(features=pdf[bin_col].map(feat))

    return df.mapInPandas(batches, schema=out_schema)


@operator("media.frame_sample")
def frame_sample(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Frame sampling plumbing: explode each media row into `n` frame rows
    (frame_idx, frame payload stub). A real implementation replaces the
    slicer with an ffmpeg keyframe extractor inside the same mapInPandas."""
    df: DataFrame = inputs[0]
    bin_col = config["binary_col"]
    n = config.get("n", 4)
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            # stub: byte-slice stands in for a decoded frame
            F.substring(F.col(bin_col), i * 16 + 1, 16).alias("frame"),
        ),
    )
    return df.withColumn("_f", F.explode(frames)).select(
        "*", F.col("_f.frame_idx").alias("frame_idx"), F.col("_f.frame").alias("frame")
    ).drop("_f")
