"""Multimodal columns (SURVEY §2.12 — NEW).

Images/audio/video as opaque ``binary`` payloads with a typed metadata
struct. The Spark-side plumbing (schema, partition sizing, Arrow-batched
UDF signatures) is real and tested. Metadata extraction is REAL for
container headers — PNG IHDR, JPEG SOFn, GIF logical screen descriptor,
WAV fmt/data chunks — via stdlib ``struct`` (no codec deps needed for
dimensions/duration). Full pixel/sample decode (``decoder='stub'``) stays
a clearly marked deterministic fake because pixel codecs (PIL/libvips/
ffmpeg) are not in this container — swap `_decode_image_stub` on a real
cluster.

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
    """PIXEL-DECODE HOOK (stub): replace with PIL/libvips on a real
    cluster.

    Deterministic fake: 'decodes' width/height from a hash of the payload
    so tests exercise the full Arrow round-trip with stable values that an
    engine-neutral SQL oracle can re-derive (q67).
    """
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return {
        "format": "stub",
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "duration_ms": None,
        "ok": True,
    }


def parse_media_header(payload: bytes) -> dict[str, Any]:
    """REAL container-header metadata via stdlib ``struct`` — no codec
    libraries needed for true dimensions/duration:

    - PNG: IHDR width/height (big-endian u32 at offset 16/20)
    - JPEG: marker walk to SOF0/1/2/... (height/width big-endian u16)
    - GIF: logical screen descriptor (little-endian u16 at 6/8)
    - WAV: RIFF chunk walk — fmt byte-rate + data size -> duration_ms

    Unknown/truncated payloads return ok=False with null metadata (never a
    guess). Runs per-row inside an Arrow batch; pure byte peeking, so the
    cost is bounded by header size, not payload size."""
    import struct as _s

    def _dims_ok(w: int, h: int) -> bool:
        # spec says u32, the output schema says Int32: a forged header
        # with a dimension above 2^31-1 must come back ok=False, not
        # blow up pd.array(dtype="Int32") and fail the whole Arrow task
        return 0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF

    p = payload or b""
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
            w, h = _s.unpack(">II", p[16:24])
            if _dims_ok(w, h):
                return {"format": "png", "width": w, "height": h,
                        "duration_ms": None, "ok": True}
        elif p[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(p):
                if p[i] != 0xFF:
                    i += 1
                    continue
                marker = p[i + 1]
                if marker == 0xFF:
                    i += 1  # 0xFF fill/padding byte before a marker
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                if marker in (0x00, 0xD9, 0xDA):
                    # 0xFF00 is entropy byte-stuffing and 0xD9/0xDA mark
                    # EOI / start-of-scan: a SOF must precede SOS, so
                    # walking further would scan compressed data where a
                    # coincidental 0xFFCx would yield FABRICATED
                    # dimensions with ok=True
                    break
                (seglen,) = _s.unpack(">H", p[i + 2:i + 4])
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = _s.unpack(">HH", p[i + 5:i + 9])
                    if _dims_ok(w, h):
                        return {"format": "jpeg", "width": w, "height": h,
                                "duration_ms": None, "ok": True}
                    break
                i += 2 + seglen
        if p[:6] in (b"GIF87a", b"GIF89a"):
            w, h = _s.unpack("<HH", p[6:10])
            return {"format": "gif", "width": w, "height": h,
                    "duration_ms": None, "ok": True}
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            i, byte_rate, data_size = 12, None, None
            while i + 8 <= len(p):
                cid = p[i:i + 4]
                (csize,) = _s.unpack("<I", p[i + 4:i + 8])
                if cid == b"fmt " and csize >= 12:
                    # chunk data: fmt(2) channels(2) rate(4) byte_rate(4)
                    (byte_rate,) = _s.unpack("<I", p[i + 16:i + 20])
                elif cid == b"data":
                    data_size = csize
                i += 8 + csize + (csize & 1)  # chunks are 2-byte aligned
            if byte_rate and data_size is not None:
                return {"format": "wav", "width": None, "height": None,
                        "duration_ms": data_size * 1000 // byte_rate,
                        "ok": True}
    except (IndexError, ValueError, _s.error):
        pass
    return {"format": None, "width": None, "height": None,
            "duration_ms": None, "ok": False}


@operator("media.decode")
def decode(spark: SparkSession, inputs, config, context) -> DataFrame:
    """Decode payloads via mapInPandas (Arrow batches). Output adds
    decoded_format/decoded_width/decoded_height/decoded_duration_ms/
    decode_ok. `rows_per_partition` guards executor memory against wide
    binary rows.

    `decoder`: 'headers' (default) — REAL stdlib container-header parse
    (see :func:`parse_media_header`); unrecognized payloads come back
    ok=False, never fabricated. 'stub' — the deterministic md5 fake that
    stands in for a pixel codec (q67 uses it so the full Arrow chain is
    still hash-checked against a SQL oracle over synthetic payloads)."""
    df: DataFrame = inputs[0]
    bin_col = config["binary_col"]
    decode_fn = (
        _decode_image_stub
        if config.get("decoder", "headers") == "stub"
        else parse_media_header
    )
    if n := config.get("rows_per_partition"):
        import math

        total = df.count()
        df = df.repartition(max(1, math.ceil(total / n)))

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["decoded_format string", "decoded_width int",
           "decoded_height int", "decoded_duration_ms bigint",
           "decode_ok boolean"]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf[bin_col].map(
                lambda b: decode_fn(bytes(b) if b is not None else b"")
            )
            pdf = pdf.assign(
                decoded_format=[d["format"] for d in decoded],
                decoded_width=pd.array(
                    [d["width"] for d in decoded], dtype="Int32"
                ),
                decoded_height=pd.array(
                    [d["height"] for d in decoded], dtype="Int32"
                ),
                decoded_duration_ms=pd.array(
                    [d["duration_ms"] for d in decoded], dtype="Int64"
                ),
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
