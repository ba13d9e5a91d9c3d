"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata (BASELINE.json north-star extension; SURVEY.md §7
step 9).

Design: a multimodal column is a struct
``{data: binary, media_type: string, meta: map<string,string>}``; heavy
per-item work (decode / resize / feature-extract / frame-sample) runs as
Arrow-batched ``mapInPandas`` so each task streams record batches — the
Spark-side plumbing (schemas, batch shapes, partition preservation) is
real and tested. The actual codec calls are stubbed: the container ships
no image/audio libraries, so ``decode_images(..., fake=False)`` raises
``NotImplementedError`` at the call site where PIL/libav would be
invoked, and ``fake=True`` substitutes a deterministic hash-derived
payload with the same schema/shape the real decoder would produce.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pyspark.sql.functions as F
from pyspark.sql import types as st

from ibis_spark.expr.table import Table

MEDIA_SCHEMA = st.StructType(
    [
        st.StructField("data", st.BinaryType()),
        st.StructField("media_type", st.StringType()),
        st.StructField("meta", st.MapType(st.StringType(), st.StringType())),
    ]
)


def attach_media(t: Table, data_col: str, media_type: str = "application/octet-stream") -> Table:
    """Wrap a raw binary/string column into the media struct convention."""
    c = F.col(data_col).cast("binary")
    media = F.struct(
        c.alias("data"),
        F.lit(media_type).alias("media_type"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    return Table(t.df.withColumn("media", media))


_FEATURE_DIM = 8


def _fake_decode(payload: bytes, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoder+feature-extractor: derive
    ``dim`` floats in [0,1) from the sha256 of the payload."""
    h = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def decode_images(
    t: Table,
    media_col: str = "media",
    *,
    fake: bool = False,
    resize: Optional[tuple[int, int]] = None,
    feature_dim: int = _FEATURE_DIM,
) -> Table:
    """Decode image payloads and emit (width, height, features).

    Runs as ``mapInPandas`` — one Arrow batch at a time per task, so a
    1000-executor cluster decodes embarrassingly parallel with no shuffle.
    ``fake=True`` uses the deterministic hash decoder (for tests / this
    container); ``fake=False`` requires PIL and raises otherwise.
    """
    df = t.df
    out_schema = st.StructType(
        list(df.schema.fields)
        + [
            st.StructField("width", st.IntegerType()),
            st.StructField("height", st.IntegerType()),
            st.StructField("features", st.ArrayType(st.FloatType())),
        ]
    )

    target = resize

    def run(batches: Iterator) -> Iterator:
        if not fake:
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - no PIL in container
                raise NotImplementedError(
                    "real image decoding requires PIL; pass fake=True for the "
                    "deterministic stub decoder"
                ) from e
        import pandas as pd

        for pdf in batches:
            payloads = pdf[media_col].map(
                lambda m: (m["data"] if isinstance(m, dict) else m) or b""
            )
            if fake:
                feats = payloads.map(lambda b: _fake_decode(bytes(b), feature_dim))
                # deterministic fake dimensions from payload length
                w = payloads.map(lambda b: 16 + len(bytes(b)) % 64).astype("int32")
                h = (w // 2).astype("int32")
            else:  # pragma: no cover - exercised only with PIL installed
                raise NotImplementedError("real decode path requires PIL")
            if target is not None:
                w = pd.Series([target[0]] * len(pdf), index=pdf.index, dtype="int32")
                h = pd.Series([target[1]] * len(pdf), index=pdf.index, dtype="int32")
            out = pdf.copy()
            out["width"] = w
            out["height"] = h
            out["features"] = feats
            yield out

    return Table(df.mapInPandas(run, out_schema))


def sample_frames(
    t: Table,
    media_col: str = "media",
    *,
    every_n: int = 10,
    fake: bool = False,
) -> Table:
    """Explode a (fake) video payload into sampled frame rows
    (frame_idx, frame struct). Same mapInPandas batch shape as a real
    libav-backed sampler; the codec is the stub."""
    df = t.df
    out_schema = st.StructType(
        list(df.schema.fields)
        + [st.StructField("frame_idx", st.IntegerType())]
    )

    def run(batches: Iterator) -> Iterator:
        if not fake:
            raise NotImplementedError(
                "real frame sampling requires an av library; pass fake=True"
            )
        for pdf in batches:
            reps = pdf[media_col].map(
                lambda m: max(
                    1, len(((m["data"] if isinstance(m, dict) else m) or b"")) // every_n
                )
            )
            out = pdf.loc[pdf.index.repeat(reps)].copy()
            out["frame_idx"] = [i for r in reps for i in range(r)]
            yield out

    return Table(df.mapInPandas(run, out_schema))
