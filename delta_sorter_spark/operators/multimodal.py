"""Multimodal column plumbing (north-star E5, SURVEY §2.8).

Convention: a multimodal asset is an opaque ``binary`` payload column plus a
typed metadata struct (media_type, byte size, optional uri for
pointer-style storage where the payload lives in an object store and only
the reference rides in the table).  All Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested; the
actual media decode is STUBBED because this container has no image/audio
libraries (clearly marked below; swap ``_decode_stub`` for a PIL/ffmpeg call
in a real deployment).

Decode/feature steps run as ``mapInPandas`` (Arrow-batched), which is the
right shape at 100 TB: each task decodes its partition's payloads locally,
nothing is collected to the driver, and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_METADATA_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("uri", T.StringType()),
    ]
)


def attach_asset_metadata(df: DataFrame, payload_col: str, media_type: str) -> DataFrame:
    """Add the typed metadata struct for a binary payload column."""
    return df.withColumn(
        f"{payload_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.lit(None).cast("string").alias("uri"),
        ),
    )


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode: deterministic fake (width, height) derived from an md5 of
    the payload (md5 so the DuckDB oracle can reproduce the fake exactly).
    The default for the ``decoder=`` hook on :func:`decode_assets` /
    :func:`resize_assets` — a deployment passes a real decoder (e.g.
    ``lambda raw: PIL.Image.open(io.BytesIO(raw)).size``) without touching
    the operators; this container has no media libraries (environment
    constraint), and the Spark plumbing around the call is the product."""
    digest = hashlib.md5(payload).digest()
    return 16 + digest[0] % 64, 16 + digest[1] % 64


DECODED_SCHEMA = "id long, media_type string, n_bytes long, width int, height int"


def decode_assets(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    media_type_col: str,
    decoder=None,
) -> DataFrame:
    """Decode binary payloads into per-asset features via Arrow-batched
    mapInPandas: (id, media_type, n_bytes, width, height).

    ``decoder``: ``bytes -> (width, height)``, default :func:`_decode_stub`.
    The callable is pickled into the executor-side closure, so it must be
    importable/serializable (a top-level function or a small lambda over
    imported libs — the usual Spark UDF rule)."""
    decoder = decoder or _decode_stub

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            widths, heights, sizes = [], [], []
            for payload in pdf["__payload__"]:
                raw = bytes(payload)
                w, h = decoder(raw)
                widths.append(w)
                heights.append(h)
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "id": pdf["__id__"],
                    "media_type": pdf["__mt__"],
                    "n_bytes": sizes,
                    "width": widths,
                    "height": heights,
                }
            )

    narrowed = df.select(
        F.col(id_col).alias("__id__"),
        F.col(payload_col).alias("__payload__"),
        F.col(media_type_col).alias("__mt__"),
    )
    return narrowed.mapInPandas(decode, DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "id long, width int, height int, resized_width int, resized_height int,"
    " resized_bytes long"
)


def resize_assets(
    df: DataFrame, id_col: str, payload_col: str, max_dim: int = 32, decoder=None
) -> DataFrame:
    """Resize plumbing: decode -> aspect-preserving downscale to fit
    ``max_dim`` -> re-encoded byte size (fake: w*h*3).  Same Arrow-batched
    ``mapInPandas`` shape a real PIL/ffmpeg resize would use; only the pixel
    work is stubbed (environment has no media libs).  ``decoder`` as in
    :func:`decode_assets`."""
    decoder = decoder or _decode_stub

    def resize(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("id", "width", "height", "resized_width", "resized_height", "resized_bytes")}
            for i, payload in zip(pdf["__id__"], pdf["__payload__"]):
                w, h = decoder(bytes(payload))
                scale = min(1.0, max_dim / max(w, h))
                rw, rh = max(1, int(w * scale)), max(1, int(h * scale))
                out["id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["resized_width"].append(rw)
                out["resized_height"].append(rh)
                out["resized_bytes"].append(rw * rh * 3)
            yield pd.DataFrame(out)

    narrowed = df.select(
        F.col(id_col).alias("__id__"), F.col(payload_col).alias("__payload__")
    )
    return narrowed.mapInPandas(resize, RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, payload_col: str, every_n: int = 10) -> DataFrame:
    """Plumbing for video frame sampling: explode a deterministic frame index
    list per asset (real decoder would emit actual frames).  Shows the
    1->many mapInPandas/explode shape with bounded batches."""
    n_frames = (F.length(F.col(payload_col)) % 100 + 1).alias("n_frames")  # fake probe
    frames = df.select(F.col(id_col).alias("id"), n_frames).withColumn(
        "frame_idx", F.explode(F.expr(f"sequence(0, n_frames - 1, {every_n})"))
    )
    return frames.select("id", "frame_idx")


EMBED_DIM = 8
EMBED_SCHEMA = "id long, embedding array<double>"


def _embed_stub(payload: bytes) -> list[float]:
    """Default for the ``embedder=`` hook: deterministic pseudo-embedding
    from the payload's md5 digest (8 signed 16-bit components), exactly
    reproducible by the DuckDB oracle."""
    d = hashlib.md5(payload).digest()
    return [
        float(((d[2 * j] << 8) | d[2 * j + 1]) - 32768) for j in range(EMBED_DIM)
    ]


def embed_assets(
    df: DataFrame, id_col: str, payload_col: str, embedder=None
) -> DataFrame:
    """Embedding step: (id, embedding array<double>) — ``embedder``
    (``bytes -> list[float]``, default :func:`_embed_stub`) runs inside an
    Arrow-batched ``mapInPandas``, so the output feeds the
    similarity/ANN/semantic-dedup operators unchanged.  In a deployment the
    embedder wraps a CLIP/audio-encoder call; the batched boundary, the
    narrow input projection and the (id, array<double>) output contract are
    exactly what that call needs — swap the callable, nothing else moves."""
    embedder = embedder or _embed_stub

    def embed(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, vecs = [], []
            for i, payload in zip(pdf["__id__"], pdf["__payload__"]):
                vecs.append(embedder(bytes(payload)))
                ids.append(i)
            yield pd.DataFrame({"id": ids, "embedding": vecs})

    narrowed = df.select(
        F.col(id_col).alias("__id__"), F.col(payload_col).alias("__payload__")
    )
    return narrowed.mapInPandas(embed, EMBED_SCHEMA)
