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


THUMB_BLOCKS = 4  # md5-chain blocks -> 64 fake intensities (8x8 grid)
THUMB_PIXELS = 16 * THUMB_BLOCKS


def _thumbnail_stub(payload: bytes) -> list[int]:
    """STUB thumbnailer: deterministic fake 8×8 grayscale thumbnail — 64
    intensities 0..255 from an md5 chain (block j = the 16 digest bytes of
    ``md5(payload || ASCII j)``), exactly reproducible by the DuckDB
    oracle.  A deployment passes a real downscale instead, e.g.
    ``lambda raw: list(Image.open(io.BytesIO(raw)).convert("L")
    .resize((8, 8)).getdata())`` — the fingerprint math downstream
    (:func:`ahash_bands`, :func:`phash_near_dup`) is decoder-agnostic."""
    out: list[int] = []
    for j in range(THUMB_BLOCKS):
        out.extend(hashlib.md5(payload + str(j).encode()).digest())
    return out


THUMB_SCHEMA = "id long, pixels array<int>"


def thumbnail_assets(
    df: DataFrame, id_col: str, payload_col: str, thumbnailer=None
) -> DataFrame:
    """(id, pixels) — the decode/downscale boundary of image-content
    fingerprinting, Arrow-batched like :func:`decode_assets`.
    ``thumbnailer``: ``bytes -> list[int]`` grayscale intensities (fixed
    length per deployment), default :func:`_thumbnail_stub`."""
    thumbnailer = thumbnailer or _thumbnail_stub

    def thumb(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, pix = [], []
            for i, payload in zip(pdf["__id__"], pdf["__payload__"]):
                pix.append(thumbnailer(bytes(payload)))
                ids.append(i)
            yield pd.DataFrame({"id": ids, "pixels": pix})

    narrowed = df.select(
        F.col(id_col).alias("__id__"), F.col(payload_col).alias("__payload__")
    )
    return narrowed.mapInPandas(thumb, THUMB_SCHEMA)


def ahash_bands(
    df: DataFrame, id_col: str, pixels_col: str, n_bands: int = 4,
    band_bits: int = 16,
) -> DataFrame:
    """Average-hash (aHash) over a thumbnail, packed for Hamming banding:
    bit i is set iff ``pixels[i] > floor(mean(pixels))``, and the
    ``n_bands × band_bits`` bits come back as (id, bands array<int>) — one
    word per band, ready for the SimHash-style banded candidate join
    (operators/dedup.py e4 pattern).  Pure JVM expressions: the only UDF
    in the image-dedup pipeline is the decode itself."""
    avg = (
        f"aggregate({pixels_col}, CAST(0 AS BIGINT),"
        f" (acc, x) -> acc + x) div {n_bands * band_bits}"
    )
    words = (
        f"transform(sequence(0, {n_bands - 1}), b ->"
        f" aggregate(sequence(0, {band_bits - 1}), 0, (acc, i) ->"
        f" acc + CASE WHEN element_at({pixels_col}, {band_bits} * b + i + 1)"
        f" > __pxavg__ THEN CAST(shiftleft(1, i) AS INT) ELSE 0 END))"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.col(pixels_col))
        .withColumn("__pxavg__", F.expr(avg))
        .select("id", F.expr(words).alias("bands"))
    )


def phash_near_dup(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    max_hamming: int = 16,
    thumbnailer=None,
    n_bands: int = 4,
    band_bits: int = 16,
) -> DataFrame:
    """Image-content near-duplicate pairs by perceptual hash: thumbnail ->
    aHash -> banded candidate join -> exact Hamming verify.  Output:
    (id_a, id_b, hamming), pairs with ``hamming <= max_hamming``.

    Banding (two images are candidates iff SOME band word matches) keeps
    the join equi-key — |corpus|² never materializes — at the usual LSH
    recall trade: pairs within ``n_bands - 1`` flipped bits are guaranteed
    candidates (pigeonhole), beyond that recall decays gracefully.  The
    Hamming verify runs only on candidates: ``bit_count(a XOR b)`` summed
    across band words, all JVM-side."""
    ph = ahash_bands(
        thumbnail_assets(df, id_col, payload_col, thumbnailer=thumbnailer),
        "id", "pixels", n_bands=n_bands, band_bits=band_bits,
    ).persist()  # feeds the banded self-join AND both verify joins — without
    # the cache the decode UDF runs 4x (id + n_bands ints per asset, tiny)
    exploded = ph.select("id", F.posexplode("bands").alias("band", "word"))
    cand = (
        exploded.alias("a")
        .join(exploded.alias("b"), ["band", "word"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = (
        "aggregate(zip_with(__ba__, __bb__, (x, y) -> bit_count(x ^ y)),"
        " 0, (acc, v) -> acc + CAST(v AS INT))"
    )
    pairs = (
        cand.join(ph.select(F.col("id").alias("id_a"), F.col("bands").alias("__ba__")), "id_a")
        .join(ph.select(F.col("id").alias("id_b"), F.col("bands").alias("__bb__")), "id_b")
        .withColumn("hamming", F.expr(hamming))
    )
    return pairs.where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


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


def _text_embed_stub(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Default for :func:`embed_texts`'s ``embedder=`` hook: deterministic
    pseudo-embedding from an md5 CHAIN over the text (8 signed 16-bit
    components per digest; digest i+1 = md5 of digest i's hex string), so
    any ``dim`` is reachable and the DuckDB oracle replays it with nested
    ``md5()`` calls."""
    out: list[float] = []
    hx = text
    while len(out) < dim:
        hx = hashlib.md5(hx.encode("utf-8")).hexdigest()
        d = bytes.fromhex(hx)
        for j in range(8):
            if len(out) >= dim:
                break
            out.append(float(((d[2 * j] << 8) | d[2 * j + 1]) - 32768))
    return out


def embed_texts(
    df: DataFrame, id_col: str, text_col: str, embedder=None,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Text-side encoder of a cross-modal (CLIP-style) retrieval pair:
    (id, embedding array<double>) from a text column, the same Arrow-
    batched boundary as :func:`embed_assets` — in a deployment ``embedder``
    wraps the text tower of the joint-embedding model and ``dim`` matches
    the asset tower's output.  The result feeds
    ``operators/ann_index.ann_topk`` as the query frame unchanged, which is
    the whole point: text -> asset retrieval is one composition, not a new
    serving path."""
    embedder = embedder or (lambda t: _text_embed_stub(t, dim))

    def embed(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, vecs = [], []
            for i, text in zip(pdf["__id__"], pdf["__text__"]):
                vecs.append(embedder(str(text)))
                ids.append(i)
            yield pd.DataFrame({"id": ids, "embedding": vecs})

    narrowed = df.select(
        F.col(id_col).alias("__id__"), F.col(text_col).alias("__text__")
    )
    return narrowed.mapInPandas(embed, EMBED_SCHEMA)


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


# -- audio fingerprint near-dup (m6) ------------------------------------------
# Chromaprint-style shape: an audio asset fingerprints to a SEQUENCE of
# per-frame words, and two assets match when a run of frames aligns at
# SOME offset (a clip that starts 5 seconds in is still the same
# recording) — positional bands (ahash_bands/m5) can't express that, so
# matching here is offset-tolerant: candidates pair on bare word equality,
# vote for their implied alignment, and the best offset's overlap is
# verified by exact per-word Hamming.

FP_FRAMES = 16      # fingerprint words per asset
FP_FRAME_BYTES = 8  # stub: payload window per frame


def _fingerprint_stub(payload: bytes) -> list[int]:
    """STUB fingerprinter: word j = the first 7 md5 hex digits (28 bits —
    safely inside a signed int32) of frame j's CONTENT, frame j being the
    payload window [j*8, j*8+8).  Content-addressed frames make the fake
    behave like a real acoustic fingerprint under edits: prepending 16
    bytes shifts every word by exactly two frames, so the offset-tolerant
    matcher has something real to find.  Exactly reproducible by the
    DuckDB oracle (md5 of substrings).  A deployment passes a chromaprint
    call (``lambda raw: acoustid.chromaprint.decode_fingerprint(...)``)
    instead — the matcher downstream is fingerprinter-agnostic."""
    out = []
    for j in range(FP_FRAMES):
        frame = payload[j * FP_FRAME_BYTES:(j + 1) * FP_FRAME_BYTES]
        out.append(int(hashlib.md5(frame).hexdigest()[:7], 16))
    return out


FP_SCHEMA = "id long, fp array<int>"


def fingerprint_assets(
    df: DataFrame, id_col: str, payload_col: str, fingerprinter=None
) -> DataFrame:
    """(id, fp array<int>) — the decode boundary of audio-content
    fingerprinting, Arrow-batched like :func:`decode_assets`.
    ``fingerprinter``: ``bytes -> list[int]`` per-frame words, default
    :func:`_fingerprint_stub`."""
    fingerprinter = fingerprinter or _fingerprint_stub

    def fp(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, fps = [], []
            for i, payload in zip(pdf["__id__"], pdf["__payload__"]):
                fps.append(fingerprinter(bytes(payload)))
                ids.append(i)
            yield pd.DataFrame({"id": ids, "fp": fps})

    narrowed = df.select(
        F.col(id_col).alias("__id__"), F.col(payload_col).alias("__payload__")
    )
    return narrowed.mapInPandas(fp, FP_SCHEMA)


def audio_near_dup(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    min_matching_frames: int = 8,
    max_hamming_per_frame: int = 4,
    max_word_freq: int = 50,
    fingerprinter=None,
) -> DataFrame:
    """Audio-content near-duplicate pairs, offset-tolerant: fingerprint ->
    word-equality candidates -> per-pair best-offset vote -> aligned
    Hamming verify.  Output: (id_a, id_b, offset, matching_frames,
    hamming) — pairs whose best alignment has at least
    ``min_matching_frames`` exactly-equal words AND whose overlap's total
    bit-Hamming stays under ``max_hamming_per_frame`` per overlapping
    frame.  ``offset`` is frames of ``id_a`` leading ``id_b`` (positive:
    b's audio starts inside a).

    Scale shape: the candidate join pairs on bare word VALUE (an
    equi-join, never |corpus|²); ubiquitous words — real audio's silence
    frames — are dropped when they appear in more than ``max_word_freq``
    assets (the LSH ``max_bucket`` skew-guard discipline, dedup.py).  The
    offset vote and verify run per candidate pair: O(candidates), all
    JVM expressions after the one fingerprint UDF."""
    fps = fingerprint_assets(
        df, id_col, payload_col, fingerprinter=fingerprinter
    )
    return fingerprint_align_pairs(
        fps,
        min_matching_frames=min_matching_frames,
        max_hamming_per_frame=max_hamming_per_frame,
        max_word_freq=max_word_freq,
    )


def fingerprint_align_pairs(
    fps: DataFrame,
    min_matching_frames: int = 8,
    max_hamming_per_frame: int = 4,
    max_word_freq: int = 50,
) -> DataFrame:
    """The offset-tolerant sequence matcher behind :func:`audio_near_dup`
    and :func:`video_near_dup`, over a prebuilt (id, fp array<int>) frame —
    fingerprints may be DIFFERENT lengths per asset (video frame counts
    vary); the aligned overlap is the non-null zip at the voted offset."""
    fps = fps.persist()  # feeds the exploded join and both verify sides
    words = fps.select("id", F.posexplode("fp").alias("frame", "word"))
    # silence-frame guard: a word shared by too many assets pairs
    # everything with everything — drop it from candidacy (verify still
    # sees it inside fp arrays, so true pairs lose nothing but the vote)
    hot = (
        words.groupBy("word")
        .agg(F.countDistinct("id").alias("nf"))
        .where(F.col("nf") > max_word_freq)
        .select("word")
    )
    words = words.join(F.broadcast(hot), "word", "left_anti")
    votes = (
        words.alias("a")
        .join(words.alias("b"), "word")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (F.col("a.frame") - F.col("b.frame")).alias("offset"),
        )
        .groupBy("id_a", "id_b", "offset")
        .agg(F.count("*").alias("votes"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.desc("votes"), F.asc("offset")
    )
    best = (
        votes.withColumn("__rk__", F.row_number().over(w))
        .where("__rk__ = 1")
        .select("id_a", "id_b", "offset")
    )
    # aligned overlap at the voted offset: a[offset+k] vs b[k] (offset>=0),
    # a[k] vs b[-offset+k] (offset<0); slice() is 1-based
    aligned = (
        best.join(
            fps.select(F.col("id").alias("id_a"), F.col("fp").alias("__fa__")),
            "id_a",
        )
        .join(
            fps.select(F.col("id").alias("id_b"), F.col("fp").alias("__fb__")),
            "id_b",
        )
        .withColumn(
            "__ov__",
            F.expr(
                "CASE WHEN offset >= 0"
                " THEN zip_with(slice(__fa__, offset + 1, size(__fa__)),"
                "               __fb__, (x, y) -> struct(x, y))"
                " ELSE zip_with(__fa__,"
                "               slice(__fb__, -offset + 1, size(__fb__)),"
                "               (x, y) -> struct(x, y)) END"
            ),
        )
        .withColumn(
            "__ov__",
            F.expr("filter(__ov__, s -> s.x IS NOT NULL AND s.y IS NOT NULL)"),
        )
    )
    out = aligned.select(
        "id_a",
        "id_b",
        "offset",
        F.expr(
            "size(filter(__ov__, s -> s.x = s.y))"
        ).alias("matching_frames"),
        F.expr(
            "aggregate(__ov__, 0, (acc, s) ->"
            " acc + CAST(bit_count(s.x ^ s.y) AS INT))"
        ).alias("hamming"),
        F.expr("size(__ov__)").alias("__n_ov__"),
    )
    result = out.where(
        (F.col("matching_frames") >= min_matching_frames)
        & (
            F.col("hamming")
            <= F.lit(int(max_hamming_per_frame)) * F.col("__n_ov__")
        )
    ).select("id_a", "id_b", "offset", "matching_frames", "hamming")
    # Materialize the (small: pairs, not assets) result, then release the
    # fingerprint cache — p7 composes the audio AND video matchers in one
    # job, so leaving the persist live would accumulate cached partitions
    # for the session lifetime (same discipline as connected_components).
    result = result.localCheckpoint(eager=True)
    fps.unpersist()
    return result


# -- video near-dup (m7): frame-sampled fingerprints + the m6 matcher --------

VIDEO_FRAME_BYTES = 8


def video_fingerprints(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    every_n: int = 10,
) -> DataFrame:
    """(id, fp array<int>): per-asset fingerprint over the SAMPLED frames
    of :func:`frame_sample_plan` — frame count varies per asset (the fake
    duration probe), sampling takes every ``every_n``-th frame, and each
    sampled frame's word is a 28-bit hash of that frame's payload window.
    Entirely JVM expressions (md5 + conv + transform): unlike the image
    and audio decode boundaries, nothing here needs Python at all, which
    is the right shape for the highest-volume modality.

    The window-addressed stub behaves like real frame content under
    edits: trimming a ``every_n``-frame-aligned prefix shifts the word
    sequence instead of scrambling it, so the offset matcher has real
    structure to find.  A deployment replaces the word expression with a
    real frame-hash column produced by its decode stage — the matcher
    (:func:`fingerprint_align_pairs`) is agnostic."""
    n_frames = f"length({payload_col}) % 100 + 1"  # frame_sample_plan's probe
    word = (
        f"CAST(conv(substring(md5(substring({payload_col},"
        f" idx * {VIDEO_FRAME_BYTES} + 1, {VIDEO_FRAME_BYTES})), 1, 7),"
        " 16, 10) AS INT)"
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform(sequence(0, {n_frames} - 1, {int(every_n)}),"
            f" idx -> {word})"
        ).alias("fp"),
    )


def video_near_dup(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    every_n: int = 10,
    min_matching_frames: int = 4,
    max_hamming_per_frame: int = 4,
    max_word_freq: int = 50,
) -> DataFrame:
    """Video-content near-duplicate pairs: frame-sampled fingerprints ->
    the m6 offset-tolerant matcher.  Output (id_a, id_b, offset,
    matching_frames, hamming) with ``offset`` in SAMPLED-frame steps.
    Same scale shape as :func:`audio_near_dup` (word-equality equi-join
    with the hot-word guard, per-pair vote + verify), with the decode
    boundary gone entirely — the fingerprint is one codegen projection."""
    fps = video_fingerprints(df, id_col, payload_col, every_n=every_n)
    return fingerprint_align_pairs(
        fps,
        min_matching_frames=min_matching_frames,
        max_hamming_per_frame=max_hamming_per_frame,
        max_word_freq=max_word_freq,
    )
