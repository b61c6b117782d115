"""Multimodal column plumbing (SURVEY.md §2.11 north-star).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partition-parallel Arrow
batches via ``mapInPandas``, UDF signatures, batch shapes — is real
and tested. Two decoder branches: ``decoder="fake"`` is a
deterministic byte-derived decode (used by the oracle-checked
queries so results are engine-independent); ``decoder="real"``
decodes WAV audio with the stdlib ``wave`` module and images with
Pillow when importable (undecodable/unsupported payloads yield NULL
dims — the graceful dirty-crawl shape). Video remains plumbing-only:
the demux hook is where ffmpeg/PyAV would plug in on a real cluster.

Design for 100 TB of media:
- binary payloads never shuffle: decode/feature steps are narrow
  ``mapInPandas`` stages over the scan;
- metadata-only queries never touch ``content`` (column pruning —
  keep metadata in separate parquet columns, payload in its own);
- Arrow batch size is bounded by ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` so a batch of large blobs fits in memory.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdata_logs_spark.functions import spread_small_input

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("declared_width", IntegerType()),
        StructField("declared_height", IntegerType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus: blob bytes derived from
    sha256(media_id) — no RNG, reproducible across engines/runs."""
    def gen():
        for i in range(n):
            seed = hashlib.sha256(str(i).encode()).digest()
            blob = (seed * ((i % 7) + 1))[: 32 + (i % 5) * 16]
            kind = ("image", "audio", "video")[i % 3]
            yield (i, kind, bytearray(blob), 16 + i % 8, 16 + i % 4)

    return spark.createDataFrame(gen(), MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Opaque-binary media table derived deterministically from the
    ``documents`` fixture (utf-8 text bytes as the payload blob).

    Exists so the multimodal decode path can be ORACLE-CHECKED
    cross-engine: the payload derivation is expressible in plain SQL,
    so DuckDB can reproduce the fake decode byte-for-byte (the
    documents fixture is pure ASCII; verified octet_length == length).
    """
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit(None).cast(IntegerType()).alias("declared_width"),
        F.lit(None).cast(IntegerType()).alias("declared_height"),
    )


def decode_media(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode step as a narrow Arrow-batched mapInPandas stage.

    ``fake``: deterministic pseudo-decode (dims from the first bytes,
    checksum over the payload) — exercises the full batch path.
    ``real``: actual codecs, imported at runtime inside the Arrow
    batch fn (so only executors need the libs): stdlib ``wave`` for
    audio (always available), Pillow for images (optional), and a
    pure-python ISO BMFF box walk for MP4/MOV video dims (header
    demux only — frame decode is where ffmpeg/PyAV would plug in on
    a real cluster). An absent lib or an undecodable payload yields
    NULL dims rather than failing the stage — the graceful shape for
    a dirty 100 TB media crawl. ``n_bytes`` and ``checksum`` are
    codec-independent and always populated.
    """
    if decoder == "real":
        return media.mapInPandas(_decode_real_batches, DECODED_SCHEMA)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "width": pdf["content"].map(
                        lambda b: struct.unpack(">H", bytes(b[:2]))[0] % 4096
                    ),
                    "height": pdf["content"].map(
                        lambda b: struct.unpack(">H", bytes(b[2:4]))[0] % 4096
                    ),
                    "checksum": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )
            yield out

    return media.mapInPandas(decode, DECODED_SCHEMA)


def _decode_real_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow batch fn for ``decoder="real"``. Codec imports happen
    here, on the executor, once per python worker."""
    import io
    import wave as wave_mod

    try:
        from PIL import Image  # optional — image dims stay NULL without it
    except ImportError:
        Image = None

    def mp4_dims(raw: bytes) -> tuple[int | None, int | None]:
        """Pure-python ISO BMFF (MP4/MOV) demux: walk the box tree to
        every ``tkhd`` and return the largest track's presentation
        width/height (16.16 fixed-point, the last 8 bytes of the box
        — an offset valid for both tkhd versions). No codec work,
        just container headers: the same cheap stat a real demuxer
        reads before deciding whether to decode frames."""
        containers = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
        best: tuple[int, int] | None = None
        stack = [(0, len(raw))]
        while stack:
            pos, end = stack.pop()
            while pos + 8 <= end:
                size = struct.unpack(">I", raw[pos : pos + 4])[0]
                btype = raw[pos + 4 : pos + 8]
                payload = pos + 8
                if size == 1:  # 64-bit largesize follows the type
                    if pos + 16 > end:
                        break
                    size = struct.unpack(">Q", raw[pos + 8 : pos + 16])[0]
                    payload = pos + 16
                elif size == 0:  # box extends to end of enclosing box
                    size = end - pos
                if size < 8 or pos + size > end:
                    break  # corrupt length -> stop scanning this level
                if btype in containers:
                    stack.append((payload, pos + size))
                elif btype == b"tkhd" and size >= 24:
                    w16, h16 = struct.unpack(
                        ">II", raw[pos + size - 8 : pos + size]
                    )
                    w, h = w16 >> 16, h16 >> 16
                    if w > 0 and h > 0 and (best is None or w * h > best[0] * best[1]):
                        best = (w, h)
                pos += size
        return best if best is not None else (None, None)

    def dims(kind: str, raw: bytes) -> tuple[int | None, int | None]:
        try:
            if kind == "image" and Image is not None:
                with Image.open(io.BytesIO(raw)) as im:
                    return int(im.width), int(im.height)
            if kind == "audio":
                with wave_mod.open(io.BytesIO(raw)) as w:
                    # schema is (width, height); for audio report
                    # (sample rate, channels) — documented mapping
                    return int(w.getframerate()), int(w.getnchannels())
            if kind == "video" and raw[4:8] in (b"ftyp", b"moov", b"wide", b"free"):
                return mp4_dims(raw)
        except Exception:
            pass  # undecodable payload -> NULL dims, row survives
        return None, None

    for pdf in batches:
        decoded = [
            dims(k, bytes(b)) for k, b in zip(pdf["kind"], pdf["content"])
        ]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int64"),
                "width": pd.array([d[0] for d in decoded], dtype="Int32"),
                "height": pd.array([d[1] for d in decoded], dtype="Int32"),
                "checksum": pdf["content"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            }
        )


def frame_sample_offsets(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling plumbing: per video, the byte offsets a
    real demuxer would seek to — native array expression, bounded
    output (``max_frames``)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.slice(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.length("content").cast("int") - 1, F.lit(0)),
                    F.lit(every_n_bytes),
                ),
                1,
                max_frames,
            ).alias("frame_offsets"),
        )
        .orderBy("media_id")
    )


def media_stats(decoded: DataFrame) -> DataFrame:
    """Metadata-only aggregate (never reads payload bytes when the
    store splits metadata/payload columns)."""
    return (
        decoded.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("checksum").alias("distinct_payloads"),
        )
        .orderBy("kind")
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("features", ArrayType(IntegerType())),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("out_n_bytes", LongType()),
        StructField("out_checksum", StringType()),
    ]
)


def extract_media_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature-extraction plumbing: a fixed-size vector per payload —
    here a 16-bin byte histogram (high nibble), where a real pipeline
    would emit CLIP/mel-spectrogram features from the decoded media.

    Same contract as the decode step: narrow Arrow-batched
    ``mapInPandas``, payload never shuffles, output is a bounded
    ``array<int>`` column ready for the similarity operators
    (``knn_brute_force`` et al. work on any array column).
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def hist(b) -> list[int]:
                counts = [0] * n_bins
                for byte in bytes(b):
                    counts[(byte >> 4) % n_bins] += 1
                return counts

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["content"].map(hist),
                }
            )

    return media.mapInPandas(feats, FEATURES_SCHEMA)


def resize_media(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Resize plumbing: nearest-neighbor byte sampling down to
    ``out_w * out_h`` payload bytes (a real pipeline decodes, resizes
    with Pillow, re-encodes — same narrow batch shape, same schema
    discipline: new payload + new dims).

    Emits the resized payload's md5 rather than the blob so the step
    is cross-engine oracle-checkable; sampling index for output i is
    ``i * n_bytes // (out_w * out_h)`` — pure integer math, identical
    everywhere. Empty payloads resize to the empty payload.
    """
    n_out = out_w * out_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def sample(b) -> str:
                raw = bytes(b)
                if not raw:
                    return hashlib.md5(b"").hexdigest()
                out = bytes(raw[i * len(raw) // n_out] for i in range(n_out))
                return hashlib.md5(out).hexdigest()

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": out_w,
                    "out_height": out_h,
                    "out_n_bytes": pdf["content"].map(
                        lambda b: n_out if len(bytes(b)) else 0
                    ).astype("int64"),
                    "out_checksum": pdf["content"].map(sample),
                }
            )

    return media.mapInPandas(resize, RESIZED_SCHEMA)


def media_content_dedup(media: DataFrame) -> DataFrame:
    """Exact content-level dedup over opaque media payloads: group by
    payload checksum, keep group stats — the first pass of any image/
    audio dedup pipeline (byte-identical copies are the bulk of web
    media duplication; perceptual hashing only runs on the survivors).

    Only (md5, media_id) pairs shuffle — the binary payload itself is
    hashed at the scan and never crosses the wire, the property that
    makes this viable over petabytes of blobs."""
    return (
        media.select("media_id", F.md5("content").alias("checksum"))
        .groupBy("checksum")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("canonical_media_id"),
        )
        .orderBy("checksum")
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("b0", IntegerType()),
        StructField("b1", IntegerType()),
        StructField("b2", IntegerType()),
        StructField("b3", IntegerType()),
    ]
)


def perceptual_hashes(media: DataFrame) -> DataFrame:
    """M-7: aHash-style perceptual fingerprint over the payload — 64
    evenly-sampled bytes thresholded against their mean, packed into
    four 16-bit bands (b0..b3). Byte-identical copies collide on all
    four bands; NEAR-identical payloads (re-encodes, crops, small
    edits) land within a few flipped bits, which banding turns into
    bucket collisions for LSH pairing (same construction as the text
    SimHash tiers, ``dedup.py``).

    Pure integer math — sample index ``i * n // 64``, threshold
    ``64 * byte > sum(bytes)`` (no division), band packing by shifts —
    so the DuckDB oracle reproduces it bit-for-bit on the
    text-derived media fixture. A real image pipeline inserts a
    decode+grayscale+resize in front (``decode_media``'s real branch);
    the hash construction and everything downstream is unchanged.

    Scale shape: narrow Arrow ``mapInPandas`` over the scan; payload
    never shuffles — only (media_id, 4 smallint-sized bands) leave
    the stage. Empty payloads yield NULL bands (excluded from dedup).
    """

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def bands(b) -> list:
            raw = bytes(b)
            n = len(raw)
            if n == 0:
                return [None, None, None, None]
            codes = [raw[i * n // 64] for i in range(64)]
            total = sum(codes)
            bits = [1 if 64 * c > total else 0 for c in codes]
            return [
                sum(bits[16 * j + t] << t for t in range(16)) for j in range(4)
            ]

        for pdf in batches:
            out = pdf["content"].map(bands)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "b0": out.map(lambda v: v[0]),
                    "b1": out.map(lambda v: v[1]),
                    "b2": out.map(lambda v: v[2]),
                    "b3": out.map(lambda v: v[3]),
                }
            )

    return media.mapInPandas(phash, PHASH_SCHEMA)


def media_perceptual_dedup(media: DataFrame, max_hamming: int = 8) -> DataFrame:
    """M-7: perceptual near-duplicate pairs — candidate generation by
    any-band equality (pigeonhole: <= 3 bands of 4 can differ only if
    total Hamming >= ... a pair within ``max_hamming`` <= 48 bits can
    still share no band, so this tier trades a little recall for
    never comparing all pairs, exactly like banded MinHash), then an
    exact 64-bit Hamming verify (``bit_count`` of per-band XOR) on
    the candidates only.

    Only (band value, media_id) keys shuffle; candidate volume is
    bucket-bounded. Output is the verified pair list with distances.
    """
    hashes = perceptual_hashes(media).filter(F.col("b0").isNotNull())
    long = hashes.select(
        "media_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "val"),
    )
    cand = (
        long.alias("l")
        .join(
            long.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("media_a"),
            F.col("r.media_id").alias("media_b"),
        )
        .distinct()
    )
    la = hashes.select(
        F.col("media_id").alias("media_a"),
        *[F.col(c).alias(f"{c}_a") for c in ("b0", "b1", "b2", "b3")],
    )
    rb = hashes.select(
        F.col("media_id").alias("media_b"),
        *[F.col(c).alias(f"{c}_b") for c in ("b0", "b1", "b2", "b3")],
    )
    hamming = sum(
        F.bit_count(F.expr(f"int({c}_a ^ {c}_b)"))
        for c in ("b0", "b1", "b2", "b3")
    )
    return (
        cand.join(la, "media_a")
        .join(rb, "media_b")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "hamming")
        .orderBy("media_a", "media_b")
    )


def media_byte_entropy(media: DataFrame) -> DataFrame:
    """M-8: byte-level Shannon entropy of each media payload, in bits
    per byte — the decode-free corruption/compression detector:
    well-compressed or encrypted payloads sit near 8 bits/byte, raw
    bitmaps and templated payloads far lower, and a payload whose
    entropy disagrees with its container kind (a "video" at 2
    bits/byte) is the classic mislabeled/truncated-blob smell. Works
    on the opaque bytes, so it needs none of the env-gated decoder
    arms.

    Exactness: H = (ln n - (sum c_i ln c_i) / n) / ln 2 — each
    c·ln(c) term quantizes to BIGINT micros BEFORE the per-payload
    sum (ln is cross-engine bit-identical; a float sum across byte
    values would be order-dependent), leaving three mirrored IEEE
    ops per payload. Byte extraction is substr(text, i, 1) over an
    integer range — identical on both engines against the pure-ASCII
    fixture payloads (octet == char there; production swaps in a
    binary get_byte with the same plan shape).

    Scale shape: the explode is payload-bytes-granular but
    map-side-combines to (media, byte-value) cells — at most
    |alphabet| rows per payload ever shuffle; the entropy reduction
    is one combinable aggregation. (At 100 TB the per-row histogram
    moves into U-7's mapInArrow kernel — same outputs, zero explode;
    this is the oracle-mirrored form.)

    The byte explode is the engine's most row-multiplying narrow
    stage (|payload| rows per payload), so an under-split scan
    serializes it through one core: spread_small_input first
    (measured 2.0 s -> 0.5 s at sf0.1; no-op on a well-split scan).
    A mapInArrow Counter kernel was measured too and LOST to the
    spread explode (0.58 vs 0.50 s — Python worker round-trip
    exceeds the explode's codegen cost at this alphabet size)."""
    media = spread_small_input(media)
    chars = media.select(
        "media_id",
        "kind",
        F.explode(
            F.expr(
                "transform(sequence(1, length(CAST(content AS STRING))),"
                " i -> substr(CAST(content AS STRING), i, 1))"
            )
        ).alias("ch"),
    )
    cells = chars.groupBy("media_id", "kind", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    tq = F.round(
        F.col("c").cast("double")
        * F.log(F.col("c").cast("double"))
        * F.lit(1e6)
    ).cast("long")
    per_media = cells.groupBy("media_id", "kind").agg(
        F.sum("c").alias("n_bytes"),
        F.sum(tq).alias("sq"),
    )
    n = F.col("n_bytes").cast("double")
    h = (
        F.log(n) - (F.col("sq").cast("double") / F.lit(1e6)) / n
    ) / F.log(F.lit(2.0))
    return per_media.select(
        "media_id",
        "kind",
        "n_bytes",
        F.when(F.col("n_bytes") > 0, F.round(h, 4)).alias(
            "entropy_bits_per_byte"
        ),
    ).orderBy("media_id")
