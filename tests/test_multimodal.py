"""Multimodal plumbing: schema, Arrow batch path, stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_logs_spark.operators.multimodal import (
    decode_media,
    frame_sample_offsets,
    media_stats,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=48).cache()


def test_decode_preserves_rows_and_schema(media):
    decoded = decode_media(media)
    assert decoded.count() == 48
    assert [f.name for f in decoded.schema.fields] == [
        "media_id", "kind", "n_bytes", "width", "height", "checksum",
    ]
    # deterministic: same input -> same checksums on re-run
    a = sorted(r.checksum for r in decoded.collect())
    b = sorted(r.checksum for r in decode_media(media).collect())
    assert a == b


def test_decode_is_partition_invariant(media):
    one = sorted(map(str, decode_media(media.repartition(1)).collect()))
    many = sorted(map(str, decode_media(media.repartition(6)).collect()))
    assert one == many


def test_real_decoder_shares_schema_with_fake(media):
    # the two decoder branches must stay drop-in interchangeable
    assert (
        decode_media(media, decoder="real").schema
        == decode_media(media, decoder="fake").schema
    )


def test_frame_offsets_bounded(media):
    frames = frame_sample_offsets(media, every_n_bytes=16, max_frames=4)
    rows = frames.collect()
    assert all(len(r.frame_offsets) <= 4 for r in rows)
    assert all(r.frame_offsets[0] == 0 for r in rows)


def test_media_stats(media):
    stats = media_stats(decode_media(media)).collect()
    kinds = {r.kind: r for r in stats}
    assert set(kinds) == {"image", "audio", "video"}
    assert sum(r.n for r in stats) == 48


def test_feature_vectors_fixed_size_partition_invariant(spark, sf_dir):
    from bigdata_logs_spark.operators.multimodal import (
        extract_media_features,
        media_from_documents,
    )
    from bigdata_logs_spark.sources import load_table
    from pyspark.sql import functions as F

    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = extract_media_features(media)
    assert feats.filter(F.size("features") != 16).count() == 0
    # histogram sums to payload length regardless of Arrow batch split
    joined = feats.join(media.select("media_id", F.length("content").alias("n")), "media_id")
    assert joined.filter(
        F.expr("aggregate(features, 0, (a, x) -> a + x)") != F.col("n")
    ).count() == 0
    one = sorted(map(str, extract_media_features(media.repartition(1)).collect()))
    many = sorted(map(str, extract_media_features(media.repartition(5)).collect()))
    assert one == many


def test_resize_output_contract(spark, sf_dir):
    from bigdata_logs_spark.operators.multimodal import (
        media_from_documents,
        resize_media,
    )
    from bigdata_logs_spark.sources import load_table
    from pyspark.sql import functions as F

    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    out = resize_media(media)
    assert out.count() == media.count()
    # non-empty payloads resize to exactly 8x8=64 bytes
    nonempty = out.filter(F.col("out_n_bytes") > 0)
    assert nonempty.filter(F.col("out_n_bytes") != 64).count() == 0


def _wav_bytes(framerate: int = 8000, channels: int = 2, n_frames: int = 64) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(b"\x00\x01" * channels * n_frames)
    return buf.getvalue()


def test_real_decoder_decodes_wav_and_nulls_garbage(spark):
    """decoder="real": stdlib wave handles audio; payloads no codec
    can read keep their row with NULL dims (a dirty crawl must not
    fail the stage). n_bytes/checksum are codec-independent."""
    import hashlib

    from bigdata_logs_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    wav = _wav_bytes(framerate=8000, channels=2)
    rows = [
        (0, "audio", bytearray(wav), None, None),
        (1, "audio", bytearray(b"not a wav at all"), None, None),
        (2, "video", bytearray(b"\x00" * 32), None, None),
    ]
    out = {
        r["media_id"]: r
        for r in decode_media(
            spark.createDataFrame(rows, MEDIA_SCHEMA), decoder="real"
        ).collect()
    }
    assert (out[0]["width"], out[0]["height"]) == (8000, 2)
    assert out[0]["n_bytes"] == len(wav)
    assert out[0]["checksum"] == hashlib.md5(wav).hexdigest()
    assert (out[1]["width"], out[1]["height"]) == (None, None)
    assert (out[2]["width"], out[2]["height"]) == (None, None)
    assert out[2]["n_bytes"] == 32


def test_real_decoder_decodes_images_with_pillow(spark):
    """Image branch of decoder="real" — runs wherever Pillow exists
    (skipped in codec-less containers; the audio test above keeps the
    real path exercised everywhere)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    from bigdata_logs_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    buf = io.BytesIO()
    Image.new("RGB", (7, 5)).save(buf, format="PNG")
    rows = [(0, "image", bytearray(buf.getvalue()), None, None)]
    (r,) = decode_media(
        spark.createDataFrame(rows, MEDIA_SCHEMA), decoder="real"
    ).collect()
    assert (r["width"], r["height"]) == (7, 5)


def _mp4_bytes(width: int, height: int, version: int = 0) -> bytes:
    """Minimal valid ISO BMFF: ftyp + moov(trak(tkhd)). tkhd carries
    presentation width/height as 16.16 fixed-point in its last 8
    bytes — the only fields the demuxer reads."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    if version == 0:
        head = b"\x00" + b"\x00\x00\x07" + b"\x00" * 20  # v0: 4B times/ids
    else:
        head = b"\x01" + b"\x00\x00\x07" + b"\x00" * 32  # v1: 8B times
    tkhd_payload = (
        head + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
        + struct.pack(">II", width << 16, height << 16)
    )
    trak = box(b"trak", box(b"tkhd", tkhd_payload))
    moov = box(b"moov", trak)
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov


def test_real_decoder_demuxes_mp4_video_dims(spark):
    """Video branch of decoder="real": pure-python MP4 box walk finds
    tkhd and reports presentation dims for both tkhd versions; a
    truncated/corrupt container degrades to NULL dims, not an error."""
    from bigdata_logs_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    good_v0 = _mp4_bytes(640, 360, version=0)
    good_v1 = _mp4_bytes(1920, 1080, version=1)
    rows = [
        (0, "video", bytearray(good_v0), None, None),
        (1, "video", bytearray(good_v1), None, None),
        # valid ftyp magic, then a lying box length -> corrupt
        (2, "video", bytearray(good_v0[:20]), None, None),
        (3, "audio", bytearray(good_v0), None, None),  # wrong kind -> NULL
    ]
    out = {
        r["media_id"]: r
        for r in decode_media(
            spark.createDataFrame(rows, MEDIA_SCHEMA), decoder="real"
        ).collect()
    }
    assert (out[0]["width"], out[0]["height"]) == (640, 360)
    assert (out[1]["width"], out[1]["height"]) == (1920, 1080)
    assert (out[2]["width"], out[2]["height"]) == (None, None)
    assert (out[3]["width"], out[3]["height"]) == (None, None)


class TestPerceptualDedup:
    def test_phash_matches_python_reference_and_flags_near_dup(self, spark):
        from bigdata_logs_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            media_perceptual_dedup,
            perceptual_hashes,
        )

        base = bytes(range(200)) * 3
        tweaked = bytearray(base)
        tweaked[5] ^= 0xFF  # one-byte edit -> few flipped hash bits
        unrelated = bytes(reversed(base))
        rows = [
            (0, "image", bytearray(base), None, None),
            (1, "image", tweaked, None, None),
            (2, "image", bytearray(unrelated), None, None),
            (3, "image", bytearray(b""), None, None),
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        got = {r.media_id: r for r in perceptual_hashes(media).collect()}

        def ref_bands(raw: bytes):
            n = len(raw)
            if n == 0:
                return [None] * 4
            codes = [raw[i * n // 64] for i in range(64)]
            total = sum(codes)
            bits = [1 if 64 * c > total else 0 for c in codes]
            return [sum(bits[16 * j + t] << t for t in range(16)) for j in range(4)]

        for mid, _, payload, _, _ in rows:
            assert [got[mid][f"b{j}"] for j in range(4)] == ref_bands(bytes(payload))

        pairs = {
            (r.media_a, r.media_b): r.hamming
            for r in media_perceptual_dedup(media).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] <= 8  # near-dup caught
        assert (0, 2) not in pairs  # unrelated payload not paired
        assert all(3 not in p for p in pairs)  # empty payload excluded
