"""Multimodal image operators: real numpy paths + stub policy."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from grawler import codecs, synthgen
from grawler.operators import images


@pytest.fixture(scope="module")
def image_df(spark):
    web = synthgen.generate(seed=42, n_pages=60, shape="mixed")
    return spark.createDataFrame(
        web.images[["image_id", "bytes", "w", "h", "fmt"]]), web


def test_resize_shapes_and_determinism(spark, image_df):
    df, web = image_df
    out = {r["image_id"]: r for r in images.resize(df, 16, 16).collect()}
    assert len(out) == len(web.images)
    for iid, r in out.items():
        assert (r["w"], r["h"], r["fmt"]) == (16, 16, "rgb8")
        px = codecs.decode_rgb8(bytes(r["bytes"]))
        assert px.shape == (16, 16, 3)
        # spot-check against the numpy reference resize
        truth = images._block_mean_resize(
            codecs.decode(bytes(
                web.images.set_index("image_id").loc[iid, "bytes"]),
                web.images.set_index("image_id").loc[iid, "fmt"]), 16, 16)
        assert np.array_equal(px, truth)
        break


def test_features_dim_and_range(spark, image_df):
    df, web = image_df
    rows = images.features(df).collect()
    assert len(rows) == len(web.images)
    for r in rows:
        v = np.array(r["features"])
        assert v.shape == (images.FEATURE_DIM,)
        assert (v >= 0).all() and (v <= 1.0 + 1e-9).all()
        assert abs(v[6:].sum() - 1.0) < 1e-6  # histogram normalized


@pytest.fixture(scope="module")
def media_df(spark):
    """Opaque-binary media fixture: payload bytes + typed metadata."""
    rows = [(i, f"media payload {i}".encode() * (i + 1),
             {"duration_ms": (i % 3 + 1) * 1000, "sample_rate": 8000,
              "w": 32, "h": 16})
            for i in range(6)]
    return spark.createDataFrame(
        rows, "media_id long, payload binary, "
              "meta struct<duration_ms int, sample_rate int, w int, h int>")


def test_media_ops_raise_without_decoder(spark, media_df):
    with pytest.raises(NotImplementedError):
        images.audio_frame_sample(media_df)
    with pytest.raises(NotImplementedError):
        images.video_frame_sample(media_df)


def test_audio_frame_sample_matches_numpy(spark, media_df):
    """mapInPandas plumbing vs a direct numpy replication of the same
    decode seam: row counts, timestamps, rms, and the sign-bit sig."""
    rows = {(r["media_id"], r["frame_idx"]): r
            for r in images.audio_frame_sample(
                media_df, every_ms=1000,
                decoder=images.fake_pcm_decode).collect()}
    total = 0
    for i in range(6):
        payload = f"media payload {i}".encode() * (i + 1)
        n_frames = (i % 3 + 1)
        total += n_frames
        for k in range(n_frames):
            pcm = images.fake_pcm_decode(payload, 8000, k * 1000, 8000)
            r = rows[(i, k)]
            assert r["t_ms"] == k * 1000
            assert r["rms"] == round(float(np.sqrt((pcm * pcm).mean())), 6)
            sig = 0
            for j, b in enumerate((pcm[:64] > 0).astype(int)):
                sig |= int(b) << j
            sig = sig - (1 << 64) if sig >= (1 << 63) else sig
            assert r["frame_sig"] == sig
    assert len(rows) == total


def test_video_frame_sample_real_phash_on_fake_frames(spark, media_df):
    rows = images.video_frame_sample(
        media_df, sample_fps=2.0, decoder=images.fake_frame_decode).collect()
    assert rows
    by_key = {(r["media_id"], r["frame_idx"]): r for r in rows}
    i, k = 3, 1
    payload = f"media payload {i}".encode() * (i + 1)
    px = images.fake_frame_decode(payload, 32, 16, int(k * 500))
    r = by_key[(i, k)]
    assert r["phash"] == codecs.phash64(px)
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    assert r["mean_luma"] == round(float(luma.mean()) / 255.0, 6)
    # sampled frames feed the existing hamming near-dup operator unchanged
    from grawler.operators.dedup import hamming_band_pairs

    sig = spark.createDataFrame(
        [(r["media_id"] * 100 + r["frame_idx"], r["phash"]) for r in rows],
        "fid long, phash long")
    hamming_band_pairs(sig, "fid", "phash", max_hamming=3).collect()


def test_phash_neardup_finds_variants(spark):
    """Each noise image pairs with exactly its perturbed variant; unrelated
    noise images (~32 hamming apart) never pair. Pairs + distances match a
    python banding replication (same pigeonhole guarantee)."""
    from grawler import codecs, synthgen
    from grawler.engine import decode_phash_udf

    rows = synthgen.neardup_image_corpus(n=24)
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    ph = df.withColumn(
        "ph", decode_phash_udf(F.col("bytes"), F.lit("rgb8"))
    ).select("image_id", F.col("ph.phash").alias("phash"))
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in images.phash_neardup(ph, max_hamming=6).collect()}

    hashes = {iid: codecs.phash64(codecs.decode(data, "rgb8"))
              for iid, data in rows}
    M = (1 << 64) - 1
    buckets = {}
    for iid, h in hashes.items():
        for bi in range(8):
            buckets.setdefault(
                (bi, ((h & M) >> (8 * bi)) & 0xFF, ), []).append(iid)
    want = {}
    for ids in buckets.values():
        for x in ids:
            for y in ids:
                if x < y:
                    ham = bin((hashes[x] ^ hashes[y]) & M).count("1")
                    if ham <= 6:
                        want[(x, y)] = ham
    assert got == want and len(got) > 0
    for (a, b) in got:
        assert b == a + "-v"  # only true variants pair up
