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


def test_stubs_raise_without_fake(spark, image_df):
    df, _ = image_df
    with pytest.raises(NotImplementedError):
        images.audio_frame_sample(df)
    with pytest.raises(NotImplementedError):
        images.video_frame_sample(df)


def test_stub_fake_plumbing_runs(spark, image_df):
    df, web = image_df
    out = images.video_frame_sample(df, fake=True)
    rows = out.collect()
    assert len(rows) == 3 * len(web.images)
    assert {r["frame_idx"] for r in rows} == {0, 1, 2}


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
