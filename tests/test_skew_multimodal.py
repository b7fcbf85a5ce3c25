"""Unit tests: skew-mitigation helpers and multimodal feature extraction."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_agg_matches_plain(spark):
    from rabbit_data_pipeline_spark.functions.skew import salted_agg

    # 90% of rows share one hot key
    df = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    got = {
        (r.k, r.total, r.n, r.mx)
        for r in salted_agg(df, ["k"], {"total": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")}).collect()
    }
    want = {
        (r.k, r.total, r.n, r.mx)
        for r in df.groupBy("k").agg(F.sum("v").alias("total"), F.count("v").alias("n"), F.max("v").alias("mx")).collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    from rabbit_data_pipeline_spark.functions.skew import salted_join

    large = spark.range(5000).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "name"])
    got = sorted((r.k, r.v, r.name) for r in salted_join(large, small, on=["k"]).collect())
    want = sorted((r.k, r.v, r.name) for r in large.join(small, on=["k"]).collect())
    assert got == want

    got_l = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(large, small.filter(F.col("k") < 2), on=["k"], how="left").collect()
    )
    want_l = sorted(
        (r.k, r.v, r.name) for r in large.join(small.filter(F.col("k") < 2), on=["k"], how="left").collect()
    )
    assert got_l == want_l


def test_extract_features_histogram(spark):
    from rabbit_data_pipeline_spark.operators.multimodal import encode_image, extract_features

    rows = [("m1", "image", encode_image(8, 8, seed=0)), ("m2", "image", encode_image(4, 4, seed=7))]
    df = spark.createDataFrame(rows, ["media_id", "media_type", "payload"])
    out = {r.media_id: r.features for r in extract_features(df, n_bins=16).collect()}
    assert set(out) == {"m1", "m2"}
    for feats in out.values():
        assert len(feats) == 16
        assert abs(sum(feats) - 1.0) < 1e-6  # normalized histogram
    # deterministic across runs
    out2 = {r.media_id: r.features for r in extract_features(df, n_bins=16).collect()}
    assert out == out2


# ------------------------------------------------ model-inference plumbing


def test_score_documents_deterministic_across_partitionings(spark):
    from rabbit_data_pipeline_spark.operators.model import score_documents

    df = spark.createDataFrame([(i, f"doc number {i}") for i in range(40)], ["doc_id", "text"])
    a = {r["doc_id"]: r["model_score"] for r in score_documents(df).collect()}
    b = {r["doc_id"]: r["model_score"] for r in score_documents(df.repartition(7)).collect()}
    assert a == b and len(a) == 40
    assert all(0.0 <= v < 1.0 for v in a.values())


def test_embed_documents_feeds_ann_end_to_end(spark):
    """text -> embedding -> exact-dup detection: identical texts embed
    identically (cosine 1 via the ANN operator), distinct texts do not."""
    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.operators.model import embed_documents
    from rabbit_data_pipeline_spark.operators.similarity import ann_bruteforce

    rows = [(i, f"unique text {i}") for i in range(20)] + [(100, "unique text 3")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    emb = embed_documents(df, dim=16).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    top1 = ann_bruteforce(emb, emb.filter(F.col("vec_id") == 100), k=1).collect()
    assert len(top1) == 1 and top1[0]["n_id"] == 3
    assert abs(top1[0]["cos_sim"] - 1.0) < 1e-12


def test_load_model_gates_clearly(spark):
    import pytest as _pytest

    from rabbit_data_pipeline_spark.operators.model import load_model

    with _pytest.raises(NotImplementedError, match="model runtime"):
        load_model("fasttext-quality-v1")


def test_audio_decode_and_energy_features(spark):
    from rabbit_data_pipeline_spark.operators.multimodal import (
        audio_energy_features,
        decode_metadata,
        encode_audio,
    )

    rows = [(str(i), "audio", encode_audio(16000, 1024, seed=i)) for i in range(6)]
    rows += [("100", "audio", encode_audio(16000, 1024, seed=0))]  # exact twin of 0
    df = spark.createDataFrame(rows, ["media_id", "media_type", "payload"]).repartition(3)
    meta = {r["media_id"]: r for r in decode_metadata(df).collect()}
    assert meta["0"]["format"] == "AUD1" and meta["0"]["width"] == 16000
    assert meta["0"]["n_frames"] == 1024
    feats = {r["media_id"]: r["features"] for r in audio_energy_features(df).collect()}
    assert len(feats["0"]) == 8 and feats["0"] == feats["100"]
    assert feats["0"] != feats["1"]  # different seed -> different signal


def test_video_frame_features_fan_out_and_determinism(spark):
    from rabbit_data_pipeline_spark.operators.multimodal import encode_video, video_frame_features

    rows = [(str(i), "video", encode_video(4, 256, seed=i)) for i in range(3)]
    df = spark.createDataFrame(rows, ["media_id", "media_type", "payload"]).repartition(2)
    out = video_frame_features(df).collect()
    assert len(out) == 12  # 3 videos x 4 frames
    by_key = {(r["media_id"], r["frame_id"]): r["features"] for r in out}
    assert len(by_key) == 12 and all(len(v) == 16 for v in by_key.values())
    # deterministic across partitionings
    out2 = {(r["media_id"], r["frame_id"]): r["features"]
            for r in video_frame_features(df.repartition(5)).collect()}
    assert by_key == out2


def test_dedup_exact_binary_media(spark):
    from rabbit_data_pipeline_spark.operators.dedup import dedup_exact_binary
    from rabbit_data_pipeline_spark.operators.multimodal import encode_image

    rows = [(str(i), "image", encode_image(8, 8, seed=i % 3)) for i in range(9)]
    df = spark.createDataFrame(rows, ["media_id", "media_type", "payload"]).repartition(4)
    kept = sorted(r["media_id"] for r in dedup_exact_binary(df).collect())
    assert kept == ["0", "1", "2"]  # one survivor per distinct payload, lowest id
