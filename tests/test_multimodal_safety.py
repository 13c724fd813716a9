"""Tests: multimodal plumbing (fake-container decode path) + formula escape."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    from series_correction_project_updated_spark.operators.multimodal import make_fake_media

    return make_fake_media(spark, n=30).cache()


def test_fake_media_schema_and_determinism(spark, media):
    from series_correction_project_updated_spark.operators.multimodal import make_fake_media

    rows = media.orderBy("media_id").toPandas()
    assert set(rows["kind"].unique()) == {"image", "audio", "video"}
    again = make_fake_media(spark, n=30).orderBy("media_id").toPandas()
    assert (rows["payload"].apply(bytes) == again["payload"].apply(bytes)).all()


def test_extract_media_features(spark, media):
    from series_correction_project_updated_spark.operators.multimodal import extract_media_features

    feats = extract_media_features(media).toPandas()
    assert len(feats) == 30
    assert feats["byte_mean"].between(100, 155).all()  # uniform bytes ≈ 127.5
    assert all(abs(sum(h) - 1.0) < 1e-9 for h in feats["histogram"])


def test_resize_images_batch_shape(spark, media):
    from series_correction_project_updated_spark.operators.multimodal import resize_images

    small = resize_images(media, target=8).toPandas()
    n_images = media.where(F.col("kind") == "image").count()
    assert len(small) == n_images
    assert all(len(bytes(b)) == 64 for b in small["resized"])


def test_sample_video_frames(spark, media):
    from series_correction_project_updated_spark.operators.multimodal import sample_video_frames

    frames = sample_video_frames(media, every_n=2).toPandas()
    assert (frames["frame_idx"] % 2 == 0).all()
    assert frames.groupby("media_id").size().min() >= 1


def test_real_codec_path_gated_on_pil(spark):
    import importlib.util

    from series_correction_project_updated_spark.operators.multimodal import _decode_payload

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("PIL installed: compressed codecs decode via the real path")
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\xff\xd8\xff\xe0 not a fake container")


def test_formula_escape_semantics(spark):
    from series_correction_project_updated_spark.functions.safety import sanitize_for_export

    rows = [
        (0, "=HYPERLINK(evil)"),
        (1, "  +SUM(A1)"),
        (2, "-2+3"),
        (3, "@cmd"),
        (4, "normal text"),
        (5, "'=already escaped"),
    ]
    df = spark.createDataFrame(rows, "id long, cell string")
    out = sanitize_for_export(df, ["cell"]).orderBy("id").toPandas()["cell"].tolist()
    assert out[0] == "'=HYPERLINK(evil)"
    assert out[1] == "'  +SUM(A1)"
    assert out[2] == "'-2+3"
    assert out[3] == "'@cmd"
    assert out[4] == "normal text"
    assert out[5] == "'=already escaped"  # idempotent
