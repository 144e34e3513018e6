"""Image-payload plans (the graft's image axis) over the deterministically
synthesized ``images`` table (input_hint schema; no external data). DuckDB
has no view of this generated table, so these are rows-only checks in the
driver harness; their exactness gates live in tests/test_images.py
(PSNR ≥ 40 dB, thumbnail shape, phash match)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_IMAGES = 200


def _images(spark: SparkSession) -> DataFrame:
    from cinescrapers_spark.images.table import images_df

    return images_df(spark, n=N_IMAGES, seed=42)


def q_images_decode_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Decode-side integrity census: recomputed phash vs stored phash
    (exact for lossless ppm; hamming ≤ 6 tolerated for lossy qimg)."""
    from cinescrapers_spark.images.ops import phash_udf

    df = _images(spark).withColumn(
        "phash2", phash_udf(F.col("bytes"), F.col("fmt"))
    )
    ham = F.bit_count(F.col("phash").bitwiseXOR(F.col("phash2")))
    return df.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.sum(F.when(ham == 0, 1).otherwise(0)).cast("long").alias("exact_phash"),
        F.sum(F.when(ham <= 6, 1).otherwise(0)).cast("long").alias("neardup_phash"),
        F.round(F.avg("w"), 2).alias("avg_w"),
        F.round(F.avg("h"), 2).alias("avg_h"),
    )


def q_images_thumbnails(spark: SparkSession, sf: str) -> DataFrame:
    """Smart-crop thumbnail stage: every row must produce a 64×64 P6 ppm
    (ref tests/thumbnails/test_thumbnailing.py:19 shape invariant)."""
    from cinescrapers_spark.images.ops import thumbnail_udf

    df = _images(spark).withColumn(
        "thumb", thumbnail_udf(F.col("bytes"), F.col("fmt"))
    )
    ok = F.expr("substring(thumb, 1, 2) == X'5036'")  # b"P6" magic
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("n_ppm_thumbs"),
        F.countDistinct("caption").alias("n_captions"),
    )


def q_images_caption_norm(spark: SparkSession, sf: str) -> DataFrame:
    """Caption-equality surface: captions flow through the title normalizer
    (exact-string invariant per input_hint) and group."""
    from cinescrapers_spark.functions.titles import normalize_title_udf

    return (
        _images(spark)
        .select("caption", normalize_title_udf("caption").alias("norm_caption"))
        .groupBy("norm_caption")
        .agg(F.count("*").alias("n"), F.min("caption").alias("sample_caption"))
    )


def q_images_embed_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Image-embedding ANN: embed every image (histogram→projection UDF),
    brute-force cosine top-3 neighbors for the first 3 images."""
    from cinescrapers_spark.images.ops import embed_image_udf
    from cinescrapers_spark.plans.similarity import (
        _as_double,
        cosine,
        partitioned_topk,
    )

    emb = _images(spark).select(
        "image_id", embed_image_udf(F.col("bytes"), F.col("fmt")).alias("emb")
    )
    first3 = emb.orderBy("image_id").limit(3).select(
        F.col("image_id").alias("q_id"), _as_double(F.col("emb")).alias("q_emb")
    )
    cands = emb.select("image_id", _as_double(F.col("emb")).alias("c_emb"))
    scored = cands.join(F.broadcast(first3), F.col("image_id") != F.col("q_id")).select(
        "q_id", "image_id", cosine(F.col("c_emb"), F.col("q_emb")).alias("cos_raw")
    )
    return partitioned_topk(
        scored, ["q_id"], [F.desc("cos_raw"), F.asc("image_id")], 3
    ).select("q_id", "image_id", F.round("cos_raw", 4).alias("cosine"))


def q_audio_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Audio-payload decode census: waveform features for decodable rows,
    per-row decode_error for the stub-gated formats (multimodal plumbing,
    round brief; exactness gates in tests/test_images.py)."""
    from pyspark.sql import functions as F

    from cinescrapers_spark.images.multimodal import audio_df, audio_stats

    stats = audio_stats(audio_df(spark, n=100, seed=42))
    return stats.groupBy((F.col("decode_error").isNull()).alias("decoded")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("rms"), 4).alias("avg_rms"),
        F.round(F.avg("duration_sec"), 4).alias("avg_duration"),
    )


def q_video_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame-sampling stage: every 4th frame per clip with mean luma
    (one clip row → many frame rows); stubbed codecs surface as error rows."""
    from pyspark.sql import functions as F

    from cinescrapers_spark.images.multimodal import sample_frames, video_df

    frames = sample_frames(video_df(spark, n=40, seed=42), every_k=4)
    return frames.select(
        "video_id", "frame_idx", F.round("mean_lum", 4).alias("mean_lum"),
        "decode_error",
    )


QUERIES = {
    name: (fn, None)  # rows-only: the media tables are engine-generated
    for name, fn in [
        ("q_images_decode_stats", q_images_decode_stats),
        ("q_images_thumbnails", q_images_thumbnails),
        ("q_images_caption_norm", q_images_caption_norm),
        ("q_images_embed_ann", q_images_embed_ann),
        ("q_audio_stats", q_audio_stats),
        ("q_video_frame_sample", q_video_frame_sample),
    ]
}
