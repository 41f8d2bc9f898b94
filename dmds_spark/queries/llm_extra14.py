"""Round-7 queries, batch three: multimodal near-duplicate detection
via perceptual hashing (the image-dedup counterpart of MinHash) and
voice-activity segmentation over the audio frame features — both
rows-only (binary payloads have no SQL oracle), both deterministic
integer outputs, both built so the Python stage is a thin Arrow scan
and everything after it is JVM DataFrame algebra.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.queries import register


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@register("multimodal_phash_neardup", None)  # binary plumbing: rows-only
def multimodal_phash_neardup(spark, sf_dir):
    """Perceptual-hash near-dup detection over the media table,
    reported as the hamming-distance histogram of banded candidate
    pairs: documents -> fake media payloads -> 64-bit aHash per clip
    (operators/multimodal.perceptual_hashes, one Arrow scan) -> 4x16
    banded candidate join -> exact bit_count(xor) distance -> count
    per distance. The histogram is the TUNING view (where is the
    near-dup valley? what radius keeps precision?); an actual dedup
    keeps pairs under its radius and feeds them to the shared
    connected-components keep-first, exactly like dedup_minhash_pairs.

    Shape at scale: hashes are 8-byte ints, the band join shuffles
    (band_no, 16-bit key, id, hash) only, pigeonhole gives total
    recall below hamming 4 (same proof as simhash_pairs), and the
    histogram is a tiny aggregate over candidate pairs — never
    all-pairs. Deterministic: integer hamming counts on deterministic
    payloads."""
    from dmds_spark.operators.multimodal import (
        media_table_from_documents,
        perceptual_hashes,
        phash_candidate_pairs,
    )

    media = media_table_from_documents(_docs(spark, sf_dir))
    pairs = phash_candidate_pairs(perceptual_hashes(media))
    return (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("hamming")
    )


@register("multimodal_audio_vad", None)  # binary plumbing: rows-only
def multimodal_audio_vad(spark, sf_dir):
    """Voice-activity segmentation: the PCM frame energies
    (operators/multimodal.audio_frame_features — the one Arrow stage)
    feed a pure-DataFrame gaps-and-islands pass: a frame is ACTIVE
    when its energy exceeds its clip's mean (energy * n_frames >
    total_energy, exact integer cross-multiplication — no adaptive
    float threshold to drift), consecutive active frames merge into
    segments via the frame_no - row_number() island key, and each
    clip reports its segment count, active frames, and longest run —
    the silence-trim/segmentation summary a speech pipeline computes
    before cutting clips.

    Shape at scale: one mapInPandas scan for features, one window +
    one aggregate keyed on media_id (high cardinality) for the
    islands; all arithmetic integer-exact, so the output is identical
    under any partitioning."""
    from dmds_spark.operators.multimodal import (
        audio_frame_features,
        media_table_from_documents,
    )

    media = media_table_from_documents(_docs(spark, sf_dir))
    frames = audio_frame_features(media)
    totals = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames_total"),
        F.sum("energy").alias("total_energy"),
    )
    f = frames.join(totals, "media_id").withColumn(
        "active",
        (F.col("energy") * F.col("n_frames_total") > F.col("total_energy"))
        .cast("int"),
    )
    act = f.filter(F.col("active") == 1)
    w = W.partitionBy("media_id").orderBy("frame_no")
    islands = act.withColumn(
        "grp", F.col("frame_no") - F.row_number().over(w)
    )
    segs = islands.groupBy("media_id", "grp").agg(
        F.count(F.lit(1)).alias("seg_len"),
        F.sum("energy").alias("seg_energy"),
    )
    return (
        segs.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("seg_len").cast("bigint").alias("active_frames"),
            F.max("seg_len").cast("bigint").alias("longest_segment"),
            F.max("seg_energy").cast("bigint").alias("peak_segment_energy"),
        )
        .orderBy("media_id")
    )
