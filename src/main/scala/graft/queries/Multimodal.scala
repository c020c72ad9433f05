package graft.queries

import graft.QueryDef
import graft.multimodal.Media
import org.apache.spark.sql.functions._

/** Multimodal pipeline queries (north star). Non-oracle: the payloads
  * are engine-synthesized binaries (no DuckDB counterpart) — verified in
  * MediaSpec (schema, batch shape, determinism, feature handoff).
  */
object Multimodal {

  val defs: Seq[QueryDef] = Seq(

    // decode + feature extraction over the binary corpus
    QueryDef("q_media_features",
      (s, d) => Media.extractImageFeatures(Media.corpus(s, d)).toDF()
        .select(col("media_id"), col("width"), col("height"),
          round(col("brightness"), 4).as("brightness"))
        .orderBy(col("media_id")),
      None),

    // audio decode over the REAL WAV payloads: PCM chunk walk, sample
    // statistics (RMS in [0,1]), metadata re-parsed from the fmt chunk
    QueryDef("q_media_audio",
      (s, d) => Media.extractAudioFeatures(Media.corpus(s, d)).toDF()
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          col("duration_ms"), round(col("rms"), 4).as("rms"))
        .orderBy(col("media_id")),
      None),

    // video frame sampling: 4 frames per video record
    QueryDef("q_media_frames",
      (s, d) => Media.sampleFrames(Media.corpus(s, d), 4).toDF()
        .select(col("media_id"), col("frame_no"), col("offsetMs"),
          length(col("content")).as("frame_bytes"))
        .orderBy(col("media_id"), col("frame_no")),
      None),

    // exact media dedup on content digest (blob never shuffles)
    QueryDef("q_media_dedup",
      (s, d) => Media.dedupByContent(Media.corpus(s, d))
        .select(col("keep_id"), col("n_dups"))
        .orderBy(col("keep_id")),
      None),

    // ANN over media-derived embeddings: binary → features → cosine
    // top-k through the same similarity operator as q_sim_topk. Probes
    // are filtered BEFORE feature extraction: mapPartitions is a
    // pushdown boundary, so filtering afterwards would re-extract the
    // whole corpus for the 3-row probe side.
    QueryDef("q_media_sim",
      (s, d) => {
        def feats(m: org.apache.spark.sql.Dataset[graft.multimodal.Media.MediaRecord]) =
          Media.extractImageFeatures(m).toDF()
            .select(col("media_id").as("vec_id"), col("embedding"))
        Similarity.bruteForceTopKWith(
          feats(Media.corpus(s, d)),
          feats(Media.corpus(s, d, onlyIds = Some(Set(0L, 1L, 2L)))),
          3)
      },
      None),

    // Perceptual (aHash) fingerprint of every visual payload — image
    // AND video keyframe; the near-dup complement to q_media_dedup's
    // byte-exact sha2 (a re-brightened or re-encoded copy collides
    // here, never there). The fixture corpus is seeded random noise,
    // so its hashes are honest-distinct; MediaSpec plants brightness-
    // shifted and pixel-perturbed copies and proves the banded
    // candidate join (Media.phashNearDupPairs) finds exactly the
    // radius-3 pairs the brute-force hamming scan finds.
    // Shot-cut detection over the real AVI frames: per-video frame
    // count, cuts (mean |pixel delta| above threshold between
    // consecutive frames), and the largest delta. MediaSpec plants a
    // hard cut into a crafted clip and asserts exactly one cut with
    // the exact expected delta; fixture clips are gradual-motion
    // gradients, so their honest answer is zero cuts with a small
    // nonzero max_diff.
    QueryDef("q_media_scenes",
      (s, d) => Media.sceneStats(Media.corpus(s, d))
        .orderBy(col("media_id")),
      None),

    // Energy-threshold voice-activity detection over the real PCM:
    // per-clip 20 ms windows (320 samples at 16 kHz), active when
    // window RMS > 0.05 — the silence/speech segmentation audio
    // curation runs before transcription. MediaSpec crafts a
    // half-silence/half-tone clip and asserts the exact window split.
    QueryDef("q_media_vad",
      (s, d) => Media.vadStats(Media.corpus(s, d))
        .orderBy(col("media_id")),
      None),

    QueryDef("q_media_phash",
      (s, d) => Media.perceptualHashes(Media.corpus(s, d))
        .select(col("media_id"), col("width"), col("height"),
          format_string("%016x", col("phash")).as("phash_hex"))
        .orderBy(col("media_id")),
      None)
  )
}
