package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2H): media payloads modeled as
  * opaque `binary` columns with typed metadata. The test corpus has no
  * real media, so the payload is the UTF-8 text bytes — the Spark-side
  * plumbing (schema, batched mapPartitions, metadata extraction) is real
  * and is exactly what a jpeg/wav payload would flow through.
  */
object Multimodal {

  /** mm_binary_meta: typed metadata off an opaque binary column — byte
    * length and leading "magic" byte (how real pipelines route jpeg/png/
    * wav payloads to the right decoder), all codegen'd scalars. */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        octet_length(col("payload")).as("nbytes"),
        ascii(col("payload").cast("string").substr(1, 1)).as("magic"))
      .withColumn("tag",
        when(col("magic").between(97, 122), "text").otherwise("other"))

  /** Typed output row of the decode stage — the Encoder keeps the
    * object-boundary serialization in Tungsten format (DeserializeToObject/
    * SerializeFromObject around the mapPartitions, no Row boxing, and the
    * surrounding plan stays columnar/codegen'd). */
  case class DecodedMeta(doc_id: Long, width: Int, height: Int,
      n_frames: Int, feat_mean: Double, resized_w: Int, resized_h: Int,
      sampled_frames: String)

  /** mm_decode_stub: the decode/feature-extract pipeline over the binary
    * column. Runs as batched `Dataset.mapPartitions` (the shape a
    * vectorized decode UDF needs: amortize model/codec init per batch, not
    * per row) with case-class Encoders on both sides — the typed path, not
    * an RDD drop-out, so the exchange in/out of JVM objects is a single
    * DeserializeToObject/SerializeFromObject pair in the plan.
    *
    * STUB: the decode step is a deterministic fake — this container has no
    * image/audio codecs. `fakeDecode` stands in for e.g. JPEG decode +
    * embedding; everything around it (schema, batching, partition flow)
    * is production-shaped. */
  def decodeStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    val batchSize = 64
    src.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // codec/model init would happen here, once per batch
        batch.iterator.map { case (id, bytes) =>
          val (w, h, f, m) = fakeDecode(bytes)
          val (rw, rh) = resizeDims(w, h, 256)
          // canonical comma-joined string, not array<int>: downstream
          // row-level comparers (and many sinks) can't hash array cells
          DecodedMeta(id, w, h, f, m, rw, rh,
            sampleFrames(f, 4).mkString(","))
        }
      }
    }.toDF()
  }

  /** mm_frame_sample: deterministic frame sampling over an opaque payload
    * — the payload is sliced into fixed 256-char frames and every 4th
    * frame is kept, fingerprinted by md5. This is the video-pipeline
    * access pattern (seek to frame boundaries, decode a strided subset)
    * with the decode replaced by a hash the oracle can replay; the
    * explode fan-out is bounded by payload size / frame size per row and
    * everything is row-local (zero shuffle). */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val nFrames = greatest(lit(1L),
      ceil(length(col("text")) / lit(256.0)).cast("long"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), nFrames - 1)).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(4)) === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(expr("substring(text, CAST(frame_idx*256+1 AS INT), 256)")
          .cast("binary")).as("frame_md5"))
  }

  /** mm_payload_dedup: MULTIMODAL DEDUP over opaque binary payloads —
    * the two passes a media pipeline runs before any expensive decode:
    *
    *   1. EXACT: content-hash the raw bytes (md5 of the payload — what
    *      a CDN/crawler stores as the object key) and keep the minimum
    *      doc_id per hash — one window over the hash shuffle, the
    *      dd_exact shape on bytes instead of normalized text;
    *   2. FRAME CONTAINMENT: the strided frame fingerprints of
    *      [[frameSample]] double as a perceptual-hash stand-in (a real
    *      pipeline uses pHash/chromaprints — same join shape): a
    *      payload whose sampled frames also occur in OTHER payloads is
    *      a re-encode/clip suspect. Per doc: sampled frame count and
    *      how many of those frames appear in ≥1 other doc — one
    *      distinct-count aggregation over the frame-hash shuffle, never
    *      a pair join, so the pass is linear in total frames at any
    *      corpus size.
    *
    * Everything is deterministic bytes→md5 arithmetic, so the oracle
    * replays both passes exactly. */
  def payloadDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("phash", md5(col("payload")))
      .withColumn("keep", col("doc_id") ===
        min(col("doc_id")).over(Window.partitionBy(col("phash"))))
      .select(col("doc_id"), col("phash"), col("keep"))
    val f = frameSample(s, d).select(col("doc_id"), col("frame_md5"))
    val docsPerFrame = f.groupBy(col("frame_md5"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    val frameStats = f.join(docsPerFrame, "frame_md5")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
    hashed.join(frameStats, Seq("doc_id"))
      .select(col("doc_id"), col("phash"), col("keep"),
        col("n_frames"), col("n_shared"))
  }

  /** Resize to fit a max edge, preserving aspect ratio — the arithmetic a
    * real resize kernel uses to pick its output buffer. */
  private def resizeDims(w: Int, h: Int, maxEdge: Int): (Int, Int) = {
    val scale = maxEdge.toDouble / math.max(w, h)
    if (scale >= 1.0) (w, h)
    else (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
  }

  /** Uniform frame sampling: k frame indices evenly spaced in [0, n). */
  private def sampleFrames(n: Int, k: Int): Seq[Int] =
    if (n <= k) 0 until n
    else (0 until k).map(i => (i.toLong * n / k).toInt)

  /** Deterministic stand-in for a media decoder: derives fake dimensions,
    * frame count, and a feature mean from the payload bytes alone. The
    * fold is MODULAR (mod 2^31−1, no long overflow) so the DuckDB oracle
    * can replay it with list_reduce over per-char codepoints — the corpus
    * is ASCII, where bytes and codepoints coincide. */
  private val P = 2147483647L
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    var h = 7L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xFF)) % P; i += 1 }
    val width = 64 + (h % 1024).toInt
    val height = 64 + ((h / 1024) % 1024).toInt
    val frames = 1 + ((h / 1048576) % 32).toInt
    val featMean = (h % 1000000) / 1000000.0
    (width, height, frames, featMean)
  }
}
