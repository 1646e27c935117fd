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

  /** mm_blob_retract: BINARY PAYLOADS AS TXN-TABLE CITIZENS — the
    * multimodal GDPR shape, closing section H's biggest gap: before
    * this, media payloads lived outside the format and none of the
    * retention machinery (MoR tombstones, CDC feeds, retraction)
    * reached them. The pipeline:
    *
    *   1. INGEST with CONTENT-ADDRESSED DEDUP: payloads (deterministic
    *      image stubs — this container has no codecs; the bytes flow is
    *      real) are keyed by md5 and each distinct blob is stored ONCE
    *      in a graft table `(pmd5, payload BINARY, nrefs, nbytes)`,
    *      md5-clustered and string-indexed — the CDN/crawler object
    *      store as a transactional table;
    *   2. RETRACT named payloads (the GDPR list is md5 content
    *      addresses) via a merge-on-read all-'D' change set with
    *      `cdc = true`: ONE commit writes the equality tombstone AND
    *      the signed feed naming the retracted blobs — ZERO data files
    *      rewritten, every manifest entry carries BYTE-VERBATIM, and
    *      `_metadata` coordinates prove every surviving blob still
    *      sits at its original (file, position);
    *   3. RE-CRAWL: appending a retracted payload later lands in a
    *      fresh file whose seq the old tombstone can never name — the
    *      standard sequenced-MoR rule makes re-ingestion after
    *      retraction just work.
    *
    * `blob_ok` pins the dedup accounting (Σnrefs == items, blobs <
    * items), the byte-verbatim carry, the exact signed feed, the
    * coordinate proof, and the re-crawl visibility. Hashed output =
    * the final blob store; the oracle replays md5 content addressing
    * in DuckDB. At 100 TB: image GDPR costs one tombstone commit +
    * a blob-sized feed — never a store rewrite. */
  def blobRetract(s: SparkSession, d: String): DataFrame = {
    val store = graft.Fs.freshScratch("graft_mm", "blob_store")
    // deterministic image stubs with deliberate duplicates: payload
    // derives from doc_id % 13, so ~13 distinct blobs serve the corpus
    val items = imgItems(s, d)
    val blobs = items.groupBy(md5(col("payload")).as("pmd5"))
      .agg(org.apache.spark.sql.functions.min(col("payload"))
        .as("payload"), count(lit(1)).as("nrefs"),
        org.apache.spark.sql.functions.min(octet_length(col("payload")))
          .as("nbytes"))
    val nItems = items.count()
    TxnTable.commit(s, store, TxnTable.stageIndexed(s, store,
      blobs.repartitionByRange(4, col("pmd5"))
        .sortWithinPartitions(col("pmd5")), Nil, Seq("pmd5")),
      expected = -1L, op = "create", schemaJson = blobs.schema.json,
      strIdxCols = Seq("pmd5"))
    val m0 = TxnTable.manifest(s, store, 0L)
    val entries0 = m0.entries.map(TxnTable.render).toSet
    val coords0 = TxnTable.snapshotWithCoords(s, store)
      .select(col("pmd5"), col("__gcanon"), col("__gpos")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val stats = TxnTable.snapshot(s, store)
      .agg(count(lit(1)), sum(col("nrefs"))).collect()(0)
    val (nBlobs, refSum) = (stats.getLong(0), stats.getLong(1))
    // the GDPR list: the md5 content addresses of two payload classes —
    // a driver-side INPUT by contract, like every retraction list
    val named = items.filter(pmod(col("doc_id"), lit(13)).isin(3, 7))
      .select(md5(col("payload"))).distinct()
      .collect().map(_.getString(0)).toSeq
    // retract: MoR all-'D' change set, signed feed in the SAME commit
    val delRows = TxnTable.snapshot(s, store)
      .filter(col("pmd5").isin(named: _*)).withColumn("op", lit("D"))
    val v1 = TxnTable.applyChangesMor(s, store, delRows, "pmd5",
      cdc = true)
    val m1 = TxnTable.manifest(s, store, v1)
    val entriesCarried =
      m1.entries.map(TxnTable.render).toSet == entries0
    val feedOk = m1.cdcRefs.nonEmpty && {
      val f = s.read.parquet(m1.cdcRefs.map(r => s"$store/$r"): _*)
      f.count() == named.size &&
        f.filter(col("w") === -1).count() == named.size &&
        f.select("pmd5").collect().map(_.getString(0)).toSet ==
          named.toSet
    }
    // _metadata proof: every survivor still sits at its ORIGINAL
    // (file, position) — retraction rewrote nothing
    val coords1 = TxnTable.snapshotWithCoords(s, store)
      .select(col("pmd5"), col("__gcanon"), col("__gpos")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val coordsOk = coords1.subsetOf(coords0) &&
      coords1.size == (nBlobs - named.size) &&
      !coords1.exists(c => named.contains(c._1))
    // re-crawl: the class-3 payload comes back — a fresh file the old
    // tombstone's seq can never name
    val reRow = items.filter(pmod(col("doc_id"), lit(13)) === 3)
      .groupBy(md5(col("payload")).as("pmd5"))
      .agg(org.apache.spark.sql.functions.min(col("payload"))
        .as("payload"), lit(1L).as("nrefs"),
        org.apache.spark.sql.functions.min(octet_length(col("payload")))
          .as("nbytes"))
    TxnTable.append(s, store, reRow.coalesce(1))
    val coords2 = TxnTable.snapshotWithCoords(s, store)
      .select(col("pmd5"), col("__gcanon"), col("__gpos")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val reMd5 = reRow.select("pmd5").collect()(0).getString(0)
    val recrawlOk = coords2.exists(c => c._1 == reMd5 &&
      !coords0.contains(c))
    val ok = nBlobs < nItems && refSum == nItems && named.size == 2 &&
      entriesCarried && feedOk && coordsOk && recrawlOk
    TxnTable.snapshot(s, store)
      .select(col("pmd5"), col("nrefs"),
        col("nbytes").cast("long").as("nbytes"))
      .withColumn("blob_ok", lit(ok))
  }

  /** The deterministic image-stub corpus shared by the blob-store
    * scenarios ([[blobRetract]], [[blobGc]], [[blobStream]]): one
    * payload per doc whose CONTENT is a function of doc_id % 13 alone,
    * so ~13 distinct blobs serve any corpus size. This builder and its
    * DuckDB replay (`'IMG:' || class || ':' || repeat('x', class*7)`)
    * must change together — one definition here, one per oracle. */
  private def imgItems(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(lit("IMG:"), pmod(col("doc_id"), lit(13)), lit(":"),
        repeat(lit("x"), pmod(col("doc_id"), lit(13)).cast("int") * 7))
        .cast("binary").as("payload"))

  /** Outcome of one [[gcOrphans]] run: the store version after the GC
    * commit (unchanged when nothing was orphaned), how many blobs were
    * tombstoned, and the payload bytes they pin. */
  case class GcResult(version: Long, orphans: Long, bytes: Long)

  /** REFERENCE-COUNTED BLOB GC — the companion of [[blobRetract]]'s
    * ingest dedup: documents reference payloads by content address
    * (`pmd5`), documents get deleted over time (GDPR, dedup, quality
    * filtering), and a blob whose referencing documents are ALL gone is
    * an orphan eating the store forever — at 100 TB the orphan mass is
    * real money. One GC pass: the LIVE set is the docs table's distinct
    * `pmd5` (shuffled anti-join against the store — O(store + docrefs),
    * the planner picks broadcast only when the live set is actually
    * small), orphans are tombstoned with ONE merge-on-read all-'D'
    * commit carrying its signed feed (`cdc = true` — downstream caches
    * and indexes see the retraction like any other) and ZERO store
    * data files rewritten. A store that MOVED while the orphan set was
    * being computed refuses loudly (the version guard below, then
    * applyChangesMor's own commit CAS from its entry onward) instead
    * of deleting against a stale snapshot.
    * The DOCS side has the classic collector race: a document inserted
    * AFTER the live-set read but BEFORE the commit can reference a
    * blob this pass tombstones — run GC as the store's only writer (a
    * maintenance op, like compact), and the content-addressed re-crawl
    * path ([[blobRetract]]'s sequenced-MoR rule) restores any payload
    * by re-ingesting it. An empty orphan set commits nothing. */
  def gcOrphans(s: SparkSession, docs: String, store: String)
      : GcResult = {
    val sv = TxnTable.currentVersion(s, store)
    // BOTH inputs pinned: the orphan plan is lazily re-evaluated by
    // the commit's write job after the counting pass below, and an
    // unpinned docs read would let a concurrent docs commit change the
    // tombstoned set between the two evaluations — the feed would no
    // longer name the counted orphans. Pinned at (dv, sv), the plan is
    // deterministic: count and commit speak about the same set.
    val dv = TxnTable.currentVersion(s, docs)
    val live = TxnTable.snapshot(s, docs, dv).select(col("pmd5"))
      .filter(col("pmd5").isNotNull).distinct()
    val orphanRows = TxnTable.snapshot(s, store, sv)
      .join(live, Seq("pmd5"), "left_anti")
    val agg = orphanRows.agg(count(lit(1)),
      coalesce(sum(octet_length(col("payload"))), lit(0L))).collect()(0)
    if (agg.getLong(0) == 0L) return GcResult(sv, 0L, 0L)
    // the orphan set speaks about version sv; a store write since then
    // must refuse — deleting coordinates computed against a moved
    // snapshot is the one unforgivable collector bug. This guard closes
    // the compute window; applyChangesMor's commit CAS covers
    // everything from its own entry re-read onward, and the hairline
    // between the two is owned by the documented single-writer contract
    val now = TxnTable.currentVersion(s, store)
    require(now == sv, s"$store moved ($sv -> $now) while the orphan " +
      "set was computed — rerun the GC against the current snapshot")
    val v = TxnTable.applyChangesMor(s, store,
      orphanRows.withColumn("op", lit("D")), "pmd5", cdc = true)
    GcResult(v, agg.getLong(0), agg.getLong(1))
  }

  /** mm_ref_gc: the blob store's GARBAGE COLLECTION lifecycle end to
    * end — what keeps a content-addressed media store from growing
    * monotonically at 100 TB. Two graft tables: `docs` (doc_id → pmd5
    * content reference) and `store` (pmd5 → payload, ingested
    * deduplicated — [[blobRetract]]'s shape). The document corpus then
    * shrinks the two ways real pipelines shrink it: a GDPR wipe of two
    * whole payload classes (every referencing doc deleted → those
    * blobs become orphans) and a scattered quality cut (every 5th doc
    * → every class keeps other refs). [[gcOrphans]] pass 1 tombstones
    * EXACTLY the two orphaned blobs — `gc_ok` pins the orphan
    * count/bytes accounting, the byte-verbatim carry of every store
    * manifest entry, the signed feed naming exactly the orphans, and
    * survivors sitting at their ORIGINAL `_metadata` coordinates
    * (zero files rewritten). Pass 2 proves idempotence (no orphans, no
    * commit, version unchanged). Then a RE-CRAWL re-ingests one wiped
    * class (new doc + content-addressed re-append): the blob surfaces
    * at a NEW coordinate (the old tombstone's seq can never name the
    * fresh file), and GC pass 3 deletes nothing — the re-referenced
    * blob is live again. Hashed output = the final store; the oracle
    * replays the class arithmetic in DuckDB. At 100 TB: GC costs one
    * anti-join + one tombstone commit per pass, never a store rewrite
    * — and a collector that CAS-fails on concurrent writes instead of
    * corrupting. */
  def blobGc(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Fs.freshScratch("graft_mm", "gc_docs")
    val store = graft.Fs.freshScratch("graft_mm", "gc_store")
    val items = imgItems(s, d)
    val docRows = items.select(col("doc_id"),
      md5(col("payload")).as("pmd5"))
    TxnTable.commit(s, docs, TxnTable.stageIndexed(s, docs,
      docRows.repartitionByRange(4, col("doc_id"))
        .sortWithinPartitions(col("doc_id")), Seq("doc_id"),
      Seq("pmd5")), expected = -1L, op = "create",
      schemaJson = docRows.schema.json, idxCols = Seq("doc_id"),
      strIdxCols = Seq("pmd5"))
    val blobs = items.groupBy(md5(col("payload")).as("pmd5"))
      .agg(org.apache.spark.sql.functions.min(col("payload"))
        .as("payload"))
    TxnTable.commit(s, store, TxnTable.stageIndexed(s, store,
      blobs.repartitionByRange(4, col("pmd5"))
        .sortWithinPartitions(col("pmd5")), Nil, Seq("pmd5")),
      expected = -1L, op = "create", schemaJson = blobs.schema.json,
      strIdxCols = Seq("pmd5"))
    val entries0 = TxnTable.manifest(s, store, 0L).entries
      .map(TxnTable.render).toSet
    val coords0 = TxnTable.snapshotWithCoords(s, store)
      .select(col("pmd5"), col("__gcanon"), col("__gpos")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val nBlobs0 = coords0.size.toLong
    // the corpus shrinks: GDPR-wipe classes 3 and 7 (docs deleted
    // row-complete → their blobs orphan) + a scattered quality cut
    // (5|doc_id — every class keeps other referencing docs)
    val docDel = TxnTable.snapshot(s, docs)
      .filter(pmod(col("doc_id"), lit(13)).isin(3, 7) ||
        pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("op", lit("D"))
    TxnTable.applyChangesMor(s, docs, docDel, "doc_id", cdc = true)
    val orphanMd5 = items
      .filter(pmod(col("doc_id"), lit(13)).isin(3, 7))
      .select(md5(col("payload"))).distinct()
      .collect().map(_.getString(0)).toSet
    val orphanBytes = items
      .filter(pmod(col("doc_id"), lit(13)).isin(3, 7))
      .select(md5(col("payload")).as("pmd5"),
        octet_length(col("payload")).cast("long").as("nb"))
      .distinct().agg(sum(col("nb"))).collect()(0).getLong(0)
    // GC pass 1: exactly the two orphans, one tombstone commit
    val g1 = gcOrphans(s, docs, store)
    val m1 = TxnTable.manifest(s, store, g1.version)
    val carried = m1.entries.map(TxnTable.render).toSet == entries0
    val feedOk = m1.cdcRefs.nonEmpty && {
      val f = s.read.parquet(m1.cdcRefs.map(r => s"$store/$r"): _*)
      f.filter(col("w") === -1).count() == orphanMd5.size &&
        f.count() == orphanMd5.size &&
        f.select("pmd5").collect().map(_.getString(0)).toSet == orphanMd5
    }
    val coords1 = TxnTable.snapshotWithCoords(s, store)
      .select(col("pmd5"), col("__gcanon"), col("__gpos")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val gc1Ok = g1.orphans == orphanMd5.size && g1.bytes == orphanBytes &&
      coords1.subsetOf(coords0) &&
      coords1.size == nBlobs0 - orphanMd5.size &&
      !coords1.exists(c => orphanMd5.contains(c._1))
    // GC pass 2: idempotent — nothing orphaned, nothing committed
    val g2 = gcOrphans(s, docs, store)
    val gc2Ok = g2.orphans == 0L && g2.bytes == 0L &&
      g2.version == g1.version
    // re-crawl: one wiped class comes back — a fresh doc reference plus
    // the content-addressed re-ingest; the blob surfaces at a NEW
    // coordinate and the next GC pass leaves it alone
    val reDoc = items.filter(pmod(col("doc_id"), lit(13)) === 3)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        md5(col("payload")).as("pmd5")).limit(1)
    TxnTable.append(s, docs, reDoc.coalesce(1))
    val reBlob = items.filter(pmod(col("doc_id"), lit(13)) === 3)
      .groupBy(md5(col("payload")).as("pmd5"))
      .agg(org.apache.spark.sql.functions.min(col("payload"))
        .as("payload"))
    TxnTable.append(s, store, reBlob.coalesce(1))
    val reMd5 = reBlob.select("pmd5").collect()(0).getString(0)
    val g3 = gcOrphans(s, docs, store)
    val coords3 = TxnTable.snapshotWithCoords(s, store)
      .select(col("pmd5"), col("__gcanon"), col("__gpos")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val recrawlOk = g3.orphans == 0L &&
      coords3.exists(c => c._1 == reMd5 && !coords0.contains(c))
    val ok = orphanMd5.size == 2 && carried && feedOk && gc1Ok &&
      gc2Ok && recrawlOk
    TxnTable.snapshot(s, store)
      .select(col("pmd5"),
        octet_length(col("payload")).cast("long").as("nbytes"))
      .withColumn("gc_ok", lit(ok))
  }

  /** mm_blob_stream: the STREAMING CRAWLER INGEST of the
    * content-addressed blob store — the continuous form of
    * [[blobRetract]]'s batch ingest, which is how a 100 TB media store
    * is actually built: micro-batches of (doc_id, payload) arrive, each
    * batch dedups against the STORE SO FAR (one anti-join on the
    * content address — cross-batch, not per-batch), and lands its doc
    * references, its NOVEL blobs, and one audit row as ONE atomic
    * transaction ([[TxnTable.commitMultiIdempotent]]): a crash between
    * the doc commit and the blob commit would otherwise leave doc rows
    * pointing at payloads the store never got (or orphan blobs no doc
    * names) FOREVER. The (appId, batchId) ledger makes foreachBatch's
    * documented at-least-once retries skip cleanly — the scenario
    * re-lands every batch a second time (4 retry skips) and replays
    * batch 0 after the stream (skip). Four waves split by doc_id % 4,
    * the last a RE-CRAWL (shifted doc ids, byte-identical payloads):
    * wave 0 covers every payload class, so the audit trail must show
    * all novelty in batch 0 and ZERO new blobs after — the dedup
    * accounting is computed independently from the wave payloads and
    * compared against the committed ledger. The three tables move in
    * lockstep (identical version trails), the store holds exactly the
    * distinct content addresses, and the docs table every reference.
    * Hashed output = the final store; the oracle replays the md5
    * class arithmetic. At 100 TB: ingest costs one anti-join + one
    * multi-table pend per batch — exactly-once without a
    * coordinator, and the store grows by CONTENT, never by crawl
    * volume. */
  def blobStream(s: SparkSession, d: String): DataFrame = {
    val base = graft.Fs.freshScratch("graft_mm_stream", "run")
    val docsT = s"$base/docs"
    val store = s"$base/store"
    val ledger = s"$base/ledger"
    val sx = s
    import sx.implicits._
    val items = imgItems(s, d)
    val waves = Seq(
      items.filter(pmod(col("doc_id"), lit(4)) === 0),
      items.filter(pmod(col("doc_id"), lit(4)) === 1),
      items.filter(pmod(col("doc_id"), lit(4)) === 2),
      // the re-crawl: shifted doc ids, byte-identical payloads — every
      // blob must dedup against earlier waves' store rows
      items.filter(pmod(col("doc_id"), lit(4)) === 3)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("payload")))
    val docsSchema = items.select(col("doc_id"),
      md5(col("payload")).as("pmd5")).schema
    val storeSchema = items.select(md5(col("payload")).as("pmd5"),
      col("payload")).schema
    val ledgerSchema = Seq.empty[(Long, Long, Long)]
      .toDF("batch_id", "n_docs", "n_novel").schema
    TxnTable.commit(s, docsT, TxnTable.stageEmpty(s, docsT, docsSchema),
      expected = -1L, op = "create", schemaJson = docsSchema.json)
    TxnTable.commit(s, store, TxnTable.stageEmpty(s, store, storeSchema),
      expected = -1L, op = "create", schemaJson = storeSchema.json)
    TxnTable.commit(s, ledger,
      TxnTable.stageEmpty(s, ledger, ledgerSchema),
      expected = -1L, op = "create", schemaJson = ledgerSchema.json)
    val feed = graft.streaming.Streams.stageWaveFeed(s, base, waves)
    val applies = new java.util.concurrent.atomic.AtomicLong
    val retrySkips = new java.util.concurrent.atomic.AtomicLong
    val q = s.readStream.schema("doc_id LONG, payload BINARY")
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(feed)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          epoch: Long) =>
        val bRows = batch.select(col("doc_id"),
          md5(col("payload")).as("pmd5"), col("payload"))
          .localCheckpoint(true)
        // batch-distinct first, then ONE anti-join against the store's
        // content addresses — the scan is store-sized, never
        // crawl-history-sized
        val bBlobs = bRows.groupBy(col("pmd5"))
          .agg(org.apache.spark.sql.functions.min(col("payload"))
            .as("payload"))
        val novel = bBlobs.join(
          TxnTable.snapshot(s, store).select(col("pmd5")),
          Seq("pmd5"), "left_anti").localCheckpoint(true)
        val docsRows = bRows.select(col("doc_id"), col("pmd5"))
        val audit = Seq((epoch, docsRows.count(), novel.count()))
          .toDF("batch_id", "n_docs", "n_novel")
        def land() = TxnTable.commitMultiIdempotent(s,
          Seq(docsT -> docsRows,
            store -> novel.select(col("pmd5"), col("payload")),
            ledger -> audit),
          "blob-sink", epoch)
        if (land().isDefined) applies.incrementAndGet()
        // the at-least-once retry: the SAME batch re-lands in NO table
        if (land().isEmpty) retrySkips.incrementAndGet()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // post-stream replay from an old checkpoint: still a clean skip
    val replay0 = TxnTable.commitMultiIdempotent(s,
      Seq(docsT -> TxnTable.snapshot(s, docsT).limit(0),
        store -> TxnTable.snapshot(s, store).limit(0),
        ledger -> Seq((0L, 0L, 0L)).toDF("batch_id", "n_docs",
          "n_novel")),
      "blob-sink", 0L)
    // the EXPECTED dedup accounting, derived from the wave payloads
    // independently of anything the stream wrote
    val waveMd5s = waves.map(_.select(md5(col("payload"))).distinct()
      .collect().map(_.getString(0)).toSet)
    val expTrail = waveMd5s.zipWithIndex.map { case (m, i) =>
      (m -- waveMd5s.take(i).foldLeft(Set.empty[String])(_ ++ _)).size
        .toLong
    }
    val expDocs = waves.map(_.count())
    val led = TxnTable.snapshot(s, ledger).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val storeMd5s = TxnTable.snapshot(s, store).select(col("pmd5"))
      .collect().map(_.getString(0)).toSet
    val trails = Seq(docsT, store, ledger)
      .map(t => TxnTable.versions(s, t))
    val ok = applies.get == 4L && retrySkips.get == 4L &&
      replay0.isEmpty &&
      trails.forall(_ == Seq(0L, 1L, 2L, 3L, 4L)) &&
      led.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L) &&
      led.map(_._2).toSeq == expDocs &&
      led.map(_._3).toSeq == expTrail &&
      expTrail.tail.forall(_ == 0L) && expTrail.head > 0L &&
      storeMd5s == waveMd5s.reduce(_ ++ _) &&
      TxnTable.snapshot(s, docsT).count() == expDocs.sum
    TxnTable.snapshot(s, store)
      .select(col("pmd5"),
        octet_length(col("payload")).cast("long").as("nbytes"))
      .withColumn("bstream_ok", lit(ok))
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
