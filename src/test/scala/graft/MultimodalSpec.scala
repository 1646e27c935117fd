package graft

import graft.operators.{Multimodal, TxnTable}
import org.apache.spark.sql.functions._

/** The blob-store lifecycle contracts: reference-counted GC collects
  * exactly the unreferenced payloads, commits nothing when there is
  * nothing to collect, ignores NULL references, and a re-referenced
  * payload survives the next pass. */
class MultimodalSpec extends SparkSpec {

  private def fresh(name: String): String = {
    val dir = Fs.scratch("graft_mmspec", name)
    Fs.deleteRecursively(dir)
    dir
  }

  private def mkStore(store: String, classes: Seq[Int]): Unit = {
    val s = spark
    import s.implicits._
    val blobs = classes.map(c => (s"b$c", s"PAYLOAD-$c".getBytes("UTF-8")))
      .toDF("pmd5", "payload")
    TxnTable.commit(spark, store, TxnTable.stageIndexed(spark, store,
      blobs.coalesce(1), Nil, Seq("pmd5")), expected = -1L,
      op = "create", schemaJson = blobs.schema.json,
      strIdxCols = Seq("pmd5"))
  }

  private def mkDocs(docs: String, refs: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    val rows = refs.toDF("doc_id", "pmd5")
    TxnTable.commit(spark, docs, TxnTable.stage(spark, docs,
      rows.coalesce(1)), expected = -1L, op = "create",
      schemaJson = rows.schema.json)
  }

  test("gcOrphans collects exactly the unreferenced blobs, is a no-op " +
      "when everything is referenced, and NULL references protect " +
      "nothing without crashing") {
    val store = fresh("gc_store")
    val docs = fresh("gc_docs")
    mkStore(store, Seq(1, 2, 3))
    // b1 referenced twice, b2 once, b3 only by a NULL row (= not at all)
    mkDocs(docs, Seq(1L -> "b1", 2L -> "b1", 3L -> "b2",
      4L -> (null: String)))
    val g1 = Multimodal.gcOrphans(spark, docs, store)
    assert(g1.orphans === 1L, "only the unreferenced b3 is an orphan")
    assert(g1.bytes === "PAYLOAD-3".getBytes("UTF-8").length.toLong)
    val left = TxnTable.snapshot(spark, store).select("pmd5").collect()
      .map(_.getString(0)).toSet
    assert(left === Set("b1", "b2"))
    // the GC commit is merge-on-read: every original entry carried
    val m = TxnTable.manifest(spark, store,
      TxnTable.currentVersion(spark, store))
    assert(m.entries.map(TxnTable.render).toSet ===
      TxnTable.manifest(spark, store, 0L).entries
        .map(TxnTable.render).toSet,
      "GC must tombstone, never rewrite store files")
    // idempotent: nothing left to collect, nothing committed
    val v1 = TxnTable.currentVersion(spark, store)
    val g2 = Multimodal.gcOrphans(spark, docs, store)
    assert(g2 === Multimodal.GcResult(v1, 0L, 0L))
    assert(TxnTable.currentVersion(spark, store) === v1,
      "an empty orphan set must not commit")
  }

  test("full wipe then re-reference: GC empties the store, a re-crawl " +
      "re-ingests, and the next pass leaves the live blob alone") {
    val s = spark
    import s.implicits._
    val store = fresh("gc_store2")
    val docs = fresh("gc_docs2")
    mkStore(store, Seq(5, 6))
    mkDocs(docs, Seq(1L -> "b5", 2L -> "b6"))
    // wipe every doc → both blobs orphan; the store empties by
    // tombstone, files intact
    TxnTable.applyChangesMor(spark, docs,
      TxnTable.snapshot(spark, docs).withColumn("op", lit("D")),
      "doc_id")
    val g = Multimodal.gcOrphans(spark, docs, store)
    assert(g.orphans === 2L)
    assert(TxnTable.snapshot(spark, store).count() === 0L)
    // re-crawl: the doc and the payload come back; the fresh file's
    // commit seq escapes the old tombstone (sequenced-MoR), and the
    // next pass must NOT re-collect the now-referenced blob
    TxnTable.append(spark, docs,
      Seq((10L, "b5")).toDF("doc_id", "pmd5").coalesce(1))
    TxnTable.append(spark, store,
      Seq(("b5", "PAYLOAD-5".getBytes("UTF-8")))
        .toDF("pmd5", "payload").coalesce(1))
    val vAfter = TxnTable.currentVersion(spark, store)
    val g3 = Multimodal.gcOrphans(spark, docs, store)
    assert(g3 === Multimodal.GcResult(vAfter, 0L, 0L))
    assert(TxnTable.snapshot(spark, store).select("pmd5").collect()
      .map(_.getString(0)).toSeq === Seq("b5"),
      "the re-ingested blob must be visible and survive GC")
  }
}
