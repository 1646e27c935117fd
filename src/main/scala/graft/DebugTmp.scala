package graft
import graft.operators._
import org.apache.spark.sql.functions._
object DebugTmp {
  def main(a: Array[String]): Unit = {
    val s = Engine.session(8, appName = "dbg")
    val d = "/root/testdata/sf0.01"
    val t = java.nio.file.Files.createTempDirectory("dbg_del").toString + "/t"
    val base = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12,2)).as("price"))
    val k = col("o_orderkey")
    TxnTable.commit(s, t, TxnTable.stageIndexed(s, t,
      base.repartitionByRange(8, k).sortWithinPartitions(k), "o_orderkey"),
      expected = -1L, op = "create")
    val bounds = base.agg(min("o_orderkey"), max("o_orderkey")).collect()(0)
    val (kmin, kmax) = (bounds.getLong(0), bounds.getLong(1))
    val span = kmax - kmin
    val (lo, hi) = (kmin + span / 4, kmin + span / 2)
    println(s"DBG kmin=$kmin kmax=$kmax lo=$lo hi=$hi nrows=${base.count()}")
    TxnTable.liveEntries(s, t, 0).foreach(e =>
      println("DBG " + e.path + " " + e.statFor("o_orderkey") + " nulls=" + e.nullsFor("o_orderkey")))
    val res = TxnTable.deleteRange(s, t, "o_orderkey", lo, hi)
    println(s"DBG dropped=${res.dropped} rewritten=${res.rewritten} kept=${res.kept} v=${res.version}")
    s.stop()
  }
}
