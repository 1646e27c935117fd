package graft

import graft.operators.AsOf
import scala.util.Random

/** The composed as-of join matches a reference nearest-earlier scan on
  * seeded random data (including key misses, exact-timestamp ties, and
  * empty right sides).
  */
class AsOfSpec extends SparkSpec {

  private def randRows(rng: Random, n: Int): Seq[(Int, Long, Long)] =
    Seq.fill(n)((rng.nextInt(5), rng.nextInt(50).toLong, rng.nextInt(1000).toLong))

  (1 to 5).foreach { seed =>
    test(s"asofJoin matches brute-force nearest-earlier (seed $seed)") {
      val s = spark
      import s.implicits._
      val rng = new Random(seed)
      val ls = randRows(rng, 40)
      val rs = randRows(rng, 40)
      val left = ls.zipWithIndex
        .map { case ((k, t, _), i) => (i.toLong, k, t) }
        .toDF("id", "k", "t")
      val right = rs.toDF("k", "t", "v")
      val got = AsOf.asofJoin(left, right, "k", "k", "t", "t", "v")
        .select("id", "_asof").as[(Long, Option[Long])].collect().toMap
      ls.zipWithIndex.foreach { case ((k, t, _), i) =>
        val cands = rs.filter(r => r._1 == k && r._2 <= t)
        got(i.toLong) match {
          case None => assert(cands.isEmpty, s"row $i: missed a match")
          case Some(v) =>
            assert(cands.nonEmpty, s"row $i: spurious match $v")
            val bestT = cands.map(_._2).max
            // any right row at the winning timestamp is a valid witness
            assert(cands.filter(_._2 == bestT).map(_._3).contains(v),
              s"row $i: got $v, best-time candidates " +
                cands.filter(_._2 == bestT).toString)
        }
      }
    }
  }

  test("saltedJoin matches the plain shuffle join exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val ord = Tables.orders(s, sf)
    val cust = Tables.customer(s, sf)
    val plain = ord.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("t"))
      .as[(String, Long, Double)].collect().toSet
    val salted = graft.operators.SkewJoin
      .saltedJoin(ord, cust, "o_custkey", "c_custkey", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("t"))
      .as[(String, Long, Double)].collect().toSet
    assert(salted == plain)
  }

  test("asofJoin with empty right side yields all nulls") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1, 10L), (2L, 2, 20L)).toDF("id", "k", "t")
    val right = Seq.empty[(Int, Long, Long)].toDF("k", "t", "v")
    val got = AsOf.asofJoin(left, right, "k", "k", "t", "t", "v")
      .select("_asof").as[Option[Long]].collect()
    assert(got.forall(_.isEmpty))
  }
}
