package graft

import graft.api.MapReduce
import graft.operators.MapReduceJobs

/** The generic user-supplied map/reduce API re-derives the built-in jobs:
  * the reference's core abstraction (user supplies map + reduce, framework
  * distributes) must be expressible by a library user, not just by the
  * fixed operator suite.
  */
class MapReduceApiSpec extends SparkSpec {

  test("user-supplied wordcount via MapReduce.run matches the built-in job") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sf).select("text").as[String]
    val api = MapReduce.run(docs)(t =>
      t.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L))(_ + _)
      .collect().toMap
    val builtin = MapReduceJobs.wordCount(s, sf)
      .as[(String, Long)].collect().toMap
    assert(api == builtin)
  }

  test("user-supplied grep via MapReduce.run matches the built-in job") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sf)
      .select("source", "text").as[(String, String)]
    val api = MapReduce.run(docs) { case (src, text) =>
      if (text.contains("spark")) Iterator(src -> 1L) else Iterator.empty
    }(_ + _).collect().toMap
    val builtin = MapReduceJobs.grep(s, sf)
      .as[(String, Long)].collect().toMap
    assert(api == builtin)
  }

  test("runGroups hands the reducer the whole value group") {
    val s = spark
    import s.implicits._
    val data = Seq("a" -> 5L, "a" -> 1L, "a" -> 3L, "b" -> 2L).toDS()
    // range per key needs min AND max — not pairwise-mergeable into one
    // value without a tuple, i.e. genuinely needs the full group
    val out = MapReduce.runGroups(data)(Iterator(_)) { (k, it) =>
      val vs = it.toSeq
      (k, vs.max - vs.min)
    }.collect().toMap
    assert(out == Map("a" -> 4L, "b" -> 0L))
  }
}
