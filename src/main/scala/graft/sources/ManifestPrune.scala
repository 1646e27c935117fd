package graft.sources

import graft.operators.TxnTable
import graft.operators.TxnTable.Entry
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Manifest-level FILE SKIPPING for the DSv2 SQL read path: evaluate the
  * pushed-down filter conjuncts against each live entry's per-file stats
  * (integral [lo,hi]+nulls, truncated string bounds, the same triples
  * the library's `snapshotBox`/`snapshotStrRange`/`snapshotNulls` prune
  * from) and keep only the entries that MAY hold a matching row. At
  * 100 TB this is the difference between O(#files) parquet footer opens
  * and touching only the files a selective `WHERE` can reach — planning
  * from driver-side manifest metadata, before any storage I/O.
  *
  * Sound by construction: a conjunct whose shape the stats cannot answer
  * (unsupported operator, non-indexed column, non-integral/non-string
  * literal) keeps every file — pruning only ever REMOVES files the stats
  * PROVE empty for the predicate, and the residual per-row filter still
  * runs inside the surviving files (file sources always re-apply pushed
  * filters). String comparisons are UTF-8 binary (Spark's own string
  * order) against the Iceberg-style truncation-conservative bounds. */
object ManifestPrune {

  /** Entries that may satisfy EVERY conjunct (logical AND). */
  def keep(entries: Seq[Entry], conjuncts: Seq[Expression]): Seq[Entry] = {
    val flat = conjuncts.flatMap(split)
    entries.filter(e => flat.forall(c => mayHold(e, c)))
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  /** Equality conjuncts of the shape `col = <integral literal>` (either
    * side, through widening casts; `<=>` against a non-null literal is
    * the same test) — what a bloom sidecar can answer beyond range
    * stats. Only ever used to REMOVE files the bloom proves empty for
    * the literal; anything else is not this shape and prunes nothing. */
  def eqLongConjuncts(conjuncts: Seq[Expression]): Seq[(String, Long)] =
    conjuncts.flatMap(split).flatMap {
      case EqualTo(l, r) => eqPair(l, r)
      case EqualNullSafe(l, r) => eqPair(l, r)
      case _ => None
    }

  private def eqPair(l: Expression, r: Expression): Option[(String, Long)] =
    (attrOf(l), longLit(r)) match {
      case (Some(c), Some(v)) => Some((c, v))
      case _ => (attrOf(r), longLit(l)) match {
        case (Some(c), Some(v)) => Some((c, v))
        case _ => None
      }
    }

  /** Unwrap the column side: a bare attribute, or a WIDENING integral
    * cast of one (an INT column compared to a BIGINT literal arrives as
    * `CAST(c AS BIGINT)` — the manifest records longs, so a widening
    * cast is stat-transparent). A NARROWING cast is NOT: `CAST(bigintCol
    * AS INT) = 5` can match rows whose untruncated value lies far
    * outside [5, 5] (non-ANSI wrap-around), so evaluating it against the
    * untruncated bounds would prune files that hold matching rows —
    * silently wrong results. Narrowing casts answer `None` and keep
    * every file. */
  private def attrOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Cast(a: AttributeReference, t, _, _)
        if intWidth(a.dataType) > 0 && intWidth(t) >= intWidth(a.dataType) =>
      Some(a.name)
    case _ => None
  }

  private def intWidth(t: org.apache.spark.sql.types.DataType): Int =
    t match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 4
      case LongType => 8
      case _ => 0
    }

  private def intLike(t: org.apache.spark.sql.types.DataType): Boolean =
    intWidth(t) > 0

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v, t) if intLike(t) && v != null =>
      Some(v.asInstanceOf[Number].longValue)
    case _ => None
  }

  private def strLit(e: Expression): Option[String] = e match {
    case Literal(v: UTF8String, StringType) if v != null => Some(v.toString)
    case _ => None
  }

  private def cmp = TxnTable.u8cmp _

  /** May entry `e` hold a row satisfying `p`? Conservative: unknown
    * shapes and missing stats answer true. */
  private def mayHold(e: Entry, p: Expression): Boolean = p match {
    case EqualTo(l, r) => binInt(e, l, r, "=") && binStr(e, l, r, "=") &&
      binDay(e, l, r, "=") && binBucket(e, l, r)
    case EqualNullSafe(l, r) if longLit(l).isDefined || longLit(r).isDefined ||
        strLit(l).isDefined || strLit(r).isDefined =>
      // <=> a non-null literal matches exactly what = matches
      binInt(e, l, r, "=") && binStr(e, l, r, "=")
    case LessThan(l, r) => binInt(e, l, r, "<") && binStr(e, l, r, "<") &&
      binDay(e, l, r, "<")
    case LessThanOrEqual(l, r) => binInt(e, l, r, "<=") &&
      binStr(e, l, r, "<=") && binDay(e, l, r, "<=")
    case GreaterThan(l, r) => binInt(e, l, r, ">") && binStr(e, l, r, ">") &&
      binDay(e, l, r, ">")
    case GreaterThanOrEqual(l, r) =>
      binInt(e, l, r, ">=") && binStr(e, l, r, ">=") &&
        binDay(e, l, r, ">=")
    case In(a, vs) => inMay(e, a, vs)
    case InSet(a, vs) =>
      attrOf(a).forall { c =>
        intMay(e, c) { case (lo, hi) =>
          vs.exists {
            case n: Number => n.longValue >= lo && n.longValue <= hi
            case _ => true
          }
        } && strMay(e, c) { case (fLo, fHi) =>
          vs.exists {
            case u: UTF8String =>
              cmp(u.toString, fLo) >= 0 && cmp(u.toString, fHi) <= 0
            case _ => true
          }
        }
      }
    case IsNull(a) => attrOf(a).forall { c =>
      // prune files the stats PROVE null-free; unknown counts (−1) keep
      e.nullsFor(c).orElse(e.strStats.collectFirst {
        case TxnTable.StrStat(`c`, _, _, n) => n
      }).forall(_ != 0L)
    }
    case IsNotNull(a) => attrOf(a).forall { c =>
      // an EMPTY recorded integral range (lo > hi) means the file is
      // all-null in c — IS NOT NULL can skip it. (String stats cannot
      // answer this: an all-"" file records the same ("","") bounds.)
      e.statFor(c).forall { case (lo, hi) => lo <= hi }
    }
    case StartsWith(a, pre) => (attrOf(a), strLit(pre)) match {
      case (Some(c), Some(prefix)) => strMay(e, c) { case (fLo, fHi) =>
        // keep if [fLo,fHi] intersects [prefix, prefix·∞): the upper
        // bound must reach the prefix, and the lower bound must not
        // already be past every prefixed string
        cmp(fHi, prefix) >= 0 &&
          (cmp(fLo, prefix) <= 0 || fLo.startsWith(prefix))
      }
      case _ => true
    }
    case _ => true
  }

  private def inMay(e: Entry, a: Expression, vs: Seq[Expression]): Boolean =
    attrOf(a).forall { c =>
      val longs = vs.map(longLit)
      val strs = vs.map(strLit)
      val intOk =
        if (longs.forall(_.isDefined))
          intMay(e, c) { case (lo, hi) =>
            longs.flatten.exists(v => v >= lo && v <= hi)
          }
        else true
      // bucketN(c) transform stats answer IN like they answer equality:
      // the file may hold the set only if SOME member's bucket lands in
      // its bucket box — what makes runtime join pruning (DPP IN-sets)
      // bite on hash-bucketed layouts where raw ranges prune nothing
      val bucketOk =
        if (longs.forall(_.isDefined))
          e.stats.forall { st =>
            st.col match {
              case TxnTable.BucketSpec(n, `c`) =>
                st.lo <= st.hi && longs.flatten.exists { v =>
                  val b = TxnTable.bucketOf(v, n.toInt)
                  b >= st.lo && b <= st.hi
                }
              case _ => true
            }
          }
        else true
      val strOk =
        if (strs.forall(_.isDefined))
          strMay(e, c) { case (fLo, fHi) =>
            strs.flatten.exists(v => cmp(v, fLo) >= 0 && cmp(v, fHi) <= 0)
          }
        else true
      intOk && bucketOk && strOk
    }

  /** Evaluate an integral comparison `col op lit` (either side) against
    * the entry's [lo,hi]; true when no integral stat can answer. */
  private def binInt(e: Entry, l: Expression, r: Expression, op: String)
      : Boolean =
    (attrOf(l), longLit(r), attrOf(r), longLit(l)) match {
      case (Some(c), Some(v), _, _) => intOp(e, c, op, v)
      case (_, _, Some(c), Some(v)) => intOp(e, c, flip(op), v)
      case _ => true
    }

  private def binStr(e: Entry, l: Expression, r: Expression, op: String)
      : Boolean =
    (attrOf(l), strLit(r), attrOf(r), strLit(l)) match {
      case (Some(c), Some(v), _, _) => strOp(e, c, op, v)
      case (_, _, Some(c), Some(v)) => strOp(e, c, flip(op), v)
      case _ => true
    }

  // ---- days(c) PARTITION-TRANSFORM stats (hidden partitioning) -------------

  /** A bare timestamp attribute — the base column of a possible
    * `days(c)` transform index. No cast unwrapping: a cast of a
    * timestamp changes the day mapping. */
  private def tsAttrOf(e: Expression): Option[String] = e match {
    case a: AttributeReference
        if a.dataType == TimestampType || a.dataType == TimestampNTZType =>
      Some(a.name)
    case _ => None
  }

  /** Epoch-day of a timestamp literal (Catalyst carries MICROSECONDS) —
    * the same floorDiv mapping as TxnTable.idxExpr / epochDayMs — plus
    * whether the literal sits EXACTLY on the day boundary (the common
    * time-range-query shape, where `ts < day-start` excludes the whole
    * day). */
  private def dayLit(e: Expression): Option[(Long, Boolean)] = e match {
    case Literal(v: Long, TimestampType) =>
      Some((Math.floorDiv(v, 86400000000L), Math.floorMod(v, 86400000000L) == 0L))
    case Literal(v: Long, TimestampNTZType) =>
      Some((Math.floorDiv(v, 86400000000L), Math.floorMod(v, 86400000000L) == 0L))
    case _ => None
  }

  /** A timestamp comparison answered from the `days(c)` transform stats:
    * the predicate maps to DAY granularity, so the bounds tests are the
    * coarsened (conservative) forms — `ts < v` may hold iff the file's
    * min day ≤ day(v) (strictly < when v sits exactly on the boundary:
    * no row of day(v) precedes the day's first instant); `ts > v` iff
    * its max day ≥ day(v). True when the entry carries no days(c)
    * stat. */
  private def binDay(e: Entry, l: Expression, r: Expression, op: String)
      : Boolean =
    (tsAttrOf(l), dayLit(r), tsAttrOf(r), dayLit(l)) match {
      case (Some(c), Some(d), _, _) => dayOp(e, s"days($c)", op, d)
      case (_, _, Some(c), Some(d)) => dayOp(e, s"days($c)", flip(op), d)
      case _ => true
    }

  private def dayOp(e: Entry, spec: String, op: String,
      d: (Long, Boolean)): Boolean =
    intMay(e, spec) { case (lo, hi) =>
      val (day, atBoundary) = d
      op match {
        case "=" => day >= lo && day <= hi
        case "<" => if (atBoundary) lo < day else lo <= day
        case "<=" => lo <= day
        case ">" | ">=" => hi >= day
        case _ => true
      }
    }

  /** An integral EQUALITY answered from `bucketN(c)` transform stats:
    * the literal maps to its bucket (TxnTable.bucketOf — the same
    * Mersenne-field multiplicative hash the stats were computed with)
    * and the file is prunable when its bucket box excludes it. Only
    * equality — a range predicate says nothing about hash buckets. */
  private def binBucket(e: Entry, l: Expression, r: Expression): Boolean =
    ((attrOf(l), longLit(r)) match {
      case (Some(c), Some(v)) => Some((c, v))
      case _ => (attrOf(r), longLit(l)) match {
        case (Some(c), Some(v)) => Some((c, v))
        case _ => None
      }
    }) match {
      case None => true
      case Some((c, v)) =>
        e.stats.forall { st =>
          st.col match {
            case TxnTable.BucketSpec(n, `c`) =>
              val b = TxnTable.bucketOf(v, n.toInt)
              st.lo <= st.hi && b >= st.lo && b <= st.hi
            case _ => true
          }
        }
    }

  private def flip(op: String): String = op match {
    case "<" => ">" case "<=" => ">="
    case ">" => "<" case ">=" => "<=" case o => o
  }

  private def intMay(e: Entry, c: String)(f: ((Long, Long)) => Boolean)
      : Boolean = e.statFor(c).forall { case (lo, hi) =>
      lo <= hi && f((lo, hi)) // empty range (all-null) matches no value
    }

  private def strMay(e: Entry, c: String)(f: ((String, String)) => Boolean)
      : Boolean = e.strStatFor(c).forall { case (fLo, fHi) => f((fLo, fHi)) }

  private def intOp(e: Entry, c: String, op: String, v: Long): Boolean =
    intMay(e, c) { case (lo, hi) =>
      op match {
        case "=" => v >= lo && v <= hi
        case "<" => lo < v
        case "<=" => lo <= v
        case ">" => hi > v
        case ">=" => hi >= v
        case _ => true
      }
    }

  private def strOp(e: Entry, c: String, op: String, v: String): Boolean =
    strMay(e, c) { case (fLo, fHi) =>
      op match {
        case "=" => cmp(v, fLo) >= 0 && cmp(v, fHi) <= 0
        case "<" => cmp(fLo, v) < 0
        case "<=" => cmp(fLo, v) <= 0
        case ">" => cmp(fHi, v) > 0
        case ">=" => cmp(fHi, v) >= 0
        case _ => true
      }
    }

  // ---- RUNTIME (DPP) filter decoding --------------------------------------

  /** Above this many IN members the per-file set test folds to its
    * [min,max] envelope: runtime join keys can reach millions of values,
    * and an O(#files × #values) existence scan at planning time is the
    * wrong trade — the envelope keeps pruning O(#files) while staying
    * sound (a superset of the set test). Range-clustered layouts lose
    * nothing (contiguous build keys ⇒ envelope ≈ set); bucket layouts
    * lose the per-value bucket probe only on the giant sets where it
    * was unaffordable anyway. */
  private val RuntimeInSetCap = 10000

  /** Decode one RUNTIME V2 predicate (what [[org.apache.spark.sql.
    * execution.datasources.v2.BatchScanExec]] passes to
    * `SupportsRuntimeV2Filtering.filter` after a dynamic-pruning
    * subquery resolves — an `IN` of the join build side's key values,
    * or a degenerate equality) into the catalyst shape [[keep]] prunes
    * with. Unknown shapes answer None: runtime filtering is an
    * optimization, and the per-row join above the scan re-applies the
    * real condition — dropping an undecodable predicate is always
    * sound. */
  def fromV2(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[Expression] = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference}
    def attr(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[AttributeReference] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        // the data type rides on the literals; the attribute only needs
        // its NAME for stat lookup (attrOf matches the bare reference)
        Some(AttributeReference(r.fieldNames.head,
          org.apache.spark.sql.types.NullType)())
      case _ => None
    }
    def lit(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[Literal] = e match {
      case l: V2Literal[_] => Some(Literal(l.value, l.dataType))
      case _ => None
    }
    p.name() match {
      case "IN" =>
        val kids = p.children()
        for {
          a <- attr(kids.head)
          vs <- Some(kids.tail.toSeq.map(lit)) if vs.forall(_.isDefined)
        } yield {
          val lits = vs.flatten
          val withType = a.withDataType(lits.headOption.map(_.dataType)
            .getOrElse(a.dataType))
          val longs = lits.map(l => longLit(l))
          if (lits.size > RuntimeInSetCap && longs.forall(_.isDefined)) {
            val ls = longs.flatten
            And(GreaterThanOrEqual(withType, Literal(ls.min)),
              LessThanOrEqual(withType, Literal(ls.max)))
          } else In(withType, lits)
        }
      case "=" =>
        val kids = p.children()
        if (kids.length != 2) None
        else (attr(kids(0)), lit(kids(1)), attr(kids(1)), lit(kids(0))) match {
          case (Some(a), Some(l), _, _) =>
            Some(EqualTo(a.withDataType(l.dataType), l))
          case (_, _, Some(a), Some(l)) =>
            Some(EqualTo(l, a.withDataType(l.dataType)))
          case _ => None
        }
      case _ => None
    }
  }
}
