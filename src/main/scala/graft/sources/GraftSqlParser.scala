package graft.sources

import graft.operators.{MatView, TxnTable}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StructType}

/** DECLARATIVE MATERIALIZED-VIEW DDL — the SQL front half of
  * [[MatView]], completing the CALL surface (GraftMaintenance's
  * create_matview / create_matview_extrema / create_matview_join /
  * refresh_matview*) with the statement a warehouse user actually
  * writes:
  *
  *   CREATE MATERIALIZED VIEW ns.mv AS
  *     SELECT st, COUNT(*), SUM(price) FROM ns.orders GROUP BY st
  *   REFRESH MATERIALIZED VIEW ns.mv
  *
  * Spark's parser has no MATERIALIZED VIEW grammar, so this
  * [[ParserInterface]] wrapper (injected via SparkSessionExtensions)
  * intercepts exactly these two statement shapes and delegates EVERY
  * other string to the session's own parser untouched. The CREATE's
  * defining query is parsed by the DELEGATE and the view KIND is
  * dispatched from the UNRESOLVED tree's shape — before analysis, so
  * the merge-on-read swap and the MV rewrite can never disturb the
  * extraction:
  *
  *   - `Aggregate(keys, count/sum/avg, relation)`  → fold MV
  *     ([[MatView.create]] — the telescoping signed fold)
  *   - `Aggregate(keys, count/min/max, relation)`  → extrema MV
  *     ([[MatView.createExtrema]] — monotone merge + dirty recompute;
  *     MIXING sum/avg with min/max refuses: no single view kind
  *     maintains both honestly)
  *   - `Aggregate(keys, count/sum/avg, inner-join tree)` → star MV
  *     ([[MatView.createJoinStar]] — the fact is the relation owning
  *     the aggregated value column, every other relation a dim, the
  *     equality conjuncts become the fact→dim references)
  *
  * REFRESH dispatches on the view's own definition kind
  * ([[MatView.kindOf]]) and (re-)registers for the transparent
  * rewrite — the registry is session state, and refresh is the
  * natural re-entry a new session hits first. Both commands return
  * the committed version. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    sqlText match {
      case CreateMv(ident, select) =>
        CreateMatViewCommand(ident.trim, select.trim, delegate)
      case RefreshMv(ident) => RefreshMatViewCommand(ident.trim)
      case _ => delegate.parsePlan(sqlText)
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String)
      : FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // identifiers: dotted, optionally backquoted parts — captured raw
  // and split on '.' after stripping backquotes
  private val CreateMv =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([`\w.]+)\s+AS\s+(.+?)\s*;?\s*""".r
  private val RefreshMv =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([`\w.]+)\s*;?\s*""".r

  private val CatName = "graft"

  /** `graft.ns.t` / `ns.t` → the warehouse location (the same
    * resolution the CALL procedures use). */
  private def locOf(ident: String): String = {
    val parts = ident.split('.').map(_.stripPrefix("`").stripSuffix("`"))
      .filterNot(_ == CatName).toSeq
    GraftMaintenance.resolveTable(GraftCatalog.defaultWarehouse,
      parts.mkString("."))
  }

  // the statement matched the MATERIALIZED VIEW grammar; what failed
  // is its SHAPE — the engine's loud-refusal idiom, not a parse error
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => strip(c)
    case other => other
  }

  /** The defining query's shape, read off the UNRESOLVED tree:
    * (grouping key names, aggregate function → bare-column arg pairs,
    * the FROM tree). */
  private case class MvShape(keys: Seq[String],
      aggs: Seq[(String, Option[String])], from: LogicalPlan)

  private def shapeOf(parsed: LogicalPlan): MvShape = strip(parsed) match {
    case a: Aggregate =>
      val keys = a.groupingExpressions.map {
        case u: UnresolvedAttribute => u.nameParts.last
        case other => fail("CREATE MATERIALIZED VIEW: grouping " +
          s"expressions must be bare columns, got '${other.sql}'")
      }
      val aggs = a.aggregateExpressions.flatMap(_.collect {
        case f: UnresolvedFunction =>
          val fn = f.nameParts.last.toLowerCase
          val arg = f.arguments match {
            case Seq(u: UnresolvedAttribute) => Some(u.nameParts.last)
            case Seq(_: UnresolvedStar) => None
            case Seq(l: org.apache.spark.sql.catalyst.expressions
                .Literal) => None // COUNT(1)
            case _ => fail("CREATE MATERIALIZED VIEW: aggregate " +
              s"arguments must be bare columns, got '${f.sql}'")
          }
          (fn, arg)
      })
      require(aggs.nonEmpty, "CREATE MATERIALIZED VIEW: the defining " +
        "query declares no aggregate")
      MvShape(keys, aggs, strip(a.child))
    case other => fail("CREATE MATERIALIZED VIEW: the defining query " +
      "must be a GROUP BY aggregate (got " +
      s"${other.getClass.getSimpleName})")
  }

  /** Flatten an all-INNER join tree of plain relations into
    * (relations, equality conjunct name pairs). */
  private def flatJoin(p: LogicalPlan)
      : Option[(Seq[String], Seq[(String, String)])] = strip(p) match {
    case r: UnresolvedRelation => Some((Seq(r.multipartIdentifier
      .filterNot(_ == CatName).mkString(".")), Nil))
    case j: Join if j.joinType == Inner =>
      def conj(e: Expression): Seq[(String, String)] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conj(l) ++ conj(r)
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
          Seq((a.nameParts.last, b.nameParts.last))
        case other => fail("CREATE MATERIALIZED VIEW: join conditions " +
          s"must be column equalities, got '${other.sql}'")
      }
      for {
        (lr, lc) <- flatJoin(j.left)
        (rr, rc) <- flatJoin(j.right)
      } yield (lr ++ rr, lc ++ rc ++ j.condition.map(conj).getOrElse(Nil))
    case _ => None
  }

  private val FoldFns = Set("count", "sum", "avg")
  private val ExtremaFns = Set("count", "min", "max")

  case class CreateMatViewCommand(ident: String, select: String,
      @transient delegate: ParserInterface) extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AttributeReference("version", LongType, nullable = false)())

    override def run(s: SparkSession): Seq[Row] = {
      val mvLoc = locOf(ident)
      require(TxnTable.versions(s, mvLoc).isEmpty,
        s"CREATE MATERIALIZED VIEW: '$mvLoc' already exists")
      val shape = shapeOf(delegate.parsePlan(select))
      val fnNames = shape.aggs.map(_._1).toSet
      val values = shape.aggs.flatMap(_._2).distinct
        .filterNot(shape.keys.contains)
      def value: String = values match {
        case Seq(v) => v
        case Seq() => fail("CREATE MATERIALIZED VIEW: no aggregated " +
          "value column (COUNT(*)-only views are a fold over any " +
          "value — aggregate one column)")
        case many => fail("CREATE MATERIALIZED VIEW: one view folds " +
          s"ONE value column, got ${many.mkString(", ")}")
      }
      val v = strip(shape.from) match {
        case _: UnresolvedRelation if fnNames.subsetOf(FoldFns) =>
          val base = locOf(relName(shape.from))
          val created = MatView.create(s, mvLoc, base, shape.keys, value,
            shape.aggs.map(_._1).distinct)
          MatView.register(s, mvLoc)
          created
        case _: UnresolvedRelation if fnNames.subsetOf(ExtremaFns) =>
          val base = locOf(relName(shape.from))
          val created = MatView.createExtrema(s, mvLoc, base, shape.keys,
            value)
          MatView.registerExtrema(s, mvLoc)
          created
        case _: UnresolvedRelation => fail("CREATE MATERIALIZED VIEW: " +
          s"no view kind maintains {${fnNames.mkString(", ")}} " +
          "honestly — count/sum/avg fold incrementally, count/min/max " +
          "maintain as an extrema view; mixing them needs two views")
        case j: Join =>
          if (!fnNames.subsetOf(FoldFns))
            fail("CREATE MATERIALIZED VIEW: a join view folds " +
              "count/sum/avg only")
          val (rels, conds) = flatJoin(j).getOrElse(
            fail("CREATE MATERIALIZED VIEW: the FROM tree must be " +
              "plain INNER joins of tables"))
          val locs = rels.map(locOf)
          val cols: Seq[Set[String]] =
            locs.map(l => TxnTable.snapshot(s, l).columns.toSet)
          val factIdx = locs.indices.filter(i => cols(i).contains(value))
          require(factIdx.size == 1, "CREATE MATERIALIZED VIEW: the " +
            s"aggregated column '$value' must live in exactly one " +
            s"joined table (found in ${factIdx.size})")
          val fi = factIdx.head
          val dimIdxs = locs.indices.filterNot(_ == fi)
          require(conds.size == dimIdxs.size,
            "CREATE MATERIALIZED VIEW: expected one fact→dim equality " +
              s"per dim (${dimIdxs.size}), got ${conds.size}")
          val dims = dimIdxs.map { di =>
            val hit = conds.collectFirst {
              case (a, b) if cols(fi).contains(a) &&
                cols(di).contains(b) => MatView.MvDimRef(locs(di), a, b)
              case (a, b) if cols(fi).contains(b) &&
                cols(di).contains(a) => MatView.MvDimRef(locs(di), b, a)
            }
            hit.getOrElse(fail("CREATE MATERIALIZED VIEW: no equality " +
              s"joins the fact to '${rels(di)}'"))
          }
          val created = MatView.createJoinStar(s, mvLoc, locs(fi), dims,
            shape.keys, value, shape.aggs.map(_._1).distinct)
          MatView.registerJoin(s, mvLoc)
          created
        case other => fail("CREATE MATERIALIZED VIEW: unsupported " +
          s"FROM shape (${other.getClass.getSimpleName})")
      }
      Seq(Row(v))
    }
  }

  private def relName(p: LogicalPlan): String = strip(p) match {
    case r: UnresolvedRelation => r.multipartIdentifier
      .filterNot(_ == CatName).mkString(".")
    case other => fail("CREATE MATERIALIZED VIEW: expected a table, " +
      s"got ${other.getClass.getSimpleName}")
  }

  case class RefreshMatViewCommand(ident: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AttributeReference("version", LongType, nullable = false)())

    override def run(s: SparkSession): Seq[Row] = {
      val mvLoc = locOf(ident)
      val v = MatView.kindOf(s, mvLoc) match {
        case "fold" =>
          val r = MatView.refresh(s, mvLoc)
          MatView.register(s, mvLoc); r.mvVersion
        case "join" =>
          val r = MatView.refreshJoin(s, mvLoc)
          MatView.registerJoin(s, mvLoc); r.mvVersion
        case "extrema" =>
          val r = MatView.refreshExtrema(s, mvLoc)
          MatView.registerExtrema(s, mvLoc); r.mvVersion
      }
      Seq(Row(v))
    }
  }
}
