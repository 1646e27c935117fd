package graft.sources

import graft.operators.TxnTable
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

/** SQL `MERGE INTO` / `UPDATE` over [[GraftCatalog]] tables — the DML
  * statements DataSourceV2 only offers through the heavyweight
  * row-level-operation API — routed instead to the FILE-PRUNED TxnTable
  * machinery by one resolution rule: once the analyzer has resolved the
  * statement (stars expanded, references bound), a Graft target swaps
  * the plan for an eager command that compiles the actions into a keyed
  * CHANGE SET and hands it to [[TxnTable.applyChanges]]/[[TxnTable
  * .merge]] — so a SQL MERGE touching one key region rewrites that
  * region's files, exactly like the library call (the pre-row-level-API
  * Delta shape). Supported MERGE form (the standard CDC statement):
  * single-column equality condition, at most one UPDATE action + any
  * DELETE actions (each optionally conditional, first-match-wins), at
  * most one INSERT action; matched-ness is resolved with one semi-probe
  * of the target's key column so conditional deletes and inserts keep
  * exact MERGE semantics. Anything else fails loudly at analysis —
  * never a silent wrong answer. */
case class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def graftTable(plan: LogicalPlan): Option[GraftTable] = plan match {
    case SubqueryAlias(_, child) => graftTable(child)
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTable => Some(g)
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved =>
      graftTable(m.targetTable)
        .map(g => GraftMergeCommand(g.location, m): LogicalPlan)
        .getOrElse(plan)
    case u: UpdateTable if u.resolved =>
      graftTable(u.table)
        .map(g => GraftUpdateCommand(g.location, u): LogicalPlan)
        .getOrElse(plan)
    case _ => plan
  }
}

/** Shared compile helpers for the eager DML commands. */
private[sources] object GraftDml {
  def df(session: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.GraftSqlBridge.ofRows(session, plan)

  def exprCol(e: Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE/UPDATE supports the standard CDC shape; $what")
}

/** Eager `MERGE INTO` — compiles the resolved actions into a keyed
  * change set (op ∈ U/D) and applies it through the file-pruned
  * [[TxnTable.applyChanges]]. */
case class GraftMergeCommand(location: String, merge: MergeIntoTable)
    extends LeafRunnableCommand {
  import GraftDml._

  override def run(session: SparkSession): Seq[Row] = {
    val tgtOut = AttributeSet(merge.targetTable.output)
    val srcOut = AttributeSet(merge.sourceTable.output)
    // the merge key: one target column = one source-side expression
    val (tKey, sKey) = merge.mergeCondition match {
      case EqualTo(a: AttributeReference, b)
          if tgtOut.contains(a) && b.references.subsetOf(srcOut) => (a, b)
      case EqualTo(b, a: AttributeReference)
          if tgtOut.contains(a) && b.references.subsetOf(srcOut) => (a, b)
      case other => unsupported(
        s"ON must be a single target-column equality, got $other")
    }
    merge.matchedActions.foreach {
      case _: UpdateAction | _: DeleteAction => ()
      case a => unsupported(s"matched action $a")
    }
    val updates = merge.matchedActions.collect { case u: UpdateAction => u }
    if (updates.size > 1) unsupported("more than one UPDATE action")
    val inserts = merge.notMatchedActions.map {
      case i: InsertAction => i
      case a => unsupported(s"not-matched action $a")
    }
    if (inserts.size > 1) unsupported("more than one INSERT action")
    if (merge.notMatchedBySourceActions.nonEmpty)
      unsupported("NOT MATCHED BY SOURCE")
    merge.matchedActions.flatMap(_.condition)
      .foreach(c => require(c.references.subsetOf(srcOut),
        s"matched-action conditions may reference only the source, got $c"))

    val src = df(session, merge.sourceTable)
    // ONE semi-probe of the target's key column resolves matched-ness,
    // so conditional DELETEs and INSERTs keep exact MERGE semantics
    // (an op column alone cannot: a source row can be a matched delete
    // or an unmatched insert depending on what the table holds)
    val keys = TxnTable.snapshot(session, location)
      .select(col(tKey.name).as("__tk")).distinct()
    val withM = src.join(broadcast(keys), exprCol(sKey) === col("__tk"),
        "left")
      .withColumn("__matched", col("__tk").isNotNull).drop("__tk")
    // first matching action in declaration order decides the op;
    // a matched row matching no action, or an unmatched row failing the
    // insert condition, is NO change (filtered out)
    val matchedOp = merge.matchedActions.foldRight(lit(null)) {
      (a, rest) =>
        val op = a match {
          case _: UpdateAction => lit("U")
          case _: DeleteAction => lit("D")
        }
        a.condition.map(c => when(exprCol(c), op).otherwise(rest))
          .getOrElse(op)
    }
    val insertOp = inserts.headOption.map { i =>
      i.condition.map(c => when(exprCol(c), lit("U"))
        .otherwise(lit(null))).getOrElse(lit("U"))
    }.getOrElse(lit(null))
    // change-row values: UPDATE assignments when matched, INSERT
    // assignments when not — per table column, in table order
    def assigned(as: Seq[Assignment], colName: String): Option[Expression] =
      as.collectFirst {
        case Assignment(k: AttributeReference, v) if k.name == colName => v
      }
    val tableCols = merge.targetTable.output.map(_.name)
    val valueCols = tableCols.map { c =>
      val up = updates.headOption.flatMap(u => assigned(u.assignments, c))
      val in = inserts.headOption.flatMap(i => assigned(i.assignments, c))
      (up, in) match {
        case (Some(u), Some(i)) =>
          when(col("__matched"), exprCol(u))
            .otherwise(exprCol(i)).as(c)
        case (Some(u), None) => exprCol(u).as(c)
        case (None, Some(i)) => exprCol(i).as(c)
        case (None, None) => unsupported(s"no assignment for column $c")
      }
    }
    val changes = withM
      .withColumn("op", when(col("__matched"), matchedOp)
        .otherwise(insertOp))
      .filter(col("op").isNotNull)
      .select(valueCols :+ col("op"): _*)
    TxnTable.applyChanges(session, location, changes, tKey.name)
    Seq.empty
  }
}

/** Eager `UPDATE` — the assigned rows become a keyed 'U' change set
  * (key = the table's first index column, required unique), applied
  * through the file-pruned merge: an UPDATE touching one key region
  * rewrites that region's files, not the table. The row lookup itself
  * is a manifest-resolved scan with the condition pushed to parquet. */
case class GraftUpdateCommand(location: String, update: UpdateTable)
    extends LeafRunnableCommand {
  import GraftDml._

  override def run(session: SparkSession): Seq[Row] = {
    val key = TxnTable.manifest(session, location,
        TxnTable.currentVersion(session, location))
      .idxCols.headOption.getOrElse(unsupported(
        "UPDATE needs an indexed key column ('index' table property)"))
    val snap = TxnTable.snapshot(session, location)
    // rebind target attributes to the snapshot's columns by NAME: the
    // resolved condition/assignments reference the DSv2 relation's
    // attribute ids, which a fresh snapshot read does not carry
    def rebind(e: Expression): Column = exprCol(e.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.GraftSqlBridge.expression(snap.col(a.name))
    })
    val cond = update.condition.map(rebind).getOrElse(lit(true))
    val cols = update.table.output.map(_.name)
    val valueCols = cols.map { c =>
      update.assignments.collectFirst {
        case Assignment(k: AttributeReference, v) if k.name == c => v
      }.map(v => rebind(v).as(c)).getOrElse(snap.col(c))
    }
    val changes = snap.filter(cond).select(valueCols: _*)
      .withColumn("op", lit("U"))
    TxnTable.applyChanges(session, location, changes, key)
    Seq.empty
  }
}
