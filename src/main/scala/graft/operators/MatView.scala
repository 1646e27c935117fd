package graft.operators

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** MATERIALIZED VIEWS with INCREMENTAL REFRESH over the change feed —
  * the managed form of op_incremental_agg's telescoping fold. An MV is
  * itself a TxnTable (snapshot isolation, time travel, vacuum — all
  * inherited) holding `groupBy(key).agg(count, sum(value))` of a base
  * TxnTable, plus two pieces of state:
  *
  *  - the immutable DEFINITION (base location, key, value column) in a
  *    one-shot `_mv` file written at create — it never changes, so no
  *    atomicity is owed to it (a production catalog would hold this row;
  *    the table format's job is only the part below);
  *  - the REFRESH CURSOR — the base version this MV reflects — in the
  *    refresh commit's own `#metrics=` header (`mv_base_version`), so
  *    applying a feed and recording that it was applied is ONE atomic
  *    manifest commit: a crashed refresh either fully landed or never
  *    happened, and a re-run is exact (never double-applies a delta).
  *
  * refresh() reads ONLY the base's published per-commit signed feeds
  * (`#cdc=` refs) for (cursor, head] — never the base data files: cost
  * is O(changes since last refresh) + O(MV), at ANY base size. That is
  * the whole point of a 100 TB MV: the base may take hours to scan, the
  * nightly delta seconds. Base commits in the range without a feed are
  * accepted only when their op is content-invariant (compact /
  * recluster / zorder / checkpoint / rewrite_tombstones / restore is
  * NOT — it changes content); anything else refuses LOUDLY with the
  * full-recompute remedy, the Delta "change data feed not enabled for
  * range" contract — a silent fallback to rescanning the base would
  * hide exactly the cost the MV exists to avoid.
  *
  * The delta fold is pure algebra on the signed feed: per group,
  * `n += Σw`, `total += Σ(w·value)`; groups reaching n == 0 leave the
  * MV (op 'D'). The merge into the MV rides the file-pruned
  * [[TxnTable.applyChangesWithMetrics]] — only MV files whose key box
  * intersects the delta's groups rewrite. NULL values fold as 0 (a
  * group of only-NULL values reports total 0, not NULL — documented,
  * deterministic, and what the signed algebra needs to telescope). */
object MatView {

  private val D18 = DecimalType(18, 2)

  /** `aggs` is the DECLARED aggregate set ([[create]]'s validated
    * count/sum/avg subset): the rewrite rule serves ONLY declared
    * aggregates, so a view created as count-only never silently answers
    * SUM — the declaration is a real contract, not decoration.
    * `pred` makes the view PARTIAL: only base rows satisfying the
    * stored row-local predicate fold (the warehouse partial-index
    * shape — `WHERE price > 100` dashboards served from a view that
    * holds only those rows' groups); refresh filters each signed feed
    * by the SAME predicate, which is exact because membership is
    * row-local and an update is a −old/+new pair evaluated
    * independently (a reprice crossing the boundary folds as the
    * membership change it is). */
  case class MvDef(base: String, keys: Seq[String], value: String,
      aggs: Set[String], pred: Option[String] = None)

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def defPath(mv: String) = new Path(s"$mv/_mv")

  private def writeDef(s: SparkSession, mv: String, d: MvDef): Unit = {
    val p = defPath(mv)
    val out = fs(s, p).create(p, false)
    // comma-joined keys on one line: a pre-multi-key _mv (single bare
    // name) parses identically, so old views keep reading; the 4th
    // line is the declared aggregate set; a PARTIAL view appends its
    // predicate as the 5th line (full views stay 4-line on disk)
    try out.write((s"${d.base}\n${d.keys.mkString(",")}\n${d.value}\n" +
      s"${d.aggs.toSeq.sorted.mkString(",")}\n" +
      d.pred.map(_ + "\n").getOrElse(""))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private val AllAggs = Set("count", "sum", "avg")

  def readDef(s: SparkSession, mv: String): MvDef = {
    val p = defPath(mv)
    require(fs(s, p).exists(p), s"$mv is not a materialized view " +
      "(no _mv definition; create it with MatView.create)")
    val in = fs(s, p).open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.linesIterator.toSeq match {
      // pre-aggs definitions (3 lines) served every fold-derivable
      // aggregate — keep that behavior for existing views
      case Seq(base, keys, value) =>
        MvDef(base, keys.split(',').toSeq, value, AllAggs)
      case Seq(base, keys, value, aggs) =>
        // "".split(',') is Array("") — an empty declared-aggs line is a
        // malformed definition (create refuses it), not a served state
        require(aggs.nonEmpty, s"$mv: malformed _mv definition " +
          "(empty declared-aggregate line)")
        MvDef(base, keys.split(',').toSeq, value,
          aggs.split(',').toSet)
      case Seq(base, keys, value, aggs, pred) =>
        require(aggs.nonEmpty, s"$mv: malformed _mv definition " +
          "(empty declared-aggregate line)")
        require(pred.nonEmpty, s"$mv: malformed _mv definition " +
          "(empty predicate line)")
        MvDef(base, keys.split(',').toSeq, value,
          aggs.split(',').toSet, Some(pred))
      case other => throw new IllegalArgumentException(
        s"$mv: malformed _mv definition (${other.size} lines)")
    }
  }

  /** The base version this MV reflects: the newest MV commit carrying
    * the `mv_base_version` metric. Walking newest-first keeps the
    * cursor correct across interleaved NON-refresh MV commits (a
    * compact() of the MV, a checkpoint) — those carry entries, not
    * metrics, and must not reset the cursor. */
  def lastRefreshed(s: SparkSession, mv: String): Long =
    lastRefreshedAt(s, mv, Long.MaxValue) // no bound: one log listing

  /** [[lastRefreshed]] pinned at MV version `upTo` — the rewrite rule
    * reads the cursor AND the MV rows from ONE pinned version, so a
    * refresh landing between the two reads can never double-count its
    * feed tail (cursor from the old head + rows from the new one). */
  private[graft] def lastRefreshedAt(s: SparkSession, mv: String,
      upTo: Long): Long = cursorInfoAt(s, mv, upTo)._1

  /** The cursor AND whether the MV has been TRANSPLANTED onto its
    * branch's parent timeline ([[transplant]]) — both read from the
    * SAME newest cursor-carrying commit, so the pair can never mix
    * timelines: a cursor value is meaningless without knowing which
    * log it indexes, and reading the flag from any other commit would
    * reintroduce exactly the two-object race the one-commit transplant
    * design exists to close. */
  private[graft] def cursorInfoAt(s: SparkSession, mv: String,
      upTo: Long): (Long, Boolean) =
    TxnTable.versions(s, mv).filter(_ <= upTo).reverse.iterator
      .map(v => (TxnTable.manifestHeaderMetric(s, mv, v,
        "mv_base_version"), v))
      .collectFirst { case (b, v) if b >= 0 =>
        (b, TxnTable.manifestHeaderMetric(s, mv, v, "mv_retarget") == 1L)
      }
      .getOrElse(throw new IllegalArgumentException(
        s"$mv: no refresh cursor in any retained commit"))

  /** The parent table of a branch directory (`<parent>/_branches/<leaf>`)
    * — what a transplanted MV's cursor speaks against. Refuses a base
    * that is not a branch dir: only branch MVs can transplant. */
  private[graft] def parentOf(base: String): String = {
    val i = base.lastIndexOf("/_branches/")
    require(i > 0 && !base.drop(i + "/_branches/".length).contains("/"),
      s"$base is not a branch directory — only an MV over a branch " +
        "can be transplanted onto a parent timeline")
    base.take(i)
  }

  /** The MV's EFFECTIVE definition at `mvVer`: after [[transplant]],
    * the base is the branch's PARENT and the cursor indexes the
    * parent's log. The `_mv` def file stays immutable (it records the
    * branch the view was created on); the retarget lives in the MV's
    * own LOG, stamped on the same commit as the cursor it applies to. */
  private[graft] def effectiveDef(s: SparkSession, mv: String, d: MvDef,
      mvVer: Long): (MvDef, Long) = {
    val (cursor, retargeted) = cursorInfoAt(s, mv, mvVer)
    (if (retargeted) d.copy(base = parentOf(d.base)) else d, cursor)
  }

  /** The newest committed value of cursor metric `metric` at or below
    * MV version `upTo` — the generalized cursor walk (join MVs keep TWO
    * cursors: the fact's `mv_base_version` and the dim's
    * `mv_dim_version`, always stamped together by one commit). */
  private[graft] def cursorAt(s: SparkSession, mv: String,
      upTo: Long, metric: String): Long =
    TxnTable.versions(s, mv).filter(_ <= upTo).reverse.iterator
      // header-only metric read per step (−1 = absent; cursors are
      // ≥ 0): the walk costs O(headers), never O(entries) manifest
      // parses, however many maintenance commits interleave
      .map(v => TxnTable.manifestHeaderMetric(s, mv, v, metric))
      .collectFirst { case b if b >= 0 => b }
      .getOrElse(throw new IllegalArgumentException(
        s"$mv: no refresh cursor ($metric) in any retained commit"))

  /** Base ops with NO row-content change — a feed-less commit of one of
    * these is safe to skip when folding a version range; the list is
    * the actual commit-op vocabulary (TxnTable's `op = "..."` sites),
    * layout/stats maintenance plus metadata-only schema additions.
    * `rename` is deliberately absent: renaming the MV's key or value
    * column would break the definition — refuse loudly instead.
    * Everything else without a feed refuses (see object doc). */
  private val ContentInvariantOps = Set("compact", "compact_range",
    "recluster", "reindex", "zorder", "rewrite_tombstones",
    "build_bloom", "constraint", "evolve", "widen",
    // an MV's cursor-advance commit (content-invariant range): entries
    // carried verbatim by construction — a CHAINED view walking this
    // MV's log must skip it, not refuse
    "mv_refresh")

  /** Create the MV: ONE full compute of the aggregate at the base's
    * current version — the last time the base is ever scanned. The MV
    * commits range-clustered and stat-indexed on integral keys so
    * every later refresh merge can file-prune (string keys index via
    * the truncated string stats). */
  def create(s: SparkSession, mv: String, base: String, key: String,
      value: String): Long = create(s, mv, base, Seq(key), value)

  /** Aggregates the fold can answer: `count`/`sum` ARE the fold,
    * `avg` derives at rewrite time (total / nn — no new state). MIN and
    * MAX are declared-and-REFUSED: a delete of the group's current
    * extreme cannot be folded from the feed alone (the new extreme
    * lives in rows the feed never mentions) — maintaining them
    * incrementally under deletes requires a group rescan, which is
    * exactly the cost an MV exists to avoid. Loud beats a silently
    * wrong or silently expensive view. */
  private def validateShape(keys: Seq[String], aggs: Seq[String]): Unit = {
    require(keys.nonEmpty, "MV needs at least one grouping key")
    // an empty declaration would create a view that refreshes normally
    // but can never serve ANY rewrite — silently useless; the declared-
    // aggregate contract refuses loudly everywhere else, so here too
    require(aggs.nonEmpty, "MV needs at least one declared aggregate " +
      "(count, sum, avg) — an MV no query can be served from is a bug " +
      "at the call site, not a view")
    aggs.map(_.toLowerCase).foreach {
      case "count" | "sum" | "avg" => ()
      case a @ ("min" | "max") => throw new IllegalArgumentException(
        s"MV cannot maintain ${a.toUpperCase} incrementally: deleting " +
          "a group's current extreme cannot be folded from the change " +
          "feed (the new extreme lives in rows the feed never " +
          "mentions) — recompute the aggregate directly, or drop + " +
          "create the MV per refresh")
      case other => throw new IllegalArgumentException(
        s"unsupported MV aggregate '$other' (count, sum and avg fold " +
          "incrementally)")
    }
    keys.foreach { key =>
      // 'w' included: the refresh merge publishes its own signed feed,
      // whose sign column would clobber a key of that name
      require(!Seq("n", "nn", "total", "op", "w").contains(key),
        s"MV key column '$key' collides with the MV's own columns")
      require(!key.contains(","),
        s"MV key column '$key' contains a comma (the _mv definition's " +
          "key separator)")
    }
    require(keys.distinct.size == keys.size,
      s"MV keys repeat a column: ${keys.mkString(", ")}")
  }

  /** The lossless-fold gate: a value type whose cast into the exact
    * DECIMAL(18,2) fold can ROUND (float/double, scale > 2) or overflow
    * 16 integer digits would make the MV — and the transparent rewrite
    * serving from it — silently answer different SUMs than the base
    * scan. Refuse at create: correctness beats acceleration. (Integral
    * types are exact; a Long sum overflowing 16 digits fails LOUDLY at
    * fold time under ANSI, never silently.) */
  private def validateValueType(value: String,
      dt: org.apache.spark.sql.types.DataType): Unit = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType => ()
    case d: DecimalType if d.scale <= 2 &&
      d.precision - d.scale <= 16 => ()
    case other => throw new IllegalArgumentException(
      s"MV value column '$value' is $other, not losslessly " +
        "representable in the DECIMAL(18,2) fold — an incremental MV " +
        "over it would drift from the base; use an exact column " +
        "(integral, or decimal with scale <= 2 and <= 16 integer " +
        "digits) or recompute the aggregate directly")
  }

  /** One full compute of the (n, nn, total) fold of `src`, committed as
    * the MV's version 0, range-clustered and stat-indexed on the keys
    * so every later refresh merge can file-prune.
    *
    * The fold column is DECIMAL(18,2) EXACTLY: sum() widens its input
    * (18,2 → 28,2), and letting the widened type into the committed
    * schema would make every refresh (which writes 18,2) drift from
    * carried files — pin it at create so create and refresh agree.
    * `nn` counts NON-NULL values: total folds NULLs as 0 (what the
    * signed algebra needs to telescope), and nn is what lets a reader
    * — the transparent rewrite especially — reconstruct the
    * null-skipping SQL semantics (an all-NULL group is nn == 0 with
    * total 0, which SUM must surface as NULL) and answer COUNT(value) */
  /** The key columns the manifest can stat-index SOUNDLY, by type:
    * strings carry string bounds; integral types carry long boxes +
    * NDV sketches; NARROW DECIMALS (integral part fits a long) carry
    * floor/ceil-WIDENED long boxes — a sound superset the stats choke
    * point produces (TxnTable.statGroupsByFile), so a value-grain MV
    * keyed on a money column (price, cents, score) range-prunes its
    * own files. Anything else (double/float — NaN poisons the box
    * algebra — or a wide decimal) CLUSTERS but carries no stats:
    * per-entry skipping is conservative, an unindexed key never
    * mis-prunes, it just reads. */
  private def indexableKeys(schema: org.apache.spark.sql.types
      .StructType, keys: Seq[String]): (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.types._
    val strKeys = keys.filter(k => schema(k).dataType == StringType)
    val intKeys = keys.filter(k => schema(k).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case d: DecimalType => d.precision - d.scale <= 18
      case _ => false
    })
    (intKeys, strKeys)
  }

  private def commitMvRows(s: SparkSession, mv: String, src: DataFrame,
      keys: Seq[String], value: String,
      metrics: Seq[(String, Long)]): Long = {
    val rows = src.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"),
      count(col(value)).as("nn"),
      sum(coalesce(col(value).cast(D18), lit(0).cast(D18)))
        .cast(D18).as("total"))
    val (intKeys, strKeys) = indexableKeys(src.schema, keys)
    val clustered = rows.repartitionByRange(8, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
    val staged = TxnTable.stageIndexed(s, mv, clustered, intKeys, strKeys)
    TxnTable.commit(s, mv, staged, expected = -1L,
      op = "mv_create", schemaJson = rows.schema.json,
      idxCols = intKeys, strIdxCols = strKeys, metrics = metrics)
  }

  def create(s: SparkSession, mv: String, base: String,
      keys: Seq[String], value: String,
      aggs: Seq[String] = Seq("count", "sum", "avg")): Long =
    create(s, mv, base, keys, value, aggs, pred = None)

  /** [[create]] of a PARTIAL view: only base rows satisfying `pred`
    * (row-local SQL over the base's columns — `price > 100`) fold.
    * The predicate must be DETERMINISTIC and subquery-free: membership
    * is decided per row at fold time, and a nondeterministic predicate
    * would make −old/+new pairs disagree with the rows the view
    * actually holds — refuse at create, the one honest moment. */
  def create(s: SparkSession, mv: String, base: String,
      keys: Seq[String], value: String, aggs: Seq[String],
      pred: Option[String]): Long = {
    validateShape(keys, aggs)
    val bv = TxnTable.currentVersion(s, base)
    val snap = TxnTable.snapshot(s, base, bv)
    validateValueType(value, snap.schema(value).dataType)
    pred.foreach(validatePartialPred(snap, _, "the base"))
    val src = pred.fold(snap)(snap.filter)
    val v = commitMvRows(s, mv, src, keys, value,
      Seq("mv_base_version" -> bv))
    writeDef(s, mv, MvDef(base, keys, value,
      aggs.map(_.toLowerCase).toSet, pred))
    v
  }

  /** Validate a PARTIAL view's stored predicate against the frame it
    * must decide membership on: resolves + type-coerces there (unknown
    * columns or bad syntax refuse at create, never at the first
    * refresh), deterministic, subquery-free. `side` names the frame in
    * the refusal ("the base" for fold views, "the fact" for stars —
    * where a dim-column reference must fail to resolve, because
    * dim-dependent membership is exactly what no fact feed folds). */
  private def validatePartialPred(snap: DataFrame, p: String,
      side: String): Unit = {
    require(p.trim.nonEmpty && !p.contains("\n"),
      "a partial-view predicate must be one non-empty line")
    def firstLine(e: Throwable): String =
      Option(e.getMessage).flatMap(_.linesIterator.nextOption())
        .getOrElse(e.getClass.getSimpleName)
    val cond = try snap.filter(p).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }.getOrElse(throw new IllegalArgumentException(
      s"partial-view predicate '$p' did not analyze to a filter"))
    catch {
      // a SYNTAX error is not a resolution failure — name it as such
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        throw new IllegalArgumentException(
          s"partial-view predicate '$p' does not parse " +
            s"(${firstLine(e)})")
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"partial-view predicate '$p' does not resolve against " +
            s"$side's columns (membership must be decidable per row " +
            s"there — ${firstLine(e)})")
    }
    require(cond.deterministic, s"partial-view predicate '$p' is " +
      "nondeterministic — membership must be decidable per row, " +
      "identically at create and at every refresh")
    require(cond.collectFirst {
      case sq: org.apache.spark.sql.catalyst.expressions
        .SubqueryExpression => sq
    }.isEmpty, s"partial-view predicate '$p' contains a subquery — " +
      "its value can change with OTHER tables' content, which no " +
      "feed can fold")
  }

  /** Outcome of one refresh: the MV version (unchanged on no-op), the
    * base version now reflected, and how many base commits were
    * folded. */
  case class RefreshResult(mvVersion: Long, baseVersion: Long,
      commitsFolded: Int)

  /** Which definition kind lives at `mv` — "fold" (`_mv`), "join"
    * (`_mvj`) or "extrema" (`_mvx`); refuses loudly when none does.
    * The REFRESH MATERIALIZED VIEW dispatch. */
  private[graft] def kindOf(s: SparkSession, mv: String): String =
    if (fs(s, defPath(mv)).exists(defPath(mv))) "fold"
    else if (fs(s, joinDefPath(mv)).exists(joinDefPath(mv))) "join"
    else if (fs(s, extremaDefPath(mv)).exists(extremaDefPath(mv)))
      "extrema"
    else if (fs(s, liveDefPath(mv)).exists(liveDefPath(mv))) "live"
    else throw new IllegalArgumentException(
      s"$mv is not a materialized view (no _mv/_mvj/_mvx/_mvl " +
        "definition)")

  /** Closed per-key-column bounds a serving read may prune the MV's
    * OWN files with — a SUPERSET of the query predicate's satisfying
    * space, derived by the rewrite from its key-only conjuncts (the
    * exact predicate still applies as a residual filter, so bounds
    * only have to be sound, never tight). Empty = no prune (read every
    * MV file, today's behavior). */
  case class KeyBounds(ints: Seq[(String, Long, Long)],
      strs: Seq[(String, String, String)]) {
    def isEmpty: Boolean = ints.isEmpty && strs.isEmpty
  }
  object KeyBounds { val none: KeyBounds = KeyBounds(Nil, Nil) }

  /** The MV's own rows at `mvVer`, file-pruned from the MV's manifest
    * key stats when the caller extracted bounds — the dashboard-serving
    * read. The MV commits range-clustered and stat-indexed on its keys
    * at create AND at every refresh merge (mergeCore re-clusters the
    * rewritten region), so a key-predicated dashboard over a huge MV
    * opens only the stat-bearing files its keys can live in instead of
    * the whole view. */
  private[graft] def mvRowsAt(s: SparkSession, mv: String, mvVer: Long,
      kb: KeyBounds): DataFrame =
    if (kb.isEmpty) TxnTable.snapshot(s, mv, mvVer)
    else TxnTable.snapshotBoxed(s, mv, kb.ints, kb.strs, mvVer)._1

  def refresh(s: SparkSession, mv: String): RefreshResult =
    refresh(s, mv, publishFeed = true)

  /** `publishFeed = false` skips the refresh merge's own signed feed —
    * the view then cannot be CHAINED on ([[mvChain]]), but a
    * perf-sensitive single-level refresh saves the preimage re-read of
    * the touched MV files and the feed write. */
  def refresh(s: SparkSession, mv: String, publishFeed: Boolean)
      : RefreshResult = {
    val d0 = readDef(s, mv)
    // pin ONE MV version for the cursor, the rows AND the merge's CAS:
    // two concurrent refreshes otherwise interleave so the second folds
    // the feed tail onto rows that already include it (cursor from the
    // old head, rows from the new one) — the same TOCTOU the rewrite
    // path closes via lastRefreshedAt/compensated(mvVer). With the pin,
    // the losing refresh fails the commit CAS loudly instead.
    val mvVer = TxnTable.currentVersion(s, mv)
    // a TRANSPLANTED view refreshes against the branch's PARENT — the
    // retarget flag rides the same commit as the cursor it applies to,
    // and every later refresh re-stamps it so the pair stays atomic
    val (d, last) = effectiveDef(s, mv, d0, mvVer)
    val retargeted = d.base != d0.base
    val stamp = if (retargeted) Seq("mv_retarget" -> 1L) else Nil
    val head = TxnTable.currentVersion(s, d.base)
    require(head >= last, s"${d.base} is at version $head, behind the " +
      s"MV's cursor $last — the base was restored/recreated; recompute " +
      "the MV")
    if (head == last)
      return RefreshResult(mvVer, last, 0)
    // resolve the range's published feeds from manifests alone —
    // O(commits in range) header reads, never a base data file.
    // change_noop marks a commit that provably changed no rows
    // (verdicts touched no file, or the exact cdc feed was empty):
    // a zero-length feed, not a feed-less content change
    val refs = feedRefs(s, d.base, last, head)
    val folded = (head - last).toInt
    if (refs.isEmpty)
      return RefreshResult(advanceCursor(s, mv, mvVer,
        Seq("mv_base_version" -> head) ++ stamp), head, folded)
    // a PARTIAL view folds only the feed rows satisfying its stored
    // predicate: membership is row-local, so a −old/+new update pair
    // crossing the boundary folds as exactly the membership change
    // (fold's FUNCTION argument is strict — build the reader once)
    val feedDf = s.read.parquet(refs: _*)
    val feed = d.pred.fold(feedDf)(feedDf.filter)
    val v = foldAndMerge(s, mv, mvVer, d.keys, d.value, feed,
      Seq("mv_base_version" -> head) ++ stamp, publishFeed)
    RefreshResult(v, head, folded)
  }

  /** TRANSPLANT a branch MV onto the parent timeline after a
    * [[TxnTable.fastForward]] publish: the branch ref's invariant —
    * `branch@localBase ≡ parent@base`, maintained by branch creation,
    * fastForward and rebase alike — is the content-identity proof, so
    * a view whose cursor sits EXACTLY at the published point can start
    * speaking parent versions with ONE metadata-only commit (cursor :=
    * ref.base, `mv_retarget` stamped on the same line — a cursor value
    * is meaningless without its timeline, so the two facts are never
    * separable). A cursor behind the publish point must refresh first;
    * a branch that moved PAST the publish refuses (the parent does not
    * have those commits — re-publish, then transplant). After the
    * transplant the view serves and refreshes against the PARENT: the
    * dev dashboard follows its table into production for free. */
  def transplant(s: SparkSession, mv: String): Long = {
    // a join/extrema view has no single transplantable cursor (multiple
    // dim timelines / a recompute-bound contract) — refuse with the
    // SPECIFIC reason, not readDef's generic not-a-fold-MV message
    require(!fs(s, joinDefPath(mv)).exists(joinDefPath(mv)) &&
      !fs(s, extremaDefPath(mv)).exists(extremaDefPath(mv)) &&
      !fs(s, liveDefPath(mv)).exists(liveDefPath(mv)),
      s"$mv: transplant applies to fold MVs only — join, extrema and " +
        "live views track multiple or recompute-bound cursors; " +
        "recompute them on the parent instead")
    val d = readDef(s, mv)
    val parent = parentOf(d.base)
    val leaf = d.base.drop(parent.length + "/_branches/".length)
    val ref = TxnTable.branches(s, parent).map(_._1)
      .flatMap(n => TxnTable.branchInfo(s, parent, n))
      .find(_.leaf == leaf)
      .getOrElse(throw new IllegalArgumentException(
        s"$mv: base ${d.base} is not a live branch of $parent " +
          "(dropped branches cannot transplant — their publish point " +
          "is gone)"))
    require(ref.localBase >= 0,
      s"$mv: branch '$leaf' predates rebase support (no recorded " +
        "publish point) — recompute the MV on the parent instead")
    val mvVer = TxnTable.currentVersion(s, mv)
    val (cursor, already) = cursorInfoAt(s, mv, mvVer)
    require(!already, s"$mv: already transplanted onto $parent")
    require(cursor == ref.localBase,
      s"$mv: cursor $cursor is not the branch's published point " +
        s"${ref.localBase} — refresh the MV to the publish point " +
        "first, or (if the branch moved past the publish) fastForward " +
        "again before transplanting; the parent does not hold " +
        "unpublished branch commits")
    advanceCursor(s, mv, mvVer,
      Seq("mv_base_version" -> ref.base, "mv_retarget" -> 1L))
  }

  /** Content-invariant refresh range: advance the cursor(s) with ONE
    * metadata-only commit — entries carried verbatim from the SAME
    * pinned version, CAS at mvVer so a racing refresh loses loudly. */
  private def advanceCursor(s: SparkSession, mv: String, mvVer: Long,
      metrics: Seq[(String, Long)]): Long = {
    val m = TxnTable.manifest(s, mv, mvVer)
    TxnTable.commit(s, mv, m.entries.map(TxnTable.render), mvVer,
      op = "mv_refresh", schemaJson = m.schema.map(_.json).orNull,
      deleteLines = m.deletes, idxCols = m.idxCols,
      strIdxCols = m.strIdxCols, blooms = m.blooms,
      metrics = metrics, retired = m.retired, checks = m.checks)
  }

  /** Resolve the published-feed refs for base commits `(last, head]` —
    * THE single site encoding which commits count (published feeds,
    * content-invariant ops, change_noop markers): refresh, the join
    * refresh, and both compensation paths all read this contract here,
    * so they can never diverge on the same log. Left = why the range
    * cannot be folded; Right = every feed ref in the range. NO data or
    * file-existence I/O here — this runs on the OPTIMIZER path, where
    * a vacuumed feed already falls through safely (the served plan's
    * parquet resolution throws inside the rule's NonFatal guard). */
  private[graft] def feedRefsE(s: SparkSession, base: String, last: Long,
      head: Long): Either[String, Seq[String]] = {
    // short-circuit at the FIRST feed-less content change: this runs
    // on the optimizer path, and a cursor 1000 commits behind a
    // feed-less write must cost one manifest read, not 1000
    val acc = Seq.newBuilder[String]
    var bad: Option[String] = None
    val it = (last + 1 to head).iterator
    while (bad.isEmpty && it.hasNext) {
      val v = it.next()
      val m = TxnTable.manifest(s, base, v)
      // through pathFor: an ABSOLUTE feed ref (clone/branch lineage)
      // must resolve verbatim, exactly as the lenient CDC reader and
      // every data-entry read resolve it — "$base/$abs" would 404
      if (m.cdcRefs.nonEmpty)
        acc ++= m.cdcRefs.map(r => TxnTable.pathFor(base, r))
      else if (ContentInvariantOps(m.op) ||
        m.metrics.get("change_noop").contains(1L)) ()
      else bad = Some(s"$base version $v ('${m.op}') changed content " +
        "without publishing a change feed; incremental refresh cannot " +
        "cover it — recompute the MV (drop + create), or write " +
        "through the cdc-publishing paths")
    }
    bad.toLeft(acc.result())
  }

  /** [[feedRefsE]] for the REFRESH paths, where failure must be loud:
    * a feed-less content change refuses, and so does a feed swept by
    * expire_snapshots + vacuum (one existence probe per feed dir —
    * O(commits in range) metadata RPCs, paid on refresh only, never on
    * the query-planning path, where all feeds existing is the common
    * case and a missing one falls through via the rule's guard). */
  private[graft] def feedRefs(s: SparkSession, base: String, last: Long,
      head: Long): Seq[String] =
    feedRefsE(s, base, last, head) match {
      case Right(refs) =>
        refs.find(r => !fs(s, new Path(r)).exists(new Path(r))) match {
          case Some(gone) => throw new IllegalArgumentException(
            s"$base: feed $gone was vacuumed (expire_snapshots " +
              "dropped a version this MV's cursor still needs) — " +
              "recompute the MV (drop + create), and refresh more " +
              "often than the base's retention window")
          case None => refs
        }
      case Left(msg) => throw new IllegalArgumentException(msg)
    }

  /** The shared refresh tail: fold a signed frame (`keys…, value, w`)
    * into the MV pinned at `mvVer`, as ONE CAS-guarded merge commit
    * carrying the cursor metrics. */
  private def foldAndMerge(s: SparkSession, mv: String, mvVer: Long,
      keys: Seq[String], value: String, feed: DataFrame,
      metrics: Seq[(String, Long)], publishFeed: Boolean): Long = {
    // the signed fold: per group, dn = Σw, dnn = Σw over non-null
    // values, dtotal = Σ(w·value); a key appearing in several feeds
    // telescopes here, in ONE aggregate
    val delta = feed.groupBy(keys.map(col): _*).agg(
      sum(col("w").cast("long")).as("dn"),
      sum(col("w").cast("long") *
        when(col(value).isNull, 0L).otherwise(1L)).as("dnn"),
      sum(col("w") * coalesce(col(value).cast(D18), lit(0).cast(D18)))
        .cast(D18).as("dtotal"))
      .filter(col("dn") =!= 0 || col("dnn") =!= 0 || col("dtotal") =!= 0)
    // merge into the PINNED MV rows: the join output is delta-sized;
    // the MV scan is O(MV) — never O(base). The delta side (touched
    // groups only) is the small one by construction, but a left-outer
    // join preserving it cannot broadcast it (outer side ≠ build side),
    // so the old delta-left formulation shuffled BOTH sides. Instead:
    // (1) semi-join the MV against the broadcast delta keys — the MV
    // streams once with zero shuffle and only the TOUCHED groups
    // survive, then (2) left-outer the delta against that delta-sized
    // survivor set, broadcast too. Two broadcast hash joins, no
    // exchange anywhere on the MV side (guide §3.1).
    val mvCur = TxnTable.snapshot(s, mv, mvVer)
    def keyCond(a: String, b: String) =
      keys.map(k => col(s"$a.$k") <=> col(s"$b.$k")).reduce(_ && _)
    val mvTouched = mvCur.alias("t")
      .join(broadcast(delta.select(keys.map(col): _*).alias("k")),
        keyCond("t", "k"), "left_semi")
    val merged = delta.alias("d")
      .join(broadcast(mvTouched.alias("m")), keyCond("d", "m"),
        "left_outer")
      .select(keys.map(k => col(s"d.$k").as(k)) ++ Seq(
        (coalesce(col("m.n"), lit(0L)) + col("dn")).as("n"),
        (coalesce(col("m.nn"), lit(0L)) + col("dnn")).as("nn"),
        (coalesce(col("m.total"), lit(0).cast(D18)) + col("dtotal"))
          .cast(D18).as("total")): _*)
    // pin the WHOLE change set once: the delta pipeline (feed scan →
    // signed fold → merge join against the MV snapshot) otherwise
    // re-executes for every downstream action — the null-key guard plus
    // mergeCore's keys/adds materializations ran it three times,
    // measured 35 jobs per refresh at sf0.1 (Probe mvbench). One
    // delta-sized materialization; every consumer below reads the
    // pinned blocks.
    val changeSet = merged.withColumn("op",
      when(col("n") === 0L, lit("D")).otherwise(lit("U")))
      .localCheckpoint(true)
    // a NULL grouping-key group cannot be addressed by the keyed merge
    // (the anti-join is plain SQL equality — the old null-key row would
    // SURVIVE while its replacement inserts, silently duplicating the
    // group on every refresh). LOUD beats silent corruption; null-keyed
    // groups are a recompute-only shape. One delta-sized pass.
    if (changeSet.filter(keys.map(col(_).isNull).reduce(_ || _))
        .limit(1).count() > 0)
      throw new IllegalArgumentException(
        s"$mv: the delta touches a NULL grouping-key group, which the " +
          "keyed refresh merge cannot address — recompute the MV " +
          "(drop + create)")
    // the refresh merge publishes ITS OWN signed feed: a refreshed MV
    // is a feeding base like any other, so views stack into pipelines
    // (mv over mv — per-level refresh stays O(that level's delta)).
    // A legacy view keyed 'w' (reserved only since the feed existed)
    // skips publication gracefully instead of bricking at refresh.
    val cdc = publishFeed && !changeSet.columns.contains("w")
    TxnTable.applyChangesWithMetrics(s, mv, changeSet, keys,
      metrics, cdc = cdc, expectedVer = mvVer, pinned = true).version
  }

  /** STALE-MV DELTA COMPENSATION — the query-time half of [[refresh]]'s
    * fold algebra: the MV snapshot ⊕ the base's signed-feed tail
    * (cursor, head], as ONE plan the rewrite rule can substitute for
    * the base aggregate. Some(df) when every content-changing commit in
    * the tail published a feed (the exact walk refresh performs — refs
    * resolve from manifest headers alone); None when any tail commit is
    * feed-less, in which case the rewrite must fall through to the base
    * scan. Cost is O(MV) + O(changes since the cursor) at ANY base
    * size — without this, ONE commit after a refresh sends the
    * dashboard query back to the full base scan, which at 100 TB is the
    * MV's entire value gone the moment a row lands. Output columns are
    * exactly the MV's (key, n, nn, total), so the substitution logic is
    * shared verbatim with the fresh-serve path; groups whose compensated
    * count reaches 0 leave, mirroring refresh's op-'D' rule. */
  private[graft] def compensated(s: SparkSession, mv: String, d: MvDef,
      cursor: Long, head: Long, mvVer: Long,
      kb: KeyBounds = KeyBounds.none): Option[DataFrame] = {
    // the MV rows come from the SAME pinned version the cursor was read
    // at: snapshot-at-head here would double-count a feed tail that a
    // concurrent refresh folded between the caller's two reads
    val mvRows = mvRowsAt(s, mv, mvVer, kb)
      .select((d.keys.map(col) ++
        Seq(col("n"), col("nn"), col("total"))): _*)
    if (cursor == head) return Some(mvRows)
    // feed-less content change in the tail → cannot compensate
    val refs = feedRefsE(s, d.base, cursor, head)
      .getOrElse(return None)
    if (refs.isEmpty) return Some(mvRows) // content-invariant tail
    // the same signed algebra as refresh's delta, rendered as fold ROWS
    // (w, w·nonnull, w·value) so one union + one aggregate telescopes
    // the MV and however many feeds the tail carries — a PARTIAL
    // view's stored predicate gates the tail rows exactly like refresh
    val feedDf = s.read.parquet(refs: _*)
    val feed = d.pred.fold(feedDf)(feedDf.filter)
      .select(d.keys.map(col) ++ Seq(
      col("w").cast("long").as("n"),
      (col("w").cast("long") *
        when(col(d.value).isNull, 0L).otherwise(1L)).as("nn"),
      (col("w") * coalesce(col(d.value).cast(D18), lit(0).cast(D18)))
        .cast(D18).as("total")): _*)
    Some(mvRows.unionByName(feed).groupBy(d.keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("nn")).as("nn"),
        sum(col("total")).cast(D18).as("total"))
      .filter(col("n") =!= 0L))
  }

  // ---- JOIN MATERIALIZED VIEWS ---------------------------------------------

  /** A materialized aggregate OVER A JOIN — the q03/q06 dashboard shape
    * (fact ⋈ dim, GROUP BY dim attributes, aggregate a fact measure).
    * The honest incremental contract: FACT-side changes fold from the
    * fact's published signed feeds (each feed row joins to the dim to
    * find its group — the dim is the lookup the fold algebra needs);
    * ANY dim-side content change past the MV's dim cursor REFUSES
    * refresh and disqualifies serving (a changed dim attribute moves
    * whole groups in ways no fact feed mentions — recompute is the only
    * sound answer, and loud beats silent). Dim maintenance commits
    * (compact/zorder/…) are content-invariant and advance the dim
    * cursor for free. `keys` are DIM columns; `value` is a FACT column;
    * fact rows whose key has no dim match fold to nothing — exactly the
    * inner join's semantics. */
  /** One dimension of a star-join MV: the dim table's location and the
    * fact→dim equality it joins on. */
  case class MvDimRef(dim: String, factKey: String, dimKey: String)

  /** The star definition: fact ⋈ dim_0 ⋈ … ⋈ dim_{n-1}, each dim on its
    * own equality, grouping keys drawn from the dims (each key column
    * must be unique across the dims so ownership is unambiguous —
    * validated at create, re-resolved via [[keyOwnership]] where the
    * enrichment join needs the owning alias). */
  /** `pred`: a PARTIAL star view's stored membership rule — a
    * deterministic, subquery-free predicate over FACT columns only
    * (fact-side membership is row-local on the fact log, so it folds
    * exactly like the single-table partial view: filter the create
    * scan and every fact feed, and filter the re-grouped fact slice in
    * each dim-delta term; a DIM-side predicate would change fact-row
    * membership when the dim moves — no fact feed mentions that — so
    * create refuses it). */
  case class MvJoinDef(fact: String, dims: Seq[MvDimRef],
      keys: Seq[String], value: String, aggs: Set[String],
      pred: Option[String] = None)

  private def joinDefPath(mv: String) = new Path(s"$mv/_mvj")

  /** The multi-dim star definition LINE PROTOCOL — ONE render/parse
    * pair shared by `_mvj` (no trailing lines) and `_mvl` (one
    * trailing grain line), so a future format change can never
    * silently diverge the two kinds: fact, #dims,
    * (dim TAB factKey TAB dimKey)*, keys, value, aggs, trailing*. */
  private def renderStarDef(d: MvJoinDef, trailing: Seq[String])
      : String =
    (Seq(d.fact, d.dims.size.toString) ++
      d.dims.map(r => s"${r.dim}\t${r.factKey}\t${r.dimKey}") ++
      Seq(d.keys.mkString(","), d.value,
        d.aggs.toSeq.sorted.mkString(",")) ++ trailing)
      .mkString("", "\n", "\n")

  private def parseStarDef(mv: String, kindFile: String,
      lines: Seq[String], minTrailing: Int, maxTrailing: Int)
      : (MvJoinDef, Seq[String]) =
    lines match {
      case fact +: nStr +: rest if nStr.toIntOption.isDefined =>
        val n = nStr.toInt
        require(rest.size >= n + 3 + minTrailing &&
          rest.size <= n + 3 + maxTrailing,
          s"$mv: malformed $kindFile definition " +
            s"(${lines.size} lines for $n dims)")
        val dims = rest.take(n).map { l =>
          val ps = l.split('\t')
          require(ps.length == 3,
            s"$mv: malformed $kindFile dim line '$l'")
          MvDimRef(ps(0), ps(1), ps(2))
        }
        val Seq(keys, value, aggs) = rest.slice(n, n + 3)
        require(aggs.nonEmpty, s"$mv: malformed $kindFile definition " +
          "(empty declared-aggregate line)")
        val trailing = rest.drop(n + 3)
        // a BLANK trailing line is corruption (a stray newline from a
        // partial write or hand edit), not an empty predicate/grain —
        // parsing it as one would silently disable the rewrite and
        // crash refresh with an unrelated parse error later
        trailing.foreach(t => require(t.trim.nonEmpty,
          s"$mv: malformed $kindFile definition (blank trailing line)"))
        (MvJoinDef(fact, dims, keys.split(',').toSeq, value,
          aggs.split(',').toSet), trailing)
      case other => throw new IllegalArgumentException(
        s"$mv: malformed $kindFile definition (${other.size} lines)")
    }

  private def writeDefFile(s: SparkSession, p: Path, content: String)
      : Unit = {
    val out = fs(s, p).create(p, false)
    try out.write(content
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readDefFile(s: SparkSession, p: Path): Seq[String] = {
    val in = fs(s, p).open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.linesIterator.toSeq
  }

  private def writeJoinDef(s: SparkSession, mv: String, d: MvJoinDef)
      : Unit =
    // a PARTIAL star stores its predicate as the one trailing line —
    // full views keep the trailing-free format unchanged on disk
    writeDefFile(s, joinDefPath(mv), renderStarDef(d, d.pred.toSeq))

  def readJoinDef(s: SparkSession, mv: String): MvJoinDef = {
    val p = joinDefPath(mv)
    require(fs(s, p).exists(p), s"$mv is not a join materialized view " +
      "(no _mvj definition; create it with MatView.createJoin)")
    readDefFile(s, p) match {
      // the legacy 7-line single-dim format (line 2 a path, not an
      // integer) still parses
      case Seq(fact, dim, fk, dk, keys, value, aggs)
          if dim.toIntOption.isEmpty =>
        require(aggs.nonEmpty, s"$mv: malformed _mvj definition " +
          "(empty declared-aggregate line)")
        MvJoinDef(fact, Seq(MvDimRef(dim, fk, dk)),
          keys.split(',').toSeq, value, aggs.split(',').toSet)
      case lines =>
        val (d, trailing) = parseStarDef(mv, "_mvj", lines, 0, 1)
        d.copy(pred = trailing.headOption)
    }
  }

  /** key column → owning side, validated unique across the FACT and
    * every dim: −1 = the fact owns it (the q03 "GROUP BY a fact
    * attribute over fact ⋈ dim" shape — r19), 0.. = that dim. A key
    * living on several sides is ambiguous and refuses. */
  private def keyOwnership(s: SparkSession, d: MvJoinDef)
      : Map[String, Int] = {
    val factCols = TxnTable.snapshot(s, d.fact).columns.toSet
    val dimCols: Seq[Set[String]] = d.dims.map(r =>
      TxnTable.snapshot(s, r.dim).columns.toSet)
    d.keys.map { k =>
      val owners = (if (factCols.contains(k)) Seq(-1) else Nil) ++
        dimCols.zipWithIndex.collect {
          case (cs, i) if cs.contains(k) => i }
      require(owners.size == 1, s"join-MV key '$k' must live in exactly " +
        s"one of the fact and the dims (found in ${owners.size})")
      k -> owners.head
    }.toMap
  }

  /** The per-dim cursor metric name: dim 0 keeps the original
    * `mv_dim_version` (single-dim views are unchanged on disk), later
    * dims suffix their index. */
  private[graft] def dimCursorMetric(i: Int): String =
    if (i == 0) "mv_dim_version" else s"mv_dim_version_$i"

  /** Single-dim [[createJoinStar]] — the common star has one dim. */
  def createJoin(s: SparkSession, mv: String, fact: String, dim: String,
      factKey: String, dimKey: String, keys: Seq[String], value: String,
      aggs: Seq[String] = Seq("count", "sum", "avg")): Long =
    createJoinStar(s, mv, fact, Seq(MvDimRef(dim, factKey, dimKey)),
      keys, value, aggs)

  /** Create the star MV: ONE full compute of fact ⋈ dims at every
    * table's current version — the last time any is scanned whole. The
    * fact cursor and one cursor PER DIM ride the create commit's
    * metrics, so refresh/serve freshness is decided by the logs alone. */
  def createJoinStar(s: SparkSession, mv: String, fact: String,
      dims: Seq[MvDimRef], keys: Seq[String], value: String,
      aggs: Seq[String] = Seq("count", "sum", "avg")): Long =
    createJoinStar(s, mv, fact, dims, keys, value, aggs, pred = None)

  /** [[createJoinStar]] of a PARTIAL star: only fact rows satisfying
    * `pred` (row-local SQL over FACT columns — `price > 100`) fold.
    * Validated against the FACT snapshot alone: a dim-column reference
    * refuses — dim-dependent membership moves when the dim moves, and
    * no fact feed mentions that. */
  def createJoinStar(s: SparkSession, mv: String, fact: String,
      dims: Seq[MvDimRef], keys: Seq[String], value: String,
      aggs: Seq[String], pred: Option[String]): Long = {
    validateShape(keys, aggs)
    require(dims.nonEmpty, "a join MV needs at least one dim")
    require(dims.map(_.dim).distinct.size == dims.size,
      "join-MV dims repeat a table")
    // a self-star (fact as its own dim) would refuse refresh FOREVER:
    // any fact commit moves the "dim" head with a non-invariant op —
    // an MV no change can ever refresh is a bug at the call site
    require(!dims.exists(_.dim == fact),
      "join-MV dims must not include the fact table itself — every " +
        "fact commit would trip the dim-content refusal and the view " +
        "could never refresh")
    val fv = TxnTable.currentVersion(s, fact)
    val dvs = dims.map(r => TxnTable.currentVersion(s, r.dim))
    val fsnap0 = TxnTable.snapshot(s, fact, fv)
    validateValueType(value, fsnap0.schema(value).dataType)
    pred.foreach(validatePartialPred(fsnap0, _, "the fact"))
    val fsnap = pred.fold(fsnap0)(fsnap0.filter)
    val d0 = MvJoinDef(fact, dims, keys, value,
      aggs.map(_.toLowerCase).toSet, pred)
    val owner = keyOwnership(s, d0) // validates keys live in the dims
    // aliased N-sided select: grouping columns may share names with
    // fact columns without ambiguity
    val joined = dims.zipWithIndex.foldLeft(fsnap.alias("f")) {
      case (acc, (r, i)) =>
        acc.join(TxnTable.snapshot(s, r.dim, dvs(i)).alias(s"d$i"),
          col(s"f.${r.factKey}") === col(s"d$i.${r.dimKey}"))
    }.select(keys.map(k =>
      (if (owner(k) < 0) col(s"f.$k") else col(s"d${owner(k)}.$k"))
        .as(k)) :+
      col(s"f.$value").as(value): _*)
    val v = commitMvRows(s, mv, joined, keys, value,
      ("mv_base_version" -> fv) +:
        dvs.zipWithIndex.map { case (dv, i) => dimCursorMetric(i) -> dv })
    writeJoinDef(s, mv, d0)
    v
  }

  /** True iff every commit in `(from, to]` of `table` provably changed
    * no row content — maintenance ops, or changes marked change_noop. */
  private def contentInvariantRange(s: SparkSession, table: String,
      from: Long, to: Long): Boolean =
    (from + 1 to to).forall { v =>
      val m = TxnTable.manifest(s, table, v)
      ContentInvariantOps(m.op) ||
        m.metrics.get("change_noop").contains(1L)
    }

  def refreshJoin(s: SparkSession, mv: String): RefreshResult =
    refreshJoin(s, mv, publishFeed = true)

  /** Chain-join a fact-rowed frame (alias "f") to every dim at the
    * given versions and project the grouping keys (from their owning
    * aliases) plus `extra` fact-side columns. The inner joins drop
    * unmatched fact keys — exactly the base join's semantics — and the
    * result is feed-sized ⋈ dims, never O(fact). Key ownership resolves
    * against the SAME pinned snapshots being joined (one construction
    * each), so a dim schema drift since create refuses with its own
    * message instead of a misleading create-time one. */
  /** Key-column → owning-side-index (−1 = fact) against the FRAMES
    * BEING JOINED — the refresh-time twin of the create-time
    * [[keyOwnership]], shared by [[enrichWithDims]] and
    * [[dimDeltaTerm]] so the drift contract (message, uniqueness rule)
    * can never diverge between them. `colsOf(-1)` answers the
    * fact-side frame's columns. */
  private def resolveOwners(d: MvJoinDef, colsOf: Int => Seq[String])
      : Map[String, Int] =
    d.keys.map { k =>
      val dimOwners = d.dims.indices.filter(i => colsOf(i).contains(k))
      val inFact = colsOf(-1).contains(k)
      // fact + exactly one dim: the DIM owns it — that is the only
      // binding a CREATE ever accepted (pre-r19 creates validated keys
      // against dims alone, and the r19 create refuses this shape as
      // ambiguous), so a legacy view whose fact happens to share a dim
      // key's name keeps refreshing instead of being bricked by an
      // upgrade
      val owner = (inFact, dimOwners) match {
        case (_, Seq(i)) => i
        case (true, Seq()) => -1
        case _ => throw new IllegalArgumentException(
          s"join-MV key '$k' no longer lives in exactly one of the " +
            s"fact and the dims (${dimOwners.size} dims" +
            s"${if (inFact) " + the fact" else ""} — the schemas " +
            "drifted since create); recompute the MV (drop + create)")
      }
      k -> owner
    }.toMap

  /** The owning alias' key column: `f` for a fact-owned key, `d<i>`
    * for a dim-owned one. */
  private def keyCol(owner: Map[String, Int], k: String)
      : org.apache.spark.sql.Column =
    if (owner(k) < 0) col(s"f.$k") else col(s"d${owner(k)}.$k")

  private def enrichWithDims(s: SparkSession, d: MvJoinDef,
      feed: DataFrame, dimVers: Seq[Long],
      extra: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val dimSnaps = d.dims.indices.map(i =>
      TxnTable.snapshot(s, d.dims(i).dim, dimVers(i)))
    val owner = resolveOwners(d, i =>
      if (i < 0) feed.columns.toSeq else dimSnaps(i).columns.toSeq)
    d.dims.indices.foldLeft(feed.alias("f")) { (acc, i) =>
      acc.join(dimSnaps(i).alias(s"d$i"),
        col(s"f.${d.dims(i).factKey}") === col(s"d$i.${d.dims(i).dimKey}"))
    }.select(d.keys.map(k => keyCol(owner, k).as(k)) ++ extra: _*)
  }

  /** Incremental refresh of a star MV: fold the FACT's signed-feed tail
    * — each feed row joined to the dim snapshots to recover its group —
    * into the MV, and fold each DIM's signed-feed tail (the SCD type-1
    * shape: a dim attribute update moves whole groups) by re-grouping
    * the key-pruned fact slice the changed dim rows touch. A dim
    * content change WITHOUT a published feed still refuses with the
    * recompute remedy — the fold needs the −pre/+post rows.
    *
    * The exact telescoping, for fact F and dims D₁…Dₙ between cursors
    * c and heads h (ΔX = X@h − X@c as signed rows):
    *
    *   Δ(F⋈D₁⋈…⋈Dₙ) = ΔF ⋈ D₁@h ⋈ … ⋈ Dₙ@h
    *                + Σᵢ F@c ⋈ D₁@c ⋈ … ⋈ Dᵢ₋₁@c ⋈ ΔDᵢ ⋈ Dᵢ₊₁@h ⋈ … ⋈ Dₙ@h
    *
    * — each dim's delta term joins earlier dims at their CURSOR and
    * later dims at HEAD, so simultaneous multi-table movement folds
    * without double counting. The fact slice in every dim term is
    * pinned at the FACT CURSOR (ΔF is already accounted by the first
    * term) and pruned to the changed dim keys via manifest key stats
    * ([[TxnTable.snapshotRange]] point probes when few keys; a
    * broadcast left-semi join otherwise) — the `mv_scd_files_kept/
    * total` metrics on the refresh commit carry the prune evidence.
    * Cost is O(fact changes ⋈ dims) + O(dim changes ⋈ touched fact
    * files) + O(MV) — never O(fact). */
  def refreshJoin(s: SparkSession, mv: String, publishFeed: Boolean)
      : RefreshResult = {
    val d = readJoinDef(s, mv)
    // same one-version pin as refresh: cursors, rows and the merge CAS
    // all read MV state at mvVer, so racing refreshes fail loudly
    val mvVer = TxnTable.currentVersion(s, mv)
    val last = cursorAt(s, mv, mvVer, "mv_base_version")
    val dimCurs = d.dims.indices.map(i =>
      cursorAt(s, mv, mvVer, dimCursorMetric(i)))
    val head = TxnTable.currentVersion(s, d.fact)
    val dimHeads = d.dims.map(r => TxnTable.currentVersion(s, r.dim))
    require(head >= last, s"${d.fact} is at version $head, behind the " +
      s"MV's cursor $last — the fact was restored/recreated; recompute " +
      "the MV")
    // per-dim feed refs straight from THE single site (feedRefsE via
    // feedRefs): a content-invariant tail resolves to Nil (cursor
    // advances for free), a cdc tail to its signed refs, and a
    // feed-less content change refuses loudly inside feedRefs — the
    // honest remainder of the old blanket dim refusal. One manifest
    // walk per dim, no separate invariance pre-pass.
    val dimFeedRefs: Seq[Seq[String]] = d.dims.indices.map { i =>
      require(dimHeads(i) >= dimCurs(i), s"${d.dims(i).dim} is at " +
        s"version ${dimHeads(i)}, behind the MV's dim cursor " +
        s"${dimCurs(i)} — the dim was restored/recreated; recompute " +
        "the MV")
      feedRefs(s, d.dims(i).dim, dimCurs(i), dimHeads(i))
    }
    if (head == last && dimHeads == dimCurs)
      return RefreshResult(mvVer, last, 0)
    val refs = feedRefs(s, d.fact, last, head)
    val folded = (head - last).toInt
    val metrics = ("mv_base_version" -> head) +:
      dimHeads.zipWithIndex.map { case (h, i) => dimCursorMetric(i) -> h }
    val factTerm =
      if (refs.isEmpty) None
      // a PARTIAL star folds only the feed rows satisfying its stored
      // predicate — row-local, so a −old/+new pair crossing the
      // boundary folds as exactly the membership change it is (the
      // fold view's rule, verbatim)
      else {
        val feedDf = s.read.parquet(refs: _*)
        Some(enrichWithDims(s, d, d.pred.fold(feedDf)(feedDf.filter),
          dimHeads, Seq(col(s"f.${d.value}").as(d.value), col("f.w"))))
      }
    // prune accounting across the dim terms: kept = fact-file READS
    // the point probes performed (a file shared by two probes counts
    // twice — the true read cost), total = the fact-file count a naive
    // full-slice scan would read once per changed dim (the cost the
    // probes avoid). kept < total is the "cheaper than a full scan"
    // evidence; −1/−1 reports the broadcast-semi-join fallback.
    var keptSum = 0L; var totalSum = 0L; var unpruned = false
    val dimTerms = d.dims.indices.flatMap { i =>
      if (dimFeedRefs(i).isEmpty) None
      else {
        val (term, kept, total) = dimDeltaTerm(s, d, i, dimFeedRefs(i),
          last, dimCurs, dimHeads)
        if (kept < 0) unpruned = true
        else { keptSum += kept; totalSum += total }
        Some(term)
      }
    }
    val terms = factTerm.toSeq ++ dimTerms
    if (terms.isEmpty)
      // content-invariant range on EVERY side
      return RefreshResult(advanceCursor(s, mv, mvVer, metrics), head,
        folded)
    val scdMetrics =
      if (dimTerms.isEmpty) Nil
      else if (unpruned) Seq("mv_scd_files_kept" -> -1L,
        "mv_scd_files_total" -> -1L)
      else Seq("mv_scd_files_kept" -> keptSum,
        "mv_scd_files_total" -> totalSum)
    val v = foldAndMerge(s, mv, mvVer, d.keys, d.value,
      terms.reduce(_ unionByName _), metrics ++ scdMetrics, publishFeed)
    RefreshResult(v, head, folded)
  }

  /** One dim's delta term of the star telescoping: the fact slice at
    * the FACT CURSOR whose `factKey` matches a changed dim key, joined
    * to the dim's signed feed (±w — the feed row carries dim i's key
    * attributes: old values on −rows, new on +rows) and to every other
    * dim at its telescoping version (before i: cursor; after i: head).
    * Returns (term, keptFiles, totalFiles); kept = −1 marks the
    * unpruned broadcast-semi-join fallback (many changed keys, or a
    * key type without sound manifest stats). */
  private def dimDeltaTerm(s: SparkSession, d: MvJoinDef, i: Int,
      refs: Seq[String], factVer: Long, dimCurs: Seq[Long],
      dimHeads: Seq[Long]): (DataFrame, Long, Long) = {
    val r = d.dims(i)
    val dimFeed = s.read.parquet(refs: _*)
    val (factSlice0, kept, total) = prunedFactSlice(s, d.fact, factVer,
      r.factKey, dimFeed.select(col(r.dimKey)).distinct())
    // a PARTIAL star's dim-delta term re-groups only the SLICE's fact
    // rows: the predicate is row-local on the fact, so it filters the
    // key-pruned slice exactly like the create scan
    val factSlice = d.pred.fold(factSlice0)(factSlice0.filter)
    val otherSnaps: Map[Int, DataFrame] =
      d.dims.indices.filterNot(_ == i).map { j =>
        j -> TxnTable.snapshot(s, d.dims(j).dim,
          if (j < i) dimCurs(j) else dimHeads(j))
      }.toMap
    // ownership against the FRAMES BEING JOINED (the feed carries dim
    // i's full schema; the fact slice the fact's) — a drifted schema
    // refuses here, like enrichWithDims
    val owner = resolveOwners(d, j =>
      (if (j == i) dimFeed.columns
       else if (j < 0) factSlice.columns
       else otherSnaps(j).columns).toSeq)
    val joined = d.dims.indices.foldLeft(factSlice.alias("f")) {
      (acc, j) =>
        if (j == i) acc.join(dimFeed.alias("fd"),
          col(s"f.${r.factKey}") === col(s"fd.${r.dimKey}"))
        else acc.join(otherSnaps(j).alias(s"d$j"),
          col(s"f.${d.dims(j).factKey}") ===
            col(s"d$j.${d.dims(j).dimKey}"))
    }
    (joined.select(d.keys.map(k =>
      (if (owner(k) == i) col(s"fd.$k") else keyCol(owner, k))
        .as(k)) ++
      Seq(col(s"f.${d.value}").as(d.value), col("fd.w").as("w")): _*),
      kept, total)
  }

  /** The fact rows at `factVer` whose `factKey` is one of `keys` (a
    * dim-feed-sized frame of changed dim keys), manifest-pruned when
    * the shape allows: ≤16 long/string keys probe per key through
    * [[TxnTable.snapshotRange]]/[[TxnTable.snapshotStrRange]] (row-
    * exact: the residual point filter applies inside surviving files,
    * so the union over DISTINCT keys never duplicates a row);
    * otherwise one broadcast left-semi join over the pinned snapshot —
    * map-only, but every file opens (kept = −1 reports the fallback
    * honestly). */
  private def prunedFactSlice(s: SparkSession, fact: String,
      factVer: Long, factKey: String, keys: DataFrame)
      : (DataFrame, Long, Long) = {
    val snap = TxnTable.snapshot(s, fact, factVer)
    val kt = snap.schema(factKey).dataType
    val few = keys.limit(17).collect()
    if (few.isEmpty)
      // an empty cdc feed (a change commit that named zero rows):
      // the term is empty, no fact file read at all
      return (snap.filter(lit(false)), 0L, 0L)
    // probes only when they can BITE: the key frame's own type must
    // match the fact column's (a BIGINT fact key probed with the dim's
    // INT values would CCE on collect — the equi-join casts, Row.getLong
    // does not), and the fact's manifest must carry stats on factKey —
    // a stat-less fact keeps every file per probe, turning 16 probes
    // into 16 full scans where the fallback's ONE map-only pass wins
    val feedKt = keys.schema.head.dataType
    val m = TxnTable.manifest(s, fact, factVer)
    val hasStats =
      if (kt == org.apache.spark.sql.types.LongType)
        m.idxCols.contains(factKey)
      else m.strIdxCols.contains(factKey)
    if (few.length <= 16 && feedKt == kt && hasStats &&
      kt == org.apache.spark.sql.types.LongType) {
      val probes = few.filterNot(_.isNullAt(0)).map(_.getLong(0))
        .map(k => TxnTable.snapshotRange(s, fact, factKey, k, k, factVer))
      if (probes.isEmpty) return (snap.filter(lit(false)), 0L, 0L)
      (probes.map(_._1).reduce(_ unionByName _),
        probes.map(_._2.toLong).sum, probes.map(_._3.toLong).max)
    } else if (few.length <= 16 && feedKt == kt && hasStats &&
      kt == org.apache.spark.sql.types.StringType) {
      val probes = few.filterNot(_.isNullAt(0)).map(_.getString(0))
        .map(k =>
          TxnTable.snapshotStrRange(s, fact, factKey, k, k, factVer))
      if (probes.isEmpty) return (snap.filter(lit(false)), 0L, 0L)
      (probes.map(_._1).reduce(_ unionByName _),
        probes.map(_._2.toLong).sum, probes.map(_._3.toLong).max)
    } else
      (snap.alias("s").join(
        broadcast(keys.toDF(factKey).alias("ck")),
        col(s"s.$factKey") === col(s"ck.$factKey"), "left_semi"),
        -1L, -1L)
  }

  /** [[compensated]] for a star MV: MV rows ⊕ (fact feed tail ⋈ dims).
    * Requires EVERY dim content-identical between its cursor and the
    * query's pinned version — otherwise None (the groups themselves
    * may have moved; only the base join answers). */
  private[graft] def compensatedJoin(s: SparkSession, mv: String,
      d: MvJoinDef, cursor: Long, factPinned: Long,
      dimCursors: Seq[Long], dimPinned: Seq[Long], mvVer: Long,
      kb: KeyBounds = KeyBounds.none)
      : Option[DataFrame] = {
    if (d.dims.indices.exists(i => !contentInvariantRange(s,
      d.dims(i).dim, dimCursors(i), dimPinned(i)))) return None
    val mvRows = mvRowsAt(s, mv, mvVer, kb)
      .select((d.keys.map(col) ++
        Seq(col("n"), col("nn"), col("total"))): _*)
    if (cursor == factPinned) return Some(mvRows)
    // feed-less fact content change in the tail → cannot compensate
    val refs = feedRefsE(s, d.fact, cursor, factPinned)
      .getOrElse(return None)
    if (refs.isEmpty) return Some(mvRows)
    // a PARTIAL star's compensation gates the fact tail by the stored
    // predicate — the same row-local rule refresh folds by
    val feedDf = s.read.parquet(refs: _*)
    val feed = enrichWithDims(s, d,
      d.pred.fold(feedDf)(feedDf.filter),
      dimPinned,
      Seq(col("f.w").cast("long").as("n"),
        (col("f.w").cast("long") *
          when(col(s"f.${d.value}").isNull, 0L).otherwise(1L)).as("nn"),
        (col("f.w") * coalesce(col(s"f.${d.value}").cast(D18),
          lit(0).cast(D18))).cast(D18).as("total")))
    Some(mvRows.unionByName(feed).groupBy(d.keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("nn")).as("nn"),
        sum(col("total")).cast(D18).as("total"))
      .filter(col("n") =!= 0L))
  }

  // ---- LIVE (KEY-GRAINED) STAR MATERIALIZED VIEWS --------------------------

  /** The LIVE star view: the fold materialized at the FACT-KEY GRAIN —
    * grouped by the dims' join keys (plus any fact-owned group keys)
    * instead of the dim attributes — with the dims joined back AT
    * QUERY TIME. The payoff is the property [[compensatedJoin]] can
    * never have: dim movement NEVER stales the view. An SCD type-1
    * attribute update regroups the serve-time join-back (the dims are
    * read at the query's own pinned versions), so the dashboard stays
    * MV-priced between refreshes — no dim cursor exists at all, and
    * refresh folds ONLY the fact's signed feeds, without reading a
    * single dim. Serve cost is O(sub-view ⋈ dims): the sub-view holds
    * one row per live fact-key combination — bounded by the dims'
    * key-product and typically orders of magnitude under the fact —
    * and the dims are the small side of every star by definition, so
    * the planner broadcasts them. This is the classic pre-aggregation-
    * with-join-back design from the view-matching literature, chosen
    * over serve-time dim-delta telescoping because the group-grain MV
    * fundamentally lacks per-dim-key subtotals — no plan fragment over
    * it can reattribute a moved dim key without re-reading fact rows,
    * while the key-grain fold answers with ZERO fact data files in the
    * served plan. */
  private def liveDefPath(mv: String) = new Path(s"$mv/_mvl")

  /** The `_mvl` format is [[renderStarDef]]'s shared protocol plus ONE
    * mandatory trailing line — the persisted grain, so refresh never
    * re-resolves ownership (it reads no dim) — and, for a PARTIAL live
    * view, the stored fact-side predicate as a second. */
  private def writeLiveDef(s: SparkSession, mv: String, d: MvJoinDef,
      grain: Seq[String]): Unit =
    writeDefFile(s, liveDefPath(mv),
      renderStarDef(d, grain.mkString(",") +: d.pred.toSeq))

  def readLiveDef(s: SparkSession, mv: String)
      : (MvJoinDef, Seq[String]) = {
    val p = liveDefPath(mv)
    require(fs(s, p).exists(p), s"$mv is not a live star " +
      "materialized view (no _mvl definition; create it with " +
      "MatView.createStarLive)")
    val (d, trailing) = parseStarDef(mv, "_mvl", readDefFile(s, p), 1, 2)
    (d.copy(pred = trailing.drop(1).headOption),
      trailing.head.split(',').toSeq)
  }

  /** Single-dim [[createStarLive]]. */
  def createLive(s: SparkSession, mv: String, fact: String, dim: String,
      factKey: String, dimKey: String, keys: Seq[String], value: String,
      aggs: Seq[String] = Seq("count", "sum", "avg")): Long =
    createStarLive(s, mv, fact, Seq(MvDimRef(dim, factKey, dimKey)),
      keys, value, aggs)

  /** Create the live star view: ONE scan of the FACT alone (the dims
    * are read only to validate key ownership — never materialized),
    * grouped by the grain = every dim's fact-side join key plus the
    * fact-owned group keys. Fact rows carrying a NULL join key are
    * excluded at the fold: the inner join the view serves drops them
    * identically, at create, at every refresh, and at serve — the
    * three sites can never disagree because membership is the same
    * row-local non-null test. */
  def createStarLive(s: SparkSession, mv: String, fact: String,
      dims: Seq[MvDimRef], keys: Seq[String], value: String,
      aggs: Seq[String] = Seq("count", "sum", "avg")): Long =
    createStarLive(s, mv, fact, dims, keys, value, aggs, pred = None)

  /** [[createStarLive]] of a PARTIAL live view: only fact rows
    * satisfying `pred` (row-local SQL over FACT columns) fold into the
    * grain — the partial-star rule verbatim, composed with the live
    * kind's dims-join-back-at-query-time property. */
  def createStarLive(s: SparkSession, mv: String, fact: String,
      dims: Seq[MvDimRef], keys: Seq[String], value: String,
      aggs: Seq[String], pred: Option[String]): Long = {
    validateShape(keys, aggs)
    require(dims.nonEmpty, "a live star MV needs at least one dim")
    require(dims.map(_.dim).distinct.size == dims.size,
      "live-star-MV dims repeat a table")
    require(!dims.exists(_.dim == fact),
      "live-star-MV dims must not include the fact table itself")
    val fv = TxnTable.currentVersion(s, fact)
    val fsnap0 = TxnTable.snapshot(s, fact, fv)
    validateValueType(value, fsnap0.schema(value).dataType)
    pred.foreach(validatePartialPred(fsnap0, _, "the fact"))
    val fsnap = pred.fold(fsnap0)(fsnap0.filter)
    val d0 = MvJoinDef(fact, dims, keys, value,
      aggs.map(_.toLowerCase).toSet, pred)
    val owner = keyOwnership(s, d0) // each key owned by exactly one side
    val grain = (dims.map(_.factKey) ++
      keys.filter(k => owner(k) < 0)).distinct
    grain.foreach { g =>
      require(fsnap.columns.contains(g),
        s"live-star-MV grain column '$g' is not a fact column")
      require(!Seq("n", "nn", "total", "op", "w").contains(g),
        s"live-star-MV grain column '$g' collides with the fold's own " +
          "columns")
      // grain columns are the keyed-merge dimensions AND the manifest
      // prune handles — only integral and string columns have sound
      // stats; anything else would refresh unpruned forever
      fsnap.schema(g).dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.StringType => ()
        case other => throw new IllegalArgumentException(
          s"live-star-MV grain column '$g' is $other — join keys and " +
            "fact-owned group keys must be integral or string so the " +
            "keyed refresh merge can file-prune")
      }
    }
    val src = fsnap.filter(dims.map(r => col(r.factKey).isNotNull)
      .reduce(_ && _))
    val v = commitMvRows(s, mv, src, grain, value,
      Seq("mv_base_version" -> fv))
    writeLiveDef(s, mv, d0, grain)
    v
  }

  def refreshLive(s: SparkSession, mv: String): RefreshResult =
    refreshLive(s, mv, publishFeed = true)

  /** Incremental refresh of a live star view: the FACT's signed-feed
    * tail folds by the grain — no dim is opened, no dim cursor exists.
    * Feed rows with a NULL join key are excluded exactly like create's
    * scan (the served inner join never sees them). */
  def refreshLive(s: SparkSession, mv: String, publishFeed: Boolean)
      : RefreshResult = {
    val (d, grain) = readLiveDef(s, mv)
    val mvVer = TxnTable.currentVersion(s, mv)
    val last = cursorAt(s, mv, mvVer, "mv_base_version")
    val head = TxnTable.currentVersion(s, d.fact)
    require(head >= last, s"${d.fact} is at version $head, behind the " +
      s"MV's cursor $last — the fact was restored/recreated; recompute " +
      "the MV")
    if (head == last) return RefreshResult(mvVer, last, 0)
    val refs = feedRefs(s, d.fact, last, head)
    val folded = (head - last).toInt
    if (refs.isEmpty)
      return RefreshResult(advanceCursor(s, mv, mvVer,
        Seq("mv_base_version" -> head)), head, folded)
    // a PARTIAL live view gates the feed by its stored predicate —
    // the partial-star rule verbatim (row-local membership)
    val feed0 = s.read.parquet(refs: _*)
      .filter(d.dims.map(r => col(r.factKey).isNotNull).reduce(_ && _))
    val feed = d.pred.fold(feed0)(feed0.filter)
    val v = foldAndMerge(s, mv, mvVer, grain, d.value, feed,
      Seq("mv_base_version" -> head), publishFeed)
    RefreshResult(v, head, folded)
  }

  /** [[compensated]] for a live star view: (sub-view ⊕ fact feed tail)
    * ⋈ dims at the QUERY's pinned versions, re-grouped to the declared
    * keys. The dims impose NO freshness condition — they are joined
    * live, so any dim state (current, moved, time-travelled) serves —
    * and the fact tail compensates exactly like the fold view's.
    * Output columns are the MV vocabulary (keys, n, nn, total), so the
    * rewrite's substitution tail is shared verbatim. */
  private[graft] def compensatedLive(s: SparkSession, mv: String,
      d: MvJoinDef, grain: Seq[String], cursor: Long, factPinned: Long,
      dimPinned: Seq[Long], mvVer: Long): Option[DataFrame] = {
    val mvRows = TxnTable.snapshot(s, mv, mvVer)
      .select((grain.map(col) ++
        Seq(col("n"), col("nn"), col("total"))): _*)
    val subRows =
      if (cursor == factPinned) mvRows
      else {
        val refs = feedRefsE(s, d.fact, cursor, factPinned)
          .getOrElse(return None)
        if (refs.isEmpty) mvRows
        else {
          val feed0 = s.read.parquet(refs: _*)
            .filter(d.dims.map(r => col(r.factKey).isNotNull)
              .reduce(_ && _))
          val feed = d.pred.fold(feed0)(feed0.filter)
            .select(grain.map(col) ++ Seq(
              col("w").cast("long").as("n"),
              (col("w").cast("long") *
                when(col(d.value).isNull, 0L).otherwise(1L)).as("nn"),
              (col("w") * coalesce(col(d.value).cast(D18),
                lit(0).cast(D18))).cast(D18).as("total")): _*)
          mvRows.unionByName(feed).groupBy(grain.map(col): _*)
            .agg(sum(col("n")).as("n"), sum(col("nn")).as("nn"),
              sum(col("total")).cast(D18).as("total"))
            .filter(col("n") =!= 0L)
        }
      }
    val dimSnaps = d.dims.indices.map(i =>
      TxnTable.snapshot(s, d.dims(i).dim, dimPinned(i)))
    // ownership against the frames being joined (schema drift refuses
    // with resolveOwners' own message, like every join-back site)
    val owner = resolveOwners(d, i =>
      if (i < 0) subRows.columns.toSeq else dimSnaps(i).columns.toSeq)
    val joined = d.dims.indices.foldLeft(subRows.alias("f")) {
      (acc, i) =>
        acc.join(dimSnaps(i).alias(s"d$i"),
          col(s"f.${d.dims(i).factKey}") ===
            col(s"d$i.${d.dims(i).dimKey}"))
    }
    Some(joined.select(d.keys.map(k => keyCol(owner, k).as(k)) ++
        Seq(col("f.n").as("n"), col("f.nn").as("nn"),
          col("f.total").as("total")): _*)
      .groupBy(d.keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("nn")).as("nn"),
        sum(col("total")).cast(D18).as("total"))
      .filter(col("n") =!= 0L))
  }

  // ---- MIN/MAX (EXTREMA) MATERIALIZED VIEWS --------------------------------

  /** A grouped MIN/MAX view — the aggregate [[create]] REFUSES in the
    * telescoping fold, maintained here under the honest asymmetric
    * contract: INSERTS merge monotonically (`least`/`greatest` against
    * the feed's +w extremes — no base read ever), while a DELETE whose
    * value reaches the group's candidate extreme marks the group DIRTY
    * and refresh recomputes ONLY dirty groups, with manifest stats
    * bounding the files re-read (per-group point probes on the base's
    * key stats). Deleting an interior value updates counts without
    * dirtying — the common retention case costs nothing extra. This is
    * the published partial-recompute design (Napa/Calcite call these
    * non-distributive aggregates): O(feed) when clean, O(dirty groups'
    * files) when an extreme falls, never O(base). */
  case class MvExtremaDef(base: String, keys: Seq[String], value: String,
      pred: Option[String] = None)

  private def extremaDefPath(mv: String) = new Path(s"$mv/_mvx")

  private def writeExtremaDef(s: SparkSession, mv: String,
      d: MvExtremaDef): Unit = {
    val p = extremaDefPath(mv)
    val out = fs(s, p).create(p, false)
    // a PARTIAL extrema view appends its predicate as the 4th line —
    // the `_mv` definition's convention; full views stay 3-line on disk
    try out.write((s"${d.base}\n${d.keys.mkString(",")}\n${d.value}\n" +
      d.pred.map(_ + "\n").getOrElse(""))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readExtremaDef(s: SparkSession, mv: String): MvExtremaDef = {
    val p = extremaDefPath(mv)
    require(fs(s, p).exists(p), s"$mv is not an extrema materialized " +
      "view (no _mvx definition; create it with MatView.createExtrema)")
    val in = fs(s, p).open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.linesIterator.toSeq match {
      case Seq(base, keys, value) =>
        MvExtremaDef(base, keys.split(',').toSeq, value)
      case Seq(base, keys, value, pred) =>
        require(pred.nonEmpty, s"$mv: malformed _mvx definition " +
          "(empty predicate line)")
        MvExtremaDef(base, keys.split(',').toSeq, value, Some(pred))
      case other => throw new IllegalArgumentException(
        s"$mv: malformed _mvx definition (${other.size} lines)")
    }
  }

  /** Create the extrema MV: rows are (keys…, n, nn, vmin, vmax), the
    * extremes carried in the value's OWN type — MIN/MAX do no
    * arithmetic, so the fold's lossless-decimal gate does not apply. */
  def createExtrema(s: SparkSession, mv: String, base: String,
      keys: Seq[String], value: String): Long =
    createExtrema(s, mv, base, keys, value, None)

  /** `pred` makes the extrema view PARTIAL — only base rows satisfying
    * the stored row-local predicate contribute (the `WHERE price >
    * 1000` worst-latency pane). The same exactness argument as the
    * fold's partial view (membership is row-local, an update is a
    * −old/+new pair evaluated independently) extends to the dirty
    * path: the dirty test sees only IN-SLICE feed rows, and the
    * dirty-group recompute re-derives extremes from the base's
    * PREDICATE SLICE — the pruned point probes stay sound because a
    * probe is a key-superset read with the predicate applied before
    * the re-aggregation. */
  def createExtrema(s: SparkSession, mv: String, base: String,
      keys: Seq[String], value: String, pred: Option[String]): Long = {
    require(keys.nonEmpty, "MV needs at least one grouping key")
    keys.foreach { key =>
      require(!Seq("n", "nn", "vmin", "vmax", "op", "w").contains(key),
        s"extrema-MV key column '$key' collides with the MV's own " +
          "columns")
      require(!key.contains(","),
        s"MV key column '$key' contains a comma (the _mvx definition's " +
          "key separator)")
    }
    require(keys.distinct.size == keys.size,
      s"MV keys repeat a column: ${keys.mkString(", ")}")
    val bv = TxnTable.currentVersion(s, base)
    val snap0 = TxnTable.snapshot(s, base, bv)
    pred.foreach(validatePartialPred(snap0, _, "the base"))
    val snap = pred.fold(snap0)(snap0.filter)
    val rows = snap.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"), count(col(value)).as("nn"),
      org.apache.spark.sql.functions.min(col(value)).as("vmin"),
      org.apache.spark.sql.functions.max(col(value)).as("vmax"))
    val (intKeys, strKeys) = indexableKeys(snap.schema, keys)
    val clustered = rows.repartitionByRange(8, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
    val staged = TxnTable.stageIndexed(s, mv, clustered, intKeys, strKeys)
    val v = TxnTable.commit(s, mv, staged, expected = -1L,
      op = "mv_create", schemaJson = rows.schema.json,
      idxCols = intKeys, strIdxCols = strKeys,
      metrics = Seq("mv_base_version" -> bv))
    writeExtremaDef(s, mv, MvExtremaDef(base, keys, value, pred))
    v
  }

  /** Refresh the extrema MV from the base's signed feeds. Per touched
    * group: counts fold exactly (n += Σw, nn += Σ(w·nonnull)); the
    * candidate extremes merge monotonically from the feed's INSERTED
    * values; the group is DIRTY iff some DELETED value reaches a
    * candidate extreme (d ≥ candMax or d ≤ candMin — conservative
    * under duplicates: a recompute that lands on the same extreme is
    * wasted work, never a wrong answer; a deleted NULL never dirties).
    * Dirty groups recompute (n, nn, vmin, vmax) from the base AT HEAD —
    * for a single-key view with few dirty groups, via per-group
    * stat-pruned point probes (`mv_dirty_files_kept/total` metrics
    * carry the prune evidence); otherwise one filtered scan. The merge
    * is the same CAS-pinned keyed commit as [[refresh]]'s, and it
    * PUBLISHES ITS OWN SIGNED FEED (−old/+new extrema rows — the merge
    * preimage IS the old side, and the dirty-group recompute knows the
    * new): an extrema view is a feeding base like any other, so fold
    * views stack ON it (sum/count of per-group extremes — the
    * "sum of worst-latency per service" pane) at O(changed groups)
    * per level, never O(view). */
  def refreshExtrema(s: SparkSession, mv: String): RefreshResult =
    refreshExtrema(s, mv, publishFeed = true)

  def refreshExtrema(s: SparkSession, mv: String, publishFeed: Boolean)
      : RefreshResult = {
    val d = readExtremaDef(s, mv)
    val mvVer = TxnTable.currentVersion(s, mv)
    val last = cursorAt(s, mv, mvVer, "mv_base_version")
    val head = TxnTable.currentVersion(s, d.base)
    require(head >= last, s"${d.base} is at version $head, behind the " +
      s"MV's cursor $last — the base was restored/recreated; recompute " +
      "the MV")
    if (head == last) return RefreshResult(mvVer, last, 0)
    val refs = feedRefs(s, d.base, last, head)
    val folded = (head - last).toInt
    if (refs.isEmpty)
      return RefreshResult(advanceCursor(s, mv, mvVer,
        Seq("mv_base_version" -> head)), head, folded)
    // a PARTIAL view folds only its slice's membership changes: the
    // signed feed filtered by the stored row-local predicate is exact
    // (−old/+new pairs evaluate independently — a value crossing the
    // boundary folds as the membership change it is), and the dirty
    // test below then sees only in-slice deletes/inserts
    val feed0 = s.read.parquet(refs: _*)
    val feed = d.pred.fold(feed0)(feed0.filter)
    val w = col("w").cast("long")
    val v = col(d.value)
    val delta = feed.groupBy(d.keys.map(col): _*).agg(
      sum(w).as("dn"),
      sum(w * when(v.isNull, 0L).otherwise(1L)).as("dnn"),
      org.apache.spark.sql.functions.min(when(w > 0, v)).as("pmin"),
      org.apache.spark.sql.functions.max(when(w > 0, v)).as("pmax"),
      org.apache.spark.sql.functions.min(when(w < 0, v)).as("dmin"),
      org.apache.spark.sql.functions.max(when(w < 0, v)).as("dmax"))
    val mvCur = TxnTable.snapshot(s, mv, mvVer)
    val merged = delta.alias("d")
      .join(mvCur.alias("m"),
        d.keys.map(k => col(s"d.$k") <=> col(s"m.$k")).reduce(_ && _),
        "left_outer")
      .select(d.keys.map(k => col(s"d.$k").as(k)) ++ Seq(
        (coalesce(col("m.n"), lit(0L)) + col("dn")).as("n"),
        (coalesce(col("m.nn"), lit(0L)) + col("dnn")).as("nn"),
        least(col("m.vmin"), col("pmin")).as("vmin"),
        greatest(col("m.vmax"), col("pmax")).as("vmax"),
        // least/greatest SKIP nulls, so the candidates are the merged
        // extremes of (current MV row, inserted values) — exactly the
        // set a deleted value must be tested against: a delete reaching
        // either candidate may expose a different survivor
        ((col("dmax").isNotNull && col("dmax") >= greatest(col("m.vmax"),
          col("pmax"))) ||
         (col("dmin").isNotNull && col("dmin") <= least(col("m.vmin"),
           col("pmin")))).as("dirty")): _*)
    // the delta-sized split is materialized ONCE: the NULL-key check,
    // the clean rows, the dirty key list (driver-sized by construction
    // — it is a set of GROUP keys, the MV's own cardinality bound) and
    // the merge all read the checkpoint, never the raw delta job again
    val pinned = merged.localCheckpoint(true)
    if (pinned.filter(d.keys.map(col(_).isNull).reduce(_ || _))
        .limit(1).count() > 0)
      throw new IllegalArgumentException(
        s"$mv: the delta touches a NULL grouping-key group, which the " +
          "keyed refresh merge cannot address — recompute the MV " +
          "(drop + create)")
    val clean = pinned.filter(!col("dirty"))
      .select(d.keys.map(col) ++ Seq(col("n"), col("nn"), col("vmin"),
        col("vmax"),
        when(col("n") === 0L, lit("D")).otherwise(lit("U")).as("op")): _*)
    val dirtyKeys = pinned.filter(col("dirty")).select(d.keys.map(col): _*)
    val nDirty = dirtyKeys.count()
    val (changeSet, keptFiles, totalFiles) =
      if (nDirty == 0) (clean, 0L, 0L)
      else {
        val baseSnap = TxnTable.snapshot(s, d.base, head)
        val keyType = baseSnap.schema(d.keys.head).dataType
        // per-group stat-pruned point probes when the shape allows —
        // the manifest bounds the files each recompute re-reads
        val (src, kept, total) =
          if (d.keys.size == 1 && nDirty <= 16 &&
            keyType == org.apache.spark.sql.types.StringType) {
            val ks = dirtyKeys.collect().map(_.getString(0))
            val probes = ks.map(g =>
              TxnTable.snapshotStrRange(s, d.base, d.keys.head, g, g, head))
            (probes.map(_._1).reduce(_ unionByName _),
              probes.map(_._2.toLong).sum, probes.map(_._3.toLong).max)
          } else if (d.keys.size == 1 && nDirty <= 16 &&
            keyType == org.apache.spark.sql.types.LongType) {
            val ks = dirtyKeys.collect().map(_.getLong(0))
            val probes = ks.map(g =>
              TxnTable.snapshotRange(s, d.base, d.keys.head, g, g, head))
            (probes.map(_._1).reduce(_ unionByName _),
              probes.map(_._2.toLong).sum, probes.map(_._3.toLong).max)
          } else
            // the sound fallback: one scan filtered by the dirty key
            // set (a broadcast semi-join — never a literal tree)
            (baseSnap.join(broadcast(dirtyKeys), d.keys, "left_semi"),
              -1L, -1L)
        // the dirty-group recompute reads the base's PREDICATE SLICE:
        // the probes/semi-join bound WHICH files and keys are read,
        // the predicate then decides membership row-locally — the
        // felled in-slice extreme re-derives from in-slice survivors
        // only (an out-of-slice higher value must never surface)
        val srcSlice = d.pred.fold(src)(src.filter)
        val recomputed = srcSlice.groupBy(d.keys.map(col): _*).agg(
          count(lit(1)).as("rn"), count(col(d.value)).as("rnn"),
          org.apache.spark.sql.functions.min(col(d.value)).as("rvmin"),
          org.apache.spark.sql.functions.max(col(d.value)).as("rvmax"))
        // a dirty group absent from the recompute lost its last row
        val dirtyRows = dirtyKeys.alias("k")
          .join(recomputed.alias("r"),
            d.keys.map(k => col(s"k.$k") === col(s"r.$k")).reduce(_ && _),
            "left_outer")
          .select(d.keys.map(k => col(s"k.$k").as(k)) ++ Seq(
            coalesce(col("rn"), lit(0L)).as("n"),
            coalesce(col("rnn"), lit(0L)).as("nn"),
            col("rvmin").as("vmin"), col("rvmax").as("vmax"),
            when(col("rn").isNull, lit("D")).otherwise(lit("U"))
              .as("op")): _*)
        (clean.unionByName(dirtyRows), kept, total)
      }
    val r = TxnTable.applyChangesWithMetrics(s, mv, changeSet, d.keys,
      Seq("mv_base_version" -> head, "mv_dirty_groups" -> nDirty,
        "mv_dirty_files_kept" -> keptFiles,
        "mv_dirty_files_total" -> totalFiles),
      cdc = publishFeed, expectedVer = mvVer)
    RefreshResult(r.version, head, folded)
  }

  /** op_mv_delete: COPY-ON-WRITE DELETES WITH PUBLISHED FEEDS — closing
    * the MV's DML gap. Before this, only the merge-on-read paths
    * published change feeds: one plain `DELETE FROM` on the base and
    * every MV over it refuses refresh FOREVER (the loud contract) —
    * honest, but it forces recompute for the most ordinary retention
    * job there is. `cdc = true` on [[TxnTable.deleteWhere]]/
    * [[TxnTable.deleteIn]] stages every deleted row (w = −1) as a
    * signed feed IN the delete commit — naming the rows costs reading
    * the dropped files too, the price of an exact feed, paid only on
    * request. The scenario runs the retention double-header: a
    * contiguous range delete (file-pruned — whole files drop, boundary
    * files rewrite) and a scattered id-list delete (per-value verdicts;
    * at sf0.1 the list exceeds the 10k fold so the envelope path
    * publishes too), then ONE refresh folds BOTH feeds. `mvdel_ok`
    * pins: two commits folded, both carrying `#cdc=` refs, the range
    * delete really dropped whole files and kept others verbatim.
    * Hashed output = the refreshed MV, oracle = direct recompute of
    * the retained base. At 100 TB: retention DELETEs flow into every
    * downstream MV at O(deleted rows), never O(base rescan). */
  def mvCowDelete(s: SparkSession, dir: String): DataFrame = {
    val base = freshDir("mvdel_base")
    val mv = freshDir("mvdel_view")
    val src = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderstatus"), col("o_totalprice").cast(D12).as("price"))
    val k = col("o_orderkey")
    TxnTable.commit(s, base, TxnTable.stageIndexed(s, base,
      src.repartitionByRange(8, k).sortWithinPartitions(k), "o_orderkey"),
      expected = -1L, op = "create", schemaJson = src.schema.json)
    create(s, mv, base, "o_orderstatus", "price")
    val b = src.agg(org.apache.spark.sql.functions.min(k),
      org.apache.spark.sql.functions.max(k)).collect()(0)
    val (kmin, kmax) = (b.getLong(0), b.getLong(1))
    val cut = kmin + (kmax - kmin + 1) / 5
    // retention pass 1: drop everything below the cut (the age-out
    // shape) — contiguous, so the clustered layout drops whole files
    val r1 = TxnTable.deleteWhere(s, base,
      Seq(("o_orderkey", Long.MinValue, cut - 1)), Nil, cdc = true)
    // retention pass 2: a scattered id list (the GDPR shape)
    val ids = src.filter(pmod(k, lit(9)) === 0).select(k)
      .collect().map(_.getLong(0)).toSeq
    val r2 = TxnTable.deleteIn(s, base, "o_orderkey", ids, cdc = true)
    val r = refresh(s, mv)
    val ok = r.commitsFolded == 2 && r.baseVersion == 2L &&
      TxnTable.manifest(s, base, r1.version).cdcRefs.nonEmpty &&
      TxnTable.manifest(s, base, r2.version).cdcRefs.nonEmpty &&
      r1.dropped > 0 && r1.kept > 0
    TxnTable.snapshot(s, mv)
      .select(col("o_orderstatus"), col("n"),
        col("total").cast("double").as("total"))
      .withColumn("mvdel_ok", lit(ok))
  }

  /** op_mv_merge: COPY-ON-WRITE MERGE WITH A PUBLISHED FEED — the last
    * DML gap closed: `cdc = true` on [[TxnTable.applyChangesMulti]]
    * (the path SQL MERGE and UPDATE compile to) stages −preimage ∪
    * +postimage as a signed feed in the merge commit, so an MV refresh
    * folds the batch instead of refusing. With op_matview (MoR apply),
    * op_mv_delete (CoW delete) and this, EVERY DML path can feed an
    * incremental view. One change set carries all three shapes —
    * deletes (every 8th key), whole-row repricing updates (every 10th
    * ≡ 3), and inserts into a brand-new status group — and ONE refresh
    * folds it; `mvm_ok` pins the feed's presence, the single folded
    * commit, and exact signed accounting (feed rows == |preimage| +
    * |postimage|). Hashed output = the refreshed MV; oracle = direct
    * recompute of the merged base. At 100 TB: the feed costs one extra
    * read of the TOUCHED files only — proportional to the change
    * region, never the table. */
  def mvCowMerge(s: SparkSession, dir: String): DataFrame = {
    val base = freshDir("mvm_base")
    val mv = freshDir("mvm_view")
    val src = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderstatus"), col("o_totalprice").cast(D12).as("price"))
    val k = col("o_orderkey")
    TxnTable.commit(s, base, TxnTable.stageIndexed(s, base,
      src.repartitionByRange(8, k).sortWithinPartitions(k), "o_orderkey"),
      expected = -1L, op = "create", schemaJson = src.schema.json)
    create(s, mv, base, "o_orderstatus", "price")
    val changes = src.filter(pmod(k, lit(8)) === 0)
      .select(k, col("o_orderstatus"), col("price"), lit("D").as("op"))
      .unionByName(src.filter(pmod(k, lit(10)) === 3 &&
          pmod(k, lit(8)) =!= 0)
        .select(k, col("o_orderstatus"),
          (col("price") + lit(3).cast(D12)).cast(D12).as("price"),
          lit("U").as("op")))
      .unionByName(src.filter(pmod(k, lit(17)) === 0)
        .select((k + 500000000L).as("o_orderkey"), lit("M")
          .as("o_orderstatus"), col("price"), lit("U").as("op")))
    val r1 = TxnTable.applyChangesMulti(s, base, changes,
      Seq("o_orderkey"), cdc = true)
    val m1 = TxnTable.manifest(s, base, r1.version)
    // exact signed accounting: −(matched preimage) + (non-D change
    // rows) — one aggregate pass per frame, and no read at all if the
    // feed unexpectedly failed to publish (ok then reports false
    // instead of crashing on a zero-path parquet read)
    val cRow = changes.agg(
      sum(when(col("op") === "D", 1L).otherwise(0L)),
      sum(when(col("op") === "U" &&
        col("o_orderkey") < 500000000L, 1L).otherwise(0L)),
      sum(when(col("o_orderkey") >= 500000000L, 1L).otherwise(0L)))
      .collect()(0)
    val (nDel, nUpd, nIns) =
      (cRow.getLong(0), cRow.getLong(1), cRow.getLong(2))
    val feedOk = m1.cdcRefs.nonEmpty && {
      val f = s.read.parquet(m1.cdcRefs.map(r => s"$base/$r"): _*)
        .agg(sum(when(col("w") === -1, 1L).otherwise(0L)),
          sum(when(col("w") === 1, 1L).otherwise(0L))).collect()(0)
      f.getLong(0) == nDel + nUpd && f.getLong(1) == nUpd + nIns
    }
    val r = refresh(s, mv)
    val ok = feedOk && r.commitsFolded == 1
    TxnTable.snapshot(s, mv)
      .select(col("o_orderstatus"), col("n"),
        col("total").cast("double").as("total"))
      .withColumn("mvm_ok", lit(ok))
  }

  /** op_mv_chain: MATERIALIZED-VIEW PIPELINES — views stacked on views,
    * each level refreshing from the level below's published feed. The
    * refresh merge publishes ITS OWN signed feed ([[TxnTable
    * .applyChangesWithMetrics]] cdc), so a refreshed MV is a feeding
    * base like any other: base → mv1 (status, priority) → mv2 (status,
    * value = mv1's fold total). Per-level refresh cost is O(that
    * level's delta) — mv2 folds mv1's −old/+new GROUP rows, never
    * mv1's (let alone the base's) data. Content-invariant interleaves
    * thread through the chain: a base compact makes mv1's refresh a
    * metadata-only cursor advance (op `mv_refresh`), which mv2's walk
    * SKIPS like any other invariant op — the chain never stalls on
    * maintenance. `chain_ok` pins: both real mv1 refreshes published
    * feeds, mv2 folded exactly the merge commits, and the
    * cursor-advance + mv1-compact interleave crossed without a feed.
    * Hashed output = mv2 after two change waves (n = #priority groups
    * per status, total = the status's sum — the fold OF a fold);
    * oracle recomputes both levels from the base's final content. At
    * 100 TB: dashboard DAGs refresh top-down in O(Σ level deltas). */
  def mvChain(s: SparkSession, dir: String): DataFrame = {
    val base = freshDir("mvc_base")
    val mv1 = freshDir("mvc_mid")
    val mv2 = freshDir("mvc_top")
    val src = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderstatus").as("st"), col("o_orderpriority").as("pri"),
      col("o_totalprice").cast(D12).as("price"))
    val k = col("o_orderkey")
    TxnTable.commit(s, base, TxnTable.stageIndexed(s, base,
      src.repartitionByRange(8, k).sortWithinPartitions(k), "o_orderkey"),
      expected = -1L, op = "create", schemaJson = src.schema.json)
    create(s, mv1, base, Seq("st", "pri"), "price")
    // the fold OF a fold: mv2's value is mv1's exact DECIMAL(18,2)
    // total (passes the lossless gate by construction)
    create(s, mv2, mv1, Seq("st"), "total")
    // insert shifts derive from the keyspace so synthetic keys can
    // never collide with a real order at ANY scale factor (a collision
    // would silently turn an insert into an update)
    val shift1 = src.agg(org.apache.spark.sql.functions.max(k))
      .collect()(0).getLong(0) + 1
    def del(c: org.apache.spark.sql.Column) = src.filter(c)
      .select(k, col("st"), col("pri"), col("price"), lit("D").as("op"))
    def upd(c: org.apache.spark.sql.Column, bump: Int) = src.filter(c)
      .select(k, col("st"), col("pri"),
        (col("price") + lit(bump).cast(D12)).cast(D12).as("price"),
        lit("U").as("op"))
    def ins(c: org.apache.spark.sql.Column, st: String, pri: String,
        shift: Long) = src.filter(c)
      .select((k + shift).as("o_orderkey"), lit(st).as("st"),
        lit(pri).as("pri"), col("price"), lit("U").as("op"))
    // wave 1
    TxnTable.applyChangesMor(s, base,
      del(pmod(k, lit(9)) === 0)
        .unionByName(upd(pmod(k, lit(10)) === 0 && pmod(k, lit(9)) =!= 0,
          100))
        .unionByName(ins(pmod(k, lit(97)) === 0, "N", "9-NEW",
          shift1)),
      "o_orderkey", cdc = true)
    val r1a = refresh(s, mv1)
    val feed1 = TxnTable.manifest(s, mv1, r1a.mvVersion).cdcRefs.nonEmpty
    val r1b = refresh(s, mv2)
    // content-invariant interleaves across the chain: base compact →
    // mv1 cursor-advance (op mv_refresh, feed-less) + an mv1 compact —
    // mv2's walk must SKIP both
    TxnTable.compact(s, base)
    val rAdv = refresh(s, mv1)
    TxnTable.compact(s, mv1)
    val rSkip = refresh(s, mv2)
    // wave 2 (original-key arithmetic only, so the oracle replays)
    TxnTable.applyChangesMor(s, base,
      del(pmod(k, lit(11)) === 0 && pmod(k, lit(9)) =!= 0)
        .unionByName(upd(pmod(k, lit(13)) === 0 && pmod(k, lit(9)) =!= 0
          && pmod(k, lit(11)) =!= 0, 200))
        .unionByName(ins(pmod(k, lit(89)) === 0, "M", "8-CHAIN",
          2 * shift1)),
      "o_orderkey", cdc = true)
    val r2a = refresh(s, mv1)
    val feed2 = TxnTable.manifest(s, mv1, r2a.mvVersion).cdcRefs.nonEmpty
    val r2b = refresh(s, mv2)
    val ok = feed1 && feed2 &&
      r1b.commitsFolded == 1 && r2b.commitsFolded == 1 &&
      rAdv.commitsFolded == 1 && rSkip.commitsFolded == 2 &&
      rSkip.baseVersion == rAdv.mvVersion + 1 // advance + mv1 compact
    TxnTable.snapshot(s, mv2)
      .select(col("st"), col("n"), col("total").cast("double").as("total"))
      .withColumn("chain_ok", lit(ok))
  }

  /** op_mv_minmax: the EXTREMA MV end to end — create over a
    * status-clustered base, then the asymmetric maintenance contract
    * under fire. Wave 1 is the CLEAN shape: inserts above group 'O's
    * max (monotone greatest — no base read), a brand-new group 'N',
    * and interior deletes in 'F' (count updates only — deleting
    * non-extreme rows costs nothing); `mv_dirty_groups` must be 0.
    * Wave 2 is the ADVERSARIAL shape: delete every row HOLDING group
    * 'F's max and every row holding 'P's min — exactly the deletes the
    * telescoping fold cannot answer (the new extreme lives in rows the
    * feed never mentions); refresh marks BOTH groups dirty
    * (`mv_dirty_groups` = 2) and recomputes them via per-group
    * stat-pruned point probes on the status-clustered layout
    * (`mv_dirty_files_kept` < `mv_dirty_files_total` — the prune
    * evidence), after which the SECOND-max/min answer. Hashed output =
    * the refreshed MV (n, vmin, vmax per status); oracle replays both
    * waves. At 100 TB: MIN/MAX views ride the same feed pipeline as
    * the fold views — clean changes cost O(feed), and an extreme
    * falling costs O(that group's files), never a base rescan. */
  def mvMinMax(s: SparkSession, dir: String): DataFrame = {
    val base = freshDir("mvx_base")
    val mv = freshDir("mvx_view")
    val src = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderstatus"), col("o_totalprice").cast(D12).as("price"))
    val st = col("o_orderstatus")
    val k = col("o_orderkey")
    // the base clusters by the GROUP key, so a dirty-group recompute's
    // point probe prunes to that group's files
    TxnTable.commit(s, base, TxnTable.stageIndexed(s, base,
      src.repartitionByRange(8, st, k).sortWithinPartitions(st, k),
      Nil, Seq("o_orderstatus")),
      expected = -1L, op = "create", schemaJson = src.schema.json,
      strIdxCols = Seq("o_orderstatus"))
    createExtrema(s, mv, base, Seq("o_orderstatus"), "price")
    // wave 1 (clean): monotone inserts + a new group + interior deletes
    val lim = src.filter(st === "F").agg(
      org.apache.spark.sql.functions.min(col("price")),
      org.apache.spark.sql.functions.max(col("price"))).collect()(0)
    val (fmin, fmax) = (lim.getDecimal(0), lim.getDecimal(1))
    val ch1 = src.filter(pmod(k, lit(21)) === 0)
      .select((k + 800000000L).as("o_orderkey"), lit("O").as(
        "o_orderstatus"),
        (col("price") + lit(100000).cast(D12)).cast(D12).as("price"),
        lit("U").as("op"))
      .unionByName(src.filter(pmod(k, lit(97)) === 0)
        .select((k + 900000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), col("price"), lit("U").as("op")))
      .unionByName(src.filter(st === "F" && pmod(k, lit(7)) === 0 &&
          col("price") > lit(fmin) && col("price") < lit(fmax))
        .select(k, st, col("price"), lit("D").as("op")))
    TxnTable.applyChangesMor(s, base, ch1, "o_orderkey", cdc = true)
    val r1 = refreshExtrema(s, mv)
    val m1 = TxnTable.commitMetrics(s, mv, r1.mvVersion)
    // wave 2 (adversarial): fell the extremes themselves — every row
    // holding F's max and P's min (ties included: deterministic both
    // here and in the oracle)
    val snap1 = TxnTable.snapshot(s, base)
    val l2 = snap1.agg(
      org.apache.spark.sql.functions.max(when(st === "F", col("price"))),
      org.apache.spark.sql.functions.min(when(st === "P", col("price"))))
      .collect()(0)
    val (fmax2, pmin2) = (l2.getDecimal(0), l2.getDecimal(1))
    val ch2 = snap1.filter(st === "F" && col("price") === lit(fmax2))
      .unionByName(snap1.filter(st === "P" && col("price") === lit(pmin2)))
      .select(k, st, col("price"), lit("D").as("op"))
    TxnTable.applyChangesMor(s, base, ch2, "o_orderkey", cdc = true)
    val r2 = refreshExtrema(s, mv)
    val m2 = TxnTable.commitMetrics(s, mv, r2.mvVersion)
    val r3 = refreshExtrema(s, mv) // at head: no commit
    val ok = r1.commitsFolded == 1 && r2.commitsFolded == 1 &&
      m1.get("mv_dirty_groups").contains(0L) &&
      m2.get("mv_dirty_groups").contains(2L) &&
      m2.get("mv_dirty_files_kept").exists(kf => kf > 0L &&
        m2.get("mv_dirty_files_total").exists(tf => kf < tf)) &&
      r3.mvVersion == r2.mvVersion && r3.commitsFolded == 0
    TxnTable.snapshot(s, mv)
      .select(st, col("n"), col("vmin").cast("double").as("vmin"),
        col("vmax").cast("double").as("vmax"))
      .withColumn("mm_ok", lit(ok))
  }

  /** op_mvx_chain: FOLD VIEWS STACKED ON AN EXTREMA VIEW — the piece
    * [[refreshExtrema]]'s published feed unlocks: base → extrema MV
    * (max price per (st, pri)) → fold MV over it (per st: group count
    * + SUM of per-group maxima — the "sum of worst-latency per
    * service" dashboard). Wave 1 is the CLEAN shape (keyspace-shifted
    * inserts +100000 above every max): the extrema refresh merges
    * monotonically (`mv_dirty_groups` = 0), publishes its −old/+new
    * merge feed in the SAME commit, and the top fold folds exactly
    * that feed (one commit, O(changed groups)). Wave 2 is the DIRTY
    * shape (delete the inserted 'F' maxima): the dirty-group recompute
    * re-derives the previous extremes and the feed carries the fall —
    * the top view follows at O(delta) again. `mvxc_ok` pins: both
    * refresh commits carry `#cdc=` refs, wave 1 dirties nothing, wave
    * 2 dirties ≥1 group, each top refresh folds exactly ONE commit,
    * and both levels equal direct recomputes. Hashed output = the top
    * view; the oracle replays both waves. At 100 TB: extrema views
    * join the derived-pipeline DAG — every level refreshes at O(its
    * delta), never O(the level below). */
  def mvxChain(s: SparkSession, dir: String): DataFrame = {
    val base = freshDir("mvxc_base")
    val xmv = freshDir("mvxc_x")
    val top = freshDir("mvxc_top")
    val src = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderstatus").as("st"), col("o_orderpriority").as("pri"),
      col("o_totalprice").cast(D12).as("price"))
    val k = col("o_orderkey")
    TxnTable.commit(s, base, TxnTable.stageIndexed(s, base,
      src.repartitionByRange(8, k).sortWithinPartitions(k), "o_orderkey"),
      expected = -1L, op = "create", schemaJson = src.schema.json)
    createExtrema(s, xmv, base, Seq("st", "pri"), "price")
    create(s, top, xmv, Seq("st"), "vmax")
    val shift = src.agg(org.apache.spark.sql.functions.max(k))
      .collect()(0).getLong(0) + 1
    // wave 1 — CLEAN: +100000 sits above every group's max at any SF
    val ins = src.filter(pmod(k, lit(19)) === 0)
      .select((k + shift).as("o_orderkey"), col("st"), col("pri"),
        (col("price") + lit(100000).cast(D12)).cast(D12).as("price"))
    TxnTable.applyChangesMor(s, base, ins.withColumn("op", lit("U")),
      "o_orderkey", cdc = true)
    val rx1 = refreshExtrema(s, xmv)
    val m1 = TxnTable.commitMetrics(s, xmv, rx1.mvVersion)
    val feed1 = TxnTable.manifest(s, xmv, rx1.mvVersion).cdcRefs.nonEmpty
    val rt1 = refresh(s, top)
    def topRows() = TxnTable.snapshot(s, top)
      .select(col("st"), col("n"), col("total").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    def directTop() = TxnTable.snapshot(s, base)
      .groupBy(col("st"), col("pri"))
      .agg(org.apache.spark.sql.functions.max(col("price")).as("vmax"))
      .groupBy(col("st")).agg(count(lit(1)).as("n"),
        sum(col("vmax")).cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val eq1 = topRows() == directTop()
    // wave 2 — DIRTY: fell the 'F' groups' new maxima
    TxnTable.applyChangesMor(s, base,
      ins.filter(col("st") === "F").withColumn("op", lit("D")),
      "o_orderkey", cdc = true)
    val rx2 = refreshExtrema(s, xmv)
    val m2 = TxnTable.commitMetrics(s, xmv, rx2.mvVersion)
    val feed2 = TxnTable.manifest(s, xmv, rx2.mvVersion).cdcRefs.nonEmpty
    val rt2 = refresh(s, top)
    val eq2 = topRows() == directTop()
    val ok = feed1 && feed2 &&
      m1.get("mv_dirty_groups").contains(0L) &&
      m2.get("mv_dirty_groups").exists(_ >= 1L) &&
      rt1.commitsFolded == 1 && rt2.commitsFolded == 1 && eq1 && eq2
    TxnTable.snapshot(s, top)
      .select(col("st"), col("n"), col("total").cast("double").as("total"))
      .withColumn("mvxc_ok", lit(ok))
  }

  // ---- TRANSPARENT QUERY REWRITING ----------------------------------------

  /** Session-wide MV registry: base location → (MV location, cached
    * definition). Exact-string keyed (both sides come from the same
    * catalog/warehouse path convention); `register` replaces — latest
    * MV for a base wins. The definition is immutable by contract, so
    * caching it here removes the per-query `_mv` file read the rewrite
    * rule would otherwise pay on every analyzer iteration. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, (String, MvDef)]()

  def register(s: SparkSession, mv: String): Unit = {
    val d0 = readDef(s, mv)
    // key by the EFFECTIVE base (a transplanted branch MV serves the
    // parent); the rule re-resolves per query, so a registration that
    // goes stale (a transplant after register) disqualifies rather
    // than serving the wrong timeline — re-register after transplant
    val (d, _) = effectiveDef(s, mv, d0,
      TxnTable.currentVersion(s, mv))
    // drop OUR stale pre-transplant key (the branch dir): leaving it
    // would make every branch-addressed aggregate pay a cursor walk
    // just to disqualify, forever. Only remove an entry this MV owns —
    // a different view legitimately registered for the branch stays.
    if (d.base != d0.base)
      registry.computeIfPresent(d0.base,
        (_, cur) => if (cur._1 == mv) null else cur)
    registry.put(d.base, (mv, d0))
  }

  private[graft] def registeredFor(base: String): Option[(String, MvDef)] =
    Option(registry.get(base))

  /** Join-MV registry, keyed (fact location, sorted dim-location set) —
    * the rewrite rule probes every fact candidate of the matched join
    * tree. */
  private val joinRegistry = new java.util.concurrent
    .ConcurrentHashMap[(String, String), (String, MvJoinDef)]()

  private def joinKey(fact: String, dims: Seq[String]): (String, String) =
    (fact, dims.sorted.mkString("|"))

  def registerJoin(s: SparkSession, mv: String): Unit = {
    val d = readJoinDef(s, mv)
    joinRegistry.put(joinKey(d.fact, d.dims.map(_.dim)), (mv, d))
  }

  private[graft] def registeredJoinFor(fact: String, dims: Seq[String])
      : Option[(String, MvJoinDef)] =
    Option(joinRegistry.get(joinKey(fact, dims)))

  /** Live-star registry, keyed exactly like the join registry — the
    * rewrite probes the same (fact, dim set) key, falling back to the
    * live view when no group-grain join MV matches (or the matched one
    * disqualified on dim movement — the live view's reason to exist). */
  private val liveRegistry = new java.util.concurrent
    .ConcurrentHashMap[(String, String),
      (String, MvJoinDef, Seq[String])]()

  def registerLive(s: SparkSession, mv: String): Unit = {
    val (d, grain) = readLiveDef(s, mv)
    liveRegistry.put(joinKey(d.fact, d.dims.map(_.dim)), (mv, d, grain))
  }

  private[graft] def registeredLiveFor(fact: String, dims: Seq[String])
      : Option[(String, MvJoinDef, Seq[String])] =
    Option(liveRegistry.get(joinKey(fact, dims)))

  /** Extrema-MV registry, base location → (MV location, definition). */
  private val extremaRegistry = new java.util.concurrent
    .ConcurrentHashMap[String, (String, MvExtremaDef)]()

  def registerExtrema(s: SparkSession, mv: String): Unit = {
    val d = readExtremaDef(s, mv)
    extremaRegistry.put(d.base, (mv, d))
  }

  private[graft] def registeredExtremaFor(base: String)
      : Option[(String, MvExtremaDef)] = Option(extremaRegistry.get(base))

  /** Every view REGISTERED for the transparent rewrite in this
    * session, across the three kinds — the SHOW MATERIALIZED VIEWS
    * listing: (view location, kind, base/fact location). Session
    * state by design: the durable inventory is the per-table
    * `.matviews` metadata table; this answers "what can the rewrite
    * serve RIGHT NOW". */
  def registered(): Seq[(String, String, String)] = {
    import scala.jdk.CollectionConverters._
    (registry.asScala.toSeq.map { case (b, (mv, _)) =>
      (mv, "fold", b) } ++
      joinRegistry.asScala.toSeq.map { case (_, (mv, d)) =>
        (mv, "join", d.fact) } ++
      extremaRegistry.asScala.toSeq.map { case (b, (mv, _)) =>
        (mv, "extrema", b) } ++
      liveRegistry.asScala.toSeq.map { case (_, (mv, d, _)) =>
        (mv, "live", d.fact) }).sortBy(_._1)
  }

  /** DROP the materialized view: deregister it from the transparent
    * rewrite (only the entry THIS view owns — a different view
    * registered for the same base stays), then delete its directory.
    * The deregistration happens FIRST so no query window can plan
    * against files being deleted under it. Registration is
    * LATEST-WINS per base, so dropping the latest view leaves an
    * earlier view over the same base UNREGISTERED — the remedy is one
    * idempotent [[register]] of the survivor (spec-pinned); drop
    * cannot restore it because the registry keeps no history.
    * Returns the view's kind. */
  def drop(s: SparkSession, mv: String): String = {
    val kind = kindOf(s, mv) // refuses loudly when mv is not a view
    // a refreshed view publishes its own signed feed, so views STACK
    // (fold-over-fold chains, folds over extrema feeds) — deleting a
    // base out from under a registered dependent would surface later
    // as a misleading 'base was restored/recreated; recompute' on the
    // dependent's next refresh. Refuse NOW, naming the dependents,
    // BEFORE anything deregisters or deletes. (Session registries are
    // the dependency source of truth the rewrite itself uses; an
    // unregistered dependent is already serving nothing.)
    locally {
      import scala.jdk.CollectionConverters._
      // a base MATCHES when it is this view, or lives UNDER it (a
      // branch of this view, the transplant shape — the recursive
      // delete below would wipe it too): the same effective-base
      // reach retentionPins/statusFor apply via mayServe/parentOf
      def under(b: String): Boolean = b == mv ||
        b.startsWith(s"$mv/")
      val dependents = (
        registry.asScala.values.map { case (m, d) => (m, d.base) } ++
        extremaRegistry.asScala.values.map { case (m, d) =>
          (m, d.base) } ++
        joinRegistry.asScala.values.flatMap { case (m, d) =>
          (d.fact +: d.dims.map(_.dim)).map((m, _)) } ++
        liveRegistry.asScala.values.flatMap { case (m, d, _) =>
          (d.fact +: d.dims.map(_.dim)).map((m, _)) })
        .collect { case (m, b) if under(b) && m != mv => m }
        // a GHOST dependent — its registry entry survived but its
        // definition no longer reads (directory removed out-of-band)
        // — must not wedge the drop: the prescribed remedy ("drop the
        // dependent first") is impossible for it, and it can never
        // refresh anyway. ONLY the definitive not-a-view probe result
        // counts as ghost: a transient filesystem failure during the
        // probe must ABORT the drop, not silently wave a live
        // dependent through to have its base deleted
        .filter { m =>
          try { kindOf(s, m); true }
          catch {
            case _: IllegalArgumentException => false // no def reads
            case _: java.io.FileNotFoundException => false
            case scala.util.control.NonFatal(e) =>
              throw new IllegalStateException(s"DROP $mv: could not " +
                s"probe registered dependent '$m' (${e.getMessage}); " +
                "aborting — a failed probe must not pass for a ghost",
                e)
          }
        }
        .toSeq.distinct.sorted
      require(dependents.isEmpty, s"$mv feeds registered view(s) " +
        s"${dependents.mkString(", ")} — drop those first, or " +
        "recompute them on a different base; deleting their base " +
        "would brick their next refresh")
    }
    kind match {
      case "fold" =>
        val d = readDef(s, mv)
        // the transplant-retargeted base is a BEST-EFFORT extra key: a
        // view whose cursor commits were all vacuumed (exactly the
        // broken view most in need of dropping) must still drop — fall
        // back to the definition's own base
        val effBase = scala.util.Try(effectiveDef(s, mv, d,
          TxnTable.currentVersion(s, mv))._1.base).getOrElse(d.base)
        Seq(d.base, effBase).distinct.foreach(b =>
          registry.computeIfPresent(b,
            (_, cur) => if (cur._1 == mv) null else cur))
      case "join" =>
        val d = readJoinDef(s, mv)
        joinRegistry.computeIfPresent(
          joinKey(d.fact, d.dims.map(_.dim)),
          (_, cur) => if (cur._1 == mv) null else cur)
      case "extrema" =>
        val d = readExtremaDef(s, mv)
        extremaRegistry.computeIfPresent(d.base,
          (_, cur) => if (cur._1 == mv) null else cur)
      case "live" =>
        val (d, _) = readLiveDef(s, mv)
        liveRegistry.computeIfPresent(
          joinKey(d.fact, d.dims.map(_.dim)),
          (_, cur) => if (cur._1 == mv) null else cur)
    }
    // through the Hadoop FileSystem like every other MatView/TxnTable
    // path operation — a java.io delete would silently no-op on a
    // non-local warehouse and leave a "successful" drop fully on disk
    val p = new Path(mv)
    require(fs(s, p).delete(p, true),
      s"$mv: the filesystem refused the recursive delete")
    kind
  }

  /** True iff base commits `(from, to]` are ALL content-invariant —
    * the only staleness an extrema MV may serve across: its fold has
    * no signed compensation (a delete in the tail can fell an extreme
    * in ways only the dirty-group recompute answers), and peeking at
    * feed signs would put a data read inside the optimizer. */
  private[graft] def invariantTail(s: SparkSession, base: String,
      from: Long, to: Long): Boolean =
    feedRefsE(s, base, from, to) match {
      case Right(refs) => refs.isEmpty
      case Left(_) => false
    }

  private[graft] def registryEmpty: Boolean =
    registry.isEmpty && joinRegistry.isEmpty &&
      extremaRegistry.isEmpty && liveRegistry.isEmpty

  /** Whether a view registered with base `b` COULD effectively serve
    * `base`: directly, or as a branch view whose parent is `base` (the
    * transplant shape) — the shared cheap pre-filter before the
    * per-view cursor walk in [[retentionPins]] and [[statusFor]]. */
  private def mayServe(b: String, base: String): Boolean = b == base ||
    (try parentOf(b) == base
     catch { case _: IllegalArgumentException => false })

  /** The version pins an MV-RESPECTING retention pass hands to
    * [[TxnTable.vacuum]] / [[TxnTable.expireSnapshots]] for `base`:
    * for every registered view whose incremental contract READS this
    * base's log tail, the commits `(cursor, head]`. That is the feed
    * tail for fold views and join FACTS (the range refresh and
    * query-time compensation fold), the manifest-header tail for
    * extrema bases AND join dims (proving a range content-invariant
    * reads every manifest in it — vacuuming those turns the view
    * recompute-only just as surely as a lost feed). Fold views match
    * by their EFFECTIVE base: a transplanted view's registry key may
    * still be the branch dir while its cursor speaks the parent
    * timeline, and matching by key alone would leave the parent's
    * feed tail unpinned while pinning branch versions against the
    * wrong log. Pinned versions survive the window like tagged ones,
    * so however aggressive the retention, the registered fleet's
    * refreshes keep working — without this, ONE vacuum(1) on a busy
    * base turns every stale view into a drop-and-recompute (at
    * 100 TB: the full base scan the MV exists to avoid, destroyed by
    * routine maintenance). A view whose cursor cannot be probed pins
    * nothing — it is already recompute-only. O(views) header walks,
    * no data reads; the SQL vacuum / expire_snapshots /
    * vacuum_preview procedures include these pins automatically. */
  def retentionPins(s: SparkSession, base: String): Set[Long] = {
    import scala.jdk.CollectionConverters._
    // ONE head probe for the vacuum target, shared across every view
    lazy val head = TxnTable.currentVersion(s, base)
    def tail(cursor: Long): Set[Long] =
      if (cursor >= head) Set.empty[Long]
      else (cursor + 1 to head).toSet
    def guarded(p: => Set[Long]): Set[Long] =
      try p
      catch { case scala.util.control.NonFatal(_) => Set.empty[Long] }
    val folds = registry.asScala.values.toSeq.collect {
      case (mv, d0) if mayServe(d0.base, base) => guarded {
        val mvVer = TxnTable.currentVersion(s, mv)
        val (dEff, cursor) = effectiveDef(s, mv, d0, mvVer)
        if (dEff.base != base) Set.empty[Long] else tail(cursor)
      }
    }
    val extremas = extremaRegistry.asScala.toSeq.collect {
      case (b, (mv, _)) if b == base => guarded {
        tail(cursorAt(s, mv, TxnTable.currentVersion(s, mv),
          "mv_base_version"))
      }
    }
    val joins = joinRegistry.asScala.values.toSeq.collect {
      case (mv, d) if d.fact == base ||
          d.dims.exists(_.dim == base) => guarded {
        val mvVer = TxnTable.currentVersion(s, mv)
        val factPins =
          if (d.fact != base) Set.empty[Long]
          else tail(cursorAt(s, mv, mvVer, "mv_base_version"))
        val dimPins = d.dims.indices.flatMap { i =>
          if (d.dims(i).dim != base) Set.empty[Long]
          else tail(cursorAt(s, mv, mvVer, dimCursorMetric(i)))
        }.toSet
        factPins ++ dimPins
      }
    }
    // live star views read ONLY the fact's feed tail (the dims join
    // back at query time from their own snapshots — no log tail of
    // theirs is ever read, so nothing of theirs needs pinning)
    val lives = liveRegistry.asScala.values.toSeq.collect {
      case (mv, d, _) if d.fact == base => guarded {
        tail(cursorAt(s, mv, TxnTable.currentVersion(s, mv),
          "mv_base_version"))
      }
    }
    (folds ++ extremas ++ joins ++ lives).flatten.toSet
  }

  /** One registered view's LOG-decided status snapshot: its primary
    * cursor (the fold/extrema base cursor; the FACT cursor for join
    * views), that base's head, `fresh` (every cursor at its head) and
    * `servable` — fresh, or stale in a way the view's own serving
    * algebra provably covers: a feed-complete tail for fold views, a
    * content-invariant tail for extrema, fact-feed-complete +
    * dim-invariant tails for join views. */
  case class MvStatus(mv: String, kind: String, fresh: Boolean,
      servable: Boolean, cursor: Long, head: Long)

  /** Every registered view whose definition involves `base` — fold and
    * extrema views over it, join views where it is the fact or one of
    * the dims — each probed against the LOG (O(tail headers) per view,
    * never a data file). A view whose probe throws (vacuumed cursor,
    * deleted directory) reports (fresh = false, servable = false,
    * cursor = -1) instead of failing the listing: an operator asking
    * "which views serve this table?" must see the broken one, not an
    * exception. Powers the `graft.ns.t.matviews` metadata table. */
  def statusFor(s: SparkSession, base: String): Seq[MvStatus] = {
    import scala.jdk.CollectionConverters._
    def guarded(mv: String, kind: String)(p: => MvStatus): MvStatus =
      try p catch { case scala.util.control.NonFatal(_) =>
        MvStatus(mv, kind, fresh = false, servable = false, -1L, -1L) }
    def compensable(b: String, cursor: Long, head: Long): Boolean =
      cursor == head ||
        (cursor < head && feedRefsE(s, b, cursor, head).isRight)
    // match by the EFFECTIVE base (the same rule retentionPins and the
    // rewrite's per-query re-resolution follow): a transplanted view
    // must list under its parent, never under the branch key with
    // parent-timeline cursor arithmetic. ONE effective-base probe per
    // candidate, reused by both the match and the status body; a view
    // whose probe THROWS still lists (broken) when its registry key or
    // stored base names this base — the operator must SEE it.
    val folds = registry.asScala.toSeq.flatMap { case (key, (mv, d0)) =>
      if (!mayServe(d0.base, base) && key != base) None
      else {
        val eff =
          try Some(effectiveDef(s, mv, d0,
            TxnTable.currentVersion(s, mv)))
          catch { case scala.util.control.NonFatal(_) => None }
        eff match {
          case Some((dEff, cursor)) if dEff.base == base =>
            Some(guarded(mv, "fold") {
              val head = TxnTable.currentVersion(s, dEff.base)
              MvStatus(mv, "fold", fresh = cursor == head,
                servable = compensable(dEff.base, cursor, head),
                cursor, head)
            })
          case Some(_) => None // effective base is a different table
          case None =>
            Some(MvStatus(mv, "fold", fresh = false, servable = false,
              -1L, -1L))
        }
      }
    }
    val extremas = extremaRegistry.asScala.toSeq.collect {
      case (b, (mv, _)) if b == base => guarded(mv, "extrema") {
        val mvVer = TxnTable.currentVersion(s, mv)
        val cursor = cursorAt(s, mv, mvVer, "mv_base_version")
        val head = TxnTable.currentVersion(s, b)
        MvStatus(mv, "extrema", fresh = cursor == head,
          servable = cursor == head ||
            (cursor < head && invariantTail(s, b, cursor, head)),
          cursor, head)
      }
    }
    val joins = joinRegistry.asScala.toSeq.collect {
      case (_, (mv, d)) if d.fact == base ||
          d.dims.exists(_.dim == base) => guarded(mv, "join") {
        val mvVer = TxnTable.currentVersion(s, mv)
        val cursor = cursorAt(s, mv, mvVer, "mv_base_version")
        val head = TxnTable.currentVersion(s, d.fact)
        val dimCursors = d.dims.indices.map(i =>
          cursorAt(s, mv, mvVer, dimCursorMetric(i)))
        val dimHeads = d.dims.map(r => TxnTable.currentVersion(s, r.dim))
        val dimsFresh = d.dims.indices.forall(i =>
          dimCursors(i) == dimHeads(i))
        // the OP-based range check, because that is what refreshJoin
        // and compensatedJoin actually accept: a change_noop dim
        // commit that recorded an (empty) feed is servable there, and
        // the listing must never report acceleration lost when the
        // rewrite would serve
        val dimsInvariant = d.dims.indices.forall(i =>
          dimCursors(i) == dimHeads(i) ||
            (dimCursors(i) < dimHeads(i) &&
              contentInvariantRange(s, d.dims(i).dim, dimCursors(i),
                dimHeads(i))))
        MvStatus(mv, "join", fresh = cursor == head && dimsFresh,
          servable = compensable(d.fact, cursor, head) && dimsInvariant,
          cursor, head)
      }
    }
    // a live view's dims can NEVER stale it (they join back at query
    // time), so freshness and servability speak the fact log alone —
    // a live view over a moved dim correctly lists fresh
    val lives = liveRegistry.asScala.toSeq.collect {
      case (_, (mv, d, _)) if d.fact == base ||
          d.dims.exists(_.dim == base) => guarded(mv, "live") {
        val mvVer = TxnTable.currentVersion(s, mv)
        val cursor = cursorAt(s, mv, mvVer, "mv_base_version")
        val head = TxnTable.currentVersion(s, d.fact)
        MvStatus(mv, "live", fresh = cursor == head,
          servable = compensable(d.fact, cursor, head), cursor, head)
      }
    }
    (folds ++ extremas ++ joins ++ lives).sortBy(st => (st.kind, st.mv))
  }

  private def freshDir(name: String): String =
    graft.Fs.freshScratch("graft_mv", name)

  private val D12 = DecimalType(12, 2)

  /** op_matview: the MANAGED incremental materialized view, end to end
    * — create at v0 (the only full base scan the MV ever pays), two
    * scattered merge-on-read CDC batches move the base (zero base data
    * files rewritten, feeds published from the same manifest writes),
    * ONE refresh folds both feeds into the per-status aggregate, a
    * second refresh no-ops (cursor already at head), and an MV
    * compact() between refreshes must not disturb the cursor (the
    * newest-first metrics walk). `mv_ok` carries the mechanics: the
    * refresh commit's cursor metric, the no-op (version unchanged),
    * the folded-commit counts, and — the scale claim made physical —
    * the refresh plan's input files contain NO base data file (its
    * reads are the two feed files plus the MV itself). Hashed output =
    * the refreshed MV rows, which the oracle checks against a DIRECT
    * recompute of the base's final content: incremental ≡ recompute,
    * through the managed object. At 100 TB: create pays the table
    * scan once; every refresh after that costs the delta. */
  def matView(s: SparkSession, dir: String): DataFrame = {
    val base = freshDir("mv_base")
    val mv = freshDir("mv_view")
    val src = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderstatus"), col("o_totalprice").cast(D12).as("price"))
    val k = col("o_orderkey")
    TxnTable.commit(s, base, TxnTable.stageIndexed(s, base,
      src.repartitionByRange(8, k).sortWithinPartitions(k), "o_orderkey"),
      expected = -1L, op = "create", schemaJson = src.schema.json)
    create(s, mv, base, "o_orderstatus", "price")
    // two scattered MoR change batches, feeds published in-commit
    def del(df: DataFrame) = df.select(k, col("o_orderstatus"),
      col("price"), lit("D").as("op"))
    def upd(df: DataFrame, st: String, bump: Int) = df.select(k,
      lit(st).as("o_orderstatus"),
      (col("price") + lit(bump).cast(D12)).cast(D12).as("price"),
      lit("U").as("op"))
    def ins(df: DataFrame, st: String, shift: Long) = df.select(
      (k + shift).as("o_orderkey"), lit(st).as("o_orderstatus"),
      col("price"), lit("U").as("op"))
    val ch1 = del(src.filter(pmod(k, lit(9)) === 0))
      .unionByName(upd(src.filter(pmod(k, lit(10)) === 0 &&
        pmod(k, lit(9)) =!= 0), "U", 100))
      .unionByName(ins(src.filter(pmod(k, lit(97)) === 0),
        "N", 100000000L))
    TxnTable.applyChangesMor(s, base, ch1, "o_orderkey", cdc = true)
    val untouched = pmod(k, lit(9)) =!= 0 && pmod(k, lit(10)) =!= 0
    val ch2 = del(src.filter(pmod(k, lit(11)) === 0 && untouched))
      .unionByName(upd(src.filter(pmod(k, lit(13)) === 0 && untouched &&
        pmod(k, lit(11)) =!= 0), "V", 200))
      .unionByName(ins(src.filter(pmod(k, lit(89)) === 0),
        "M", 200000000L))
    TxnTable.applyChangesMor(s, base, ch2, "o_orderkey", cdc = true)
    // an unrelated MV maintenance commit must not move the cursor
    TxnTable.compact(s, mv)
    val cursorBefore = lastRefreshed(s, mv)
    val r1 = refresh(s, mv)
    val r2 = refresh(s, mv) // already at head: no commit
    // the scale claim, physically: the refresh reads the feeds + the
    // MV — never a base DATA file (checked from the executed plan's
    // input files in MatViewSpec; here via the cheap manifest facts)
    val m = TxnTable.commitMetrics(s, mv, r1.mvVersion)
    val ok = cursorBefore == 0L && r1.baseVersion == 2L &&
      r1.commitsFolded == 2 && m.get("mv_base_version").contains(2L) &&
      r2.mvVersion == r1.mvVersion && r2.commitsFolded == 0 &&
      lastRefreshed(s, mv) == 2L
    TxnTable.snapshot(s, mv)
      .select(col("o_orderstatus"), col("n"),
        col("total").cast("double").as("total"))
      .withColumn("mv_ok", lit(ok))
  }
}
