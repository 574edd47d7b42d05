package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.{BooleanType, ByteType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, TimestampType}

/** PLAN-DERIVED segment skipping (VERDICT r16 item 1): the manifest
  * min/max bounds [[Sink]] records per data segment are applied to the
  * query's OWN filter predicates, automatically, for every entry point —
  * `readSnapshot`, `readSnapshotAt`, the `snapshot_at` SQL table
  * function, and every [[SlateStore]] pinned read — instead of only when
  * a caller hand-passes bounds to [[Sink.readSnapshotPruned]].
  *
  * Mechanism: the scan relation's [[FileIndex]] is wrapped in
  * [[SegmentPruningFileIndex]] (the Delta-Lake TahoeFileIndex shape —
  * data skipping injected at the file-listing seam Spark already owns).
  * `FileSourceScanExec` hands `listFiles` the pushed-down DATA FILTERS at
  * physical-planning time; each one that is a supported range/equality
  * shape over a stats column is evaluated against every segment's
  * committed bounds, and files of provably-excluded segments are dropped
  * from the returned listing — never opened, never planned into tasks,
  * invisible to row-group pruning cost. Multi-column predicates compose
  * for free (each conjunct may exclude on a different column — both
  * z-order dims at once, VERDICT r16 item 1's ask).
  *
  * Conservatism contract (the same one [[Sink.readSnapshotPruned]]
  * documents): a segment is skipped only on a PROVEN exclusion — bounds
  * absent for the referenced column, an unsupported predicate shape, a
  * non-literal comparand, an unparseable bound, or a tag/type mismatch
  * all KEEP the segment. The residual filter still runs above the scan,
  * so the result is exact whether or not skipping fired. Null semantics:
  * `min`/`max` ignore nulls, and every supported predicate shape is
  * null-rejecting (a null row never satisfies `=`, `<`, `>`, `IN`), so
  * skipping a segment can only ever drop rows the residual filter would
  * have dropped anyway; `IsNull`/`<=> null` are unsupported shapes and
  * keep everything.
  */
private[graft] object SegmentPruning {

  /** Wrap `df`'s parquet relation so its file listing skips segments
    * whose bounds exclude the query's pushed data filters. `statsBySeg`
    * maps segment id → the manifest stats string ([[Sink]]'s grammar);
    * segments absent from the map are always kept. Identity when no
    * segment carries stats (nothing to prune by).
    */
  def install(df: DataFrame, statsBySeg: Map[String, String]): DataFrame = {
    if (statsBySeg.isEmpty) return df
    val spark = df.sparkSession
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation
            if !h.location.isInstanceOf[SegmentPruningFileIndex] =>
          lr.copy(relation =
            h.copy(location = new SegmentPruningFileIndex(h.location, statsBySeg))(
              h.sparkSession))
        case _ => lr
      }
    }
    org.apache.spark.sql.GraftSqlShim.ofRows(spark, plan)
  }

  /** The `__seg=<id>` path component of a segment file/dir, if any. */
  private[ops] def segIdOf(path: Path): Option[String] = {
    var p = path
    while (p != null) {
      val n = p.getName
      if (n.startsWith("__seg=")) return Some(n.stripPrefix("__seg="))
      p = p.getParent
    }
    None
  }

  /** True when every pushed filter MAY match a segment with `stats`
    * bounds; false = provably no row matches (skip it). Filters arrive
    * as split conjuncts, so one excluding conjunct excludes the segment.
    */
  private[ops] def mayMatch(stats: String, filters: Seq[Expression]): Boolean = {
    if (stats == Sink.EmptySegStats) return false // zero rows: skip
    !filters.exists(f => excludes(stats, f))
  }

  /** Comparand rendered into the bound domain: Left = numeric, Right =
    * the lexical (UTF-8 byte order) rendering [[Sink.segmentStats]]
    * writes for strings, dates, timestamps, and booleans. None =
    * unsupported literal type (keep the segment).
    */
  private def comparand(lit: Literal): Option[Either[BigDecimal, String]] =
    (lit.value, lit.dataType) match {
      case (null, _) => None // null comparand proves nothing — keep
      case (v: Number, ByteType | ShortType | IntegerType | LongType) =>
        Some(scala.util.Left(BigDecimal(v.longValue())))
      // floats/doubles go through toString — the SAME rendering the
      // stats writer used — never a float→double widening: BigDecimal of
      // 0.1f's double value is 0.100000001490…, strictly above the
      // stats string "0.1", and `a >= 0.1f` would then wrongly skip a
      // segment whose max is exactly 0.1f (review finding). Shortest-
      // repr toString is order-preserving, so same-typed comparisons
      // stay exact.
      case (v: java.lang.Float, FloatType) if java.lang.Float.isFinite(v) =>
        Some(scala.util.Left(BigDecimal(v.toString)))
      case (v: java.lang.Double, DoubleType) if java.lang.Double.isFinite(v) =>
        Some(scala.util.Left(BigDecimal(v.toString)))
      case (v: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
        Some(scala.util.Left(v.toBigDecimal))
      case (v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        Some(scala.util.Right(v.toString))
      case (days: java.lang.Integer, DateType) =>
        // stats render java.sql.Date.toString = ISO yyyy-MM-dd
        Some(scala.util.Right(java.time.LocalDate.ofEpochDay(days.toLong).toString))
      case (micros: java.lang.Long, TimestampType) =>
        // stats render fixed-width UTC (Sink.segmentStats) — micros
        // rendered identically compare lexically
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
        val inst = java.time.Instant.EPOCH.plus(micros.longValue(),
          java.time.temporal.ChronoUnit.MICROS)
        Some(scala.util.Right(inst.atZone(java.time.ZoneOffset.UTC).toLocalDateTime
          .format(fmt)))
      case (b: java.lang.Boolean, BooleanType) => Some(scala.util.Right(b.toString))
      case _ => None
    }

  private def u8cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  /** cmp(bound, v) sign, or None when the bound/tag and the comparand
    * live in different domains (legacy numeric-tagged stats vs a string
    * literal, an unparseable bound) — inconclusive, keep. */
  private def cmpBound(tag: String, bound: String,
                       v: Either[BigDecimal, String]): Option[Int] =
    (tag, v) match {
      case ("n", scala.util.Left(num)) =>
        try Some(BigDecimal(bound).compare(num))
        catch { case _: NumberFormatException => None }
      case ("s", scala.util.Right(s)) => Some(Integer.signum(u8cmp(bound, s)))
      case _ => None
    }

  /** True when `f` PROVES the segment holds no matching row. Each arm
    * states its exclusion in terms of `cMin = cmp(min, v)` and
    * `cMax = cmp(max, v)` over the segment's [min, max]:
    * {{{
    *   a =  v   excluded iff max < v || min > v
    *   a >  v   excluded iff max <= v       (no row strictly above v)
    *   a >= v   excluded iff max <  v
    *   a <  v   excluded iff min >= v       (no row strictly below v)
    *   a <= v   excluded iff min >  v
    * }}}
    * with the literal-first forms mirrored (`v < a` ⇔ `a > v`, …).
    */
  private def excludes(stats: String, f: Expression): Boolean = {
    def bnd(a: Attribute, l: Literal): Option[(Int, Int)] = for {
      (tag, mn, mx) <- Sink.statsBound(stats, a.name)
      v <- comparand(l)
      cMin <- cmpBound(tag, mn, v)
      cMax <- cmpBound(tag, mx, v)
    } yield (cMin, cMax)
    def eqOut(a: Attribute, l: Literal) =
      bnd(a, l).exists { case (cMin, cMax) => cMax < 0 || cMin > 0 }
    def gtOut(a: Attribute, l: Literal) = // a > v
      bnd(a, l).exists { case (_, cMax) => cMax <= 0 }
    def geOut(a: Attribute, l: Literal) = // a >= v
      bnd(a, l).exists { case (_, cMax) => cMax < 0 }
    def ltOut(a: Attribute, l: Literal) = // a < v
      bnd(a, l).exists { case (cMin, _) => cMin >= 0 }
    def leOut(a: Attribute, l: Literal) = // a <= v
      bnd(a, l).exists { case (cMin, _) => cMin > 0 }
    f match {
      case And(l, r) => excludes(stats, l) || excludes(stats, r)
      case Or(l, r) => excludes(stats, l) && excludes(stats, r)
      case EqualTo(a: Attribute, l: Literal) => eqOut(a, l)
      case EqualTo(l: Literal, a: Attribute) => eqOut(a, l)
      case EqualNullSafe(a: Attribute, l: Literal) if l.value != null => eqOut(a, l)
      case EqualNullSafe(l: Literal, a: Attribute) if l.value != null => eqOut(a, l)
      case GreaterThan(a: Attribute, l: Literal) => gtOut(a, l)
      case GreaterThan(l: Literal, a: Attribute) => ltOut(a, l) // v > a ⇔ a < v
      case GreaterThanOrEqual(a: Attribute, l: Literal) => geOut(a, l)
      case GreaterThanOrEqual(l: Literal, a: Attribute) => leOut(a, l)
      case LessThan(a: Attribute, l: Literal) => ltOut(a, l)
      case LessThan(l: Literal, a: Attribute) => gtOut(a, l) // v < a ⇔ a > v
      case LessThanOrEqual(a: Attribute, l: Literal) => leOut(a, l)
      case LessThanOrEqual(l: Literal, a: Attribute) => geOut(a, l)
      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        vs.forall(v => eqOut(a, v.asInstanceOf[Literal]))
      case _ => false
    }
  }
}

/** The wrapping [[FileIndex]]: delegates everything to the inner
  * (partition-discovering, eagerly-listed) index and drops files of
  * provably-excluded segments from `listFiles`. Listing cost is the
  * inner index's (unchanged vs the unpruned read); the win is every
  * excluded segment's scan — no tasks, no footer reads, no row groups.
  * A caller that can hand bounds BEFORE listing still uses
  * [[Sink.readSnapshotPruned]], which skips at the manifest level.
  */
private[graft] final class SegmentPruningFileIndex(
    inner: FileIndex,
    statsBySeg: Map[String, String]) extends FileIndex {

  override def rootPaths: Seq[Path] = inner.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val listed = inner.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty) listed
    else {
      // decide once per SEGMENT, not per file — a 100 TB segment holds
      // thousands of files and the bounds evaluation parses the stats
      // string; the listing loop itself must stay O(files)
      val decided = scala.collection.mutable.HashMap.empty[String, Boolean]
      def keepSeg(seg: String): Boolean = decided.getOrElseUpdate(seg,
        statsBySeg.get(seg)
          .forall(st => SegmentPruning.mayMatch(st, dataFilters)))
      listed
        .map { dir =>
          val kept = dir.files.filter(f =>
            SegmentPruning.segIdOf(f.getPath).forall(keepSeg))
          if (kept.length == dir.files.length) dir else dir.copy(files = kept)
        }
        .filter(_.files.nonEmpty)
    }
  }

  override def inputFiles: Array[String] = inner.inputFiles
  override def refresh(): Unit = inner.refresh()
  override def sizeInBytes: Long = inner.sizeInBytes
  override def partitionSchema: org.apache.spark.sql.types.StructType =
    inner.partitionSchema
  override def metadataOpsTimeNs: Option[Long] = inner.metadataOpsTimeNs
}
