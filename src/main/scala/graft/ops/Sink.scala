package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{CreateFlag, FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Parquet sink discipline (SURVEY.md §2.1 S7/S8 upgraded for scale).
  *
  * The reference's two write modes — append inserts and drop-then-reload
  * (/root/reference/main.py:38-46,66) — become atomic overwrite and
  * partition-clustered layout here. Layout rules that matter at 100 TB:
  * partition directories on the keys queries filter by (partition pruning),
  * rows sorted within files on the secondary access key (parquet min/max
  * row-group pruning), and bounded file sizes so a single task never
  * produces a multi-GB file.
  */
object Sink {

  /** Atomic snapshot replacement via a versioned-directory pointer commit
    * — closing the reference's drop-then-load window
    * (/root/reference/main.py:44-46: `DELETE FROM` then reload) for real.
    * A bare `mode("overwrite").parquet(path)` does NOT close it: Spark
    * deletes the directory before writing, so a concurrent reader hits
    * exactly the missing/partial table the reference exposes.
    *
    * Layout (a minimal table-format commit, the same shape Delta/Iceberg
    * use):
    * {{{
    *   path/v-<uuid>/   immutable parquet snapshots, written mode("error")
    *   path/_current    one-line pointer file naming the live version
    * }}}
    * Commit = write the new snapshot dir fully, then REPLACE `_current`
    * with an atomic file rename (POSIX `rename(2)` locally, HDFS's native
    * overwrite-rename on HDFS; object stores need a real table format and
    * are out of scope). [[readSnapshot]] resolves the pointer, so a reader sees
    * the old table until the instant of the rename and the new one after —
    * never neither, never a mix.
    *
    * MVCC retention: after commit, a superseded snapshot dir is deleted
    * only when BOTH hold — it is beyond the `retain` most-recently-
    * superseded versions AND at least `minAgeMs` has elapsed since it was
    * superseded (each commit drops a `_superseded-<version>` marker whose
    * mtime records that instant). Count-based retention alone is not safe:
    * a burst of commits can outrun a reader whose scan pinned an old
    * version at plan time, yanking its files mid-query. The time floor is
    * exactly Delta's VACUUM retention / Iceberg's `expire_snapshots`
    * contract — set `minAgeMs` above the longest query a reader runs
    * against the table (default 10 min; pass 0 to reclaim space eagerly
    * when no concurrent readers exist).
    *
    * Crash-safety: a writer dying before the rename leaves an orphan
    * `v-*` dir and a stale tmp pointer; `_current` still names the old
    * complete snapshot, and the next successful commit GCs the orphans.
    */
  /** Returns the committed version's directory name (`v-...`) so a caller
    * that must keep serving EXACTLY this snapshot (e.g. SlateStore's
    * in-session cache, which outlives later recommits of the same table)
    * can pin it instead of following the advancing pointer.
    *
    * `sidecars` (name → content, names must be `_`-prefixed so parquet
    * file listing ignores them) are written INSIDE the version dir before
    * the pointer swap: metadata and data then form one atomic unit — a
    * reader that resolved a version reads THAT version's sidecars, immune
    * to a foreign recommit landing between the two reads (ADVICE r14:
    * root-level sidecars let an attach pair the new data with the old tag
    * check).
    */
  def overwriteSnapshot(df: DataFrame, path: String, retain: Int = 1,
                        minAgeMs: Long = 600000L,
                        partitionColumns: Seq[String] = Nil,
                        sidecars: Map[String, String] = Map.empty): String = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val version = "v-" + java.util.UUID.randomUUID().toString.replace("-", "")
    val previous = if (fs.exists(root)) currentVersion(fs, root) else None
    // partitionColumns lay the snapshot out as partition directories
    // (dir-pruned reads for consumers that filter on them — the IVF cell
    // postings layout); the pointer-commit protocol is unchanged
    val writer =
      if (partitionColumns.isEmpty) df.write
      else df.write.partitionBy(partitionColumns: _*)
    writer.mode("error").parquet(new Path(root, version).toString)
    writeVersionSidecars(conf, root, version, sidecars)
    commitPointer(conf, fs, root, version, previous, retain, minAgeMs)
    version
  }

  /** [[overwriteSnapshot]]'s segmented twin: the table's data lives in
    * immutable SEGMENT directories under `path/segs/__seg=<id>/`, and a
    * committed version is a tiny `_manifest` file (one segment id per
    * line) inside its `v-*` dir — the Iceberg/Delta metadata-plus-
    * data-files shape on the same pointer-commit protocol. A rewrite
    * commits ONE fresh segment carrying the whole table; an append
    * ([[appendSegment]]) commits a DELTA-sized segment plus a manifest
    * that re-lists the previous generation's segments, so the write cost
    * of an append is proportional to the delta, not the corpus — the
    * bound a daily-append 100 TB index lives or dies by. Readers resolve
    * the manifest and scan the listed segments as one partitioned
    * relation (`__seg` is a discovered partition level under
    * `basePath=segs/`), so partition pruning on `partitionColumns` (the
    * IVF probe path) works across segments exactly as on a single dir.
    *
    * Retention: version GC is unchanged (manifests are versions); a
    * segment is reclaimed when NO retained version's manifest references
    * it AND it is older than `minAgeMs` — the same dual gate, which also
    * shields an in-flight writer's just-written segment. Time travel
    * ([[readSnapshotAt]]) serves any retained manifest's exact segment
    * set; segments are immutable, so a pinned generation is stable.
    */
  def overwriteSegmented(df: DataFrame, path: String, retain: Int = 1,
                         minAgeMs: Long = 600000L,
                         partitionColumns: Seq[String] = Nil,
                         sidecars: Map[String, String] = Map.empty): String =
    commitSegments(df, path, retain, minAgeMs, partitionColumns, sidecars,
      carryPrevious = false)

  /** Append `delta` to a segmented table as one new segment: every row of
    * the live generation survives (the caller's contract — removals or
    * rewrites need [[overwriteSegmented]]), the new manifest lists the
    * previous segments plus the delta's. Fails fast on a table whose live
    * version is a plain data snapshot (commit it through
    * [[overwriteSegmented]] once to migrate).
    *
    * SINGLE-WRITER contract: an append derives its manifest from the
    * live version, so two uncoordinated appenders would each publish a
    * manifest missing the other's segment — for a rewrite last-writer-
    * wins is benign, for an append it is silent data loss. The commit
    * re-checks the pointer immediately before the swap and throws
    * `ConcurrentModificationException` if it moved (the staged segment
    * and manifest are cleaned up; retry re-derives from the new live
    * manifest); the remaining marker-to-swap window is why writers must
    * still be serialized — [[SlateStore]]'s per-table build lease
    * provides that for managed tables.
    */
  def appendSegment(delta: DataFrame, path: String, retain: Int = 1,
                    minAgeMs: Long = 600000L,
                    partitionColumns: Seq[String] = Nil,
                    sidecars: Map[String, String] = Map.empty): String =
    commitSegments(delta, path, retain, minAgeMs, partitionColumns, sidecars,
      carryPrevious = true)

  private def commitSegments(df: DataFrame, path: String, retain: Int,
                             minAgeMs: Long, partitionColumns: Seq[String],
                             sidecars: Map[String, String],
                             carryPrevious: Boolean): String = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val previous = if (fs.exists(root)) currentVersion(fs, root) else None
    val carried =
      if (!carryPrevious) Nil
      else {
        val prev = previous.getOrElse(throw new IllegalStateException(
          s"appendSegment: no committed version to append to at $path"))
        val m = manifestSegments(fs, new Path(root, prev)).getOrElse(
          throw new IllegalStateException(
            s"appendSegment: live version $prev at $path is a plain data " +
              "snapshot, not a segmented one — migrate via overwriteSegmented"))
        m
      }
    // the segment id gets a non-numeric prefix so partition-value type
    // inference can never read an (all-digit) id as a number
    val seg = "s" + java.util.UUID.randomUUID().toString.replace("-", "")
    val segDir = new Path(new Path(root, SegsDir), s"__seg=$seg")
    val writer =
      if (partitionColumns.isEmpty) df.write
      else df.write.partitionBy(partitionColumns: _*)
    writer.mode("error").parquet(segDir.toString)
    val version = "v-" + java.util.UUID.randomUUID().toString.replace("-", "")
    // the manifest is written inside the not-yet-published version dir —
    // no reader can observe a partial manifest version
    fs.mkdirs(new Path(root, version))
    atomicWrite(conf, new Path(new Path(root, version), ManifestFile),
      (carried :+ seg).mkString("\n"))
    writeVersionSidecars(conf, root, version, sidecars)
    // append CAS: the manifest re-lists `previous`'s segments, so a
    // pointer that moved since invalidates it — fail (and clean the
    // staged files) instead of silently dropping the other commit's
    // delta from the live table (review fix)
    if (carryPrevious && currentVersion(fs, root) != previous) {
      fs.delete(new Path(root, version), true)
      fs.delete(segDir, true)
      throw new java.util.ConcurrentModificationException(
        s"appendSegment: a concurrent commit advanced $path past " +
          s"${previous.getOrElse("<none>")} while this append staged — " +
          "serialize appenders (SlateStore's build lease) and retry")
    }
    commitPointer(conf, fs, root, version, previous, retain, minAgeMs)
    version
  }

  private val SegsDir = "segs"
  private val ManifestFile = "_manifest"

  /** Read a small metadata file (pointer, marker, manifest, sidecar)
    * fully into a string — the one shared reader for every control file
    * this layer writes. */
  private[ops] def readSmallText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** The segment ids a manifest version lists, or None for a plain data
    * version (no `_manifest`). */
  private def manifestSegments(fs: FileSystem, versionDir: Path): Option[Seq[String]] = {
    val mf = new Path(versionDir, ManifestFile)
    if (!fs.exists(mf)) None
    else Some(readSmallText(fs, mf)
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq)
  }

  /** How to scan a committed version's DATA: `(paths, basePath)`. A plain
    * version scans its own dir (no basePath); a manifest version scans
    * its listed segment dirs with `basePath = <table>/segs` so `__seg`
    * (and any partition columns below it) resolve as partition levels.
    * Callers reading with a forced schema should re-select the schema's
    * fields to drop the synthetic `__seg` column.
    */
  private[ops] def versionDataPaths(fs: FileSystem, root: Path,
                                    version: String): (Seq[String], Option[String]) = {
    val vdir = new Path(root, version)
    manifestSegments(fs, vdir) match {
      case None => (Seq(vdir.toString), None)
      case Some(segs) =>
        val base = new Path(root, SegsDir)
        (segs.map(s => new Path(base, s"__seg=$s").toString),
          Some(base.toString))
    }
  }

  /** Open a committed version's data as a DataFrame (manifest-aware). */
  private[ops] def readVersion(spark: SparkSession, root: Path, version: String,
                               schema: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val (paths, basePath) = versionDataPaths(fs, root, version)
    readPaths(spark, paths, basePath, schema)
  }

  private[ops] def readPaths(spark: SparkSession, paths: Seq[String],
                             basePath: Option[String],
                             schema: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
    val reader0 = schema.fold(spark.read)(spark.read.schema)
    val reader = basePath.fold(reader0)(bp => reader0.option("basePath", bp))
    val df = reader.parquet(paths: _*)
    (schema, basePath) match {
      // drop the synthetic __seg partition column and restore the stored
      // column order (partition discovery appends partition columns)
      case (Some(s), Some(_)) => df.select(s.fieldNames.map(col): _*)
      case (None, Some(_)) => df.drop("__seg")
      case _ => df
    }
  }

  private def writeVersionSidecars(conf: org.apache.hadoop.conf.Configuration,
                                   root: Path, version: String,
                                   sidecars: Map[String, String]): Unit =
    sidecars.foreach { case (name, content) =>
      require(name.startsWith("_"), s"sidecar name must be _-prefixed: $name")
      atomicWrite(conf, new Path(new Path(root, version), name), content)
    }

  /** The shared commit tail: supersession marker (pre-swap, monotonic
    * seq), atomic pointer swap, then the dual-gate GC over versions,
    * unreferenced segments, and crashed writers' tmp files.
    *
    * Pointer staged through FileContext (raw fs — no checksum shadow
    * files), then swapped in with a genuinely atomic replace (POSIX
    * rename(2) locally — see [[atomicWrite]]).
    * The supersession marker of the displaced version lands BEFORE the
    * pointer swap: a crash between swap and marker would leave a
    * committed, hours-live version with neither pointer nor marker —
    * invisible to the committed-only listVersions forever and GC'd as an
    * orphan (review fix). The pre-swap marker's worst case is benign: a
    * crash before the swap leaves the still-live version carrying a
    * stale marker, which listVersions ignores (the live pointer wins)
    * and the next successful commit overwrites. The marker CONTENT is a
    * monotonic sequence number (1 + the max across existing markers):
    * two commits landing inside the filesystem's timestamp granularity
    * would tie on mtime and could misorder history — seq is the primary
    * history order, mtime only breaks ties among legacy (empty) markers
    * (ADVICE r14 medium).
    */
  private def commitPointer(conf: org.apache.hadoop.conf.Configuration,
                            fs: FileSystem, root: Path, version: String,
                            previous: Option[String], retain: Int,
                            minAgeMs: Long): Unit = {
    previous.filterNot(_ == version).foreach { old =>
      val next = 1L + markerStatuses(fs, root)
        .map(m => markerSeq(fs, m.getPath)).foldLeft(-1L)(math.max)
      atomicWrite(conf, new Path(root, s"_superseded-$old"), next.toString)
    }
    atomicWrite(conf, new Path(root, "_current"), version)

    // GC superseded snapshots beyond BOTH retention gates: keep the
    // `retain` most recently superseded, and never delete one superseded
    // (or, for orphans of crashed writers, created) less than minAgeMs ago
    // — a concurrent reader's scan may still hold file handles into it.
    // `retain` counts COMMITTED superseded versions only (marker'd dirs —
    // the set [[listVersions]] serves): a markerless in-flight/crashed
    // dir must not consume a retain slot, else an orphan evicts the very
    // version readSnapshotAt promises one step back (review fix). Orphans
    // are reclaimed purely by the time floor, which equally shields an
    // IN-FLIGHT writer's dir for minAgeMs.
    val now = System.currentTimeMillis()
    val nonLive = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-"))
      .filterNot(_.getPath.getName == version)
    val (committed, orphans) = nonLive.partition(s =>
      fs.exists(new Path(root, s"_superseded-${s.getPath.getName}")))
    val stale = (committed
        .map(s => (s, supersededKey(fs, root, s)))
        .sortBy { case (_, (seq, mt)) => (-seq, -mt) }
        .drop(retain) ++
      orphans.map(s => (s, supersededKey(fs, root, s))))
      .filter { case (_, (_, at)) => now - at >= minAgeMs }
    stale.foreach { case (s, _) =>
      fs.delete(s.getPath, true)
      fs.delete(new Path(root, s"_superseded-${s.getPath.getName}"), false)
    }
    // segment GC: a segment referenced by NO version dir still on disk
    // (live, retained, or an in-flight/crashed writer's — an orphan
    // manifest protects its segments until the orphan itself ages out)
    // is unreachable by any reader resolving any manifest; reclaim it
    // once past the same time floor that shields in-flight writes
    val segsRoot = new Path(root, SegsDir)
    if (fs.exists(segsRoot)) {
      val referenced = fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-"))
        .flatMap(s => manifestSegments(fs, s.getPath).getOrElse(Nil))
        .toSet
      fs.listStatus(segsRoot)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("__seg="))
        .filterNot(s => referenced(s.getPath.getName.stripPrefix("__seg=")))
        .filter(s => now - s.getModificationTime >= minAgeMs)
        .foreach(s => fs.delete(s.getPath, true))
    }
    // stale tmp files (pointer/marker/lease stages) from crashed
    // writers — age-gated by the same floor that shields in-flight
    // version dirs (review fix: an unconditional sweep could delete a
    // CONCURRENT writer's just-staged marker tmp mid-commit; with
    // minAgeMs = 0 the caller has declared the dir free of concurrent
    // writers, the same contract the orphan-dir GC already rides)
    fs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.contains(".tmp-"))
      .filter(s => now - s.getModificationTime >= minAgeMs)
      .foreach(s => fs.delete(s.getPath, false))
  }

  /** Atomically publish small metadata `content` at `dst`: stage a tmp
    * sibling through FileContext (raw fs — no checksum shadow files), then
    * swap it in with a genuinely atomic replace. A reader concurrent with
    * the swap sees either the previous complete content or the new one —
    * never a truncated file (ADVICE r14: CREATE+OVERWRITE truncates in
    * place, so a mid-write reader of `_schema` crashed out of attach).
    * CAREFUL: FileContext.rename(OVERWRITE) is only atomic where the
    * AbstractFileSystem implements it natively (HDFS does); Hadoop's
    * default local implementation is delete-then-rename, which re-opens
    * the very torn-read window this helper exists to close — so local
    * paths take POSIX rename(2) via NIO instead. The tmp name keeps the
    * destination's leading underscore, so a parquet FileIndex listing the
    * directory mid-commit ignores it.
    */
  private[ops] def atomicWrite(conf: org.apache.hadoop.conf.Configuration,
                               dst: Path, content: String): Unit = {
    val fs = dst.getFileSystem(conf)
    val fc = FileContext.getFileContext(dst.toUri, conf)
    val tmp = new Path(dst.getParent, dst.getName + ".tmp-" +
      java.util.UUID.randomUUID().toString.replace("-", ""))
    val out = fc.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE))
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (fs.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      fc.rename(tmp, dst, Options.Rename.OVERWRITE)
    }
  }

  /** Resolve a [[overwriteSnapshot]] table to its live version. One
    * bounded retry absorbs the benign race where the pointer advances and
    * GC claims the resolved dir between resolution and plan construction
    * (possible only when >`retain` commits land inside that microsecond
    * window).
    */
  def readSnapshot(spark: SparkSession, path: String): DataFrame =
    readSnapshot(spark, path, None)

  /** Schema-forcing variant: `schema` (the captured write-time schema)
    * makes an EMPTY snapshot read back as zero rows instead of failing
    * parquet schema inference — the [[graft.ops.SlateStore]] totality
    * contract.
    */
  def readSnapshot(spark: SparkSession, path: String,
                   schema: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def attempt(retriesLeft: Int): DataFrame = {
      val v = currentVersion(fs, root).getOrElse(
        throw new java.io.FileNotFoundException(s"no committed snapshot at $path"))
      try {
        val df = readVersion(spark, root, v, schema)
        df.schema // force resolution so a vanished dir surfaces here
        df
      } catch {
        case e: org.apache.spark.sql.AnalysisException if retriesLeft > 0 &&
            !fs.exists(new Path(root, v)) => attempt(retriesLeft - 1)
      }
    }
    attempt(3)
  }

  /** COMMITTED version history of an [[overwriteSnapshot]] table, newest
    * first: the live version (the `_current` pointer), then each retained
    * superseded version ordered by its supersession order (the
    * `_superseded-*` marker's commit sequence number, mtime for legacy
    * markers — the same key the retention GC sorts by). Only versions
    * that ever COMMITTED are listed: a `v-*` dir
    * with neither the pointer nor a supersession marker is an in-flight
    * or crashed writer's dir (the marker is written exactly when a
    * successful commit displaces a version), and including it would
    * hand [[readSnapshotAt]] a partial or empty snapshot AND shift every
    * real version one slot down. Driver-side metadata listing only.
    */
  def listVersions(spark: SparkSession, path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Nil
    else {
      val live = currentVersion(fs, root)
      val others = fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-"))
        .filterNot(s => live.contains(s.getPath.getName))
        .filter(s => fs.exists(
          new Path(root, s"_superseded-${s.getPath.getName}")))
        .map(s => (s.getPath.getName, supersededKey(fs, root, s)))
        .sortBy { case (_, (seq, mt)) => (-seq, -mt) }
        .map(_._1)
      live.toSeq ++ others
    }
  }

  /** Time-travel read: the table as of `stepsBack` commits ago (0 = the
    * live snapshot, same table [[readSnapshot]] serves). Publish with
    * `retain >= stepsBack` — and a `minAgeMs` floor above reader latency
    * where foreign readers exist — or the version is already GC'd, which
    * surfaces as FileNotFoundException, never a partial read. This is the
    * rollback/audit read a versioned sink owes its operators: yesterday's
    * corpus is one argument away while the pointer still serves today's.
    * A pinned version dir is immutable, so the returned frame is stable
    * for the reader's lifetime (subject to the retention gates).
    */
  def readSnapshotAt(spark: SparkSession, path: String, stepsBack: Int,
                     schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    require(stepsBack >= 0, s"stepsBack must be >= 0, got $stepsBack")
    val versions = listVersions(spark, path)
    if (versions.size <= stepsBack)
      throw new java.io.FileNotFoundException(
        s"no snapshot $stepsBack commits back at $path " +
          s"(${versions.size} version(s) on disk — raise `retain`)")
    readVersion(spark, new Path(path), versions(stepsBack), schema)
  }

  /** History-order key for a non-live version: (marker sequence number,
    * marker mtime). The sequence — written into the marker at commit time
    * — is the primary order: monotonic per table, immune to filesystem
    * timestamp granularity (two same-millisecond commits tie on mtime but
    * never on seq). Legacy empty markers parse to -1 and order by mtime
    * among themselves, correctly below every seq-stamped marker (they
    * predate the first stamped commit). Orphans (no marker) key on the
    * dir's own mtime — only their TIME component is ever used (the GC
    * grace floor); they never enter history. Shared by the retention GC
    * and [[listVersions]] so both order history identically. */
  private def supersededKey(fs: FileSystem, root: Path,
                            s: org.apache.hadoop.fs.FileStatus): (Long, Long) = {
    val marker = new Path(root, s"_superseded-${s.getPath.getName}")
    if (fs.exists(marker))
      (markerSeq(fs, marker), fs.getFileStatus(marker).getModificationTime)
    else (-1L, s.getModificationTime)
  }

  private def markerStatuses(fs: FileSystem, root: Path) =
    fs.listStatus(root).filter(s => s.isFile &&
      s.getPath.getName.startsWith("_superseded-") &&
      !s.getPath.getName.contains(".tmp-"))

  /** The monotonic commit sequence stored in a supersession marker, or -1
    * for legacy (empty / unparseable) markers. */
  private def markerSeq(fs: FileSystem, marker: Path): Long = {
    val text = readSmallText(fs, marker).trim
    try text.toLong catch { case _: NumberFormatException => -1L }
  }

  private[ops] def currentVersion(fs: FileSystem, root: Path): Option[String] = {
    val ptr = new Path(root, "_current")
    if (!fs.exists(ptr)) None
    else Some(readSmallText(fs, ptr).trim)
  }

  /** Partitioned, clustered write: one shuffle to co-locate partition
    * values, an in-partition sort for row-group pruning on `sortCols`, and
    * a file-size cap. With `spark.sql.sources.partitionOverwriteMode=
    * dynamic`, overwrite replaces only the partitions present in `df` —
    * the idempotent-retry write used by the incremental pipeline.
    */
  def writeClustered(df: DataFrame, path: String,
                     partitionCols: Seq[String], sortCols: Seq[String],
                     maxRecordsPerFile: Long = 5000000L): Unit = {
    // Sort prefix = partition columns: FileFormatWriter requires rows
    // ordered by partition keys before writing; satisfying that ordering
    // here makes it skip its own (secondary-order-destroying) sort, so the
    // sortCols clustering actually survives into the files.
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** JSONL (newline-delimited JSON) export — the interchange format LLM
    * training-data consumers actually ingest (one document object per
    * line, gzip per shard). `shardCol` drives both the directory layout
    * (partition pruning for consumers that read a subset) and the shard
    * boundaries [[graft.ops.LlmOps.packSequences]] planned; `maxRecords
    * PerFile` caps shard size so a downstream loader never sees a
    * multi-GB line file. Same atomic-overwrite discipline as the parquet
    * sinks.
    */
  def writeJsonl(df: DataFrame, path: String, shardCol: String,
                 maxRecordsPerFile: Long = 1000000L,
                 compress: Boolean = true): Unit = {
    val w = df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol))
      .write
      .partitionBy(shardCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }
}
