package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thrown when a rewriter op (compaction, merge, erasure, vacuum) finds
  * the exclusive `_snapshots/compact.lock` already held. A TYPED class
  * (extending IllegalStateException for source compatibility with
  * callers matching the old message) so retry loops — the streaming CDC
  * sink above all — can classify a lock collision structurally instead
  * of grepping exception text, which silently turns fatal the day the
  * message is reworded. */
final class LockHeldException(msg: String, cause: Throwable)
  extends IllegalStateException(msg, cause)

/** Thrown when [[Upsert.writeSnapshotGated]]'s drift gate refuses a
  * publish. TYPED (extending IllegalStateException with the same
  * message prefix for source compatibility) so dead-letter routing —
  * the gated streaming sink's quarantine above all — classifies a
  * refusal structurally instead of matching exception text, which
  * silently turns a quarantine into stream death the day the message
  * is reworded. */
final class DriftRefusedException(msg: String)
  extends IllegalStateException(msg)

/** Idempotent-append ("upsert") semantics of the reference's sink
  * (SURVEY.md §2.9; ref `etl.py:182-191, 331-341, 438-449`).
  *
  * The reference's `INSERT … ON DUPLICATE KEY UPDATE col=col` updates
  * nothing on conflict — it is insert-if-absent / KEEP-EXISTING. With no
  * Delta/Iceberg in the jar set, the Spark-native mapping is:
  * dedup-within-batch + left-anti join against existing + union append.
  */
object Upsert {

  /** Deterministic within-batch dedup: keep the first row per key under
    * `tieBreak` ordering (row_number, not dropDuplicates, so the surviving
    * row is stable across runs/partitionings — SURVEY.md §7.4 hazard 7). */
  def dedupOnKey(df: DataFrame, keys: Seq[String], tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Keep-existing upsert: rows of `existing` win; only `incoming` rows whose
    * key is absent from `existing` are appended.
    *
    * Scale posture: the anti-join shuffles both sides on the key (or
    * broadcasts `existing`'s keys if small); at 100 TB one would partition
    * the sink table by a key prefix/date so the anti-join prunes to the
    * touched partitions. Within-batch dedup and the anti-join share the
    * same key shuffle.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             tieBreak: Seq[String]): DataFrame = {
    val deduped = dedupOnKey(incoming, keys, tieBreak)
    val fresh = deduped.join(existing.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    existing.unionByName(fresh.select(existing.columns.toIndexedSeq.map(col): _*))
  }

  /** The batch's fresh rows against a PARTITIONED parquet sink, reading
    * only the partitions the batch touches — the 100 TB upsert path: a
    * daily batch against a years-deep sink anti-joins a handful of
    * partitions, not the whole table.
    *
    * The touched-partition list is collected to the driver: bounded by the
    * number of distinct `partCol` values IN THE BATCH (e.g. days), not by
    * data volume — same class of driver-side metadata as IVF centroids.
    * The `isin` filter lands in the scan's PartitionFilters (asserted in
    * UpsertPartitionedSpec), so unread partitions are never opened. */
  def freshAgainstPartitionedSink(spark: SparkSession, sinkPath: String,
      incoming: DataFrame, keys: Seq[String], tieBreak: Seq[String],
      partCol: String): DataFrame = {
    val deduped = dedupOnKey(incoming, keys, tieBreak)
    val touched = deduped.select(col(partCol)).distinct().collect().map(_.get(0))
    // Schema is PINNED to the batch's, never inferred: a sink that exists
    // but holds no data files yet (an empty first micro-batch commits only
    // _SUCCESS) would fail parquet schema inference and kill the caller —
    // with the schema supplied, it reads as a valid empty relation. The
    // partition column in the pinned schema is populated from the
    // directory values, as with inference.
    val existingKeys = spark.read.schema(incoming.schema).parquet(sinkPath)
      .filter(col(partCol).isin(touched.toIndexedSeq: _*))
      .select(keys.map(col): _*).distinct()
    deduped.join(existingKeys, keys, "left_anti")
  }

  /** Keep-existing upsert INTO a partitioned parquet sink: append only the
    * fresh rows, written with the sink's partitioning. Idempotent: a
    * re-run of the same batch appends nothing. */
  def upsertPartitioned(spark: SparkSession, sinkPath: String,
      incoming: DataFrame, keys: Seq[String], tieBreak: Seq[String],
      partCol: String): Unit =
    freshAgainstPartitionedSink(spark, sinkPath, incoming, keys, tieBreak, partCol)
      .write.mode("append").partitionBy(partCol).parquet(sinkPath)

  // ───────── snapshot-versioned sink (time travel, table-format lite) ─────────
  //
  // Each write lands its FRESH rows (keep-existing upsert semantics) in a
  // new immutable `batch-N` directory and publishes snapshot manifest
  // `_snapshots/v<N>.list` — a text file whose lines are the data dirs
  // composing that version. Reading version N unions exactly those dirs,
  // so every historical version stays readable FOREVER (time travel) and
  // a version's delta is its own batch dir. The manifest is written
  // tmp-then-rename: readers either see a complete snapshot or none —
  // a crash mid-write leaves at most an orphaned data dir the next
  // successful write ignores (never a torn table). Data dirs are
  // immutable after publish; there is no compaction here by design
  // (compactShards composes when batch counts grow).

  /** Label every Spark job `body` submits (guide §1.5): the UI (and
    * graft.Profile) show which operator phase each of a publish's jobs
    * belongs to. Thread-local and restored on exit, so nested phases
    * stack naturally and callers' own descriptions survive. */
  private def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  private def fsFor(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def snapDir(path: String) =
    new org.apache.hadoop.fs.Path(path, "_snapshots")

  /** Latest published snapshot version; 0 for a fresh/empty sink. */
  def latestVersion(spark: SparkSession, path: String): Int = {
    val fs = fsFor(spark, path)
    if (!fs.exists(snapDir(path))) 0
    else fs.listStatus(snapDir(path)).toSeq.map(_.getPath.getName)
      .flatMap(numberedName(_, "v", ".list"))
      .foldLeft(0)(math.max)
  }

  /** One manifest line: a data dir plus the DELETION VECTORS applied
    * to it (merge-on-read tombstone dirs — parquet dirs of the dead
    * rows' key columns, anti-joined at read). `dvs` is kept SORTED so
    * two entries compare structurally: staleness checks ("is the base
    * I read still the live content?") must see a dv added to a dir as
    * a content change even though the dir name is unchanged.
    * Line format: `dir` (the pre-MoR format, unchanged on disk for
    * every dv-less sink) or `dir\tdv1,dv2`. */
  private[graft] final case class SnapEntry(dir: String, dvs: Seq[String]) {
    def line: String =
      if (dvs.isEmpty) dir else s"$dir\t${dvs.mkString(",")}"
  }

  /** Numeric N from a protocol file name `<prefix>N<suffix>`; None for
    * anything malformed. Every name parse in the sink goes through
    * this: operator debris (a stray `vX.claim`, a hand-made
    * `gen-old.touch`) must never wedge the protocol — a bare `.toInt`
    * here would throw from [[claimVersion]] and fail EVERY subsequent
    * publish on the sink until someone deletes the debris by hand. */
  private def numberedName(n: String, prefix: String,
      suffix: String): Option[Int] =
    if (n.startsWith(prefix) && n.endsWith(suffix))
      scala.util.Try(
        n.stripPrefix(prefix).stripSuffix(suffix).toInt).toOption
    else None

  private def parseEntry(line: String): SnapEntry = {
    val a = line.split("\t", 2)
    if (a.length == 1 || a(1).isEmpty) SnapEntry(a(0), Nil)
    else SnapEntry(a(0), a(1).split(",").toSeq.filter(_.nonEmpty).sorted)
  }

  private[graft] def manifestEntries(spark: SparkSession, path: String,
                                     version: Int): Seq[SnapEntry] = {
    val fs = fsFor(spark, path)
    val p = new org.apache.hadoop.fs.Path(snapDir(path), s"v$version.list")
    require(fs.exists(p), s"no snapshot v$version at $path")
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    lines.filter(_.nonEmpty).map(parseEntry)
  }

  private def manifestDirs(spark: SparkSession, path: String,
                           version: Int): Seq[String] =
    manifestEntries(spark, path, version).map(_.dir)

  /** Marker: this sink has (ever) used merge-on-read. One exists-call
    * lets every publish on the common dv-less sink skip the
    * all-manifests dv-reattach scan. */
  private def morMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(snapDir(path), "mor.on")

  /** dir name → the UNION of its dv sets across every published
    * manifest. Reconciles and carry paths republish manifests from dir
    * NAMES; reattaching the union keeps every published delete applied
    * (dv files are immutable and per-dir, so union is monotone-safe:
    * an extra dv on a dir can only remove rows its own merge already
    * deleted there — same "deletes are never resurrected" rule the
    * carry semantics document). Empty map for dv-less sinks. */
  /** Per-manifest-FILE dv maps, keyed by (path, name:mtime:len):
    * manifest files are immutable between repoints, so each file's dv
    * map is computed once — a publish on a deep-history MoR sink opens
    * only the manifests it has not seen (steady state: the one the
    * previous publish wrote), not the whole chain per publish. */
  private val manifestDvCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String),
        Map[String, Seq[String]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String),
            Map[String, Seq[String]]]): Boolean = size > 1024
    })

  private def dvUnionFor(spark: SparkSession,
      path: String): Map[String, Seq[String]] = {
    val fs = fsFor(spark, path)
    if (!fs.exists(morMarkerPath(path))) return Map.empty
    val lists = fs.listStatus(snapDir(path)).toSeq.flatMap { st =>
      numberedName(st.getPath.getName, "v", ".list").map(st -> _)
    }
    val perFile = lists.flatMap { case (st, listV) =>
      val n = st.getPath.getName
      val key = (path, s"$n:${st.getModificationTime}:${st.getLen}")
      val hit = manifestDvCache.get(key)
      if (hit != null) Some(hit)
      else try {
        val m = manifestEntries(spark, path, listV)
          .filter(_.dvs.nonEmpty)
          .groupBy(_.dir)
          .map { case (d, es) => d -> es.flatMap(_.dvs).distinct.sorted }
        manifestDvCache.put(key, m)
        Some(m)
      } catch {
        // ONLY a vanished file is skippable (expiry deleted a listed
        // manifest under us — its dirs are dead history). Any OTHER
        // failure must propagate and fail the publish: swallowing a
        // transient read error here would publish carried dirs
        // STRIPPED of their dv annotations — the resurrect-deletes
        // failure class the mor.on marker is load-bearing against.
        case _: java.io.FileNotFoundException => None
        case e: IllegalArgumentException
            if e.getMessage != null &&
              e.getMessage.contains("no snapshot v") => None
      }
    }
    perFile.flatten.groupBy(_._1)
      .map { case (d, kvs) =>
        d -> kvs.flatMap(_._2).distinct.sorted }
  }

  /** Read of a pinned-schema dir scan with a dv set applied: the dv
    * dirs' own columns (the merge-time keys) anti-join the scan. The
    * identity for dv-less entries — every pre-MoR path pays nothing. */
  private def antiDv(spark: SparkSession, path: String, df: DataFrame,
      dvs: Seq[String]): DataFrame =
    if (dvs.isEmpty) df
    else {
      val dv = spark.read.option("mergeSchema", "true")
        .parquet(dvs.map(d => s"$path/$d"): _*)
      df.join(dv, dv.columns.toIndexedSeq, "left_anti")
    }

  /** Union read of manifest entries with deletion vectors applied:
    * one mergeSchema scan per DISTINCT dv set (the dv-less common case
    * is exactly one scan — the pre-MoR plan, unchanged), `prep` applied
    * to each group's dir scan BEFORE the anti join so pushable bounds
    * still reach the parquet footers, groups unioned by name. */
  private def readEntriesRaw(spark: SparkSession, path: String,
      entries: Seq[SnapEntry],
      prep: DataFrame => DataFrame = identity): DataFrame = {
    require(entries.nonEmpty, "readEntriesRaw: no entries")
    entries.groupBy(_.dvs).toSeq.sortBy(_._1.mkString(","))
      .map { case (dvs, es) =>
        antiDv(spark, path, prep(
          spark.read.option("mergeSchema", "true")
            .parquet(es.map(e => s"$path/${e.dir}"): _*)), dvs)
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** CREATE-EXCLUSIVE of a marker file — the arbitration primitive
    * under every claim/lock here. On HDFS the namenode arbitrates
    * `create(overwrite = false)`. On the LOCAL filesystem Hadoop's
    * RawLocalFileSystem implements that flag as exists()-then-create —
    * a TOCTOU window — so `file:` paths go through java.nio
    * `Files.createFile`, which is a real O_EXCL open. Object stores
    * without atomic create-exclusive need a fronting layer (same
    * caveat as the manifest rename). Throws the filesystem's
    * already-exists/IO exception on a lost race — callers classify. */
  private def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
                              marker: org.apache.hadoop.fs.Path): Unit =
    if (fs.getScheme == "file") {
      val p = org.apache.hadoop.fs.Path
        .getPathWithoutSchemeAndAuthority(fs.makeQualified(marker))
      java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toString))
      ()
    } else fs.create(marker, false).close()

  /** Take the exclusive rewriter lock or throw [[LockHeldException]].
    * One lock for every rewrite-class op (compact/merge/erase/vacuum):
    * they all rewrite or delete referenced dirs, so any two racing
    * would double-carry or read a half-replaced base. */
  private def acquireRewriterLock(fs: org.apache.hadoop.fs.FileSystem,
      path: String, opName: String): org.apache.hadoop.fs.Path = {
    val lock = new org.apache.hadoop.fs.Path(snapDir(path), "compact.lock")
    try createExclusive(fs, lock) catch {
      case e: java.io.IOException =>
        throw new LockHeldException(
          s"$opName: another rewriter holds $lock — if its process " +
            "crashed, delete the lock file and retry", e)
    }
    lock
  }

  // ── dir-level key-range stats ────────────────────────────────────
  // Every data dir gets a `_snapshots/<dir>.stats` sidecar at write
  // time: per key column, the min/max of its non-null values. Probing
  // ops (merge's touched-dir scan, erasure's hit scan, point reads)
  // compare the probe keys' range against each dir's recorded range and
  // SKIP dirs that cannot hold a matching key — the difference between
  // "every merge opens every dir of a 100 TB sink" and "a merge opens
  // the handful of dirs its keys can live in". Equi-joins are
  // null-rejecting, so only non-null ranges matter; a dir with no
  // non-null key values can never match and records `none`. Missing
  // sidecars (pre-stats dirs) and unsupported key types degrade to
  // "always probe" — pruning is an optimization, never a correctness
  // gate. Ranges are per-column: disjointness on ANY key column rules
  // out a composite-key match (all columns must match for equality).

  private def statsPath(path: String, dirName: String) =
    new org.apache.hadoop.fs.Path(snapDir(path), s"$dirName.stats")

  /** Canonical comparable domain per supported key type. Unsupported
    * types (float/decimal/binary/…) return None and that column simply
    * never prunes. */
  private[graft] def statTag(dt: org.apache.spark.sql.types.DataType): Option[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => Some("long")
      case StringType => Some("string")
      case DateType => Some("date")
      case TimestampType => Some("ts")
      case _ => None
    }
  }

  /** Accepts both EXTERNAL values (Timestamp/Date/Instant/LocalDate —
    * what Spark aggregates collect) and the CANONICAL Long the decode
    * side produces: writeKeyStats re-encodes decoded range values when
    * rendering sidecar lines, and before the Number branches below,
    * that re-encode MatchError'd for date/ts tags — silently swallowed
    * by the sidecar writer's best-effort catch, so every timestamp- or
    * date-KEYED sink shipped with NO `.stats`/`.bloom2` sidecars at
    * all (sound — "always probe" — but unpruned everywhere). */
  private def encodeStatValue(tag: String, v: Any): String = tag match {
    case "long" => v.asInstanceOf[Number].longValue.toString
    case "string" => java.net.URLEncoder.encode(v.asInstanceOf[String], "UTF-8")
    case "date" => v match {
      case n: Number => n.longValue.toString // canonical epoch day
      case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
      case d: java.time.LocalDate => d.toEpochDay.toString
    }
    case "ts" => v match {
      case n: Number => n.longValue.toString // canonical epoch micros
      // floorDiv, not /: getTime of a pre-1970 timestamp with
      // fractional seconds is a negative non-multiple of 1000, and
      // truncation would shift its canon a full second HIGH (-0.5 s →
      // +0.5 s) — a non-monotone canon that inverts recorded min/max
      // and bloom-mismatches the write side's exact unix_micros,
      // silently pruning dirs that hold the probed key.
      case t: java.sql.Timestamp =>
        (Math.floorDiv(t.getTime, 1000L) * 1000000L +
          t.getNanos / 1000L).toString
      case t: java.time.Instant =>
        (t.getEpochSecond * 1000000L + t.getNano / 1000L).toString
    }
  }

  /** Decoded stat values compare as Long (long/date/ts) or String. */
  private def decodeStatValue(tag: String, s: String): Any = tag match {
    case "string" => java.net.URLDecoder.decode(s, "UTF-8")
    case _ => s.toLong
  }

  /** Strings compare in UNSIGNED UTF-8 byte order — the order Spark's
    * min/max computed the sidecar values under. Java's String.compareTo
    * is UTF-16 code-unit order, which disagrees above the BMP (a
    * surrogate pair sorts below U+E000 in UTF-16 but above it in
    * UTF-8); pruning under the wrong order silently DROPS matching
    * dirs — missing point-read rows, un-rewritten merge dirs
    * (resurrected deletes), incomplete erasure. */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  private[graft] def statLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: String, y: String) => utf8Lt(x, y)
    case _ => throw new IllegalStateException(s"stat type mismatch: $a / $b")
  }

  /** Per-column (tag, min, max) of `df` over `statCols` — None per
    * column with no non-null values — PLUS the count of rows with
    * every `nnCols` column non-null (the bloom sidecar's sizing input,
    * folded into the same aggregate so a sidecar write costs one range
    * pass, not a range pass plus a count pass). ONE narrow aggregate.
    * Count is 0 when no column has a supported stat type (the early
    * return — no stats means no bloom either, by contract). `statCols`
    * = keys for probes; the sidecar writer extends it with declared
    * skip columns at zero extra passes. */
  private[graft] def keyRangesWithCount(df: DataFrame, keys: Seq[String])
      : (Seq[(String, String, Option[(Any, Any)])], Long, Long) =
    keyRangesWithCount(df, keys, keys)

  private[graft] def keyRangesWithCount(df: DataFrame,
      statCols: Seq[String], nnCols: Seq[String])
      : (Seq[(String, String, Option[(Any, Any)])], Long, Long) = {
    val tagged = statCols.flatMap(k =>
      statTag(df.schema(k).dataType).map(k -> _))
    if (tagged.isEmpty) return (Nil, 0L, -1L)
    val nnPred = nnCols.map(col(_).isNotNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    val aggs = tagged.flatMap { case (k, _) =>
      Seq(min(col(k)).as(s"__lo_$k"), max(col(k)).as(s"__hi_$k")) } :+
      count(when(nnPred, lit(1))).as("__nn") :+
      count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val ranges = tagged.zipWithIndex.map { case ((k, tag), i) =>
      val lo = row.get(2 * i); val hi = row.get(2 * i + 1)
      (k, tag, if (lo == null || hi == null) None
               else Some((decodeStatValue(tag, encodeStatValue(tag, lo)),
                          decodeStatValue(tag, encodeStatValue(tag, hi)))))
    }
    (ranges, row.getLong(2 * tagged.size), row.getLong(2 * tagged.size + 1))
  }

  /** Per-key-column (tag, min, max) of `df`, None per column with no
    * non-null values. Costs one narrow aggregate over the key columns. */
  private[graft] def keyRanges(df: DataFrame, keys: Seq[String])
      : Seq[(String, String, Option[(Any, Any)])] =
    keyRangesWithCount(df, keys)._1

  /** Bloom sidecars live at `<dir>.bloom2`. The suffix is a CANON
    * VERSION: v1 (`.bloom`) canonicalized timestamp/date keys via
    * cast-to-string, whose rendering follows the SESSION TIMEZONE — a
    * bloom written under one zone and probed under another produced
    * false negatives, silently pruning dirs that DO hold the probed
    * keys (dropped point-read rows). The canon below is
    * timezone-independent; bumping the file name makes every v1
    * sidecar invisible rather than wrong (a bloomless dir degrades to
    * "always probe" — sound). Cleanup paths delete both suffixes. */
  private def bloomPath(path: String, dirName: String) =
    new org.apache.hadoop.fs.Path(snapDir(path), s"$dirName.bloom2")

  private def legacyBloomPath(path: String, dirName: String) =
    new org.apache.hadoop.fs.Path(snapDir(path), s"$dirName.bloom")

  /** Canonical composite-key string for the bloom sidecars: each key
    * column canonicalized to a string, unit-separator joined -- in
    * NAME-SORTED column order, so a point read passing the same key set
    * in a different order probes the same canon the writer hashed (an
    * order-sensitive canon would bloom-prune true matches silently).
    * Timestamp and date keys canonicalize TIMEZONE-INDEPENDENTLY
    * (epoch micros / epoch day, mirroring [[encodeStatValue]]) — a
    * plain cast renders under spark.sql.session.timeZone, so a sidecar
    * written under one zone would false-negative every probe made
    * under another. Rows with ANY null key component are excluded on
    * the dir side (equi-joins are null-rejecting — they can never
    * match a probe) and a null-keyed probe row canonicalizes to a
    * string that never hits a fully-keyed dir row. */
  private def keyCanon(df: DataFrame, keys: Seq[String])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{DateType, TimestampType}
    def canon(k: String) = df.schema(k).dataType match {
      case TimestampType => unix_micros(col(k)).cast("string")
      case DateType => unix_date(col(k)).cast("string")
      case _ => col(k).cast("string")
    }
    concat_ws("\u0001", keys.sorted.map(canon): _*)
  }

  /** Keys-per-dir cap for the bloom sidecar (~1.2 bytes/key at 1%
    * fpp → ≤ ~5 MB). Range stats cover every dir; blooms additionally
    * cover the dirs where point reads actually multiply — the many
    * SMALL trickle dirs whose ranges all overlap under hash-distributed
    * keys. A multi-TB compacted dir gets no bloom (a probe that
    * range-overlaps it reads it — one dir, not a fleet). */
  private val BloomMaxKeys = 4L * 1000 * 1000
  /** Max probe keys a point read will collect for bloom tests — a
    * bounded driver set, same class as the manifest listings. */
  private[graft] val BloomProbeMax = 1024

  /** Record the `.stats` sidecar for a just-written data dir: one line
    * per supported key column, `col TAB tag TAB min TAB max` (URL-coded
    * strings), or `col TAB tag TAB none` when the dir holds no non-null
    * values for it. Small dirs (≤ [[BloomMaxKeys]] non-null keys) also
    * get a `.bloom` exact-membership sketch over [[keyCanon]] — range
    * stats cannot prune hash-distributed keys (every dir spans the full
    * range), the bloom can. One columnar scan of the NEW dir only — at
    * 100 TB the dir is the batch, never the corpus. Best-effort: a
    * failure to write sidecars must never fail the data write (readers
    * just probe). */
  private def writeKeyStats(spark: SparkSession, path: String,
      dirName: String, keys: Seq[String],
      profileDone: Boolean = false,
      preBloom: Option[Array[Byte]] = None): Unit =
    try {
      val fs = fsFor(spark, path)
      val df = spark.read.parquet(s"$path/$dirName")
      // GATED sinks ([[gateMarkerPath]] present): stamp the dir's
      // drift profile here, where every dir write in the sink already
      // converges (appends, merge rewrites + landings, compaction
      // outputs, erasure rewrites, heals) — one extra pass over the
      // NEW dir, and the gate never re-reads published data. Before
      // the key-presence bail: a dir without the key columns still
      // profiles (the gate covers all columns, not just keys).
      // `profileDone` skips it when the caller (writeDirWithStats'
      // footer fallback) already stamped this dir's profile — the
      // KMV sketch pass must not run twice per gated write.
      try {
        if (!profileDone && fs.exists(gateMarkerPath(path))) {
          val (rows, m) = profileSketch(df)
          writeProfileFile(fs, dirProfilePath(path, dirName), rows, m)
        }
      } catch { case scala.util.control.NonFatal(_) => () }
      val present = keys.filter(df.columns.contains)
      if (present.size != keys.size) return
      // Ranges and the fully-keyed row count in ONE pass (the count
      // sizes the bloom); the bloom build is the only second pass —
      // two scans of the NEW dir per sidecar write, down from three.
      // Declared skip columns ride the SAME aggregate (a few extra
      // min/max columns, zero extra passes); the non-null count stays
      // keyed to the key columns (it sizes the key bloom).
      val statCols = present ++ recordedSkipCols(spark, path)
        .filter(df.columns.contains).filterNot(present.contains)
      val (ranges, n, totalRows) = keyRangesWithCount(df, statCols, present)
      writeKeyStatsFrom(spark, path, dirName, keys, ranges, n, totalRows,
        Some(df.schema), preBloom)
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Sidecar writer from PRECOMPUTED range/count facts — the shared
    * tail of [[writeKeyStats]] (re-read aggregate) and
    * [[writeDirWithStats]] (stats observed on the write job). Writes
    * the `.stats` lines; small dirs also get the `.bloom2` sketch —
    * the one residual post-write pass, column-pruned to the keys.
    * Best-effort, same contract as ever: a sidecar failure never fails
    * the data write. */
  private def writeKeyStatsFrom(spark: SparkSession, path: String,
      dirName: String, keys: Seq[String], ranges: ProbeRanges,
      n: Long, totalRows: Long,
      dataSchema: Option[org.apache.spark.sql.types.StructType] = None,
      preBloom: Option[Array[Byte]] = None)
      : Unit =
    try {
      val fs = fsFor(spark, path)
      val lines = ranges.map {
        case (k, tag, Some((lo, hi))) =>
          s"$k\t$tag\t${encodeStatValue(tag, lo)}\t${encodeStatValue(tag, hi)}"
        case (k, tag, None) => s"$k\t$tag\tnone"
      // Total-row line (same aggregate, zero extra cost): lets
      // [[countSnapshot]] answer COUNT(*) from driver metadata. The
      // reserved tag "rows" disambiguates it from the RANGE line of a
      // key column that happens to be named __rows (whose tag is
      // always a data-type tag) — both readers match the full
      // `__rows\trows\t` prefix.
      } ++ (if (totalRows >= 0) Seq(s"__rows\trows\t$totalRows") else Nil)
      if (lines.isEmpty) return
      val out = fs.create(statsPath(path, dirName), true)
      try out.write(lines.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      try {
        // n == 0: every range line is "none", so stage-1 pruning
        // already drops this dir for ANY probe — don't spend a Spark
        // job building a bloom nothing will ever consult. (Empty dirs
        // are routine: idempotent replays, fully-duplicate batches.)
        if (n > 0 && n <= BloomMaxKeys) preBloom match {
          // Bloom observed on the write job itself (writeDirWithStats):
          // write the serialized bytes — same bloom_filter_agg builder,
          // same keyCanon hashing, zero extra pass. n > 0 gates it so
          // an EMPTY dir still writes no bloom (its all-"none" stats
          // already prune every probe).
          case Some(bytes) =>
            val bo = fs.create(bloomPath(path, dirName), true)
            try bo.write(bytes) finally bo.close()
          case None =>
            // Schema pinned when the caller knows it (the dir was just
            // written from that schema): skips the footer-inference job
            // spark.read.parquet would otherwise run per sidecar write.
            val df = dataSchema
              .map(s => spark.read.schema(s).parquet(s"$path/$dirName"))
              .getOrElse(spark.read.parquet(s"$path/$dirName"))
            val nn = df.filter(keys.map(col(_).isNotNull).reduce(_ && _))
            val bf = labeledBloom(spark, dirName)(
              nn.stat.bloomFilter(keyCanon(df, keys),
                math.max(n, 64L), 0.01))
            val bo = fs.create(bloomPath(path, dirName), true)
            try bf.writeTo(bo) finally bo.close()
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Write `df` as data dir `<path>/<dirName>` and stamp its `.stats`
    * sidecar from the just-written PARQUET FOOTERS at driver-metadata
    * cost — replacing the re-read range-aggregate pass every dir write
    * used to pay. At 100 TB that pass is a full scan of the batch;
    * the footers already carry exact per-column min/max/null-count
    * statistics (guide §6: footer stats are the skip machinery), so
    * deriving the sidecar from them removes a whole pass per publish.
    * The bloom build (small dirs) stays the one post-write pass;
    * gated sinks keep their profile pass (a KMV sketch needs the
    * data). Unusable footers (INT96 timestamps, stats omitted for
    * oversized values, unexpected physical types) fall back to the
    * re-read path, so the sidecar contract is unchanged. */
  private def writeDirWithStats(spark: SparkSession, path: String,
      dirName: String, df: DataFrame, keys: Seq[String],
      keyBound: Option[Long] = None,
      dirProfile: Option[(Long, Map[String, (Long, Array[String])])] = None)
      : Unit =
    labeled(spark, s"graft.writeDir $dirName") {
    val present = keys.filter(df.columns.contains)
    val statCols =
      if (present.size != keys.size) Nil
      else present ++ recordedSkipCols(spark, path)
        .filter(df.columns.contains).filterNot(present.contains)
    val tagged = statCols.flatMap(k =>
      statTag(df.schema(k).dataType).map(k -> _))
    // OBSERVED bloom (guide §2.4 — remove whole passes): when the
    // caller knows an UPPER BOUND on the dir's key count (a COW
    // rewrite is bounded by its parent's sidecar rows, a merge landing
    // by the batch's U+I counts, a publish by the batch's keys) and it
    // fits the bloom cap, the bloom aggregate rides the WRITE job as a
    // CollectMetrics observation over the same keyCanon the scan-built
    // path hashes — the post-write bloom pass disappears. A bound can
    // only OVERSIZE the filter (bits for `bound` items, contents =
    // actual keys): same zero-false-negative contract, slightly larger
    // sidecar. Best-effort: if the observation doesn't deliver, the
    // scan-built path below still runs.
    val obs: Option[org.apache.spark.sql.Observation] =
      keyBound match {
        case Some(bound) if present.size == keys.size &&
            tagged.nonEmpty && bound > 0 && bound <= BloomMaxKeys =>
          Some(new org.apache.spark.sql.Observation(
            s"graft_bloom_${dirName}_${System.nanoTime()}"))
        case _ => None
      }
    val toWrite = obs match {
      case Some(o) =>
        val bound = math.max(keyBound.get, 64L)
        val nn = keys.map(col(_).isNotNull).reduce(_ && _)
        val bits = org.apache.spark.util.sketch.BloomFilter
          .optimalNumOfBits(bound, 0.01)
        import org.apache.spark.sql.graftbridge.ColumnBridge
        df.observe(o, ColumnBridge.internalFn("bloom_filter_agg",
          when(nn, keyCanon(df, keys)), lit(bound), lit(bits))
          .as("bloom"))
      case None => df
    }
    toWrite.write.mode("overwrite").parquet(s"$path/$dirName")
    // Gate profile: best-effort, gated sinks only. When the caller
    // already profiled EXACTLY these rows (writeSnapshotGated sketches
    // its fresh set for the drift diff), the sidecar reuses that
    // sketch — the dir's own re-read pass disappears (guide §2.4);
    // otherwise the KMV sketch reads the new dir as before.
    try {
      val fs = fsFor(spark, path)
      if (fs.exists(gateMarkerPath(path))) {
        val (rows, m) = dirProfile.getOrElse(profileSketch(
          spark.read.schema(df.schema).parquet(s"$path/$dirName")))
        writeProfileFile(fs, dirProfilePath(path, dirName), rows, m)
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    if (present.size != keys.size || tagged.isEmpty) return
    // Drain the observation (the listener delivering it is async —
    // poll briefly, then fall back to the scan-built pass; a missing
    // metric costs one extra job, never a wrong sidecar).
    val preBloom: Option[Array[Byte]] = obs.flatMap { o =>
      var bytes: Option[Array[Byte]] = None
      var waited = 0
      while (bytes.isEmpty && waited < 50) {
        val m = org.apache.spark.sql.graftbridge.ColumnBridge
          .observationGetOrEmpty(o)
        if (m.nonEmpty)
          bytes = Option(m.getOrElse("bloom", null))
            .collect { case b: Array[Byte] => b }
        else { Thread.sleep(20); waited += 1 }
        if (m.nonEmpty && bytes.isEmpty) waited = 50
      }
      bytes
    }
    footerStats(spark, path, dirName, tagged, present) match {
      case Some((ranges, nn, totalRows)) =>
        writeKeyStatsFrom(spark, path, dirName, keys, ranges, nn,
          totalRows, Some(df.schema), preBloom)
      // profileDone: the gate profile above already stamped this dir —
      // the fallback must not pay the KMV sketch pass a second time.
      case None => writeKeyStats(spark, path, dirName, keys,
        profileDone = true, preBloom = preBloom)
    }
  }

  /** [[labeled]] wrappers for the jobs sidecar writes submit. */
  private def labeledBloom[T](spark: SparkSession, dirName: String)
      (body: => T): T = labeled(spark, s"graft.bloom $dirName")(body)

  /** Range/count facts of a just-written dir read from its parquet
    * FOOTERS — zero data passes. Returns (per-column ranges in
    * [[writeKeyStats]]' shape, joint-non-null UPPER bound over
    * `nnCols`, exact row total), or None when any needed column's
    * stats are unusable. The non-null bound sizes the bloom: joint
    * non-null ≤ min per-column non-null, so the bloom is sized ≥ the
    * true key count (never undersized), and a 0 bound is exact (some
    * key column is all-NULL → no fully-keyed row exists). String
    * footer stats compare in unsigned byte order — the same order
    * [[utf8Lt]] and the sidecar contract use — and parquet-mr OMITS
    * binary stats it would have to truncate, which lands in the
    * fallback, never a wrong bound. */
  private def footerStats(spark: SparkSession, path: String,
      dirName: String, tagged: Seq[(String, String)], nnCols: Seq[String])
      : Option[(ProbeRanges, Long, Long)] = try {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val fs = fsFor(spark, path)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path, dirName))
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
          !n.startsWith(".")
      }
    val need = (tagged.map(_._1) ++ nnCols).distinct
    var totalRows = 0L
    val mins = scala.collection.mutable.Map.empty[String, Any]
    val maxs = scala.collection.mutable.Map.empty[String, Any]
    val nonNull = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    // Per-file facts, so the footer opens can run CONCURRENTLY (below):
    // None = this file's stats are unusable → whole-dir fallback.
    case class FileFacts(rows: Long, mins: Map[String, Any],
        maxs: Map[String, Any], nonNull: Map[String, Long])
    def canonOf(tag: String, pt: org.apache.parquet.schema.PrimitiveType,
        v: Any): Option[Any] = {
      val logical = pt.getLogicalTypeAnnotation
      (tag, pt.getPrimitiveTypeName) match {
        case ("long", INT32) | ("long", INT64)
            if logical == null ||
              logical.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] =>
          Some(v.asInstanceOf[Number].longValue)
        case ("string", BINARY)
            if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
          Some(new String(
            v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
            java.nio.charset.StandardCharsets.UTF_8))
        case ("date", INT32)
            if logical.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
          Some(v.asInstanceOf[Number].longValue)
        case ("ts", INT64) => logical match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS =>
                Some(v.asInstanceOf[Number].longValue)
              case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                Some(v.asInstanceOf[Number].longValue * 1000L)
              case LogicalTypeAnnotation.TimeUnit.NANOS =>
                Some(Math.floorDiv(v.asInstanceOf[Number].longValue, 1000L))
            }
          case _ => None
        }
        case _ => None // INT96 and anything unexpected: fallback
      }
    }
    def factsOf(st: org.apache.hadoop.fs.FileStatus): Option[FileFacts] = {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          st.getPath, spark.sparkContext.hadoopConfiguration))
      try {
        var rows = 0L
        val fMins = scala.collection.mutable.Map.empty[String, Any]
        val fMaxs = scala.collection.mutable.Map.empty[String, Any]
        val fNn = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        val blocks = reader.getFooter.getBlocks
        val it = blocks.iterator()
        while (it.hasNext) {
          val b = it.next()
          rows += b.getRowCount
          val byName = {
            import scala.jdk.CollectionConverters._
            b.getColumns.asScala
              .filter(_.getPath.size == 1)
              .map(c => c.getPath.toDotString -> c).toMap
          }
          for (c <- need) {
            val chunk = byName.getOrElse(c, return None)
            val stats = chunk.getStatistics
            if (stats == null || !stats.isNumNullsSet) return None
            val nn = b.getRowCount - stats.getNumNulls
            fNn(c) = fNn(c) + nn
            tagged.find(_._1 == c).foreach { case (_, tag) =>
              if (nn > 0) {
                if (!stats.hasNonNullValue) return None
                val lo = canonOf(tag, chunk.getPrimitiveType,
                  stats.genericGetMin).getOrElse(return None)
                val hi = canonOf(tag, chunk.getPrimitiveType,
                  stats.genericGetMax).getOrElse(return None)
                fMins(c) = fMins.get(c).filter(m => statLt(m, lo))
                  .getOrElse(lo)
                fMaxs(c) = fMaxs.get(c).filter(m => statLt(hi, m))
                  .getOrElse(hi)
              }
            }
          }
        }
        Some(FileFacts(rows, fMins.toMap, fMaxs.toMap, fNn.toMap))
      } finally reader.close()
    }
    // Footer opens run in a SMALL bounded pool, not a sequential driver
    // loop: a compaction output on an object store would otherwise
    // serialize N metadata RPCs on the driver (guide §5 driver-bound).
    // Bounded at 8 — footer reads are latency-bound, not CPU-bound.
    val perFile: Seq[Option[FileFacts]] =
      if (files.length <= 1) files.toSeq.map(factsOf)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, files.length))
        try {
          import scala.jdk.CollectionConverters._
          val tasks: Seq[java.util.concurrent.Callable[Option[FileFacts]]] =
            files.toSeq.map(st =>
              new java.util.concurrent.Callable[Option[FileFacts]] {
                override def call(): Option[FileFacts] = factsOf(st)
              })
          pool.invokeAll(tasks.asJava).asScala.toSeq.map(_.get())
        } finally pool.shutdown()
      }
    for (ff <- perFile) ff match {
      case None => return None
      case Some(f) =>
        totalRows += f.rows
        for ((c, v) <- f.nonNull) nonNull(c) = nonNull(c) + v
        for ((c, lo) <- f.mins)
          mins(c) = mins.get(c).filter(m => statLt(m, lo)).getOrElse(lo)
        for ((c, hi) <- f.maxs)
          maxs(c) = maxs.get(c).filter(m => statLt(hi, m)).getOrElse(hi)
    }
    val ranges: ProbeRanges = tagged.map { case (k, tag) =>
      (k, tag, for (lo <- mins.get(k); hi <- maxs.get(k)) yield (lo, hi))
    }
    val nnUpper =
      if (nnCols.isEmpty) 0L
      else nnCols.map(nonNull(_)).min
    Some((ranges, nnUpper, totalRows))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Opens the sidecar DIRECTLY — no exists() precheck. The only
    * caller ([[pruneDirs]]) has already established existence for its
    * `withBloom` set, so a second exists() here doubled the metadata
    * RPCs per bloom-bearing dir — the cost class the hoisted check was
    * added to avoid on object stores. A missing/corrupt file lands in
    * the catch and degrades to "always probe", per the sidecar
    * contract. */
  private def readKeyBloom(spark: SparkSession, path: String,
      dirName: String): Option[org.apache.spark.util.sketch.BloomFilter] = {
    val fs = fsFor(spark, path)
    try {
      val in = fs.open(bloomPath(path, dirName))
      try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in))
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Parsed `.stats` sidecar: col → (tag, None = no non-null values |
    * Some(min, max)). None overall when the sidecar is absent. */
  private def readKeyStats(spark: SparkSession, path: String,
      dirName: String): Option[Map[String, (String, Option[(Any, Any)])]] = {
    val fs = fsFor(spark, path)
    val p = statsPath(path, dirName)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList finally in.close()
    // Drop only the reserved total line (tag "rows" — no data column
    // can produce it); a key column actually NAMED __rows keeps its
    // range line.
    Some(lines.filterNot(_.startsWith("__rows\trows\t")).map { l =>
      val parts = l.split("\t", -1)
      if (parts(2) == "none") parts(0) -> (parts(1), None)
      else parts(0) -> (parts(1), Some((decodeStatValue(parts(1), parts(2)),
        decodeStatValue(parts(1), parts(3)))))
    }.toMap)
  }

  /** The `__rows` total of a dir's `.stats` sidecar — None when the
    * sidecar (or, for pre-r17 sidecars, the line) is absent. */
  private def readDirRowCount(spark: SparkSession, path: String,
      dirName: String): Option[Long] =
    try {
      val fs = fsFor(spark, path)
      val p = statsPath(path, dirName)
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      // Full-prefix match INCLUDING the reserved "rows" tag: a data
      // column literally named __rows writes a range line
      // `__rows\t<long|string|…>\t…` which must never be mistaken for
      // the total (its tag can never be "rows"). Any truncation or
      // corruption (the sidecar write is best-effort and non-atomic)
      // degrades to None → per-dir scan, per the sidecar contract.
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.startsWith("__rows\trows\t")).toList
      finally in.close()
      lines.headOption.map(_.split("\t", -1)(2).trim.toLong)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Audit for [[countSnapshot]]: the dirs whose rows had to be
    * SCANNED (no `__rows` sidecar line) on the last call. Empty ⟺ the
    * count was answered entirely from driver metadata. */
  private[graft] val lastCountScanned =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)

  /** COUNT(*) of a snapshot version at DRIVER-METADATA cost: manifest
    * dirs are disjoint row sets (the sink's invariant — keep-existing
    * appends, copy-on-write rewrites), so the version's count is the
    * sum of the per-dir `__rows` sidecar totals stamped at write time.
    * A 100 TB sink answers in O(#dirs) sidecar reads with zero
    * executor work; dirs without the line (older sidecars, foreign
    * dirs) fall back to a per-dir scan-count — correctness never
    * rests on a sidecar. */
  def countSnapshot(spark: SparkSession, path: String,
      version: Int): Long = {
    val entries = manifestEntries(spark, path, version)
    val scanned = scala.collection.mutable.ArrayBuffer.empty[String]
    val total = entries.map { e =>
      // Merge-on-read entries subtract their dv totals: dv sets on one
      // dir are disjoint BY CONSTRUCTION (each dv's keys were live at
      // its merge — already-dead keys never re-enter a dv), so
      // dir − Σdv is the entry's exact live count. Any missing total
      // (dir or dv) degrades the ENTRY to a resolved scan-count.
      val parts = (e.dir +: e.dvs).map(readDirRowCount(spark, path, _))
      if (parts.forall(_.isDefined))
        parts.head.get - parts.tail.map(_.get).sum
      else {
        scanned += e.dir
        readEntriesRaw(spark, path, Seq(e)).count()
      }
    }.sum
    lastCountScanned.set(scanned.toSeq)
    total
  }

  /** Audit for [[minMaxSnapshot]]: dirs whose ranges had to be SCANNED
    * (no usable `.stats` line) on the last call. Empty ⟺ answered
    * entirely from driver metadata. */
  private[graft] val lastMinMaxScanned =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)

  /** MIN/MAX of a stat-covered column (keys and declared skip columns)
    * at DRIVER-METADATA cost — the [[countSnapshot]] sibling: each
    * dir's `.stats` line already carries the min/max of its non-null
    * values, and min-of-mins / max-of-maxes over disjoint dir sets IS
    * the version's min/max (SQL semantics: NULLs ignored; all-null →
    * (null, null)). Dirs without a usable line fall back to a per-dir
    * aggregate — correctness never rests on a sidecar. Values return
    * in the stats' canonical domain: long for integral columns, epoch
    * day / epoch micros for date/timestamp, raw string for strings. */
  def minMaxSnapshot(spark: SparkSession, path: String, version: Int,
      column: String): (Option[Any], Option[Any]) = {
    // The LOGICAL column resolves through the schema map like every
    // other read surface: retired names refuse loudly, and pre-rename
    // dirs' sidecars (keyed by the then-physical name) answer for the
    // live name via the alias walk — without it, a rename silently
    // excluded every older dir from the bounds.
    require(!droppedCols(spark, path).contains(column),
      s"minMaxSnapshot: '$column' was dropped")
    require(!renamedAwayCols(spark, path).contains(column),
      s"minMaxSnapshot: '$column' was renamed away — use the live name")
    val aliases = {
      var set = Set(column)
      recordedSchemaMap(spark, path).reverse.foreach {
        case ("rename", f, t) if set(t) => set += f
        case _ => ()
      }
      set
    }
    val entries = manifestEntries(spark, path, version)
    var sawLine = false
    val scanned = scala.collection.mutable.ArrayBuffer.empty[SnapEntry]
    // Per-dv bound-touch test: a dv's OWN `.stats` box (stamped at
    // merge time over the dead rows' keys) that cannot contain `bound`
    // proves no deleted row carries that extreme — the dir's recorded
    // bound is still a LIVE row's value. Erasure shrink-rewrites keep
    // the boxes supersets, so "outside the box" stays sound. A dv with
    // no usable line for the column (or a missing sidecar) is
    // conservative: not provably alive.
    def boundAlive(dvLines: Seq[Option[Seq[(String, Option[(Any, Any)])]]],
        tag: String, bound: Any): Boolean =
      dvLines.forall {
        case Some(lines) =>
          lines.nonEmpty && lines.forall {
            case (dvTag, Some((vLo, vHi))) if dvTag == tag =>
              statLt(bound, vLo) || statLt(vHi, bound)
            case (dvTag, None) if dvTag == tag => true // empty dv kills nothing
            case _ => false
          }
        case None => false
      }
    val fromStats: Seq[(String, (Any, Any))] = entries.flatMap { e =>
      readKeyStats(spark, path, e.dir) match {
        // A merge-on-read entry's stats box is a SUPERSET (the extreme
        // row may be dv-dead). The dv boxes decide: bounds no dv can
        // touch answer at metadata cost; a touched bound falls back to
        // the resolved scan. sawLine records the column exists either
        // way.
        case Some(stats) if aliases.exists(stats.contains) &&
            e.dvs.nonEmpty =>
          sawLine = true
          val boxes = aliases.toSeq.flatMap(stats.get).collect {
            case (tag, Some(r)) => (tag, r)
          }
          // ONE sidecar read per dv, tested against both bounds of
          // every alias box (not one read per test — on an object
          // store each read is a GET).
          val dvLines = e.dvs.map(dv => readKeyStats(spark, path, dv)
            .map(dvStats => aliases.toSeq.flatMap(dvStats.get)))
          if (boxes.nonEmpty && boxes.forall { case (tag, (lo, hi)) =>
              boundAlive(dvLines, tag, lo) && boundAlive(dvLines, tag, hi) })
            boxes
          else { scanned += e; Nil }
        case Some(stats) if aliases.exists(stats.contains) =>
          sawLine = true
          // A dir may carry lines for several aliases (physical
          // coexistence around a rename) — all contribute.
          aliases.toSeq.flatMap(stats.get).collect {
            case (tag, Some(r)) => (tag, r)
          }
        case _ =>
          scanned += e // no sidecar, or no line for any alias
          Nil
      }
    }
    lastMinMaxScanned.set(scanned.map(_.dir).toSeq)
    // ONE resolved union read + ONE aggregate over every fallback
    // entry (min over the union == min of per-dir mins) — N sequential
    // per-dir jobs would serialize the documented backfill case.
    val fromScan: Option[(String, (Any, Any))] =
      if (scanned.isEmpty) None
      else {
        val df = applySchemaMap(spark, path,
          readEntriesRaw(spark, path, scanned.toSeq))
        if (!df.columns.contains(column)) {
          // The fallback saw the dirs' real (mapped) schema: if the
          // column exists NOWHERE — neither a stats line nor a mapped
          // physical column — the call is a typo, not an all-NULL
          // column; answering (None, None) would be a silent lie.
          require(sawLine,
            s"minMaxSnapshot: no column '$column' in snapshot " +
              s"v$version at $path")
          None
        } else {
          val tag = statTag(df.schema(column).dataType).getOrElse(
            throw new IllegalArgumentException(
              s"minMaxSnapshot: '$column' has no stats-comparable " +
                s"type (${df.schema(column).dataType})"))
          val r = df.agg(min(col(column)), max(col(column))).collect()(0)
          if (r.isNullAt(0) || r.isNullAt(1)) None
          else Some((tag,
            (decodeStatValue(tag, encodeStatValue(tag, r.get(0))),
             decodeStatValue(tag, encodeStatValue(tag, r.get(1))))))
        }
      }
    val present = fromStats ++ fromScan.toSeq
    require(present.map(_._1).distinct.size <= 1,
      s"minMaxSnapshot: '$column' has mixed stat types across dirs")
    if (present.isEmpty) (None, None)
    else ((Some(present.map(_._2._1).reduce((a, b) =>
        if (statLt(a, b)) a else b)): Option[Any]),
      (Some(present.map(_._2._2).reduce((a, b) =>
        if (statLt(a, b)) b else a)): Option[Any]))
  }

  /** Incremental CHANGE-FEED CONSUMPTION with a durable cursor — the
    * consumer half of the CDC loop ([[snapshotChanges]] is the read,
    * this is the "exactly once per span" bookkeeping every downstream
    * apply job otherwise hand-rolls): `f` receives the I/U/D frame
    * from the cursor's version to the current latest, and the cursor
    * (a tmp+rename-published marker at `cursorPath`) advances only
    * after `f` returns — a crash mid-apply re-delivers the SAME span
    * (at-least-once; I/U/D application is idempotent per span, so
    * consumers that apply by key converge). First call = the CDC
    * "initial snapshot" convention: `f` gets the full current state
    * as I rows. No new versions → `f` is not called. Returns the
    * version the cursor now covers. */
  def consumeChanges(spark: SparkSession, path: String,
      cursorPath: String, keys: Seq[String], opCol: String = "op")(
      f: DataFrame => Unit): Int = {
    // The cursor's OWN filesystem — a local cursor for an object-store
    // table is the natural deployment and must not resolve against
    // the table's scheme ("Wrong FS").
    val cfs = fsFor(spark, cursorPath)
    val latest = latestVersion(spark, path)
    require(latest >= 1, s"no snapshot to consume at $path")
    // Cursor = the HIGHEST `<cursorPath>.v<N>` marker. Publishing is
    // CREATE-new-THEN-delete-old: no crash window can make the cursor
    // vanish (a single-file delete+rename publish could die between
    // the two and silently RESET the consumer to the initial
    // snapshot — and an initial snapshot cannot re-deliver a missed
    // D event, so that reset is permanent divergence, not
    // at-least-once).
    val cpp = new org.apache.hadoop.fs.Path(cursorPath)
    val cursorDir = cpp.getParent
    val cursorName = cpp.getName
    def markers(): Seq[(Int, org.apache.hadoop.fs.Path)] =
      if (cursorDir == null || !cfs.exists(cursorDir)) Nil
      else cfs.listStatus(cursorDir).toSeq.map(_.getPath)
        .filter(_.getName.startsWith(cursorName + ".v"))
        .flatMap(p => scala.util.Try(
          p.getName.stripPrefix(cursorName + ".v").toInt).toOption
          .map(_ -> p))
    val covered = markers().map(_._1).maxOption.getOrElse(0)
    // A cursor PAST the sink's latest is never a caught-up consumer —
    // it is the wrong sink, a copied cursor, or rolled-back history;
    // silently returning it would skip every span until the sink
    // happened to pass the stale number.
    require(covered <= latest,
      s"consumeChanges: cursor $cursorPath covers v$covered but the " +
        s"sink's latest is v$latest — wrong sink or rolled-back history")
    if (covered == latest) return covered
    val frame =
      if (covered == 0) {
        val full = readSnapshot(spark, path, latest)
        // Same collision refusal as snapshotChanges (which guards the
        // span path): withColumn would silently clobber a real data
        // column named like the op marker.
        require(!full.columns.contains(opCol),
          s"consumeChanges: the sink already has a column named " +
            s"'$opCol' — pass a different opCol")
        full.withColumn(opCol, lit("I"))
          .select((col(opCol) +: full.columns.toIndexedSeq.map(col)): _*)
      } else snapshotChanges(spark, path, covered, latest, keys, opCol)
    f(frame)
    // Advance AFTER the apply: create the new marker, then sweep the
    // old ones best-effort (max-wins read, so leftovers are harmless).
    if (cursorDir != null) cfs.mkdirs(cursorDir)
    cfs.create(new org.apache.hadoop.fs.Path(cursorDir,
      s"$cursorName.v$latest"), true).close()
    markers().filter(_._1 < latest).foreach { case (_, p) =>
      try cfs.delete(p, false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    latest
  }

  /** Test/ops audit: the dir subset the last probe-pruned op actually
    * opened (merge's touched scan, erasure's hit scan, point reads).
    * Written for spec assertions that non-overlapping dirs are never
    * probed; not part of the operator contract. */
  private[graft] val lastProbedDirs =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)

  /** Test/ops audit: the dir subset the last merge's KEEP-EXISTING
    * probe (its I rows' presence check) actually opened — merge runs
    * two probes per call (touched-dir scan → [[lastProbedDirs]],
    * present-key scan → here), so they need separate audit slots. */
  private[graft] val lastPresentDirs =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)

  /** Delete every sidecar a data dir may own (provenance record, range
    * stats, bloom — current and legacy canon suffix). Data-dir deletion
    * stays at the call sites; missing files are no-ops. */
  private def deleteDirSidecars(fs: org.apache.hadoop.fs.FileSystem,
      path: String, dirName: String): Unit = {
    fs.delete(absorbedPath(path, dirName), false)
    fs.delete(statsPath(path, dirName), false)
    fs.delete(bloomPath(path, dirName), false)
    fs.delete(legacyBloomPath(path, dirName), false)
    fs.delete(dirProfilePath(path, dirName), false)
  }

  /** The subset of `dirs` whose recorded key ranges can overlap
    * `probe`'s keys. One tiny min/max aggregate over the probe (bounded
    * driver metadata, like the version manifests themselves); dirs
    * without a sidecar are kept (conservative). A probe with no
    * non-null value in some key column matches nothing (equi-joins are
    * null-rejecting) → no dir qualifies. */
  /** The closed-interval overlap test both prune stages rest on:
    * probe range [pLo, pHi] can share a key with dir range [dLo, dHi]
    * iff neither lies strictly past the other under [[statLt]]'s order
    * (the order Spark's min/max computed both ranges under — the
    * PropertySpec prune-never-drops property pins the two agree). */
  private[graft] def rangeOverlaps(pLo: Any, pHi: Any,
      dLo: Any, dHi: Any): Boolean =
    !(statLt(pHi, dLo) || statLt(dHi, pLo))

  /** Per-column (name, tag, min/max) of a probe — [[keyRanges]]'
    * result shape, reused by every prune/filter consumer so the one
    * probe aggregate is computed once per op, not once per stage. */
  private[graft] type ProbeRanges = Seq[(String, String, Option[(Any, Any)])]

  /** PUSHABLE bounding-box predicate for a key probe: each supported
    * key column bounded to the probe's [min, max]. Sound as a PRE-JOIN
    * filter on the dir side of any key equi-join/semi/anti probe: a
    * dir row outside the box cannot equal any probe row (equality
    * needs every column inside its bound), and NULL-keyed dir rows —
    * which the filter also drops — can never match a null-rejecting
    * equi-join. The payoff is WHERE the predicate runs: it pushes to
    * the parquet scan (typed literals, no casts around the column), so
    * row groups outside the probe's range are skipped by footer stats
    * — pruning INSIDE dirs the manifest-level stages can't skip, above
    * all the big key-sorted compact dirs (too large for a bloom, range
    * = the whole domain). Columns whose scan-side type disagrees with
    * the probe's stat tag contribute no bound (mixed-type comparison
    * semantics would be unsound); None when nothing is boundable. */
  private def probeRangeFilter(schema: org.apache.spark.sql.types.StructType,
      pr: ProbeRanges): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType}
    val conds = pr.flatMap { case (k, tag, r) =>
      val scanTag = schema.fields.find(_.name == k)
        .flatMap(f => statTag(f.dataType))
      if (!scanTag.contains(tag)) None
      else r.map { case (lo, hi) =>
        if (tag == "long") {
          // The probe's values need NOT fit the scan column's integral
          // type (the probe is the caller's frame — a long probe
          // against an int sink is legal): CLAMP the bounds into the
          // column's representable range, so the literal cast below is
          // always lossless. A naive cast would WRAP (or throw under
          // ANSI) and the wrapped box silently drops true matches —
          // lost point-read rows, merge dirs misclassified clean,
          // partial erasure. A probe range wholly outside the column's
          // domain can match nothing: the filter is `false`.
          val (tMin, tMax) = schema(k).dataType match {
            case ByteType => (Byte.MinValue.toLong, Byte.MaxValue.toLong)
            case ShortType => (Short.MinValue.toLong, Short.MaxValue.toLong)
            case IntegerType => (Int.MinValue.toLong, Int.MaxValue.toLong)
            case _ => (Long.MinValue, Long.MaxValue)
          }
          val loL = lo.asInstanceOf[Long]; val hiL = hi.asInstanceOf[Long]
          if (loL > tMax || hiL < tMin) lit(false)
          else {
            // Literal cast (now provably lossless) keeps the column
            // bare: a long literal against an int attribute would wrap
            // the ATTRIBUTE in a cast and lose parquet pushdown.
            def lc(v: Long) = lit(v).cast(schema(k).dataType)
            col(k) >= lc(math.max(loL, tMin)) &&
              col(k) <= lc(math.min(hiL, tMax))
          }
        } else {
          def toLit(v: Any) = tag match {
            case "string" => lit(v.asInstanceOf[String])
            case "date" => lit(java.time.LocalDate
              .ofEpochDay(v.asInstanceOf[Long]))
            case _ => // "ts"
              val us = v.asInstanceOf[Long]
              lit(java.time.Instant.ofEpochSecond(
                java.lang.Math.floorDiv(us, 1000000L),
                java.lang.Math.floorMod(us, 1000000L) * 1000L))
          }
          col(k) >= toLit(lo) && col(k) <= toLit(hi)
        }
      }
    }
    conds.reduceOption(_ && _)
  }

  private[graft] def overlappingDirs(spark: SparkSession, path: String,
      dirs: Seq[String], keys: Seq[String], probe: DataFrame): Seq[String] =
    overlappingDirs(spark, path, dirs,
      keyRanges(probe, keys.filter(probe.columns.contains)))

  private[graft] def overlappingDirs(spark: SparkSession, path: String,
      dirs: Seq[String], pr: ProbeRanges): Seq[String] = {
    if (pr.isEmpty) return dirs // no supported key column → probe all
    if (pr.exists(_._3.isEmpty)) return Nil // a key col with only NULLs
    val pRange = pr.map { case (k, tag, r) => k -> (tag, r.get) }.toMap
    dirs.filter { d =>
      readKeyStats(spark, path, d) match {
        case None => true
        case Some(stats) =>
          pRange.forall { case (k, (tag, (pLo, pHi))) =>
            stats.get(k) match {
              case Some((dTag, Some((dLo, dHi)))) if dTag == tag =>
                rangeOverlaps(pLo, pHi, dLo, dHi)
              case Some((dTag, None)) if dTag == tag => false // dir: no keys
              case _ => true // unknown column/tag → conservative
            }
          }
      }
    }
  }

  /** TWO-STAGE dir pruning for a key probe — the one entry point every
    * probing op (merge's touched scan, erasure's hit scan, point reads,
    * the keep-existing anti join) goes through. Stage 1: range stats
    * ([[overlappingDirs]]). Stage 2: when the probe's keys are few
    * enough to collect (≤ [[BloomProbeMax]] — bounded driver metadata,
    * the caller's probes are already key-distinct), drop the dirs whose
    * bloom sidecar proves no probed key is present — the stage that
    * still prunes under HASH-DISTRIBUTED keys, where every dir's range
    * spans the whole domain and stage 1 admits everything. Dirs without
    * sidecars always survive both stages; blooms only ever prune true
    * negatives, so pruning is an optimization, never a correctness
    * gate. Callers publish the result to [[lastProbedDirs]] themselves
    * (several ops run more than one probe per call). */
  private[graft] def pruneDirs(spark: SparkSession, path: String,
      dirs: Seq[String], keys: Seq[String], probe: DataFrame,
      pr0: Option[ProbeRanges] = None,
      canons0: Option[Option[Array[String]]] = None): Seq[String] = {
    val pr = pr0.getOrElse(
      keyRanges(probe, keys.filter(probe.columns.contains)))
    val ranged = overlappingDirs(spark, path, dirs, pr)
    if (ranged.isEmpty) return ranged
    if (!keys.forall(probe.columns.contains)) return ranged
    // Canon thunk: precomputed by [[probeFacts]] callers (zero extra
    // jobs — Some(None) means "too many / uncanonizable, skip the bloom
    // stage"), else the collect-based fallback (a Spark job, run only
    // when a bloom actually exists — see bloomStage).
    val canonThunk: () => Option[Array[String]] = canons0 match {
      case Some(c) => () => c
      case None => () => {
        val canon = probe.select(keyCanon(probe, keys).as("__k"))
          .limit(BloomProbeMax + 1).collect().map(_.getString(0))
        if (canon.length > BloomProbeMax) None else Some(canon)
      }
    }
    bloomStage(spark, path, ranged, keys, canonThunk)
  }

  /** Stage-2 bloom pruning over a stage-1 survivor set. The bloom
    * stage is sound ONLY for the sink's own key set: the sidecars hash
    * [[keyCanon]] over the RECORDED keys, so a probe on any other
    * column set (a group-column point read against a doc-keyed sink)
    * would false-negative real matches and silently prune dirs that
    * hold them. The canon thunk runs only when some surviving dir
    * actually HAS a bloom to consult — statless dirs, legacy-canon
    * sidecars and the big compact dirs (> bloom cap by design) would
    * otherwise cost every write/merge/erase one dead collect. */
  private def bloomStage(spark: SparkSession, path: String,
      ranged: Seq[String], keys: Seq[String],
      canons: () => Option[Array[String]]): Seq[String] = {
    if (ranged.isEmpty) return ranged
    if (keys.toSet != recordedKeyCols(spark, path).toSet) return ranged
    val fs = fsFor(spark, path)
    val withBloom = ranged.filter(d =>
      try fs.exists(bloomPath(path, d))
      catch { case scala.util.control.NonFatal(_) => false }).toSet
    if (withBloom.isEmpty) return ranged
    canons() match {
      case None => ranged
      case Some(canon) => ranged.filter { d =>
        if (!withBloom.contains(d)) true
        else readKeyBloom(spark, path, d) match {
          case None => true
          case Some(bf) => canon.exists(bf.mightContainString)
        }
      }
    }
  }

  /** Balanced unionByName: a left-deep `reduce(_.unionByName(_))` over
    * one plan per dir builds a nested Union whose analyzer recursion is
    * as deep as the dir count — on a sink with thousands of
    * range-overlapping trickle dirs that traversal can StackOverflow.
    * A balanced tree keeps the depth at log2(n) with the same result. */
  private def balancedUnion(dfs: Seq[DataFrame]): DataFrame =
    if (dfs.size == 1) dfs.head
    else {
      val (l, r) = dfs.splitAt(dfs.size / 2)
      balancedUnion(l).unionByName(balancedUnion(r))
    }

  /** Driver-side bloom canons of collected probe rows — mirrors
    * [[keyCanon]]: name-sorted columns, NULL components skipped
    * (concat_ws semantics), canon per [[bloomCanonOf]]. Shared by
    * [[probeFacts]] and the merge prologue's facts path. */
  private def canonRowsOf(rows: Array[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType,
      keys: Seq[String]): Array[String] =
    rows.map { r =>
      keys.sorted.flatMap { k =>
        val i = schema.fieldIndex(k)
        if (r.isNullAt(i)) None else bloomCanonOf(r.get(i))
      }.mkString("\u0001")
    }.distinct

  /** Probe-side key frames whose EXACT row count the caller already
    * knows broadcast explicitly below this cap: without their own
    * checkpoint the planner estimates them from the batch checkpoint's
    * size (filters don't shrink basic stats), which can silently flip
    * the semi/anti probes to sort-merge — shuffling the DIR side, the
    * exact cost the probe pruning exists to avoid (guide §3.1: pick
    * the strategy deliberately). ~50 B/key ⇒ ≤ ~50 MB broadcast. */
  private val BroadcastKeysMax = 1000000L
  private def maybeBroadcastKeys(df: DataFrame, cnt: Long): DataFrame =
    if (cnt > 0 && cnt <= BroadcastKeysMax) broadcast(df) else df

  /** ONE bounded job over a key-distinct probe frame: collect up to
    * [[BloomProbeMax]]+1 rows. If they all fit (the trickle-write
    * norm), the probe's RANGES and BLOOM CANONS both derive on the
    * driver from the collected rows — replacing the range aggregate
    * job plus the canon collect job every probing op used to pay. A
    * larger probe falls back to the range aggregate with no canon set,
    * exactly the regime where the bloom stage's own cap skipped it
    * anyway. Canons are produced only when every key column's type is
    * inside the canon domain ([[statTag]]) — exotic-typed keys keep
    * the conservative no-bloom path (such sinks never had blooms
    * consulted through driver canons before either). */
  private def probeFacts(probe: DataFrame, keys: Seq[String])
      : (ProbeRanges, Option[Option[Array[String]]], Option[Long]) = {
    val cols = keys.filter(probe.columns.contains)
    val rows = labeled(probe.sparkSession, "graft.probeFacts")(
      probe.limit(BloomProbeMax + 1).collect())
    if (rows.length > BloomProbeMax) {
      // Large probe: the range aggregate also yields the probe's ROW
      // count — an upper bound on its distinct keys, which sizes the
      // observed bloom of the dir the caller is about to write.
      val (pr, _, totalRows) = keyRangesWithCount(probe, cols, cols)
      return (pr, Some(None),
        if (totalRows >= 0) Some(totalRows) else None)
    }
    val schema = probe.schema
    val pr: ProbeRanges = cols.flatMap { k =>
      statTag(schema(k).dataType).map { tag =>
        val idx = schema.fieldIndex(k)
        val canon = rows.iterator.filterNot(_.isNullAt(idx))
          .flatMap(r => probeCanon(r.get(idx)))
          .collect { case (t, v) if t == tag => v }.toSeq
        val mn = canon.reduceOption((a, b) => if (statLt(a, b)) a else b)
        val mx = canon.reduceOption((a, b) => if (statLt(a, b)) b else a)
        (k, tag, for (lo <- mn; hi <- mx) yield (lo, hi))
      }
    }
    val canonable = keys.forall(k => probe.columns.contains(k) &&
      statTag(schema(k).dataType).isDefined)
    val canons =
      if (!canonable) None
      else Some(canonRowsOf(rows, schema, keys))
    (pr, Some(canons), Some(rows.length.toLong))
  }

  /** KEY-SORTED rewrite for compaction outputs: range-partition + sort
    * by the sink's recorded keys, so the compacted dir's parquet
    * footers carry tight, DISJOINT per-file/per-row-group key ranges.
    * A big compact dir is exactly where the sidecar prune stages go
    * blind (range = the whole domain, > bloom cap) — the sort is what
    * lets every later probe's pushed bounding box skip row groups
    * inside it. Cost: one range exchange riding a rewrite that already
    * reads and writes its whole input. Identity when the sink has no
    * recorded keys or a key column is absent. */
  private def keySortedForFooters(df: DataFrame,
      statKeys: Seq[String]): DataFrame =
    if (statKeys.nonEmpty && statKeys.forall(df.columns.contains))
      df.repartitionByRange(statKeys.map(col): _*)
        .sortWithinPartitions(statKeys.map(col): _*)
    else df

  /** The sink's key columns, persisted once so keyless ops (compaction)
    * can still record stats sidecars for the dirs they write. */
  private def keyColsPath(path: String) =
    new org.apache.hadoop.fs.Path(snapDir(path), "keys.cols")

  private def recordKeyCols(spark: SparkSession, path: String,
      keys: Seq[String]): Unit =
    try {
      val fs = fsFor(spark, path)
      val out = fs.create(keyColsPath(path), true)
      try out.write(keys.mkString("\n").getBytes("UTF-8")) finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  private def recordedKeyCols(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsFor(spark, path)
    if (!fs.exists(keyColsPath(path))) Nil
    else {
      val in = fs.open(keyColsPath(path))
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  // ── value-column data skipping ──────────────────────────────────
  // Key-range sidecars prune KEY probes; a reader filtering on a
  // non-key column (`n_chars > x`) still opens every dir. Declared
  // SKIP COLUMNS extend each dir's `.stats` sidecar with min/max lines
  // for value columns — same format, same folded writer aggregate
  // (zero extra passes) — and [[readSnapshotWhere]] prunes manifest
  // dirs whose recorded box cannot intersect a predicate's bounds
  // (Delta's dataSkippingNumIndexedCols read path, by declaration
  // instead of first-N). Declaration affects FUTURE dir writes; dirs
  // written before it have no lines for the column and are read
  // (conservative, never wrong). Run a compaction after declaring to
  // backfill the corpus's sidecars in one rewrite.

  private def skipColsPath(path: String) =
    new org.apache.hadoop.fs.Path(snapDir(path), "skip.cols")

  /** Declare the value columns whose min/max every FUTURE dir write
    * records for data skipping. Overwrites the previous declaration
    * (the sidecars of already-written dirs are unaffected either way). */
  def declareSkipCols(spark: SparkSession, path: String,
      cols: Seq[String]): Unit = {
    val fs = fsFor(spark, path)
    fs.mkdirs(snapDir(path))
    val out = fs.create(skipColsPath(path), true)
    try out.write(cols.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  private def recordedSkipCols(spark: SparkSession, path: String): Seq[String] =
    try {
      val fs = fsFor(spark, path)
      if (!fs.exists(skipColsPath(path))) Nil
      else {
        val in = fs.open(skipColsPath(path))
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toList
        finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }

  // ── schema-evolution metadata ops ───────────────────────────────
  // The sink tolerates ADDITIVE physical evolution (mergeSchema) but
  // had no DECLARED evolution: a renamed source column silently forked
  // the schema — old dirs under the old name, new dirs under the new,
  // readers seeing both half-NULL. `_snapshots/schema.map` records
  // add/rename ops as ORDERED metadata lines; no data is rewritten:
  //   - reads apply the map (rename = coalesce old into new where both
  //     physical names coexist, then drop the old; add = surface the
  //     column as typed NULL until data carries it);
  //   - writes NORMALIZE incoming batches through the map, so a
  //     producer still emitting the dead name keeps landing in the
  //     live column instead of forking;
  //   - a compaction physically migrates (it reads the mapped view and
  //     writes it), after which the map entries are no-ops.
  // KEY columns are identity and refuse to rename (their physical name
  // is burned into every sidecar, probe and manifest invariant);
  // declared skip columns rename atomically with the map (old dirs'
  // stats lines simply stop pruning — conservative, never wrong).

  private def schemaMapPath(path: String) =
    new org.apache.hadoop.fs.Path(snapDir(path), "schema.map")

  /** (kind, a, b) triples in declaration order: ("add", name, ddl) |
    * ("rename", from, to). */
  private def recordedSchemaMap(spark: SparkSession,
      path: String): Seq[(String, String, String)] =
    try {
      val fs = fsFor(spark, path)
      if (!fs.exists(schemaMapPath(path))) Nil
      else {
        val in = fs.open(schemaMapPath(path))
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).map { l =>
            val a = l.split("\t", 3)
            (a(0), java.net.URLDecoder.decode(a(1), "UTF-8"),
              if (a(0) == "add") a(2)
              else java.net.URLDecoder.decode(a(2), "UTF-8"))
          }.toList
        finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** Append one evolution line under the REWRITER LOCK, published by
    * tmp+rename: evolution ops are rare admin actions, but a plain
    * read-modify-overwrite had two silent failure modes — concurrent
    * declarations losing lines, and a reader catching the truncate
    * window of an overwriting create, seeing an EMPTY map, and serving
    * unhealed data / landing un-normalized batches (the exact fork the
    * map exists to prevent). The lock serializes declarers; the rename
    * makes every read all-or-nothing. */
  private def appendSchemaMapLine(spark: SparkSession, path: String,
      kind: String, a: String, b: String): Unit = {
    val fs = fsFor(spark, path)
    fs.mkdirs(snapDir(path))
    val lock = acquireRewriterLock(fs, path, s"${kind}Column")
    try {
      val prior = recordedSchemaMap(spark, path)
      val bEnc = if (kind == "add") b
                 else java.net.URLEncoder.encode(b, "UTF-8")
      val lines = prior.map { case (k, x, y) =>
        val yEnc = if (k == "add") y else java.net.URLEncoder.encode(y, "UTF-8")
        s"$k\t${java.net.URLEncoder.encode(x, "UTF-8")}\t$yEnc"
      } :+ s"$kind\t${java.net.URLEncoder.encode(a, "UTF-8")}\t$bEnc"
      val tmp = new org.apache.hadoop.fs.Path(snapDir(path),
        "schema.map.tmp")
      val out = fs.create(tmp, true)
      try out.write(lines.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      fs.delete(schemaMapPath(path), false)
      if (!fs.rename(tmp, schemaMapPath(path)))
        throw new java.io.IOException(
          s"schema.map publish failed at $path — declaration NOT applied")
    } finally fs.delete(lock, false)
  }

  /** Names currently DROPPED by the map (a later add/rename-to would
    * re-use the name — refused, see [[dropColumn]]). */
  private def droppedCols(spark: SparkSession, path: String): Set[String] =
    recordedSchemaMap(spark, path)
      .collect { case ("drop", n, _) => n }.toSet

  /** Declare a column added to the sink's LOGICAL schema: reads
    * surface it as a typed NULL until some batch physically carries
    * it. Metadata-only — nothing is rewritten. A DROPPED name cannot
    * be re-used: without column IDs the old physical values would
    * resurrect under the re-added name (or, normalized away, the new
    * column could never carry data) — name re-use needs a new name or
    * a new sink. */
  def addColumn(spark: SparkSession, path: String, name: String,
      dataType: org.apache.spark.sql.types.DataType): Unit = {
    require(name.nonEmpty, "addColumn: empty name")
    require(!droppedCols(spark, path).contains(name),
      s"addColumn: '$name' was dropped — a dropped name cannot be " +
        "re-used (no column IDs in this format-lite sink: the old " +
        "physical values would resurrect); pick a new name")
    appendSchemaMapLine(spark, path, "add", name, dataType.sql)
  }

  /** Declare a column RENAME as metadata: reads project the old
    * physical name into the new (coalescing where both coexist);
    * writes normalize a batch still using the old name. Refuses to
    * rename a recorded KEY column — keys are the sink's identity, and
    * every sidecar, probe and manifest invariant is keyed to their
    * physical names. Declared skip columns follow the rename. */
  def renameColumn(spark: SparkSession, path: String, from: String,
      to: String): Unit = {
    require(from != to, "renameColumn: from == to")
    require(!recordedKeyCols(spark, path).contains(from),
      s"renameColumn: '$from' is a key column — keys are the sink's " +
        "identity and cannot rename (create a new sink and backfill)")
    // The TARGET must not collide with anything live: a rename onto a
    // key would shadow the identity column; onto a dropped name it
    // would resurrect old physical values; onto an existing LOGICAL
    // column the coalesce projection would silently merge two
    // unrelated columns, discarding `to`'s NULLs' counterparts —
    // Delta refuses rename-onto-existing for exactly this reason.
    require(!recordedKeyCols(spark, path).contains(to),
      s"renameColumn: target '$to' is a key column")
    require(!droppedCols(spark, path).contains(to),
      s"renameColumn: target '$to' was dropped — a dropped name " +
        "cannot be re-used (old physical values would resurrect)")
    val cur = latestVersion(spark, path)
    if (cur >= 1)
      require(!readSnapshot(spark, path, cur).columns.contains(to),
        s"renameColumn: target '$to' already exists in the sink's " +
          "logical schema — renaming onto a live column would silently " +
          "merge two unrelated columns")
    appendSchemaMapLine(spark, path, "rename", from, to)
    val skips = recordedSkipCols(spark, path)
    if (skips.contains(from))
      declareSkipCols(spark, path, skips.map(c => if (c == from) to else c))
  }

  /** Declare a column DROPPED from the sink's logical schema: reads
    * project it away at EVERY version (the map is sink-level, like
    * rename); the physical bytes linger until a compaction migrates.
    * The name is then RETIRED — add/rename refuse to re-use it
    * (without column IDs the old physical values would resurrect, or
    * the write normalization would black-hole the re-added column).
    * Refuses keys and declared skip columns (undeclare skipping
    * first — a dropped column must not keep driving dir pruning).
    * Metadata-only. */
  def dropColumn(spark: SparkSession, path: String, name: String): Unit = {
    require(!recordedKeyCols(spark, path).contains(name),
      s"dropColumn: '$name' is a key column — keys are the sink's " +
        "identity and cannot drop")
    require(!recordedSkipCols(spark, path).contains(name),
      s"dropColumn: '$name' is a declared skip column — " +
        "declareSkipCols without it first")
    appendSchemaMapLine(spark, path, "drop", name, "-")
  }

  /** The logical view of a physically-read frame: apply the declared
    * evolution ops in order. Idempotent (a physically-migrated dir
    * no-ops every entry). */
  private def applySchemaMap(spark: SparkSession, path: String,
      df: DataFrame): DataFrame =
    recordedSchemaMap(spark, path).foldLeft(df) {
      case (d, ("add", name, ddl)) =>
        if (d.columns.contains(name)) d
        else d.withColumn(name, lit(null).cast(
          org.apache.spark.sql.types.DataType.fromDDL(ddl)))
      case (d, ("rename", from, to)) =>
        (d.columns.contains(from), d.columns.contains(to)) match {
          case (true, true) =>
            // Both physical names coexist (dirs from before and after
            // the rename): per row at most one side is non-null; a dir
            // carrying both prefers the live name.
            d.withColumn(to, coalesce(col(to), col(from))).drop(from)
          case (true, false) => d.withColumnRenamed(from, to)
          case _ => d
        }
      case (d, ("drop", name, _)) =>
        if (d.columns.contains(name)) d.drop(name) else d
      case (d, _) => d
    }

  /** Write-side normalization: route a batch still using renamed-away
    * column names into the live names, and strip dropped columns so a
    * lagging producer cannot silently re-grow them (prevents the
    * silent fork either way). Adds are not materialized — absence
    * reads as NULL. */
  private def normalizeBatch(spark: SparkSession, path: String,
      batch: DataFrame): DataFrame =
    recordedSchemaMap(spark, path).foldLeft(batch) {
      case (d, ("rename", from, to)) if d.columns.contains(from) &&
          !d.columns.contains(to) => d.withColumnRenamed(from, to)
      case (d, ("drop", name, _)) if d.columns.contains(name) =>
        d.drop(name)
      case (d, _) => d
    }

  /** Renamed-away SOURCE names — using one as a merge key is refused
    * loudly (the physical dirs still carry it, but it is no longer the
    * sink's live identity and the landing rows would fork). */
  private def renamedAwayCols(spark: SparkSession, path: String): Set[String] = {
    val m = recordedSchemaMap(spark, path)
    val renames = m.collect { case ("rename", f, t) => (f, t) }
    // A name re-introduced by a later rename chain (a→b then c→a) is
    // live again; walk in order.
    var dead = Set.empty[String]
    renames.foreach { case (f, t) => dead = dead - t + f }
    dead
  }

  /** Stat tag for a PROBE bound supplied as a Scala value. */
  private def probeTagOf(v: Any): Option[String] = v match {
    case _: Byte | _: Short | _: Int | _: Long => Some("long")
    case _: String => Some("string")
    case _: java.sql.Date | _: java.time.LocalDate => Some("date")
    case _: java.sql.Timestamp | _: java.time.Instant => Some("ts")
    case _ => None
  }

  /** Driver-side cache of a DIR SET's merged PHYSICAL schema, keyed by
    * (path, exact dir list). Data dirs are immutable, so the merged
    * footer schema of a fixed dir list is a permanent fact — but
    * re-deriving it via a mergeSchema `.limit(0)` read costs one footer
    * GET per file across the whole manifest, which on an object store
    * turns every bounded read's schema-stability step into a
    * corpus-wide metadata storm (the exact win data skipping exists
    * for). Repoints/rewrites change the dir LIST, so they change the
    * key — never a stale hit. Access-ordered, capped: a long-lived
    * session touching many sinks evicts, it never grows unbounded. */
  private val rawSchemaCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String, Seq[String]),
        org.apache.spark.sql.types.StructType](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Seq[String]),
            org.apache.spark.sql.types.StructType]): Boolean = size > 64
    })

  private def rawUnionSchema(spark: SparkSession, path: String,
      gen: String, dirs: Seq[String])
      : org.apache.spark.sql.types.StructType = {
    val key = (path, gen, dirs)
    val hit = rawSchemaCache.get(key)
    if (hit != null) hit
    else {
      val sc = spark.read.option("mergeSchema", "true")
        .parquet(dirs.map(d => s"$path/$d"): _*).schema
      rawSchemaCache.put(key, sc)
      sc
    }
  }

  /** EMPTY frame in snapshot `version`'s LOGICAL (schema-mapped) shape,
    * at driver-metadata cost after the first call per (path, manifest
    * generation, dir list) — the schema-stability anchor for
    * bounded/pruned reads, replacing a full-manifest mergeSchema
    * footer read per call. The manifest FILE's (mtime, length) rides
    * the cache key: dir-name reuse after a delete-and-recreate of the
    * whole sink at the same path (claims restart at v1, so batch-1
    * names recur) must never serve the dead sink's schema. */
  private def emptyLogicalFrame(spark: SparkSession, path: String,
      version: Int): DataFrame = {
    val fs = fsFor(spark, path)
    val gen = try {
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(
        snapDir(path), s"v$version.list"))
      s"${st.getModificationTime}:${st.getLen}"
    } catch { case scala.util.control.NonFatal(_) => "?" }
    val raw = rawUnionSchema(spark, path, gen,
      manifestDirs(spark, path, version))
    applySchemaMap(spark, path, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], raw))
  }

  /** (tag, canonical value) of a probe-able Scala value — Long for
    * integral/date/ts (epoch day / epoch micros), String for strings;
    * None for unsupported types. The comparison domain [[statLt]]
    * orders and the DSv2 scan builder intersects filter bounds in. */
  private[graft] def probeCanon(v: Any): Option[(String, Any)] =
    probeTagOf(v).map(t =>
      (t, decodeStatValue(t, encodeStatValue(t, v))))

  /** Snapshot `version`'s LOGICAL (schema-mapped) schema at cached
    * driver-metadata cost — the DSv2 relation's inferSchema. */
  private[graft] def snapshotLogicalSchema(spark: SparkSession,
      path: String, version: Int): org.apache.spark.sql.types.StructType =
    emptyLogicalFrame(spark, path, version).schema

  /** Read snapshot `version` restricted to closed per-column bounds
    * `ranges` (`col -> (lo, hi)`, Scala values: integral, String,
    * Date/LocalDate, Timestamp/Instant) — opening ONLY the dirs whose
    * recorded `.stats` box can intersect the bounds. The value-column
    * twin of [[readSnapshotForKeys]]: on a sink whose dirs separate by
    * a declared skip column (ingest date, score band, tenant), a
    * bounded read opens the matching dirs, not the corpus. Dirs
    * without a recorded range for a bounded column are read
    * (conservative); the surviving scan applies the bounds as a real
    * filter — pushed to parquet with typed literals where the scan
    * type matches, coercing otherwise — so the result is exact
    * whatever the sidecars knew. Publishes the probed subset to
    * [[lastProbedDirs]]. */
  def readSnapshotWhere(spark: SparkSession, path: String, version: Int,
      ranges: Map[String, (Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "readSnapshotWhere: no bounds given")
    val pr: ProbeRanges = ranges.toSeq.map { case (k, (lo, hi)) =>
      val tag = probeTagOf(lo).filter(t => probeTagOf(hi).contains(t))
        .getOrElse(throw new IllegalArgumentException(
          s"readSnapshotWhere: unsupported/mismatched bound types for " +
            s"'$k': ${lo.getClass.getSimpleName}/${hi.getClass.getSimpleName}"))
      (k, tag, Some((decodeStatValue(tag, encodeStatValue(tag, lo)),
        decodeStatValue(tag, encodeStatValue(tag, hi)))))
    }
    val entries = manifestEntries(spark, path, version)
    val candidates = overlappingDirs(spark, path, entries.map(_.dir), pr)
    lastProbedDirs.set(candidates)
    // The FULL snapshot's logical schema (cached driver metadata, not a
    // per-call corpus footer read) anchors both the bound validation
    // and the shape of the result: bounds are legal iff the column
    // exists in the LOGICAL schema — a column physically carried only
    // by pruned dirs still validates (its value is NULL on every
    // surviving row, so the bound correctly drops them), where
    // validating against the pruned subset threw exactly when pruning
    // worked best.
    val full = emptyLogicalFrame(spark, path, version)
    require(ranges.keys.forall(full.columns.contains),
      s"readSnapshotWhere: bounded column(s) absent from the snapshot " +
        s"schema: ${ranges.keys.filterNot(full.columns.contains).mkString(",")}")
    if (candidates.isEmpty) return full
    // Mapped BEFORE the bounds apply, so `ranges` addresses the
    // LOGICAL (post-evolution) column names; a renamed column's bound
    // filters through the coalesce (no pushdown for that column —
    // conservative, still exact).
    val scan0 = applySchemaMap(spark, path, readEntriesRaw(spark, path,
      entries.filter(e => candidates.contains(e.dir))))
    // Bounded columns the candidate subset doesn't physically carry
    // surface as typed NULLs (the full-schema alignment below would add
    // them anyway; the bounds need them present to filter).
    val scan = full.columns.foldLeft(scan0)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(full.schema(c).dataType)))
    // Pushable typed bounds where the scan type agrees with the probe
    // tag; coercing `between` for the rest — exactness never rests on
    // the pushdown.
    val boundable = pr.filter { case (k, tag, _) =>
      scan0.schema.fields.find(_.name == k)
        .flatMap(f => statTag(f.dataType)).contains(tag)
    }
    val pushed = probeRangeFilter(scan.schema, boundable)
    val boundedSet = boundable.map(_._1).toSet
    val generic = ranges.toSeq.filterNot(kv => boundedSet(kv._1))
      .map { case (k, (lo, hi)) => col(k) >= lit(lo) && col(k) <= lit(hi) }
      .reduceOption(_ && _)
    val filtered = (pushed.toSeq ++ generic.toSeq).reduceOption(_ && _)
      .map(scan.filter).getOrElse(scan)
    // SCHEMA STABILITY: order pinned to the full snapshot's logical
    // schema, so the same call never changes shape with its bounds.
    filtered.select(full.columns.toIndexedSeq.map(col): _*)
  }

  // ── DSv2 BATCH-scan support ─────────────────────────────────────
  // The DSv2 relation's Batch path (GraftBatchScan) plans one input
  // partition per parquet file of the ADMITTED dirs — admission reuses
  // the same sidecar machinery as readSnapshotWhere, extended with the
  // runtime In-filters Spark feeds the scan from a broadcast join's
  // build side (SupportsRuntimeFiltering). These helpers expose the
  // pieces the scan needs at driver planning time.

  /** Is snapshot `version` readable by the file-level Batch path?
    * Requires: no declared schema evolution (the Batch reader serves
    * physical file schemas with additive null-fill only — renames/
    * drops/adds need the mapped read) and no deletion vectors (the dv
    * anti-join needs the DataFrame read). Conservative: ineligible
    * snapshots fall back to the V1 bridge, never a wrong answer. */
  private[graft] def batchScanEligible(spark: SparkSession, path: String,
      version: Int): Boolean =
    recordedSchemaMap(spark, path).isEmpty &&
      manifestEntries(spark, path, version).forall(_.dvs.isEmpty)

  /** Columns whose sidecar stats can prune dirs — the sink's recorded
    * keys plus declared skip columns. The DSv2 scan advertises exactly
    * these as runtime-filterable (anything else could never prune, so
    * a DPP subquery on it would be pure overhead). */
  private[graft] def prunableCols(spark: SparkSession,
      path: String): Seq[String] =
    (recordedKeyCols(spark, path) ++ recordedSkipCols(spark, path)).distinct

  /** The sink's recorded key columns — the change-feed relation's
    * default `keys`. */
  private[graft] def recordedKeyColsOf(spark: SparkSession,
      path: String): Seq[String] = recordedKeyCols(spark, path)

  /** Persist the sink's key declaration ahead of the first write —
    * the catalog's CREATE TABLE hook, so a later plain INSERT
    * bootstraps keyed without repeating the option. */
  private[graft] def declareKeys(spark: SparkSession, path: String,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "declareKeys: empty key list")
    fsFor(spark, path).mkdirs(snapDir(path))
    recordKeyCols(spark, path, keys)
  }

  /** Bloom-canon string of an external probe value — mirrors
    * [[keyCanon]]'s single-column rendering (cast-to-string for
    * long/string, epoch day / epoch micros for date/ts). */
  private def bloomCanonOf(v: Any): Option[String] = v match {
    case n: java.lang.Number if probeTagOf(v).contains("long") =>
      Some(n.longValue.toString)
    case s: String => Some(s)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toString)
    case d: java.time.LocalDate => Some(d.toEpochDay.toString)
    case t: java.sql.Timestamp =>
      // floorDiv: see encodeStatValue — truncation mis-canons pre-1970
      // fractional-second probes, and bloom admission is recall-bearing.
      Some((Math.floorDiv(t.getTime, 1000L) * 1000000L +
        t.getNanos / 1000L).toString)
    case t: java.time.Instant =>
      Some((t.getEpochSecond * 1000000L + t.getNano / 1000L).toString)
    case _ => None
  }

  /** Dir admission for the DSv2 Batch scan: stage-1 range overlap over
    * the merged per-column bounds (plan-time filter boxes ∪ runtime
    * join-key boxes), then the bloom stage when a runtime key SET
    * addresses the sink's whole recorded key (single column — the
    * bloom canon is composite, so a partial key can't probe it).
    * Bounds are external Scala values, same domain as
    * [[readSnapshotWhere]]. Both stages admit supersets only — a
    * pruned dir provably holds no matching row — and the join itself
    * re-filters, so admission is never correctness-bearing for the
    * runtime part either. Publishes the admitted set to
    * [[lastProbedDirs]]. */
  private[graft] def admitDirsFor(spark: SparkSession, path: String,
      version: Int, ranges: Map[String, (Any, Any)],
      keySets: Map[String, Seq[Any]]): Seq[String] = {
    val pr: ProbeRanges = ranges.toSeq.flatMap { case (k, (lo, hi)) =>
      for {
        tl <- probeTagOf(lo); th <- probeTagOf(hi) if tl == th
      } yield (k, tl, Some((decodeStatValue(tl, encodeStatValue(tl, lo)),
        decodeStatValue(tl, encodeStatValue(tl, hi)))))
    }
    val dirs = manifestEntries(spark, path, version).map(_.dir)
    val ranged = overlappingDirs(spark, path, dirs, pr)
    val admitted = recordedKeyCols(spark, path) match {
      case Seq(k) if ranged.nonEmpty && keySets.contains(k) &&
          keySets(k).nonEmpty && keySets(k).size <= BloomProbeMax &&
          keySets(k).forall(v => bloomCanonOf(v).isDefined) =>
        val canons = keySets(k).flatMap(bloomCanonOf)
        val fs = fsFor(spark, path)
        ranged.filter { d =>
          val hasBloom = try fs.exists(bloomPath(path, d))
            catch { case scala.util.control.NonFatal(_) => false }
          !hasBloom || (readKeyBloom(spark, path, d) match {
            case None => true
            case Some(bf) => canons.exists(bf.mightContainString)
          })
        }
      case _ => ranged
    }
    lastProbedDirs.set(admitted)
    admitted
  }

  /** The parquet data files of `dirs` (driver metadata listing — one
    * RPC per dir, the same class of cost as the manifest read). */
  private[graft] def snapshotDataFiles(spark: SparkSession, path: String,
      dirs: Seq[String]): Seq[String] = {
    val fs = fsFor(spark, path)
    dirs.flatMap { d =>
      fs.listStatus(new org.apache.hadoop.fs.Path(path, d)).toSeq
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
            !n.startsWith(".")
        }
        .map(_.getPath.toString)
    }
  }

  // ── provenance ──────────────────────────────────────────────────
  // Manifests are dir-name lists, but concurrency reasoning needs ROW
  // provenance: which original batches a dir's rows descend from.
  //   batch-N            → root batch-N (itself)
  //   batch-N-r<k>       → root batch-N (a conflict-resolved REWRITE of
  //                        batch-N's fresh rows, see reconcileLineage)
  //   compact-N          → the roots it absorbed, recorded at compaction
  //                        time in `_snapshots/compact-N.absorbed` (one
  //                        root per line; the CLOSURE, so reading it
  //                        never recurses)
  // coverage(dirs) = union of provenance — "whose contributions does
  // this lineage already carry". Reconciliation and the compaction
  // carry diff COVERAGE, never dir names: a dir absorbed by a later
  // compaction is still reachable, and a compacted base can never be
  // re-included alongside its own compact dir (the r14 double-read
  // hazards).

  private[graft] def rootOf(dirName: String): String =
    dirName.replaceFirst("-r\\d+$", "")

  /** The version number of a dir's LAST rewrite suffix (`-r<v>` heal,
    * `-m<v>` merge, `-e<v>` erasure), 0 for a pristine dir. Rewrite
    * versions come from [[claimVersion]] so they are unique and
    * strictly increase over time, and every rewrite reads the dir's
    * THEN-CURRENT form — so among same-root, equal-provenance siblings
    * (e.g. `batch-1-r5` vs `batch-1-r7` from two heal rounds whose
    * intermediate manifests a crossed publish dropped), the HIGHER
    * suffix is the newer line of truth: it already carries every yield/
    * erase the lower one does. */
  private[graft] def rewriteSeq(dirName: String): Int =
    "-[rme](\\d+)$".r.findFirstMatchIn(dirName)
      .map(_.group(1).toInt).getOrElse(0)

  /** The ORIGINAL root a dir's name descends from, stripping EVERY
    * trailing rewrite suffix, stacked included (`batch-1-m5-r7` →
    * `batch-1`). [[rootOf]] strips only a final `-r` (it exists to
    * derive name-based provenance and `-m`/`-e` rewrites carry explicit
    * `.absorbed` records instead); FAMILY identity — "are these two
    * dirs rewrites of the same line of truth?" — needs the full strip,
    * or a heal rewrite (`batch-1-r3`) and a merge rewrite
    * (`batch-1-m5`) of one root pass as unrelated and ride the same
    * manifest together, publishing their shared keys twice. */
  private[graft] def familyRoot(dirName: String): String = {
    var d = dirName
    var prev = ""
    while (d != prev) { prev = d; d = d.replaceFirst("-[rme]\\d+$", "") }
    d
  }

  private def absorbedPath(path: String, dirName: String) =
    new org.apache.hadoop.fs.Path(snapDir(path), s"$dirName.absorbed")

  private def provenance(spark: SparkSession, path: String,
                         dirName: String): Set[String] = {
    val fs = fsFor(spark, path)
    val f = absorbedPath(path, dirName)
    // Any dir may carry an explicit absorbed record (compact dirs
    // always do; merge rewrites do too — their names don't parse to a
    // root). A compact dir WITHOUT one (pre-provenance sinks) is its
    // own opaque root — conservative: it can satisfy no other dir's
    // reachability and is never skipped from a carry.
    if (fs.exists(f)) {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toSet
      finally in.close()
    }
    else if (dirName.startsWith("compact-")) Set(dirName)
    else Set(rootOf(dirName))
  }

  private def coverage(spark: SparkSession, path: String,
                       dirs: Seq[String]): Set[String] =
    dirs.iterator.flatMap(d => provenance(spark, path, d)).toSet

  // ── rewrite generation ──────────────────────────────────────────
  // Content-CHANGING rewrites (merge U/D, erasure, a reconcile heal
  // that yields keys) are invisible to name-based delta reasoning once
  // a later compaction absorbs the renamed dirs — so each one drops a
  // `gen-<version>.touch` marker (version from claimVersion → unique,
  // race-free without a counter file). Incremental consumers
  // ([[refreshAggregate]]) record the generation fingerprint they saw;
  // a changed fingerprint means counted rows were mutated and the only
  // safe refresh is a recompute. Compaction does NOT touch a marker:
  // it is content-preserving by construction.

  private def touchRewriteGen(spark: SparkSession, path: String,
      version: Int): Unit = {
    // NOT best-effort: this marker is the sole signal that routes
    // incremental consumers to a recompute after a content rewrite — a
    // swallowed failure here lets the next refresh double-count the
    // rewritten rows (or retain an erased subject's sums) silently.
    // Failing the whole op is the cheap, honest outcome: the caller
    // retries and no reader ever saw a lie.
    val fs = fsFor(spark, path)
    fs.create(new org.apache.hadoop.fs.Path(snapDir(path),
      s"gen-$version.touch"), true).close()
  }

  /** (count, max version) of the `<prefix>-*.touch` markers — the ONE
    * fingerprint body behind [[rewriteGen]] and [[eraseGen]]: markers
    * are only ever added with unique versions, so any new marker
    * changes the pair. */
  private def genFingerprint(spark: SparkSession, path: String,
      prefix: String): String = {
    val fs = fsFor(spark, path)
    if (!fs.exists(snapDir(path))) return "0:0"
    val vs = fs.listStatus(snapDir(path)).toSeq.map(_.getPath.getName)
      .flatMap(numberedName(_, prefix, ".touch"))
    s"${vs.size}:${vs.foldLeft(0)(math.max)}"
  }

  /** Fingerprint of the content-rewrite history (merge/heal/erase). */
  private[graft] def rewriteGen(spark: SparkSession, path: String): String =
    genFingerprint(spark, path, "gen-")

  /** Fingerprint of the IN-PLACE history edits only — `erase-*.touch`
    * markers stamped by [[eraseKeys]] commits. The change feed is exact
    * across merges/compactions/heals (they publish NEW versions and
    * never alter an existing manifest's content), so a feed-driven
    * consumer must NOT recompute on every merge the way name-based
    * delta readers do ([[rewriteGen]]); erasure is the one op that
    * rewrites BOTH of a span's endpoints in place — the erased rows
    * vanish from both sides and the diff can never emit their deletes.
    * This narrower fingerprint is what feed consumers pin. */
  private[graft] def eraseGen(spark: SparkSession, path: String): String =
    genFingerprint(spark, path, "erase-")

  /** Claim version number `latest+1` by CREATE-EXCLUSIVE of a
    * `v<N>.claim` marker: the optimistic-concurrency step that stops
    * two writers publishing the same version number. On collision the
    * loser re-reads the latest version (published OR claimed) and
    * claims the next slot — so two writers racing for v2 publish v2
    * and v3, never v2 twice. A crashed claimant leaves an orphaned
    * claim file; its version number is simply skipped (version numbers
    * are dense only absent crashes — `latestVersion` counts published
    * manifests, so readers never see the hole), and [[expireSnapshots]]
    * sweeps claims the protocol has provably passed. */
  private def claimVersion(spark: SparkSession, path: String): Int = {
    val fs = fsFor(spark, path)
    fs.mkdirs(snapDir(path))
    var attempts = 0
    while (attempts < 1000) {
      val published = latestVersion(spark, path)
      val claimed = fs.listStatus(snapDir(path)).toSeq.map(_.getPath.getName)
        .flatMap(numberedName(_, "v", ".claim"))
        .foldLeft(0)(math.max)
      val target = math.max(published, claimed) + 1
      val marker = new org.apache.hadoop.fs.Path(snapDir(path), s"v$target.claim")
      try {
        createExclusive(fs, marker)
        return target
      } catch {
        // Only a LOST RACE retries. java.nio and Hadoop each signal it
        // with their own FileAlreadyExistsException; some HDFS paths
        // surface it as a bare IOException, distinguishable by the
        // marker now existing. Anything else (permission denied,
        // connectivity) is a real failure — rethrowing immediately
        // beats spinning 1000 list+create loops into a misleading
        // "writer storm" report.
        case _: java.nio.file.FileAlreadyExistsException => attempts += 1
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => attempts += 1
        case e: java.io.IOException =>
          if (fs.exists(marker)) attempts += 1 else throw e
      }
    }
    throw new IllegalStateException(
      s"claimVersion: could not claim a snapshot version at $path after " +
        "1000 attempts — writer storm or a filesystem refusing exclusive create")
  }

  /** Post-publish LINEAGE reconciliation — the second half of the
    * optimistic protocol. The hazard: W1 claims v2, W2 claims v3, both
    * chain off v1; W2 publishes v3 = [b1, b3] first, W1 then publishes
    * v2 = [b1, b2] — every FUTURE writer chains off v3 (the latest
    * manifest) and batch-2 silently leaves the lineage despite W1's
    * "successful" write. So after publishing, a writer verifies its
    * CONTRIBUTION is reachable from the latest manifest — by COVERAGE
    * (root provenance), not dir name, so a dir absorbed into a later
    * compact-* counts as reachable and is never re-published on top of
    * the compaction that already carries its rows (the r14 duplication
    * hazard). If an interleaved publish orphaned it, the writer
    * re-claims a fresh (higher) version and republishes on top of the
    * latest lineage — converging because claims strictly increase.
    * Each intermediate version stays a readable, self-consistent
    * snapshot.
    *
    * KEY-LEVEL conflict resolution: both racers anti-joined against
    * the version published at THEIR claim time, so the latest lineage
    * may hold keys our batch also claims — appending the dir verbatim
    * would duplicate them. Before republishing, the batch's rows are
    * anti-joined against the FOREIGN dirs of the latest lineage (dirs
    * whose provenance the writer's base chain did not cover); if any
    * key was stolen, the surviving rows land in an immutable REWRITE
    * dir `<root>-r<version>` (the original dir stays untouched — its
    * own published version remains a self-consistent snapshot) and the
    * rewrite is what joins the lineage. Keep-existing therefore holds
    * per KEY under concurrency; which racer "existed first" is decided
    * by reconciliation order, not wall clock. */
  /** Published versions in `(baseVersion, latest]` whose dirs the
    * latest manifest's coverage has DROPPED. Coverage is monotone by
    * design (compaction absorbs, rewrites keep roots, erasure repoints
    * every manifest), so a non-empty result means a CROSSED publish: a
    * writer chained its manifest from a base that predates another
    * writer's already-published version — the other side of the TOCTOU
    * this module's reconciles exist for. Both writers can pass a naive
    * "am I latest / am I reachable" check in that interleaving (each
    * was latest for a moment), so every reconcile must ALSO sweep its
    * own window for dropped thirds and carry them forward. */
  private def droppedPublished(spark: SparkSession, path: String,
      baseVersion: Int, latest: Int,
      latestCov: Set[String]): Seq[String] = {
    val fs = fsFor(spark, path)
    // Dirs of every DROPPED VERSION — the full manifest of any window
    // version holding an uncovered dir, not just the uncovered dirs
    // themselves. A dropped version is internally consistent (a merge
    // publishes its rewrites NEXT TO its merge dir); cherry-picking
    // only its uncovered dirs can pair a merge dir with the PRE-merge
    // original from the latest chain, resurrecting deleted keys. The
    // caller collapses the union with [[collapseShadows]].
    ((baseVersion + 1) to latest)
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(
        snapDir(path), s"v$v.list")))
      .map(v => manifestDirs(spark, path, v))
      .filter(_.exists(d =>
        !provenance(spark, path, d).subsetOf(latestCov)))
      .flatten.distinct
  }

  /** Collapse a carry set to one dir per line of truth: an original is
    * SHADOWED by its own rewrite (`<dir>-r/m/e...` — name-prefixed,
    * same root, strictly newer row truth: rewrites only ever yield or
    * erase rows) and an absorbed dir is shadowed by a dir whose
    * provenance strictly contains it (compaction) or by a compact dir
    * with equal provenance (single-batch compaction). Publishing an
    * original NEXT TO its rewrite would resurrect every yielded/erased
    * key — the carry paths must never do it. */
  private[graft] def collapseShadows(spark: SparkSession, path: String,
      dirs: Seq[String]): Seq[String] = {
    val distinct = dirs.distinct
    val prov = distinct.map(d => d -> provenance(spark, path, d)).toMap
    distinct.filterNot { d =>
      distinct.exists { e =>
        e != d && prov(d).subsetOf(prov(e)) && (
          prov(e) != prov(d) ||               // strict superset: absorbed
          e.startsWith(d + "-") ||            // my own rewrite
          (e.startsWith("compact-") && !d.startsWith("compact-")) ||
          // SIBLING rewrites of one FAMILY root (batch-1-r5 vs
          // batch-1-r7, or batch-1-r3 vs batch-1-m5: equal provenance,
          // neither name-prefixes the other — two rewrite lines
          // re-attached by a dropped-manifest carry). The higher
          // claim-version suffix is the newer truth ([[rewriteSeq]] —
          // every rewrite reads the then-current form); keeping both
          // would publish the same keys twice and resurrect rows the
          // newer rewrite yielded or deleted.
          (familyRoot(e) == familyRoot(d) && rewriteSeq(e) > rewriteSeq(d)))
      }
    }
  }

  /** Deterministic key-conflict HEALING among CARRIED dirs — closes
    * the crossed-publish residual the r15 design documented as "needs
    * a commit log": when a reconcile's dropped-version sweep
    * re-attaches dirs from BOTH sides of a crossed publish (each
    * writer exited its own reconcile while momentarily latest, so
    * neither resolved against the other), the re-attached dirs can
    * share keys and no writer owns the conflict. The CARRIER resolves
    * it: among self-rooted dirs in the carry, the LOWER claim number
    * wins its keys — claim numbers are unique and totally ordered, so
    * every carrier picks the same winner without any log — and each
    * later dir rewrites to `<root>-r<version>` minus the stolen keys
    * (originals stay; historical versions still time-travel). Only
    * pairs INVOLVING a re-attached root are checked (one semi-join
    * per involved dir against the union of its earlier peers), so the
    * cost is paid only on the rare dropped-carry path. Skipped when
    * the sink never recorded key columns (pre-keys sinks keep the
    * documented verbatim-carry bound). */
  private def resolveCarriedConflicts(spark: SparkSession, path: String,
      union: Seq[String], reattached: Set[String], excludeRoot: String,
      keys: Seq[String], version: Int): Seq[String] = {
    if (keys.isEmpty || reattached.isEmpty) return union
    // Merge-on-read sinks: carried dirs read through their dv union —
    // a dv-dead key must neither force a yield (lost insert) nor ride
    // into a heal rewrite (resurrected delete; the rewrite FOLDS dvs).
    val dvs = dvUnionFor(spark, path)
    def dvRead(d: String) = antiDv(spark, path,
      spark.read.option("mergeSchema", "true").parquet(s"$path/$d"),
      dvs.getOrElse(d, Nil))
    def selfRooted(d: String) =
      provenance(spark, path, d) == Set(familyRoot(d))
    def rootNum(d: String): Long =
      "(\\d+)$".r.findFirstIn(familyRoot(d)).map(_.toLong)
        .getOrElse(Long.MaxValue)
    val newsRoots = reattached.map(familyRoot)
    val ordered = union
      .filter(d => familyRoot(d) != excludeRoot && selfRooted(d))
      .sortBy(rootNum)
    val current = scala.collection.mutable.LinkedHashMap(
      union.map(d => d -> d): _*)
    for (i <- ordered.indices) {
      val b = ordered(i)
      val earlier = ordered.take(i)
      val involved = newsRoots.contains(familyRoot(b)) ||
        earlier.exists(a => newsRoots.contains(familyRoot(a)))
      if (earlier.nonEmpty && involved) {
        val bCur = current(b)
        val bDf = dvRead(bCur)
        if (keys.forall(bDf.columns.contains)) {
          val eKeys = earlier.map(a => dvRead(current(a)))
            .reduce(_.unionByName(_, allowMissingColumns = true))
            .select(keys.map(col): _*).distinct()
          if (!bDf.join(eKeys, keys, "left_semi").isEmpty) {
            // Suffix the CURRENT form so the prefix rule shadows it,
            // and record provenance EXPLICITLY: a heal of a merge/
            // erasure rewrite (batch-1-m5-r12) would name-derive the
            // wrong root (rootOf only strips the final -r).
            val rw = s"${current(b)}-r$version"
            bDf.join(eKeys, keys, "left_anti")
              .write.mode("overwrite").parquet(s"$path/$rw")
            val out = fsFor(spark, path).create(absorbedPath(path, rw), true)
            try out.write(provenance(spark, path, b).toSeq.sorted
              .mkString("\n").getBytes("UTF-8"))
            finally out.close()
            writeKeyStats(spark, path, rw, keys)
            touchRewriteGen(spark, path, version)
            current(b) = rw
          }
        }
      }
    }
    union.map(current)
  }

  /** Post-publish reconciliation for any SELF-ROOTED dir (a writer's
    * batch dir or a merge's merge dir; compaction has its own variant
    * since a compact dir's provenance never names itself).
    *
    * Loop invariantly: read the latest chain, sweep the window for
    * dropped PUBLISHED versions, and if either our root is off the
    * chain or a dropped version exists, republish the shadow-collapsed
    * union — one dir per line of truth, rewrites over originals
    * ([[collapseShadows]]), so a carried merge/rewrite version never
    * rides next to the pre-rewrite original (that would resurrect
    * yielded/deleted keys). Key conflicts resolve deterministically:
    * rival dirs (roots our base never saw) win, OUR dir yields via a
    * `-r<version>` rewrite; and conflicts BETWEEN re-attached dirs
    * (both crossed writers already exited — the r15 residual bound)
    * heal via [[resolveCarriedConflicts]] by claim order, so the
    * format-lite sink gets a total order without a commit log. The
    * only remaining verbatim-carry case is a sink that never recorded
    * its key columns. */
  private[graft] def reconcileLineage(spark: SparkSession, path: String,
      published: Int, dirName: String, keys: Seq[String],
      baseCoverage: Set[String],
      schema: org.apache.spark.sql.types.StructType,
      baseVersion: Int): Int = {
    var known = baseCoverage + rootOf(dirName)
    var version = published
    var curDir = dirName
    var attempts = 0
    while (attempts < 100) {
      val latest = latestVersion(spark, path)
      val latestDirs = manifestDirs(spark, path, latest)
      val latestCov = coverage(spark, path, latestDirs)
      val dropped = droppedPublished(spark, path, baseVersion, latest,
        latestCov)
      if (latestCov.contains(rootOf(dirName)) && dropped.isEmpty)
        return version
      version = claimVersion(spark, path)
      val union0 = collapseShadows(spark, path,
        latestDirs ++ dropped ++ Seq(curDir))
      // Crossed-publish healing: re-attached dirs from a dropped
      // version may conflict with EACH OTHER (both writers exited) —
      // the carrier resolves those pairs deterministically by claim
      // order before the key resolution for OUR own dir below.
      val union =
        if (dropped.isEmpty) union0
        else resolveCarriedConflicts(spark, path, union0, dropped.toSet,
          familyRoot(dirName), keys, version)
      // Our own root's current form in the union (a rewrite of ours
      // from an earlier heal — or a later MERGE/ERASURE of our batch —
      // survives the collapse over the original). NEWEST rewrite wins
      // ([[rewriteSeq]]): after collapseShadows at most one same-family
      // dir survives, but if the carry re-attached equal-provenance
      // siblings, picking first-in-sequence could resurrect keys the
      // newer rewrite already yielded or deleted. FAMILY root, not
      // rootOf: a merge rewrite batch-N-m5 of our batch IS our current
      // form and must not be treated as a rival nor ridden next to.
      val sameRoot = union.filter(d => familyRoot(d) == familyRoot(dirName))
      val ownDir = if (sameRoot.isEmpty) curDir
                   else sameRoot.maxBy(rewriteSeq)
      val rivals = union.filter(d => familyRoot(d) != familyRoot(dirName) &&
        provenance(spark, path, d).exists(r => !known.contains(r)))
      val nextDir =
        if (rivals.isEmpty) ownDir
        else {
          // Both sides read through their dv unions: a rival's dv-dead
          // key must not steal ours, and a heal rewrite of a dv'd own
          // dir FOLDS the dvs (republishing dead rows under the new
          // name would resurrect them — the rename sheds the entry's
          // dv annotation).
          val dvs = dvUnionFor(spark, path)
          val own = antiDv(spark, path,
            spark.read.schema(schema).parquet(s"$path/$ownDir"),
            dvs.getOrElse(ownDir, Nil))
          val rivalKeys = rivals.map(d => antiDv(spark, path,
              spark.read.schema(schema).parquet(s"$path/$d"),
              dvs.getOrElse(d, Nil)))
            .reduce(_.unionByName(_))
            .select(keys.map(col): _*).distinct()
          val stolen = own.join(rivalKeys, keys, "left_semi").count()
          if (stolen == 0) ownDir
          else {
            val rw = s"${rootOf(dirName)}-r$version"
            own.join(rivalKeys, keys, "left_anti")
              .write.mode("overwrite").parquet(s"$path/$rw")
            writeKeyStats(spark, path, rw, keys)
            // The heal yields keys a reader may already have counted —
            // a content-changing rewrite for delta-purity purposes.
            touchRewriteGen(spark, path, version)
            rw
          }
        }
      // Accumulate resolved provenance: already-resolved rivals must
      // not be re-read and re-anti-joined on the next iteration.
      known = known ++ rivals.flatMap(d => provenance(spark, path, d))
      publishManifest(spark, path, version,
        union.filterNot(d => familyRoot(d) == familyRoot(dirName)) :+ nextDir)
      curDir = nextDir
      attempts += 1
    }
    throw new IllegalStateException(
      s"reconcileLineage: $dirName still unreachable from the latest " +
        s"manifest at $path after 100 republishes — writer storm")
  }

  /** The KEEP-EXISTING anti join, probe-pruned: `deduped`'s rows whose
    * key is absent from the snapshot composed of `baseDirs` — reading
    * ONLY the dirs whose range stats (+ bloom, for collectable probes)
    * can overlap the BATCH's keys. This is the write-path twin of
    * [[readSnapshotForKeys]]: on a compacted 100 TB sink a trickle
    * append anti-joins against the handful of dirs its keys can live
    * in, not the corpus — the batch, not the sink, sets the cost of a
    * write. Sound because a dir that cannot contain any batch key
    * contributes nothing to the anti join's right side; null-keyed
    * batch rows are always fresh on both the pruned and unpruned path
    * (equi-joins are null-rejecting). Publishes the probed subset to
    * [[lastProbedDirs]] for spec/ops audit. */
  private def freshAgainstSnapshotDirs(spark: SparkSession, path: String,
      baseEntries: Seq[SnapEntry], deduped: DataFrame,
      keys: Seq[String]): (DataFrame, Option[Long]) = {
    // NO .distinct(): `deduped` is KEY-UNIQUE by construction (every
    // caller passes dedupOnKey output), so the distinct was a redundant
    // full shuffle of the batch's keys — and it made probeFacts'
    // bounded limit-collect pay that whole shuffle before limiting.
    // Guide §2.4: a distinct on data that is already unique.
    val keyRows = deduped.select(keys.map(col): _*)
    // ONE bounded job (probeFacts) replaces the localCheckpoint +
    // range-aggregate + canon-collect sequence: a trickle batch's
    // ranges and bloom canons both derive from the collected key set
    // on the driver — at 100 TB the publish probe costs one bounded
    // collect of the BATCH's keys, never a pass per stage.
    val (pr, canons, batchKeys) = probeFacts(keyRows, keys)
    val candidates = pruneDirs(spark, path, baseEntries.map(_.dir), keys,
      keyRows, Some(pr), canons)
    lastProbedDirs.set(candidates)
    // mergeSchema union read, PROJECTED to the key columns: the scan
    // still reads only the keys (Catalyst prunes ReadSchema to the
    // select), but the column TYPES are the dirs' own — pinning the
    // probe's schema instead crashes the vectorized reader when a
    // batch arrives with a narrower key type (int batch vs a long
    // sink); the anti join coerces the comparison. A key column absent
    // from EVERY candidate dir can match nothing (null-rejecting
    // join): the whole batch is fresh. The batch's bounding box rides
    // the scan as a PUSHED predicate: row groups outside the batch's
    // key range are skipped by footer stats — the within-dir prune for
    // dirs the sidecar stages must admit.
    if (candidates.isEmpty) (deduped, batchKeys)
    else {
      val cand = baseEntries.filter(e => candidates.contains(e.dir))
      // Projection to the keys BEFORE the anti join (ReadSchema prunes
      // to the key columns); merge-on-read entries anti-join their dvs
      // so a dv-deleted key probes as ABSENT — the re-insert of a
      // logically deleted key must land, not silently drop.
      val scan0 = readEntriesRaw(spark, path, cand, df =>
        if (!keys.forall(df.columns.contains)) df
        else {
          val keyed = df.select(keys.map(col): _*)
          probeRangeFilter(keyed.schema, pr)
            .map(keyed.filter).getOrElse(keyed)
        })
      if (!keys.forall(scan0.columns.contains)) (deduped, batchKeys)
      else (deduped.join(scan0.select(keys.map(col): _*).distinct(),
        keys, "left_anti"), batchKeys)
    }
  }

  /** Publish the batch as snapshot latest+1 (version number claimed via
    * [[claimVersion]] — two writers can never publish the same
    * version): fresh rows (within-batch dedup + probe-PRUNED anti-join
    * against the CURRENT snapshot, [[freshAgainstSnapshotDirs]]) land
    * in an immutable `batch-N` dir; the manifest
    * lists every dir of the new version. Returns the published version.
    * Idempotent in content: a replayed batch publishes a new version
    * whose delta is EMPTY and whose read equals the previous version
    * row-for-row. */
  def writeSnapshot(spark: SparkSession, path: String, batch: DataFrame,
                    keys: Seq[String], tieBreak: Seq[String]): Int = {
    requireLiveKeys(spark, path, keys, "writeSnapshot")
    writeSnapshotFrom(spark, path,
      dedupOnKey(normalizeBatch(spark, path, batch), keys, tieBreak),
      fresh0 = None, basedOn = -1, keys, tieBreak)
  }

  /** Refuse a renamed-away column used as a key — the physical dirs
    * still carry the dead name, but it is no longer the sink's live
    * identity; keying on it would fork silently. */
  private def requireLiveKeys(spark: SparkSession, path: String,
      keys: Seq[String], op: String): Unit = {
    val dead = renamedAwayCols(spark, path)
    require(!keys.exists(dead),
      s"$op: key column(s) ${keys.filter(dead).mkString(",")} were " +
        "renamed away (schema.map) — use the live name")
  }

  /** [[writeSnapshot]] body, with an optional PRECOMPUTED fresh set:
    * the gated path already ran the keep-existing anti join (its
    * profile diff needs the fresh rows), and re-running it inside the
    * publish would charge every gated write the probe twice. `fresh0`
    * is trusted ONLY when the latest version at claim time still is
    * `basedOn` — an interleaved publish invalidates it and the anti
    * join re-runs against the actual base, same as the ungated path. */
  private def writeSnapshotFrom(spark: SparkSession, path: String,
      deduped: DataFrame, fresh0: Option[DataFrame], basedOn: Int,
      keys: Seq[String], tieBreak: Seq[String],
      fresh0Profile: Option[(Long, Map[String, (Long, Array[String])])] =
        None): Int =
      labeled(spark, "graft.publish") {
    val target = claimVersion(spark, path)
    val cur = latestVersion(spark, path)
    val baseEntries = if (cur == 0) Seq.empty[SnapEntry]
                      else manifestEntries(spark, path, cur)
    val baseDirs = baseEntries.map(_.dir)
    // fresh0 accepted (base unchanged): its caller-computed profile
    // sketch and row count are facts of EXACTLY the rows written below
    // — the sidecar profile pass and the bloom's sizing pass both fold
    // away. An interleaved publish invalidates fresh0 and both facts
    // with it.
    val fresh0Ok = fresh0.isDefined && cur != 0 && cur == basedOn
    val (fresh, batchKeys) =
      if (cur == 0) (deduped, None)
      else if (fresh0Ok) (fresh0.get, fresh0Profile.map(_._1))
      else {
        val (f, bk) = freshAgainstSnapshotDirs(spark, path, baseEntries,
          deduped, keys)
        (f, bk)
      }
    val dirName = s"batch-$target"
    writeDirWithStats(spark, path, dirName, fresh, keys,
      keyBound = batchKeys,
      dirProfile = if (fresh0Ok) fresh0Profile else None)
    recordKeyCols(spark, path, keys)
    publishManifest(spark, path, target, baseDirs :+ dirName)
    val rv = reconcileLineage(spark, path, target, dirName, keys,
      coverage(spark, path, baseDirs), fresh.schema, baseVersion = cur)
    // Change record (append kind): the batch dir IS the version's I
    // set, so the record is one small meta file. Written only when the
    // publish landed EXACTLY as base + our dir (no heal, no carry, no
    // interleaver) — otherwise the feed's key-diff stays the truth.
    try {
      if (rv == target && !fresh.columns.exists(ChangeRecCols) &&
          manifestDirs(spark, path, rv).sorted ==
            (baseDirs :+ dirName).sorted)
        writeChangeMeta(fsFor(spark, path), path, rv, "append", cur,
          Some(dirName))
    } catch { case scala.util.control.NonFatal(_) => () }
    rv
  }

  // ── maintained drift-gate profile (PER-DIR sidecars) ────────────
  // writeSnapshotGated needs (per column: rows, nulls, distinct) for
  // the candidate state and the current state. Profiling both from the
  // data is two corpus-wide passes per gated publish; instead the gate
  // MAINTAINS the profile as `<dir>.profile` sidecars — counts add,
  // and distinct is a KMV sketch (the k smallest md5 fingerprints of
  // the distinct values: a set-valued fact of the data, so the union
  // of two sketches re-capped at k IS the sketch of the union — the
  // mergeable partial graft.ops.Cardinality documents). The unit of
  // caching is the DATA DIR, not the version: dirs are immutable, so a
  // dir's profile is truthful forever, the version profile is the
  // exact KMV union of its manifest's dir profiles, and there is NO
  // invalidation problem — a version created by merge/compaction/
  // erasure reuses the carried dirs' sidecars and only its REWRITTEN
  // dirs (batch-sized by the copy-on-write discipline) ever need a
  // profile pass, run by the same writeKeyStats hook that stamps range
  // stats. (The r17 design keyed profiles by VERSION: one merge or
  // erasure orphaned the cache and the next gated publish re-profiled
  // the corpus.) Sinks opt in via the `gate.on` marker (first gated
  // write creates it); un-gated sinks pay nothing. Timestamps/dates
  // fingerprint via epoch micros/days (session-timezone-independent,
  // like the bloom canon).

  private[graft] val ProfileK = 256
  /** 16^15 = 2^60 as an exact double — maps a 15-hex-digit fingerprint
    * prefix onto the unit interval without precision loss (the same
    * estimator constant as [[Cardinality]]). */
  private val ProfileHexNorm = math.pow(16.0, 15.0)

  // Qualified-private, not `private`: the encoder's generated code
  // instantiates this class reflectively, and a Scala-private nested
  // case class compiles to a private constructor codegen cannot call.
  private[ops] case class ColSketch(idx: Int, rows: Long, nulls: Long,
      fps: Array[String])

  private def fpHex(bytes: Array[Byte]): String = {
    val hex = "0123456789abcdef"
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hex((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private def capSet(buf: java.util.TreeSet[String], k: Int): Array[String] = {
    while (buf.size > k) buf.pollLast()
    val out = new Array[String](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** ONE distributed pass over `df`: per column — row count, null
    * count, and the KMV partial (k smallest md5 fingerprints of the
    * distinct non-null values). Partitions keep capped sorted buffers
    * (the map-side combine), the per-column merge is distributed, and
    * only #columns merged sketches reach the driver. */
  private def profileSketch(df: DataFrame, k: Int = ProfileK)
      : (Long, Map[String, (Long, Array[String])]) = {
    import org.apache.spark.sql.types.{DateType, TimestampType}
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "profileSketch: no columns")
    val proj = df.select(cols.map { c =>
      df.schema(c).dataType match {
        case TimestampType => unix_micros(col(c)).cast("string").as(c)
        case DateType => unix_date(col(c)).cast("string").as(c)
        case _ => col(c).cast("string").as(c)
      }
    }: _*)
    val n = cols.size
    val partials = proj.mapPartitions { it =>
      val rows = new Array[Long](n); val nulls = new Array[Long](n)
      val bufs = Array.fill(n)(new java.util.TreeSet[String]())
      val md = java.security.MessageDigest.getInstance("MD5")
      it.foreach { r =>
        var i = 0
        while (i < n) {
          rows(i) += 1
          if (r.isNullAt(i)) nulls(i) += 1
          else {
            val fp = fpHex(md.digest(r.getString(i).getBytes("UTF-8")))
            val buf = bufs(i)
            if (buf.size < k) { buf.add(fp); () }
            else if (fp < buf.last && buf.add(fp)) { buf.pollLast(); () }
          }
          i += 1
        }
      }
      (0 until n).iterator.map(i =>
        ColSketch(i, rows(i), nulls(i), capSet(bufs(i), k)))
    }
    val merged = partials.groupByKey(_.idx)
      .reduceGroups { (a: ColSketch, b: ColSketch) =>
        val buf = new java.util.TreeSet[String]()
        a.fps.foreach(buf.add); b.fps.foreach(buf.add)
        ColSketch(a.idx, a.rows + b.rows, a.nulls + b.nulls, capSet(buf, k))
      }.map(_._2).collect()
    val byIdx = merged.map(cs => cs.idx -> cs).toMap
    val rowsTotal = byIdx.values.headOption.map(_.rows).getOrElse(0L)
    (rowsTotal, cols.zipWithIndex.map { case (c, i) =>
      val cs = byIdx.getOrElse(i, ColSketch(i, 0L, 0L, Array.empty[String]))
      c -> ((cs.nulls, cs.fps))
    }.toMap)
  }

  /** KMV estimate from a sketch: exact when fewer than k fingerprints
    * exist (the sketch IS the distinct set), else (k-1)/R_k —
    * [[Cardinality]]'s estimator, rounded to a count. */
  private def kmvDistinct(fps: Array[String], k: Int = ProfileK): Long =
    if (fps.length < k) fps.length.toLong
    else {
      val kth = java.lang.Long.parseLong(fps(fps.length - 1).substring(0, 15), 16)
      math.round((k - 1).toDouble * ProfileHexNorm / kth.toDouble)
    }

  /** Profile union: counts add; a column missing on one side was
    * all-NULL there (unionByName allowMissingColumns semantics);
    * sketches union-then-recap. */
  private def mergeProfileStats(prevRows: Long,
      prev: Map[String, (Long, Array[String])], freshRows: Long,
      fresh: Map[String, (Long, Array[String])], k: Int = ProfileK)
      : (Long, Map[String, (Long, Array[String])]) = {
    val cols = prev.keySet ++ fresh.keySet
    (prevRows + freshRows, cols.iterator.map { c =>
      val (pn, pf) = prev.getOrElse(c, (prevRows, Array.empty[String]))
      val (fn, ff) = fresh.getOrElse(c, (freshRows, Array.empty[String]))
      val buf = new java.util.TreeSet[String]()
      pf.foreach(buf.add); ff.foreach(buf.add)
      c -> ((pn + fn, capSet(buf, k)))
    }.toMap)
  }

  /** A maintained profile as the 4-column frame [[Validate.profileDrift]]
    * reads (column, n_rows, n_nulls, n_distinct) — distinct from the
    * sketch, exact below k. */
  private def profileStatsToDF(spark: SparkSession, rows: Long,
      m: Map[String, (Long, Array[String])]): DataFrame = {
    import spark.implicits._
    m.toSeq.sortBy(_._1)
      .map { case (c, (nulls, fps)) => (c, rows, nulls, kmvDistinct(fps)) }
      .toDF("column", "n_rows", "n_nulls", "n_distinct")
  }

  // Legacy r17 VERSION-keyed profiles (`v<N>.profile`) are only swept
  // by expiry/erasure hygiene now; nothing writes or reads them.

  private def dirProfilePath(path: String, dirName: String) =
    new org.apache.hadoop.fs.Path(snapDir(path), s"$dirName.profile")

  /** Opt-in marker for per-dir profiling: created by the first
    * [[writeSnapshotGated]] call; from then on every dir write in this
    * sink stamps a `.profile` sidecar alongside its range stats, so
    * the gate never re-reads published data. */
  private def gateMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(snapDir(path), "gate.on")

  /** Sidecar format: `#rows<TAB>n` then one line per column —
    * `urlenc(col) TAB nulls TAB fp,fp,…`. Best-effort write: a missing
    * sidecar only costs the next gated publish a profile pass over
    * that dir. */
  private def writeProfileFile(fs: org.apache.hadoop.fs.FileSystem,
      target: org.apache.hadoop.fs.Path, rows: Long,
      m: Map[String, (Long, Array[String])]): Unit =
    try {
      val lines = s"#rows\t$rows" +: m.toSeq.sortBy(_._1).map {
        case (c, (nulls, fps)) =>
          s"${java.net.URLEncoder.encode(c, "UTF-8")}\t$nulls\t${fps.mkString(",")}"
      }
      val out = fs.create(target, true)
      try out.write(lines.mkString("\n").getBytes("UTF-8"))
      finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  private def readProfileFile(fs: org.apache.hadoop.fs.FileSystem,
      target: org.apache.hadoop.fs.Path)
      : Option[(Long, Map[String, (Long, Array[String])])] =
    try {
      val in = fs.open(target)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList finally in.close()
      val rows = lines.head.split("\t")(1).toLong
      Some((rows, lines.tail.map { l =>
        val parts = l.split("\t", -1)
        val fps = if (parts(2).isEmpty) Array.empty[String]
                  else parts(2).split(",")
        java.net.URLDecoder.decode(parts(0), "UTF-8") ->
          ((parts(1).toLong, fps))
      }.toMap))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Test/ops audit of the last [[writeSnapshotGated]] gate evaluation:
    * `"maintained"` (every manifest dir had a profile sidecar — zero
    * re-reads of published data), `"recomputed"` (some dirs lacked
    * sidecars — pre-gate dirs on first opt-in, or a sidecar write that
    * failed — and were profiled on demand, persisting the result so
    * the cost never repeats) or `"bootstrap"` (empty sink, published
    * ungated). */
  private[graft] val lastGateMode =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  /** [[writeSnapshot]] behind a PROFILE-DRIFT GATE: the candidate new
    * state (current version ∪ the batch's fresh rows) is profiled
    * against the current version, and any [[Validate.driftViolations]]
    * breach REFUSES the publish with a typed
    * [[graft.ops.DriftRefusedException]] — nothing is claimed or
    * written, the message lists the breached rules. The freshness/
    * volume contract run where it belongs: before the version exists,
    * so consumers never see (and never have to roll back) a drifted
    * publish.
    *
    * Cost scales with the BATCH, not the corpus: the current state's
    * profile is the exact KMV UNION of the manifest dirs' `.profile`
    * sidecars (dirs are immutable, so a dir's sidecar is truthful
    * forever — versions created by merge/compaction/erasure reuse the
    * carried dirs' sidecars, their rewrites having been stamped by the
    * same writeKeyStats hook that writes range stats); the candidate
    * adds the fresh rows' one-pass sketch, and the probe-pruned anti
    * join supplies those fresh rows at batch cost too. Only dirs
    * predating the sink's gate opt-in (or whose best-effort sidecar
    * write failed) are profiled on demand — and persisted, so that
    * cost never repeats. Bootstrap writes (no current version) publish
    * ungated: there is nothing to drift from. */
  def writeSnapshotGated(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String], tieBreak: Seq[String],
      maxNullRateJump: Double, maxRowGrowthPct: Double,
      minRowGrowthPct: Double = 0.0,
      allowAddedColumns: Boolean = true,
      allowDroppedColumns: Boolean = false): Int =
      labeled(spark, "graft.gate") {
    val fs = fsFor(spark, path)
    fs.mkdirs(snapDir(path))
    // Opt the sink into per-dir profiling BEFORE any write: this
    // call's own batch dir (and every later rewrite) gets its sidecar
    // stamped at write time.
    try { if (!fs.exists(gateMarkerPath(path)))
      fs.create(gateMarkerPath(path), true).close()
    } catch { case scala.util.control.NonFatal(_) => () }
    requireLiveKeys(spark, path, keys, "writeSnapshotGated")
    val cur = latestVersion(spark, path)
    val deduped = dedupOnKey(normalizeBatch(spark, path, batch),
      keys, tieBreak)
    var freshForWrite: Option[DataFrame] = None
    var freshProfile: Option[(Long, Map[String, (Long, Array[String])])] =
      None
    if (cur >= 1) {
      val baseEntries = manifestEntries(spark, path, cur)
      val baseDirs = baseEntries.map(_.dir)
      // Checkpointed: the profile sketch below and the publish (which
      // reuses this fresh set via writeSnapshotFrom — no second anti
      // join) both read the materialized batch-sized result.
      val fresh = freshAgainstSnapshotDirs(spark, path, baseEntries,
        deduped, keys)._1.localCheckpoint()
      freshForWrite = Some(fresh)
      var missing = List.empty[String]
      val perDir = baseDirs.map { d =>
        readProfileFile(fs, dirProfilePath(path, d)).getOrElse {
          missing ::= d
          val p = profileSketch(spark.read.parquet(s"$path/$d"))
          writeProfileFile(fs, dirProfilePath(path, d), p._1, p._2)
          p
        }
      }
      lastGateMode.set(if (missing.isEmpty) "maintained" else "recomputed")
      val (prevRows, prevM) = perDir
        .reduceOption((a, b) => mergeProfileStats(a._1, a._2, b._1, b._2))
        .getOrElse((0L, Map.empty[String, (Long, Array[String])]))
      val (fRows, fM) = labeled(spark, "graft.gate profile")(
        profileSketch(fresh))
      freshProfile = Some((fRows, fM))
      val cand = mergeProfileStats(prevRows, prevM, fRows, fM)
      val bad = Validate.driftViolations(
        Validate.profileDrift(profileStatsToDF(spark, cand._1, cand._2),
          profileStatsToDF(spark, prevRows, prevM)),
        maxNullRateJump, maxRowGrowthPct, minRowGrowthPct,
        allowAddedColumns, allowDroppedColumns)
        .select(col("violation"), col("column")).collect()
      if (bad.nonEmpty) throw new DriftRefusedException(
        "writeSnapshotGated: drift gate refused the publish: " +
          bad.map(r => s"${r.getString(0)}(${r.getString(1)})")
            .mkString(", "))
    } else lastGateMode.set("bootstrap")
    // No version-level persist: the batch dir's own profile sidecar is
    // stamped inside the publish path (writeKeyStats sees the gate
    // marker), and carried dirs already have theirs — there is nothing
    // that can go stale when an interleaved writer or reconcile
    // rewrite changes the published manifest.
    writeSnapshotFrom(spark, path, deduped,
      freshForWrite, basedOn = cur, keys, tieBreak,
      fresh0Profile = freshProfile)
  }

  /** Name-based publish: each carried dir REATTACHES the union of its
    * published dv sets ([[dvUnionFor]] — one exists-call on dv-less
    * sinks), so reconcile/carry paths that reason in dir names never
    * drop a merge-on-read delete; dirs new to every manifest (fresh
    * batches, rewrites — which FOLD their base's dvs physically) get
    * none. Publishers attaching a BRAND-NEW dv use the entries form. */
  private def publishManifest(spark: SparkSession, path: String,
                              version: Int, dirs: Seq[String]): Unit = {
    val dvs = dvUnionFor(spark, path)
    publishManifestEntries(spark, path, version,
      dirs.map(d => SnapEntry(d, dvs.getOrElse(d, Nil))))
  }

  private def publishManifestEntries(spark: SparkSession, path: String,
      version: Int, entries: Seq[SnapEntry]): Unit = {
    val fs = fsFor(spark, path)
    fs.mkdirs(snapDir(path))
    val tmp = new org.apache.hadoop.fs.Path(snapDir(path),
      s"v$version.list.tmp")
    val out = fs.create(tmp, true)
    try out.write(entries.map(_.line).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // rename is the atomic-publish step; a false return (destination
    // exists, permission lost, or an object store whose "rename" is a
    // non-atomic copy that failed) would otherwise let writeSnapshot
    // report a version whose manifest never appeared — readers of that
    // version would then fail despite a "successful" write. Throw
    // instead: the tmp file and batch dir are orphans the next
    // successful publish ignores. (On object stores without atomic
    // rename — S3 — front this sink with an HDFS/consistent-rename
    // layer or swap publishManifest for a conditional PUT.)
    val ok = fs.rename(tmp,
      new org.apache.hadoop.fs.Path(snapDir(path), s"v$version.list"))
    if (!ok) throw new java.io.IOException(
      s"publishManifest: atomic rename to v$version.list failed at $path — " +
        "snapshot NOT published (manifest tmp left for inspection)")
    // Publish timestamp sidecar for AS-OF time travel. Best-effort and
    // written AFTER the rename: a crash in between leaves a published
    // version without a .meta, which [[publishedAtMs]] answers with the
    // manifest file's modification time (close enough for a resolver
    // whose contract is "latest version published at or before ts").
    // The sidecar — not mtime — is the primary source because in-place
    // manifest repoints (eraseKeys) refresh mtime but preserve .meta.
    try {
      val mf = fs.create(new org.apache.hadoop.fs.Path(snapDir(path),
        s"v$version.meta"), true)
      try mf.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
      finally mf.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    // The claim marker has served its purpose once the manifest exists;
    // best-effort cleanup (an orphaned marker is harmless — claimVersion
    // skips past it).
    fs.delete(new org.apache.hadoop.fs.Path(snapDir(path),
      s"v$version.claim"), false)
  }

  /** Wall-clock publish time (epoch millis) of snapshot `version`: the
    * `v<N>.meta` sidecar stamped at publish, or the manifest file's
    * modification time for pre-.meta sinks. */
  def publishedAtMs(spark: SparkSession, path: String, version: Int): Long = {
    val fs = fsFor(spark, path)
    val meta = new org.apache.hadoop.fs.Path(snapDir(path), s"v$version.meta")
    if (fs.exists(meta)) {
      val in = fs.open(meta)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    } else {
      val list = new org.apache.hadoop.fs.Path(snapDir(path), s"v$version.list")
      require(fs.exists(list), s"no snapshot v$version at $path")
      fs.getFileStatus(list).getModificationTime
    }
  }

  /** The snapshot version a reader at wall-clock `tsMs` would have seen
    * as latest: the HIGHEST version whose publish time is ≤ tsMs.
    * Highest-version (not latest-timestamp) because reconciliation can
    * publish versions out of wall-clock order during writer races — the
    * read contract is always "the max published version", so the as-of
    * answer is the max version that existed then. Throws when nothing
    * was published by `tsMs`. */
  def versionAsOf(spark: SparkSession, path: String, tsMs: Long): Int = {
    val fs = fsFor(spark, path)
    require(fs.exists(snapDir(path)), s"no snapshot sink at $path")
    val versions = fs.listStatus(snapDir(path)).toSeq.map(_.getPath.getName)
      .flatMap(numberedName(_, "v", ".list"))
    val at = versions.filter(v => publishedAtMs(spark, path, v) <= tsMs)
    require(at.nonEmpty,
      s"no snapshot published at or before epoch-ms $tsMs at $path")
    at.max
  }

  /** Time travel by TIMESTAMP: the sink exactly as a reader at epoch-ms
    * `tsMs` saw it — `readSnapshot` of [[versionAsOf]]. */
  def readSnapshotAsOf(spark: SparkSession, path: String,
                       tsMs: Long): DataFrame =
    readSnapshot(spark, path, versionAsOf(spark, path, tsMs))

  /** POINT READ: the rows of snapshot `version` whose keys appear in
    * `probe` — opening ONLY the dirs whose key-range stats can overlap
    * the probed keys. The read path twin of the merge/erase probe
    * pruning: a handful-of-keys lookup against a compacted 100 TB sink
    * opens the few dirs those keys can live in, not the corpus. Dirs
    * without stats are read (correctness never depends on a sidecar). */
  def readSnapshotForKeys(spark: SparkSession, path: String, version: Int,
      probe: DataFrame, keys: Seq[String]): DataFrame = {
    val entries = manifestEntries(spark, path, version)
    // LAZY checkpoint: probeFacts' first action materializes the
    // blocks in its own job — no standalone materialization pass —
    // and every later consumer (the semi join) reads the blocks.
    val keyRows = probe.select(keys.map(col): _*).distinct()
      .localCheckpoint(false)
    // probeFacts: ranges + bloom canons from ONE bounded collect over
    // the checkpointed keys (replacing the range aggregate + the bloom
    // stage's canon collect).
    val (pr, canons, probeCnt) = probeFacts(keyRows, keys)
    val candidates = pruneDirs(spark, path, entries.map(_.dir), keys,
      keyRows, Some(pr), canons)
    lastProbedDirs.set(candidates)
    if (candidates.isEmpty)
      readSnapshot(spark, path, version).limit(0)
    else {
      // The probe's bounding box pushes to each group's scan: inside a
      // big key-sorted compact dir, footer stats skip the row groups
      // the probed keys can't live in (the semi join stays for
      // exactness); merge-on-read entries anti-join their dvs so a
      // dv-dead key reads as absent.
      val scan = readEntriesRaw(spark, path,
        entries.filter(e => candidates.contains(e.dir)),
        df => probeRangeFilter(df.schema, pr)
          .map(df.filter).getOrElse(df))
      applySchemaMap(spark, path, scan.join(
        maybeBroadcastKeys(keyRows, probeCnt.getOrElse(0L)),
        keys, "left_semi"))
    }
  }

  /** Compact the current version's batch-dir chain into ONE dir and
    * publish it as version latest+1 (content-identical read). Older
    * manifests keep referencing the original immutable dirs, so every
    * historical version still time-travels — nothing is deleted here
    * (retention is a separate, explicitly destructive decision a
    * deployment makes against its own version horizon).
    *
    * Concurrency: compaction is SERIALIZED by an exclusive
    * `_snapshots/compact.lock` — two concurrent compactors basing on
    * the same version would otherwise each publish a full base rewrite
    * and the later one's carry would double-read the earlier's rows.
    * (A crashed compactor leaves the lock; the error message names it
    * — remove it after confirming no compactor is live. Writers are
    * never blocked by the lock.) Compaction racing WRITERS stays
    * optimistic: interleaved batch dirs are carried next to the
    * compact dir, diffed by PROVENANCE so a dir whose rows the
    * compacted base already covers (the base dirs themselves, or a
    * rewrite of an absorbed batch) is never double-included. */
  /** Test hook: runs between the (lock-free) base rewrite and the lock
    * acquisition, so specs can inject a racing rewriter into exactly
    * the window the staleness re-validation exists for. */
  private[graft] var compactPreLockHook: () => Unit = () => ()

  def compactSnapshots(spark: SparkSession, path: String): Int =
    compactSnapshotsWith(spark, path,
      df => keySortedForFooters(df, recordedKeyCols(spark, path)))

  /** [[compactSnapshots]] with a Z-ORDER layout: the compact dir is
    * range-partitioned and sorted by the Morton interleave of `zCols`
    * ([[graft.ext.Export.zorderKey]] — `bits` low bits per column,
    * `bits * zCols.size <= 62`), instead of lexicographic key order.
    * The key sort gives perfect footer ranges on the FIRST key column
    * and nothing on the second — a probe bounded only on column 2 of
    * a big compact dir reads every row group. The Morton order gives
    * every listed column PARTIAL locality: each output file covers a
    * hypercube of the value space, so its footer min/max is tight on
    * EVERY z column and a bound on any of them skips files/row groups.
    * That is the multi-dimensional skipping trade: slightly looser on
    * column 1, usable on all of them. Integral columns only (the
    * Morton key interleaves low bits of a long cast; declare the
    * columns with [[declareSkipCols]] so bounded reads also prune at
    * dir level). Content-identical, same optimistic protocol. */
  def compactSnapshotsZOrdered(spark: SparkSession, path: String,
      zCols: Seq[String], bits: Int = 12, shards: Int = 0): Int =
    compactSnapshotsWith(spark, path,
      zOrderLayout(_, zCols, bits, shards, "compactSnapshotsZOrdered"))

  /** The shared Morton layout body behind [[compactSnapshotsZOrdered]]
    * and [[compactSmallDirs]]' z option. */
  private def zOrderLayout(df: DataFrame, zCols: Seq[String], bits: Int,
      shards: Int, opName: String): DataFrame = {
    require(zCols.nonEmpty && zCols.forall(df.columns.contains),
      s"$opName: z columns ${zCols.mkString(",")} " +
        s"must exist in the snapshot (${df.columns.mkString(",")})")
    require(!df.columns.contains("__z"),
      s"$opName: the sink has a data column named " +
        "'__z' (the reserved scratch column) — the layout would " +
        "silently destroy it; rename the column first")
    val z = df.withColumn("__z",
      graft.ext.Export.zorderKey(zCols.map(col), bits))
    // Explicit shard count pins the file layout (each output file =
    // one z-range = one hypercube); the default lets AQE size the
    // shuffle, which on small inputs coalesces to one file — fine
    // for data, useless for file-level skipping.
    (if (shards > 0) z.repartitionByRange(shards, col("__z"))
     else z.repartitionByRange(col("__z")))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  private def compactSnapshotsWith(spark: SparkSession, path: String,
      layout: DataFrame => DataFrame): Int =
      labeled(spark, "graft.compact") {
    val fs = fsFor(spark, path)
    fs.mkdirs(snapDir(path))
    // The critical section covers ONLY claim-diff + publish + carry
    // reconcile — metadata ops. The base rewrite (the hours-long part
    // at 100 TB) runs LOCK-FREE and is re-validated after acquisition:
    // holding the lock across the rewrite would serialize every merge,
    // erasure, and streaming CDC batch behind the slowest operation in
    // the sink (the r15 liveness hole). Staleness check: dirs are
    // immutable and every rewriter REPLACES the dirs it touches in the
    // latest manifest, so "all base dirs still listed" ⟺ "the content
    // we compacted is still the live content". Plain appends only ADD
    // dirs and are carried. On a stale base the orphaned rewrite is
    // deleted and the compaction retried from the new latest.
    var attempts = 0
    while (attempts < 5) {
      // Advisory fail-fast (not the protection — the post-lock
      // staleness check is): a rewriter holding the lock RIGHT NOW is
      // about to invalidate whatever base we'd compact, so don't burn a
      // full rewrite on it. Racy by nature; a collision that slips
      // through just costs one stale-retry.
      val advisory = new org.apache.hadoop.fs.Path(snapDir(path),
        "compact.lock")
      if (fs.exists(advisory)) throw new LockHeldException(
        s"compactSnapshots: another rewriter holds $advisory — if its " +
          "process crashed, delete the lock file and retry", null)
      val cur = latestVersion(spark, path)
      require(cur >= 1, "nothing to compact: no published snapshot")
      // Same claim discipline as writeSnapshot: a compactor racing a
      // writer must not reuse the writer's version number. The claim
      // also makes the dir name unique across racing compactors even
      // before either holds the lock.
      val target = claimVersion(spark, path)
      val dirName = s"compact-$target"
      val baseEntries = manifestEntries(spark, path, cur)
      val baseDirs = baseEntries.map(_.dir)
      val absorbed = coverage(spark, path, baseDirs)
      val statKeys = recordedKeyCols(spark, path)
      // readSnapshot resolves merge-on-read dvs, so the compact dir is
      // the FOLDED truth — compaction is what resets dv'd entries back
      // to plain dirs (the MoR steady-state loop).
      if (statKeys.nonEmpty)
        writeDirWithStats(spark, path, dirName,
          layout(readSnapshot(spark, path, cur)), statKeys)
      else
        layout(readSnapshot(spark, path, cur))
          .write.mode("overwrite").parquet(s"$path/$dirName")
      // Record provenance BEFORE the manifest publish: a manifest
      // referencing a compact dir must never be readable without the
      // dir's absorbed set (reconciliation reasons over it).
      val af = absorbedPath(path, dirName)
      val out = fs.create(af, true)
      try out.write(absorbed.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      compactPreLockHook()
      val lock = try acquireRewriterLock(fs, path, "compactSnapshots")
        catch { case e: LockHeldException =>
          fs.delete(new org.apache.hadoop.fs.Path(path, dirName), true)
          deleteDirSidecars(fs, path, dirName)
          throw e
        }
      try {
        val latestNow = latestVersion(spark, path)
        val latestEntries = manifestEntries(spark, path, latestNow)
        val latestDirs = latestEntries.map(_.dir)
        // Entry-level: a dv added to a base dir is a content change.
        if (baseEntries.forall(latestEntries.contains)) {
          // A writer may publish BETWEEN the base read (cur) and this
          // publish; its dirs are not in the compacted file, and a bare
          // [compact-N] manifest would drop them from the lineage.
          // Carry the latest dirs whose provenance the base does NOT
          // cover (the rows are rewritten-base + the interleaved
          // appends — exactly what a sequential compact-then-write
          // would read). The writers' own reconcileLineage covers the
          // inverse order (writer publishes after this publish).
          val interleaved = latestDirs
            .filterNot(d => provenance(spark, path, d).subsetOf(absorbed))
          interleaved.foreach { d =>
            val p = provenance(spark, path, d)
            if (p.exists(absorbed)) throw new IllegalStateException(
              s"compactSnapshots: interleaved dir $d partially overlaps " +
                s"the compacted base (${p.filter(absorbed)}) — concurrent " +
                "compaction artifacts; resolve manually")
          }
          // Publish strictly above whatever is latest: re-claim when a
          // writer published past our pre-rewrite claim (readers take
          // the max version as "current"; publishing below it would
          // park the compact dir in dead history).
          val pubV = if (latestNow >= target) claimVersion(spark, path)
                     else target
          publishManifest(spark, path, pubV, dirName +: interleaved)
          val rv = reconcileCompact(spark, path, pubV, dirName, absorbed,
            baseVersion = cur)
          // Change record (none kind): this version's content equals
          // latestNow's — but only when every latest dir was cleanly
          // classified base-or-interleaved and the reconcile did not
          // republish; a covered-but-not-base carry would make "no
          // change vs latestNow" a lie, so it skips instead.
          if (rv == pubV && latestDirs.forall(d =>
              baseDirs.contains(d) || interleaved.contains(d)))
            writeChangeMeta(fs, path, rv, "none", latestNow, None)
          return rv
        }
      } finally fs.delete(lock, false)
      // Stale base: a rewriter (merge/erasure/another compactor)
      // replaced part of what we compacted. Drop the orphan and retry.
      fs.delete(new org.apache.hadoop.fs.Path(path, dirName), true)
      deleteDirSidecars(fs, path, dirName)
      attempts += 1
    }
    throw new IllegalStateException(
      s"compactSnapshots: base rewritten under us 5 times at $path — " +
        "rewriter storm; retry when merges/erasures quiesce")
  }

  /** PARTIAL compaction — the bin-pack "OPTIMIZE" a 100 TB sink runs
    * ROUTINELY where [[compactSnapshots]] is the rare full rewrite:
    * repackage into one dir ONLY the current version's dirs smaller
    * than `smallBytes`, carrying every large dir by reference. A day
    * of trickle CDC batches packs into one dir while the multi-TB
    * compacted base is never touched — maintenance cost proportional
    * to the NEW data, not the corpus (a full compaction's rewrite is
    * itself the most expensive op in the sink; running it daily is the
    * anti-pattern this exists to avoid).
    *
    * Same discipline as [[compactSnapshots]]: the pack rewrite runs
    * LOCK-FREE into a claim-named `compact-<v>` dir with an
    * `.absorbed` record (= the packed dirs' coverage, so provenance
    * reasoning, [[collapseShadows]] and [[refreshAggregate]]'s
    * purity classification all compose — a pack of already-counted
    * dirs reads as a counted carrier, a pack of fresh appends as
    * fresh); staleness is re-validated under the lock (a rewriter
    * replacing a PACKED dir forces a redo; rewrites of carried-large
    * dirs are fine — they are carried from the LATEST manifest);
    * reconcileCompact sweeps crossed publishes. Content-preserving:
    * never bumps the rewrite generation. Returns the published
    * version, or the current one when fewer than `minDirs` dirs
    * qualify (nothing to pack).
    *
    * `zOrderBy` nonEmpty lays the pack out in Morton order over those
    * columns (same trade as [[compactSnapshotsZOrdered]], `zBits` low
    * bits each, `zShards` pinned output files) instead of the
    * lexicographic key sort — multi-column probes over the packed
    * trickle dirs then skip on EVERY z column, not just the first
    * key. */
  def compactSmallDirs(spark: SparkSession, path: String,
      smallBytes: Long = 128L << 20, minDirs: Int = 2,
      zOrderBy: Seq[String] = Nil, zBits: Int = 12,
      zShards: Int = 0): Int = {
    // Deliberately mirrors compactSnapshots' claim/rewrite/validate/
    // publish skeleton rather than sharing one parameterized loop: the
    // two differ in load-bearing edges (what staleness re-validates —
    // packed dirs only vs the whole base; carry = name-exclusion here
    // vs coverage-exclusion there; a coverage overlap is a THROW here
    // and a silent drop there), and hiding those behind predicates
    // traded visible duplication for invisible divergence risk.
    require(minDirs >= 2, "packing fewer than 2 dirs is a rename")
    val fs = fsFor(spark, path)
    fs.mkdirs(snapDir(path))
    var attempts = 0
    while (attempts < 5) {
      val advisory = new org.apache.hadoop.fs.Path(snapDir(path),
        "compact.lock")
      if (fs.exists(advisory)) throw new LockHeldException(
        s"compactSmallDirs: another rewriter holds $advisory — if its " +
          "process crashed, delete the lock file and retry", null)
      val cur = latestVersion(spark, path)
      require(cur >= 1, "nothing to compact: no published snapshot")
      val baseEntries = manifestEntries(spark, path, cur)
      val smallEntries = baseEntries.filter { e =>
        fs.getContentSummary(new org.apache.hadoop.fs.Path(path, e.dir))
          .getLength <= smallBytes
      }
      val smalls = smallEntries.map(_.dir)
      if (smalls.size < minDirs) return cur
      val absorbed = coverage(spark, path, smalls)
      val target = claimVersion(spark, path)
      val dirName = s"compact-$target"
      val statKeys = recordedKeyCols(spark, path)
      // Same key-sorted discipline as the full compaction: the pack is
      // small (that's its definition), so the sort is cheap — and the
      // pack dir's footers stay probe-skippable instead of smearing
      // the trickle batches' keys across every row group. Merge-on-read
      // entries RESOLVE (dvs anti-joined) — the pack folds them.
      // `zOrderBy` swaps the sort for the Morton layout.
      val packed = readEntriesRaw(spark, path, smallEntries)
      val laidOut =
        if (zOrderBy.nonEmpty)
          zOrderLayout(packed, zOrderBy, zBits, zShards, "compactSmallDirs")
        else keySortedForFooters(packed, statKeys)
      if (statKeys.nonEmpty)
        writeDirWithStats(spark, path, dirName, laidOut, statKeys)
      else laidOut.write.mode("overwrite").parquet(s"$path/$dirName")
      val af = absorbedPath(path, dirName)
      val out = fs.create(af, true)
      try out.write(absorbed.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      compactPreLockHook()
      val lock = try acquireRewriterLock(fs, path, "compactSmallDirs")
        catch { case e: LockHeldException =>
          fs.delete(new org.apache.hadoop.fs.Path(path, dirName), true)
          deleteDirSidecars(fs, path, dirName)
          throw e
        }
      try {
        val latestNow = latestVersion(spark, path)
        val latestEntries = manifestEntries(spark, path, latestNow)
        val latestDirs = latestEntries.map(_.dir)
        // Entry-level: a dv added to a PACKED dir in the window means
        // the pack carries rows the rival just deleted — redo.
        if (smallEntries.forall(latestEntries.contains)) {
          // Carry everything else from the LATEST manifest (large base
          // dirs, interleaved appends, even rewrites of large dirs a
          // merge landed meanwhile — only the PACKED dirs' liveness
          // matters to this publish).
          val carry = latestDirs.filterNot(smalls.contains)
          carry.foreach { d =>
            val p = provenance(spark, path, d)
            if (p.exists(absorbed)) throw new IllegalStateException(
              s"compactSmallDirs: carried dir $d partially overlaps the " +
                s"packed set (${p.filter(absorbed)}) — concurrent " +
                "compaction artifacts; resolve manually")
          }
          val pubV = if (latestNow >= target) claimVersion(spark, path)
                     else target
          publishManifest(spark, path, pubV, dirName +: carry)
          val rv = reconcileCompact(spark, path, pubV, dirName, absorbed,
            baseVersion = cur)
          // Change record (none kind): pack(smalls) + carry is exactly
          // latestNow's content by construction.
          if (rv == pubV)
            writeChangeMeta(fs, path, rv, "none", latestNow, None)
          return rv
        }
      } finally fs.delete(lock, false)
      fs.delete(new org.apache.hadoop.fs.Path(path, dirName), true)
      deleteDirSidecars(fs, path, dirName)
      attempts += 1
    }
    throw new IllegalStateException(
      s"compactSmallDirs: packed dirs kept being rewritten under us 5 " +
        s"times at $path — rewriter storm; retry when merges quiesce")
  }

  /** Compactor's post-publish reconciliation: if an interleaved writer
    * (who chained off a pre-compaction manifest) published a lineage
    * without the compact dir, republish `compact dir + the latest
    * dirs its base does not cover`. No key-level step — the compact
    * dir's rows ARE the base lineage, so covered dirs are whole-row
    * duplicates to exclude, never key conflicts to resolve. */
  private def reconcileCompact(spark: SparkSession, path: String,
      published: Int, dirName: String, absorbed: Set[String],
      baseVersion: Int): Int = {
    var version = published
    var attempts = 0
    while (attempts < 100) {
      val latest = latestVersion(spark, path)
      val latestDirs = manifestDirs(spark, path, latest)
      val latestCov = coverage(spark, path, latestDirs)
      // Crossed-publish sweep: an appender that published between this
      // compactor's interleaved scan and its manifest rename is in
      // neither the compacted base nor the carry — and its own
      // reconcile may have exited while IT was momentarily latest.
      val dropped = droppedPublished(spark, path, baseVersion, latest,
        latestCov).filterNot(d => provenance(spark, path, d)
          .subsetOf(absorbed))
      // Name check, not coverage: a compact dir's provenance is its
      // ABSORBED set (never itself), and no other compactor can absorb
      // it while this one still holds the lock.
      if (latestDirs.contains(dirName) && dropped.isEmpty) return version
      version = claimVersion(spark, path)
      // Shadow-collapse the union so a carried original never rides
      // next to its own rewrite; the absorbed-set filter then removes
      // whatever the compact dir itself already carries. Crossed
      // re-attachments heal by claim order like the writer reconcile —
      // the compactor may be the only carrier that ever sees both
      // sides of the cross.
      val carry0 = collapseShadows(spark, path, latestDirs ++ dropped)
        .filterNot(d => d == dirName ||
          provenance(spark, path, d).subsetOf(absorbed))
      val carry =
        if (dropped.isEmpty) carry0
        else resolveCarriedConflicts(spark, path, carry0, dropped.toSet,
          dirName, recordedKeyCols(spark, path), version)
      publishManifest(spark, path, version, dirName +: carry)
      attempts += 1
    }
    throw new IllegalStateException(
      s"reconcileCompact: $dirName still unreachable from the latest " +
        s"manifest at $path after 100 republishes — writer storm")
  }

  /** Copy-on-write MERGE — the CDC apply the keep-existing sink can't
    * express: `changes` carries the data columns plus `opCol` ∈
    * {"I","U","D"}; the result publishes as version latest+1.
    *   I — insert iff the key is absent (the sink's keep-existing
    *       contract, preserved);
    *   U — upsert: replace the current row for the key, insert if new;
    *   D — delete the key (absent key → no-op).
    * Multiple change rows per key collapse to ONE op via the same
    * tie-break as [[dedupOnKey]] before anything applies.
    *
    * Copy-on-write discipline: ONLY the base dirs that actually hold a
    * touched (U/D) key are rewritten (as `<dir>-m<version>`, minus
    * those keys, with an `.absorbed` provenance record so lineage
    * reasoning still covers the original); untouched dirs carry into
    * the new manifest BY REFERENCE — a merge touching 0.1% of keys
    * rewrites ~0.1% of a compacted sink, not the corpus. Every
    * historical version still time-travels (originals are never
    * deleted here; [[expireSnapshots]] reclaims them past the horizon).
    * Run [[compactSnapshots]] periodically: the affected-dir probe and
    * the rewrite granularity are both per-dir, so a short dir chain is
    * what makes merges cheap.
    *
    * Concurrency: a merge is a REWRITER, but its rewrites run
    * LOCK-FREE into claim-named paths; only staleness re-validation +
    * publish hold the exclusive rewriter lock (compaction's r16
    * discipline — holding it across a large-dir rewrite serialized
    * every other rewriter and stalled the streaming CDC feed behind
    * the slowest rewrite in the sink). A dir replaced under us is
    * caught by the post-lock check and the merge redone from the new
    * latest. Plain appenders stay optimistic: dirs a writer publishes
    * between this merge's base read and its publish are carried by
    * provenance diff (their rows win over the merge's deletes/updates
    * — sequential merge-then-write equivalence), and the post-publish
    * reconcile resolves insert races key-level (the merge's fresh rows
    * re-verify against any dirs that interleave AFTER its publish,
    * rewriting `merge-N-r<v>` minus stolen keys — same discipline as
    * [[writeSnapshot]]'s reconcile). Returns the published version. */
  /** Test hook: runs between a merge's (lock-free) rewrites and its
    * lock acquisition, so specs can inject a racing rewriter into
    * exactly the window the staleness re-validation exists for (the
    * merge twin of [[compactPreLockHook]]). */
  private[graft] var mergePreLockHook: () => Unit = () => ()

  /** Test hook: runs after a merge COMMITTED (lock released) but before
    * its deferred change-record write — the window in which a completed
    * eraseKeys must void the record (its meta publish re-validates the
    * rewrite generation under the lock). */
  private[graft] var mergePreRecordHook: () => Unit = () => ()

  def mergeSnapshot(spark: SparkSession, path: String, changes: DataFrame,
                    keys: Seq[String], tieBreak: Seq[String],
                    opCol: String = "op"): Int =
    mergeSnapshotImpl(spark, path, changes, keys, tieBreak, opCol,
      mor = false)

  /** MERGE-ON-READ variant of [[mergeSnapshot]] — same I/U/D contract,
    * same published result row-for-row, different WRITE amplification:
    * instead of rewriting every touched dir copy-on-write (one U row in
    * a multi-TB compacted dir rewrites the whole dir), each touched dir
    * gets a DELETION VECTOR — a tiny parquet dir of the dead rows' keys
    * — attached to its manifest entry (`dir\tdv,…`) and anti-joined at
    * read. A trickle-CDC merge on hot keys publishes a new version with
    * ZERO data-dir rewrites: cost = probes + the landing dir + dv dirs,
    * all batch-proportional.
    *
    * The read tax is per-entry (one anti join per distinct dv set);
    * COMPACTION FOLDS dvs physically (it reads the resolved view), so
    * the steady state is the usual loop: trickle MoR merges between
    * compactions, each compaction resetting entries to plain dirs.
    * Time travel, the change feed (recorded and key-diff), metadata
    * COUNT/MIN/MAX, erasure and expiry all stay exact — dv'd entries
    * subtract/fall back where a sidecar alone would overstate
    * (the Delta/Iceberg deletion-vector design, format-lite).
    *
    * Gated sinks: per-dir drift profiles describe the PHYSICAL dirs,
    * so a dv'd dir's profile still counts its dead rows — the gate
    * sees a conservative (pre-delete) distribution until the next
    * compaction folds the dvs and re-profiles. Drift thresholds fire
    * on jumps, not absolutes, so the skew is bounded by the dv'd
    * fraction — run compactions on the usual cadence. */
  def mergeSnapshotMoR(spark: SparkSession, path: String,
      changes: DataFrame, keys: Seq[String], tieBreak: Seq[String],
      opCol: String = "op"): Int =
    mergeSnapshotImpl(spark, path, changes, keys, tieBreak, opCol,
      mor = true)

  private def mergeSnapshotImpl(spark: SparkSession, path: String,
      changes: DataFrame, keys: Seq[String], tieBreak: Seq[String],
      opCol: String, mor: Boolean): Int =
      labeled(spark, "graft.merge") {
    val fs = fsFor(spark, path)
    fs.mkdirs(snapDir(path))
    requireLiveKeys(spark, path, keys, "mergeSnapshot")
    val op = upper(col(opCol))
    val deduped = dedupOnKey(normalizeBatch(spark, path, changes),
      keys, tieBreak).withColumn(opCol, op).localCheckpoint()
    // ONE "facts" aggregate over the checkpointed batch replaces the
    // op-validation probe, the touched/iKeys standalone checkpoints
    // and both probeFacts range jobs (guide §2.4 — remove whole
    // passes): `deduped` is KEY-UNIQUE (dedupOnKey), so conditional
    // counts ARE distinct-key counts and conditional min/max ARE the
    // probes' bounding boxes — a single partial aggregate, no shuffle,
    // no extra pass per prologue stage. Probes don't change across
    // stale retries, so the facts are computed once before the loop.
    val opc = col(opCol)
    val badPred = opc.isNull || !opc.isin("I", "U", "D")
    val tPred = !opc.isNull && opc.isin("U", "D")
    val iPred = opc === "I"
    val statKeys = keys.flatMap(k =>
      statTag(deduped.schema(k).dataType).map(k -> _))
    val factAggs =
      Seq(count(when(badPred, lit(1))).as("__bad"),
        count(when(tPred, lit(1))).as("__tn"),
        count(when(iPred, lit(1))).as("__in"),
        count(when(opc === "U", lit(1))).as("__un")) ++
      statKeys.flatMap { case (k, _) => Seq(
        min(when(tPred, col(k))), max(when(tPred, col(k))),
        min(when(iPred, col(k))), max(when(iPred, col(k)))) }
    val facts = labeled(spark, "graft.merge facts")(
      deduped.agg(factAggs.head, factAggs.tail: _*).head())
    require(facts.getLong(0) == 0,
      s"mergeSnapshot: $opCol must be one of I/U/D")
    val tCnt = facts.getLong(1)
    val iCnt = facts.getLong(2)
    val uCnt = facts.getLong(3)
    def factRanges(offset: Int): ProbeRanges =
      statKeys.zipWithIndex.map { case ((k, tag), j) =>
        val lo = facts.get(4 + 4 * j + offset)
        val hi = facts.get(4 + 4 * j + offset + 1)
        (k, tag, if (lo == null || hi == null) None
                 else Some((decodeStatValue(tag, encodeStatValue(tag, lo)),
                            decodeStatValue(tag, encodeStatValue(tag, hi)))))
      }
    val touchedPr = factRanges(0)
    val iPr = factRanges(2)
    // Key-unique projections of the checkpoint — no .distinct() (a
    // redundant shuffle), no standalone checkpoints: consumers read
    // the batch-sized checkpoint blocks; [[maybeBroadcastKeys]] keeps
    // the probe side broadcast where the old checkpointed-size
    // estimate used to.
    val touched0 = deduped.filter(tPred).select(keys.map(col): _*)
    val touched = maybeBroadcastKeys(touched0, tCnt)
    val iRows = deduped.filter(iPred).drop(opCol)
    val uRows = deduped.filter(opc === "U").drop(opCol)
    val iKeys = iRows.select(keys.map(col): _*)
    // Bloom canons: one bounded collect per probe class, only when the
    // facts say it fits the cap (the big regime skips the bloom stage
    // by contract, now without even the limit-collect attempt).
    def canonsFor(keysDf: DataFrame, cnt: Long): Option[Option[Array[String]]] = {
      val canonable = keys.forall(k =>
        statTag(deduped.schema(k).dataType).isDefined)
      if (!canonable) Some(None)
      else if (cnt > BloomProbeMax) Some(None)
      else if (cnt == 0) Some(Some(Array.empty[String]))
      else Some(Some(canonRowsOf(
        labeled(spark, "graft.merge canons")(
          keysDf.limit(BloomProbeMax + 1).collect()),
        keysDf.schema, keys)))
    }
    val touchedCanons = canonsFor(touched0, tCnt)
    val iCanons = canonsFor(iKeys, iCnt)
    // The marker ENABLES the dv-reattach scan on later publishes —
    // LOAD-BEARING, not best-effort: a name-based publish on a sink
    // whose marker is missing reattaches nothing and silently
    // resurrects every dv-deleted row. Created AFTER the eager
    // validations (a refused op column or empty sink must not brand a
    // plain COW sink with the per-publish reattach scan forever) but
    // BEFORE any rewrite/publish, so no manifest carrying a dv can be
    // visible without it; a create failure aborts the merge.
    if (mor) {
      require(latestVersion(spark, path) >= 1,
        "nothing to merge into: no published snapshot")
      if (!fs.exists(morMarkerPath(path)))
        fs.create(morMarkerPath(path), true).close()
    }
    // The critical section covers ONLY staleness re-validation +
    // publish — metadata ops, the discipline compaction adopted in r16.
    // Every data rewrite (touched-dir copies, the landing write — the
    // hours-long part when a merge hits a large dir at 100 TB) runs
    // LOCK-FREE into claim-named paths: holding the lock across it
    // serialized every other merge, compaction, and streaming CDC batch
    // behind the slowest rewrite in the sink. Staleness check under the
    // lock: dirs are immutable and every rewriter REPLACES the dirs it
    // touches in the latest manifest, so "all base dirs still listed"
    // <=> "the content we probed/rewrote is still the live content".
    // Plain appends only ADD dirs and are carried as interleaved. On a
    // stale base the orphaned rewrites are deleted and the merge
    // retried from the new latest. (An OFFLINE eraseKeys can still
    // delete a dir out from under the lock-free reads — that op's
    // contract quiesces writers, this merge included.)
    var attempts = 0
    while (attempts < 5) {
      // Advisory fail-fast (not the protection — the post-lock
      // staleness check is): a rewriter holding the lock RIGHT NOW is
      // about to invalidate whatever base we'd read, so don't burn the
      // rewrites on it; streaming CDC callers classify this typed
      // throw and retry with backoff. Racy by nature; a collision that
      // slips through just costs one stale-retry.
      val advisory = new org.apache.hadoop.fs.Path(snapDir(path),
        "compact.lock")
      if (fs.exists(advisory)) throw new LockHeldException(
        s"mergeSnapshot: another rewriter holds $advisory — if its " +
          "process crashed, delete the lock file and retry", null)
      val cur = latestVersion(spark, path)
      require(cur >= 1, "nothing to merge into: no published snapshot")
      val target = claimVersion(spark, path)
      val baseEntries = manifestEntries(spark, path, cur)
      val baseDirs = baseEntries.map(_.dir)
      val entryByDir = baseEntries.map(e => e.dir -> e).toMap
      val baseCoverage = coverage(spark, path, baseDirs)
      // RAW schema: the rewrites pin it onto per-dir reads, and dirs
      // carry PHYSICAL names — the mapped view would NULL a renamed
      // column out of every pre-rename dir.
      val snapshotSchema = readSnapshotRaw(spark, path, cur).schema
      // Touched-key pruning (range stats + bloom): only dirs that can
      // hold a U/D key get the left-semi probe — the rest carry
      // without being OPENED. On a compacted 100 TB sink a trickle
      // merge probes the handful of dirs its keys can live in.
      val candidates = pruneDirs(spark, path, baseDirs, keys, touched,
        Some(touchedPr), touchedCanons)
      lastProbedDirs.set(candidates)
      val tFilter = probeRangeFilter(snapshotSchema, touchedPr)
      // A dir's LIVE view: pinned-schema scan minus its entry's dvs —
      // a dv-dead touched key must neither classify the dir dirty nor
      // enter pre-images / a new dv (it is already deleted).
      def liveDir(d: String) = antiDv(spark, path,
        spark.read.schema(snapshotSchema).parquet(s"$path/$d"),
        entryByDir.get(d).map(_.dvs).getOrElse(Nil))
      def liveHits(d: String) = {
        val sc = liveDir(d)
        tFilter.map(sc.filter).getOrElse(sc)
          .join(touched, keys, "left_semi")
      }
      // Dirty/clean classification in ONE Spark job for ALL candidate
      // dirs (a per-dir isEmpty probe was one sequential job per dir —
      // on a 100 TB sink with many touched dirs, that serializes round
      // trips the scheduler can run in parallel): each candidate's
      // pruned semi-join contributes its dir tag, the union's distinct
      // tags are the dirty set. Same per-dir scans, same pushed probe
      // bounds, one job.
      val hitDirs: Set[String] =
        if (candidates.isEmpty) Set.empty
        else labeled(spark, "graft.merge classify")(balancedUnion(
            candidates.map(d => liveHits(d).select(lit(d).as("__dir"))))
          .distinct()
          .collect()).map(_.getString(0)).toSet
      val (rewritten, probedClean) = candidates.partition(hitDirs.contains)
      val carried = probedClean ++ baseDirs.filterNot(candidates.contains)
      // COW: rewrite each dirty dir minus touched keys, FOLDING its dvs
      // (the rewrite is the dir's new line of truth — re-publishing
      // dv-dead rows would resurrect them). MoR: no data rewrite at
      // all — each dirty dir gets a dv of the hit keys instead.
      val rewriteNames =
        if (mor) Nil
        else rewritten.map { d =>
          val rw = s"$d-m$target"
          // keyBound: the rewrite's keys are a subset of the parent
          // dir's rows (its sidecar row count) — the observed bloom
          // rides the rewrite job.
          writeDirWithStats(spark, path, rw,
            liveDir(d).join(touched, keys, "left_anti"), keys,
            keyBound = readDirRowCount(spark, path, d))
          val out = fs.create(absorbedPath(path, rw), true)
          try out.write(provenance(spark, path, d).toSeq.sorted
            .mkString("\n").getBytes("UTF-8"))
          finally out.close()
          rw
        }
      val dvByDir: Map[String, String] =
        if (!mor) Map.empty
        else rewritten.zipWithIndex.map { case (d, i) =>
          val dv = s"dv-$target-$i"
          // keyBound: a dv's keys are a subset of the batch's touched
          // keys.
          writeDirWithStats(spark, path, dv,
            liveHits(d).select(keys.map(col): _*).distinct(), keys,
            keyBound = Some(tCnt))
          d -> dv
        }.toMap
      // Landing rows: every U (old copy just removed by the rewrites),
      // plus I rows whose key the base snapshot lacks (keep-existing).
      // The presence probe is PRUNED to the dirs the BATCH's I keys can
      // live in — the write-path twin of the touched-dir pruning; the
      // corpus-wide readSnapshot scan this replaces was the last
      // corpus-proportional cost in the merge.
      val presentDirs = pruneDirs(spark, path, baseDirs, keys, iKeys,
        Some(iPr), iCanons)
      lastPresentDirs.set(presentDirs)
      val freshI =
        if (presentDirs.isEmpty || !keys.forall(snapshotSchema.fieldNames.contains))
          iRows
        else {
          // SINK-typed key schema (from the snapshot's own union
          // schema, already computed): pinning the probe's types would
          // crash the reader on a narrower-typed batch; the anti join
          // coerces the comparison.
          val pSchema = org.apache.spark.sql.types.StructType(
            keys.map(k => snapshotSchema(snapshotSchema.fieldIndex(k))))
          // Grouped by dv set: a dv-DEAD key must probe as absent —
          // the keep-existing insert of a deleted key has to land.
          val pScan0 = baseEntries.filter(e => presentDirs.contains(e.dir))
            .groupBy(_.dvs).toSeq.sortBy(_._1.mkString(","))
            .map { case (dvs, es) =>
              antiDv(spark, path, spark.read.schema(pSchema)
                .parquet(es.map(e => s"$path/${e.dir}"): _*), dvs)
            }.reduce(_.unionByName(_))
          val pScan = probeRangeFilter(pSchema, iPr)
            .map(pScan0.filter).getOrElse(pScan0)
          iRows.join(pScan.distinct(), keys, "left_anti")
        }
      val land0 = uRows.unionByName(freshI)
      val mergeDir = s"merge-$target"
      // keyBound: the landing holds at most every U row plus every I
      // row of the (key-unique) batch.
      writeDirWithStats(spark, path, mergeDir, land0, keys,
        keyBound = Some(uCnt + iCnt))
      recordKeyCols(spark, path, keys)
      mergePreLockHook()
      // A rival taking the lock inside the rewrite→acquire window
      // throws LockHeldException here; without cleanup every such
      // collision (the streaming CDC sink retries them routinely)
      // would strand a full set of rewritten dirs for the offline
      // vacuum — delete the orphans before propagating.
      val lock = try acquireRewriterLock(fs, path, "mergeSnapshot")
        catch { case e: LockHeldException =>
          (rewriteNames ++ dvByDir.values :+ mergeDir).foreach { d =>
            fs.delete(new org.apache.hadoop.fs.Path(path, d), true)
            deleteDirSidecars(fs, path, d)
          }
          throw e
        }
      // Set inside the critical section, ACTED ON after it: the change
      // record re-reads the rewritten dirs and writes a parquet dir —
      // data jobs that must not run under the lock (the critical
      // section's contract is metadata-only; a record write under it
      // would stall every rewriter and the streaming CDC feed behind
      // a scan). The inputs are immutable dirs, so deferring is safe.
      var committed: Option[Int] = None
      var recordAt: Option[Int] = None
      var genAtCommit: String = ""
      try {
        val latestNow = latestVersion(spark, path)
        val latestEntries = manifestEntries(spark, path, latestNow)
        val latestDirs = latestEntries.map(_.dir)
        // ENTRY-level staleness: a dv added to a base dir by a racing
        // merge-on-read merge changes its content without renaming it
        // — the name check alone would let this merge republish the
        // pre-dv entry and resurrect the rival's deletes.
        if (baseEntries.forall(latestEntries.contains)) {
          // Interleaved appenders between the base read and this
          // publish: carry their dirs (their rows win over this
          // merge's deletes — sequential merge-then-write
          // equivalence). Taken from the LATEST manifest, so writers
          // that claimed above `target` are covered too.
          val interleaved = latestDirs.filterNot(baseDirs.contains)
            .filterNot(d =>
              provenance(spark, path, d).subsetOf(baseCoverage))
          // Publish strictly above whatever is latest (readers take
          // the max version as current).
          val pubV = if (latestNow >= target) claimVersion(spark, path)
                     else target
          // Landing rows must ALSO yield to the interleaved appenders'
          // keys — those dirs are carried unrewritten and the base
          // presence probe cannot see them, so a landing row sharing a
          // key would publish the key twice. Only I keys can actually
          // collide (a U/D key existed in the base, so no interleaved
          // keep-existing append can carry it), and the cost is
          // batch-sized on the rare contended path — the long rewrites
          // above stay lock-free.
          val finalMerge =
            if (interleaved.isEmpty) mergeDir
            else {
              val inKeys = readEntriesRaw(spark, path,
                  latestEntries.filter(e => interleaved.contains(e.dir)))
                .select(keys.map(col): _*).distinct()
              val rw = s"$mergeDir-r$pubV"
              spark.read.parquet(s"$path/$mergeDir")
                .join(inKeys, keys, "left_anti")
                .write.mode("overwrite").parquet(s"$path/$rw")
              writeKeyStats(spark, path, rw, keys)
              // The unfiltered landing dir is never published — drop
              // it rather than leave a vacuum-bait orphan.
              fs.delete(new org.apache.hadoop.fs.Path(path, mergeDir), true)
              deleteDirSidecars(fs, path, mergeDir)
              rw
            }
          // Rows of already-published dirs changed -> name-based delta
          // readers must recompute ([[rewriteGen]]). Before the
          // manifest rename, so no reader ever sees the publish
          // without the marker. A merge-on-read dv IS a content
          // change to a published dir — same rule.
          if (rewriteNames.nonEmpty || dvByDir.nonEmpty)
            touchRewriteGen(spark, path, target)
          if (mor)
            // Entries form: the NEW dvs are in no manifest yet, so the
            // name-based reattach cannot supply them.
            publishManifestEntries(spark, path, pubV,
              carried.map(entryByDir) ++
                rewritten.map { d =>
                  val e = entryByDir(d)
                  SnapEntry(e.dir, (e.dvs :+ dvByDir(d)).sorted)
                } ++
                latestEntries.filter(e => interleaved.contains(e.dir)) :+
                SnapEntry(finalMerge, Nil))
          else
            publishManifest(spark, path, pubV,
              carried ++ rewriteNames ++ interleaved :+ finalMerge)
          // The merge dir is self-rooted, so the unified reconcile
          // applies: its dropped-version sweep carries WHOLE dropped
          // manifests and shadow-collapses (rewrites over originals),
          // which is exactly what keeps a re-attached merge from
          // pairing with pre-merge originals; key conflicts resolve
          // with the merge dir yielding.
          val rv = reconcileLineage(spark, path, pubV, finalMerge, keys,
            baseCoverage ++ rewriteNames ++
              interleaved.flatMap(d => provenance(spark, path, d)),
            land0.schema, baseVersion = cur)
          // Change record: the merge's exact I/U/D sets, persisted so
          // the feed never re-derives them — skipped on the contended
          // paths (interleaver carried, reconcile republished), where
          // what landed differs from what this pass computed. Written
          // AFTER the lock releases (see recordAt above).
          if (rv == pubV && interleaved.isEmpty) {
            recordAt = Some(rv)
            // Rewrite-generation fingerprint AT COMMIT (still under
            // the lock): the deferred record write re-validates
            // against it before its meta publish — an eraseKeys that
            // completed in the window would otherwise have its
            // record sweep overwritten, re-persisting the erased
            // subject's pre-images under v<N>.changes.
            genAtCommit = rewriteGen(spark, path)
          }
          committed = Some(rv)
        }
      } finally fs.delete(lock, false)
      committed match {
        case Some(rv) =>
          mergePreRecordHook()
          recordAt.foreach { v =>
            // Pre-images = the LIVE rows of the dirty dirs that the
            // touched keys matched — exactly what the COW rewrites
            // dropped / the MoR dvs killed. Passed as a THUNK: the
            // plan's spark.read resolves files at construction, and an
            // eraseKeys completing in this window may have deleted the
            // originals — the record writer's gen pre-check must run
            // before any path resolves (a throw here would fail the
            // already-committed merge).
            def removedPre() =
              if (rewritten.isEmpty)
                spark.createDataFrame(
                  spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  snapshotSchema)
              else balancedUnion(rewritten.map(liveHits))
            writeMergeChangeRecord(spark, path, v, base = cur,
              removedPre _,
              landingDir = mergeDir, landingSchema = land0.schema,
              uKeys = deduped.filter(opc === "U")
                .select(keys.map(col): _*),
              dKeys = deduped.filter(opc === "D")
                .select(keys.map(col): _*),
              keys, genAtCommit, tCnt)
          }
          return rv
        case None => ()
      }
      // Stale base: a rewriter (another merge, a compactor, an
      // erasure) replaced a dir we probed, carried, or rewrote. Drop
      // the orphaned rewrites and retry from the new latest.
      (rewriteNames ++ dvByDir.values :+ mergeDir).foreach { d =>
        fs.delete(new org.apache.hadoop.fs.Path(path, d), true)
        deleteDirSidecars(fs, path, d)
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"mergeSnapshot: base rewritten under us 5 times at $path — " +
        "rewriter storm; retry when compactions/erasures quiesce")
  }

  /** Time travel: version N exactly as published, whatever has been
    * written since — a union read of its manifest's immutable dirs.
    * mergeSchema makes the read ADDITIVELY SCHEMA-EVOLVED: a later
    * batch may carry new columns, and earlier dirs surface NULL there
    * (without it, parquet union reads take ONE footer's schema and
    * silently drop the new columns for every row). Cost: one footer
    * read per file at planning — bounded by the batch-dir chain length,
    * which [[compactSnapshots]] keeps short. Renames/drops/retypes are
    * NOT supported (no column-id mapping in this format-lite sink —
    * the documented line short of Delta/Iceberg). */
  def readSnapshot(spark: SparkSession, path: String, version: Int): DataFrame =
    applySchemaMap(spark, path, readSnapshotRaw(spark, path, version))

  /** The PHYSICAL union read, before declared schema evolution — what
    * every internal rewrite path must use: a merge's pinned-schema dir
    * reads under the MAPPED schema would silently NULL a renamed
    * column out of old dirs (the map is a read-time projection, not a
    * physical fact). */
  private def readSnapshotRaw(spark: SparkSession, path: String,
      version: Int): DataFrame =
    readEntriesRaw(spark, path, manifestEntries(spark, path, version))

  /** EXPLICITLY DESTRUCTIVE retention: drop every snapshot manifest
    * older than `keepFrom` and delete any data dir no surviving
    * manifest references. The one operation in this sink that deletes
    * anything — time travel works up to the horizon a deployment pays
    * to keep, and [[compactSnapshots]] before expiry makes the
    * surviving versions cheap (old batch chains become unreferenced
    * and reclaim here). Also sweeps HYGIENE debris: `v<N>.claim`
    * markers with N ≤ the latest published version are provably dead
    * (claims always target past max(published, claimed), so those
    * numbers can never be re-claimed — a crashed claimant's marker
    * would otherwise be listed by every future claim forever), and a
    * deleted compact dir takes its `.absorbed` provenance record with
    * it. Returns the number of data dirs deleted. */
  def expireSnapshots(spark: SparkSession, path: String,
                      keepFrom: Int): Int = {
    val cur = latestVersion(spark, path)
    require(keepFrom >= 1 && keepFrom <= cur,
      s"keepFrom must name an existing snapshot (1..$cur), got $keepFrom")
    val fs = fsFor(spark, path)
    val snapNames = fs.listStatus(snapDir(path)).toSeq.map(_.getPath.getName)
    // PUBLISHED versions only — crashed claims leave holes in the
    // version numbering, so the keep range cannot be assumed dense.
    val allVersions = snapNames
      .flatMap(numberedName(_, "v", ".list"))
    // dv dirs are referenced THROUGH their entries (merge-on-read):
    // they reclaim with the versions that applied them and must never
    // be deleted while a surviving manifest still anti-joins them.
    def allNames(v: Int) = manifestEntries(spark, path, v)
      .flatMap(e => e.dir +: e.dvs)
    val referenced = allVersions.filter(_ >= keepFrom)
      .flatMap(allNames).toSet
    val doomedDirs = allVersions.filter(_ < keepFrom)
      .flatMap(allNames).toSet -- referenced
    allVersions.filter(_ < keepFrom).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(snapDir(path), s"v$v.list"), false)
      // Aggregate-maintenance coverage marker, if this sink has them,
      // and the publish-timestamp sidecar.
      fs.delete(new org.apache.hadoop.fs.Path(snapDir(path), s"v$v.src"), false)
      fs.delete(new org.apache.hadoop.fs.Path(snapDir(path), s"v$v.meta"), false)
      fs.delete(new org.apache.hadoop.fs.Path(snapDir(path), s"v$v.profile"),
        false)
      fs.delete(changesMetaPath(path, v), false)
      fs.delete(changesDirPath(path, v), true)
    }
    snapNames
      .flatMap(numberedName(_, "v", ".claim"))
      .filter(_ <= cur)
      .foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(snapDir(path), s"v$v.claim"),
          false)
      }
    // Rewrite-generation markers older than the horizon: without a
    // sweep they accumulate one tiny file per merge/erase/heal forever
    // (listed by every rewriteGen call — worst exactly on object
    // stores where small-file listings cost). Sweeping changes the
    // fingerprint, so the NEXT aggregate refresh recomputes once —
    // the correct price inside an op that just destroyed history.
    snapNames
      .flatMap(numberedName(_, "gen-", ".touch"))
      .filter(_ < keepFrom)
      .foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(snapDir(path),
          s"gen-$v.touch"), false)
      }
    // Erase markers age out the same way; the changed [[eraseGen]]
    // fingerprint forces feed consumers to recompute once — the
    // correct price inside an op that just destroyed history.
    snapNames
      .flatMap(numberedName(_, "erase-", ".touch"))
      .filter(_ < keepFrom)
      .foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(snapDir(path),
          s"erase-$v.touch"), false)
      }
    doomedDirs.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(path, d), true)
      // Any dir may own an absorbed record (compact dirs, merge
      // rewrites) and a key-range stats sidecar; deleting a missing
      // one is a no-op.
      deleteDirSidecars(fs, path, d)
    }
    doomedDirs.size
  }

  /** [[expireSnapshots]] with a WALL-CLOCK horizon — "keep 30 days" as
    * one call: drops every version a reader at epoch-ms `tsMs` could no
    * longer see as latest, i.e. keeps [[versionAsOf]]`(tsMs)` and
    * everything above it (the as-of version was still current AT the
    * horizon, so time travel to any instant ≥ `tsMs` keeps working).
    * Resolution uses the `v<N>.meta` publish stamps (mtime fallback for
    * pre-.meta sinks). Versions published out of wall-clock order by
    * reconciliation races are kept whenever their NUMBER is above the
    * as-of answer — conservative, never destroys a readable instant.
    * No version published at or before `tsMs` → nothing expires (a
    * horizon before the sink's birth must not be an error — retention
    * jobs run it blindly). Returns the number of data dirs deleted. */
  def expireSnapshotsOlderThan(spark: SparkSession, path: String,
      tsMs: Long): Int = {
    val fs = fsFor(spark, path)
    require(fs.exists(snapDir(path)), s"no snapshot sink at $path")
    // One stamp pass serves both the nothing-to-expire guard and the
    // as-of horizon (versionAsOf would re-open every v<N>.meta).
    val at = fs.listStatus(snapDir(path)).toSeq.map(_.getPath.getName)
      .flatMap(numberedName(_, "v", ".list"))
      .filter(v => publishedAtMs(spark, path, v) <= tsMs)
    if (at.isEmpty) return 0
    expireSnapshots(spark, path, at.max)
  }

  /** The rows ADDED between two snapshots, diffed by PROVENANCE, not
    * dir name: a `to`-manifest dir is delta only if its provenance is
    * disjoint from `from`'s coverage. Pure repackagings — a
    * [[compactSmallDirs]] pack, a full compaction of exactly the
    * `from` lineage, a merge/erase REWRITE of old dirs — are excluded
    * (their rows were already read; the r15 name-diff surfaced a whole
    * compacted corpus as "delta" across every routine pack, which at
    * 100 TB is a full re-read per maintenance cycle). A dir that
    * STRADDLES (a full compaction absorbing post-`from` appends) is
    * still included whole — its covered rows repeat; take deltas
    * between versions on the same side of a full compaction, or diff
    * by key ([[graft.ops.Checksum]]'s snapshot diff). Additions only
    * by contract: rows a merge/erasure REMOVED are not surfaced.
    * `from` = 0 reads everything up to `to`. */
  def readSnapshotDelta(spark: SparkSession, path: String,
                        from: Int, to: Int): DataFrame = {
    require(from >= 0 && to > from, s"need 0 <= from < to, got $from..$to")
    if (from == 0) return readSnapshot(spark, path, to)
    val fromCov = coverage(spark, path, manifestDirs(spark, path, from))
    // `to`'s OWN dv sets apply: a row added in the span and already
    // dv-deleted by `to` is not an addition a reader of `to` can see.
    val entries = manifestEntries(spark, path, to)
      .filterNot(e => provenance(spark, path, e.dir).subsetOf(fromCov))
    if (entries.isEmpty) readSnapshot(spark, path, to).limit(0)
    else applySchemaMap(spark, path, readEntriesRaw(spark, path, entries))
  }

  /** DESCRIBE HISTORY: one row per published version — (version,
    * published_ms, n_dirs, n_rows) — at driver-metadata cost: publish
    * stamps from the `v<N>.meta` sidecars ([[publishedAtMs]]), row
    * counts from the `__rows` stats lines ([[countSnapshot]]; statless
    * dirs degrade that version's row to a per-dir scan). The operator
    * a 100 TB deployment points its dashboards at — no executor work
    * on the sidecar path. */
  def snapshotHistory(spark: SparkSession, path: String): DataFrame = {
    val fs = fsFor(spark, path)
    require(fs.exists(snapDir(path)), s"no snapshot sink at $path")
    import spark.implicits._
    // The scanned-dirs audit must cover EVERY version's count, not just
    // the final loop iteration's (countSnapshot resets the slot per
    // call) — otherwise "history counted from sidecars alone" asserts
    // only the newest version and an earlier one silently falling back
    // to a scan would pass.
    val scannedUnion = scala.collection.mutable.ArrayBuffer.empty[String]
    val rows = fs.listStatus(snapDir(path)).toSeq.map(_.getPath.getName)
      .flatMap(numberedName(_, "v", ".list"))
      .sorted
      .map { v =>
        val r = (v, publishedAtMs(spark, path, v),
          manifestDirs(spark, path, v).size, countSnapshot(spark, path, v))
        scannedUnion ++= lastCountScanned.get()
        r
      }
    lastCountScanned.set(scannedUnion.distinct.toSeq)
    rows.toDF("version", "published_ms", "n_dirs", "n_rows")
  }

  // ── write-time CDC change records ───────────────────────────────
  // Each publish MAY record its own exact change set against its BASE
  // version, making [[snapshotChanges]] O(changes) over ANY version
  // span whose records chain — including across a full compaction,
  // where the key-diff degrades to a join of two full corpora. Layout
  // (all under `_snapshots`, invisible to data readers and the vacuum
  // sweep):
  //   v<N>.changes.meta — tiny text: record kind (delta|append|none),
  //     the BASE version the record diffs against, and (append) the
  //     batch dir name. Written LAST: its presence commits the record.
  //   v<N>.changes      — (kind delta only) parquet dir of change
  //     rows: `__op` ∈ I/U/D/P — I and U carry post-images, D carries
  //     the deleted row's PRE-image, P carries a U key's pre-image
  //     (composition needs it to diff a multi-version span's endpoints
  //     and to drop a no-op U chain).
  // Appends store only the batch dir NAME — its content IS the I set,
  // so the record costs one small file. Pure repackagings (compaction,
  // bin-pack) record `none`. Records are BEST-EFFORT: a publish that
  // was healed, carried, or interleaved skips its record (describing
  // what actually landed would need the reconcile's full state), and
  // any missing/broken link degrades the feed to the key-diff — never
  // to a wrong answer. The recorded base version is what makes
  // composition safe under racing writers: a version published into
  // the span out of claim order breaks the chain (base mismatch) and
  // the feed falls back rather than composing against the wrong
  // predecessor.

  private def changesMetaPath(path: String, version: Int) =
    new org.apache.hadoop.fs.Path(snapDir(path), s"v$version.changes.meta")
  private def changesDirPath(path: String, version: Int) =
    new org.apache.hadoop.fs.Path(snapDir(path), s"v$version.changes")

  private sealed trait ChangeRecord { def base: Int }
  private final case class AppendRecord(base: Int, dir: String)
    extends ChangeRecord
  private final case class RepackRecord(base: Int) extends ChangeRecord
  private final case class DeltaRecord(base: Int) extends ChangeRecord

  private def writeChangeMeta(fs: org.apache.hadoop.fs.FileSystem,
      path: String, version: Int, kind: String, base: Int,
      dir: Option[String]): Unit =
    try {
      val out = fs.create(changesMetaPath(path, version), true)
      try out.write((s"kind\t$kind\nbase\t$base" +
        dir.map(d => s"\ndir\t$d").getOrElse("")).getBytes("UTF-8"))
      finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  private def readChangeRecord(spark: SparkSession, path: String,
      version: Int): Option[ChangeRecord] =
    try {
      val fs = fsFor(spark, path)
      val p = changesMetaPath(path, version)
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val m = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty)
        .map { l => val a = l.split("\t", 2); a(0) -> a(1) }.toMap
      finally in.close()
      val base = m("base").toInt
      m("kind") match {
        case "append" => Some(AppendRecord(base, m("dir")))
        case "none" => Some(RepackRecord(base))
        case "delta" => Some(DeltaRecord(base))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Reserved internal columns of a delta record; a sink whose DATA
    * schema uses one of these names simply never records (feed falls
    * back to the key-diff — degradation, not corruption). */
  private val ChangeRecCols = Set("__op", "__v")

  /** Persist a merge's exact change set. `removedPre` are the
    * pre-images of every row the touched-dir rewrites dropped (U and D
    * keys that were present); one probe-filtered re-read of the
    * rewritten dirs, batch-proportional via the same pruning that
    * selected them. A U whose key was NOT present landed as an insert
    * and records as I — the record mirrors what the key-diff would
    * emit, not the caller's op labels. */
  private def writeMergeChangeRecord(spark: SparkSession, path: String,
      version: Int, base: Int, removedPreF: () => DataFrame,
      landingDir: String,
      landingSchema: org.apache.spark.sql.types.StructType,
      uKeys: DataFrame, dKeys: DataFrame,
      keys: Seq[String],
      genAtCommit: String, touchedCnt: Long): Unit =
    try labeled(spark, "graft.changeRecord") {
      if (landingSchema.fieldNames.exists(ChangeRecCols)) return
      val fs = fsFor(spark, path)
      // Cheap pre-check (the locked re-validation below is the
      // guarantee): if history was already rewritten since the commit,
      // don't even resolve the pre-image read (the dirs may be GONE —
      // an erasure deletes originals) or stage its rows on disk.
      if (rewriteGen(spark, path) != genAtCommit) return
      val removedPre = removedPreF()
      if (removedPre.columns.exists(ChangeRecCols)) return
      // The record in ONE write job, no standalone checkpoint (guide
      // §2.4). Old shape: a 5-frame union of two semi-joins over
      // removedPre, a semi + an anti of uRows against a CHECKPOINTED
      // removedKeys, and a re-execution of the freshI presence
      // anti-join — 3 scans of the dirty dirs plus 2 checkpoint jobs
      // plus a second probe of the base dirs. The post-image side is
      // EXACTLY the published landing dir (uRows ∪ freshI, immutable,
      // already on disk — recordAt is only set when no interleaver
      // rewrote it), so the record READS IT BACK instead of
      // recomputing it, and the P/D and U/I splits are per-row CASE
      // tags over the key-unique batch:
      //  - every removedPre key is in touched = uKeys ∪ dKeys, so
      //    key ∈ dKeys ⇒ D else P — one join against the D keys;
      //  - a landing row is U iff its key is a batch U key AND was
      //    removed from some dirty dir (the pre-image exists); every
      //    other landing row is an insert.
      val dMark = dKeys.withColumn("__is_d", lit(true))
      val preOp = removedPre.join(maybeBroadcastKeys(dMark, touchedCnt),
          keys, "left")
        .withColumn("__op",
          when(col("__is_d").isNotNull, "D").otherwise("P"))
        .drop("__is_d")
      val landing = spark.read.schema(landingSchema)
        .parquet(s"$path/$landingDir")
      val uMark = uKeys.withColumn("__is_u", lit(true))
      val rmMark = removedPre.select(keys.map(col): _*).distinct()
        .withColumn("__rm", lit(true))
      val landOp = landing
        .join(maybeBroadcastKeys(uMark, touchedCnt), keys, "left")
        .join(maybeBroadcastKeys(rmMark, touchedCnt), keys, "left")
        .withColumn("__op",
          when(col("__is_u").isNotNull && col("__rm").isNotNull, "U")
            .otherwise("I"))
        .drop("__is_u", "__rm")
      val rec = Seq(preOp, landOp)
        .reduce(_.unionByName(_, allowMissingColumns = true))
      rec.write.mode("overwrite")
        .parquet(changesDirPath(path, version).toString)
      // The meta file is the record's COMMIT POINT, and this write
      // runs AFTER the merge's lock released (a data job must not run
      // under the metadata-only critical section). An eraseKeys that
      // completed inside that window swept every `.changes` file and
      // advanced the rewrite generation — publishing the meta now
      // would re-persist the erased subject's pre-images "after the
      // data is gone" and serve them to any span composed from this
      // record. So the TINY meta publish takes the rewriter lock and
      // re-validates the generation first; any mismatch abandons the
      // record: the feed degrades to the key-diff, it never lies.
      // The acquisition RETRIES briefly: the common contender is a
      // rival merge's own short metadata-only critical section, which
      // never invalidates this record — giving up on the first
      // collision systematically degraded every contended span's feed
      // to the corpus-scale key-diff. An erasure holding the lock is
      // caught by the gen re-check after acquisition either way; only
      // a persistent holder (crashed rewriter) exhausts the budget.
      var lock: org.apache.hadoop.fs.Path = null
      var tries = 0
      while (lock == null) {
        try lock = acquireRewriterLock(fs, path, "mergeChangeRecord")
        catch {
          case e: LockHeldException =>
            tries += 1
            if (tries >= 10) throw e // outer catch deletes the dir
            Thread.sleep(100L * tries)
        }
      }
      val keep = try rewriteGen(spark, path) == genAtCommit
        finally fs.delete(lock, false)
      if (keep) writeChangeMeta(fs, path, version, "delta", base, None)
      else fs.delete(changesDirPath(path, version), true)
    } catch {
      case scala.util.control.NonFatal(_) =>
        // Never leave an uncommitted record dir: an erasure's sweep
        // keys off `.changes` names, and debris under _snapshots is
        // invisible to the vacuum. Best-effort, like the record.
        try fsFor(spark, path).delete(changesDirPath(path, version), true)
        catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Test/ops audit of the last [[snapshotChanges]] path:
    * `"recorded:v,v,…"` (composed from write-time records — no version
    * scan) or `"keydiff"` (the exact full-outer diff). */
  private[graft] val lastChangesMode =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  /** Compose the span's write-time change records into the exact
    * endpoint diff. None ⇒ the chain is unusable (a version lacks a
    * record, a base link mismatches, a referenced dir is gone, or a
    * reserved column collides) and the caller falls back to the
    * key-diff. Per key over the unioned records: the FIRST version's
    * pre-image (P/D row) tells whether — and with which values — the
    * key existed at `from`; the LAST version's non-P row tells whether
    * it exists at `to`; the endpoint compare drops no-op chains
    * (U back to the original value, delete-then-reinsert of the same
    * row) exactly like the key-diff. Cost: a read of the record dirs
    * (O(changes)) + one key shuffle — never the corpus. */
  private def composeRecordedChanges(spark: SparkSession, path: String,
      from: Int, to: Int, keys: Seq[String],
      opCol: String, preImages: Boolean = false): Option[DataFrame] =
    try {
      val fs = fsFor(spark, path)
      val published = fs.listStatus(snapDir(path)).toSeq
        .map(_.getPath.getName)
        .flatMap(numberedName(_, "v", ".list"))
        .filter(v => v > from && v <= to).sorted
      if (published.isEmpty) return None
      val chain = published.map(v => v -> readChangeRecord(spark, path, v))
      if (chain.exists(_._2.isEmpty)) return None
      var prev = from
      for ((v, r) <- chain) {
        if (r.get.base != prev) return None
        prev = v
      }
      // Schema map applied PER FRAME, before the union: records carry
      // PHYSICAL column names frozen at their write time (a merge's
      // pre-images use the then-raw snapshot schema), so a feed
      // spanning a renameColumn would otherwise emit dead physical
      // columns with spurious NULLs — diverging from the key-diff
      // path and from every mapped read surface.
      val frames: Seq[DataFrame] = chain.flatMap {
        case (_, Some(RepackRecord(_))) => None
        case (v, Some(AppendRecord(_, dir))) =>
          if (!fs.exists(new org.apache.hadoop.fs.Path(path, dir)))
            return None
          val df = applySchemaMap(spark, path,
            spark.read.option("mergeSchema", "true").parquet(s"$path/$dir"))
          if (df.columns.exists(ChangeRecCols)) return None
          Some(df.withColumn("__op", lit("I")).withColumn("__v", lit(v)))
        case (v, Some(DeltaRecord(_))) =>
          if (!fs.exists(changesDirPath(path, v))) return None
          val raw = spark.read.option("mergeSchema", "true")
            .parquet(changesDirPath(path, v).toString)
          // The op marker must survive the map (it is ours, not data):
          // shelter it under a reserved alias across the application.
          Some(applySchemaMap(spark, path,
              raw.withColumnRenamed("__op", "__rec_op"))
            .withColumnRenamed("__rec_op", "__op")
            .withColumn("__v", lit(v)))
        case (_, None) => return None
      }
      lastChangesMode.set(s"recorded:${published.mkString(",")}")
      lastDiffDirs.set((Nil, Nil))
      if (frames.isEmpty) {
        // Pure repackagings across the whole span: an EMPTY feed in
        // the to-version's shape.
        val base = readSnapshot(spark, path, to).limit(0)
        val cs = base.columns.filterNot(keys.contains).toSeq
        return Some(base.withColumn(opCol, lit("I"))
          .select((col(opCol) +: keys.map(col)) ++ cs.map(col): _*))
      }
      val rec = frames.reduce(_.unionByName(_, allowMissingColumns = true))
      val cols = rec.columns
        .filterNot(c => keys.contains(c) || ChangeRecCols(c)).toSeq
      require(!cols.contains(opCol) && !keys.contains(opCol),
        s"snapshotChanges: the sink already has a column named '$opCol' — " +
          "pass a different opCol")
      val nn = keys.map(col(_).isNotNull).reduce(_ && _)
      val w = Window.partitionBy(keys.map(col): _*)
      val enriched = rec.filter(nn)
        .withColumn("__minv", min(col("__v")).over(w))
        .withColumn("__maxv", max(col("__v")).over(w))
      val pre = enriched.filter(col("__v") === col("__minv") &&
          col("__op").isin("P", "D"))
        .select((keys.map(col) :+ lit(true).as("__had_pre")) ++
          cols.map(c => col(c).as(s"__pre_$c")): _*)
      val post = enriched.filter(col("__v") === col("__maxv") &&
          col("__op") =!= "P")
        .select((keys.map(col) :+ (col("__op") =!= "D").as("__exists")) ++
          cols.map(c => col(c).as(s"__post_$c")): _*)
      val same = cols.map(c => col(s"__pre_$c") <=> col(s"__post_$c"))
        .reduceOption(_ && _).getOrElse(lit(true))
      val opExpr = when(col("__had_pre").isNull && col("__exists"), "I")
        .when(col("__had_pre").isNotNull && !col("__exists"), "D")
        .when(col("__had_pre").isNotNull && col("__exists") && !same, "U")
      val joined = post.join(pre, keys, "left")
        .withColumn(opCol, opExpr)
        .filter(col(opCol).isNotNull)
      val base = joined
        .select((col(opCol) +: keys.map(col)) ++
          cols.map(c => when(col(opCol) === "D", col(s"__pre_$c"))
            .otherwise(col(s"__post_$c")).as(c)): _*)
      Some(
        if (!preImages) base
        else base.unionByName(joined.filter(col(opCol) === "U")
          .select((lit("UP").as(opCol) +: keys.map(col)) ++
            cols.map(c => col(s"__pre_$c").as(c)): _*)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Audit: the (from-only, to-only) dir lists the last
    * [[snapshotChanges]] actually read — spec hook for the
    * shared-dir pruning, not operator contract. */
  private[graft] val lastDiffDirs =
    new java.util.concurrent.atomic.AtomicReference[(Seq[String], Seq[String])]((Nil, Nil))

  /** CHANGE FEED between two snapshot versions — the exact row-level
    * I/U/D set a CDC consumer needs (Delta CDF's read side, derived by
    * KEY DIFF rather than stored change files, so it works across any
    * mix of appends, merges, compactions and even erasures):
    * `op` = I (key only in `to`, new values), D (key only in `from`,
    * OLD values — the consumer needs what to delete), U (key in both
    * with any non-key column differing null-safely, new values).
    * Unchanged keys produce no row. Unlike [[readSnapshotDelta]]
    * (additions-only at new-dirs cost), this is the EXACT diff and
    * costs what a diff costs: two version scans + one key shuffle —
    * the same shape as one sort-merge join, no per-version history
    * walk, so diffing a 100 TB sink is one join job, not a replay.
    * Schema-evolved columns compare as NULL on the side that lacks
    * them (an added column makes a row U only if some `to` value is
    * non-null). NULL-keyed rows are excluded (the sink's key ops are
    * null-rejecting; a NULL key cannot be addressed by any consumer
    * merge either). */
  def snapshotChanges(spark: SparkSession, path: String,
      fromVersion: Int, toVersion: Int, keys: Seq[String],
      opCol: String = "op"): DataFrame =
    snapshotChangesImpl(spark, path, fromVersion, toVersion, keys, opCol,
      preImages = false)

  /** [[snapshotChanges]] with UPDATE PRE-IMAGES (Delta CDF's
    * update_preimage convention): each U key emits TWO rows — `U` with
    * the new values and `UP` with the values it replaced. The extra row
    * is what makes a downstream aggregate exactly maintainable from
    * the feed alone (subtract the UP/D side, add the I/U side) — with
    * post-images only, an update's group delta is underdetermined. */
  def snapshotChangesWithPreImages(spark: SparkSession, path: String,
      fromVersion: Int, toVersion: Int, keys: Seq[String],
      opCol: String = "op"): DataFrame =
    snapshotChangesImpl(spark, path, fromVersion, toVersion, keys, opCol,
      preImages = true)

  private def snapshotChangesImpl(spark: SparkSession, path: String,
      fromVersion: Int, toVersion: Int, keys: Seq[String],
      opCol: String, preImages: Boolean): DataFrame =
      labeled(spark, "graft.changes") {
    require(fromVersion >= 1 && toVersion >= 1,
      s"need published versions, got $fromVersion..$toVersion")
    // BOTH endpoints must exist before any path runs: the composed
    // path's chain walk covers only (from, to∩published] and would
    // otherwise answer a typo'd too-high `to` with a plausible-looking
    // SHORTER span's diff instead of the key-diff's loud failure.
    val efs = fsFor(spark, path)
    Seq(fromVersion, toVersion).foreach { v =>
      require(efs.exists(new org.apache.hadoop.fs.Path(snapDir(path),
        s"v$v.list")), s"no snapshot v$v at $path")
    }
    // RECORDED fast path: when every published version in the span
    // carries a write-time change record whose base chains to its
    // predecessor, compose the records — O(changes) however the span
    // was produced, INCLUDING across a full compaction (where the
    // key-diff below degrades to reading both full sides). Reverse
    // spans and any chain break fall through to the exact key-diff.
    if (toVersion > fromVersion)
      composeRecordedChanges(spark, path, fromVersion, toVersion,
        keys, opCol, preImages) match {
        case Some(df) => return df
        case None => ()
      }
    lastChangesMode.set("keydiff")
    // SHARED-DIR pruning: a dir referenced by BOTH manifests feeds
    // identical rows to both sides, and the sink invariant (each key
    // in at most one dir per version) means such a key's row pair is
    // exactly that shared copy twice — unchanged by construction. So
    // the diff needs only the SYMMETRIC DIFFERENCE of the manifests:
    // after a trickle merge the feed reads the touched/landing dirs,
    // not the carried corpus. (A full compaction renames everything —
    // the diff degrades to both full sides and correctly emits
    // nothing; take feeds between versions on the same side of a full
    // rewrite, as with [[readSnapshotDelta]].) Columns living only in
    // shared dirs belong to rows that cannot change and drop out of
    // the compare unharmed.
    // ENTRY-level sharing (dir + dv set): a merge-on-read delete
    // changes a dir's entry without renaming it — name-level sharing
    // would exclude the dir from both sides and silently drop the
    // dv-deleted keys from the diff.
    val fromEntries = manifestEntries(spark, path, fromVersion)
    val toEntries = manifestEntries(spark, path, toVersion)
    val shared = fromEntries.toSet & toEntries.toSet
    val oldOnly = fromEntries.filterNot(shared)
    val newOnly = toEntries.filterNot(shared)
    lastDiffDirs.set((oldOnly.map(_.dir), newOnly.map(_.dir)))
    // Mapped like every other read surface: a feed spanning a
    // renameColumn must diff (and emit) LOGICAL columns, or the old
    // and new physical names compare as two half-NULL columns and
    // every renamed row surfaces as a spurious U.
    def readDirs(es: Seq[SnapEntry]) =
      if (es.isEmpty) readSnapshot(spark, path, toVersion).limit(0)
      else applySchemaMap(spark, path, readEntriesRaw(spark, path, es))
    val oldDf = readDirs(oldOnly)
    val newDf = readDirs(newOnly)
    val cols = (oldDf.columns ++ newDf.columns).distinct
      .filterNot(keys.contains).toSeq
    // A DATA column named like the op column would make the final
    // select emit two `op` columns (the computed op next to the
    // renamed-back data column) — ambiguous for every downstream
    // consumer. Refuse loudly; the caller picks a free name.
    require(!cols.contains(opCol) && !keys.contains(opCol),
      s"snapshotChanges: the sink already has a column named '$opCol' — " +
        "pass a different opCol")
    def prep(df: DataFrame, marker: String, prefix: String) = {
      val withMissing = cols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
      val nn = keys.map(col(_).isNotNull).reduce(_ && _)
      cols.foldLeft(withMissing.filter(nn).withColumn(marker, lit(true)))(
        (d, c) => d.withColumnRenamed(c, prefix + c))
    }
    val o = prep(oldDf, "__o_present", "__o_")
    val n = prep(newDf, "__n_present", "__n_")
    val same = cols.map(c => col(s"__o_$c") <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val op = when(col("__o_present").isNull, "I")
      .when(col("__n_present").isNull, "D")
      .when(!same, "U")
    val joined = o.join(n, keys, "full_outer")
      .withColumn(opCol, op)
      .filter(col(opCol).isNotNull)
    val base = joined
      .select((col(opCol) +: keys.map(col)) ++
        cols.map(c => when(col(opCol) === "D", col(s"__o_$c"))
          .otherwise(col(s"__n_$c")).as(c)): _*)
    if (!preImages) base
    else base.unionByName(joined.filter(col(opCol) === "U")
      .select((lit("UP").as(opCol) +: keys.map(col)) ++
        cols.map(c => col(s"__o_$c").as(c)): _*))
  }

  /** Hygiene sweep for ORPHANED data dirs, OFFLINE form: deletes every
    * top-level data dir absent from ALL published manifests with no
    * grace window. An in-flight APPENDER or lock-free rewriter has
    * written dirs but not yet its manifest — exactly the orphan
    * signature — so this zero-grace form is safe only while no writers
    * are active (the same operational class as a quiesced
    * [[eraseKeys]]). For a LIVE fleet use the graced overload. */
  def vacuumOrphans(spark: SparkSession, path: String): Int =
    vacuumOrphans(spark, path, 0L)

  /** Reclaim data dirs referenced by NO published manifest — the leak
    * [[expireSnapshots]] cannot see (it computes doomed dirs from
    * expired manifests, and a never-published dir is in none). The
    * lock-free rewrite discipline is exactly what creates them: a merge
    * or compaction that CRASHES after its claim-named rewrites
    * (`<dir>-m<v>`, `compact-<v>`, `batch-<v>`, `merge-<v>`, …) but
    * before its publish leaves rewrite-sized dirs nothing will ever
    * reference or delete — at the 100 TB design point with a writer
    * fleet, an unbounded storage leak.
    *
    * `minAgeMs` is the GRACE WINDOW that distinguishes a crash's debris
    * from an in-flight writer's not-yet-published dirs: only dirs whose
    * NEWEST content mtime (the dir entry and its files — a rewrite
    * still receiving part files is young by construction) is older than
    * the window are reclaimed. The operator contract is the same as
    * Delta VACUUM's retention horizon: `minAgeMs` MUST exceed the
    * longest rewrite-plus-publish any writer runs, or the sweep can
    * eat a slow writer's pending dirs (its publish would then reference
    * deleted data). A listing failure on a candidate counts as "young"
    * — never delete blind. Holds the rewriter lock for the scan +
    * deletes (metadata cost), so the manifest set cannot move under the
    * sweep; rewriters' lock-free phases are unaffected and their short
    * critical sections just queue behind it. Returns dirs reclaimed. */
  def vacuumOrphans(spark: SparkSession, path: String,
      minAgeMs: Long): Int = {
    val fs = fsFor(spark, path)
    fs.mkdirs(snapDir(path))
    val lock = acquireRewriterLock(fs, path, "vacuumOrphans")
    try {
      val versions = fs.listStatus(snapDir(path)).toSeq
        .map(_.getPath.getName)
        .flatMap(numberedName(_, "v", ".list"))
      // Entries, not dirs: a live merge-on-read dv swept as an
      // "orphan" would resurrect every row it deletes.
      val referenced = versions
        .flatMap(v => manifestEntries(spark, path, v)
          .flatMap(e => e.dir +: e.dvs)).toSet
      sweepUnreferencedDirs(fs, path, referenced, minAgeMs).size
    } finally fs.delete(lock, false)
  }

  /** Newest modification time under `st` — RECURSIVE: Spark streams
    * part files into nested `_temporary/<attempt>` dirs whose
    * top-level entries' mtimes go stale while data still lands levels
    * deeper, so a one-level check would age-out an IN-FLIGHT rewrite
    * and the grace window would not actually protect it. A listing
    * failure reports "young" — never delete blind. */
  private def newestMtimeRecursive(fs: org.apache.hadoop.fs.FileSystem,
      st: org.apache.hadoop.fs.FileStatus): Long =
    try {
      var newest = st.getModificationTime
      val it = fs.listFiles(st.getPath, true)
      while (it.hasNext)
        newest = math.max(newest, it.next().getModificationTime)
      newest
    } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }

  /** Delete every top-level data dir absent from `referenced` whose
    * newest content mtime is older than `graceMs` (≤ 0 sweeps
    * unconditionally — the quiesced-writers contract). The ONE sweep
    * implementation behind [[vacuumOrphans]] and [[eraseKeys]]'
    * subject-byte pass — the grace logic is subtle enough that two
    * copies would silently diverge. */
  private def sweepUnreferencedDirs(fs: org.apache.hadoop.fs.FileSystem,
      path: String, referenced: Set[String], graceMs: Long): Seq[String] = {
    val now = System.currentTimeMillis()
    val doomed = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .toSeq.filter(_.isDirectory)
      // ALL underscore-prefixed paths are exempt, not just _snapshots:
      // they are the Spark/Hadoop hidden-path convention (invisible to
      // every reader) and legitimately unreferenced — _consumer change
      // cursors, in-flight _temporary trees. Sweeping a consumer's
      // cursor dir would silently reset its feed to the initial
      // snapshot.
      .filterNot(st => st.getPath.getName.startsWith("_"))
      .filterNot(st => referenced(st.getPath.getName))
      .filter(st => graceMs <= 0L ||
        now - newestMtimeRecursive(fs, st) >= graceMs)
      .map(_.getPath.getName)
    doomed.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(path, d), true)
      deleteDirSidecars(fs, path, d)
    }
    doomed
  }

  /** Test hook: runs between an erasure's (lock-free) rewrites and its
    * lock acquisition — the erase twin of [[mergePreLockHook]]. */
  private[graft] var erasePreLockHook: () => Unit = () => ()

  /** RIGHT-TO-BE-FORGOTTEN erasure: physically remove every row
    * matching `doomed`'s keys from EVERY version of the snapshot sink —
    * history included, which is the point: after this, no time-travel
    * read, delta read, or compaction can surface the subject again.
    * The destructive counterpart of the Privacy audits (they measure
    * structural leakage; this removes the subject).
    *
    * ONLINE against the writer fleet, with the merge/compaction
    * discipline: every dir holding a doomed key is rewritten
    * `<dir>-e<epoch>` (minus those keys, `.absorbed` provenance
    * preserved) LOCK-FREE; only the commit — staleness re-validation,
    * manifest repoints, original deletes, all metadata — holds the
    * exclusive rewriter lock. A rewriter racing the lock-free phase is
    * caught by the post-lock re-validation (its outputs are new
    * candidate dirs; the erase loops and processes them); a rewriter
    * racing the COMMIT sees its own staleness check fail (the repoints
    * replace dirs in the latest manifest) and retries off the
    * repointed truth. Version numbers and counts are unchanged:
    * erasure edits history in place rather than appending (an append
    * would leave the subject readable at older versions).
    *
    * APPENDERS (lock-free by design) are handled by a claim wait + a
    * repoint fixpoint: before deleting originals the commit waits out
    * fresh `v<N>.claim` markers (an in-flight appender may have read a
    * pre-repoint manifest) and re-repoints any manifest that appears
    * still referencing an original, until a listing pass is clean.
    * The residual window — an appender stalled longer than the wait
    * inside its claim→publish gap — leaves its manifest referencing a
    * deleted dir; pause appends during erasure for a strict guarantee
    * (rewriter-class ops need no pause). Manifest repointing is
    * delete+rename per version — a concurrent READER of that exact
    * version can catch the gap and should retry; the latest-version
    * read path re-resolves and is safe.
    *
    * `orphanGraceMs`: unreferenced dirs may hold the subject's bytes
    * too, so the commit sweeps orphans — but against a LIVE fleet an
    * in-flight rewrite looks exactly like an orphan, so only dirs
    * older than the grace are swept (same contract as
    * [[vacuumOrphans]]; 0 sweeps everything and implies quiesced
    * writers). Returns the number of rows erased. */
  def eraseKeys(spark: SparkSession, path: String, doomed: DataFrame,
                keys: Seq[String], orphanGraceMs: Long = 0L): Long =
      labeled(spark, "graft.erase") {
    val fs = fsFor(spark, path)
    fs.mkdirs(snapDir(path))
    require(latestVersion(spark, path) >= 1,
      s"no snapshot to erase from at $path")
    val keyRows = doomed.select(keys.map(col): _*).distinct()
      .localCheckpoint()
    // One bounded collect gives ranges + bloom canons for every prune
    // in the erase loop (the probe never changes across attempts).
    val (doomedPr, doomedCanons, _) = probeFacts(keyRows, keys)
    def listVersions(): Seq[(Int, Seq[SnapEntry])] =
      fs.listStatus(snapDir(path)).toSeq.map(_.getPath.getName)
        .flatMap(numberedName(_, "v", ".list"))
        .sorted.map(v => v -> manifestEntries(spark, path, v))
    // The erase universe includes merge-on-read DV DIRS: a dv holds the
    // subject's KEY VALUES (a record that the subject existed) — "the
    // data is gone" covers them. A dv rewrite minus the doomed keys is
    // consistent: the matching data rows are physically erased in the
    // same commit, so their tombstones have nothing left to hide.
    // Probes and rewrites treat them exactly like data dirs (their
    // schema IS the key columns); the erased-row count excludes them
    // (a tombstone is not a data row).
    val dvNames = scala.collection.mutable.Set.empty[String]
    def namesOf(es: Seq[SnapEntry]): Seq[String] = {
      es.foreach(e => dvNames ++= e.dvs)
      es.flatMap(e => e.dir +: e.dvs).distinct
    }
    // dir → (rewrite name if it held doomed keys, rows hit). Probed
    // dirs are immutable, so results carry across retries.
    val processed =
      scala.collection.mutable.LinkedHashMap.empty[String, (Option[String], Long)]
    val myClaims = scala.collection.mutable.ListBuffer.empty[Int]
    def cleanupRewrites(): Unit =
      processed.values.foreach(_._1.foreach { rw =>
        fs.delete(new org.apache.hadoop.fs.Path(path, rw), true)
        deleteDirSidecars(fs, path, rw)
      })
    // NOTE the claim markers from each attempt STAY on disk: they are
    // what keeps each epoch unique across every past and concurrent
    // operation (deleting one would let the next claimant reuse the
    // number — colliding `-e<epoch>` dir names and, worse, the
    // `gen-<epoch>.touch` marker, silently losing a generation bump).
    // One skipped version number per attempt, by construction;
    // [[expireSnapshots]] sweeps them once later publishes pass.
    var attempts = 0
    while (attempts < 7) {
        // ── Phase 1, LOCK-FREE: probe + rewrite new candidates ──────
        // A claimed (never-published) version number makes each
        // attempt's epoch unique across every concurrent operation
        // with zero new state formats (two racing erasures must not
        // write the same `-e` name).
        val epoch = claimVersion(spark, path)
        myClaims += epoch
        val perVersion = listVersions()
        val allDirs = namesOf(perVersion.flatMap(_._2))
        val candidates = pruneDirs(spark, path,
          allDirs.filterNot(processed.contains), keys, keyRows,
          Some(doomedPr), doomedCanons)
        candidates.foreach { d =>
          val df = spark.read.option("mergeSchema", "true")
            .parquet(s"$path/$d")
          // Bounded hit PROBE (pushed bounding box + semi join)
          // decides whether the dir rewrites at all.
          val probeSide = probeRangeFilter(df.schema, doomedPr)
            .map(df.filter).getOrElse(df)
          val hit = probeSide.join(keyRows, keys, "left_semi").count()
          if (hit == 0) processed(d) = (None, 0L)
          else {
            val rw = s"$d-e$epoch"
            df.join(keyRows, keys, "left_anti")
              .write.mode("overwrite").parquet(s"$path/$rw")
            val out = fs.create(absorbedPath(path, rw), true)
            try out.write(provenance(spark, path, d).toSeq.sorted
              .mkString("\n").getBytes("UTF-8"))
            finally out.close()
            val statKeys0 = recordedKeyCols(spark, path)
            writeKeyStats(spark, path, rw,
              if (statKeys0.nonEmpty) statKeys0 else keys)
            processed(d) = (Some(rw), hit)
          }
        }
        erasePreLockHook()
        // ── Phase 2, LOCKED: validate + metadata commit ─────────────
        val lock = try acquireRewriterLock(fs, path, "eraseKeys")
          catch { case e: LockHeldException =>
            cleanupRewrites(); throw e
          }
        var done = false
        var erased = 0L
        try {
          val perVersionNow = listVersions()
          val liveDirs = namesOf(perVersionNow.flatMap(_._2))
          val liveSet = liveDirs.toSet
          // A rewriter replaced a processed original: our rewrite of
          // it is junk (the replacement shows up as a new candidate).
          val stale = processed.keys.filterNot(liveSet).toList
          stale.foreach { d =>
            processed(d)._1.foreach { rw =>
              fs.delete(new org.apache.hadoop.fs.Path(path, rw), true)
              deleteDirSidecars(fs, path, rw)
            }
            processed.remove(d)
          }
          val newWork = pruneDirs(spark, path,
            liveDirs.filterNot(processed.contains), keys, keyRows,
            Some(doomedPr), doomedCanons)
          if (newWork.isEmpty) {
            val renames = processed.collect {
              case (d, (Some(rw), _)) => d -> rw }.toMap
            erased = processed.collect {
              case (d, (Some(_), h)) if !dvNames.contains(d) => h }.sum
            def repoint(vs: Seq[(Int, Seq[SnapEntry])]): Boolean = {
              var any = false
              vs.foreach { case (v, entries) =>
                if (entries.exists(e => renames.contains(e.dir) ||
                    e.dvs.exists(renames.contains))) {
                  any = true
                  // Entry-aware: the dir AND its dv references repoint
                  // together (a dv rewritten minus the doomed keys
                  // keeps applying to every version that listed it).
                  val newList = entries.map(e => SnapEntry(
                    renames.getOrElse(e.dir, e.dir),
                    e.dvs.map(n => renames.getOrElse(n, n)).sorted)
                    .line)
                  val tmp = new org.apache.hadoop.fs.Path(snapDir(path),
                    s"v$v.list.tmp")
                  val out = fs.create(tmp, true)
                  try out.write(newList.mkString("\n").getBytes("UTF-8"))
                  finally out.close()
                  val dst = new org.apache.hadoop.fs.Path(snapDir(path),
                    s"v$v.list")
                  fs.delete(dst, false)
                  if (!fs.rename(tmp, dst)) throw new java.io.IOException(
                    s"eraseKeys: manifest repoint failed for v$v at " +
                      s"$path — restore from the rewritten dirs before " +
                      "serving reads")
                }
              }
              any
            }
            if (renames.nonEmpty) {
              touchRewriteGen(spark, path, epoch)
              // Erasure-specific marker ([[eraseGen]]): feed-driven
              // consumers recompute ONLY on in-place history edits,
              // not on every merge. Same not-best-effort contract as
              // the gen marker — a swallowed failure here lets a feed
              // consumer silently retain the erased subject's sums.
              fs.create(new org.apache.hadoop.fs.Path(snapDir(path),
                s"erase-$epoch.touch"), true).close()
              repoint(perVersionNow)
              // Claim wait: an appender inside claim→publish read a
              // pre-repoint manifest and may publish dirs we are about
              // to delete. Fresh foreign claims get a bounded window
              // to publish (their manifests then hit the fixpoint
              // below); stale claims are crashed writers and don't
              // block.
              val deadline = System.currentTimeMillis() + 5000
              var waiting = true
              while (waiting && System.currentTimeMillis() < deadline) {
                val now = System.currentTimeMillis()
                val freshClaims = fs.listStatus(snapDir(path)).toSeq
                  .filter { st =>
                    val n = st.getPath.getName
                    // Malformed claim names (operator debris) are
                    // ignored, not thrown on: a NumberFormatException
                    // here lands mid-commit — after the repoints,
                    // before the original deletes — aborting the
                    // erasure. Same Try discipline as consumeChanges'
                    // marker parse.
                    n.startsWith("v") && n.endsWith(".claim") &&
                      scala.util.Try(n.stripPrefix("v")
                        .stripSuffix(".claim").toInt).toOption
                        .exists(!myClaims.contains(_)) &&
                      now - st.getModificationTime < 60000
                  }
                if (freshClaims.isEmpty) waiting = false
                else Thread.sleep(100)
              }
              // Fixpoint: repoint manifests published since (or missed)
              // until a listing pass references no original.
              var fix = 0
              while (repoint(listVersions()) && fix < 20) fix += 1
              if (fix >= 20) throw new IllegalStateException(
                s"eraseKeys: manifests kept re-referencing pre-erase " +
                  s"dirs at $path — appender storm; originals left in " +
                  "place (sink consistent, subject NOT yet erased); " +
                  "quiesce appends and rerun")
              // Per-dir profiles survive erasure BY CONSTRUCTION
              // (rewrites were stamped fresh ones; deleted dirs lose
              // theirs below) — only the legacy r17 version-keyed
              // profiles are swept, plus every change record: their
              // D/update-pre rows hold PRE-IMAGES, possibly the
              // subject's ("the data is gone" covers them; the feed
              // falls back to the key-diff over erased content).
              fs.listStatus(snapDir(path)).toSeq.map(_.getPath.getName)
                .filter(n => (n.startsWith("v") && n.endsWith(".profile")) ||
                  n.contains(".changes"))
                .foreach { n =>
                  fs.delete(new org.apache.hadoop.fs.Path(snapDir(path), n),
                    true)
                }
              // Physical deletion LAST, after every manifest stopped
              // referencing the originals: a crash before this point
              // leaves a consistent (partially repointed) sink plus
              // extra copies to re-erase; a crash after never dangles.
              renames.keys.foreach { d =>
                fs.delete(new org.apache.hadoop.fs.Path(path, d), true)
                deleteDirSidecars(fs, path, d)
              }
            }
            // Orphan sweep: unreferenced dirs may hold subject bytes.
            // Grace-filtered against a live fleet (an in-flight rewrite
            // looks exactly like an orphan); 0 = quiesced contract.
            sweepUnreferencedDirs(fs, path,
              namesOf(listVersions().flatMap(_._2)).toSet, orphanGraceMs)
            done = true
          }
        } finally fs.delete(lock, false)
        if (done) {
          lastProbedDirs.set(processed.keys.toSeq)
          return erased
        }
        attempts += 1
      }
      cleanupRewrites()
      throw new IllegalStateException(
        s"eraseKeys: new rewrites kept appearing under us 7 times at " +
          s"$path — rewriter storm; retry when merges/compactions quiesce")
  }

  // ── incremental aggregate maintenance ───────────────────────────

  private def srcMarkerPath(aggPath: String, aggVersion: Int) =
    new org.apache.hadoop.fs.Path(snapDir(aggPath), s"v$aggVersion.src")

  /** Marker payload (shared by the `.src` and `.feed` coverage
    * markers): covered source version + a source fingerprint at
    * counting time (absent on legacy markers). A fingerprint mismatch
    * means counted rows were mutated out from under the marker's
    * reasoning — the owner recomputes. */
  private def readCoverageMarker(spark: SparkSession, aggPath: String,
      m: org.apache.hadoop.fs.Path): (Int, Option[String]) = {
    val fs = fsFor(spark, aggPath)
    if (!fs.exists(m)) return (0, None)
    val in = fs.open(m)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    // Try-guarded: a crash-truncated or corrupted first line must read
    // as UNKNOWN coverage — (0, None) — which the refresh answers with
    // a recompute, the design's degrade. A bare .toInt here threw
    // NumberFormatException from every later refresh on this aggregate
    // forever (until the marker was hand-deleted).
    (lines.headOption.flatMap(h =>
        scala.util.Try(h.trim.toInt).toOption).getOrElse(0),
      lines.drop(1).headOption.map(_.trim).filter(_.nonEmpty))
  }

  private def writeCoverageMarker(spark: SparkSession, aggPath: String,
      m: org.apache.hadoop.fs.Path, srcVersion: Int, gen: String): Unit = {
    val fs = fsFor(spark, aggPath)
    // tmp + rename: the marker is read by every later refresh, so a
    // crash mid-write must leave either the old marker or none (both
    // degrade to recompute), never a truncated line. The delete→rename
    // window reads as "no marker" — same safe degrade.
    val tmp = new org.apache.hadoop.fs.Path(m.getParent, m.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$srcVersion\n$gen".getBytes("UTF-8")) finally out.close()
    fs.delete(m, false)
    if (!fs.rename(tmp, m)) {
      // A filesystem refusing the rename (already-exists race) keeps
      // the tmp as debris; the marker stays absent → recompute.
      fs.delete(tmp, false)
    }
  }

  private def readSrcMarker(spark: SparkSession, aggPath: String,
      aggVersion: Int): (Int, Option[String]) =
    readCoverageMarker(spark, aggPath, srcMarkerPath(aggPath, aggVersion))

  private def writeSrcMarker(spark: SparkSession, aggPath: String,
      aggVersion: Int, srcVersion: Int, gen: String): Unit =
    writeCoverageMarker(spark, aggPath, srcMarkerPath(aggPath, aggVersion),
      srcVersion, gen)

  /** The source version the CURRENT aggregate snapshot covers: the
    * latest published agg version's `.src` marker, or 0 when there is
    * none — fresh sink, pre-maintenance sink, or the crash window
    * between a publish and its marker write (all of which
    * [[refreshAggregate]] answers with a full recompute, the
    * correctness-preserving fallback). */
  def aggregateCoveredVersion(spark: SparkSession, aggPath: String): Int = {
    val v = latestVersion(spark, aggPath)
    if (v == 0) return 0
    readSrcMarker(spark, aggPath, v)._1
  }

  /** NULL group keys are REFUSED, loudly, riding the aggregate output
    * (group-count rows, zero extra scans): mergeSnapshot's key joins
    * are null-rejecting, so an incremental refresh could never update
    * or delete a NULL group — it would append a fresh row NEXT TO the
    * stale one, silently duplicating the group forever. Coalesce group
    * columns to a sentinel upstream when NULL groups are meaningful.
    * The ONE guard behind both aggregate maintainers. */
  private def refuseNullGroups(df: DataFrame, groupCols: Seq[String],
      op: String): DataFrame =
    groupCols.foldLeft(df) { (d, k) =>
      d.withColumn(k, when(col(k).isNull, raise_error(lit(
        s"$op: NULL in group column '$k' — the aggregate sink's key " +
          "joins are null-rejecting, so a NULL group can never be " +
          "updated or deleted; coalesce to a sentinel upstream"))
        .cast(df.schema(k).dataType))
        .otherwise(col(k)))
    }

  /** Test/ops audit of the last [[refreshAggregate]]: `"noop"`,
    * `"recompute"`, or `"incremental:<dir,dir,…>"` naming exactly the
    * source dirs the delta read opened. */
  private[graft] val lastRefresh =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  /** INCREMENTAL MATERIALIZED AGGREGATE: bring the grouped-aggregate
    * snapshot at `aggPath` (per `groupCols`: row count `n` + exact
    * decimal `sum_v` of `valueCol`) up to date with the APPEND-ONLY
    * source snapshot at `srcPath`, reading ONLY the source versions the
    * aggregate hasn't seen. Each refresh publishes one aggregate
    * version via the copy-on-write merge — U rows for the groups the
    * delta touched, nothing else rewrites — and records the covered
    * source version in a `v<N>.src` marker next to the manifest.
    *
    * The 100 TB point: a refresh costs (delta scan + one group
    * shuffle + a merge that rewrites only touched-group dirs), never a
    * full recompute of the source — the materialized-view maintenance
    * loop a warehouse runs continuously. Returns the published agg
    * version (or the current one when already up to date).
    *
    * Exactly-once arithmetic across crashes: the marker is written
    * AFTER its version publishes, so the only bad window leaves a
    * published version with no marker — [[aggregateCoveredVersion]]
    * reads that as "coverage unknown" and the next refresh recomputes
    * from the FULL source (idempotent in content), never double-adds a
    * delta. Deltas are additionally validated for PURITY before use:
    * a dir renamed out of the manifest (merge/erasure rewrite) or a
    * new dir whose provenance overlaps the covered coverage (reconcile
    * rewrite, compaction) means the name diff is not an append — the
    * refresh detects it and recomputes instead of double-counting.
    * Sums are exact decimals (DECIMAL(28,6) over the cast input), so
    * increment-then-read equals recompute bit-for-bit. */
  def refreshAggregate(spark: SparkSession, srcPath: String,
                       aggPath: String, groupCols: Seq[String],
                       valueCol: String): Int =
      labeled(spark, "graft.refreshAgg") {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val srcLatest = latestVersion(spark, srcPath)
    require(srcLatest >= 1, s"no source snapshot at $srcPath")
    val aggCur = latestVersion(spark, aggPath)
    val (covered0, gen0) = if (aggCur == 0) (0, None)
                           else readSrcMarker(spark, aggPath, aggCur)
    // Generation fingerprint read FIRST: a rewrite landing between this
    // read and the data read makes the recorded gen stale, which the
    // NEXT refresh answers with a recompute — conservative, never
    // double-counts. Legacy markers (no gen line) only trust the name
    // diff when the source has never seen a content rewrite at all.
    val genNow = rewriteGen(spark, srcPath)
    val genOk = gen0 match {
      case Some(g) => g == genNow
      case None => genNow == "0:0"
    }
    if (covered0 == srcLatest && genOk) { lastRefresh.set("noop"); return aggCur }
    // Delta PURITY classification. The incremental path is sound when
    // the latest manifest splits cleanly into (a) CARRIERS of exactly
    // the counted content — dirs of the covered manifest verbatim
    // (immutable), or `compact-*` repackagings (content-preserving by
    // construction, trustworthy because the generation fingerprint
    // proves no merge/erase/heal ran since counting) — and (b) FRESH
    // dirs whose provenance is disjoint from the covered coverage. A
    // compaction that straddles counted and uncounted rows (absorbed an
    // uncounted append) is mixed → recompute; so is a dropped counted
    // root or an expired covered manifest. The r15 shape — any rename
    // forces recompute — kept routine compaction from ever staying
    // incremental, defeating the operator's own 100 TB story.
    val freshDirs: Option[Seq[String]] =
      if (covered0 == 0 || !genOk) None
      else {
        val srcFs = fsFor(spark, srcPath)
        if (!srcFs.exists(new org.apache.hadoop.fs.Path(snapDir(srcPath),
            s"v$covered0.list"))) None
        else {
          val cDirs = manifestDirs(spark, srcPath, covered0)
          val lDirs = manifestDirs(spark, srcPath, srcLatest)
          val cCov = coverage(spark, srcPath, cDirs)
          val counted = lDirs.filter(d =>
            provenance(spark, srcPath, d).subsetOf(cCov))
          val fresh = lDirs.filter(d =>
            provenance(spark, srcPath, d).intersect(cCov).isEmpty)
          val mixed = lDirs.exists(d =>
            !counted.contains(d) && !fresh.contains(d))
          // Pristine compact names ONLY: "compact-5-m9" (a merge
          // rewrite of a pack) is content-changing — the generation
          // fingerprint already forces a recompute when one exists,
          // but the name test must not vouch for it independently.
          val pristineCompact = "^compact-\\d+$".r
          val carriersOk = counted.forall(d =>
            cDirs.contains(d) || pristineCompact.findFirstIn(d).isDefined)
          val allCarried = cCov.subsetOf(
            coverage(spark, srcPath, counted))
          if (!mixed && carriersOk && allCarried) Some(fresh) else None
        }
      }
    // sum_v is pinned to DECIMAL(28,6) on EVERY path (Spark's sum
    // widens to (38,6); a bootstrap at one precision and increments at
    // another would make the union read's decimal types conflict).
    // min_v/max_v ride along: both are MERGEABLE under append-only
    // increments (least/greatest of old and delta), and every
    // non-append mutation already lands on the recompute path via the
    // generation fingerprint — exactly the split that makes them safe.
    //
    // APPROX-DISTINCT rides as a per-group KMV sketch (`kmv`: the k
    // smallest md5 fingerprints of the group's DISTINCT values — the
    // same sketch family as the drift-gate profiles): a set-valued
    // fact of the data, so union-then-recap of two groups' sketches IS
    // the sketch of their union — the increment equals the recompute
    // BIT-FOR-BIT, and the estimate (`distinct_v`) is EXACT while the
    // group's distinct count stays below k (= ProfileK). The per-group
    // build is bounded: distinct (group, fp) pairs then a top-k window
    // — never a collect_set (unbounded per group at 100 TB).
    val vCanon: DataFrame => org.apache.spark.sql.Column = { df =>
      import org.apache.spark.sql.types.{DateType, TimestampType}
      df.schema(valueCol).dataType match {
        case TimestampType => unix_micros(col(valueCol)).cast("string")
        case DateType => unix_date(col(valueCol)).cast("string")
        case _ => col(valueCol).cast("string")
      }
    }
    val emptyKmv = array().cast("array<string>")
    def kmvOf(df: DataFrame): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select((groupCols.map(col) :+ md5(vCanon(df)).as("__fp")): _*)
        .distinct()
        .withColumn("__rn", row_number().over(Window
          .partitionBy(groupCols.map(col): _*).orderBy(col("__fp"))))
        .filter(col("__rn") <= ProfileK).drop("__rn")
        .groupBy(groupCols.map(col): _*)
        .agg(sort_array(collect_list(col("__fp"))).as("kmv"))
    // The estimator mirrors [[kmvDistinct]]: exact below k; else
    // (k-1) / (kth fingerprint's unit-interval position).
    def kmvEst(kmvCol: org.apache.spark.sql.Column) =
      when(size(kmvCol) < ProfileK, size(kmvCol).cast("long"))
        .otherwise(round(lit((ProfileK - 1).toDouble * ProfileHexNorm) /
          conv(substring(element_at(kmvCol, ProfileK), 1, 15),
            16, 10).cast("double")).cast("long"))
    def aggOf(df: DataFrame): DataFrame = {
      val agg = df.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("n"),
          sum(col(valueCol).cast(dec)).cast(dec).as("sum_v"),
          min(col(valueCol).cast(dec)).as("min_v"),
          max(col(valueCol).cast(dec)).as("max_v"))
        .join(kmvOf(df), groupCols, "left")
        .withColumn("kmv", coalesce(col("kmv"), emptyKmv))
        .withColumn("distinct_v", kmvEst(col("kmv")))
      refuseNullGroups(agg, groupCols, "refreshAggregate")
    }
    val published = freshDirs match {
      case Some(Nil) =>
        // Pure repackaging (compaction, nothing else): content already
        // covered — re-stamp the marker on the CURRENT agg version and
        // publish nothing.
        lastRefresh.set("noop")
        writeSrcMarker(spark, aggPath, aggCur, srcLatest, genNow)
        return aggCur
      case Some(dirs) =>
        val curAgg = readSnapshot(spark, aggPath, aggCur)
        if (!curAgg.columns.contains("min_v") ||
            !curAgg.columns.contains("kmv")) {
          // Pre-min/max or pre-kmv aggregate sink: one recompute
          // upgrades every group to the full stat schema, then
          // increments resume.
          lastRefresh.set("recompute")
          val full = aggOf(readSnapshot(spark, srcPath, srcLatest))
          mergeSnapshot(spark, aggPath, full.withColumn("__op", lit("U")),
            groupCols, groupCols, "__op")
        } else {
          lastRefresh.set(s"incremental:${dirs.mkString(",")}")
          val delta = spark.read.option("mergeSchema", "true")
            .parquet(dirs.map(d => s"$srcPath/$d"): _*)
          val deltaAgg = aggOf(delta).drop("distinct_v")
            .withColumnRenamed("n", "__dn").withColumnRenamed("sum_v", "__ds")
            .withColumnRenamed("min_v", "__dmin")
            .withColumnRenamed("max_v", "__dmax")
            .withColumnRenamed("kmv", "__dkmv")
          val cur = curAgg.select((groupCols.map(col) :+ col("n") :+
            col("sum_v") :+ col("min_v") :+ col("max_v") :+
            col("kmv")): _*)
          // KMV union-then-recap: the k smallest of A∪B all lie in
          // (k smallest of A) ∪ (k smallest of B), so the re-capped
          // union IS the sketch a recompute would build — increments
          // and recomputes agree bit-for-bit on append-pure deltas
          // (everything else already recomputes via the generation).
          val mergedKmv = slice(sort_array(array_distinct(concat(
            coalesce(col("kmv"), emptyKmv), col("__dkmv")))),
            1, ProfileK)
          val changes = deltaAgg.join(cur, groupCols, "left")
            .select((groupCols.map(col) :+
              (coalesce(col("n"), lit(0L)) + col("__dn")).as("n") :+
              // BOTH sides null-coalesced: a delta whose every row has
              // a NULL value yields __ds = NULL, and `sum_v + NULL`
              // would wipe the previously accumulated sum while n
              // still increments. NULL survives only when NEITHER side
              // has a value — matching what a recompute's sum() gives.
              when(col("sum_v").isNull && col("__ds").isNull,
                lit(null).cast(dec))
                .otherwise(coalesce(col("sum_v"), lit(0).cast(dec)) +
                  coalesce(col("__ds"), lit(0).cast(dec)))
                .cast(dec).as("sum_v") :+
              // least/greatest skip NULLs: a brand-new group takes the
              // delta's bound verbatim.
              least(col("min_v"), col("__dmin")).as("min_v") :+
              greatest(col("max_v"), col("__dmax")).as("max_v") :+
              mergedKmv.as("kmv") :+
              kmvEst(mergedKmv).as("distinct_v") :+
              lit("U").as("__op")): _*)
          mergeSnapshot(spark, aggPath, changes, groupCols, groupCols, "__op")
        }
      case None =>
        // Bootstrap OR unknown/impure coverage: full recompute. For a
        // fresh sink this is writeSnapshot. For an existing sink the
        // merge's U rows overwrite every surviving group AND groups no
        // longer present in the source (an erasure or delete-merge can
        // empty a group entirely) get explicit D ops — without them the
        // stale row would survive forever, retaining an erased
        // subject's sums.
        lastRefresh.set("recompute")
        val full = aggOf(readSnapshot(spark, srcPath, srcLatest))
        if (aggCur == 0)
          writeSnapshot(spark, aggPath, full, groupCols, groupCols)
        else {
          val gone = readSnapshot(spark, aggPath, aggCur)
            .select(groupCols.map(col): _*)
            .join(full.select(groupCols.map(col): _*), groupCols, "left_anti")
            .withColumn("n", lit(null).cast("long"))
            .withColumn("sum_v", lit(null).cast(dec))
            .withColumn("min_v", lit(null).cast(dec))
            .withColumn("max_v", lit(null).cast(dec))
            .withColumn("kmv", lit(null).cast("array<string>"))
            .withColumn("distinct_v", lit(null).cast("long"))
          mergeSnapshot(spark, aggPath,
            full.withColumn("__op", lit("U"))
              .unionByName(gone.withColumn("__op", lit("D"))),
            groupCols, groupCols, "__op")
        }
    }
    writeSrcMarker(spark, aggPath, published, srcLatest, genNow)
    published
  }

  // ── feed-driven aggregate maintenance (the CDC downstream) ──────

  private def feedMarkerPath(aggPath: String, aggVersion: Int) =
    new org.apache.hadoop.fs.Path(snapDir(aggPath), s"v$aggVersion.feed")

  private def readFeedMarker(spark: SparkSession, aggPath: String,
      aggVersion: Int): (Int, Option[String]) =
    readCoverageMarker(spark, aggPath, feedMarkerPath(aggPath, aggVersion))

  private def writeFeedMarker(spark: SparkSession, aggPath: String,
      aggVersion: Int, srcVersion: Int, egen: String): Unit =
    writeCoverageMarker(spark, aggPath,
      feedMarkerPath(aggPath, aggVersion), srcVersion, egen)

  /** Test/ops audit of the last [[refreshAggregateFromFeed]]:
    * `"noop"`, `"recompute"`, or `"feed:<from>-><to>"` naming the span
    * the incremental apply consumed. */
  private[graft] val lastFeedRefresh =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  /** Test/ops audit: groups the last feed apply POINT-RECOMPUTED
    * because a departing value touched their maintained min/max
    * (−1 when the last call was not a feed apply). */
  private[graft] val lastFeedBoundRecomputed =
    new java.util.concurrent.atomic.AtomicReference[Long](-1L)

  /** CHANGE-FEED-DRIVEN MATERIALIZED AGGREGATE — the downstream half
    * of the CDC loop: bring the grouped aggregate at `aggPath` (per
    * `groupCols`: row count `n`, non-null value count `n_val`, exact
    * decimal `sum_v` of `valueCol`) up to date with the snapshot sink
    * at `srcPath` by consuming its change feed, NOT by re-reading the
    * source. Where [[refreshAggregate]]'s increments cover only
    * append-pure deltas (any merge forces a recompute via the rewrite
    * generation), this consumes the exact I/U/D span — WITH update
    * pre-images ([[snapshotChangesWithPreImages]]) — so merges,
    * deletes and compactions all apply incrementally: subtract the
    * D/pre-image side, add the I/post-image side, point-read only the
    * touched groups ([[readSnapshotForKeys]] pruning), publish one
    * merge whose U rows are the touched groups and whose D rows are
    * the groups the span emptied.
    *
    * min/max ARE maintained (`min_v`/`max_v`), optimistically: arrivals
    * extend a bound for free (`least`/`greatest`); a bound only ever
    * RETREATS when some departing value (D or update pre-image) equals
    * it — a max is not decrement-invertible, so exactly those groups
    * are point-recomputed from the source ([[readSnapshotForKeys]] on
    * the group columns — one bounded read), and every other group
    * stays pure arithmetic. [[lastFeedBoundRecomputed]] audits the
    * recomputed-group count. An aggregate sink bootstrapped before
    * bounds existed (no `min_v` column) recomputes once and carries
    * them from then on.
    *
    * Exactly-once arithmetic across crashes, sink-as-state: the
    * covered source version + the source's ERASURE fingerprint
    * ([[eraseGen]] — the one op that edits a span's endpoints in
    * place, making the feed blind) ride a `v<N>.feed` marker written
    * AFTER its aggregate version publishes; the only crash window
    * leaves a published version with no marker, which the next refresh
    * answers with a full recompute — idempotent in content, never a
    * double-add. Returns the published (or current) agg version. */
  def refreshAggregateFromFeed(spark: SparkSession, srcPath: String,
      srcKeys: Seq[String], aggPath: String, groupCols: Seq[String],
      valueCol: String): Int =
      labeled(spark, "graft.refreshAggFeed") {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val srcLatest = latestVersion(spark, srcPath)
    require(srcLatest >= 1, s"no source snapshot at $srcPath")
    val aggCur = latestVersion(spark, aggPath)
    val (covered, egen0) = if (aggCur == 0) (0, None)
                           else readFeedMarker(spark, aggPath, aggCur)
    require(covered <= srcLatest,
      s"refreshAggregateFromFeed: marker covers v$covered but the " +
        s"source's latest is v$srcLatest — wrong source or rolled-back " +
        "history")
    val egenNow = eraseGen(spark, srcPath)
    val genOk = egen0.contains(egenNow)
    def aggOf(df: DataFrame): DataFrame = refuseNullGroups(
      df.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("n"),
          count(col(valueCol)).as("n_val"),
          sum(col(valueCol).cast(dec)).cast(dec).as("sum_v"),
          min(col(valueCol)).as("min_v"),
          max(col(valueCol)).as("max_v")),
      groupCols, "refreshAggregateFromFeed")
    lastFeedBoundRecomputed.set(-1L)
    if (covered == srcLatest && genOk) {
      lastFeedRefresh.set("noop"); return aggCur
    }
    val srcFs = fsFor(spark, srcPath)
    val coveredLive = covered >= 1 && srcFs.exists(
      new org.apache.hadoop.fs.Path(snapDir(srcPath), s"v$covered.list"))
    // A sink maintained before bounds existed migrates by one
    // recompute (its rows carry no min_v to extend or test against).
    val hasBounds = aggCur == 0 ||
      snapshotLogicalSchema(spark, aggPath, aggCur)
        .fieldNames.contains("min_v")
    val published =
      if (covered == 0 || !genOk || !coveredLive || !hasBounds) {
        // Bootstrap, post-erasure, expired-from-version, bounds
        // migration, or the crash window (published agg version with
        // no marker): full recompute — idempotent in content.
        lastFeedRefresh.set("recompute")
        val full = aggOf(readSnapshot(spark, srcPath, srcLatest))
        val vType = full.schema("min_v").dataType
        if (aggCur == 0)
          writeSnapshot(spark, aggPath, full, groupCols, groupCols)
        else {
          val gone = readSnapshot(spark, aggPath, aggCur)
            .select(groupCols.map(col): _*)
            .join(full.select(groupCols.map(col): _*), groupCols,
              "left_anti")
            .withColumn("n", lit(null).cast("long"))
            .withColumn("n_val", lit(null).cast("long"))
            .withColumn("sum_v", lit(null).cast(dec))
            .withColumn("min_v", lit(null).cast(vType))
            .withColumn("max_v", lit(null).cast(vType))
          mergeSnapshot(spark, aggPath,
            full.withColumn("__op", lit("U"))
              .unionByName(gone.withColumn("__op", lit("D")),
                allowMissingColumns = true),
            groupCols, groupCols, "__op")
        }
      } else {
        val span = snapshotChangesWithPreImages(spark, srcPath,
          covered, srcLatest, srcKeys, opCol = "__op")
        val vType = span.schema(valueCol).dataType
        // Signed apply: I and U (post-image) add, D and UP (the
        // update's pre-image) subtract — the two U rows per updated
        // key are exactly what moves a value between groups. Arriving
        // values also carry bound CANDIDATES (__amin/__amax);
        // departing values carry the bound-TOUCH probes
        // (__rmin/__rmax — a departure strictly inside the bounds can
        // never move them).
        val arriving = col("__op").isin("I", "U")
        val sgn = when(arriving, lit(1L)).otherwise(lit(-1L))
        val delta = refuseNullGroups(span.groupBy(groupCols.map(col): _*)
          .agg(sum(sgn).as("__dn"),
            sum(when(col(valueCol).isNotNull, sgn).otherwise(0L))
              .as("__dnv"),
            sum(when(col(valueCol).isNotNull,
                sgn.cast(dec) * col(valueCol).cast(dec))
              .otherwise(lit(0).cast(dec))).cast(dec).as("__ds"),
            min(when(arriving, col(valueCol))).as("__amin"),
            max(when(arriving, col(valueCol))).as("__amax"),
            min(when(!arriving, col(valueCol))).as("__rmin"),
            max(when(!arriving, col(valueCol))).as("__rmax")),
          groupCols, "refreshAggregateFromFeed")
          .localCheckpoint()
        if (delta.isEmpty) {
          // A span with no net change (idempotent replays, pure
          // repackagings): advance the marker, publish nothing.
          lastFeedRefresh.set("noop")
          writeFeedMarker(spark, aggPath, aggCur, srcLatest, egenNow)
          return aggCur
        }
        lastFeedRefresh.set(s"feed:$covered->$srcLatest")
        // Only the TOUCHED groups are read back — a point read that
        // prunes to the dirs those group keys can live in.
        val cur = readSnapshotForKeys(spark, aggPath, aggCur, delta,
            groupCols)
          .select((groupCols.map(col) :+ col("n") :+ col("n_val") :+
            col("sum_v") :+ col("min_v") :+ col("max_v")): _*)
        val joined = delta.join(cur, groupCols, "left")
        // Bound retreat: a departing value EQUAL to the maintained
        // bound (departures cannot lie outside it) — just those
        // groups recompute from the source; everyone else is
        // arithmetic.
        val touch = (col("__rmin").isNotNull &&
          (col("__rmin") <=> col("min_v") ||
            col("__rmax") <=> col("max_v")))
        // Lazy checkpoint: the count below materializes the blocks in
        // the same job instead of paying a separate checkpoint pass.
        val touchedKeys = joined.filter(touch)
          .select(groupCols.map(col): _*).localCheckpoint(false)
        val nTouched = touchedKeys.count()
        lastFeedBoundRecomputed.set(nTouched)
        val nNew = coalesce(col("n"), lit(0L)) + col("__dn")
        val nvNew = coalesce(col("n_val"), lit(0L)) + col("__dnv")
        val untouched = joined.filter(!touch)
          .select((groupCols.map(col) :+
            nNew.as("n") :+ nvNew.as("n_val") :+
            when(nvNew === 0L, lit(null).cast(dec))
              .otherwise(coalesce(col("sum_v"), lit(0).cast(dec)) +
                col("__ds")).cast(dec).as("sum_v") :+
            when(nvNew === 0L, lit(null).cast(vType))
              .otherwise(least(col("min_v"), col("__amin")))
              .as("min_v") :+
            when(nvNew === 0L, lit(null).cast(vType))
              .otherwise(greatest(col("max_v"), col("__amax")))
              .as("max_v") :+
            when(nNew <= 0L, "D").otherwise("U").as("__op")): _*)
        val changes =
          if (nTouched == 0L) untouched
          else {
            val recomputed = aggOf(readSnapshotForKeys(spark, srcPath,
              srcLatest, touchedKeys, groupCols))
            val emptied = touchedKeys
              .join(recomputed.select(groupCols.map(col): _*),
                groupCols, "left_anti")
              .withColumn("n", lit(null).cast("long"))
              .withColumn("n_val", lit(null).cast("long"))
              .withColumn("sum_v", lit(null).cast(dec))
              .withColumn("min_v", lit(null).cast(vType))
              .withColumn("max_v", lit(null).cast(vType))
            untouched
              .unionByName(recomputed.withColumn("__op", lit("U")))
              .unionByName(emptied.withColumn("__op", lit("D")))
          }
        mergeSnapshot(spark, aggPath, changes, groupCols, groupCols,
          "__op")
      }
    writeFeedMarker(spark, aggPath, published, srcLatest, egenNow)
    published
  }
}
