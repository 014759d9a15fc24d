package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.streaming.ContinuousIngest.IngestState

/** Consistent, incremental, versioned SHIPPING of a maintained state
  * root to a serving fleet — the missing half of the deployment story
  * the index-only rerank work opened ("a serving deployment ships the
  * index root, not the 100 TB corpus"). The primary root is a
  * SINGLE-WRITER maintenance domain: ingest appends, takedowns
  * rewrite partitions copy-on-write, scheduled compaction deletes
  * source dirs after installing their union — all crash-safe for the
  * writer, but a READER in another session that planned a scan before
  * a swap can hit missing files or a torn view. [[export]] closes
  * that gap by construction: serving sessions never read the primary
  * at all — they read immutable SNAPSHOT versions, each a complete
  * point-in-time view, installed atomically and never mutated.
  *
  * Layout under `exportRoot` (any rename-atomic filesystem, same
  * contract as [[IngestState]]):
  *
  *  - `pool/<table>/batch=<id>/snapv=s<stamp>/` — the data, one
  *    immutable dir per CONTENT VERSION of each source batch dir.
  *    The stamp is an md5 over the source dir's (file name, length)
  *    inventory: Spark embeds a fresh job UUID in every part
  *    filename, so a partition rewritten in place (a takedown's
  *    copy-on-write swap, a compaction's consolidation) gets a new
  *    stamp and a new pool dir, while an UNCHANGED dir is never
  *    copied twice — exports after the first ship only deltas.
  *  - `v=<n>/` — one snapshot version: an [[IngestState]]-shaped tree
  *    whose table dirs hold a `_GRAFT_DIRS` manifest (pool paths,
  *    export-root-relative — the tree is relocatable) instead of
  *    physical partitions, plus verbatim copies of the small
  *    quantizer tables and marker files, plus the `_GRAFT_SNAPSHOT`
  *    marker that (a) marks the version complete and (b) makes every
  *    writer face refuse the root. Installed by rename, so a version
  *    either exists completely or not at all.
  *
  * Serving is the EXISTING faces, unchanged: `Snapshot.state(spark,
  * exportRoot)` returns an [[IngestState]] rooted at the newest
  * complete version; [[ContinuousIngest.readTable]] and the
  * batch-dir listings are manifest-aware, so `annIvfMaintained`,
  * `annIvfPqMaintained` (both rerank shapes), the filtered faces,
  * and [[ContinuousIngest.serve]] all answer from the snapshot
  * byte-identically to the primary (law: `check_snapshot_serve`).
  * An index-only export (the default, `includeDocs = false`) writes
  * the docs-slim marker so reranks auto-gather from the packed float
  * segments — the docs-free serving tier.
  *
  * RIGHT-TO-BE-FORGOTTEN propagation: snapshots pin history, and a
  * takedown's whole point is destroying it. Every version records the
  * primary's completed-takedown count at export time; an export that
  * sees a HIGHER count on the primary prunes every older version
  * regardless of `keepVersions` (law: `check_snapshot_takedown`), so
  * post-takedown the export root retains no pre-purge view. Routine
  * retention keeps the newest `keepVersions` versions — that window
  * is the serving fleet's grace period for queries in flight on an
  * old version; pool dirs no surviving manifest references are
  * vacuumed in the same pass.
  *
  * Crash safety (export runs in the primary's single-writer
  * maintenance context — between streams, or the boundary slot):
  * copies land in dot-hidden tmp dirs and rename in only after a
  * length verification; the version tree renames in last; a crash
  * anywhere leaves hidden tmps (swept at the next export) and
  * possibly installed-but-unreferenced pool dirs (reused by the next
  * export if still current, vacuumed otherwise). Nothing ever mutates
  * an installed pool dir or version tree.
  *
  * At 100 TB: the copy itself is a Spark job (one task per file,
  * executor-side FileSystem streams — the DistCp shape), so shipping
  * bandwidth scales with the cluster, and the incremental stamp check
  * is pure driver metadata (one listing per source batch dir). What
  * this deliberately does NOT do: snapshot the primary for its OWN
  * readers (maintenance reads stay listing-based — they run in the
  * single-writer context and need the physical dirs), or ship deltas
  * WITHIN a batch dir (the unit of change is the partition, matching
  * the writer's own copy-on-write granularity). */
object Snapshot {

  /** The per-batch index tables a serving tier needs (manifest-backed
    * in the version tree). `docs` and `digests` join them under
    * `includeDocs = true`. */
  private val IndexTables = Seq("ivf", "pq", "ivf_packed", "pq_packed", "sem")
  private val DocTables = Seq("docs", "digests")
  /** Small non-batch dirs copied VERBATIM per version (quantizers are
    * KB–MB scale; physical copies keep [[ContinuousIngest.loadQuantizers]]
    * and the ann-config guard byte-identical on a snapshot). */
  private val SmallDirs = Seq("centroids", "sem_centroids", "sem_tree",
    "books", "drift_base")

  private val VTreeTmpPrefix = ".vtree_tmp_"
  private val PoolTmpPrefix = ".pooltmp_"
  private val OpsCountKey = "n_takedown_ops"

  /** What an export did — the spec seams: `copiedPoolDirs` pins
    * incrementality (an unchanged re-export copies zero),
    * `prunedVersions` pins retention + takedown staleness,
    * `vacuumedPoolDirs` pins the pool GC. */
  final case class ExportResult(version: Long,
                                copiedPoolDirs: Long,
                                skippedPoolDirs: Long,
                                copiedFiles: Long,
                                copiedBytes: Long,
                                prunedVersions: Seq[Long],
                                vacuumedPoolDirs: Long)

  /** Streaming-face export schedule ([[ContinuousIngest.IngestParams.export]]):
    * every `everyNBatches` micro-batches, [[ContinuousIngest.start]]'s
    * boundary slot — the same single-writer context the takedown
    * drain and scheduled compaction use — ships a snapshot with the
    * horizon pinned at the last COMMITTED batch (the in-hand batch
    * may still replay; shipping its half-appended partitions would
    * break the parity guard on every serving session). Replay-safe:
    * a re-delivered batch re-runs the export idempotently (unchanged
    * content re-stamps to the same pool dirs). */
  final case class ExportPolicy(exportRoot: String, everyNBatches: Int,
                                keepVersions: Int = 3,
                                includeDocs: Boolean = false)

  /** Export one consistent snapshot of `st` to `exportRoot`. Must run
    * in the primary's single-writer maintenance context (the
    * [[ContinuousIngest.rebuildIndexes]] contract) — the source dirs
    * must be stable for the duration. Idempotent and incremental:
    * unchanged batch dirs are recognized by content stamp and never
    * re-copied. `keepVersions` ≥ 1 bounds routine retention; a
    * completed takedown on the primary overrides it and prunes every
    * pre-takedown version (see the object doc). `upToBatch` bounds
    * the shipped lineage — the streaming boundary slot passes the
    * last committed id so an in-flight batch's partitions (which may
    * exist, half-appended, across a replay) never enter a
    * snapshot. */
  def export(spark: SparkSession, st: IngestState, exportRoot: String,
             includeDocs: Boolean = false,
             keepVersions: Int = 3,
             upToBatch: Long = Long.MaxValue): ExportResult = {
    require(keepVersions >= 1, s"keepVersions must be >= 1 (got $keepVersions)")
    val srcFs = ContinuousIngest.fsFor(spark, st.root)
    require(!srcFs.exists(new HPath(st.root,
        ContinuousIngest.SnapshotMarkerFile)),
      s"Snapshot.export: ${st.root} is itself a snapshot tree — " +
        "export from the PRIMARY state root (snapshot-of-snapshot " +
        "fan-out is not supported; ship the same export root instead)")
    val fs = ContinuousIngest.fsFor(spark, exportRoot)
    val exRoot = fs.makeQualified(new HPath(exportRoot))
    val pool = new HPath(exRoot, "pool")
    fs.mkdirs(pool)
    sweepTmps(fs, exRoot)

    val annRoot = srcFs.exists(new HPath(st.centroidsPath))
    require(annRoot || includeDocs,
      s"Snapshot.export: ${st.root} has no index tables (not an " +
        "ann-enabled root) and includeDocs = false — nothing to ship")
    val tables = (if (annRoot) IndexTables else Nil) ++
      (if (includeDocs) DocTables else Nil)

    // ---- plan: stamp every source batch dir, split copied/skipped --
    // (manifest entries are planned for EVERY live dir either way)
    val copies = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)] // (srcFile, dstFile, srcLen)
    // pool tmp dir -> (final dir, files expected in it)
    val poolInstalls = scala.collection.mutable.ArrayBuffer
      .empty[(HPath, HPath, Seq[(String, Long)])]
    var skipped = 0L
    val manifests: Seq[(String, Seq[String])] = tables.flatMap { t =>
      val srcTable = new HPath(s"${st.root}/$t")
      if (!srcFs.exists(srcTable)) None
      else Some(t -> srcFs.listStatus(srcTable).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=") &&
          s.getPath.getName.stripPrefix("batch=").toLong <= upToBatch)
        .sortBy(_.getPath.getName)
        .map { bd =>
          val files = srcFs.listStatus(bd.getPath).toSeq
            .filter(f => f.isFile && !f.getPath.getName.startsWith("."))
            .map(f => (f.getPath.getName, f.getLen))
            .sortBy(_._1)
          val stamp = dirStamp(bd.getPath.getName, files)
          val rel = s"pool/$t/${bd.getPath.getName}/snapv=s$stamp"
          val target = new HPath(exRoot, rel)
          if (fs.exists(target)) { skipped += 1 }
          else {
            val tmp = new HPath(target.getParent,
              s"$PoolTmpPrefix${stamp}_${java.util.UUID.randomUUID().toString.take(8)}")
            fs.mkdirs(tmp)
            files.foreach { case (name, len) =>
              copies += ((new HPath(bd.getPath, name).toString,
                new HPath(tmp, name).toString, len))
            }
            poolInstalls += ((tmp, target, files))
          }
          s"${bd.getPath.getName}\t$rel"
        })
    }

    // ---- version tree (hidden tmp; renamed in LAST) ----------------
    val version = (listVersionDirs(fs, exRoot).map(versionOf) :+ -1L).max + 1L
    val vtmp = new HPath(exRoot,
      s"$VTreeTmpPrefix${version}_${java.util.UUID.randomUUID().toString.take(8)}")
    fs.mkdirs(vtmp)
    // small dirs verbatim (every file incl. `_` markers, e.g. the
    // ann-config fingerprint; they ride the same distributed copy)
    SmallDirs.foreach { name =>
      val src = new HPath(s"${st.root}/$name")
      if (srcFs.exists(src)) {
        val dst = new HPath(vtmp, name)
        fs.mkdirs(dst)
        srcFs.listStatus(src).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("."))
          .foreach(f => copies += ((f.getPath.toString,
            new HPath(dst, f.getPath.getName).toString, f.getLen)))
      }
    }
    // exported batch tables: manifest + root-level marker files
    // (docs-slim, digests-v2 — generically, any `_` file at the
    // table root except Spark's own bookkeeping)
    manifests.foreach { case (t, lines) =>
      val dst = new HPath(vtmp, t)
      fs.mkdirs(dst)
      writeText(fs, new HPath(dst, ContinuousIngest.SnapshotDirsFile),
        lines.mkString("\n"))
      val src = new HPath(s"${st.root}/$t")
      srcFs.listStatus(src).toSeq
        .filter(f => f.isFile && f.getPath.getName.startsWith("_") &&
          f.getPath.getName != "_SUCCESS")
        .foreach(f => copies += ((f.getPath.toString,
          new HPath(dst, f.getPath.getName).toString, f.getLen)))
    }
    if (!includeDocs) {
      // index-only snapshot: no docs table at all. Stamp the slim
      // marker so the maintained reranks auto-switch to the packed
      // float segments (the float-once convention: "the floats live
      // only in the index here" — literally true on this tree).
      val dst = new HPath(vtmp, "docs")
      fs.mkdirs(dst)
      writeText(fs, new HPath(dst, ContinuousIngest.DocsSlimMarker), "")
    }

    // ---- the copy itself: one Spark job, one task per file ---------
    val (nFiles, nBytes) = copyFiles(spark, copies.toSeq)

    // ---- verify + install pool dirs (rename only after the length
    // check — an installed pool dir is trusted forever after) -------
    poolInstalls.foreach { case (tmp, target, files) =>
      files.foreach { case (name, len) =>
        val got = fs.getFileStatus(new HPath(tmp, name)).getLen
        require(got == len,
          s"Snapshot.export: copied ${tmp}/$name is ${got}B, source " +
            s"was ${len}B — copy torn; tmp retained for inspection")
      }
      fs.mkdirs(target.getParent)
      require(fs.rename(tmp, target),
        s"Snapshot.export: pool install rename $tmp -> $target failed")
    }

    // ---- finish the version tree and install it --------------------
    val nOps = takedownOpCount(spark, st)
    writeText(fs, new HPath(vtmp, ContinuousIngest.SnapshotMarkerFile),
      Seq(s"version=$version",
        s"source=${st.root}",
        s"created_ms=${System.currentTimeMillis()}",
        s"$OpsCountKey=$nOps",
        s"tables=${manifests.map(_._1).mkString(",")}").mkString("\n"))
    val vDir = new HPath(exRoot, s"v=$version")
    require(fs.rename(vtmp, vDir),
      s"Snapshot.export: version install rename $vtmp -> $vDir failed")

    // ---- retention: takedown staleness first, then keepVersions ----
    val survivors = listVersionDirs(fs, exRoot).map(versionOf).sorted
    val stale = survivors.filter(v => v != version &&
      markerOpsCount(fs, exRoot, v) < nOps)
    val routine = survivors.filterNot(stale.contains)
      .sorted(Ordering[Long].reverse).drop(keepVersions)
    val pruned = (stale ++ routine).distinct.sorted
    pruned.foreach(v => fs.delete(new HPath(exRoot, s"v=$v"), true))

    // ---- pool vacuum: anything no surviving manifest references ----
    val kept = listVersionDirs(fs, exRoot).map(versionOf)
    val referenced: Set[String] = kept.flatMap { v =>
      val vRoot = new HPath(exRoot, s"v=$v")
      fs.listStatus(vRoot).toSeq.filter(_.isDirectory).flatMap { td =>
        val mf = new HPath(td.getPath, ContinuousIngest.SnapshotDirsFile)
        if (!fs.exists(mf)) Nil
        else new String(ContinuousIngest.readFileBytes(fs, mf), "UTF-8")
          .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
          .map(_.split("\t", 2)(1))
      }
    }.toSet
    var vacuumed = 0L
    if (fs.exists(pool)) fs.listStatus(pool).filter(_.isDirectory).foreach { td =>
      fs.listStatus(td.getPath).filter(_.isDirectory).foreach { bd =>
        fs.listStatus(bd.getPath).filter(s => s.isDirectory &&
            s.getPath.getName.startsWith("snapv=")).foreach { vd =>
          val rel = s"pool/${td.getPath.getName}/${bd.getPath.getName}/" +
            vd.getPath.getName
          if (!referenced.contains(rel)) {
            fs.delete(vd.getPath, true)
            vacuumed += 1
          }
        }
      }
    }
    ExportResult(version, poolInstalls.size.toLong, skipped, nFiles,
      nBytes, pruned, vacuumed)
  }

  /** All COMPLETE snapshot versions at `exportRoot`, ascending. */
  def versions(spark: SparkSession, exportRoot: String): Seq[Long] = {
    val fs = ContinuousIngest.fsFor(spark, exportRoot)
    listVersionDirs(fs, fs.makeQualified(new HPath(exportRoot)))
      .map(versionOf).sorted
  }

  /** An [[IngestState]] rooted at snapshot `version` (default: the
    * newest complete one) — every read-only face serves from it
    * unchanged; every writer face refuses it loudly. Pin a version
    * per serving session: `keepVersions` on the exporter is the
    * grace window for queries in flight on old versions. */
  def state(spark: SparkSession, exportRoot: String,
            version: Long = -1L): IngestState = {
    val fs = ContinuousIngest.fsFor(spark, exportRoot)
    val exRoot = fs.makeQualified(new HPath(exportRoot))
    val vs = listVersionDirs(fs, exRoot).map(versionOf).sorted
    val v =
      if (version >= 0L) {
        require(vs.contains(version),
          s"Snapshot.state: no complete version $version at " +
            s"$exportRoot (have: ${vs.mkString(", ")})")
        version
      } else vs.lastOption.getOrElse(sys.error(
        s"Snapshot.state: no complete snapshot at $exportRoot — " +
          "run Snapshot.export first"))
    IngestState(new HPath(exRoot, s"v=$v").toString)
  }

  // ---- internals ----------------------------------------------------

  /** Content stamp of one source batch dir: md5 over the (file name,
    * length) inventory of its data files. Spark embeds a fresh job
    * UUID in every part filename, so any in-place rewrite (takedown
    * swap, compaction) changes the stamp; `_`-files (markers,
    * `_SUCCESS`) are excluded — they carry no row content. */
  private def dirStamp(dirName: String, files: Seq[(String, Long)]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(dirName.getBytes("UTF-8"))
    files.filterNot(_._1.startsWith("_")).foreach { case (n, l) =>
      md.update(0.toByte)
      md.update(n.getBytes("UTF-8"))
      md.update(l.toString.getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Distributed file copy — one task per file, executor-side
    * FileSystem streams (the DistCp shape: shipping bandwidth scales
    * with the cluster, the driver only plans). The Hadoop conf rides
    * a broadcast as plain pairs (Configuration is not serializable).
    * Returns (files, bytes). */
  private def copyFiles(spark: SparkSession,
                        copies: Seq[(String, String, Long)]): (Long, Long) = {
    if (copies.isEmpty) return (0L, 0L)
    val entries = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val bc = spark.sparkContext.broadcast(entries)
    val slices = math.max(1, math.min(copies.size,
      spark.sparkContext.defaultParallelism * 2))
    val bytes = spark.sparkContext
      .makeRDD(copies.map(c => (c._1, c._2)), slices)
      .map { case (src, dst) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        bc.value.foreach { case (k, v) => conf.set(k, v) }
        val sp = new HPath(src)
        val dp = new HPath(dst)
        val in = sp.getFileSystem(conf).open(sp)
        val out = dp.getFileSystem(conf).create(dp, true)
        // copyBytes(close = true) closes both streams, also on error
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 1 << 20, true)
        sp.getFileSystem(conf).getFileStatus(sp).getLen
      }
      .fold(0L)(_ + _)
    (copies.size.toLong, bytes)
  }

  /** Complete (marker-carrying) `v=<n>` dirs. A marker-less `v=` dir
    * cannot exist from THIS writer (installs are rename-atomic with
    * the marker inside) — seeing one means external tampering, and
    * ignoring it here keeps readers deterministic. */
  private def listVersionDirs(fs: FileSystem, exRoot: HPath): Seq[HPath] =
    if (!fs.exists(exRoot)) Nil
    else fs.listStatus(exRoot).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath)
      .filter(p => fs.exists(new HPath(p, ContinuousIngest.SnapshotMarkerFile)))

  private def versionOf(p: HPath): Long =
    p.getName.stripPrefix("v=").toLong

  /** The completed-takedown op count recorded in version `v`'s
    * marker; 0 for a pre-field marker (never written by this code —
    * defensive default that errs toward KEEPING the version). */
  private def markerOpsCount(fs: FileSystem, exRoot: HPath, v: Long): Long = {
    val mk = new HPath(exRoot, s"v=$v/${ContinuousIngest.SnapshotMarkerFile}")
    new String(ContinuousIngest.readFileBytes(fs, mk), "UTF-8")
      .split("\n").map(_.trim)
      .collectFirst { case l if l.startsWith(s"$OpsCountKey=") =>
        l.stripPrefix(s"$OpsCountKey=").toLong }
      .getOrElse(0L)
  }

  /** Distinct completed-takedown ops on the primary — the version
    * staleness clock. Small read: the audit log carries one row per
    * (doc, op), never content. */
  private def takedownOpCount(spark: SparkSession, st: IngestState): Long =
    ContinuousIngest.deletesLog(spark, st)
      .select("op_id").distinct().count()

  /** Sweep a crashed export's hidden tmps: version-tree tmps at the
    * root, copy tmps under every pool batch dir. Safe by naming —
    * nothing reads dot-prefixed dirs — and cheap (one listing per
    * pool batch dir, which export lists anyway). Runs in the
    * single-writer context, so no live export can be concurrent. */
  private def sweepTmps(fs: FileSystem, exRoot: HPath): Unit = {
    fs.listStatus(exRoot).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(VTreeTmpPrefix))
      .foreach(s => fs.delete(s.getPath, true))
    val pool = new HPath(exRoot, "pool")
    if (fs.exists(pool))
      fs.listStatus(pool).filter(_.isDirectory).foreach { td =>
        fs.listStatus(td.getPath).filter(_.isDirectory).foreach { bd =>
          fs.listStatus(bd.getPath).filter(s => s.isDirectory &&
              s.getPath.getName.startsWith(PoolTmpPrefix))
            .foreach(s => fs.delete(s.getPath, true))
        }
      }
  }

  private def writeText(fs: FileSystem, p: HPath, text: String): Unit = {
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }
}
