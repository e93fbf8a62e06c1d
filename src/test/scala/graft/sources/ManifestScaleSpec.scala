package graft.sources

import java.time.LocalDate

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
import org.apache.spark.sql.types.{DataType, DateType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-METADATA scale probe: the gdisk claims — O(changed-files) delta
  * commits, ≤ one-checkpoint-interval reconstruction, pruning before
  * planning, window-bounded `.changes` — proven at a real file COUNT
  * (50k fabricated manifest entries; no data I/O is involved at this
  * layer, which is exactly the point: the driver handles names and stat
  * strings only). Bounds are asserted, not just completion; they carry
  * generous headroom for the shared noisy host but would still fail
  * catastrophically if any of these paths regressed to O(files) I/O or
  * quadratic driver CPU. No SparkSession is created — everything here
  * must be cheap enough to run inside a query planner. */
class ManifestScaleSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private val NFiles = 50000
  private val FilesPerDay = 100

  private def timedMs[A](f: => A): (A, Long) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1000000L)
  }

  /** Timing for a PURE (re-runnable) body with co-tenant adjudication:
    * one re-time when the first attempt exceeds `limitMs`, min of the
    * two — the same min-of-reps signal the bench gate uses. A genuine
    * scalability regression fails both attempts deterministically; a
    * host-load spike does not (this suite's 15 s CDC-diff bound measured
    * 40 s once under loadavg ≈ 10 and 2.x s on the same code quiet). */
  private def timedMsMin[A](limitMs: Long)(f: => A): (A, Long) = {
    val (r, ms) = timedMs(f)
    if (ms < limitMs) (r, ms)
    else {
      val (r2, ms2) = timedMs(f)
      (r2, math.min(ms, ms2))
    }
  }

  // 500 day dirs x 100 files; file i holds ids [i*1000, i*1000+999]
  private lazy val files: Vector[String] = (0 until NFiles).map { i =>
    val day = LocalDate.of(2024, 1, 1).plusDays((i / FilesPerDay).toLong)
    f"day=$day/part-$i%05d.parquet"
  }.toVector
  private lazy val stats: Map[String, Map[String, ColStats]] =
    files.zipWithIndex.map { case (f, i) =>
      f -> Map("id" -> ColStats(
        Some((i * 1000L).toString), Some((i * 1000L + 999L).toString),
        Some(0L), 1000L))
    }.toMap

  private lazy val (log, tableDir) = {
    val dir = java.nio.file.Files.createTempDirectory("gdisk_scale").toString
    val td = new HPath(dir, "t")
    val l = new DiskCommitLog(td, conf)
    val schema = StructType(Seq(
      StructField("day", DateType), StructField("id", LongType)))
    l.commitInitial(DiskManifest(
      version = 0L, schemaJson = schema.json,
      defaults = Map.empty, comments = Map.empty, constraints = Nil,
      files = files, added = files, properties = Map.empty,
      epochs = Map.empty, partitionCols = Some(Seq("day")),
      fileStats = Some(stats),
      fileSizes = Some(files.map(_ -> 1048576L).toMap)))
    (l, td)
  }

  private def commitTenDeltas(): Unit =
    (1 to 10).foreach { k =>
      val base = log.latest()
      val nf = s"day=2024-12-31/extra-$k.parquet"
      log.write(base.copy(
        version = base.version + 1,
        files = base.files :+ nf, added = Seq(nf),
        fileStats = Some(base.stats +
          (nf -> Map("id" -> ColStats(Some("0"), Some("9"), Some(0L), 10L)))),
        fileSizes = Some(base.sizes + (nf -> 123L))), "WRITE")
    }

  /** Tests below depend on the 10 delta commits; idempotent for single-
    * test runs (declaration order covers the full-suite run). */
  private def ensureDeltas(): Unit =
    if (log.latestVersion() < 10L) commitTenDeltas()

  test("delta commits on a 50k-file table stay O(changed files) in time and bytes") {
    val (_, ms) = timedMs(commitTenDeltas())
    assert(ms < 10000, s"10 one-file commits on a 50k-file table took $ms ms")
    val fs = tableDir.getFileSystem(conf)
    val logDir = new HPath(tableDir, GraftDiskCatalog.LogDirName)
    val ckptLen = fs.getFileStatus(
      new HPath(logDir, f"v${0L}%020d.json")).getLen
    (1 to 10).foreach { v =>
      val dLen = fs.getFileStatus(
        new HPath(logDir, f"d${v.toLong}%020d.json")).getLen
      assert(dLen < 64 * 1024,
        s"delta record v$v is $dLen bytes — not O(changed files)")
      assert(dLen < ckptLen / 50,
        s"delta v$v ($dLen B) is not materially smaller than the " +
          s"checkpoint ($ckptLen B)")
    }
  }

  test("cold reconstruction reads the checkpoint plus <= one interval of deltas, bounded") {
    ensureDeltas()
    // copy the log dir to a NEW path: fresh cache key, so read() must
    // reconstruct v10 from the v0 checkpoint + 10 delta records
    val coldDir = new HPath(
      java.nio.file.Files.createTempDirectory("gdisk_scale_cold").toString, "t")
    val fs = tableDir.getFileSystem(conf)
    val srcLog = new HPath(tableDir, GraftDiskCatalog.LogDirName)
    val dstLog = new HPath(coldDir, GraftDiskCatalog.LogDirName)
    fs.mkdirs(dstLog)
    fs.listStatus(srcLog).foreach { st =>
      if (st.isFile)
        org.apache.hadoop.fs.FileUtil.copy(
          fs, st.getPath, fs, new HPath(dstLog, st.getPath.getName),
          false, conf)
    }
    val coldLog = new DiskCommitLog(coldDir, conf)
    val readsBefore = DiskCommitLog.recordReads.get()
    val (m, ms) = timedMs(coldLog.read(10L))
    val reads = DiskCommitLog.recordReads.get() - readsBefore
    assert(m.files.length == NFiles + 10)
    assert(m.sizes.size == NFiles + 10, "sizes lost in delta reconstruction")
    assert(m.stats.size == NFiles + 10, "stats lost in delta reconstruction")
    assert(ms < 15000, s"cold 50k-file snapshot reconstruction took $ms ms")
    // STRUCTURAL bound: v10 reconstructs from the v0 checkpoint + the 10
    // delta records — within one checkpoint interval of record reads,
    // never a rescan of history
    assert(reads <= GraftDiskCatalog.DefaultCheckpointInterval + 1,
      s"reconstruction opened $reads log records (interval " +
        s"${GraftDiskCatalog.DefaultCheckpointInterval})")
  }

  test("partition + stats pruning of a point query over 50k files is driver-CPU bounded") {
    ensureDeltas()
    val m = log.latest()
    val table = new GraftDiskTable("scale.t", log, m, pinned = None)
    // identity-partition pruning: one day pins its 100 files
    val day = Literal(
      LocalDate.of(2024, 6, 1).toEpochDay.toInt, DateType)
    val dayPred = EqualTo(AttributeReference("day", DateType)(), day)
    val (kept, prMs) = timedMs(
      GraftDiskCatalog.identityKeepFiles(table, m.files, Seq(dayPred)))
    assert(kept.exists(_.length == FilesPerDay), s"kept=${kept.map(_.length)}")
    assert(prMs < 3000, s"identity pruning over 50k files took $prMs ms")
    // manifest stats skipping: a point id predicate survives exactly one file
    val dtOf: String => Option[DataType] = {
      case "id" => Some(LongType); case "day" => Some(DateType); case _ => None
    }
    val idPred = EqualTo(
      AttributeReference("id", LongType)(), Literal(12345678L, LongType))
    val (nMatch, stMs) = timedMs(
      files.count(f => DiskStats.mayMatch(stats(f), dtOf, idPred)))
    assert(nMatch == 1, s"expected exactly one surviving file, got $nMatch")
    assert(stMs < 3000, s"stats skipping over 50k files took $stMs ms")
  }

  test(".changes window cost scales with the window, not the table") {
    ensureDeltas()
    val table = new GraftDiskTable("scale.t", log, log.latest(), pinned = None)
    val (groups, ms) = timedMsMin(3000)(table.changeGroups(8L, 10L))
    val inserted = groups.filter(_.ctype == "insert").flatMap(_.files)
    assert(inserted ==
      Seq("day=2024-12-31/extra-9.parquet", "day=2024-12-31/extra-10.parquet"))
    assert(ms < 3000, s"a 2-version change window on a 50k-file table took $ms ms")
  }

  // runs LAST (declaration order): it appends commits the earlier
  // version-window assertions must not see
  test("a 5k-sidecar deletion-vector commit stays metadata-sized end to end") {
    ensureDeltas()
    val base = log.latest()
    val touched = files.take(5000)
    // fabricate one tiny sidecar per touched file (one deleted row each)
    val dd = log.dataDir
    val entries = touched.zipWithIndex.map { case (f, i) =>
      val bits = new DvBitmap()
      bits.set(i.toLong % 1000L)
      f -> DvEntry(DiskDv.write(log.fs, dd, bits), 1L)
    }.toMap
    val next = base.copy(version = base.version + 1, added = Nil,
      deleteVectors = Some(entries))
    val ((), wMs) = timedMs(log.write(next, "DELETE"))
    assert(wMs < 10000, s"a 5k-entry DV delta commit took $wMs ms")
    // the delta record carries the DV map, NOT the 50k-file inventory
    val rec = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      tableDir.toUri.getPath, GraftDiskCatalog.LogDirName,
      f"d${next.version}%020d.json"))
    assert(rec.length < 2 * 1024 * 1024,
      s"DV delta record is ${rec.length} bytes — did the file bulk leak in?")
    // cold reconstruction through the delta resolves and serves the map
    val cold = new DiskCommitLog(tableDir, conf)
    val (m2, rMs) = timedMsMin(10000)(
      new DiskCommitLog(tableDir, conf).read(next.version))
    assert(m2.dvs.size == 5000)
    assert(rMs < 10000, s"cold DV-commit reconstruction took $rMs ms")
    // the CDC diff opens exactly the changed sidecars — O(sidecars),
    // bounded, and classified as a keepOnly delete group
    val table = new GraftDiskTable("scale.t", log, next, pinned = None)
    val (groups, cMs) = timedMsMin(15000)(
      table.changeGroups(next.version - 1, next.version))
    assert(cMs < 15000, s"5k-sidecar CDC diff took $cMs ms")
    val dvGroup = groups.find(_.keepOnly).getOrElse(
      fail("no keepOnly DV-diff change group emitted"))
    assert(dvGroup.ctype == "delete" && dvGroup.files.length == 5000)
  }
}
