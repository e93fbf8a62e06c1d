package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** CROSS-PROCESS deletion-vector race proof (the DV sibling of
  * `CommitRaceSpec`): two JVMs — this one and a forked `graft.DvRaceProbe`
  * — each merge 20 row positions into the SAME data file's sidecar, one
  * optimistic commit per position. Sidecar updates are read-modify-write
  * (read the current bitset, union, write a NEW sidecar, swap the
  * manifest pointer), which is exactly where a lost update hides: without
  * claim exclusivity the second writer's manifest would silently orphan
  * the first one's deletes. Afterward the final bitset must contain ALL
  * 40 positions from both processes, with the exact cardinality, every
  * intermediate version readable, and losers having seen only the clean
  * conflict IOException. The contention assertion re-runs contention-free
  * rounds (up to three) instead of flaking on a scheduling stall. */
class DvRaceSpec extends AnyFunSuite {

  private def raceOnce(round: Int): Int = {
    val conf = new Configuration()
    val tableDir = new HPath(
      java.nio.file.Files.createTempDirectory(s"gdisk_dvrace$round").toString, "t")
    val log = new DiskCommitLog(tableDir, conf)
    val schema = StructType(Seq(StructField("id", LongType)))
    val file = graft.DvRaceProbe.FileName
    log.commitInitial(DiskManifest(
      version = 0L, schemaJson = schema.json,
      defaults = Map.empty, comments = Map.empty, constraints = Nil,
      files = Seq(file), added = Seq(file), properties = Map.empty,
      epochs = Map.empty,
      fileStats = Some(Map(file -> Map("id" -> ColStats(
        Some("0"), Some("999"), Some(0L), 1000L)))),
      fileSizes = Some(Map(file -> 4096L))))

    val n = 20
    val barrier = java.nio.file.Files.createTempDirectory("gdisk_dvrace_barrier")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(javaBin, "-Xmx512m",
      "-cp", System.getProperty("java.class.path"),
      "graft.DvRaceProbe", tableDir.toString, n.toString,
      "100", // probe bits: positions 100..119
      barrier.toString)
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val deadline = System.currentTimeMillis() + 60000
    while (!java.nio.file.Files.exists(barrier.resolve("ready"))) {
      assert(System.currentTimeMillis() < deadline, "probe never came up")
      Thread.sleep(5)
    }
    java.nio.file.Files.write(barrier.resolve("go"), Array.empty[Byte])

    // race from THIS process: positions 500..519, same protocol
    var committed = 0
    var conflicts = 0
    var attempts = 0
    while (committed < n) {
      attempts += 1
      require(attempts < 100000, "local dv loop livelocked")
      val base = log.latest()
      val bits = base.dvs.get(file)
        .map(e => DiskDv.read(log.fs, log.dataDir, e.dv))
        .getOrElse(new DvBitmap())
      bits.set(500L + committed)
      val rel = DiskDv.write(log.fs, log.dataDir, bits)
      val next = base.copy(version = base.version + 1, added = Nil,
        deleteVectors = Some(
          base.dvs + (file -> DvEntry(rel, bits.cardinality))))
      try { log.write(next, "DELETE"); committed += 1 }
      catch { case _: java.io.IOException => conflicts += 1 }
    }

    val out = new StringBuilder
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) { out.append(line).append('\n'); line = reader.readLine() }
    val exit = proc.waitFor()
    assert(exit == 0, s"dv race probe exited $exit:\n${out.toString.takeRight(2000)}")
    assert(out.toString.contains("DV_RACE_OK committed=20"), out.toString)

    // NO LOST DELETE: the final sidecar carries all 40 positions from
    // both processes, with the exact cardinality
    val vs = log.versions()
    assert(vs == (0L to 40L), s"non-contiguous versions: $vs")
    val finalBits = {
      val e = log.read(40L).dvs(file)
      assert(e.card == 40L, s"final cardinality ${e.card} != 40")
      DiskDv.read(log.fs, log.dataDir, e.dv)
    }
    (0 until n).foreach { i =>
      assert(finalBits.contains(100L + i), s"lost probe delete ${100 + i}")
      assert(finalBits.contains(500L + i), s"lost local delete ${500 + i}")
    }
    // every intermediate version's DV chain stays readable
    vs.filter(_ >= 1).foreach { v =>
      val e = log.read(v).dvs(file)
      assert(DiskDv.read(log.fs, log.dataDir, e.dv).cardinality == e.card)
    }
    val probeConflicts =
      "conflicts=(\\d+)".r.findFirstMatchIn(out.toString)
        .map(_.group(1).toInt).getOrElse(0)
    info(s"round $round: local conflicts=$conflicts probe conflicts=$probeConflicts")
    conflicts + probeConflicts
  }

  test("two processes racing 20 sidecar merges each lose no delete") {
    var round = 1
    var contended = raceOnce(round)
    while (contended == 0 && round < 3) {
      round += 1
      contended = raceOnce(round)
    }
    assert(contended >= 1,
      s"no claim collision in $round rounds — the race proved nothing")
  }
}
