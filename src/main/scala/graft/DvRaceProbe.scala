package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import graft.sources.{DiskCommitLog, DiskDv, DvBitmap, DvEntry}

/** Forked-JVM half of the cross-process DELETION-VECTOR race proof (see
  * `DvRaceSpec`): merges `n` row positions — one commit each — into ONE
  * data file's sidecar through the same optimistic protocol
  * `deleteWithDvs` uses: read latest, read the file's CURRENT sidecar,
  * union this round's bit, write a NEW immutable sidecar, claim the
  * version; a lost claim retries from the fresh snapshot (re-reading the
  * winner's sidecar, so the union can never lose the winner's bits).
  * This is the read-modify-write shape where a lost update would hide:
  * two processes each read sidecar S, each write S+their-own-bit, and
  * without claim exclusivity the second manifest claim would silently
  * orphan the first one's deletes.
  *
  * args: <tableDir> <nBits> <bitOffset> [barrierDir]
  * prints DV_RACE_OK committed=<n> conflicts=<k> on success. */
object DvRaceProbe {
  val FileName = "f-0.parquet"

  def main(args: Array[String]): Unit = {
    val log = new DiskCommitLog(new HPath(args(0)), new Configuration())
    val fs = log.dataDir.getFileSystem(new Configuration())
    val n = args(1).toInt
    val offset = args(2).toLong
    if (args.length > 3) {
      val dir = java.nio.file.Paths.get(args(3))
      java.nio.file.Files.write(dir.resolve("ready"), Array.empty[Byte])
      val deadline = System.currentTimeMillis() + 60000
      while (!java.nio.file.Files.exists(dir.resolve("go"))) {
        require(System.currentTimeMillis() < deadline, "barrier timeout")
        Thread.sleep(5)
      }
    }
    var committed = 0
    var conflicts = 0
    var attempts = 0
    while (committed < n) {
      attempts += 1
      require(attempts < 100000, "dv-race probe livelocked")
      val base = log.latest()
      val bits = base.dvs.get(FileName)
        .map(e => DiskDv.read(fs, log.dataDir, e.dv))
        .getOrElse(new DvBitmap())
      bits.set(offset + committed)
      val rel = DiskDv.write(fs, log.dataDir, bits)
      val next = base.copy(
        version = base.version + 1, added = Nil,
        deleteVectors = Some(
          base.dvs + (FileName -> DvEntry(rel, bits.cardinality))))
      try { log.write(next, "DELETE"); committed += 1 }
      catch {
        // a lost claim race MUST surface as this clean conflict; the
        // retry re-reads the winner's sidecar and merges again
        case _: java.io.IOException => conflicts += 1
      }
    }
    println(s"DV_RACE_OK committed=$committed conflicts=$conflicts")
  }
}
