package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import graft.sources.DiskCommitLog

/** Forked-JVM half of the cross-process commit-race proof (see
  * `CommitRaceSpec`): appends `n` marker "files" to a gdisk commit log
  * through the SAME optimistic protocol the catalog uses — read latest,
  * bump version, claim, retry on a lost race — while the parent test JVM
  * does the same on the same table. The JVM-wide claim lock cannot help
  * across processes here; only the log's atomic create-if-absent claim
  * keeps the two writers serialized. No SparkSession is needed: the
  * commit log is pure filesystem metadata.
  *
  * args: <tableDir> <nCommits> <markerPrefix> [barrierDir]
  * With a barrier dir, drops `ready` and spins for `go` before racing,
  * so both JVMs enter the commit loop together.
  * prints RACE_PROBE_OK committed=<n> conflicts=<k> on success.
  */
object CommitRaceProbe {
  def main(args: Array[String]): Unit = {
    val log = new DiskCommitLog(new HPath(args(0)), new Configuration())
    val n = args(1).toInt
    val prefix = args(2)
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
      require(attempts < 100000, "commit-race probe livelocked")
      val base = log.latest()
      val marker = s"$prefix-$committed.parquet"
      val next = base.copy(
        version = base.version + 1,
        files = base.files :+ marker,
        added = Seq(marker))
      try { log.write(next, "WRITE"); committed += 1 }
      catch {
        // a lost claim race MUST surface as this clean conflict — any
        // other failure (corrupt manifest, lost update) fails the probe
        case _: java.io.IOException => conflicts += 1
      }
    }
    println(s"RACE_PROBE_OK committed=$committed conflicts=$conflicts")
  }
}
