package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter for membership pruning — the O(1)-memory
  * alternative to a join when one side is a *set* (benchmark
  * decontamination probes, URL blocklists, already-seen fingerprints).
  *
  * Build: each key sets `numHashes` bits of an m-bit array; the bit words
  * aggregate distributively (`bit_or` is idempotent — no distinct needed),
  * so the build is one explode + one m/64-row shuffle and ONLY the packed
  * word array (m/64 longs — 16 KiB at m=2^20) reaches the driver.
  *
  * Probe: `mightContain` is pure per-row column arithmetic against the
  * word array embedded as a plan literal (broadcast with the plan) — a
  * 100 TB corpus scan carries NO join and NO shuffle, at a bounded
  * false-positive rate and zero false negatives.
  *
  * Hashing is double-hashing (Kirsch–Mitzenmacher): g_i = h1 + i·h2 mod m
  * with h1 = xxhash64, h2 = 2·murmur3+1 (forced odd, coprime with the
  * power-of-two m) — both deterministic, codegen'd builtins, so build and
  * probe agree bit-for-bit.
  */
object BloomOps {

  /** h2 for Kirsch–Mitzenmacher double hashing, forced ODD (2·h+1): an
    * even-or-zero h2 shares factors with the power-of-two m, collapsing
    * the probe sequence (h2=0 degenerates to a single bit position and
    * ruins the FPR for that key). Odd h2 is coprime with m, so the i·h2
    * strides cover distinct positions. Shared by build and probe — the
    * two sides must agree bit-for-bit. */
  private def h2(key: Column): Column =
    hash(key).cast("long") * lit(2L) + lit(1L)

  /** The `numHashes` bit positions a key sets/tests (array column). */
  private def bitPositions(key: Column, numBits: Long, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      pmod(xxhash64(key) + lit(i.toLong) * h2(key), lit(numBits))
    }: _*)

  /** Build the packed filter: m/64 longs. `numBits` must be a multiple
    * of 64; size it at ~10 bits/key for ~1% FPR with numHashes=7. */
  def buildFilter(
      df: DataFrame, key: Column, numBits: Long, numHashes: Int = 7): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64")
    val words = df
      .select(explode(bitPositions(key, numBits, numHashes)).as("pos"))
      .select((col("pos") / 64).cast("long").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("mask"))
      .groupBy(col("w")).agg(bit_or(col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long]((numBits / 64).toInt)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership test against a built filter — shuffle-free, join-free;
    * false positives possible, false negatives impossible. Native
    * expression ([[graft.functions.BloomMightContain]]): the packed words
    * ride as one plan reference instead of an m/64-literal array tree,
    * and the probe is a tight loop rather than numHashes chained
    * column hash evaluations — bit-identical to [[mightContainColumns]]
    * (BloomSpec parity). */
  def mightContain(key: Column, words: Array[Long], numHashes: Int = 7): Column = {
    require(words.nonEmpty)
    graft.functions.NativeFunctions.bloom_might_contain(key, words, numHashes)
  }

  /** Column-composed executable spec of [[mightContain]] — the parity
    * anchor BloomSpec checks the native kernel against, not the hot
    * path. */
  private[graft] def mightContainColumns(
      key: Column, words: Array[Long], numHashes: Int = 7): Column = {
    require(words.nonEmpty)
    val m = words.length * 64L
    val wordsLit = array(words.map(lit(_)): _*)
    (0 until numHashes).map { i =>
      val pos = pmod(xxhash64(key) + lit(i.toLong) * h2(key), lit(m))
      val word = element_at(wordsLit, (pos / 64).cast("int") + 1)
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
