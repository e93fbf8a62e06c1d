package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, SimHash64}

/** SQL-surface registration of the native expressions: after
  * GraftFunctions.register (or the GraftExtensions injection for new
  * sessions), spark.sql can call them directly. Run on a newSession() so
  * the shared test session's registry stays pristine.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    GraftFunctions.register(s)
    s
  }

  test("word_shingles / minhash_sig / simhash64 callable from SQL") {
    val row = spark.sql(
      """SELECT word_shingles(array('a','b','c'), 2) AS sh,
                minhash_sig(array('x','y'), 4) AS mh,
                simhash64(array('the','quick','fox')) AS sim""").head()
    assert(row.getSeq[String](0) == Seq("a b", "b c"))
    assert(row.getSeq[Long](1).length == 4)
    assert(row.getLong(2) == SimHash64.ofTokens(Seq("the", "quick", "fox")))
  }

  test("dot_product and unicode_normalize callable from SQL") {
    val row = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
                unicode_normalize('café') AS nfc,
                unicode_normalize('ﬁLE', 'NFKC', true) AS folded""").head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getString(1) == "café")
    assert(row.getString(2) == "file")
  }

  test("cms functions callable from SQL") {
    val row = spark.sql(
      """SELECT cms_estimate(s, 'a') AS ca, cms_estimate(s, 'b') AS cb
         FROM (SELECT cms_sketch_agg(t, 5, 1024) AS s
               FROM VALUES ('a'),('a'),('b'),('a') AS v(t))""").head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 1L)
  }

  test("strip_accents callable from SQL") {
    val row = spark.sql(
      "SELECT strip_accents('École française: déjà vu!') AS s").head()
    assert(row.getString(0) == "Ecole francaise: deja vu!")
  }

  test("hash_embed callable from SQL; unit-norm and consistent with the Column API") {
    val row = spark.sql(
      "SELECT hash_embed('the quick brown fox the', 16) AS emb").head()
    val v = row.getSeq[Double](0)
    assert(v.length == 16)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    import org.apache.spark.sql.functions.lit
    val viaColumn = spark.range(1)
      .select(graft.ops.TextOps.hashEmbed(lit("the quick brown fox the"), 16).as("emb"))
      .head().getSeq[Double](0)
    assert(v == viaColumn)
  }

  test("theta sketch family callable from SQL; intersection of equal sets is exact") {
    val row = spark.sql(
      """WITH t AS (SELECT explode(sequence(1, 500)) AS x)
         SELECT theta_estimate(theta_sketch_agg(CAST(x AS STRING))) AS est,
                theta_intersect_estimate(
                  theta_sketch_agg(CAST(x AS STRING)),
                  theta_sketch_agg(CAST(x AS STRING))) AS inter
         FROM t""").head()
    // 500 < 2^12 nominal entries: the sketch is in exact mode
    assert(row.getDouble(0) == 500.0, row)
    assert(row.getDouble(1) == 500.0, row)
  }

  test("non-literal static args are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(array('a'), cast(rand() * 3 AS INT))").head()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("front-door GraftSession SQL can call the native expressions") {
    val g = new graft.GraftSession(TestSpark.spark.newSession())
    val row = g.sql("SELECT unicode_normalize('ﬁLE', 'NFKC', true) AS t").head()
    assert(row.getString(0) == "file")
  }
}
