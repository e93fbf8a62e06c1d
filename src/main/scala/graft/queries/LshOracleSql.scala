package graft.queries

import graft.ops.SimilarityOps

/** Builds DuckDB oracle SQL for the sign-bit LSH ANN queries.
  *
  * The hyperplanes are *plan literals* (deterministic `Random(seed)`
  * Gaussians materialized into the Spark plan), so the oracle embeds the
  * identical double literals — Scala's `Double.toString` is the shortest
  * round-trip representation and DuckDB's parser rounds it back to the same
  * IEEE value. Dot products fold in list order on both engines
  * (`list_sum(list_transform(list_zip(..)))` is bit-identical to the native
  * [[graft.functions.DotProduct]] sequential fold — already proven by the
  * hash-matched `ext_dedup_embedding_pairs` / `ext_ann_bruteforce` rows), so
  * bucket bits, candidate sets, cosines, and ranks reproduce exactly.
  */
object LshOracleSql {

  private def sqlVec(p: Array[Double]): String =
    p.map(_.toString).mkString("[", ", ", "]")

  private def sqlDot(v: String, p: Array[Double]): String =
    s"list_sum(list_transform(list_zip($v, ${sqlVec(p)}), s -> s[1] * s[2]))"

  /** Sign-bit bucket: bit i set iff dot(v, plane_i) >= 0 (bits are disjoint
    * so the OR-fold is a sum). */
  private def sqlBucket(v: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${sqlDot(v, p)} >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  private def bucketSelect(tables: Int, planesFor: Int => Array[Array[Double]]): String =
    (0 until tables)
      .map(t => s"${sqlBucket("ve", planesFor(t))} AS b$t")
      .mkString(",\n    ")

  private def caseBucket(tables: Int): String =
    "CASE t " + (0 until tables - 1).map(t => s"WHEN $t THEN b$t").mkString(" ") +
      s" ELSE b${tables - 1} END"

  /** Oracle for [[SimilarityOps.lshTopK]] with queries = `vec_id < 10` of the
    * same table, multiProbe = true (bucket + all Hamming-1 neighbors). */
  def lshTopK(dim: Int, k: Int, bits: Int = 6, tables: Int = 4,
      vecExpr: String = "embedding"): String = {
    val planesFor = (t: Int) => SimilarityOps.hyperplanes(dim, bits, seed = 42L + t)
    s"""WITH v AS (
      SELECT vec_id, list_transform($vecExpr, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings),
    b AS (
      SELECT vec_id, ve,
        sqrt(list_sum(list_transform(list_zip(ve, ve), s -> s[1] * s[2]))) AS nrm,
        ${bucketSelect(tables, planesFor)}
      FROM v),
    cbk AS (
      SELECT vec_id AS n_id, ve AS n_v, nrm AS n_n, t,
        ${caseBucket(tables)} AS bucket
      FROM b, range(0, $tables) tt(t)),
    qpr AS (
      SELECT vec_id AS q_id, ve AS q_v, nrm AS q_n, t,
        xor(${caseBucket(tables)},
            CASE WHEN p = 0 THEN CAST(0 AS BIGINT)
                 ELSE (CAST(1 AS BIGINT) << CAST(p - 1 AS INTEGER)) END) AS probe
      FROM b, range(0, $tables) tt(t), range(0, ${bits + 1}) pp(p)
      WHERE vec_id < 10),
    scored AS (
      SELECT DISTINCT q.q_id, c.n_id,
        list_sum(list_transform(list_zip(q.q_v, c.n_v), s -> s[1] * s[2]))
          / (q.q_n * c.n_n) AS cosine
      FROM qpr q JOIN cbk c
        ON q.t = c.t AND q.probe = c.bucket AND q.q_id <> c.n_id),
    ranked AS (
      SELECT q_id, n_id, cosine,
        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
      FROM scored)
    SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, cosine FROM ranked
    WHERE rank <= $k ORDER BY q_id, rank"""
  }

  /** Oracle for [[SimilarityOps.knnGraph]] (seeds 100+t, no multi-probe,
    * cosine rounded to 6 after ranking). */
  def knnGraph(dim: Int, k: Int, bits: Int, tables: Int, idFilter: String): String = {
    val planesFor = (t: Int) => SimilarityOps.hyperplanes(dim, bits, seed = 100L + t)
    val shareAny = (0 until tables).map(t => s"a.b$t = c.b$t").mkString(" OR ")
    s"""WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings WHERE $idFilter),
    b AS (
      SELECT vec_id, ve,
        ${bucketSelect(tables, planesFor)}
      FROM v),
    cand AS (
      SELECT a.vec_id AS src, c.vec_id AS dst,
        list_sum(list_transform(list_zip(a.ve, c.ve), s -> s[1] * s[2]))
          / (sqrt(list_sum(list_transform(list_zip(a.ve, a.ve), s -> s[1] * s[2])))
           * sqrt(list_sum(list_transform(list_zip(c.ve, c.ve), s -> s[1] * s[2])))) AS cosine
      FROM b a JOIN b c ON ($shareAny) AND a.vec_id <> c.vec_id),
    ranked AS (
      SELECT src, dst, cosine,
        row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS nn_rank
      FROM cand)
    SELECT src, CAST(nn_rank AS BIGINT) AS nn_rank, dst, round(cosine, 6) AS cosine
    FROM ranked WHERE nn_rank <= $k ORDER BY src, nn_rank"""
  }

  /** Oracle for the ANN quality report: recall@k of the LSH candidate
    * method against exact brute-force cosine, per query plus a q_id = -1
    * mean row. Both sides are deterministic (plan-literal hyperplanes,
    * fixed-fold dots), so even the approximation ERROR replays exactly. */
  def recallReport(dim: Int, k: Int, bits: Int = 6, tables: Int = 4): String = {
    val planesFor = (t: Int) => SimilarityOps.hyperplanes(dim, bits, seed = 42L + t)
    s"""WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings),
    b AS (
      SELECT vec_id, ve,
        sqrt(list_sum(list_transform(list_zip(ve, ve), s -> s[1] * s[2]))) AS nrm,
        ${bucketSelect(tables, planesFor)}
      FROM v),
    cbk AS (
      SELECT vec_id AS n_id, ve AS n_v, nrm AS n_n, t,
        ${caseBucket(tables)} AS bucket
      FROM b, range(0, $tables) tt(t)),
    qpr AS (
      SELECT vec_id AS q_id, ve AS q_v, nrm AS q_n, t,
        xor(${caseBucket(tables)},
            CASE WHEN p = 0 THEN CAST(0 AS BIGINT)
                 ELSE (CAST(1 AS BIGINT) << CAST(p - 1 AS INTEGER)) END) AS probe
      FROM b, range(0, $tables) tt(t), range(0, ${bits + 1}) pp(p)
      WHERE vec_id < 10),
    lsh AS (
      SELECT q_id, n_id FROM (
        SELECT q_id, n_id,
          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
        FROM (
          SELECT DISTINCT q.q_id, c.n_id,
            list_sum(list_transform(list_zip(q.q_v, c.n_v), s -> s[1] * s[2]))
              / (q.q_n * c.n_n) AS cosine
          FROM qpr q JOIN cbk c
            ON q.t = c.t AND q.probe = c.bucket AND q.q_id <> c.n_id))
      WHERE rank <= $k),
    exact AS (
      SELECT q_id, n_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
          row_number() OVER (PARTITION BY q.vec_id ORDER BY
            list_sum(list_transform(list_zip(q.ve, c.ve), s -> s[1] * s[2]))
              / (q.nrm * c.nrm) DESC, c.vec_id) AS rank
        FROM b q JOIN b c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
      WHERE rank <= $k),
    per_q AS (
      SELECT e.q_id, CAST(count(l.n_id) AS BIGINT) AS n_hit
      FROM exact e LEFT JOIN lsh l ON e.q_id = l.q_id AND e.n_id = l.n_id
      GROUP BY e.q_id)
    SELECT q_id, n_hit, round(n_hit / $k.0, 4) AS recall FROM per_q
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(sum(n_hit) AS BIGINT),
      round(sum(n_hit) / (count(*) * $k.0), 4) FROM per_q
    ORDER BY q_id"""
  }

  /** Oracle for [[graft.ops.DedupOps.embeddingTopPairsLsh]] (seeds 42+t,
    * pairs sharing any table's bucket, global top-k by cosine). */
  def embeddingTopPairsLsh(dim: Int, k: Int, bits: Int = 6, tables: Int = 4): String = {
    val planesFor = (t: Int) => SimilarityOps.hyperplanes(dim, bits, seed = 42L + t)
    val shareAny = (0 until tables).map(t => s"a.b$t = c.b$t").mkString(" OR ")
    s"""WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings),
    b AS (
      SELECT vec_id, ve,
        sqrt(list_sum(list_transform(list_zip(ve, ve), s -> s[1] * s[2]))) AS nrm,
        ${bucketSelect(tables, planesFor)}
      FROM v),
    cand AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
        list_sum(list_transform(list_zip(a.ve, c.ve), s -> s[1] * s[2]))
          / (a.nrm * c.nrm) AS cosine
      FROM b a JOIN b c ON ($shareAny) AND a.vec_id < c.vec_id)
    SELECT id_a, id_b, cosine FROM cand
    ORDER BY cosine DESC, id_a, id_b LIMIT $k"""
  }
}
