package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables
import graft.operators.Similarity

/** Similarity-search coverage over the `embeddings` fixture
  * (`array<float>` × 64). The brute-force kernels carry DuckDB oracles —
  * both engines compute the identical sequential double fold, so raw
  * cosine values hash-match. The LSH variant is the scale path
  * (bucket-join candidates, never O(N²)); its recall is spec-verified
  * against the brute baseline rather than oracle-matched.
  */
object VectorQueries {

  /** Shared oracle prelude: embeddings as double vectors, plus the
    * unit-normalized copy mirroring Similarity.prep (norm computed once,
    * element-wise division — same operation sequence, bit-identical).
    */
  private val vecCte =
    """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |           FROM embeddings),
      |nrm AS (SELECT vec_id, label,
      |          list_transform(v, x -> x / sqrt(list_reduce(list_transform(v, y -> y * y), (a, b) -> a + b))) vn
      |        FROM e)""".stripMargin

  val queries: Seq[GraftQuery] = Seq(

    // ---- q40: L2 norms — the float-parity canary (raw doubles) ----
    GraftQuery(
      "q40_vector_norms",
      (s, d) => {
        import graft.functions.VectorFunctions._
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            normL2(vecD(col("embedding"))).as("norm"))
      },
      Some(s"""
        $vecCte
        SELECT vec_id, label,
          sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS norm
        FROM e
      """)),

    // ---- q41: exact top-10 cosine neighbors for 5 query vectors ----
    GraftQuery(
      "q41_knn_bruteforce",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(
            emb, emb.where(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
      },
      Some(s"""
        $vecCte,
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_reduce(list_transform(generate_series(1, len(q.vn)),
              i -> q.vn[i] * c.vn[i]), (x, y) -> x + y) AS sim
          FROM nrm q JOIN nrm c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < 5),
        ranked AS (
          SELECT query_id, neighbor_id, sim,
            row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          FROM pairs)
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 10
      """),
      headline = true),

    // ---- q42: LSH-bucketed approximate top-k (scale path; no oracle —
    //      recall vs brute force is spec-verified) ----
    GraftQuery(
      "q42_ann_lsh",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.lshTopK(
            emb, emb.where(col("vec_id") < 5), "vec_id", "embedding",
            k = 10, tables = 8, bits = 4)
          .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
      },
      None),

    // ---- q49: array function family (size/sort/slice/element_at/
    //      filter/aggregate) over the embedding arrays. Output columns
    //      are all SCALAR: the driver's oracle compare sorts rows with
    //      pandas, which cannot hash raw array cells — the top-3 slice
    //      is therefore projected element-wise, not returned as a list.
    GraftQuery(
      "q49_array_ops",
      (s, d) => {
        import graft.functions.VectorFunctions.vecD
        val top3 = slice(sort_array(vecD(col("embedding")), asc = false), 1, 3)
        Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            element_at(top3, 1).as("top1"),
            element_at(top3, 2).as("top2"),
            element_at(top3, 3).as("top3"),
            element_at(vecD(col("embedding")), 1).as("first_val"),
            size(filter(vecD(col("embedding")), x => x > 0d)).cast("long").as("n_positive"),
            aggregate(vecD(col("embedding")), lit(0d), (a, x) => a + x).as("sum_val"))
      },
      Some("""
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
        s AS (SELECT vec_id, v, list_sort(v, 'DESC') sv FROM e)
        SELECT vec_id,
          CAST(len(v) AS BIGINT) AS dim,
          sv[1] AS top1,
          sv[2] AS top2,
          sv[3] AS top3,
          v[1] AS first_val,
          CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_positive,
          list_reduce(list_prepend(CAST(0 AS DOUBLE), v), (a, b) -> a + b) AS sum_val
        FROM s
      """)),

    // ---- q43: exact near-dup pairs by cosine ≥ 0.4 (corpus max is
    //      0.513 — threshold chosen to yield a non-trivial result) ----
    GraftQuery(
      "q43_embedding_neardup",
      (s, d) => Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding", tau = 0.4),
      Some(s"""
        $vecCte
        SELECT * FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_reduce(list_transform(generate_series(1, len(a.vn)),
              i -> a.vn[i] * b.vn[i]), (x, y) -> x + y) AS sim
          FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id) t
        WHERE sim >= 0.4
      """))
  )
}
