package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables
import graft.functions.Sketches
import graft.functions.TextFunctions.hash60

/** Round-5 additions: portable sketch operators under the full oracle
  * gate. Like q74's KMV sketch, the hashing is md5-derived and computed
  * OUTSIDE the aggregate, so DuckDB rebuilds the identical sketch and
  * the approximate answers hash-match bit-for-bit.
  */
object Relational6 {

  val queries: Seq[GraftQuery] = Seq(

    // ---- q118: Count-Min frequency estimation — build one CMS over
    //      every lineitem's part key (depth 4 × width 1024 bucket
    //      sums, one pass, mergeable across partitions), then probe 10
    //      part keys. The estimate is min-over-rows of the probed
    //      bucket — an overestimate by construction; the oracle
    //      rebuilds the exact sketch with GROUP BYs over the same
    //      md5-bit-slice hashes, so even the collision error matches
    //      bit-for-bit. true_n rides along to document the one-sided
    //      error in the output itself. ----
    GraftQuery(
      "q118_cms_freq",
      (s, d) => {
        val depth = 4; val wBits = 10
        val li = Tables.lineitem(s, d)
        val sk = li.agg(Sketches.countMin(
          hash60(col("l_partkey").cast("string")), depth, wBits).as("sk"))
        val truth = li.where(col("l_partkey") <= 10)
          .groupBy(col("l_partkey").as("part"))
          .agg(count(lit(1)).as("true_n"))
        truth.crossJoin(broadcast(sk))
          .select(col("part"),
            Sketches.countMinEstimate(col("sk"),
              hash60(col("part").cast("string")), depth, wBits).as("est_n"),
            col("true_n"))
      },
      Some("""
        WITH h AS (
          SELECT CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          FROM lineitem),
        rows_i AS (SELECT unnest(generate_series(0, 3)) AS i),
        buckets AS (
          SELECT i, (hv >> (10 * i)) & 1023 AS b, count(*) AS c
          FROM h CROSS JOIN rows_i
          GROUP BY 1, 2),
        truth AS (
          SELECT l_partkey AS part, count(*) AS true_n
          FROM lineitem WHERE l_partkey <= 10 GROUP BY 1),
        probe AS (
          SELECT part, true_n,
            CAST(concat('0x', substr(md5(CAST(part AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          FROM truth),
        est AS (
          SELECT p.part, p.true_n, min(coalesce(b.c, 0)) AS est_n
          FROM probe p
          CROSS JOIN rows_i r
          LEFT JOIN buckets b ON b.i = r.i AND b.b = (p.hv >> (10 * r.i)) & 1023
          GROUP BY 1, 2)
        SELECT part, CAST(est_n AS BIGINT) AS est_n, CAST(true_n AS BIGINT) AS true_n
        FROM est
      """))
  )
}
