package graft

import graft.SparkTestBase

/** The custom expressions must be reachable from pure SQL through the
  * SparkSessionExtensions registration (prompt tier (c)).
  */
class GraftExtensionsSpec extends SparkTestBase {

  test("graft_* functions callable from spark.sql") {
    val r = spark.sql("""
      SELECT
        graft_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS dot,
        graft_normalize(array(3d, 4d)) AS norm,
        graft_simhash64(array(CAST(0 AS BIGINT))) AS sh,
        graft_minhash_sig(array('a', 'b'), 4) AS sig
    """).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getSeq[Double](1) == Seq(0.6, 0.8))
    assert(r.getLong(2) == 0L) // single hash 0: every bit votes -1
    assert(r.getSeq[String](3).length == 4)
    assert(r.getSeq[String](3).forall(_.length == 32))
  }

  test("SQL minhash matches the built-in formulation it claims to equal") {
    val viaSql = spark.sql(
      "SELECT graft_minhash_sig(array('x y z', 'y z w'), 8) AS s").head().getSeq[String](0)
    val viaBuiltins = spark.sql("""
      SELECT transform(sequence(0, 7),
        i -> array_min(transform(array('x y z', 'y z w'),
          s -> md5(concat(CAST(i AS STRING), '|', s))))) AS s
    """).head().getSeq[String](0)
    assert(viaSql == viaBuiltins)
  }

  test("wrong arity yields a named error") {
    val e = intercept[Exception](spark.sql("SELECT graft_dot(array(1d))").collect())
    assert(e.getMessage.contains("graft_dot"))
  }

  test("graft_levenshtein from SQL: distance within k, -1 past it") {
    val r = spark.sql("""
      SELECT graft_levenshtein('kitten', 'sitting', 10) AS d1,
             graft_levenshtein('kitten', 'sitting', 2) AS d2
    """).head()
    assert(r.getInt(0) == 3 && r.getInt(1) == -1)
  }

  test("graft_kmv_distinct aggregate from SQL is exact below k") {
    val r = spark.sql("""
      SELECT graft_kmv_distinct(CAST(conv(substr(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT), 64) AS nd
      FROM range(0, 40)
    """).head()
    assert(r.getDouble(0) == 40.0)
  }

  test("graft_count_min and graft_bloom aggregates from SQL") {
    val sk = spark.sql("""
      SELECT graft_count_min(CAST(conv(substr(md5(CAST(id % 3 AS STRING)), 1, 15), 16, 10) AS BIGINT), 4, 10) AS sk
      FROM range(0, 30)
    """).head().getSeq[Long](0)
    assert(sk.length == 4 * 1024 && sk.sum == 30 * 4, "every row increments depth buckets")
    val bf = spark.sql("""
      SELECT graft_bloom(CAST(conv(substr(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT), 3, 10) AS bf
      FROM range(0, 10)
    """).head().getSeq[Long](0)
    assert(bf.length == 1024 / 64 && bf.exists(_ != 0L))
  }

  test("graft_unicode_normalize from SQL composes decomposed input") {
    // 'cafe' + U+0301 (combining acute, UTF-8 CC 81): NFC composes to
    // 4 codepoints; identity on plain ASCII
    val r = spark.sql("""
      SELECT length(graft_unicode_normalize(
               concat('cafe', decode(unhex('CC81'), 'UTF-8')), 'NFC')) AS n,
             graft_unicode_normalize('plain', 'NFC') AS id
    """).head()
    assert(r.getInt(0) == 4 && r.getString(1) == "plain")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_unicode_normalize('x', 'NFX')").head()
    }
    assert(e.getMessage.contains("NFC/NFD/NFKC/NFKD") || e.getMessage.contains("form"))
  }
}
