package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Methodology:
  * - queries execute through the `noop` sink — full computation, no
  *   driver collect, no parquet write cost, and `count()`-style plan
  *   short-circuits can't hide work;
  * - one warm-up action first so JVM/codegen startup isn't billed to
  *   the first query;
  * - session mirrors graft.core.Sessions (AQE on, UTC, shuffle
  *   partitions = cores).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: a scan+agg touches parquet reader, codegen, shuffle paths —
    // including a decimal-cast sum so the decimal aggregate codegen the
    // money queries share is JIT'd before the first timed query.
    graft.core.Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
        graft.functions.Exact.sumExact2(
          org.apache.spark.sql.functions.col("l_quantity")))
      .write.format("noop").mode("overwrite").save()

    // Dev-only subset filter (unset in the driver's run → all queries):
    // SPARK_GRAFT_ONLY=q85_corpus_pipeline,q58_json_schema
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(Registry.all)(names => Registry.all.filter(q => names(q.name)))

    // Short ids (q54, q14b) must stay unique — a collision would emit
    // duplicate JSON keys and silently drop a timing. Checked BEFORE
    // the timing loop (fail-before-paying: a name collision must not
    // cost a full multi-minute suite run first).
    val shortIds = selected.map(_.name.takeWhile(_ != '_'))
    require(shortIds.distinct.size == shortIds.size,
      s"duplicate short query ids in bench contract: ${
        shortIds.groupBy(identity).collect { case (id, g) if g.size > 1 => id }.mkString(",")}")

    def loadAvg: Double = {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      os.getSystemLoadAverage
    }
    val startLoad = loadAvg
    val results = selected.map { q =>
      val la0 = loadAvg
      val t0 = System.nanoTime()
      try {
        val df = q.run(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        // The noop write consumed the result; checkpoints its plan
        // references (q55/q36/q48-style staged oracle frames) are done —
        // release them here, where "consumed" is knowable, rather than
        // asking every dual-path query to guess its own consumption
        // point. Off the timed region? No — deliberately INSIDE it:
        // a query's storage cost is part of its cost.
        graft.operators.Lineage.release(df, blocking = true)
      }
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      // Leak check AFTER the plan-referenced release: anything still
      // registered is storage the query staged and then dropped from its
      // final plan — a genuine leak Lineage.release can't see. Loud, not
      // fatal — the sweep below still cleans up, but the leak lands in
      // the forensics file and the contract line's "leaks" counter.
      val leaked = spark.sparkContext.getPersistentRDDs.size
      if (leaked > 0) System.err.println(s"[bench-leak] ${q.name} left $leaked RDD(s) registered")
      // Between-query hygiene so every query is timed cold and earlier
      // queries can't thrash later ones (observed: q35 degrading
      // 5s → 24s late in the suite):
      // - clearCache drops persist()-staged intermediates;
      // - unpersisting leftover RDDs frees localCheckpoint blocks, which
      //   clearCache does NOT touch — they otherwise accumulate in the
      //   block manager for the whole suite and push later queries'
      //   staging onto contended disk. The previous query's result is
      //   done, so dropping its checkpoint data is safe here.
      // blocking = true: an async release overlaps its deletion I/O with
      //   the NEXT query's staging (r6 forensics: q55's checkpoint sweep
      //   bled into q35's 3 s → 16 s swing). The blocking wait costs
      //   milliseconds and lands outside the timed region.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      (q.name, dt, la0, leaked)
    }
    // Bench forensics: host load average sampled before each query, so a
    // regression can be separated from host contention after the fact.
    val loads = results.map { case (k, _, la, _) => "\"" + k + "\":" + num2(la) }
      .mkString("{", ",", "}")
    System.err.println(s"[bench-load] $loads")
    // The stderr forensics die with the session log; the per-query
    // (seconds, load, leaked-RDD) triples also go to a local file that
    // survives the run, so a later reader can separate host contention
    // from plan regressions without the original console.
    val forensics = results.map { case (k, v, la, lk) =>
      "\"" + k + "\":{\"sec\":" + num(v) + ",\"load\":" + num2(la) + ",\"leaked\":" + lk + "}"
    }.mkString("{", ",", "}")
    val forensicsLine =
      s"""{"sf":"$sfDir","load0":${num2(startLoad)},"load1":${num2(loadAvg)},"queries":$forensics}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FORENSICS.json"),
      forensicsLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => System.err.println(s"[bench] forensics write failed: ${e.getMessage}") }
    // Full-precision, full-name map goes to stderr for humans/logs; the
    // stdout contract line uses short ids (q54, q14b) and 3-decimal values
    // so the WHOLE line fits in the driver's 2 KB output tail — rounds 1-3
    // all recorded `parsed: null` because the ~3.5 KB full-name line
    // overflowed that window and the parse failed.
    val full = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    System.err.println(s"[bench-full] $full")
    def queriesJson(fmt: Double => String) = shortIds.zip(results)
      .map { case (id, (_, v, _, _)) => "\"" + id + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = num(results.map(_._2).sum)
    val leakTotal = results.map(_._4).sum
    // load0/load1: 1-min host load average at suite start/end — lets a
    // future reader separate host contention from a real regression.
    // leaks: count of RDDs queries left registered (should be 0; see
    // the per-query leak check above).
    def line(qs: String) =
      s"""{"metric":"total","value":$total,"unit":"sec","load0":${num2(startLoad)},"load1":${num2(loadAvg)},"leaks":$leakTotal,"queries":$qs,"sf":"$sfDir"}"""
    // The driver parses the last 2 KB of stdout; at 146 queries the
    // 3-decimal line is ~1.92 KB. Degrade per-query precision (never
    // the total) before the line would overflow and silently record
    // `parsed: null` — the exact regression rounds 1-3 suffered.
    val out = Seq(num _, num2 _, num1 _).iterator
      .map(f => line(queriesJson(f)))
      .find(_.length <= 1950)
      .getOrElse(line("{}")) // absolute fallback: totals still parse
    println(out)
    spark.stop()
  }

  // Locale.ROOT: the f-interpolator uses the default locale, which in
  // e.g. fr_FR renders 1.234 as "1,234" — invalid JSON on the line
  // whose whole job is to parse
  private def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
  private def num2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
  private def num1(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
}
