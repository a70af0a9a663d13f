package graft.dev

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only A/B for the incremental-probe gram-stats sharing: OLD
  * formulation (bloom built by a second full gram explosion, chars/6
  * sizing — inlined verbatim below, the IncJoinAB discipline) vs NEW
  * (per-gram stats checkpointed once, bloom from the distinct-gram
  * frame). q210-build shape: 4 equal batches probed against the live
  * union of prior segments. Interleaved rounds, same JVM.
  *
  * Usage: sbt "Test/runMain graft.dev.ProbeShareAB [sfDir] [rounds]"
  */
object ProbeShareAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SubstringDedup

    val docs = graft.core.Tables.documents(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft_psab").toString
    // segments = per-batch gram indexes (the LSM live set at each step)
    for (b <- 0 until 4)
      SubstringDedup.gramIndex(docs.where(col("doc_id") % 4 === b), 8)
        .write.parquet(s"$root/seg_$b")
    val segs = (0 until 4).map(b => spark.read.parquet(s"$root/seg_$b"))
    // parquet-staged (NOT localCheckpoint): the probe result's plan is
    // Lineage.release'd per run, which would free checkpoint-backed
    // batch frames out from under later rounds
    val batches = (0 until 4).map { b =>
      docs.where(col("doc_id") % 4 === b).write.parquet(s"$root/batch_$b")
      spark.read.parquet(s"$root/batch_$b")
    }

    // ---- OLD probe, inlined (pre-r15-opt formulation) ----
    def oldProbe(index: DataFrame, batch: DataFrame): DataFrame = {
      val k = 8
      val occB = graft.core.Partitioning.fanOut(batch)
        .select(col("doc_id").cast("long").as("doc_id"),
          posexplode(graft.functions.TextFunctions.textShinglesAll(col("text"), k))
            .as(Seq("pos", "g")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("g"))
      def packed = shiftleft(col("doc_id"), 21) + col("pos")
      val bStats = occB.groupBy(col("g"))
        .agg(min(packed).as("bfp"), count(lit(1)).as("bcnt"))
      val indexSide = {
        val plain = index.select(col("g"), col("fp"), col("cnt"))
        val chars = batch.agg(sum(length(col("text")).cast("long"))).head()
        val estGrams = math.max(4096L, math.min(
          if (chars.isNullAt(0)) 1L else chars.getLong(0) / 6,
          SubstringDedup.MaxPrefilterItems))
        val bloom = occB.stat.bloomFilter("g", estGrams,
          SubstringDedup.IndexPrefilterFpp)
        val bc = spark.sparkContext.broadcast(bloom)
        val mightHave = udf((g: String) => bc.value.mightContainString(g))
        plain.where(mightHave(col("g")))
      }
      val merged = bStats
        .join(indexSide, Seq("g"), "left")
        .groupBy(col("g"), col("bfp"), col("bcnt"))
        .agg(min(col("fp")).as("ifp"), sum(col("cnt")).as("icnt"))
        .select(col("g"),
          least(col("bfp"), coalesce(col("ifp"), lit(Long.MaxValue))).as("gfp"),
          (col("bcnt") + coalesce(col("icnt"), lit(0L))).as("gcnt"))
        .where(col("gcnt") >= 2)
      val nonFirst = occB.join(merged.hint("shuffle_hash"), Seq("g"))
        .where(packed =!= col("gfp"))
        .select(col("doc_id"), col("pos"))
      // retentionReport equivalent (private) — reproduce the tail
      val tok = graft.core.Partitioning.fanOut(batch)
        .select(col("doc_id").cast("long").as("doc_id"),
          posexplode(graft.functions.TextFunctions.tokens(col("text")))
            .as(Seq("pos", "tok")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(-(k - 1), org.apache.spark.sql.expressions.Window.currentRow)
      tok.join(nonFirst.select(col("doc_id"), col("pos"), lit(1).as("flag")),
          Seq("doc_id", "pos"), "left")
        .withColumn("cov", max(coalesce(col("flag"), lit(0))).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("cov")).cast("long").as("removed_tokens"),
          expr("cast(sum(cov) * 1000000 div count(1) as bigint)").as("removed_ppm"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("cov") === 0, struct(col("pos"), col("tok"))))),
            s => s.getField("tok")), " ")).as("kept_md5"))
    }

    def runSeq(tag: String, f: (DataFrame, DataFrame) => DataFrame): Unit = {
      val t0 = System.nanoTime()
      // batch 0 probes an empty index; batch i probes union of segs < i
      for (i <- 0 until 4) {
        val live =
          if (i == 0) segs.head.limit(0)
          else segs.take(i).reduce(_ unionByName _)
        val rep = f(live, batches(i))
        rep.write.format("noop").mode("overwrite").save()
        graft.operators.Lineage.release(rep, blocking = true)
      }
      println(f"[psab] $tag 4-batch probes wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (r <- 1 to rounds) {
      runSeq(s"OLD #$r", (idx, b) => oldProbe(idx, b))
      runSeq(s"NEW #$r", (idx, b) =>
        SubstringDedup.cleanKeepFirstIncremental(idx, b, 8))
    }
    spark.stop()
  }
}
