package graft.operators

import graft.SparkTestBase

/** Temperature resampling: α=0.5 must compress the source distribution
  * (small sources get MORE than their proportional share, large ones
  * less), quotas must respect the budget, and the hash-ranked
  * selection must be deterministic under repartitioning.
  */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  // 80/16/4 split — heavily skewed
  private def corpus() =
    ((1L to 80L).map(i => (i, "big")) ++
      (100L to 115L).map(i => (i, "mid")) ++
      (200L to 203L).map(i => (i, "small"))).toDF("id", "src")

  test("alpha=0.5 upweights small sources and respects the budget") {
    val t = Resample.temperatureTargets(corpus(), "src", budget = 50)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val (nBig, tBig) = t("big")
    val (nSmall, tSmall) = t("small")
    assert(nBig == 80 && nSmall == 4)
    // proportional share of big = 80%; tempered share must be lower,
    // small's 4% share must be higher
    assert(tBig.toDouble / 50 < 0.8, s"big over-sampled: $tBig")
    assert(tSmall.toDouble / 50 > 0.04, s"small under-sampled: $tSmall")
    // integer-division quotas never exceed the budget in total
    assert(t.values.map(_._2).sum <= 50)
    // a quota larger than the source (huge budget) caps the SAMPLE at
    // the source's actual size — selection can't invent rows
    val capped = Resample.temperatureSample(corpus(), "src", "id", budget = 10000)
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(capped("small") == 4 && capped("big") <= 80)
  }

  test("selection is deterministic, within-quota, and partition-independent") {
    val df = corpus()
    val a = Resample.temperatureSample(df, "src", "id", budget = 50)
      .select($"id").as[Long].collect().toSet
    val b = Resample.temperatureSample(df.repartition(13), "src", "id", budget = 50)
      .select($"id").as[Long].collect().toSet
    assert(a == b, "hash-ranked selection must not depend on partitioning")
    val quotas = Resample.temperatureTargets(df, "src", budget = 50)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val perSrc = Resample.temperatureSample(df, "src", "id", budget = 50)
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    perSrc.foreach { case (s, n) =>
      assert(n == math.min(quotas(s), df.where($"src" === s).count()),
        s"source $s selected $n of quota ${quotas(s)}")
    }
  }
}
