package graft.queries

import graft.{Registry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Round-8 third-session queries (q174-q179): internal-consistency
  * assertions at sf0.001. Cross-engine value equality is the DuckDB
  * oracle's job (Verify/selfcheck).
  */
class NewQueries8cSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q174: coverage is monotone in rank and the rank-1 term is the modal token") {
    val rows = Registry.byName("q174_zipf_coverage").run(spark, sf)
      .orderBy(col("rank")).collect()
    assert(rows.nonEmpty && rows.head.getLong(rows.head.fieldIndex("rank")) == 1L)
    val cov = rows.map(r => r.getLong(r.fieldIndex("coverage_ppm")))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b },
      s"coverage must be nondecreasing: ${cov.mkString(",")}")
    assert(cov.forall(c => c > 0 && c <= 1000000))
    // rank-1 term really is the most frequent token
    val counts = graft.core.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").count().orderBy(col("count").desc, col("tok")).head()
    assert(rows.head.getString(rows.head.fieldIndex("term")) == counts.getString(0))
  }

  test("q175: stride boundaries are each crossed by exactly one selected doc") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = docs.map(_._2).sum
    val step = math.max(total / 50, 1L)
    var cum = 0L
    val expected = docs.flatMap { case (id, w) =>
      val before = cum; cum += w
      if (cum / step > before / step) Some(id) else None
    }.toSeq
    val got = Registry.byName("q175_systematic_sample").run(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(got == expected.sorted, s"selected ${got.size} vs expected ${expected.size}")
    assert(got.size >= 40 && got.size <= 51, s"~50 samples expected, got ${got.size}")
  }

  test("q176: every event lands in exactly 4 hopping windows") {
    val out = Registry.byName("q176_events_hopping").run(spark, sf)
    val nTotal = out.agg(sum("n")).head().getLong(0)
    val nEvents = graft.core.Tables.events(spark, sf).count()
    assert(nTotal == 4 * nEvents, s"$nTotal != 4 * $nEvents")
  }

  test("q177: label histogram partitions the node set and labels are node-id minima") {
    val out = Registry.byName("q177_label_propagation").run(spark, sf).collect()
    val nNodes = out.map(r => r.getLong(r.fieldIndex("n_nodes"))).sum
    // the query's own graph: co-order pairs from orders with ≤ 3
    // distinct parts (the sparse subgraph — the full graph collapses
    // to one label and would hide a histogram bug)
    val op = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val small = op.groupBy("l_orderkey").count().where(col("count") <= 3)
      .select("l_orderkey")
    val ops = op.join(small, Seq("l_orderkey"))
    val edges = ops.alias("a").join(ops.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v")).distinct()
    val nodeIds = edges.select(col("u").as("x")).union(edges.select(col("v").as("x")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(nNodes == nodeIds.size, s"histogram covers $nNodes of ${nodeIds.size} nodes")
    // every surviving label is a real node id (labels are min-ids)
    val labels = out.map(r => r.getLong(r.fieldIndex("label"))).toSet
    assert(labels.subsetOf(nodeIds))
    // (at sf0.001 even the sparse graph collapses to one label in 3
    // rounds; the multi-label histogram is exercised by the sf0.01
    // oracle — 20 labels — and sf0.1 — 230)
  }

  test("q178: auth1 is the in-degree and auth2 dominates ordering deterministically") {
    val out = Registry.byName("q178_hits_paths").run(spark, sf).collect()
    assert(out.length <= 15 && out.nonEmpty)
    val a2 = out.map(r => r.getLong(r.fieldIndex("auth2")))
    assert(a2.zip(a2.tail).forall { case (a, b) => a >= b }, "auth2 must be desc")
    // recompute in-degree for the reported suppliers
    val e = graft.core.Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .join(graft.core.Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")), Seq("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (p, a1) = (r.getLong(r.fieldIndex("supp")), r.getLong(r.fieldIndex("auth1")))
      assert(e(p) == a1, s"supplier $p auth1 $a1 != in-degree ${e(p)}")
    }
  }

  test("q180: lift is symmetric-consistent and support floor holds") {
    val out = Registry.byName("q180_basket_lift").run(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("co")) >= 2, "support floor")
      val (co, cu, cv) = (r.getLong(r.fieldIndex("co")),
        r.getLong(r.fieldIndex("cu")), r.getLong(r.fieldIndex("cv")))
      assert(co <= cu && co <= cv, "co-count bounded by either part's count")
      assert(r.getLong(r.fieldIndex("lift_ppb")) > 0)
    }
    val lifts = out.map(_.getLong(5))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b }, "desc order")
  }

  test("q181: degree distribution accounts for every node and handshake sum is even") {
    val out = Registry.byName("q181_degree_distribution").run(spark, sf).collect()
    val nNodes = out.map(r => r.getLong(r.fieldIndex("n_nodes"))).sum
    val e = Relational5.coOrderPairs(spark, sf).distinct()
    val n = e.select(col("u").as("x")).union(e.select(col("v").as("x"))).distinct().count()
    assert(nNodes == n)
    // handshake lemma: sum of degrees = 2 |E|
    val degSum = out.map(r =>
      r.getLong(r.fieldIndex("degree")) * r.getLong(r.fieldIndex("n_nodes"))).sum
    assert(degSum == 2 * e.count(), s"degree sum $degSum != 2|E|")
  }

  test("q182: variants partition the user base and conversions are bounded") {
    val out = Registry.byName("q182_ab_test").run(spark, sf).collect()
    assert(out.length == 2, s"expected variants {0,1}, got ${out.length} rows")
    val nUsers = out.map(r => r.getLong(r.fieldIndex("n_users"))).sum
    assert(nUsers == graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count())
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_converted")) <= r.getLong(r.fieldIndex("n_users")))
      val ppm = r.getLong(r.fieldIndex("cvr_ppm"))
      assert(ppm >= 0 && ppm <= 1000000)
    }
  }

  test("q183: first digits are 1-9 and shares sum to ~1e6") {
    val out = Registry.byName("q183_benford_digits").run(spark, sf).collect()
    val digits = out.map(r => r.getLong(r.fieldIndex("digit")))
    assert(digits.forall(d => d >= 1 && d <= 9), s"bad digits: ${digits.mkString(",")}")
    assert(digits.distinct.length == digits.length)
    val shares = out.map(r => r.getLong(r.fieldIndex("share_ppm"))).sum
    // truncating division loses at most (k-1) ppm across k groups
    assert(shares > 1000000 - 9 && shares <= 1000000, s"shares sum $shares")
    val nTotal = out.map(r => r.getLong(r.fieldIndex("n"))).sum
    assert(nTotal == graft.core.Tables.orders(spark, sf)
      .where(col("o_totalprice") > 0).count())
  }

  test("q184: sessions reconcile with q45's per-user session counts") {
    val out = Registry.byName("q184_bounce_rate").run(spark, sf)
    val nSessions = out.agg(sum("n_sessions")).head().getLong(0)
    val q45 = Registry.byName("q45_events_sessionize").run(spark, sf)
    val want = q45.agg(sum("n_sessions")).head().getLong(0)
    assert(nSessions == want, s"q184 total sessions $nSessions != q45 $want")
    out.collect().foreach { r =>
      assert(r.getLong(r.fieldIndex("n_bounced")) <= r.getLong(r.fieldIndex("n_sessions")))
    }
  }

  test("q185: histogram accounts for every document") {
    val out = Registry.byName("q185_dup_size_histogram").run(spark, sf).collect()
    val nDocs = out.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    assert(nDocs == graft.core.Tables.documents(spark, sf).count())
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_docs")) ==
        r.getLong(r.fieldIndex("group_size")) * r.getLong(r.fieldIndex("n_groups")))
    }
  }

  test("q186: coefficient is a valid ratio and tri3 reconciles with q104's operator") {
    val r = Registry.byName("q186_clustering_coefficient").run(spark, sf).head()
    val (tri3, wedges, ppm) = (r.getLong(r.fieldIndex("n_tri3")),
      r.getLong(r.fieldIndex("n_wedges")), r.getLong(r.fieldIndex("coeff_ppm")))
    assert(tri3 % 3 == 0, "per-vertex triangle counts must sum to a multiple of 3")
    assert(tri3 <= 3 * wedges, "closed wedges cannot exceed wedges")
    assert(ppm >= 0 && ppm <= 1000000)
  }

  test("q187: slope rational reduces to the denominator-scaled micro slope") {
    val out = Registry.byName("q187_trend_slopes").run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (num, den, micro) = (r.getLong(r.fieldIndex("slope_num")),
        r.getLong(r.fieldIndex("slope_den")), r.getLong(r.fieldIndex("slope_micro")))
      assert(den > 0, "x values must vary within each priority")
      assert(micro == BigInt(1000000) * num / den,
        s"micro $micro != 1e6*$num/$den")
    }
  }

  test("q188: streak histogram covers every active user; streaks bound the active-day count") {
    val out = Registry.byName("q188_longest_streak").run(spark, sf).collect()
    val nUsers = out.map(r => r.getLong(r.fieldIndex("n_users"))).sum
    val events = graft.core.Tables.events(spark, sf)
    assert(nUsers == events.select("user_id").distinct().count())
    val maxStreak = out.map(r => r.getLong(r.fieldIndex("max_streak"))).max
    val maxDays = events.select(col("user_id"), to_date(col("ts"))).distinct()
      .groupBy("user_id").count().agg(max("count")).head().getLong(0)
    assert(maxStreak <= maxDays, "a streak cannot exceed a user's active-day count")
  }

  test("q189: deciles cover all docs; decile bounds are ordered") {
    val out = Registry.byName("q189_quantile_normalized").run(spark, sf)
      .orderBy(col("decile")).collect()
    val nDocs = out.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    assert(nDocs == graft.core.Tables.documents(spark, sf).count())
    val mins = out.map(r => r.getLong(r.fieldIndex("min_chars")))
    // rank normalization is monotone within a source, so decile min
    // bounds must be nondecreasing overall only per source — but the
    // global min of decile k+1 can't be below the global min of decile 0
    assert(mins.head == mins.min)
    out.foreach { r =>
      val d = r.getLong(r.fieldIndex("decile"))
      assert(d >= 0 && d <= 9)
    }
  }

  test("q190: per-month percentiles are ordered and n reconciles with the join") {
    val out = Registry.byName("q190_latency_percentiles").run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(r.fieldIndex("p50")),
        r.getDouble(r.fieldIndex("p90")), r.getDouble(r.fieldIndex("p99")))
      assert(p50 <= p90 && p90 <= p99, s"percentiles out of order: $p50 $p90 $p99")
      // (the synthetic fixture contains ship dates BEFORE order dates
      // — negative delays are real data here, not an error)
    }
    val nTotal = out.map(r => r.getLong(r.fieldIndex("n"))).sum
    assert(nTotal == graft.core.Tables.lineitem(spark, sf).count())
  }

  test("q191: TWAP lies within each type's value range and weights sum to user spans") {
    val out = Registry.byName("q191_twap_by_type").run(spark, sf).collect()
    assert(out.nonEmpty)
    val bounds = graft.core.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(min(floor(col("value") * 1000000)).as("lo"),
        max(floor(col("value") * 1000000)).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      val t = r.getString(r.fieldIndex("event_type"))
      val twap = r.getLong(r.fieldIndex("twap_micro"))
      val (lo, hi) = bounds(t)
      // the weighted mean of per-event floored values is bounded by
      // the global floored min/max (weights are positive)
      assert(twap >= lo && twap <= hi, s"$t twap $twap outside [$lo,$hi]")
    }
  }

  test("q192: quartile segments partition the customer base") {
    val out = Registry.byName("q192_rfm_segments").run(spark, sf).collect()
    val n = out.map(r => r.getLong(r.fieldIndex("n_customers"))).sum
    assert(n == graft.core.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count())
    out.foreach { r =>
      Seq("r", "f", "m").foreach { c =>
        val v = r.getLong(r.fieldIndex(c)); assert(v >= 1 && v <= 4)
      }
    }
  }

  test("q193: the 80% crossing rank is tight — rank k80-1 covers under 80%") {
    val r = Registry.byName("q193_pareto_customers").run(spark, sf).head()
    val (n, k80) = (r.getLong(r.fieldIndex("n_customers")), r.getLong(r.fieldIndex("k80")))
    assert(k80 >= 1 && k80 <= n)
    // recompute: top-(k80-1) customers must cover < 80%, top-k80 >= 80%
    val cents = graft.core.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("c"))
      .orderBy(col("c").desc, col("o_custkey"))
      .collect().map(_.getLong(1))
    val total = cents.sum
    val cumK = cents.take(k80.toInt).sum
    assert(cumK * 5 >= total * 4, "k80 must cover >= 80%")
    if (k80 > 1) assert(cents.take(k80.toInt - 1).sum * 5 < total * 4,
      "k80 must be the MINIMAL crossing rank")
  }

  test("q194: nation shares sum to ~1e6 within each region") {
    val out = Registry.byName("q194_region_share").run(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (region, rows) =>
      val sum = rows.map(r => r.getLong(r.fieldIndex("share_ppm"))).sum
      assert(sum > 1000000 - rows.length && sum <= 1000000,
        s"region $region shares sum $sum")
    }
  }

  test("q195: first week of every user is counted new exactly once; totals reconcile") {
    val out = Registry.byName("q195_new_vs_returning").run(spark, sf).collect()
    val totalNew = out.map(r => r.getLong(r.fieldIndex("n_new"))).sum
    val events = graft.core.Tables.events(spark, sf)
    assert(totalNew == events.select("user_id").distinct().count(),
      "every user is new in exactly one week")
    val totalActive = out.map(r => r.getLong(r.fieldIndex("n_new")) +
      r.getLong(r.fieldIndex("n_returning"))).sum
    val weeklyDistinct = events.select(col("user_id"),
      date_trunc("week", col("ts"))).distinct().count()
    assert(totalActive == weeklyDistinct)
  }

  test("q196: the peak window dominates every minute's own count") {
    val r = Registry.byName("q196_peak_rate").run(spark, sf).head()
    val peak = r.getLong(r.fieldIndex("peak_5min_events"))
    val maxMinute = graft.core.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 60000000").as("m"))
      .groupBy("m").count().agg(max("count")).head().getLong(0)
    assert(peak >= maxMinute, "a 5-minute window contains its busiest minute")
    assert(peak <= 5 * maxMinute, "a 5-minute window holds at most 5 busiest minutes")
  }

  test("q197: movers are sorted by |delta| and deltas reconcile") {
    val out = Registry.byName("q197_top_movers").run(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 10)
    val deltas = out.map(r => math.abs(r.getLong(r.fieldIndex("delta"))))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b })
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("cur_cents")) - r.getLong(r.fieldIndex("prev_cents"))
        == r.getLong(r.fieldIndex("delta")))
    }
  }

  test("q197: agg and lag window share ONE exchange (partkey repartition satisfies both)") {
    val p = Registry.byName("q197_top_movers").run(spark, sf)
      .queryExecution.executedPlan.toString
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nShuffles == 1,
      s"expected exactly 1 hash exchange (shared by groupBy + window), got $nShuffles:\n$p")
  }

  test("q198: diversity histogram accounts for every order") {
    val out = Registry.byName("q198_basket_diversity").run(spark, sf).collect()
    val n = out.map(r => r.getLong(r.fieldIndex("n_orders"))).sum
    assert(n == graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count())
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_brands")) >= 1)
    }
  }

  test("q199: above-average counts are positive and below the customer total") {
    val out = Registry.byName("q199_above_nation_avg").run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, above) = (r.getLong(r.fieldIndex("n_customers")),
        r.getLong(r.fieldIndex("n_above")))
      // someone is always strictly above unless every customer spends
      // exactly the mean; never ALL are above it
      assert(above >= 0 && above < n, s"${r.getString(0)}: $above of $n")
    }
  }

  test("q200: datasheet invariants hold per source") {
    val out = Registry.byName("q200_source_datasheet").run(spark, sf).collect()
    val nTotal = out.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    assert(nTotal == graft.core.Tables.documents(spark, sf).count())
    out.foreach { r =>
      val (n, u) = (r.getLong(r.fieldIndex("n_docs")), r.getLong(r.fieldIndex("n_unique")))
      assert(u <= n && u >= 1)
      val (lo, mean, hi) = (r.getLong(r.fieldIndex("min_chars")),
        r.getLong(r.fieldIndex("mean_chars")), r.getLong(r.fieldIndex("max_chars")))
      assert(lo <= mean && mean <= hi)
      assert(r.getLong(r.fieldIndex("dominant_lang_ppm")) > 0)
    }
  }

  test("q201: corr2 is a valid squared correlation and covariance sign matches") {
    val out = Registry.byName("q201_autocorrelation").run(spark, sf).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 7L))
    out.foreach { r =>
      val c2 = r.getLong(r.fieldIndex("corr2_ppm"))
      assert(c2 >= 0 && c2 <= 1000000, s"corr2_ppm $c2 outside [0, 1e6]")
      val dir = r.getLong(r.fieldIndex("direction"))
      val num = r.getLong(r.fieldIndex("cov_num"))
      assert(dir == (if (num < 0) -1L else 1L))
    }
  }

  test("q202: converted clicks never exceed clicks; 24 hour buckets at most") {
    val out = Registry.byName("q202_conversion_by_hour").run(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 24)
    out.foreach { r =>
      val h = r.getLong(r.fieldIndex("hour_of_day"))
      assert(h >= 0 && h <= 23)
      assert(r.getLong(r.fieldIndex("n_converted")) <= r.getLong(r.fieldIndex("n_clicks")))
    }
  }

  test("q179: one dominant language per source, share consistent with totals") {
    val out = Registry.byName("q179_dominant_lang").run(spark, sf).collect()
    val perSource = out.groupBy(_.getString(0))
    assert(perSource.values.forall(_.length == 1), "exactly one row per source")
    out.foreach { r =>
      val share = r.getLong(r.fieldIndex("share_ppm"))
      assert(share > 0 && share <= 1000000)
    }
  }
}
