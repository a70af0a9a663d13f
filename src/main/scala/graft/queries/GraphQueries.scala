package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.core.Tables

/** Graph analytics round 2 (round 8): fixed-round label propagation
  * (q177) and integer-exact HITS (q178). Both follow the q106 PageRank
  * discipline — every per-round reduction is over integers (mins /
  * path-count sums), so the result is associative, partitioning-
  * independent, and hash-matches a fully unrolled SQL oracle. Float
  * HITS (with per-round L2 normalization) could never hash-match; the
  * unnormalized power iteration counts weighted paths instead, which
  * preserves the RANKING the normalized scores would give (scaling is
  * monotone) while staying in BIGINT.
  */
object GraphQueries {

  val queries: Seq[GraftQuery] = Seq(

    // ---- q177: 3-round synchronous min-label propagation over the
    //      SPARSE co-order graph (orders with ≤ 3 distinct parts only
    //      — the full co-order graph is so dense it collapses to one
    //      label in 2 rounds, leaving nothing to verify) — the
    //      partial-convergence community probe: after k rounds a label
    //      is the min node id within k hops, so the label histogram
    //      measures contraction speed. One shuffle per round keyed by
    //      the neighbor end — the PageRank dataflow — with the
    //      adjacency checkpointed once and superseded label rounds
    //      released in-loop (operators.LabelProp). ----
    GraftQuery(
      "q177_label_propagation",
      (s, d) => {
        // no .distinct() on the pairs (the q104 rule): cross-order
        // duplicates dedup inside LabelProp's adjacency build — one
        // shuffle, not two
        val pairs = Relational5.coOrderPairs(s, d, maxParts = 3)
        val labels = graft.operators.LabelProp.propagate(pairs, rounds = 3)
        labels.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
      },
      Some("""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        small AS (SELECT l_orderkey FROM op GROUP BY l_orderkey HAVING count(*) <= 3),
        ops AS (SELECT op.* FROM op JOIN small USING (l_orderkey)),
        e AS (SELECT DISTINCT a.l_partkey u, b.l_partkey v
              FROM ops a JOIN ops b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        adj AS (SELECT u s, v t FROM e UNION ALL SELECT v, u FROM e),
        l0 AS (SELECT DISTINCT s AS node, s AS label FROM adj),
        l1 AS (SELECT a.s AS node, least(min(ls.label), min(lt.label)) AS label
               FROM adj a JOIN l0 ls ON ls.node = a.s JOIN l0 lt ON lt.node = a.t
               GROUP BY a.s),
        l2 AS (SELECT a.s AS node, least(min(ls.label), min(lt.label)) AS label
               FROM adj a JOIN l1 ls ON ls.node = a.s JOIN l1 lt ON lt.node = a.t
               GROUP BY a.s),
        l3 AS (SELECT a.s AS node, least(min(ls.label), min(lt.label)) AS label
               FROM adj a JOIN l2 ls ON ls.node = a.s JOIN l2 lt ON lt.node = a.t
               GROUP BY a.s)
        SELECT label, CAST(count(*) AS BIGINT) AS n_nodes
        FROM l3 GROUP BY label
      """)),

    // ---- q178: HITS hubs/authorities on the customer→supplier
    //      purchase graph (distinct (o_custkey, l_suppkey) via the
    //      order join), two unnormalized power-iteration rounds:
    //      auth1 = in-degree, hub1 = Σ auth1 over a customer's
    //      suppliers, auth2 = Σ hub1 over a supplier's customers —
    //      exact BIGINT path counts. Two sparse matvecs = two
    //      shuffles; the supplier-keyed score frames are dimension-
    //      sized and broadcast back for the final report. ----
    GraftQuery(
      "q178_hits_paths",
      (s, d) => {
        val edges = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey").as("c"))
          .join(Tables.lineitem(s, d)
            .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey").as("p")),
            Seq("o_orderkey"))
          .select(col("c"), col("p")).distinct()
          // referenced by all three matvec stages — materialize the
          // order⋈lineitem distinct once; the final plan still
          // references the checkpoint, so the consumer's
          // Lineage.release(result) frees it
          .localCheckpoint(true)
        val auth1 = edges.groupBy(col("p")).agg(count(lit(1)).as("auth1"))
        val hub1 = edges.join(broadcast(auth1), Seq("p"))
          .groupBy(col("c")).agg(sum(col("auth1")).as("hub1"))
        val auth2 = edges.join(hub1, Seq("c"))
          .groupBy(col("p")).agg(sum(col("hub1")).as("auth2"))
        auth2.join(broadcast(auth1), Seq("p"))
          .orderBy(col("auth2").desc, col("p"))
          .limit(15)
          .select(col("p").as("supp"), col("auth1"), col("auth2"))
      },
      Some("""
        WITH e AS (SELECT DISTINCT o.o_custkey c, l.l_suppkey p
                   FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        a1 AS (SELECT p, CAST(count(*) AS BIGINT) auth1 FROM e GROUP BY p),
        h1 AS (SELECT e.c, CAST(sum(a1.auth1) AS BIGINT) hub1
               FROM e JOIN a1 USING (p) GROUP BY e.c),
        a2 AS (SELECT e.p, CAST(sum(h1.hub1) AS BIGINT) auth2
               FROM e JOIN h1 USING (c) GROUP BY e.p)
        SELECT a2.p AS supp, a1.auth1, a2.auth2
        FROM a2 JOIN a1 USING (p)
        ORDER BY auth2 DESC, p LIMIT 15
      """)),

    // ---- q180: market-basket lift — top part pairs by
    //      lift = P(u,v) / (P(u)·P(v)), the association-rule kernel,
    //      in exact parts-per-billion (decimal(38,0) cross-multiplied:
    //      1e9·co·N / (cu·cv) overflows int64 at sf0.1, and HUGEINT /
    //      decimal is what both engines agree on). Support floor
    //      co ≥ 2 prunes the noise pairs BEFORE the per-part count
    //      joins; the per-part counts are dimension-sized and
    //      broadcast. coOrderPairs' in-array expansion means one
    //      shuffle for the co-counts — no lineitem self-join. ----
    GraftQuery(
      "q180_basket_lift",
      (s, d) => {
        // ONE lineitem shuffle for all three aggregates (r16): the
        // co-pair expansion's grouped part-set frame already holds the
        // distinct (order, part) relation — its row count IS the
        // distinct order count and explode(ps) counted per part IS the
        // per-part order count — so the former separate
        // lineitem.distinct() checkpoint was a second full scan +
        // shuffle of the same relation (guide §1.2).
        val grouped = Relational5.groupedPartSets(s, d).localCheckpoint(true)
        val n = grouped.select(count(lit(1)).as("n"))
        val cnt = grouped.select(explode(col("ps")).as("l_partkey"))
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        val co = Relational5.coOrderPairsFrom(grouped)
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("co"))
          .where(col("co") >= 2)
        co.join(broadcast(cnt.select(col("l_partkey").as("u"), col("c").as("cu"))), Seq("u"))
          .join(broadcast(cnt.select(col("l_partkey").as("v"), col("c").as("cv"))), Seq("v"))
          .crossJoin(broadcast(n))
          .withColumn("lift_ppb",
            expr("cast(cast(1000000000 as decimal(38,0)) * co * n div (cu * cv) as bigint)"))
          .orderBy(col("lift_ppb").desc, col("u"), col("v"))
          .limit(20)
          .select(col("u"), col("v"), col("co"), col("cu"), col("cv"), col("lift_ppb"))
      },
      Some("""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) n FROM op),
        cnt AS (SELECT l_partkey, CAST(count(*) AS BIGINT) c FROM op GROUP BY l_partkey),
        co AS (SELECT a.l_partkey u, b.l_partkey v, CAST(count(*) AS BIGINT) co
               FROM op a JOIN op b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT co.u, co.v, co.co, cu.c AS cu, cv.c AS cv,
          CAST(CAST(1000000000 AS HUGEINT) * co.co * n.n // (cu.c * cv.c) AS BIGINT)
            AS lift_ppb
        FROM co JOIN cnt cu ON cu.l_partkey = co.u
                JOIN cnt cv ON cv.l_partkey = co.v, n
        ORDER BY lift_ppb DESC, co.u, co.v LIMIT 20
      """)),

    // ---- q181: exact degree distribution of the co-order graph —
    //      the first thing anyone profiles about a graph before
    //      choosing join strategies (max degree bounds the triangle /
    //      CC skew). Two map-side-combined aggregates; row count is
    //      bounded by the max degree, not the node count. ----
    GraftQuery(
      "q181_degree_distribution",
      (s, d) => {
        val e = Relational5.coOrderPairs(s, d).distinct()
        // explode(array(u,v)), not unionAll of two selects: a unionAll
        // embeds the pair-expansion lineage TWICE, so the whole
        // scan→collect_set→expand→distinct pipeline executed once per
        // branch (plan audit: 4 lineitem scans). The explode emits the
        // identical two-rows-per-pair multiset from ONE evaluation.
        val deg = e.select(explode(array(col("u"), col("v"))).as("x"))
          .groupBy(col("x")).agg(count(lit(1)).as("degree"))
        deg.groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      },
      Some("""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT DISTINCT a.l_partkey u, b.l_partkey v
              FROM op a JOIN op b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        deg AS (SELECT x, CAST(count(*) AS BIGINT) degree
                FROM (SELECT u x FROM e UNION ALL SELECT v FROM e) t
                GROUP BY x)
        SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY degree
      """)),

    // ---- q186: global clustering coefficient — 3·triangles / wedges,
    //      the one-number "how cliquish" summary (with q181's degree
    //      profile, the two standard graph health checks). The
    //      triangle side reuses operators.Triangles (per-vertex counts
    //      sum to exactly 3T); wedges are Σ d(d−1)/2 from one degree
    //      aggregate. All-integer, ppm by truncating division; the
    //      oracle recounts triangles naively (orientation-invariant
    //      result, the q104 precedent). ----
    GraftQuery(
      "q186_clustering_coefficient",
      (s, d) => {
        // ONE materialization total: the raw pair expansion flows
        // straight into Triangles.adjacency (which dedups via
        // array_distinct and checkpoints internally); triangles AND
        // degrees/wedges both derive from that staged |V|-row frame.
        // (Previously the edge list was localCheckpoint-ed here and the
        // adjacency checkpointed again inside Triangles — paid twice.)
        val adj = graft.operators.Triangles.adjacency(Relational5.coOrderPairs(s, d))
        // coalesce(…, 0): on a triangle-free/empty graph sum over zero
        // rows is NULL while the oracle's 3*count(*) is 0 — keep the
        // degenerate inputs convergent too (advice r8)
        val tri3 = graft.operators.Triangles.trianglesFromAdjacency(adj)
          .agg(coalesce(lit(3L) * count(lit(1)), lit(0L)).as("n_tri3"))
        val wedges = graft.operators.Triangles.degreesFromAdjacency(adj)
          .agg(coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L)).as("n_wedges"))
        tri3.crossJoin(wedges)
          .select(col("n_tri3"), col("n_wedges"),
            expr("cast(1000000 * n_tri3 div n_wedges as bigint)").as("coeff_ppm"))
      },
      Some("""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT DISTINCT a.l_partkey u, b.l_partkey v
              FROM op a JOIN op b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        t AS (SELECT CAST(3 * count(*) AS BIGINT) n_tri3
              FROM e e1 JOIN e e2 ON e2.u = e1.v
                        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        deg AS (SELECT x, count(*) d
                FROM (SELECT u x FROM e UNION ALL SELECT v FROM e) q
                GROUP BY x),
        w AS (SELECT CAST(COALESCE(sum(d * (d - 1) // 2), 0) AS BIGINT) n_wedges FROM deg)
        SELECT n_tri3, n_wedges,
          CAST(1000000 * n_tri3 // n_wedges AS BIGINT) AS coeff_ppm
        FROM t, w
      """))
  )
}
