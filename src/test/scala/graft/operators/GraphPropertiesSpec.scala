package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.scalacheck.Test.{check, Parameters}
import graft.SparkTestBase

/** Property tests for the graph/vector round-4 operators — randomized
  * graphs and vectors hit degenerate shapes (isolated vertices, stars,
  * duplicate edges, zero vectors) that fixed examples miss. Spark jobs
  * are slow per-case, so minSuccessful is kept small; the generators
  * bias toward small dense graphs where triangles/ranks actually vary.
  */
class GraphPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(8)
  private def assertHolds(p: Prop, label: String): Unit = {
    val r = check(params, p)
    assert(r.passed, s"$label: $r")
  }

  private val edgeListGen: Gen[List[(Long, Long)]] =
    Gen.choose(5, 14).flatMap { v =>
      Gen.listOfN(60, for {
        a <- Gen.choose(0L, v.toLong - 1)
        b <- Gen.choose(0L, v.toLong - 1)
      } yield (math.min(a, b), math.max(a, b)))
        .map(_.filter { case (a, b) => a != b })
    }

  test("triangles: both orientations equal the naive wedge count on random graphs") {
    assertHolds(forAll(edgeListGen) { pairs =>
      pairs.nonEmpty ==> {
        val e = pairs.toDF("u", "v")
        val naive = {
          val d = e.distinct()
          d.as("e1").join(d.as("e2"), col("e2.u") === col("e1.v"))
            .join(d.as("e3"),
              col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"), "leftsemi")
            .count()
        }
        Triangles.triangles(e).count() == naive &&
          Triangles.triangles(e, degreeOriented = true).count() == naive
      }
    }, "triangle orientation equivalence")
  }

  test("pagerank: ranks positive, bounded by total mass, partition-invariant") {
    assertHolds(forAll(edgeListGen) { pairs =>
      pairs.nonEmpty ==> {
        val arcs = PageRank.bothDirections(pairs.toDF("u", "v").distinct())
        val r = PageRank.ranks(arcs, iters = 2).as[(Long, Long)].collect().toMap
        val r2 = PageRank.ranks(arcs.repartition(5), iters = 2)
          .as[(Long, Long)].collect().toMap
        // every rank in (0, Scale]; undirected graphs have no dangling
        // mass INTO a vertex beyond total, and fixed-point truncation
        // only loses mass
        r.values.forall(v => v > 0 && v <= PageRank.Scale) &&
          r.values.sum <= PageRank.Scale + r.size && // +size: per-vertex base rounding
          r == r2
      }
    }, "pagerank bounds + invariance")
  }

  test("quantize: codes bounded, peak saturates, zero vector stays zero") {
    val vecGen: Gen[List[(Long, List[Float])]] =
      Gen.choose(1, 6).flatMap { n =>
        Gen.listOfN(n, Gen.listOfN(8, Gen.choose(-100, 100).map(_ / 7.0f)))
      }.map(_.zipWithIndex.map { case (v, i) => (i.toLong, v) })
    assertHolds(forAll(vecGen) { rows =>
      rows.nonEmpty ==> {
        val df = rows.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")
        val codes = Quantize.quantized(df, "vec_id", "embedding")
          .as[(Long, Seq[Long])].collect().toMap
        rows.forall { case (id, v) =>
          val c = codes(id)
          val allZero = v.forall(_ == 0f)
          c.forall(x => x >= -127 && x <= 127) &&
            (if (allZero) c.forall(_ == 0L)
             else c.map(math.abs).max == 127L)
        }
      }
    }, "quantize bounds")
  }
}
