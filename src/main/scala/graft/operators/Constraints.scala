package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ-style
  * validation pass a pipeline runs before publishing a table).
  *
  * A rule set compiles into the minimum number of Spark jobs:
  * - every ROW-LOCAL rule (not-null, range, accepted values, regex)
  *   folds into ONE conditional-sum aggregate over a single scan of
  *   the table, however many rules there are;
  * - each uniqueness rule is one hash aggregate on its key columns
  *   (count>1 groups summed — no distinct-then-join);
  * - each referential rule is one left join against the distinct
  *   reference keys (AQE broadcasts small dimension key sets).
  *
  * The report has one row per rule — `(rule, violations, total, ok)`
  * — all counts exact longs, so it hash-checks cross-engine. Null
  * handling: a NULL value VIOLATES range/accepted/regex/FK rules (a
  * row that cannot prove compliance is non-compliant; callers who
  * want null-tolerant ranges add an explicit NotNull rule instead of
  * getting silent null passes).
  */
object Constraints {

  sealed trait Rule { def name: String }

  /** `column` must never be null. */
  final case class NotNull(name: String, column: String) extends Rule
  /** `column` in [lo, hi] (inclusive); null violates. */
  final case class InRange(name: String, column: String, lo: Double, hi: Double)
    extends Rule
  /** `column` drawn from `values`; null violates. */
  final case class Accepted(name: String, column: String, values: Seq[String])
    extends Rule
  /** `column` matches the Java regex (full-match not required — use
    * anchors for one); null violates. */
  final case class MatchesRegex(name: String, column: String, regex: String)
    extends Rule
  /** `columns` form a key: no combination may appear twice. Violations
    * count every row participating in a duplicated key. */
  final case class Unique(name: String, columns: Seq[String]) extends Rule
  /** `columns` must appear in `ref`'s `refColumns` (null FK violates). */
  final case class ForeignKey(name: String, columns: Seq[String],
      ref: DataFrame, refColumns: Seq[String]) extends Rule {
    require(columns.length == refColumns.length,
      s"$name: fk column arity ${columns.length} != ref arity ${refColumns.length}")
  }

  private def violationExpr(r: Rule): Column = r match {
    case NotNull(_, c) => col(c).isNull
    case InRange(_, c, lo, hi) =>
      col(c).isNull || col(c) < lit(lo) || col(c) > lit(hi)
    case Accepted(_, c, vs) => col(c).isNull || !col(c).isin(vs: _*)
    case MatchesRegex(_, c, re) => col(c).isNull || !col(c).rlike(re)
    case _ => throw new IllegalArgumentException(s"not row-local: $r")
  }

  /** Evaluate every rule against `df`; one report row per rule in the
    * given order is NOT guaranteed (the result is a plain DataFrame —
    * sort by `rule` for stable presentation).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.groupBy(_.name).collect {
        case (n, g) if g.size > 1 => n }.mkString(",")}")
    val rowLocal = rules.collect {
      case r @ (_: NotNull | _: InRange | _: Accepted | _: MatchesRegex) => r
    }
    val frames = Seq.newBuilder[DataFrame]

    if (rowLocal.nonEmpty) {
      // coalesce: sum over ZERO rows is null, and an empty table must
      // report (violations 0, ok 1), not a null that poisons the struct
      val sums = rowLocal.zipWithIndex.map { case (r, i) =>
        coalesce(sum(when(violationExpr(r), 1L).otherwise(0L)), lit(0L)).as(s"_v$i")
      }
      val agg = df.agg(count(lit(1)).as("_total"), sums: _*)
      val entries = rowLocal.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), col(s"_v$i").as("violations"))
      }
      frames += agg
        .select(col("_total"), explode(array(entries: _*)).as("e"))
        .select(col("e.rule").as("rule"), col("e.violations").as("violations"),
          col("_total").as("total"))
    }

    rules.foreach {
      case Unique(name, cols) =>
        frames += df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("_c"))
          .agg(
            coalesce(sum(when(col("_c") > 1, col("_c")).otherwise(0L)), lit(0L))
              .as("violations"),
            coalesce(sum(col("_c")), lit(0L)).as("total"))
          .select(lit(name).as("rule"), col("violations"), col("total"))
      case ForeignKey(name, cols, ref, refCols) =>
        // LEFT join (not anti) so total and violations ride one pass;
        // distinct keys first so a many-row reference can't multiply
        val refKeys = ref
          .select(refCols.zip(cols).map { case (rc, c) => col(rc).as(c) }: _*)
          .distinct().withColumn("_hit", lit(1L))
        frames += df.select(cols.map(col): _*)
          .join(refKeys, cols, "left")
          .agg(count(lit(1)).as("total"),
            coalesce(sum(when(col("_hit").isNull, 1L).otherwise(0L)), lit(0L))
              .as("violations"))
          .select(lit(name).as("rule"), col("violations"), col("total"))
      case _ => () // row-local: handled above
    }

    frames.result().reduce(_ unionAll _)
      .withColumn("ok", (col("violations") === 0L).cast("long"))
  }
}
