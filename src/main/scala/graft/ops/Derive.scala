package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar derivations E1-E8 (SURVEY.md §2.4). All are built-in, codegen'd
  * Catalyst expressions — the reference's two lambdas reduce to
  * `when`/`contains`/`lower` (§2.9: zero custom expressions needed).
  */
object Derive {

  /** E1+E2 (divergence D1): trim + title-case. `initcap` treats only
    * whitespace as word boundaries ("king's lynn" → "King's Lynn"),
    * unlike pandas `str.title` which capitalizes after any non-alpha
    * ("King'S Lynn") — initcap is the correct behavior for LA names and
    * matches the DuckDB oracle.
    */
  def cleanName(c: Column): Column = initcap(trim(c))

  /** D1 COMPAT lane (opt-in, round 11): pandas `str.title` semantics to
    * the letter — a letter is uppercased iff the PREVIOUS character is
    * non-alphabetic (so "king's lynn" → "King'S Lynn", apostrophe
    * included), all other letters lowercased. Implemented as a native
    * per-character fold (`aggregate` over `split`) — no UDF; the
    * `upper(x) = lower(x)` test is the case-insensitive "not a letter"
    * predicate. Default pipelines keep [[cleanName]] (initcap), which
    * is the better behavior for LA names and what the oracle encodes;
    * this lane exists for byte-parity with the reference output.
    */
  def cleanNamePandasTitle(c: Column): Column =
    aggregate(split(trim(c), ""), lit(""), (acc, x) => {
      val prev = substring(acc, -1, 1)
      val prevNonAlpha = upper(prev) === lower(prev) // '' and punct ⇒ true
      concat(acc, when(prevNonAlpha, upper(x)).otherwise(lower(x)))
    })

  /** E3: first digit-run in a melted header name; null (not "") when
    * absent — `regexp_extract` returns "" on no-match where pandas
    * returns NaN.
    */
  def yearGroupFromHeader(c: Column): Column = {
    val d = regexp_extract(c, "(\\d+)", 1)
    when(d === "", lit(null)).otherwise(d)
  }

  /** E4 (N6): any header not containing "females" is Male — verbatim
    * reference substring test, including hypothetical "persons" headers.
    */
  def genderFromHeader(c: Column): Column =
    when(c.contains("females"), "Female").otherwise("Male")

  /** E5: case-insensitive "vaccinated" test selects the metric name. */
  def metricFromHeader(c: Column): Column =
    when(lower(c).contains("vaccinated"), "Number_Vaccinated").otherwise("Number")

  // --- driver-side scalar extraction (E6-E8; evaluated once per file
  //     on cell A1, then injected via lit — SURVEY §2.2 P7) ---

  /** E6: last whitespace token of A1 as the academic-year end, e.g.
    * "... September 2023 to August 2024" → 2024. None when unparseable
    * (divergence D3 family: fail-soft + validate rather than crash).
    */
  def academicYearEnd(a1: String): Option[Int] =
    a1.trim.split("\\s+").lastOption.flatMap(_.toIntOption)

  /** E7 (D3): the academic-year phrase; None when A1 doesn't match (the
    * engine still always adds the column, as null).
    */
  def academicYearText(a1: String): Option[String] =
    "([A-Za-z]+ \\d{4} to [A-Za-z]+ \\d{4})".r.findFirstIn(a1)
}
