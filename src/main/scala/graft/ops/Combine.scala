package graft.ops

import org.apache.spark.sql.DataFrame

/** Set combination (SURVEY.md §2.6 U1-U3). */
object Combine {

  /** Union-all by column NAME with null-fill for missing columns —
    * pandas `concat` aligns on labels (reference `src/main.py:77`);
    * Spark's positional `union` would silently mis-align, so
    * `unionByName(allowMissingColumns = true)` is the faithful mapping.
    */
  def unionByNameAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionByNameAll of zero inputs")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
