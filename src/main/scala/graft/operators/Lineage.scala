package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for localCheckpoint-backed plans.
  *
  * `Dataset.unpersist` only covers CacheManager entries; a
  * localCheckpoint's data lives in the RDD its LogicalRDD wraps, so
  * frames returned by the iterative/incremental operators (which
  * checkpoint internally — [[KCore]], [[Components]],
  * [[Dedup.minhashLshIncremental]]) pin block-manager storage until
  * the SparkContext dies. Batch jobs don't care; a LONG-LIVED driver
  * (streaming ingest loop, query service) must release what it has
  * finished consuming or storage grows with every call.
  *
  * [[release]] walks a plan and unpersists every checkpoint it
  * references. After it, the frame is UNRECOMPUTABLE (checkpointing
  * truncated the lineage that could have rebuilt it) — call it only
  * once the result is consumed (collected / written), on a frame no
  * other live plan shares.
  */
object Lineage {

  /** Unpersist every localCheckpoint block the plan of `df` references.
    * Idempotent; safe on plans with no checkpoints.
    *
    * `blocking = true` waits for block deletion — use it when the next
    * thing on this host is latency-sensitive (a bench loop): an async
    * release overlaps its deletion I/O with whatever runs next.
    */
  def release(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = blocking)
      case _             => ()
    }

  /** Eagerly checkpoint `ds`, then release the checkpoint blocks its
    * OWN plan staged — they are superseded the moment the new
    * checkpoint materializes, but the truncation also hides them from
    * any later `release` (the plan that referenced them is gone). This
    * is the correct way to re-stage an operator result whose internals
    * already checkpointed (the q55/q36 shape: `minhashLsh(...)
    * .localCheckpoint(true)` orphaned the operator's shingle/band
    * stages — observed as bench leaks); callers must not reuse the
    * ORIGINAL frame afterwards.
    */
  def rebase[T](ds: Dataset[T]): Dataset[T] = {
    val cp = ds.localCheckpoint(true)
    release(ds)
    cp
  }
}
