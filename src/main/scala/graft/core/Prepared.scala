package graft.core

/** Single-use staging slots for the bench's build/probe split.
  *
  * An index-backed query's `prepare` hook builds its index (Lloyd
  * steps, PQ codebook training, exact-anchor checkpoint) and `put`s it
  * here; the query's `run` then `take`s it — or, when nothing was
  * staged (the Verify/correctness path never calls prepare), builds
  * inline. `take` REMOVES the slot: a staged artifact is consumed
  * exactly once, so a stale entry can never hand a later run frames
  * whose cache blocks were already swept (Bench unpersists everything
  * between queries).
  */
object Prepared {
  private val slots = new java.util.concurrent.ConcurrentHashMap[String, Any]()

  def put(key: String, v: Any): Unit = { slots.put(key, v); () }

  /** Remove and return the staged value, if any. The cast is the
    * caller's contract: prepare and run are written together in the
    * same GraftQuery, so the type is known at both ends.
    */
  def take[T](key: String): Option[T] =
    Option(slots.remove(key)).map(_.asInstanceOf[T])

  /** Drop every slot whose key starts with `prefix` — the prepare-
    * failure cleanup: a prepare that staged SOME of its slots and then
    * threw must not let run() consume the partial staging, or the
    * successfully-built part's cost silently vanishes from the bench
    * total (no build recorded, no inline build timed).
    */
  def dropPrefix(prefix: String): Unit = {
    val it = slots.keySet.iterator()
    while (it.hasNext) if (it.next().startsWith(prefix)) it.remove()
  }
}
