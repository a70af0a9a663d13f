package graft.dev

/** THE standing streaming-store soak gate (round-12 verdict #7): one
  * command that soaks BOTH LSM-segmented stores — the substring-dedup
  * gram index ([[SubstringSoak]]) and the ANN assignments store
  * ([[AnnSoak]]) — through 50 real micro-batches at the given scale
  * factor, printing the per-trigger wall/bytes columns recorded as the
  * reference table in BASELINE.md ("Standing store-soak gate").
  * Re-run after any store/compaction change and DIFF against that
  * table: a publish-bytes column that starts tracking store size (not
  * batch size), an unbounded live-segment count, or a probe/merge
  * identity failure is a regression.
  *
  * Usage: sbt "Test/runMain graft.dev.StoreSoaks [sfDir]"
  *   (default /root/testdata/sf1 — the recorded gate scale)
  */
object StoreSoaks {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf1")
    val batches = args.drop(1).headOption.getOrElse("50")
    println(s"[storesoaks] substring-dedup store @ $sfDir")
    SubstringSoak.main(Array(sfDir, batches, "8"))
    println(s"[storesoaks] ANN store @ $sfDir")
    AnnSoak.main(Array(sfDir, batches, "8"))
    println("[storesoaks] both stores green")
  }
}
