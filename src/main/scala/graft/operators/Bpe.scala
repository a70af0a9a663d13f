package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization — both halves: greedy merge-table
  * TRAINING (the q120 merge step iterated to a vocabulary) and merge
  * APPLICATION (tokenize a corpus with a trained table). Together with
  * sequence packing (Resample) this closes the "pack context windows in
  * real tokens" loop of an LLM data pipeline.
  *
  * Representation: a word's symbolization is a single SEP-delimited
  * string ` sym  sym ` (leading + trailing SEP).
  * Applying one merge (l, r) is then a LEFT FOLD over the symbols with
  * the string as accumulator — `ends_with(acc, SEP·l·SEP) && x == r`
  * rewrites the tail — which is exactly the repeated-leftmost-merge
  * semantics of classic BPE (after a merge the new symbol becomes the
  * fold's tail and cannot re-match `l` unless `l == l+r`, the same
  * rescan position the iterative definition uses). The fold is a
  * codegen-free but native `aggregate` higher-order function — no UDF.
  *
  * Scale shape (100 TB): training never touches the corpus after ONE
  * word-frequency aggregate — every merge round runs over the
  * VOCABULARY table (≈100 k rows for web text, size-independent of the
  * corpus), localCheckpoint-ed per round with superseded-block release
  * (the LabelProp discipline). Application folds each DISTINCT word
  * once and joins the result back to token occurrences — O(vocab ·
  * merges) fold work plus one join that AQE broadcasts while the vocab
  * side is small.
  *
  * Determinism (what makes it oracle-checkable): the merge pick is
  * total-ordered — pair count desc, then (l, r) lexicographic on the
  * two symbols SEPARATELY (a joined `l·r` string key would order
  * prefix-sharing symbols differently).
  */
object Bpe {

  /** Symbol separator. Out-of-band by construction for any corpus that
    * has no U+0001 in its tokens (tokens are `\S+`, so the only way in
    * is a document containing the control char itself — scrub upstream
    * if so).
    */
  val Sep = "\u0001"

  /** Symbols of a delimited symbolization (drops the boundary blanks
    * that split() produces for the leading/trailing SEP).
    */
  def symsOf(symstr: Column): Column =
    filter(split(symstr, Sep), s => s =!= "")

  /** A word as its initial character symbolization. */
  def initialSymstr(w: Column): Column =
    concat(lit(Sep),
      array_join(transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))), Sep),
      lit(Sep))

  /** Apply ONE merge (l, r) to a symbolization — the string-accumulator
    * fold derived in the object doc. `l`/`r` are plan-time literals
    * (merge tables are driver-small by nature).
    *
    * The tail-trim length is in CODE POINTS (`codePointCount`), because
    * Spark's `length`/`substr` count code points while Java's
    * `String.length` counts UTF-16 units — a supplementary-plane char
    * in `l` (emoji in web text) would otherwise over-trim by one per
    * astral char and silently corrupt the symbolization (advice r11).
    */
  def applyOneMerge(symstr: Column, l: String, r: String): Column =
    aggregate(symsOf(symstr), lit(Sep), (acc, x) =>
      when(acc.endsWith(lit(Sep + l + Sep)) && x === lit(r),
        concat(acc.substr(lit(1),
          length(acc) - lit(l.codePointCount(0, l.length) + 1)), lit(l + r + Sep)))
        .otherwise(concat(acc, x, lit(Sep))))

  /** Full merge-table application: fold a word through the trained
    * merges in rank order.
    */
  def applyMerges(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(initialSymstr(w)) { case (s, (l, r)) => applyOneMerge(s, l, r) }

  /** Adjacent symbol pairs of the current symbolization, exploded —
    * guarded for single-symbol words (Spark's sequence(1, 0) counts
    * DOWN; the guard is the q120 precedent).
    */
  private def pairCol(symstr: Column): Column = {
    val syms = symsOf(symstr)
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
  }

  /** Train `nMerges` BPE merges over the corpus (greedy, classic):
    * per round, the most frequent adjacent symbol pair — occurrence
    * counts weighted by word frequency — is merged everywhere. Returns
    * the merges in rank order. Fails loudly if the corpus runs out of
    * pairs before `nMerges` (a caller asking for a 32k vocab over a
    * 10-word corpus should hear about it, not get 7 merges silently).
    */
  def trainMerges(
      docs: DataFrame, nMerges: Int, textCol: String = "text"): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    // ONE corpus pass: everything after this is vocabulary-sized
    var vocab = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), initialSymstr(col("w")).as("symstr"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    try {
      for (i <- 1 to nMerges) {
        val top = vocab
          .select(col("freq"), explode(pairCol(col("symstr"))).as("pr"))
          .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
          .agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("l"), col("r"))
          .limit(1).collect()
        require(top.nonEmpty,
          s"BPE training exhausted adjacent pairs after ${i - 1} merges (requested $nMerges)")
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        if (i < nMerges) {
          val next = vocab
            .select(col("w"), col("freq"), applyOneMerge(col("symstr"), l, r).as("symstr"))
            .localCheckpoint()
          Lineage.release(vocab) // superseded the moment `next` materialized
          vocab = next
        }
      }
      merges.result()
    } finally Lineage.release(vocab)
  }

  /** Tokenize a corpus with a trained merge table: per document, the
    * BPE token count and an md5 witness of the full symbolization in
    * token order. Folds each DISTINCT word once, then joins back to
    * occurrences (AQE broadcasts the vocab side while it is small) —
    * the fold cost is O(vocab), not O(corpus tokens).
    */
  def subwordReport(
      docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val occ = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(graft.functions.TextFunctions.tokens(col(textCol))).as(Seq("pos", "w")))
    val vocab = occ.select(col("w")).distinct()
      .select(col("w"), applyMerges(col("w"), merges).as("symstr"))
      .select(col("w"), col("symstr"), size(symsOf(col("symstr"))).cast("long").as("nsym"))
    occ.join(vocab, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("nsym")).as("n_bpe_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("symstr")))),
          s => s.getField("symstr")), "")).as("bpe_md5"))
  }
}
