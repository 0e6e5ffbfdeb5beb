package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] TF-IDF term weighting over a document corpus — the text-analysis
  * primitive a training-data pipeline uses for keyword extraction and
  * quality filtering (the reference has no text surface; the `documents`
  * fixture table is the driver's hook).
  *
  * Scale shape (100 TB corpus):
  *  - term frequencies: one shuffle on (doc_id, term) with map-side
  *    partial aggregation — the corpus bodies are exploded ONCE and only
  *    (id, term, count) triples move;
  *  - document frequencies: a count-window over the tf table partitioned
  *    by term — NOT a separate aggregate joined back. A join formulation
  *    either re-scans and re-explodes the corpus for a second tf subtree
  *    (Catalyst does not dedupe common subplans) or broadcasts the full
  *    vocabulary df table, which at web-corpus scale is millions of
  *    terms — both wrong; the window costs one shuffle of the small
  *    (doc, term, tf) triples instead;
  *  - corpus size N: a single-row count aggregate, broadcast — the scan
  *    is column-pruned to row-group metadata, no text pages read;
  *  - per-doc top-k: ranked window partitioned by doc_id (Spark inserts
  *    WindowGroupLimit, so each partition keeps only k candidates
  *    pre-shuffle) — never a global sort.
  */
object TfIdf {

  /** Top-k TF-IDF terms per document, tokenized on single spaces
    * (mirroring split(text, ' ') — the repo-wide token convention).
    *
    * Ranking is by (tf DESC, df ASC, term ASC): integers and strings
    * only, so the ordering is exactly reproducible in any engine. The
    * reported `score` is the linear IDF variant tf·N/df — order-
    * equivalent to tf·log(N/df) for fixed tf (log is monotone), but
    * bit-identical across engines because it stays in IEEE +,·,/ (libm
    * log implementations differ in the last ulp).
    *
    * Output: (doc_id, rank, term, tf, df, score). */
  def topTerms(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(split(text, " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val total = docs.select(count(lit(1)).as("n_docs"))
    val ranked = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(total)) // single-row N: broadcast, never shuffled
      .withColumn("score",
        col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("rank", row_number().over(ranked).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("df"), col("score"))
  }
}
