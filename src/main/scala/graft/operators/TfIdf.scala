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

  /** Tokenizer-vocabulary build: corpus-wide term frequencies, cut at
    * `minCount`, capped at the `maxSize` most frequent, with dense
    * deterministic ids assigned by (freq DESC, token ASC) — the standard
    * "train the vocab" pass before tokenization.
    *
    * Scale shape: one (token) shuffle with map-side partial counts, then
    * the cap is a distributed top-k (TakeOrderedAndProject keeps maxSize
    * rows per partition pre-merge — never a global sort of the
    * vocabulary), and only the ≤ maxSize survivors see the id-assignment
    * window. Output: (token, token_id, freq). */
  def buildVocab(
      docs: DataFrame,
      text: Column,
      minCount: Long = 2L,
      maxSize: Int = 30000): DataFrame = {
    val freq = docs
      .select(explode(split(lower(text), "[^a-z]+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
      .orderBy(col("freq").desc, col("token"))
      .limit(maxSize)
    freq
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("freq").desc, col("token")))
          .cast("long"))
      .select(col("token"), col("token_id"), col("freq"))
  }

  /** Encode documents as token-id sequences under a vocabulary from
    * [[buildVocab]] — the tokenize step between scrubbed text and
    * sequence packing. Out-of-vocabulary tokens map to `oovId` (0; the
    * vocab's dense ids start at 1).
    *
    * Scale shape: tokens explode WITH their position, join the
    * vocabulary on the token key (vocab is capped at maxSize, so Spark
    * broadcasts it when it fits — the common case), and each document
    * reassembles by sorting its (pos, id) pairs inside one aggregate —
    * order survives the shuffle without a window or a global sort.
    *
    * Output: (doc_id, n_tokens, ids: array<long>). */
  def encode(
      docs: DataFrame,
      id: Column,
      text: Column,
      vocab: DataFrame, // (token, token_id, …) from buildVocab
      oovId: Long = 0L): DataFrame = {
    val toks = docs
      .select(id.as("doc_id"),
        posexplode(split(lower(text), "[^a-z]+")).as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)
    toks
      .join(vocab.select(col("token"), col("token_id")), Seq("token"), "left")
      .withColumn("tid", coalesce(col("token_id"), lit(oovId)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          s => s("tid")).as("ids"))
  }

  /** Unigram language-model scoring: every document's mean negative log
    * probability under the corpus's own unigram distribution — the
    * classic perplexity-style quality signal (CCNet-family pipelines
    * score against an LM and drop the worst tail; a unigram model is its
    * engine-friendly degenerate case, exact and fully relational).
    *
    * Scale shape: the model (token → freq) is an aggregate over the
    * exploded corpus; scoring joins tokens to the model on the token key
    * — at web scale the model table is vocabulary-sized, so the join is
    * a broadcast when it fits and a plain equi-join when it doesn't
    * (Spark/AQE decides from stats; nothing here forces either).
    *
    * Reproducibility: each token's −ln p is quantized to DECIMAL(18,6)
    * BEFORE accumulating (the repo's xsum discipline). This makes the
    * per-doc sum exact and partition-order independent, and absorbs the
    * last-ulp disagreement between libm implementations of ln (Java vs
    * DuckDB) that a raw double sum would amplify into a hash mismatch —
    * a 1-ulp input difference lands on a 1e-6 rounding boundary with
    * probability ~1e-9 per distinct vocabulary value.
    *
    * Output: (doc_id, n_tokens, nll) — nll = mean −ln p(token). */
  def unigramLogProb(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs
      .select(id.as("doc_id"),
        explode(split(lower(text), "[^a-z]+")).as("token"))
      .filter(length(col("token")) > 0)
    val model = toks.groupBy("token").agg(count(lit(1)).as("freq"))
    val total = toks.select(count(lit(1)).as("n_total"))
    toks
      .join(model, Seq("token")) // trained on the same corpus: never misses
      .crossJoin(broadcast(total)) // single-row scalar
      .withColumn("neglogp",
        (-log(col("freq").cast("double") / col("n_total").cast("double")))
          .cast("decimal(18,6)"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("neglogp")).cast("double") / count(lit(1))).as("nll"))
  }
}
