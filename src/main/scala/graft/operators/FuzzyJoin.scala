package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Fuzzy (approximate-string) join: all (left, right) pairs with
  * levenshtein(key_l, key_r) <= maxDist — entity resolution over dirty
  * keys, at scale, WITHOUT the O(n·m) cross join.
  *
  * Algorithm: prefix-filtered q-gram blocking (the SSJoin/PPJoin family,
  * Chaudhuri et al. ICDE'06, Xiao et al. WWW'08), composed entirely from
  * relational ops:
  *
  *  1. every key emits its distinct character q-grams (map-side
  *     generator expressions);
  *  2. one aggregate over both sides builds the global gram-frequency
  *     order (rarest first — any TOTAL order is correct; rarity makes
  *     the blocks small);
  *  3. each key keeps only its `maxDist·q + 1` rarest grams — its
  *     SIGNATURE. One edit destroys at most q distinct grams, so two
  *     keys within maxDist share ≥ max(|Gₗ|,|Gᵣ|) − maxDist·q grams,
  *     and by the prefix-filter theorem their signatures must
  *     intersect: candidate generation on signature grams has EXACT
  *     RECALL (the oracle cross-checks this — the contract query's
  *     DuckDB twin is the full quadratic join);
  *  4. candidates = equi-join on signature grams (never all-pairs),
  *     deduped, then verified with the codegen'd `levenshtein`.
  *
  * Keys too short to carry a full signature (< q + maxDist·q grams,
  * plus the maxDist slack their partners may add) fall into one SHORT
  * block joined all-pairs — bounded by the count of near-q-length
  * strings, and any corpus where that set is large is exact-dedup
  * territory, not fuzzy-join territory. That boundary is ENFORCED, not
  * hoped for: each side's distinct short keys are pulled with a bounded
  * `limit(cap+1).collect()` job at CALL time (editDistanceJoin is eager
  * to this extent — two bounded jobs run before the returned plan does)
  * and the join REFUSES (require, with the remedy in the message) when
  * the count exceeds `shortKeyCap`; the pulled keys re-enter the plan as
  * a LocalRelation, so the short-key lineage is materialized once, never
  * recomputed inside the join — fail-fast chosen over an observe() metric
  * because dropping the whole block empties that plan branch and AQE's
  * empty-relation propagation eliminates the metric node with it
  * (measured): the drop would be exactly as silent as the quadratic
  * blowup it prevents. Exact recall therefore always holds for the
  * pairs this operator returns.
  *
  * 100 TB shape: gram tables carry (id, gram) only — keys travel once,
  * for the verify stage; the frequency table is gram-vocabulary sized;
  * signature buckets are rare-gram sized by construction, so the
  * candidate join is skew-resistant exactly where a naive
  * all-grams-block join is quadratic (a corpus-wide common substring
  * never enters a signature unless a string has nothing rarer).
  */
object FuzzyJoin {

  /** Distinct character q-grams; empty array when the key is shorter
    * than q (sequence() would step backwards). */
  private def grams(c: Column, q: Int): Column =
    when(length(c) >= q,
      array_distinct(transform(
        sequence(lit(1), length(c) - q + 1),
        i => c.substr(i, lit(q)))))
      .otherwise(array().cast("array<string>"))

  /** All pairs with levenshtein(key_l, key_r) <= maxDist.
    * Inputs: left = (id, key), right = (id, key). Output:
    * (id_l, id_r, key_l, key_r, edit_dist), exact and complete.
    *
    * Dedupe-first: blocking, signatures, and the O(len²) verify all run
    * over DISTINCT keys — dirty-key corpora carry heavy key
    * multiplicity, and a key duplicated m× must not pay its verify m²
    * times (measured here: 64 distinct part names under 5 000 rows cut
    * the sf0.1 query 7.5 s → sub-second). Ids re-attach by key equality
    * at the end, which is also where the (possibly huge, but true)
    * output multiplicity materializes — after all expensive work. */
  def editDistanceJoin(
      left: DataFrame,
      right: DataFrame,
      maxDist: Int,
      q: Int = 3,
      shortKeyCap: Int = 1000): DataFrame = {
    require(maxDist >= 0 && q >= 2 && shortKeyCap > 0)
    val sigLen = maxDist * q + 1
    // partner of a short string is at most maxDist longer — both land SHORT
    val shortMax = (maxDist * q + q - 1) + maxDist
    val l = left.select(col(left.columns(0)).as("id_l"), col(left.columns(1)).as("key_l"))
    val r = right.select(col(right.columns(0)).as("id_r"), col(right.columns(1)).as("key_r"))
    val lk = l.select("key_l").distinct()
    val rk = r.select("key_r").distinct()
    val gl = lk.select(col("key_l").as("sid"), explode(grams(col("key_l"), q)).as("gram"))
    val gr = rk.select(col("key_r").as("sid"), explode(grams(col("key_r"), q)).as("gram"))
    // global rarity order over BOTH sides — one vocabulary-sized aggregate
    val gramDf = gl.select("gram").unionAll(gr.select("gram"))
      .groupBy("gram").agg(count(lit(1)).as("gdf"))
    def signature(g: DataFrame): DataFrame = {
      val w = Window.partitionBy("sid").orderBy(col("gdf"), col("gram"))
      g.join(gramDf, Seq("gram"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= sigLen)
        .select("sid", "gram")
    }
    val candidates = signature(gl).withColumnRenamed("sid", "key_l")
      .join(signature(gr).withColumnRenamed("sid", "key_r"), Seq("gram"))
      .select("key_l", "key_r")
    // the all-pairs short block is bounded by construction — and
    // ENFORCED by a bounded fail-fast probe (scaladoc: why not observe()).
    // The probe IS the materialization: one limit(cap+1) pull of short
    // DISTINCT keys (≤ cap+1 near-q-length strings — same bounded-driver-
    // pull budget class as calibration samples) becomes a LocalRelation,
    // so the short-key lineage is never recomputed inside the join and
    // the cross join's short side is local/broadcast by construction.
    // NOTE: this makes editDistanceJoin eager — it runs one bounded Spark
    // job per side at call time, before the returned plan is acted on.
    def boundedShort(df: DataFrame, side: String): DataFrame = {
      val rows = df.limit(shortKeyCap + 1).collect()
      require(rows.length <= shortKeyCap,
        s"fuzzy join: > $shortKeyCap distinct short keys on the $side side — " +
          "the all-pairs short block would go quadratic. Exact-dedup the " +
          "short tail first, or raise shortKeyCap knowingly.")
      import scala.jdk.CollectionConverters._
      df.sparkSession.createDataFrame(rows.toSeq.asJava, df.schema)
    }
    val shortL = boundedShort(lk.filter(length(col("key_l")) <= shortMax), "left")
    val shortR = boundedShort(rk.filter(length(col("key_r")) <= shortMax), "right")
    val keyPairs = candidates
      .unionAll(shortL.crossJoin(shortR)) // all-pairs ONLY among near-q-length distinct keys
      .dropDuplicates("key_l", "key_r")
      // cheap length prune ahead of the O(len²) verify
      .filter(abs(length(col("key_l")) - length(col("key_r"))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col("key_l"), col("key_r")).cast("long"))
      .filter(col("edit_dist") <= maxDist)
    // Expand back to id pairs: multiplicity returns only at the edge.
    // Join ORIENTATION is load-bearing: the corpus sides (l, r) STREAM
    // and the verified key-pair set BROADCASTS. Left to stats, Catalyst
    // does the opposite here — l and r are small in BYTES at test scale,
    // so it broadcasts the corpus and streams the pair set, which AQE
    // has already coalesced to ONE partition (72 rows), and the entire
    // output multiplicity then materializes on a single core (measured:
    // 5.4 s single-partition vs sub-second streamed at the 10× replica).
    // At 100 TB the same stats-driven choice is an OOM, not a slowdown.
    // The pair set is dimension-sized by construction (pairs over
    // DISTINCT keys); if it ever outgrew a broadcast, the id-expanded
    // output — |pairs| × multiplicity² — would be the real problem.
    // Each corpus side expands against the broadcast pair set
    // independently, then the two expansions meet on the PAIR key
    // (key_l, key_r) — |pairs| distinct join keys, vs the raw
    // vocabulary-sized (hence skewed) key_r alternative.
    // The pair-key shuffle feeding the final join carries the PRE-
    // expansion rows — small in bytes — so AQE's byte-based coalescing
    // would fold it to one partition and the multiplicity explosion
    // (which happens AT the join, invisible to byte stats) would run
    // serially (measured: "number of partitions: 1" at the 10× replica).
    // An explicit partition count by pair key is exempt from AQE
    // coalescing and keeps the expansion parallel.
    val nShuffle = left.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val lx = l.join(broadcast(keyPairs), Seq("key_l"))
      .repartition(nShuffle, col("key_l"), col("key_r"))
    val rx = r.join(broadcast(keyPairs.select("key_l", "key_r")), Seq("key_r"))
      .repartition(nShuffle, col("key_l"), col("key_r"))
    lx.join(rx, Seq("key_l", "key_r"))
      .select(col("id_l"), col("id_r"), col("key_l"), col("key_r"), col("edit_dist"))
  }
}
