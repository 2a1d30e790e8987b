package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (fuzzy vocabulary matching)
  * with q-gram count-filter blocking — the candidate generator runs
  * over gram buckets, never all pairs, and the exact `levenshtein`
  * verify touches candidates only.
  *
  * The blocking is provably lossless (no false negatives):
  *
  *  - A string of length L has L+q-1 padded q-grams (pad q-1 sentinel
  *    chars each side). One edit operation destroys at most q grams,
  *    so ed(a,b) <= d implies the padded gram BAGS share at least
  *    max(la,lb) + q - 1 - d*q grams (Gravano et al., VLDB'01 count
  *    filter). Pairs whose longer side satisfies
  *    max(la,lb) + q - 1 - d*q >= 1 are guaranteed to meet in at
  *    least one gram bucket and survive the shared-count filter.
  *  - Pairs where that bound is <= 0 (both strings shorter than
  *    q*(d-1)+2) can be within distance d yet share NO gram
  *    ("hot"/"rod" at q=2, d=2). That stratum is closed under a
  *    bounded domain — strings of length <= q*(d-1)+1 over a finite
  *    alphabet — so it is joined directly with both sides broadcast.
  *    The two strata partition the pair space by max(la,lb), so the
  *    union is exact and duplicate-free.
  *
  * Bag (multiset) gram intersection is computed by numbering repeated
  * grams within a term: joining on (gram, occurrence) yields exactly
  * min(count_a(g), count_b(g)) matches per gram, i.e. the bag
  * intersection the count filter is stated over — a distinct-gram
  * join would under-count repeats and break the bound.
  *
  * Scale: intended for VOCABULARY-level inputs (distinct terms, which
  * grow sub-linearly in corpus size — Heaps' law), not raw corpora.
  * Candidate volume is sum over grams of freq(g)^2 within a length
  * band; the length-band predicate is applied inside the gram join so
  * a hot gram only pairs terms of compatible lengths. The per-gram
  * explode and the (gram, occ) shuffle are both linear in total gram
  * count. Nothing materializes on the driver.
  */
object FuzzyJoin {

  /** All (a, b, dist) pairs with a < b and levenshtein(a,b) <= maxDist
    * over the distinct values of `termCol`. Output columns:
    * `a` string, `b` string, `dist` long.
    */
  def selfJoin(terms: DataFrame, termCol: String, maxDist: Int,
               q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1 (got $maxDist)")
    require(q >= 2, s"q must be >= 2 (got $q)")
    val v = terms.select(col(termCol).as("term")).where(col("term").isNotNull)
      .distinct()
      .withColumn("len", length(col("term")))

    // ---- short stratum: both sides too short for the gram bound ----
    // Cutoff: max(la, lb) <= q*(maxDist-1)+1 makes the count-filter
    // bound vacuous. The domain |alphabet|^cutoff is a constant in
    // data size, so a broadcast nested-loop here is O(short^2) over a
    // bounded set, not a data-scale cross join.
    val shortCut = q * (maxDist - 1) + 1
    val short = v.where(col("len") <= shortCut)
    val shortPairs = broadcast(short.as("x"))
      .join(broadcast(short.as("y")),
        col("x.term") < col("y.term") &&
          abs(col("x.len") - col("y.len")) <= maxDist)
      .select(col("x.term").as("a"), col("y.term").as("b"))

    // ---- gram stratum: longer side has a usable bound ----
    // Padding uses NUL sentinels (chr(0)), which cannot collide with
    // any real text gram. A padded string of length L yields L+q-1
    // grams of width q.
    val padSql = (1 until q).map(_ => "chr(0)").mkString(" || ")
    val grams = v
      .select(col("term"), col("len"),
        posexplode(expr(
          s"transform(sequence(1, length(term) + ${q - 1}), " +
            s"i -> substring(concat($padSql, term, $padSql), i, $q))"))
          .as(Seq("pos", "gram")))
      .withColumn("occ",
        row_number().over(
          Window.partitionBy("term", "gram").orderBy("pos")))
      .select("term", "len", "gram", "occ")

    val cand = grams.as("x").join(grams.as("y"),
        col("x.gram") === col("y.gram") && col("x.occ") === col("y.occ") &&
          col("x.term") < col("y.term") &&
          abs(col("x.len") - col("y.len")) <= maxDist &&
          greatest(col("x.len"), col("y.len")) > shortCut)
      .groupBy(col("x.term").as("a"), col("y.term").as("b"),
        col("x.len").as("la"), col("y.len").as("lb"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >=
        greatest(col("la"), col("lb")) + lit(q - 1) - lit(maxDist * q))
      .select("a", "b")

    shortPairs.unionByName(cand)
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select("a", "b", "dist")
  }

  /** Brute-force reference (for specs and tiny inputs): every pair via
    * a cross join. Quadratic — never use beyond test vocabularies.
    */
  def bruteForce(terms: DataFrame, termCol: String, maxDist: Int): DataFrame = {
    val v = terms.select(col(termCol).as("term")).where(col("term").isNotNull)
      .distinct()
    v.as("x").join(v.as("y"), col("x.term") < col("y.term"))
      .select(col("x.term").as("a"), col("y.term").as("b"),
        levenshtein(col("x.term"), col("y.term")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }
}
