package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (the
  * AllPairs/SSJoin/PPJoin family — Bayardo et al. WWW'07, Chaudhuri
  * et al. ICDE'06): every document pair whose distinct-shingle
  * Jaccard meets the threshold, with NO recall loss — the lossless
  * complement to the MinHash/LSH path ([[Dedup.lshCandidatePairs]]),
  * for pipelines where a banding miss is not acceptable
  * (deduplication audits, legal/compliance matching).
  *
  * Filter theorem: order every document's distinct shingles by one
  * global total order (document frequency ascending, shingle
  * ascending on ties) and keep only the first
  * `|S| - ceil(t * |S|) + 1` as the document's PREFIX. For any pair
  * with `J >= t`, the first common shingle in the global order sits
  * inside BOTH prefixes: at most `|S| - i` non-common shingles can
  * precede it on either side and `i >= ceil(t * |S|)` (from
  * `J <= i / |S|`), so its position is at most
  * `|S| - ceil(t*|S|) + 1`. Joining on prefix shingles only is
  * therefore lossless for the verify predicate.
  *
  * Scale shape: df-ascending ordering puts the RAREST shingles in
  * the prefixes, so the inverted index the join probes has short
  * posting lists exactly where it is probed — boilerplate shingles
  * (huge df) land in suffixes and never generate candidates. Cost is
  * one df aggregation (the inverted-index build: shuffle keyed by
  * shingle), one rank join + per-doc sort (shuffle keyed by doc),
  * the prefix-token equi-join, and exact verification on candidates
  * only ([[Dedup.verifyCandidatePairs]] — in-row array_intersect, no
  * quadratic stage anywhere). Candidate volume is input-dependent but
  * every candidate is provably necessary-or-cheap: a pair is only
  * generated when it shares a low-df shingle.
  *
  * All arithmetic is exact-integer (milli thresholds, floor-division
  * Jaccard) so results replay bit-for-bit in any engine.
  */
object PrefixJoin {

  /** All pairs (doc_a < doc_b) with distinct-`shingleWidth`-gram
    * Jaccard >= `minJaccardMilli`/1000, exactly. Output columns:
    * doc_a, doc_b, n_common, jaccard_milli.
    */
  def selfJoin(docs: DataFrame, idCol: String, textCol: String,
               shingleWidth: Int, minJaccardMilli: Long): DataFrame = {
    require(minJaccardMilli >= 1 && minJaccardMilli <= 1000,
      s"minJaccardMilli must be in [1, 1000] (got $minJaccardMilli)")
    val sh = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= shingleWidth)
      .select(col(idCol),
        expr(s"array_distinct(${Dedup.shingleExpr(shingleWidth)})").as("shs"))
      .withColumn("sz", size(col("shs")).cast("long"))
    val posts = sh.select(col(idCol), col("sz"), explode(col("shs")).as("sh"))
    // document frequency — the global ordering key (rarest first)
    val dfT = posts.groupBy("sh").agg(count(lit(1)).as("df"))
    // per-doc prefix: shingles re-sorted by (df, sh), first
    // sz - ceil(t*sz) + 1 kept WITH their rank in the ordered list;
    // ceil in exact integer milli
    val prefixes = posts.join(dfT, "sh")
      .groupBy(col(idCol), col("sz"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ordered"))
      .withColumn("plen",
        (col("sz") - expr(s"(sz * $minJaccardMilli + 999) DIV 1000") + 1)
          .cast("int"))
      .select(col(idCol), col("sz"),
        posexplode(expr("slice(ordered, 1, plen)")).as(Seq("p0", "pe")))
      .select(col(idCol), col("sz"), (col("p0") + 1).as("ppos"),
        col("pe.sh").as("psh"))
    // PPJoin POSITIONAL filter on top of the prefix filter: for a
    // qualifying pair the first common shingle w* is in both prefixes
    // (prefix theorem), nothing common precedes it, and the global
    // order is shared — so min(ppos_a) and min(ppos_b) over the
    // generating shingles BOTH land on w*, and the true overlap is
    // bounded by min(sz_a - i*, sz_b - j*) + 1. Requiring that bound
    // to reach alpha = ceil(t*(sz_a+sz_b)/(1000+t)) (the smallest
    // overlap any J >= t pair can have) discards candidates that
    // merely share one rare boilerplate shingle near the end of both
    // prefixes — before the verify stage pays an array_intersect over
    // their full shingle sets. Lossless: qualifying pairs satisfy the
    // bound by construction.
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.psh") === col("b.psh") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(min(col("a.ppos")).as("ia"), min(col("b.ppos")).as("jb"))
      .where(expr(
        s"least(sz_a - ia, sz_b - jb) + 1 >= " +
          s"($minJaccardMilli * (sz_a + sz_b) + ${minJaccardMilli + 999})" +
          s" DIV ${1000 + minJaccardMilli}"))
      .select("doc_a", "doc_b")
    // shuffled verify: prefix-filter candidates carry no smallness
    // contract (unlike LSH's capped buckets), so the broadcast-hinted
    // verify would OOM the driver past a few million pairs
    Dedup.verifyCandidatePairsShuffled(docs, idCol, textCol, cand,
      shingleWidth, minJaccardMilli)
  }

  /** Exact CONTAINMENT self-join: every DIRECTED pair (doc_a, doc_b)
    * with `|S_a ∩ S_b| / |S_a| >= t` — "a's shingles are mostly
    * inside b". The asymmetric complement to [[selfJoin]]: Jaccard
    * misses a short document swallowed by a long one (the union is
    * dominated by the long side), but containment is exactly the
    * partial-duplicate signal a curation pipeline needs for quote
    * extraction, boilerplate wrappers, and subset-article detection.
    *
    * Filter theorem (containment form): with the same global
    * (df asc, shingle) order, if `|S_a ∩ S_b| >= ceil(t*|S_a|)` then
    * at most `|S_a| - ceil(t*|S_a|)` of a's ordered shingles precede
    * the first shared one, so it sits inside a's prefix of length
    * `|S_a| - ceil(t*|S_a|) + 1`. Only the PROBE side (a) is
    * prefix-truncated; the indexed side (b) must carry all its
    * shingles — containment puts no lower bound on where the shared
    * shingle falls in b's order. Lossless.
    *
    * Scale shape: identical machinery to [[selfJoin]] — the b-side
    * posting list probed for a prefix shingle has length df(sh), and
    * prefixes hold each document's RAREST shingles, so probed lists
    * are short by construction. Candidate volume is
    * sum over prefix entries of df — linear in the index for
    * bounded-df prefixes, never |docs|².
    */
  def containmentSelfJoin(docs: DataFrame, idCol: String, textCol: String,
                          shingleWidth: Int, minContainMilli: Long): DataFrame = {
    require(minContainMilli >= 1 && minContainMilli <= 1000,
      s"minContainMilli must be in [1, 1000] (got $minContainMilli)")
    val sh = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= shingleWidth)
      .select(col(idCol),
        expr(s"array_distinct(${Dedup.shingleExpr(shingleWidth)})").as("shs"))
      .withColumn("sz", size(col("shs")).cast("long"))
    val posts = sh.select(col(idCol), col("sz"), explode(col("shs")).as("sh"))
    val dfT = posts.groupBy("sh").agg(count(lit(1)).as("df"))
    val orderedDocs = posts.join(dfT, "sh")
      .groupBy(col(idCol), col("sz"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ordered"))
    val prefixes = orderedDocs
      .withColumn("plen",
        (col("sz") - expr(s"(sz * $minContainMilli + 999) DIV 1000") + 1)
          .cast("int"))
      .select(col(idCol).as("doc_a"), col("sz").as("sz_a"),
        posexplode(expr("slice(ordered, 1, plen)")).as(Seq("p0", "pe")))
      .select(col("doc_a"), col("sz_a"), (col("p0") + 1).as("ppos"),
        col("pe.sh").as("psh"))
    // the indexed side carries ALL its shingles, but with their rank
    // in the same global (df, sh) order, for the positional filter
    val full = orderedDocs
      .select(col(idCol).as("doc_b"), col("sz").as("sz_b"),
        posexplode(col("ordered")).as(Seq("q0", "qe")))
      .select(col("doc_b"), col("sz_b"), (col("q0") + 1).as("jpos"),
        col("qe.sh").as("sh"))
    // positional filter, containment form (see selfJoin): for a
    // qualifying pair the first common shingle is in a's prefix, the
    // independent mins land on it jointly, and the overlap bound
    // min(sz_a - i*, sz_b - j*) + 1 must reach ceil(t * sz_a) —
    // lossless, and prunes before the verify's array_intersect
    val cand = prefixes
      .join(full, col("psh") === col("sh") && col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
      .agg(min(col("ppos")).as("ia"), min(col("jpos")).as("jb"))
      .where(expr(
        s"least(sz_a - ia, sz_b - jb) + 1 >= (sz_a * $minContainMilli + 999) DIV 1000"))
      .select("doc_a", "doc_b")
    // shuffled verify (see selfJoin): both joins key on doc id, cost
    // scales with the candidate set instead of driver memory
    cand
      .join(sh.select(col(idCol).as("doc_a"), col("shs").as("sa"),
        col("sz").as("sz_a")), "doc_a")
      .join(sh.select(col(idCol).as("doc_b"), col("shs").as("sb")), "doc_b")
      .withColumn("n_common",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("contain_milli", expr("n_common * 1000 DIV sz_a"))
      .where(col("contain_milli") >= minContainMilli)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("contain_milli"))
  }
}
