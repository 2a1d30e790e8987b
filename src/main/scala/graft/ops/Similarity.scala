package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths:
  *  - brute-force cosine top-k: broadcast the (small) query set against
  *    the corpus — one pass, no shuffle of the corpus, codegen'd HOF
  *    dot products. The right baseline at any scale when |queries| is
  *    small.
  *  - LSH (random hyperplane) bucketing: 2^p sign-buckets; search only
  *    within the query's bucket. The scale path: the corpus is
  *    partitioned by bucket once (one shuffle), each probe touches
  *    ~corpus/2^p vectors.
  *
  * Exactness contract: similarity math runs over integer-quantized
  * embeddings (round(x*1e6)) — integer dot products are exact and
  * order-independent, so results are identical across engines and
  * across shuffle orders, with a single deterministic IEEE double
  * division at the end. (Float-accumulation order would otherwise
  * differ between engines and even between runs at scale.)
  */
object Similarity {

  /** Quantize array<float> -> array<long> at 1e-6 resolution — the
    * native codegen'd loop ([[graft.functions.QuantizeMicro]]). Sits
    * at the mouth of every quantized op via [[withQuantized]], so it
    * runs once per row SCANNED, not just per row kept; the HOF
    * reference below is CodegenFallback (64 interpreted lambdas per
    * row) and kept for the parity spec.
    */
  def quantize(emb: Column): Column =
    graft.functions.QuantizeMicro.quantize(emb)

  private[graft] def quantizeHof(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * lit(1000000.0)).cast(LongType))

  /** Exact integer dot product of two array<long> columns — the
    * native codegen'd loop (graft.functions.LongDotProduct). Integer
    * addition is exactly associative, so unlike the float path this
    * IS the oracle-parity dot: bit-identical to the interpreted
    * `aggregate(zip_with(...))` chain it replaced, at codegen speed.
    */
  def dotLong(a: Column, b: Column): Column =
    graft.functions.FloatVectorOps.longDot(a, b)

  /** Cosine similarity scaled to micro-units (bigint), from integer
    * dot products: dot / (||a|| * ||b||), rounded to 1e-6.
    */
  def cosineMicro(dot: Column, normA: Column, normB: Column): Column =
    round(dot.cast("double") / (sqrt(normA.cast("double")) * sqrt(normB.cast("double")))
      * lit(1000000.0)).cast(LongType)

  /** Per-vector quantized embedding + self-dot (squared norm). */
  def withQuantized(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("ei", quantize(col(embCol)))
      .withColumn("nn", dotLong(col("ei"), col("ei")))

  /** Brute-force top-k cosine: for each query vector (broadcast), rank
    * the whole corpus by similarity. Deterministic rank order:
    * (sim_micro desc, vec_id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = withQuantized(corpus, "embedding")
    val q = withQuantized(queries, "embedding")
      .select(col(idCol).as("q_id"), col("ei").as("qe"), col("nn").as("qn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col(idCol) =!= col("q_id"))
      .withColumn("sim_micro",
        cosineMicro(dotLong(col("ei"), col("qe")), col("nn"), col("qn")))
    val w = Window.partitionBy("q_id").orderBy(col("sim_micro").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col(idCol), col("sim_micro"))
  }

  /** Performance-path brute-force top-k: native codegen'd float dot
    * (graft.functions.FloatDotProduct — measured ~4x the HOF chain on
    * 64-dim vectors). Float accumulation order makes this path
    * bit-inexact across engines; use [[bruteForceTopK]] when exact
    * cross-engine parity is required, this one when scanning billions
    * of vectors.
    */
  def bruteForceTopKNative(corpus: DataFrame, queries: DataFrame, idCol: String,
                           k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.FloatVectorOps.floatCosine
    val q = queries.select(col(idCol).as("q_id"), col("embedding").as("qe"))
    val scored = corpus.crossJoin(broadcast(q))
      .where(col(idCol) =!= col("q_id"))
      .withColumn("sim", floatCosine(col("embedding"), col("qe")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col(idCol), col("sim"))
  }

  /** Deterministic random hyperplanes: plane p, dim d gets an integer
    * weight in [-32768, 32767] derived from md5("p_d") — reproducible
    * in any engine, no RNG state.
    */
  def planeWeights(planes: Int, dims: Int): Seq[Seq[Long]] = {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { p =>
      (0 until dims).map { d =>
        val hex = mdi.digest(s"${p}_$d".getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) - 32768L
      }
    }
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the k most-similar corpus vectors carrying a DIFFERENT label —
    * the "nearest non-match" negatives that make an embedding model
    * learn boundaries instead of memorizing easy contrasts. Same
    * plan as [[bruteForceTopK]] (broadcast queries, one corpus scan,
    * integer micro-cosine, (sim desc, id) rank) with the label
    * inequality riding the scan filter; at billion-vector scale,
    * route through the IVF probe first and re-rank the probed cells
    * with the same predicate ([[Ivf.searchQuantized]] composition —
    * inequality can't pre-prune partitions, so it filters candidates
    * in-plan either way).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    labelCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = withQuantized(corpus, "embedding")
    val q = withQuantized(queries, "embedding")
      .select(col(idCol).as("q_id"), col(labelCol).as("q_lbl"),
        col("ei").as("qe"), col("nn").as("qn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col(idCol) =!= col("q_id") && col(labelCol) =!= col("q_lbl"))
      .withColumn("sim_micro",
        cosineMicro(dotLong(col("ei"), col("qe")), col("nn"), col("qn")))
    val w = Window.partitionBy("q_id").orderBy(col("sim_micro").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col(idCol), col(labelCol),
        col("sim_micro"))
  }

  /** Sign-bucket id (0 .. 2^planes-1) for the quantized embedding
    * column `ei`: bit p set iff dot(ei, plane_p) > 0. Exact integer
    * arithmetic end to end.
    */
  def lshBucket(ei: Column, planes: Seq[Seq[Long]]): Column =
    planes.zipWithIndex.map { case (w, p) =>
      val planeLit = typedLit(w)
      when(dotLong(ei, planeLit) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH candidate generation: queries joined to corpus on equal
    * bucket. Downstream re-ranks candidates with exact cosine.
    */
  def lshCandidates(corpus: DataFrame, queries: DataFrame, idCol: String,
                    nPlanes: Int, dims: Int): DataFrame = {
    val planes = planeWeights(nPlanes, dims)
    val c = withQuantized(corpus, "embedding")
      .withColumn("bucket", lshBucket(col("ei"), planes))
    val q = withQuantized(queries, "embedding")
      .withColumn("bucket", lshBucket(col("ei"), planes))
      .select(col(idCol).as("q_id"), col("bucket").as("q_bucket"))
    c.join(broadcast(q), col("bucket") === col("q_bucket") && col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol))
  }

  /** SemDeDup-style semantic deduplication: assign every embedding to
    * its IVF cell (narrow map over broadcast centroids, zero
    * Exchange), compare pairs only WITHIN a cell, and retire each
    * vector whose cell contains a lower-id vector with cosine >=
    * `minSimMicro`. Output: (vec_id, keeper_id) for retired vectors —
    * keeper_id is the smallest qualifying neighbor (the deterministic
    * cluster representative under the one-hop min policy; feed the
    * pairs to [[Dedup.connectedComponents]] when transitive retirement
    * is wanted).
    *
    * Scale shape: the quadratic term is bounded per cell (nLists
    * sized so cells fit a task — the same contract as any blocked
    * pairwise stage), and the only shuffle is the cell-equi-join.
    * All math exact integers: quantized dots, micro-unit cosine.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, model: Ivf.QuantModel,
                    minSimMicro: Long): DataFrame = {
    val a = Ivf.assignQuantized(corpus, model)
      .select(col(idCol), col("ei"), col("nn"), col("cell"))
    val tgt = a.select(col(idCol).as("vec_id"), col("ei").as("ea"),
      col("nn").as("na"), col("cell"))
    val cand = a.select(col(idCol).as("cand_id"), col("ei").as("eb"),
      col("nn").as("nb"), col("cell").as("cell_b"))
    tgt.join(cand, col("cell") === col("cell_b") && col("cand_id") < col("vec_id"))
      .withColumn("sim_micro",
        cosineMicro(dotLong(col("ea"), col("eb")), col("na"), col("nb")))
      .where(col("sim_micro") >= minSimMicro)
      .groupBy("vec_id").agg(min("cand_id").as("keeper_id"))
  }
}
