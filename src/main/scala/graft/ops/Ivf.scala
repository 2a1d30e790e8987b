package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.FloatVectorOps.{floatCosine, floatDot}

/** IVF-style approximate nearest neighbor index: a k-means coarse
  * quantizer partitions the corpus into `nLists` cells; a query
  * probes only its `nProbe` closest cells.
  *
  * Everything is DataFrame-composed and deterministic:
  *  - init: centroids = the `nLists` lowest-id vectors (no RNG);
  *  - Lloyd iterations: assign via broadcast centroid table + native
  *    codegen dot products, update via per-dimension posexplode mean
  *    (one narrow shuffle per iteration, all map-side combined);
  *  - only the k (tiny) centroids ever reach the driver.
  *
  * At 100 TB the corpus is assigned once (one pass, broadcast
  * centroids) and written partitioned by cell; each probe then reads
  * `nProbe/nLists` of the data. The quadratic term of brute force
  * drops by that factor, recall governed by nProbe.
  */
object Ivf {

  final case class Model(centroids: Seq[(Int, Seq[Float])])

  /** Deterministic Lloyd's k-means over the `embedding` column.
    * Init is farthest-point traversal (deterministic k-means++
    * stand-in): start from the lowest-id vector, then repeatedly take
    * the vector farthest from the current centroid set (ties by id).
    * Each init step is one scan with broadcast centroids; production
    * fits on 100 TB would run this on a sample — the operator takes
    * whatever frame it's given.
    */
  def fit(corpus: DataFrame, idCol: String, nLists: Int,
          iterations: Int = 3): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val first = corpus.orderBy(col(idCol)).limit(1)
      .select(col("embedding")).as[Seq[Float]].head()
    var centroids: Seq[(Int, Seq[Float])] = Seq((0, first))
    (1 until nLists).foreach { i =>
      val cFrame = centroids.toDF("cell", "cvec")
        .select(col("cell"), col("cvec").cast("array<float>").as("cvec"))
      val farthest = corpus.crossJoin(broadcast(cFrame))
        .withColumn("d2",
          floatDot(col("embedding"), col("embedding"))
            - lit(2.0) * floatDot(col("embedding"), col("cvec"))
            + floatDot(col("cvec"), col("cvec")))
        .groupBy(col(idCol), col("embedding"))
        .agg(min(col("d2")).as("mind2"))
        .orderBy(col("mind2").desc, col(idCol).asc)
        .limit(1)
        .select(col("embedding")).as[Seq[Float]].head()
      centroids = centroids :+ ((i, farthest))
    }

    (0 until iterations).foreach { _ =>
      val cFrame = centroids.toDF("cell", "cvec")
        .select(col("cell"), col("cvec").cast("array<float>").as("cvec"))
      val assigned = assign(corpus, cFrame)
      // per-dimension mean via posexplode: map-side partial avgs, one
      // shuffle on (cell, dim) — never collects vectors to the driver
      val means = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cell", "dim").agg(avg("v").as("m"))
        .groupBy("cell").agg(
          transform(array_sort(collect_list(struct(col("dim"), col("m")))),
            s => s.getField("m").cast("float")).as("cvec"))
        .as[(Int, Seq[Float])].collect()
      // empty cells keep their previous centroid
      val updated = means.toMap
      centroids = centroids.map { case (i, old) => (i, updated.getOrElse(i, old)) }
    }
    Model(centroids)
  }

  /** Nearest-cell assignment via broadcast centroids. */
  def assign(corpus: DataFrame, centroidFrame: DataFrame): DataFrame = {
    val idCols = corpus.columns.map(col)
    val w = Window.partitionBy(corpus.columns.head, corpus.columns.tail: _*)
      .orderBy(col("d2").asc, col("cell").asc)
    corpus.crossJoin(broadcast(centroidFrame))
      // squared euclidean via dots: |x|^2 - 2<x,c> + |c|^2; |x|^2 is
      // constant per row, so rank by |c|^2 - 2<x,c>
      .withColumn("d2",
        floatDot(col("cvec"), col("cvec")) - lit(2.0) * floatDot(col("embedding"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(idCols :+ col("cell"): _*)
  }

  /** Probe: top-k cosine within the query's `nProbe` nearest cells. */
  def search(corpus: DataFrame, queries: DataFrame, idCol: String,
             model: Model, k: Int, nProbe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cFrame = model.centroids.toDF("cell", "cvec")
      .select(col("cell"), col("cvec").cast("array<float>").as("cvec"))

    val corpusCells = assign(corpus, cFrame)

    val wq = Window.partitionBy(idCol).orderBy(col("d2").asc, col("cell").asc)
    val queryCells = queries.crossJoin(broadcast(cFrame))
      .withColumn("d2",
        floatDot(col("cvec"), col("cvec")) - lit(2.0) * floatDot(col("embedding"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nProbe)
      .select(col(idCol).as("q_id"), col("embedding").as("qe"), col("cell"))

    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(idCol))
    corpusCells.join(broadcast(queryCells), Seq("cell"))
      .where(col(idCol) =!= col("q_id"))
      .withColumn("sim", floatCosine(col("embedding"), col("qe")))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col(idCol), col("sim"))
  }
}
