package graft

import graft.ops.{Ivf, Similarity}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic clustered corpus: 4 well-separated direction clusters
    * in 8 dims, 50 vectors each + small deterministic jitter.
    */
  private def clustered = {
    val base = Seq(
      Array(10f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 10f, 0f, 0f, 0f, 0f))
    val rows = for {
      c <- 0 until 4
      i <- 0 until 50
    } yield {
      val v = base(c).clone()
      // deterministic jitter from (c, i)
      (0 until 8).foreach { d =>
        v(d) = v(d) + (((c * 1315423911L + i * 2654435761L + d * 97L) % 100) / 100.0f)
      }
      ((c * 50 + i).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("k-means fit is deterministic and separates the clusters") {
    val m1 = Ivf.fit(clustered, "vec_id", nLists = 4, iterations = 3)
    val m2 = Ivf.fit(clustered, "vec_id", nLists = 4, iterations = 3)
    assert(m1 == m2)

    val assigned = Ivf.assign(clustered, m1.centroids)
    // assignment is a pure map over broadcast centroid literals — the
    // plan must contain no exchange at all
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assign must not shuffle:\n$plan")
    // every true cluster maps to exactly one cell
    val purity = assigned
      .withColumn("true_c", (col("vec_id") / 50).cast("int"))
      .groupBy("true_c").agg(countDistinct("cell").as("cells"))
      .agg(max("cells")).head().getLong(0)
    assert(purity == 1L)
  }

  test("materialized index: pruned probe reads match in-memory search") {
    val corpus = clustered
    val queries = corpus.where($"vec_id" % 50 === 0)
    val model = Ivf.fit(corpus, "vec_id", nLists = 4, iterations = 3)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    Ivf.writeIndex(corpus, model, path)

    // layout: one directory per cell
    val cellDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(cellDirs.length == 4, cellDirs.mkString(","))

    val fromIndex = Ivf.searchIndex(spark, path, queries, "vec_id", model,
      k = 5, nProbe = 1)
    val inMemory = Ivf.search(corpus, queries, "vec_id", model, k = 5, nProbe = 1)
    assert(fromIndex.orderBy("q_id", "rnk").collect().toSeq ==
      inMemory.orderBy("q_id", "rnk").collect().toSeq)

    // the probe must prune partitions: the corpus scan carries a
    // static cell-membership partition filter, not a full-corpus read
    val scanLine = fromIndex.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("PartitionFilters")).mkString("\n")
    assert(scanLine.contains("cell") &&
      (scanLine.contains(" IN ") || scanLine.contains("INSET")),
      s"expected static cell pruning in scan:\n$scanLine")
  }

  test("appendIndex: incremental append + search equals a full rebuild") {
    // fit on the first half only — the model is the epoch's quantizer,
    // appends must not depend on refitting
    val first = clustered.where($"vec_id" % 2 === 0)
    val rest = clustered.where($"vec_id" % 2 =!= 0)
    val model = Ivf.fit(first, "vec_id", nLists = 4, iterations = 3)
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    val queries = clustered.where($"vec_id" % 50 === 0)

    Ivf.writeIndex(first, model, s"$base/inc")
    Ivf.appendIndex(rest, model, s"$base/inc")
    Ivf.writeIndex(clustered, model, s"$base/full")

    val viaAppend = Ivf.searchIndex(spark, s"$base/inc", queries, "vec_id",
      model, k = 5, nProbe = 1).orderBy("q_id", "rnk").collect().toSeq
    val viaRebuild = Ivf.searchIndex(spark, s"$base/full", queries, "vec_id",
      model, k = 5, nProbe = 1).orderBy("q_id", "rnk").collect().toSeq
    assert(viaAppend == viaRebuild)

    // maintenance probe: balanced synthetic cells sit near 1.0; a
    // drifted corpus (everything appended into one cluster's space)
    // degrades measurably and signals the refit
    val balanced = Ivf.cellImbalance(spark, s"$base/inc")
    assert(balanced < 2.0, s"imbalance $balanced")
    val drift = clustered.select(col("vec_id") + 1000L,
      expr("transform(embedding, (x, i) -> IF(i = 0, x + 10f, x))").as("embedding"))
      .toDF("vec_id", "embedding")
    Ivf.appendIndex(drift, model, s"$base/inc")
    val skewed = Ivf.cellImbalance(spark, s"$base/inc")
    assert(skewed > balanced, s"drift must raise imbalance: $balanced -> $skewed")
  }

  test("maintain: healthy tick is a no-op; drift trips refit; rebuild matches from-scratch") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_mnt").toString
    val model0 = Ivf.fit(clustered, "vec_id", nLists = 4, iterations = 3)
    Ivf.writeIndex(clustered, model0, s"$base/idx")

    // healthy: below threshold -> nothing moves, same model serves
    val tick0 = Ivf.maintainInPlace(spark, s"$base/idx", "vec_id", model0,
      nLists = 4, threshold = 2.0)
    assert(!tick0.rebuilt && tick0.model == model0 && tick0.imbalance < 2.0)

    // drift: two appended generations pile into one cluster's space —
    // appendIndex alone can never rebalance this
    val drift = (0 until 2).map { g =>
      clustered.select((col("vec_id") + lit(1000L * (g + 1))).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 0, x + 10f, x))").as("embedding"))
    }.reduce(_ unionAll _)
    Ivf.appendIndex(drift, model0, s"$base/idx")

    val tick1 = Ivf.maintainInPlace(spark, s"$base/idx", "vec_id", model0,
      nLists = 4, threshold = 2.0)
    assert(tick1.rebuilt, s"imbalance ${tick1.imbalance} must trip threshold 2.0")
    assert(tick1.imbalance > 2.0)
    // the rebuild actually rebalanced the cells
    val after = Ivf.cellImbalance(spark, s"$base/idx")
    assert(after < tick1.imbalance, s"rebuild must improve: ${tick1.imbalance} -> $after")

    // append + maintain == from-scratch fit + writeIndex on the same
    // corpus: identical search results (fit is deterministic; sims are
    // computed from the raw vectors, so result equality is exact)
    val corpusAll = clustered.unionAll(drift)
    val scratch = Ivf.fit(corpusAll, "vec_id", nLists = 4, iterations = 3)
    Ivf.writeIndex(corpusAll, scratch, s"$base/scratch")
    val queries = clustered.where($"vec_id" % 50 === 0)
    val viaMaintain = Ivf.searchIndex(spark, s"$base/idx", queries, "vec_id",
      tick1.model, k = 5, nProbe = 1).orderBy("q_id", "rnk").collect().toSeq
    val viaScratch = Ivf.searchIndex(spark, s"$base/scratch", queries, "vec_id",
      scratch, k = 5, nProbe = 1).orderBy("q_id", "rnk").collect().toSeq
    assert(viaMaintain == viaScratch)
  }

  test("IVF search recall@5 is 1.0 on clustered data with nProbe=1") {
    val corpus = clustered
    val queries = corpus.where($"vec_id" % 50 === 0) // one per cluster
    val model = Ivf.fit(corpus, "vec_id", nLists = 4, iterations = 3)

    val ivf = Ivf.search(corpus, queries, "vec_id", model, k = 5, nProbe = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopKNative(corpus, queries, "vec_id", k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall == 1.0, s"recall $recall")
  }

  test("filtered probe: pre-filter parity and predicate pushdown into the index scan") {
    val corpus = clustered.withColumn("label", (col("vec_id") % 3).cast("int"))
    val queries = corpus.where($"vec_id" % 50 === 0)
    val model = Ivf.fit(corpus, "vec_id", nLists = 4, iterations = 3)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_f").toString + "/idx"
    Ivf.writeIndex(corpus, model, path)

    // pre-filter semantics: identical to the unfiltered probe over the
    // pre-filtered corpus under the SAME model (assignment is a pure
    // function of the model, so the filter cannot move anyone's cell)
    val filtered = Ivf.searchIndexFiltered(spark, path, queries, "vec_id",
      model, k = 5, nProbe = 2, col("label") === 1)
    val want = Ivf.search(corpus.where($"label" === 1), queries, "vec_id",
      model, k = 5, nProbe = 2)
    assert(filtered.orderBy("q_id", "rnk").collect().toSeq ==
      want.orderBy("q_id", "rnk").collect().toSeq)

    // the metadata predicate must reach the parquet reader, not hang
    // post-scan: a selective filter then cuts index I/O via row-group
    // stats instead of decoding every probed cell
    val scanLine = filtered.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("PushedFilters")).mkString("\n")
    assert(scanLine.contains("label"),
      s"expected label filter pushed into the index scan:\n$scanLine")

    // quantized twin (the q130 oracle path): matchCols equality equals
    // running the unfiltered quantized probe against each label's
    // corpus slice with that label's queries
    val qm = Ivf.fitQuantized(corpus, "vec_id", nLists = 4)
    val got = Ivf.searchQuantizedFiltered(corpus, queries, "vec_id", qm,
        k = 5, nProbe = 2, matchCols = Seq("label"))
      .orderBy("q_id", "rnk").collect().toSeq
    val wantQ = (0 until 3).flatMap { l =>
      Ivf.searchQuantized(corpus.where($"label" === l),
          queries.where($"label" === l), "vec_id", qm, k = 5, nProbe = 2)
        .collect().toSeq
    }.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(got == wantQ)
  }
}
