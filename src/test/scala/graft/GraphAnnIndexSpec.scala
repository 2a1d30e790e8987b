package graft

import graft.ops.{GraphAnn, Generations, Similarity}
import org.apache.spark.sql.functions._

/** Persisted graph-ANN index lifecycle: stored probe ≡ in-memory
  * search, join-shaped inserts that keep the degree bound and the
  * monotone k-th-best invariant while rewriting only touched hive
  * buckets, the insert-fraction health probe, and the
  * Generations-rooted rebuild cadence.
  */
class GraphAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  /** GraphAnnSpec's corpus: 4 separated direction clusters in 8 dims,
    * deterministic jitter; `n` vectors per cluster.
    */
  private def clustered(n: Int, idOffset: Long = 0L) = {
    val base = Seq(
      Array(10f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 10f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 10f, 0f, 0f, 0f, 0f))
    val rows = for {
      c <- 0 until 4
      i <- 0 until n
    } yield {
      val v = base(c).clone()
      (0 until 8).foreach { d =>
        v(d) = v(d) +
          ((((c * 1315423911L + (idOffset + i) * 2654435761L + d * 97L) % 100)
            + 100) % 100) / 100.0f
      }
      (idOffset + c * 1000 + i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private val K = 4

  test("writeIndex + searchIndex equals the in-memory build + search") {
    val corpus = clustered(40)
    val queries = corpus.where($"vec_id" % 1000 === 7)
    val dir = java.nio.file.Files.createTempDirectory("gann").toString
    GraphAnn.writeIndex(corpus, "vec_id", K, initBuckets = 16,
      iterations = 1, path = dir, buckets = 8)
    val stored = GraphAnn.searchIndexStrideEntries(spark, dir, corpus, queries, "vec_id",
        k = 5, beam = 8, hops = 2, entryStride = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    val mem = GraphAnn.searchStrideEntries(
        GraphAnn.buildGraph(corpus, "vec_id", K, initBuckets = 16,
          iterations = 1),
        corpus, queries, "vec_id", k = 5, beam = 8, hops = 2, entryStride = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(stored == mem && mem.nonEmpty)
    // all build edges carry ins=0
    assert(spark.read.parquet(dir).where(col("ins") =!= 0).count() == 0)
  }

  test("appendIndex: degree bound holds, k-th best never degrades, new nodes are reachable") {
    val old = clustered(40)
    val batch = clustered(6, idOffset = 500000L)
    val corpus = old.unionByName(batch)
    val dir = java.nio.file.Files.createTempDirectory("gann").toString
    GraphAnn.writeIndex(old, "vec_id", K, initBuckets = 16,
      iterations = 1, path = dir, buckets = 8)
    val before = spark.read.parquet(dir)
      .groupBy("src").agg(min("sim_micro").as("kth"), count(lit(1)).as("deg"))
      .where(col("deg") === K)
      .select("src", "kth").as[(Long, Long)].collect().toMap

    GraphAnn.appendIndexStrideEntries(spark, dir, corpus, batch, "vec_id",
      k = K, beam = 8, hops = 3, entryStride = 8, buckets = 8)

    val idx = spark.read.parquet(dir)
    val maxDeg = idx.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= K, s"out-degree $maxDeg > k=$K after append")
    // monotone k-th best for every previously-full node
    val after = idx.groupBy("src").agg(min("sim_micro").as("kth"))
      .select("src", "kth").as[(Long, Long)].collect().toMap
    val regressed = before.collect {
      case (n, v0) if after.get(n).exists(_ < v0) => (n, v0, after(n))
    }
    assert(regressed.isEmpty, s"degraded: ${regressed.take(5)}")
    // every batch node entered the graph with a full edge set
    val newSrc = idx.where(col("src") >= 500000L)
      .groupBy("src").count().as[(Long, Long)].collect().toMap
    assert(newSrc.size == 24 && newSrc.values.forall(_ == K))
    // and a stored probe can FIND a batch node from old entries
    val probes = batch.limit(2)
    val got = GraphAnn.searchIndexStrideEntries(spark, dir, corpus, probes, "vec_id",
      k = 5, beam = 8, hops = 3, entryStride = 4)
    assert(got.count() > 0)
    // inserts are marked: insert-only nodes drive the health probe
    assert(GraphAnn.insFraction(spark, dir) > 0.0)
  }

  test("appendIndexSeeded: router-seeded insert preserves the invariants and finds true neighbors") {
    val old = clustered(40)
    val batch = clustered(6, idOffset = 500000L)
    val corpus = old.unionByName(batch)
    val dir = java.nio.file.Files.createTempDirectory("gann").toString
    GraphAnn.writeIndex(old, "vec_id", K, initBuckets = 16,
      iterations = 1, path = dir, buckets = 8)
    // router stand-in: each batch node seeded with scattered SAME-
    // cluster members (what an nProbe=1 IVF shortlist delivers) —
    // batch ids are 500000 + c*1000 + i, cluster peers at c*1000 + j
    val seeds = batch.select(col("vec_id").as("q_id"),
      explode(array(col("vec_id") - 500000L + 1L,
        col("vec_id") - 500000L + 13L,
        col("vec_id") - 500000L + 26L)).as("node"))
    GraphAnn.appendIndexSeeded(spark, dir, corpus, batch, "vec_id",
      k = K, beam = 8, hops = 3, seeds = seeds, buckets = 8)
    val idx = spark.read.parquet(dir)
    val maxDeg = idx.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= K, s"out-degree $maxDeg > k=$K after seeded append")
    // every batch node entered with a full edge set, and a seeded
    // insert finds SAME-cluster neighbors (the router's whole point:
    // batch node 500000+c*1000+i's true neighbors live in cluster c)
    val batchEdges = idx.where(col("src") >= 500000L)
      .select("src", "dst").as[(Long, Long)].collect()
    assert(batchEdges.groupBy(_._1).size == 24 &&
      batchEdges.groupBy(_._1).values.forall(_.length == K))
    val crossCluster = batchEdges.count { case (s, d) =>
      ((s - 500000L) / 1000) != (d % 500000L) / 1000
    }
    assert(crossCluster == 0,
      s"$crossCluster seeded-insert edges left the true cluster")
    assert(GraphAnn.insFraction(spark, dir) > 0.0)
  }

  test("appendIndex rewrites only touched buckets") {
    val old = clustered(40)
    val batch = clustered(2, idOffset = 500000L)
    val corpus = old.unionByName(batch)
    val dir = java.nio.file.Files.createTempDirectory("gann").toString
    GraphAnn.writeIndex(old, "vec_id", K, initBuckets = 16,
      iterations = 1, path = dir, buckets = 32)
    def fileSet(b: Int): Set[String] = {
      val d = new java.io.File(s"$dir/bucket=$b")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val beforeFiles = (0 until 32).map(b => b -> fileSet(b)).toMap
    GraphAnn.appendIndexStrideEntries(spark, dir, corpus, batch, "vec_id",
      k = K, beam = 8, hops = 3, entryStride = 8, buckets = 32)
    val touched = (0 until 32).count(b => fileSet(b) != beforeFiles(b))
    assert(touched > 0, "append touched nothing")
    assert(touched < 32, s"append rewrote every bucket")
  }

  test("maintain: healthy tick is a no-op; insert drift trips a generation rebuild") {
    val old = clustered(30)
    val root = java.nio.file.Files.createTempDirectory("gannroot").toString
    GraphAnn.writeIndexVersioned(spark, old, "vec_id", K, initBuckets = 16,
      iterations = 1, root = root, buckets = 8)
    val gen1 = Generations.livePath(spark, root)

    val healthy = GraphAnn.maintain(spark, root, old, "vec_id", K,
      initBuckets = 16, iterations = 1, threshold = 0.4, buckets = 8)
    assert(!healthy.rebuilt && healthy.insFraction == 0.0)
    assert(Generations.livePath(spark, root) == gen1)

    // flood with inserted nodes until the insert fraction trips
    val batch = clustered(40, idOffset = 500000L)
    val corpus = old.unionByName(batch)
    GraphAnn.appendIndexStrideEntries(spark, gen1, corpus, batch, "vec_id",
      k = K, beam = 8, hops = 3, entryStride = 8, buckets = 8)
    val tripped = GraphAnn.maintain(spark, root, corpus, "vec_id", K,
      initBuckets = 16, iterations = 1, threshold = 0.4, buckets = 8)
    assert(tripped.rebuilt && tripped.insFraction > 0.4)
    val gen2 = Generations.livePath(spark, root)
    assert(gen2 != gen1)
    // the rebuilt generation IS the from-scratch graph over the corpus
    val rebuilt = spark.read.parquet(gen2)
      .select("src", "dst", "sim_micro")
      .as[(Long, Long, Long)].collect().toSet
    val fresh = GraphAnn.buildGraph(corpus, "vec_id", K, initBuckets = 16,
        iterations = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(rebuilt == fresh && fresh.nonEmpty)
    assert(spark.read.parquet(gen2).where(col("ins") =!= 0).count() == 0)
  }
}
