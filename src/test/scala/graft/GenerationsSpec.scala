package graft

import graft.ops.{Generations, IncrementalDedup, Ivf, IvfPq, ShardedBloom, ShardedBloomFiles}
import org.apache.spark.sql.functions._

/** The catalog-pointer generation discipline: pointer lifecycle and
  * atomicity contract, prune's never-delete-live rule, and the
  * versioned index lifecycles (Ivf / IvfPq / ShardedBloom) whose
  * rebuild swaps become one pointer flip while superseded generations
  * stay fully readable for concurrent probes.
  */
class GenerationsSpec extends SparkSpec {
  import spark.implicits._

  /** 4 separated direction clusters in 8 dims (IvfSpec's fixture). */
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
      (0 until 8).foreach { d =>
        v(d) = v(d) + (((c * 1315423911L + i * 2654435761L + d * 97L) % 100) / 100.0f)
      }
      ((c * 50 + i).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def hist = spark.range(5000)
    .select(IncrementalDedup.fp60(concat(lit("h"), col("id"))).as("fp"))

  private def batch = spark.range(1000)
    .select(
      when(col("id") % 10 === 0, concat(lit("h"), col("id") * 3))
        .otherwise(concat(lit("new"), col("id"))).as("key"))
    .select(col("key"), IncrementalDedup.fp60(col("key")).as("fp"))

  test("pointer lifecycle: absent root, publish, flip, validation") {
    val root = java.nio.file.Files.createTempDirectory("graft_gen").toString
    assert(Generations.current(spark, root).isEmpty)
    intercept[java.io.IOException](Generations.livePath(spark, root))

    val g1 = Generations.nextPath(spark, root)
    assert(g1.endsWith("gen-000001"))
    // publish refuses a generation that was never built
    intercept[IllegalArgumentException](Generations.publish(spark, root, g1))
    new java.io.File(g1).mkdirs()
    Generations.publish(spark, root, g1)
    assert(Generations.livePath(spark, root) == g1)

    val g2 = Generations.nextPath(spark, root)
    assert(g2.endsWith("gen-000002"))
    new java.io.File(g2).mkdirs()
    Generations.publish(spark, root, g2)
    assert(Generations.livePath(spark, root) == g2)
    // the flip is pointer-only: the superseded generation is untouched
    assert(new java.io.File(g1).isDirectory)

    // only gen-* dirs are publishable (the .rebuild suffix discipline
    // does not leak into a generation root)
    val stray = root + "/rebuild"
    new java.io.File(stray).mkdirs()
    intercept[IllegalArgumentException](Generations.publish(spark, root, stray))

    // a NON-CANONICAL generation name is refused up front: publishing
    // 'gen-7' would commit a pointer that livePath reconstructs as
    // 'gen-000007' and cannot serve
    val unpadded = root + "/gen-7"
    new java.io.File(unpadded).mkdirs()
    intercept[IllegalArgumentException](Generations.publish(spark, root, unpadded))

    // a corrupt manifest entry is reported loudly, never skipped
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_ptr", "bogus-entry"), "gen-000001\n")
    intercept[java.io.IOException](Generations.current(spark, root))
  }

  test("legacy CURRENT pointer: still resolved, corrupt forms still loud") {
    // a root published before the manifest log existed: CURRENT only
    val root = java.nio.file.Files.createTempDirectory("graft_gen_leg").toString
    new java.io.File(root + "/gen-000001").mkdirs()
    Generations.publish(spark, root, root + "/gen-000001",
      Generations.RenameOverwrite)
    assert(new java.io.File(root, "CURRENT").isFile)
    assert(Generations.livePath(spark, root).endsWith("gen-000001"))

    // upgrading mid-life: a manifest publish supersedes the legacy file
    new java.io.File(root + "/gen-000002").mkdirs()
    Generations.publish(spark, root, root + "/gen-000002")
    assert(Generations.livePath(spark, root).endsWith("gen-000002"))
    // ...and once the log exists, a legacy write is refused (it would
    // be silently out-voted by the log)
    intercept[IllegalArgumentException](Generations.publish(spark, root,
      root + "/gen-000001", Generations.RenameOverwrite))

    // corrupt legacy pointer on a legacy-only root: loud, not absent
    val root2 = java.nio.file.Files.createTempDirectory("graft_gen_leg2").toString
    new java.io.File(root2 + "/gen-000001").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root2, "CURRENT"), "gen-bogus\n")
    intercept[java.io.IOException](Generations.current(spark, root2))
    // non-canonical name in a legacy pointer (hand-written 'gen-1'):
    // loud, because livePath would reconstruct 'gen-000001'
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root2, "CURRENT"), "gen-1\n")
    intercept[java.io.IOException](Generations.current(spark, root2))
  }

  test("RenameOverwrite is refused on object-store schemes") {
    // rename on s3 is copy+delete: the legacy strategy must refuse it
    // up front (before touching the filesystem) rather than commit a
    // pointer that can vanish mid-flip
    val e = intercept[IllegalArgumentException](Generations.publish(
      spark, "s3a://bucket/idx", "s3a://bucket/idx/gen-000001",
      Generations.RenameOverwrite))
    assert(e.getMessage.contains("ManifestLog"))
  }

  test("manifest commit atomicity: every intermediate state resolves old or new, never torn") {
    // Walk the exact filesystem states the ManifestLog commit passes
    // through, as a crash/concurrent-reader would observe them on a
    // store with no atomic rename. The commit is ONE new-object
    // creation, and resolution never reads entry content — so there
    // is no state in which a reader sees a missing or torn pointer.
    val root = java.nio.file.Files.createTempDirectory("graft_gen_atom").toString
    new java.io.File(root + "/gen-000001").mkdirs()
    new java.io.File(root + "/gen-000002").mkdirs()
    Generations.publish(spark, root, root + "/gen-000001")
    assert(Generations.livePath(spark, root).endsWith("gen-000001"))

    // state 1: crashed publish left temp debris in the log dir
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_ptr", ".tmp-crashed"), "gen-000002")
    assert(Generations.livePath(spark, root).endsWith("gen-000001"))

    // state 2: the new entry object exists but its CONTENT is torn
    // (zero bytes durable — the worst a non-atomic store can surface).
    // Resolution is name-only, so the flip still reads cleanly.
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(root, "_ptr", "ptr-000000000002.gen-000002"))
    assert(Generations.livePath(spark, root).endsWith("gen-000002"))

    // state 3: prune sweeps the crash debris, head entry survives
    Generations.prune(spark, root, keep = 2)
    assert(!new java.io.File(root + "/_ptr/.tmp-crashed").exists)
    assert(Generations.livePath(spark, root).endsWith("gen-000002"))

    // the old generation stays resolvable-by-path for in-flight readers
    assert(new java.io.File(root + "/gen-000001").isDirectory)
  }

  test("prune trims the manifest log but never its head entry") {
    val root = java.nio.file.Files.createTempDirectory("graft_gen_ptrim").toString
    (1 to 5).foreach { n =>
      new java.io.File(root + f"/gen-$n%06d").mkdirs()
      Generations.publish(spark, root, root + f"/gen-$n%06d")
    }
    Generations.prune(spark, root, keep = 2)
    val entries = new java.io.File(root + "/_ptr").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq
    assert(entries == Seq(
      "ptr-000000000004.gen-000004", "ptr-000000000005.gen-000005"), entries)
    assert(Generations.livePath(spark, root).endsWith("gen-000005"))
  }

  test("prune keeps the newest window and never the live generation") {
    val root = java.nio.file.Files.createTempDirectory("graft_gen_prune").toString
    (1 to 4).foreach(n => new java.io.File(root + f"/gen-$n%06d").mkdirs())
    Generations.publish(spark, root, root + "/gen-000001") // live = oldest
    // debris from a crashed publish (temp written, rename never ran)
    val debris = new java.io.File(root, ".CURRENT.tmp-deadbeef")
    java.nio.file.Files.writeString(debris.toPath, "gen-000003\n")
    Generations.prune(spark, root, keep = 1)
    val left = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).sorted.toSeq
    // the newest survives by the keep window; the live one survives
    // unconditionally even though it is outside the window
    assert(left == Seq("gen-000001", "gen-000004"), left.mkString(","))
    assert(Generations.livePath(spark, root).endsWith("gen-000001"))
    assert(!debris.exists, "crashed-publish temp pointer must be swept")
  }

  test("Ivf versioned lifecycle: rebuild lands in a new generation, old one stays readable") {
    val root = java.nio.file.Files.createTempDirectory("graft_gen_ivf")
      .resolve("idx").toString
    val model0 = Ivf.fit(clustered, "vec_id", nLists = 4, iterations = 3)
    val gen1 = Ivf.writeIndexVersioned(spark, clustered, model0, root)
    assert(Generations.livePath(spark, root) == gen1)

    val queries = clustered.where($"vec_id" % 50 === 0)
    val viaPtr = Ivf.searchIndex(spark, Generations.livePath(spark, root),
      queries, "vec_id", model0, k = 5, nProbe = 1)
      .orderBy("q_id", "rnk").collect().toSeq
    val inMemory = Ivf.search(clustered, queries, "vec_id", model0,
      k = 5, nProbe = 1).orderBy("q_id", "rnk").collect().toSeq
    assert(viaPtr == inMemory)

    // healthy tick: no new generation, pointer unmoved
    val tick0 = Ivf.maintain(spark, root, "vec_id", model0,
      nLists = 4, threshold = 2.0)
    assert(!tick0.rebuilt && Generations.livePath(spark, root) == gen1)

    // drift appended into the LIVE generation trips the cadence
    val drift = (0 until 2).map { g =>
      clustered.select((col("vec_id") + lit(1000L * (g + 1))).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 0, x + 10f, x))").as("embedding"))
    }.reduce(_ unionAll _)
    Ivf.appendIndex(drift, model0, Generations.livePath(spark, root))
    val rowsBefore = spark.read.parquet(gen1).count()

    val tick1 = Ivf.maintain(spark, root, "vec_id", model0,
      nLists = 4, threshold = 2.0)
    assert(tick1.rebuilt)
    val gen2 = Generations.livePath(spark, root)
    assert(gen2 != gen1 && gen2.endsWith("gen-000002"))
    // a concurrent reader that resolved gen1 pre-flip still reads a
    // complete index (keep=2 covers one generation of grace)
    assert(spark.read.parquet(gen1).count() == rowsBefore)

    // pointer-served search == from-scratch fit + build on the same corpus
    val corpusAll = clustered.unionAll(drift)
    val scratchM = Ivf.fit(corpusAll, "vec_id", nLists = 4, iterations = 3)
    val scratch = java.nio.file.Files.createTempDirectory("graft_gen_scr")
      .resolve("idx").toString
    Ivf.writeIndex(corpusAll, scratchM, scratch)
    val a = Ivf.searchIndex(spark, gen2, queries, "vec_id", tick1.model,
      k = 5, nProbe = 1).orderBy("q_id", "rnk").collect().toSeq
    val b = Ivf.searchIndex(spark, scratch, queries, "vec_id", scratchM,
      k = 5, nProbe = 1).orderBy("q_id", "rnk").collect().toSeq
    assert(a == b)
  }

  test("IvfPq versioned lifecycle: two-level rebuild swaps by pointer flip") {
    val root = java.nio.file.Files.createTempDirectory("graft_gen_ivfpq")
      .resolve("idx").toString
    val model = IvfPq.fit(clustered, "vec_id", nLists = 4, m = 4, k = 4)
    val gen1 = IvfPq.writeIndexVersioned(spark, clustered, "vec_id", model, root)
    assert(Generations.livePath(spark, root) == gen1)

    val queries = clustered.where($"vec_id" % 50 === 0)
    val direct = java.nio.file.Files.createTempDirectory("graft_gen_ivfpq_d")
      .resolve("idx").toString
    IvfPq.writeIndex(clustered, "vec_id", model, direct)
    val viaPtr = IvfPq.searchIndex(spark, Generations.livePath(spark, root),
      clustered, queries, "vec_id", model, topK = 5, nProbe = 2)
      .orderBy("q_id", "rnk").collect().toSeq
    val viaDirect = IvfPq.searchIndex(spark, direct, clustered, queries,
      "vec_id", model, topK = 5, nProbe = 2)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(viaPtr == viaDirect)

    // healthy tick holds the pointer; forced trip flips to gen-2 and
    // serves exactly a fresh fit + build (both levels refit)
    val healthy = IvfPq.maintain(spark, root, clustered, "vec_id",
      model, nLists = 4, m = 4, k = 4, threshold = 1e9)
    assert(!healthy.rebuilt && Generations.livePath(spark, root) == gen1)
    val rep = IvfPq.maintain(spark, root, clustered, "vec_id",
      model, nLists = 4, m = 4, k = 4, threshold = 0.0)
    assert(rep.rebuilt && Generations.livePath(spark, root).endsWith("gen-000002"))
    val freshModel = IvfPq.fit(clustered, "vec_id", nLists = 4, m = 4, k = 4)
    assert(rep.model == freshModel)
    assert(new java.io.File(gen1).isDirectory) // grace for in-flight readers
  }

  test("LshIndex versioned compact: re-cap lands in a new generation, source untouched") {
    import graft.ops.{Dedup, LshIndex}
    val dup = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val more = Seq((2L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_gen_lsh")
      .resolve("idx").toString
    val g1 = LshIndex.writeVersioned(
      Dedup.minhashSignaturesFast(dup, "doc_id", "text", 8, 3),
      "doc_id", 4, 2, root, maxBucketSize = 1)
    assert(Generations.livePath(spark, root) == g1)
    // append regrows the duplicate bucket past the cap IN the live gen
    LshIndex.append(Dedup.minhashSignaturesFast(more, "doc_id", "text", 8, 3),
      "doc_id", 4, 2, Generations.livePath(spark, root))
    assert(spark.read.parquet(g1).select("doc_id").distinct().count() == 3L)

    val g2 = LshIndex.compactVersioned(spark, root, maxBucketSize = 1)
    assert(Generations.livePath(spark, root) == g2 && g2 != g1)
    val kept = spark.read.parquet(g2).select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(kept == Set(3L)) // regrown size-2 buckets dropped
    // the pre-compact generation still serves its (uncapped) contents
    assert(spark.read.parquet(g1).select("doc_id").distinct().count() == 3L)
  }

  test("versioned bloom epochs: saturation rotates by pointer flip, old epoch intact") {
    val root = java.nio.file.Files.createTempDirectory("graft_gen_bloom")
      .resolve("fam").toString
    // grossly undersized (50 expected, 5000 admitted) -> saturated
    val g1 = ShardedBloom.buildToPathVersioned(hist, "fp", 50L, root,
      0.01, numShards = 4)
    assert(Generations.livePath(spark, root) == g1)

    val want = batch.join(hist, Seq("fp"), "left_anti")
      .select("key", "fp").orderBy("fp").collect().toSeq
    val got = IncrementalDedup.dedupAgainstShardedPath(batch, hist, "fp",
      Generations.livePath(spark, root), numShards = 4)
      .select("key", "fp").orderBy("fp").collect().toSeq
    assert(got == want)

    val report = ShardedBloom.maintainEpochVersioned(spark, hist, "fp", root)
    assert(report.rotated && report.dir == Generations.livePath(spark, root))
    assert(report.dir.endsWith("gen-000002"))
    // immutable-epoch contract: the saturated family's files survive
    // the flip for concurrent probes
    assert(new java.io.File(g1, "_meta").exists())

    // healthy follow-up tick: pointer unmoved, probes unchanged
    val tick = ShardedBloom.maintainEpochVersioned(spark, hist, "fp", root)
    assert(!tick.rotated && tick.dir == report.dir)
    val got2 = IncrementalDedup.dedupAgainstShardedPath(batch, hist, "fp",
      Generations.livePath(spark, root))
      .select("key", "fp").orderBy("fp").collect().toSeq
    assert(got2 == want)
    Seq(g1, report.dir).foreach(ShardedBloomFiles.invalidate)
  }

  test("crashed bloom rotation converges: committed-but-unpublished generation skipped, not wedged") {
    val root = java.nio.file.Files.createTempDirectory("graft_gen_crash")
      .resolve("fam").toString
    // live gen-1, saturated (50 expected, 5000 admitted)
    val g1 = ShardedBloom.buildToPathVersioned(hist, "fp", 50L, root,
      0.01, numShards = 4)
    // simulate a rotation that crashed AFTER buildToPath committed
    // gen-2 (_meta present) but BEFORE the pointer flip
    val crashed = root + "/gen-000002"
    ShardedBloom.buildToPath(hist, "fp", 5000L, crashed, 0.01, numShards = 4)
    assert(Generations.livePath(spark, root) == g1) // pointer never moved

    // the re-tick must not wedge on the committed debris: it skips to
    // gen-3, publishes it, and the family serves correctly
    val report = ShardedBloom.maintainEpochVersioned(spark, hist, "fp", root)
    assert(report.rotated && report.dir.endsWith("gen-000003"))
    assert(Generations.livePath(spark, root) == report.dir)
    val want = batch.join(hist, Seq("fp"), "left_anti")
      .select("key", "fp").orderBy("fp").collect().toSeq
    val got = IncrementalDedup.dedupAgainstShardedPath(batch, hist, "fp",
      Generations.livePath(spark, root))
      .select("key", "fp").orderBy("fp").collect().toSeq
    assert(got == want)
    Seq(g1, crashed, report.dir).foreach(ShardedBloomFiles.invalidate)
  }
}
