package graft

import graft.ops.{IvfPq, Pq, Similarity}
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
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

  private def tmpIdx(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ivfpq_$tag")
      .resolve("idx").toString

  test("index stores codes only; probe prunes cells statically") {
    val corpus = clustered
    val model = IvfPq.fit(corpus, "vec_id", nLists = 4, m = 4, k = 4)
    val path = tmpIdx("schema")
    IvfPq.writeIndex(corpus, "vec_id", model, path)

    // the compression claim, checked at the storage layer: the on-disk
    // schema is (vec_id, codes) + the cell partition column — no
    // embedding, no quantized vector
    val onDisk = spark.read.parquet(path)
    assert(onDisk.columns.sorted.toSeq == Seq("cell", "codes", "vec_id"),
      onDisk.columns.mkString(","))
    val cellDirs = new java.io.File(path)
      .listFiles().filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(cellDirs.length == 4, cellDirs.mkString(","))

    // probe must carry a static cell partition filter (pruned read)
    val queries = corpus.where($"vec_id" % 50 === 0)
    val probe = IvfPq.searchIndex(spark, path, corpus, queries, "vec_id",
      model, topK = 5, nProbe = 1)
    val scanLine = probe.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("PartitionFilters")).mkString("\n")
    assert(scanLine.contains("cell") &&
      (scanLine.contains(" IN ") || scanLine.contains("INSET")),
      s"expected static cell pruning in scan:\n$scanLine")
  }

  test("all-cells probe over the index equals full-corpus ADC-refined search") {
    val corpus = clustered
    val queries = corpus.where($"vec_id" % 50 === 0)
    val model = IvfPq.fit(corpus, "vec_id", nLists = 4, m = 4, k = 4)
    val path = tmpIdx("equiv")
    IvfPq.writeIndex(corpus, "vec_id", model, path)

    // with every cell probed, the index path is the SAME computation
    // as Pq.searchAdcRefinedQuantized over the whole corpus (the codes
    // and LUT are pure functions of the same model) — byte-identical
    val viaIndex = IvfPq.searchIndex(spark, path, corpus, queries, "vec_id",
      model, topK = 5, nProbe = 4, refine = 4)
      .orderBy("q_id", "rnk").collect().toSeq
    val inMemory = Pq.searchAdcRefinedQuantized(corpus, queries, "vec_id",
      model.pq, topK = 5, refine = 4)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(viaIndex == inMemory)
  }

  test("nProbe=1 probe keeps exact-L2 recall on separated clusters") {
    val corpus = clustered
    val queries = corpus.where($"vec_id" % 50 === 0)
    val model = IvfPq.fit(corpus, "vec_id", nLists = 4, m = 4, k = 4)
    val path = tmpIdx("recall")
    IvfPq.writeIndex(corpus, "vec_id", model, path)

    val vecs = Similarity.withQuantized(corpus, "embedding")
      .select(col("vec_id"), col("ei")).as[(Long, Seq[Long])].collect().toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    def exactTopK(q: Long, k: Int): Seq[Long] =
      vecs.collect { case (id, v) if id != q => (d2(vecs(q), v), id) }
        .toSeq.sorted.take(k).map(_._2)

    val got = IvfPq.searchIndex(spark, path, corpus, queries, "vec_id",
      model, topK = 10, nProbe = 1, refine = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // same bound as PqSpec's refined search: the coarse prune must not
    // cost recall when the query's cluster maps to one cell
    val hits = got.map { case (q, ids) => (ids & exactTopK(q, 10).toSet).size }.sum
    assert(hits.toDouble / (10 * got.size) >= 0.9,
      s"recall ${hits.toDouble / (10 * got.size)}")
    // and exact re-rank output is the exact integer distance
    val d2s = IvfPq.searchIndex(spark, path, corpus, queries, "vec_id",
      model, topK = 3, nProbe = 1).select("q_id", "vec_id", "d2")
      .as[(Long, Long, Long)].collect()
    d2s.foreach { case (q, id, d) =>
      assert(d == d2(vecs(q), vecs(id)), s"d2($q,$id)") }
  }

  test("OPQ-permuted pipeline: searchIndex d2 is the raw-space exact distance") {
    // the exact composition the frontier_ivfpq_opq_* bench rows run:
    // permute embeddings, run the unchanged fit/write/search pipeline
    val corpus = clustered
    val queries = corpus.where($"vec_id" % 50 === 0)
    val perm = graft.ops.Pq.fitOpqPermutation(corpus, m = 4)
    def permuted(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("embedding",
        graft.ops.Pq.permuteEmbedding(col("embedding"), perm))
    val model = IvfPq.fit(permuted(corpus), "vec_id", nLists = 4, m = 4, k = 4)
    val path = tmpIdx("opq")
    IvfPq.writeIndex(permuted(corpus), "vec_id", model, path)
    val vecs = Similarity.withQuantized(corpus, "embedding")
      .select(col("vec_id"), col("ei")).as[(Long, Seq[Long])].collect().toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    // the probe's exact re-rank distances must equal RAW-space exact
    // integer distances — permutation invariance, the property that
    // makes OPQ frontier recall comparable against shared ground truth
    val d2s = IvfPq.searchIndex(spark, path, permuted(corpus),
        permuted(queries), "vec_id", model, topK = 3, nProbe = 4)
      .select("q_id", "vec_id", "d2").as[(Long, Long, Long)].collect()
    assert(d2s.nonEmpty)
    d2s.foreach { case (q, id, d) =>
      assert(d == d2(vecs(q), vecs(id)), s"d2($q,$id)") }
  }

  test("append + search equals full rebuild; maintain refits both levels") {
    val first = clustered.where($"vec_id" % 2 === 0)
    val rest = clustered.where($"vec_id" % 2 =!= 0)
    val model = IvfPq.fit(first, "vec_id", nLists = 4, m = 4, k = 4)
    val queries = clustered.where($"vec_id" % 50 === 0)

    val inc = tmpIdx("inc")
    IvfPq.writeIndex(first, "vec_id", model, inc)
    IvfPq.appendIndex(rest, "vec_id", model, inc)
    val full = tmpIdx("full")
    IvfPq.writeIndex(clustered, "vec_id", model, full)
    val a = IvfPq.searchIndex(spark, inc, clustered, queries, "vec_id",
      model, topK = 5, nProbe = 2).orderBy("q_id", "rnk").collect().toSeq
    val b = IvfPq.searchIndex(spark, full, clustered, queries, "vec_id",
      model, topK = 5, nProbe = 2).orderBy("q_id", "rnk").collect().toSeq
    assert(a == b)

    // healthy tick: nothing rebuilt, model unchanged, directory intact
    val before = new java.io.File(inc).lastModified()
    val healthy = IvfPq.maintainInPlace(spark, inc, clustered, "vec_id", model,
      nLists = 4, m = 4, k = 4, threshold = 1e9)
    assert(!healthy.rebuilt && healthy.model == model)

    // forced rebuild (threshold below any real imbalance): the swapped
    // index under the refit model serves exactly a fresh fit + build
    val rep = IvfPq.maintainInPlace(spark, inc, clustered, "vec_id", model,
      nLists = 4, m = 4, k = 4, threshold = 0.0)
    assert(rep.rebuilt)
    val freshModel = IvfPq.fit(clustered, "vec_id", nLists = 4, m = 4, k = 4)
    assert(rep.model == freshModel)
    val fresh = tmpIdx("fresh")
    IvfPq.writeIndex(clustered, "vec_id", freshModel, fresh)
    val viaMaintained = IvfPq.searchIndex(spark, inc, clustered, queries,
      "vec_id", rep.model, topK = 5, nProbe = 2)
      .orderBy("q_id", "rnk").collect().toSeq
    val viaFresh = IvfPq.searchIndex(spark, fresh, clustered, queries,
      "vec_id", freshModel, topK = 5, nProbe = 2)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(viaMaintained == viaFresh)
    assert(before > 0L) // directory existed before the cadence ticked
  }

  test("residual codes: recall@k at refine=1 >= non-residual at equal m; lifecycle round-trips the flag") {
    val corpus = clustered
    val queries = corpus.where($"vec_id" % 50 === 0)
    val mNon = IvfPq.fit(corpus, "vec_id", nLists = 4, m = 4, k = 4)
    val mRes = IvfPq.fit(corpus, "vec_id", nLists = 4, m = 4, k = 4,
      residual = true)
    // same coarse level; only the codebooks (and their interpretation)
    // differ
    assert(mRes.residual && !mNon.residual && mRes.coarse == mNon.coarse)

    val pNon = tmpIdx("res_non"); val pRes = tmpIdx("res_res")
    IvfPq.writeIndex(corpus, "vec_id", mNon, pNon)
    IvfPq.writeIndex(corpus, "vec_id", mRes, pRes)
    // the codes-only storage contract is interpretation-independent
    assert(spark.read.parquet(pRes).columns.sorted.toSeq ==
      Seq("cell", "codes", "vec_id"))

    val vecs = Similarity.withQuantized(corpus, "embedding")
      .select(col("vec_id"), col("ei")).as[(Long, Seq[Long])].collect().toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    def exactTopK(q: Long, k: Int): Seq[Long] =
      vecs.collect { case (id, v) if id != q => (d2(vecs(q), v), id) }
        .toSeq.sorted.take(k).map(_._2)

    // refine=1 makes the ADC shortlist THE final set, so recall here
    // measures code fidelity (the quantity residual encoding buys),
    // not the re-rank's rescue
    def recall(path: String, model: IvfPq.Model): Double = {
      val got = IvfPq.searchIndex(spark, path, corpus, queries, "vec_id",
        model, topK = 10, nProbe = 4, refine = 1)
        .select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      got.map { case (q, ids) => (ids & exactTopK(q, 10).toSet).size }
        .sum.toDouble / (10 * got.size)
    }
    val rNon = recall(pNon, mNon)
    val rRes = recall(pRes, mRes)
    assert(rRes >= rNon, s"residual recall $rRes < non-residual $rNon")

    // exact re-rank distances stay exact under residual codes (stage 3
    // never touches codes)
    val d2s = IvfPq.searchIndex(spark, pRes, corpus, queries, "vec_id",
      mRes, topK = 3, nProbe = 2).select("q_id", "vec_id", "d2")
      .as[(Long, Long, Long)].collect()
    assert(d2s.nonEmpty)
    d2s.foreach { case (q, id, d) => assert(d == d2(vecs(q), vecs(id))) }

    // forced maintain refits BOTH levels, keeps the flag, and the
    // refit codes are residuals of the NEW coarse level: the
    // maintained index serves exactly a fresh residual fit + build
    val rep = IvfPq.maintainInPlace(spark, pRes, corpus, "vec_id", mRes,
      nLists = 4, m = 4, k = 4, threshold = 0.0)
    assert(rep.rebuilt && rep.model.residual)
    assert(rep.model == IvfPq.fit(corpus, "vec_id", nLists = 4, m = 4,
      k = 4, residual = true))
    val fresh = tmpIdx("res_fresh")
    IvfPq.writeIndex(corpus, "vec_id", rep.model, fresh)
    val a = IvfPq.searchIndex(spark, pRes, corpus, queries, "vec_id",
      rep.model, topK = 5, nProbe = 2).orderBy("q_id", "rnk").collect().toSeq
    val b = IvfPq.searchIndex(spark, fresh, corpus, queries, "vec_id",
      rep.model, topK = 5, nProbe = 2).orderBy("q_id", "rnk").collect().toSeq
    assert(a == b)
  }

  test("residual probe plan carries the centroid map ONCE, not per LUT entry") {
    // Regression pin for the r12 x20 OOM: lutColumn splices its ei
    // argument into all m*k code entries (3 dotLong references each),
    // so passing the residual TREE duplicated the full nLists x dims
    // centroid map ~m*k*3 times. ConstantFolding collapses each copy
    // to ONE MapType literal node — plan node count barely moves —
    // but every literal still serializes the whole map, which is the
    // ~44 MiB task binary that OOM'd executors at 2.56M x 64-dim.
    // The fix projects the residual as its own column, so the map
    // literal appears exactly once; counting MapType literals is the
    // scale-independent pin (broken form: 48 at m=4/k=4, hundreds at
    // production shapes).
    val corpus = clustered
    val queries = corpus.where($"vec_id" % 50 === 0)
    val mRes = IvfPq.fit(corpus, "vec_id", nLists = 4, m = 4, k = 4,
      residual = true)
    val pRes = tmpIdx("plan_res")
    IvfPq.writeIndex(corpus, "vec_id", mRes, pRes)
    val probe = IvfPq.searchIndex(spark, pRes, corpus, queries,
      "vec_id", mRes, topK = 5, nProbe = 2)
    val mapLits = probe.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] => 1
      }.sum).sum
    }.sum
    assert(mapLits <= 2,
      s"centroid map literal duplicated $mapLits times in the residual probe plan")
  }
}
