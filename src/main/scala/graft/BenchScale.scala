package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Repeatable scale benchmark: the README's measured-scaling table as
  * a runnable main emitting ONE JSON line, so round-over-round deltas
  * are comparable artifacts instead of ad-hoc numbers.
  *
  * Inputs are synthesized deterministically from the sf0.1 fixtures by
  * cross-joining a replication index and remapping keys — e.g.
  * lineitem x20 = 12M rows, documents x100 = 50k docs (with real
  * duplicate structure for the dedup/clean ops, since replicas are
  * exact duplicates by construction).
  *
  * Usage: SPARK_GRAFT_SCALE=20 sbt "runMain graft.BenchScale"
  */
object BenchScale {

  private def loadAvg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "20").toInt
    val spark = GraftSession.local()
    val load0 = loadAvg()

    val tmp = Files.createTempDirectory("graft_bench_scale").toString

    // ---- deterministic scaled inputs -------------------------------
    def replicate(df: DataFrame, times: Int, keyCols: Seq[String]): DataFrame = {
      val rep = spark.range(times).select(col("id").as("rep__"))
      keyCols.foldLeft(df.crossJoin(rep)) { (d, k) =>
        d.withColumn(k, col(k) * times + col("rep__"))
      }.drop("rep__")
    }

    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val part = spark.read.parquet(s"$base/part.parquet")
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    // ts normalized to µs-long whatever the stored form (the fixture
    // has shipped ns-long AND native-timestamp variants), so the
    // interval arithmetic below is exact integer in one unit
    val ev = graft.queries.events(spark, base)
      .withColumn("ts", expr("unix_micros(ts)"))

    // materialize scaled inputs once (setup, not timed) with explicit
    // partitioning — a real 100 TB source arrives in thousands of row
    // groups, not the handful a crossJoin lineage would leave, and the
    // timed ops below must scan parquet at full core parallelism
    val parts = spark.sparkContext.defaultParallelism * 2
    replicate(li, scale, Seq("l_orderkey")).repartition(parts)
      .write.mode("overwrite").parquet(s"$tmp/src/lineitem.parquet")
    replicate(docs.select("doc_id", "text"), scale * 5, Seq("doc_id"))
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$tmp/docs.parquet")
    replicate(emb, 1280, Seq("vec_id")).repartition(parts)
      .write.mode("overwrite").parquet(s"$tmp/emb.parquet")
    // user_id also remapped: each replica is an independent user
    // universe, so join density per user stays constant
    replicate(ev, scale, Seq("event_id", "user_id")).repartition(parts)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    // web-like gram-df corpus: replicate() emits EXACT replicas, so
    // every gram's df >= the replication factor and minDf can prune
    // nothing — adversarial for df statistics and unlike any real
    // corpus (web gram dfs are Zipf, singleton-dominated). Tag every
    // 7th token per replica so ~3/7 of grams become replica-unique
    // singletons while the rest stay shared boilerplate.
    val gramTimes = scale * 5
    spark.read.parquet(s"$tmp/docs.parquet")
      .select(col("doc_id"), expr(
        s"""concat_ws(' ', transform(split(text, ' '),
           |  (t, i) -> IF(i % 7 = (doc_id % $gramTimes) % 7,
           |    concat(t, '~', doc_id % $gramTimes), t)))""".stripMargin).as("text"))
      .write.mode("overwrite").parquet(s"$tmp/docs_gram.parquet")

    val liBig = spark.read.parquet(s"$tmp/src/lineitem.parquet")
    val docsBig = spark.read.parquet(s"$tmp/docs.parquet")
    val embBig = spark.read.parquet(s"$tmp/emb.parquet")
    val evBig = spark.read.parquet(s"$tmp/events.parquet")
    val liRows = liBig.count()
    val docRows = docsBig.count()
    val embRows = embBig.count()
    val evRows = evBig.count()

    // ---- timed operations ------------------------------------------
    // best-of-2: the first run of an op pays one-time JIT/codegen and
    // cold page-cache costs that are noise at any real scale; the min
    // is the comparable round-over-round number
    // load telemetry, the Bench.scala suspect discipline ported (the
    // r9 gram_docfreq +60% drift was unfalsifiable without it): the
    // 1-minute load average is sampled right after every row; a row
    // whose sample exceeds 1.5x the worker thread count is flagged
    // suspect in the artifact — read its value as "host was
    // contended", not "operator regressed". Unlike Bench there is no
    // warmup anchor (scaled inputs ARE the run), so contention itself
    // is the signal.
    val loadByRow = scala.collection.mutable.LinkedHashMap[String, Double]()
    val suspectLoad = spark.sparkContext.defaultParallelism * 1.5
    def time(name: String)(action: => Unit): (String, Double) = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        action
        (System.nanoTime() - t0) / 1e9
      }
      loadByRow(name) = loadAvg()
      println(f"ROW $name ${runs.min}%.3f") // progress + crash-resilient partials
      name -> runs.min
    }
    // single-run timer for actions that MUTATE state (index builds,
    // epoch rotations, streaming store appends): a best-of-2 second
    // run would measure different work against the mutated state
    def timeOnce(name: String)(action: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      action
      val sec = (System.nanoTime() - t0) / 1e9
      loadByRow(name) = loadAvg()
      println(f"ROW $name $sec%.3f")
      name -> sec
    }
    // skew rows override three join configs; capture the PRIOR values
    // and restore exactly those (not hardcoded defaults) so config
    // drift — or a future Spark default change — can't leak an
    // altered broadcast threshold into every row after the skew block
    def withSkewOverrides(body: => Unit): Unit = {
      val keys = Seq(
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")
      val prior = keys.map(k => k -> spark.conf.getOption(k))
      spark.conf.set(keys(0), "false")
      spark.conf.set(keys(1), "-1")
      spark.conf.set(keys(2), "-1")
      try body
      finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    // Non-second rows (counts, recalls, MB, Mrows) register here so
    // the headline `value` stays a pure sum of SECONDS — r9 fix: the
    // r8-shape artifact summed measure rows into the total, which a
    // single 4.6M-candidate count row would have inflated 10x.
    val measureNames = scala.collection.mutable.LinkedHashSet[String]()
    // a measured VALUE row (counts, volumes) — same artifact shape as
    // the timed rows, unit carried in the row name
    def valueRow(name: String)(v: => Double): (String, Double) = {
      measureNames += name
      val x = v
      loadByRow(name) = loadAvg()
      println(f"ROW $name $x%.3f")
      name -> x
    }
    // shuffle-WRITE megabytes of one action: on local[32] wall time
    // hides exchange volume (shuffles hit page cache), but at 1000
    // executors bytes-over-the-wire IS the cost model — so claims of
    // the form "operator X moves less data than operator Y" are
    // measured here directly via task metrics, not inferred
    def shuffleMb(name: String)(action: => Unit): (String, Double) = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) { acc.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
        }
      }
      spark.sparkContext.addSparkListener(l)
      try { action; Thread.sleep(1500) } // drain the listener bus
      finally spark.sparkContext.removeSparkListener(l)
      val mb = acc.get() / 1e6
      loadByRow(name) = loadAvg()
      println(f"ROW $name $mb%.3f")
      measureNames += name
      name -> mb
    }
    // MAX per-task shuffle-read megabytes of one action: the
    // per-REDUCER load. A skewed key serializes its whole partition
    // through one reducer — on local[32] page cache that is invisible
    // in wall time, but at 1000 executors the hot reducer's bytes ARE
    // the straggler; salting's entire value proposition is dividing
    // exactly this number, so it is measured directly
    def maxTaskShuffleReadMb(name: String)(action: => Unit): (String, Double) = {
      val mx = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            mx.accumulateAndGet(m.shuffleReadMetrics.totalBytesRead, Math.max)
            ()
          }
        }
      }
      spark.sparkContext.addSparkListener(l)
      try { action; Thread.sleep(1500) } // drain the listener bus
      finally spark.sparkContext.removeSparkListener(l)
      val mb = mx.get() / 1e6
      loadByRow(name) = loadAvg()
      println(f"ROW $name $mb%.3f")
      measureNames += name
      name -> mb
    }
    // input records READ (millions) of one action: local[32] wall time
    // hides scan volume entirely (a 12M-row page-cached scan costs
    // ~0.3s, so any op with a fixed write/setup overhead "loses" to a
    // full rescan here) — but at 100 TB rows-scanned IS the refresh
    // cost, so O(batch)-vs-O(history) claims are measured in records
    // read (bytesRead is unreliable for file:// scans; recordsRead is
    // incremented by every FileScan)
    def inputMRows(name: String)(action: => Unit): (String, Double) = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) { acc.addAndGet(m.inputMetrics.recordsRead); () }
        }
      }
      spark.sparkContext.addSparkListener(l)
      try { action; Thread.sleep(1500) } // drain the listener bus
      finally spark.sparkContext.removeSparkListener(l)
      val mr = acc.get() / 1e6
      loadByRow(name) = loadAvg()
      println(f"ROW $name $mr%.3f")
      measureNames += name
      name -> mr
    }
    // data files under an index root: the quantity per-append file
    // scatter accumulates and compaction resets — at object-store
    // scale listing + per-file open cost is the probe's floor, so
    // append-discipline claims are measured in files, not inferred
    def countFiles(root: String): Double = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0.0
      else {
        val it = fs.listFiles(p, true)
        var n = 0L
        while (it.hasNext) {
          if (it.next().getPath.getName.endsWith(".parquet")) n += 1
        }
        n.toDouble
      }
    }

    // daily-ingest dedup, STEADY STATE: history = one fingerprint per
    // lineitem row (12M at x20 — far past auto-broadcast, the
    // realistic regime), then FOUR successive mostly-novel batches
    // (history/20 keys each, 2% re-crawls), all materialized as
    // parquet in setup — a real ingest reads its batch from storage,
    // it does not recompute an md5 lineage per scan. Plain re-shuffles
    // the full history fp set on EVERY ingest; the standing bloom is
    // built once per corpus epoch (BLOOMBUILD line, timed separately —
    // it amortizes across every batch until the next epoch), each
    // batch is routed through it, and accepted fingerprints fold in
    // via admit() so later batches probe the grown corpus.
    val nIncBatches = 4
    spark.range(liRows)
      .select(graft.ops.IncrementalDedup.fp60(concat(lit("h"), col("id"))).as("fp"))
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$tmp/inc_hist.parquet")
    val incHist = spark.read.parquet(s"$tmp/inc_hist.parquet")
    (0 until nIncBatches).foreach { b =>
      spark.range(liRows / 20).select(
        when(col("id") % 50 === 0,
            concat(lit("h"), (col("id") * 17 + b) % liRows))
          .otherwise(concat(lit(s"b${b}_"), col("id"))).as("key"))
        .select(col("key"),
          graft.ops.IncrementalDedup.fp60(col("key")).as("fp"))
        .write.mode("overwrite").parquet(s"$tmp/inc_batch_$b.parquet")
    }
    def incBatch(b: Int) = spark.read.parquet(s"$tmp/inc_batch_$b.parquet")
    val incBloom = {
      val t0 = System.nanoTime()
      val b = graft.ops.IncrementalDedup.buildBloom(incHist, "fp",
        expectedItems = liRows, fpp = 0.01)
      println(f"""BLOOMBUILD ${(System.nanoTime() - t0) / 1e9}%.3f""")
      b
    }
    // XL history (10x): where the regimes separate even on local[32] —
    // the plain anti-join's O(history) exchange stops being a free
    // memcpy, the bloom's in-place history scan stays flat
    val xlRows = liRows * 10
    spark.range(xlRows)
      .select(graft.ops.IncrementalDedup.fp60(concat(lit("h"), col("id"))).as("fp"))
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$tmp/inc_hist_xl.parquet")
    val incHistXl = spark.read.parquet(s"$tmp/inc_hist_xl.parquet")
    val incBloomXl = {
      val t0 = System.nanoTime()
      val b = graft.ops.IncrementalDedup.buildBloom(incHistXl, "fp",
        expectedItems = xlRows, fpp = 0.01)
      println(f"""BLOOMBUILD_XL ${(System.nanoTime() - t0) / 1e9}%.3f""")
      b
    }
    // sharded family over the same XL history: shard-local build (each
    // task allocates 1/N of the bitset instead of the full size that
    // stat.bloomFilter's aggregate pays per partition)
    val incShardedXl = {
      val t0 = System.nanoTime()
      val f = graft.ops.ShardedBloom.build(incHistXl, "fp",
        expectedItems = xlRows, fpp = 0.01, numShards = 8)
      println(f"""SHARDEDBUILD_XL ${(System.nanoTime() - t0) / 1e9}%.3f""")
      f
    }
    // file-backed epoch of the same family: built task-to-disk, never
    // assembled in any JVM — the 10^10-fp shape
    val shardedDirXl = {
      val t0 = System.nanoTime()
      val d = s"$tmp/sharded_xl/epoch1"
      graft.ops.ShardedBloom.buildToPath(incHistXl, "fp",
        expectedItems = xlRows, dir = d, fpp = 0.01, numShards = 8)
      println(f"""SHARDEDPATHBUILD_XL ${(System.nanoTime() - t0) / 1e9}%.3f""")
      d
    }

    // IVF maintenance cadence at scale: sample-fit -> full index build
    // -> drifted append -> health probe -> refit + rebuild (the
    // recovery path an append-only index needs). Build/append/rebuild
    // mutate the index directory, so they are timed single-run; the
    // idempotent health probe gets the usual min-of-2 below.
    var ivfServingModel: graft.ops.Ivf.Model = null
    val ivfOps: Seq[(String, Double)] = {
      def once(name: String)(action: => Unit): (String, Double) =
        timeOnce(name)(action)
      val idx = s"$tmp/ivf_idx"
      var model: graft.ops.Ivf.Model = null
      val fitT = once("ivf_fit_sample") {
        model = graft.ops.Ivf.fit(
          embBig.sample(withReplacement = false, 0.02, seed = 7L),
          "vec_id", nLists = 16, iterations = 2)
      }
      val buildT = once("ivf_index_build") {
        graft.ops.Ivf.writeIndex(embBig, model, idx)
      }
      val appendT = once("ivf_append_drift") {
        // a quarter-corpus batch drifted along dim 0: lands in the few
        // cells nearest the drift, skewing the index
        graft.ops.Ivf.appendIndex(
          embBig.where(col("vec_id") % 4 === 0)
            .select((col("vec_id") + lit(10L * embRows)).as("vec_id"),
              expr("transform(embedding, (x, i) -> IF(i = 0, x + 10f, x))")
                .as("embedding"),
              col("label")),
          model, idx)
      }
      val probeT = time("ivf_health_probe") {
        graft.ops.Ivf.cellImbalance(spark, idx)
        ()
      }
      val rebuildT = once("ivf_maintain_rebuild") {
        // threshold 1.0: any measured skew trips the rebuild — the
        // CONDITIONAL behavior is spec'd (IvfSpec); here we time the
        // expensive branch: probe + sample refit + full reassign +
        // partitioned rewrite + swap
        val rep = graft.ops.Ivf.maintainInPlace(spark, idx, "vec_id", model,
          nLists = 16, threshold = 1.0, iterations = 2, fitSample = 0.02)
        require(rep.rebuilt, s"drifted index must trip: ${rep.imbalance}")
        ivfServingModel = rep.model // the model now serving ivf_idx
      }

      // the same lifecycle under the catalog-pointer generation
      // discipline (Generations): healthy tick should price like the
      // bare health probe (the pointer adds one small-file read), and
      // a rotate should price like the delete+rename rebuild (the
      // atomic flip is one rename) — the reader-safety upgrade is
      // free if these rows track their unversioned twins
      val vroot = s"$tmp/ivf_root"
      val vBuildT = once("ivf_versioned_build_publish") {
        graft.ops.Ivf.writeIndexVersioned(spark, embBig, model, vroot)
        ()
      }
      graft.ops.Ivf.appendIndex( // same drift, untimed setup
        embBig.where(col("vec_id") % 4 === 0)
          .select((col("vec_id") + lit(10L * embRows)).as("vec_id"),
            expr("transform(embedding, (x, i) -> IF(i = 0, x + 10f, x))")
              .as("embedding"),
            col("label")),
        model, graft.ops.Generations.livePath(spark, vroot))
      val vHealthyT = time("ivf_versioned_healthy_tick") {
        val rep = graft.ops.Ivf.maintain(spark, vroot, "vec_id",
          model, nLists = 16, threshold = 1e9)
        require(!rep.rebuilt)
      }
      val vRotateT = once("ivf_versioned_rotate") {
        val rep = graft.ops.Ivf.maintain(spark, vroot, "vec_id",
          model, nLists = 16, threshold = 1.0, iterations = 2,
          fitSample = 0.02)
        require(rep.rebuilt, s"drifted index must trip: ${rep.imbalance}")
      }
      Seq(fitT, buildT, appendT, probeT, rebuildT, vBuildT, vHealthyT,
        vRotateT)
    }

    // IVF x PQ two-level index on the same corpus: the codes-only
    // index (m=8 codes/row vs 64 floats) vs the full-embedding IVF
    // index — build cost, probe cost, and on-disk bytes (the
    // compression claim measured, not asserted; sizes print as
    // IVFPQ_BYTES and land in the README)
    val ivfPqOps: Seq[(String, Double)] = {
      def dirBytes(p: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
        walk(new java.io.File(p))
      }
      val idx = s"$tmp/ivfpq_idx"
      var model: graft.ops.IvfPq.Model = null
      val fitT = timeOnce("ivfpq_fit_sample") {
        model = graft.ops.IvfPq.fit(
          embBig.sample(withReplacement = false, 0.02, seed = 7L),
          "vec_id", nLists = 16, m = 8, k = 16, oversample = 4)
      }
      val buildT = timeOnce("ivfpq_index_build") {
        graft.ops.IvfPq.writeIndex(embBig, "vec_id", model, idx)
      }
      val probeT = time("ivfpq_index_probe") {
        graft.ops.IvfPq.searchIndex(spark, idx, embBig,
          emb.where(col("vec_id") < 5), "vec_id", model,
          topK = 5, nProbe = 2).count()
      }
      // the full-embedding IVF index probe over the SAME queries/nProbe
      // (ivf_idx as left by the maintain rebuild, under its serving
      // model — no fit inside the timed block)
      val fullProbeT = time("ivf_index_probe") {
        graft.ops.Ivf.searchIndex(spark, s"$tmp/ivf_idx",
          emb.where(col("vec_id") < 5),
          "vec_id", ivfServingModel, k = 5, nProbe = 2).count()
      }
      println(s"IVFPQ_BYTES full=${dirBytes(s"$tmp/ivf_idx")} " +
        s"codes=${dirBytes(idx)}")
      Seq(fitT, buildT, probeT, fullProbeT)
    }

    // ---- ANN recall/latency frontier --------------------------------
    // the operating-curve measurement behind the family's scope claim:
    // per (index, nProbe) point, probe latency AND mean recall@10
    // against brute-force ground truth — the artifact that states
    // where IVF / IVF-PQ stop being the right index (recall ceilings
    // from code coarseness vs probe coverage; README "ANN frontier").
    //
    // The raw replicate() corpus is DEGENERATE for recall: every
    // neighbor set is 1280 exact copies of one base vector (all ties,
    // all in one cell), so every curve reads 1000 trivially. The
    // frontier corpus therefore jitters each replica per-dimension
    // (deterministic hash noise, ±0.1 ≈ 0.8x a component sigma:
    // replicas stay a tight cluster but get a REAL distance ordering),
    // and queries jitter harder (±0.35 ≈ 3 sigma) so they land near
    // cell boundaries — the regime where probe coverage actually
    // decides recall. Models fit fresh on the frontier corpus;
    // nLists=64 so nProbe 1..16 spans 1.5%..25% corpus coverage; PQ
    // at m=8 x k=32 — the in-plan LUT (m*k inline expressions) tops
    // out near k=64 before whole-stage codegen gives up, a measured
    // design ceiling the README states.
    //
    // Single-run rows: a curve tolerates per-point noise, and the
    // probe points at best-of-2 would double the section's cost for
    // nothing.
    val frontierOps: Seq[(String, Double)] = {
      val fpath = s"$tmp/emb_frontier.parquet"
      val setupT = timeOnce("frontier_corpus_setup") {
        embBig.select(col("vec_id"), expr(
          "transform(embedding, (x, i) -> CAST(x + (pmod(xxhash64(" +
            "vec_id * 64 + i), 1000) - 500) / 5000.0 AS FLOAT))")
          .as("embedding"), col("label"))
          .write.mode("overwrite").parquet(fpath)
      }
      val fcorpus = spark.read.parquet(fpath)
      val queries = emb.where(col("vec_id") < 32)
        .select(col("vec_id"), expr(
          "transform(embedding, (x, i) -> CAST(x + (pmod(xxhash64(" +
            "vec_id * 64 + i + 7), 1000) - 500) / 1430.0 AS FLOAT))")
          .as("embedding"))
      var fIvf: graft.ops.Ivf.Model = null
      var fPq: graft.ops.IvfPq.Model = null
      val fitT = timeOnce("frontier_fit_models") {
        // content-addressed 2% sample (NOT sample(seed): the seeded
        // sampler is only deterministic for a fixed partition layout,
        // so recall rows drifted run-to-run; hashing the id makes the
        // fit — and every recall row downstream — bit-stable)
        val sample = fcorpus.where(pmod(xxhash64(col("vec_id")), lit(50)) === 0)
        fIvf = graft.ops.Ivf.fit(sample, "vec_id", nLists = 64,
          iterations = 2)
        fPq = graft.ops.IvfPq.fit(sample, "vec_id", nLists = 64, m = 8,
          k = 32, oversample = 4)
      }
      val pqIdx = s"$tmp/ivfpq_idx_frontier"
      val ivfIdx = s"$tmp/ivf_idx_frontier"
      val buildT = timeOnce("frontier_index_builds") {
        graft.ops.IvfPq.writeIndex(fcorpus, "vec_id", fPq, pqIdx)
        graft.ops.Ivf.writeIndex(fcorpus, fIvf, ivfIdx)
      }
      var exact: DataFrame = null
      val gtT = timeOnce("frontier_exact_topk10") {
        exact = graft.ops.Similarity
          .bruteForceTopKNative(fcorpus, queries, "vec_id", k = 10)
          .persist()
        exact.count()
        ()
      }
      def meanRecall(approx: DataFrame): Double =
        graft.ops.AnnEval.recallAtK(approx, exact, "q_id", "vec_id", k = 10)
          .agg(avg("recall_milli")).head().getDouble(0)
      // IVF-PQ axis: nProbe alone is code-limited (flat); REFINE is
      // the lever — the exact re-rank depth recovers what the coarse
      // codes misrank, at near-flat latency. Round 12 extends the
      // sweep to rf 128/256 (the r11 frontier stopped at rf=64 /
      // recall 0.19, leaving the deployable operating point unproven)
      val pqPoints = Seq((1, 4), (4, 4), (4, 16), (4, 64), (4, 128),
          (4, 256), (16, 64))
        .flatMap { case (np, rf) =>
          var approx: DataFrame = null
          val t = timeOnce(s"frontier_ivfpq_probe_np${np}_rf$rf") {
            approx = graft.ops.IvfPq.searchIndex(spark, pqIdx,
              fcorpus, queries, "vec_id", fPq, topK = 10, nProbe = np,
              refine = rf)
            approx.count()
            ()
          }
          Seq(t, valueRow(s"frontier_ivfpq_recall_milli_np${np}_rf$rf") {
            meanRecall(approx)
          })
        }
      // the RESIDUAL variant at the same points — the standard
      // deployment (codes quantize ei - centroid(cell), spending the
      // codebooks on within-cell structure), never measured before
      // r12: the adjudication between "PQ is the memory-constrained
      // tier" and "flat IVF dominates at this dimensionality" needs
      // its best configuration on the board, not just the
      // SQL-replayable non-residual form
      val pqResPoints = {
        var fPqRes: graft.ops.IvfPq.Model = null
        val fitRes = timeOnce("frontier_fit_ivfpq_residual") {
          val sample = // content-addressed, same 2% slice as the main fit
            fcorpus.where(pmod(xxhash64(col("vec_id")), lit(50)) === 0)
          fPqRes = graft.ops.IvfPq.fit(sample, "vec_id", nLists = 64,
            m = 8, k = 32, oversample = 4, residual = true)
        }
        val pqResIdx = s"$tmp/ivfpq_res_idx_frontier"
        val buildRes = timeOnce("frontier_ivfpq_residual_build") {
          graft.ops.IvfPq.writeIndex(fcorpus, "vec_id", fPqRes, pqResIdx)
        }
        Seq(fitRes, buildRes) ++
          Seq((4, 4), (4, 64), (4, 128), (4, 256), (16, 64))
            .flatMap { case (np, rf) =>
              var approx: DataFrame = null
              val t = timeOnce(s"frontier_ivfpq_res_probe_np${np}_rf$rf") {
                approx = graft.ops.IvfPq.searchIndex(spark, pqResIdx,
                  fcorpus, queries, "vec_id", fPqRes, topK = 10,
                  nProbe = np, refine = rf)
                approx.count()
                ()
              }
              Seq(t,
                valueRow(s"frontier_ivfpq_res_recall_milli_np${np}_rf$rf") {
                  meanRecall(approx)
                })
            }
      }
      // the OPQ variant at the same points (round 13): the one
      // standard lever the PQ memory tier hadn't tried. Full-rotation
      // OPQ is incompatible with the exact-integer replay contract
      // (see Pq.fitOpqPermutation's scaladoc), so this measures the
      // coordinate-permutation restriction — balanced per-subspace
      // energy allocation instead of the natural contiguous split.
      // Implementation is pure composition: permute the embeddings,
      // run the unchanged IVF-PQ pipeline (permutation commutes with
      // quantization; cells, GT, and exact re-rank are L2-invariant,
      // so meanRecall against the shared ground truth is valid).
      val pqOpqPoints = {
        var perm: Seq[Int] = null
        var fPqOpq: graft.ops.IvfPq.Model = null
        def permuted(df: DataFrame): DataFrame = df.withColumn("embedding",
          graft.ops.Pq.permuteEmbedding(col("embedding"), perm))
        val fitOpq = timeOnce("frontier_fit_ivfpq_opq") {
          val sample = // content-addressed, same 2% slice as the main fit
            fcorpus.where(pmod(xxhash64(col("vec_id")), lit(50)) === 0)
          perm = graft.ops.Pq.fitOpqPermutation(sample, m = 8)
          fPqOpq = graft.ops.IvfPq.fit(permuted(sample), "vec_id",
            nLists = 64, m = 8, k = 32, oversample = 4)
        }
        val pqOpqIdx = s"$tmp/ivfpq_opq_idx_frontier"
        val buildOpq = timeOnce("frontier_ivfpq_opq_build") {
          graft.ops.IvfPq.writeIndex(permuted(fcorpus), "vec_id", fPqOpq,
            pqOpqIdx)
        }
        Seq(fitOpq, buildOpq) ++
          Seq((4, 4), (4, 64), (4, 128), (4, 256), (16, 64))
            .flatMap { case (np, rf) =>
              var approx: DataFrame = null
              val t = timeOnce(s"frontier_ivfpq_opq_probe_np${np}_rf$rf") {
                approx = graft.ops.IvfPq.searchIndex(spark, pqOpqIdx,
                  permuted(fcorpus), permuted(queries), "vec_id", fPqOpq,
                  topK = 10, nProbe = np, refine = rf)
                approx.count()
                ()
              }
              Seq(t,
                valueRow(s"frontier_ivfpq_opq_recall_milli_np${np}_rf$rf") {
                  meanRecall(approx)
                })
            }
      }
      // full-embedding IVF (exact distances, recall bounded only by
      // probe coverage) on the SAME queries — the family's other axis
      val ivfPoints = Seq(1, 4, 16).flatMap { np =>
        var approx: DataFrame = null
        val t = timeOnce(s"frontier_ivf_probe_np$np") {
          approx = graft.ops.Ivf.searchIndex(spark, ivfIdx,
            queries, "vec_id", fIvf, k = 10, nProbe = np)
          approx.count()
          ()
        }
        Seq(t, valueRow(s"frontier_ivf_recall_milli_np$np") {
          meanRecall(approx)
        })
      }
      // graph ANN (NN-Descent + beam walk) on the same corpus/queries:
      // (a) the honest standalone row — a kNN graph over a
      // 2000-cluster corpus has NO long-range links, so scattered
      // hash entries strand most queries outside their cluster
      // (coverage-limited recall, the measured reason the family
      // needs a router); (b) the two-layer shape — the SAME nProbe=1
      // IVF probe that reads low on its own seeds the graph walk,
      // which refines within the routed neighborhood.
      val graphRows: Seq[(String, Double)] = {
        var g: DataFrame = null
        val gBuildT = timeOnce("frontier_graph_build_k4_it1") {
          g = graft.ops.GraphAnn.buildGraph(fcorpus, "vec_id", k = 4,
            initBuckets = 160000, iterations = 1).persist()
          g.count()
          ()
        }
        var strideApprox: DataFrame = null
        val strideT = timeOnce("frontier_graph_probe_stride5000") {
          strideApprox = graft.ops.GraphAnn.searchStrideEntries(g, fcorpus,
            queries, "vec_id", k = 10, beam = 16, hops = 3,
            entryStride = 5000)
          strideApprox.count()
          ()
        }
        var seededApprox: DataFrame = null
        val seedT = timeOnce("frontier_graph_probe_ivfseed_np1") {
          val seeds = graft.ops.Ivf.searchIndex(spark, ivfIdx, queries,
              "vec_id", fIvf, k = 8, nProbe = 1)
            .select(col("q_id"), col("vec_id").as("node"))
          seededApprox = graft.ops.GraphAnn.searchSeeded(g, fcorpus,
            queries, "vec_id", k = 10, beam = 16, hops = 3, seeds)
          seededApprox.count()
          ()
        }
        // lifecycle pricing: persist the built graph once, then append
        // a 1% batch of NEW nodes via the join-shaped insert — the
        // O(batch) search + touched-bucket rewrite vs the full
        // NN-Descent rebuild (frontier_graph_build row). The batch's
        // vectors are fresh jitters with fresh ids, so the insert does
        // real neighbor discovery, not a replay. Round 10: the insert
        // batch's beam search is ROUTER-SEEDED (an nProbe=1 IVF
        // shortlist per batch row) — the r9 stride-seeded append cost
        // 58% of a rebuild AND seeded from the mode whose probe recall
        // measures 0.000 on this corpus; the router shortlist is the
        // mode appendIndexSeeded now makes primary.
        val gIdx = s"$tmp/gann_idx_frontier"
        val writeT = timeOnce("frontier_graph_index_write") {
          graft.ops.GraphAnn.writeEdges(g, gIdx, buckets = 256)
        }
        val batch = fcorpus
          .where(pmod(xxhash64(col("vec_id")), lit(100)) === 0)
          .select((col("vec_id") + 100000000L).as("vec_id"), expr(
            "transform(embedding, (x, i) -> CAST(x + (pmod(xxhash64(" +
              "vec_id * 64 + i + 13), 1000) - 500) / 2000.0 AS FLOAT))")
            .as("embedding"), col("label"))
        val corpus2 = fcorpus.unionByName(batch)
        val appendT = timeOnce("frontier_graph_append_1pct_routed") {
          val batchSeeds = graft.ops.Ivf.searchIndex(spark, ivfIdx, batch,
              "vec_id", fIvf, k = 8, nProbe = 1)
            .select(col("q_id"), col("vec_id").as("node"))
          graft.ops.GraphAnn.appendIndexSeeded(spark, gIdx, corpus2, batch,
            "vec_id", k = 4, beam = 16, hops = 3, seeds = batchSeeds,
            buckets = 256)
        }
        // recall AFTER the append, against fresh ground truth over the
        // grown corpus — drift was previously only inferred from
        // insFraction; this measures it on the recall axis directly
        var gt2: DataFrame = null
        val gt2T = timeOnce("frontier_graph_gt_after_append") {
          gt2 = graft.ops.Similarity
            .bruteForceTopKNative(corpus2, queries, "vec_id", k = 10)
            .persist()
          gt2.count()
          ()
        }
        var afterApprox: DataFrame = null
        val afterT = timeOnce("frontier_graph_probe_after_append") {
          val seeds = graft.ops.Ivf.searchIndex(spark, ivfIdx, queries,
              "vec_id", fIvf, k = 8, nProbe = 1)
            .select(col("q_id"), col("vec_id").as("node"))
          afterApprox = graft.ops.GraphAnn.searchIndexSeeded(spark, gIdx,
            corpus2, queries, "vec_id", k = 10, beam = 16, hops = 3, seeds)
          afterApprox.count()
          ()
        }
        val afterRecall = valueRow("frontier_graph_recall_milli_after_append") {
          graft.ops.AnnEval.recallAtK(afterApprox, gt2, "q_id", "vec_id",
              k = 10)
            .agg(avg("recall_milli")).head().getDouble(0)
        }
        gt2.unpersist()
        val out = Seq(gBuildT, strideT,
          valueRow("frontier_graph_recall_milli_stride5000") {
            meanRecall(strideApprox)
          },
          seedT,
          valueRow("frontier_graph_recall_milli_ivfseed_np1") {
            meanRecall(seededApprox)
          },
          writeT, appendT, gt2T, afterT, afterRecall)
        g.unpersist()
        out
      }
      // ---- graph build-quality sweep (round-10 adjudication) --------
      // The only r9 build point (k=4, it=1) was dominated by its own
      // IVF router; the open question was whether MORE build quality
      // (k 8-16, 2 iterations) finds an operating point. NN-Descent's
      // candidate volume is sum(deg^2) ~ (2k)^2 * n per round, so a
      // full-frontier k=16/it=2 build would cost ~20x the 500 s k=4
      // build — the sweep therefore runs on a deterministic 1/16
      // subcorpus with the SAME cluster geometry (every base vector
      // keeps ~80 of its 1280 jittered replicas) and fits its own IVF
      // on that subcorpus, so recall comparisons stay apples-to-
      // apples. The build walls themselves are frontier data: k=8 and
      // k=16 builds on 1/16 of the corpus already rival the k=4
      // full-corpus build, pinning the family's quadratic-in-k cost.
      val sweepRows: Seq[(String, Double)] = {
        val sub = fcorpus.where(pmod(xxhash64(col("vec_id")), lit(16)) === 3)
          .persist()
        val nSub = sub.count()
        var sIvf: graft.ops.Ivf.Model = null
        val sFitT = timeOnce("sweep16_ivf_fit") {
          sIvf = graft.ops.Ivf.fit( // content-addressed 10% (run-stable)
            sub.where(pmod(xxhash64(col("vec_id"), lit(9L)), lit(10)) === 0),
            "vec_id", nLists = 64, iterations = 2)
        }
        val sIvfIdx = s"$tmp/ivf_idx_sweep16"
        val sBuildT = timeOnce("sweep16_ivf_index_build") {
          graft.ops.Ivf.writeIndex(sub, sIvf, sIvfIdx)
        }
        var sExact: DataFrame = null
        val sGtT = timeOnce("sweep16_exact_topk10") {
          sExact = graft.ops.Similarity
            .bruteForceTopKNative(sub, queries, "vec_id", k = 10)
            .persist()
          sExact.count()
          ()
        }
        def sRecall(approx: DataFrame): Double =
          graft.ops.AnnEval.recallAtK(approx, sExact, "q_id", "vec_id",
              k = 10)
            .agg(avg("recall_milli")).head().getDouble(0)
        val ivfPts = Seq(1, 16).flatMap { np =>
          var a: DataFrame = null
          val t = timeOnce(s"sweep16_ivf_probe_np$np") {
            a = graft.ops.Ivf.searchIndex(spark, sIvfIdx, queries,
              "vec_id", sIvf, k = 10, nProbe = np)
            a.count()
            ()
          }
          Seq(t, valueRow(s"sweep16_ivf_recall_milli_np$np") { sRecall(a) })
        }
        def seeds() = graft.ops.Ivf.searchIndex(spark, sIvfIdx, queries,
            "vec_id", sIvf, k = 8, nProbe = 1)
          .select(col("q_id"), col("vec_id").as("node"))
        val graphPts = Seq((8, 2), (16, 2)).flatMap { case (k, it) =>
          var g: DataFrame = null
          val bT = timeOnce(s"sweep16_graph_build_k${k}_it$it") {
            g = graft.ops.GraphAnn.buildGraph(sub, "vec_id", k = k,
              initBuckets = math.max((nSub / 20).toInt, 1),
              iterations = it).persist()
            g.count()
            ()
          }
          var a: DataFrame = null
          val pT = timeOnce(s"sweep16_graph_probe_ivfseed_k${k}_it$it") {
            a = graft.ops.GraphAnn.searchSeeded(g, sub, queries, "vec_id",
              k = 10, beam = 16, hops = 3, seeds())
            a.count()
            ()
          }
          val r = valueRow(s"sweep16_graph_recall_milli_k${k}_it$it") {
            sRecall(a)
          }
          g.unpersist()
          Seq(bT, pT, r)
        }
        sExact.unpersist(); sub.unpersist()
        Seq(sFitT, sBuildT, sGtT) ++ ivfPts ++ graphPts
      }
      val rows = Seq(setupT, fitT, buildT, gtT) ++ pqPoints ++
        pqResPoints ++ pqOpqPoints ++ ivfPoints ++ graphRows ++ sweepRows
      exact.unpersist()
      rows
    }

    val results = ivfOps ++ ivfPqOps ++ frontierOps ++ Seq(
      time("agg_decimal") {
        liBig.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1)))
          .collect()
      },
      time("agg_exact_decimal") {
        // exact (order-independent) money aggregation, Decimal path
        liBig.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity").cast("decimal(18,2)")),
            sum(col("l_extendedprice").cast("decimal(18,2)")), count(lit(1)))
          .collect()
      },
      time("agg_exact_cents") {
        // same exact aggregation in primitive long cents
        liBig.groupBy("l_returnflag", "l_linestatus")
          .agg(graft.ops.Cents.sumUnits(col("l_quantity")),
            graft.ops.Cents.sumUnits(col("l_extendedprice")), count(lit(1)))
          .collect()
      },
      time("rowhash_exact_dedup") {
        graft.ops.Dedup.exactDedup(
          liBig.select(col("l_orderkey").as("id"),
            concat_ws("|", col("l_partkey"), col("l_suppkey"), col("l_quantity")).as("text")),
          "id", Seq("text")).count()
      },
      time("window_top3_per_key") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("l_partkey").orderBy(col("l_extendedprice").desc)
        liBig.withColumn("rn", row_number().over(w)).where(col("rn") <= 3).count()
      },
      // same job via the mergeable bounded aggregator (q116): the
      // shuffle carries <= 3 candidates per key per map partition
      // instead of the window's full 12M-row exchange + sort
      time("topk_agg3_per_key") {
        val topk = udaf(graft.functions.TopKAgg(3))
        liBig.select(col("l_partkey"),
            (col("l_extendedprice") * 100).cast("long").as("cents"),
            col("l_orderkey"))
          .groupBy("l_partkey")
          .agg(topk(col("cents"), col("l_orderkey")).as("top"))
          .select(explode(col("top"))).count()
      },
      // the scale-relevant half of the comparison: exchange VOLUME,
      // in BOTH group-density regimes. The aggregator's partial keeps
      // <= k rows per group per map partition, so its reduction
      // factor is k / (rows-per-group-per-partition): with ~40k
      // partkeys (sparse groups, ~9 rows/group/partition) the partial
      // barely reduces and its struct buffers compress worse than the
      // window's raw columnar rows — the window form measures SMALLER
      // there, honestly. With ~2k suppkeys (dense groups, ~190
      // rows/group/partition) the partial collapses the exchange.
      // Pick the operator by this measured crossover, not by slogan.
      shuffleMb("window_top3_partkey_shuffle_mb") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("l_partkey").orderBy(col("l_extendedprice").desc)
        liBig.withColumn("rn", row_number().over(w)).where(col("rn") <= 3).count()
      },
      shuffleMb("topk_agg3_partkey_shuffle_mb") {
        val topk = udaf(graft.functions.TopKAgg(3))
        liBig.select(col("l_partkey"),
            (col("l_extendedprice") * 100).cast("long").as("cents"),
            col("l_orderkey"))
          .groupBy("l_partkey")
          .agg(topk(col("cents"), col("l_orderkey")).as("top"))
          .select(explode(col("top"))).count()
      },
      shuffleMb("window_top3_suppkey_shuffle_mb") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("l_suppkey").orderBy(col("l_extendedprice").desc)
        liBig.withColumn("rn", row_number().over(w)).where(col("rn") <= 3).count()
      },
      shuffleMb("topk_agg3_suppkey_shuffle_mb") {
        val topk = udaf(graft.functions.TopKAgg(3))
        liBig.select(col("l_suppkey"),
            (col("l_extendedprice") * 100).cast("long").as("cents"),
            col("l_orderkey"))
          .groupBy("l_suppkey")
          .agg(topk(col("cents"), col("l_orderkey")).as("top"))
          .select(explode(col("top"))).count()
      },
      // exact top-k terms over the HUGE-vocab gram corpus (millions
      // of replica-tagged singleton terms): the full groupBy shuffles
      // one partial per distinct term per map partition — vocab-scale
      // exchange — while the q150 two-pass path shuffles only the
      // <= k Misra-Gries candidates' partials (pass 1 is a shuffle-
      // free treeAggregate of k-entry summaries)
      shuffleMb("hh_full_groupby_shuffle_mb") {
        spark.read.parquet(s"$tmp/docs_gram.parquet")
          .select(explode(split(col("text"), " ")).as("term"))
          .groupBy("term").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term")).limit(10).count()
      },
      shuffleMb("hh_twopass_candidates_shuffle_mb") {
        val toks = spark.read.parquet(s"$tmp/docs_gram.parquet")
          .select(explode(split(col("text"), " ")).as("term"))
        val cands = graft.ops.FrequentKeys.summarize(toks, "term", 29)
          .estimates.keys.toSeq
        toks.where(col("term").isin(cands: _*))
          .groupBy("term").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term")).limit(10).count()
      },
      // quantiles over 12M rows: exact percentile (full-width sort
      // state) vs the KLL mergeable sketch (O(k log n) per partial)
      time("percentile_exact_12M") {
        liBig.groupBy("l_returnflag")
          .agg(expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))"))
          .collect()
      },
      time("kll_sketch_12M") {
        liBig.groupBy("l_returnflag")
          .agg(graft.functions.Kll.sketchAgg(col("l_extendedprice")).as("sk"))
          .select(graft.functions.Kll.quantileUdf(col("sk"), lit(0.95)))
          .collect()
      },
      time("broadcast_join_agg") {
        liBig.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand").agg(sum("l_quantity")).collect()
      },
      time("rowhash_exact_dedup_fast") {
        graft.ops.Dedup.exactDedupFast(
          liBig.select(col("l_orderkey").as("id"),
            concat_ws("|", col("l_partkey"), col("l_suppkey"), col("l_quantity")).as("text")),
          "id", Seq("text")).count()
      },
      time("minhash_signatures") {
        graft.ops.Dedup.minhashSignatures(docsBig, "doc_id", "text",
          k = 8, shingleWidth = 3).count()
      },
      time("minhash_signatures_fast") {
        graft.ops.Dedup.minhashSignaturesFast(docsBig, "doc_id", "text",
          k = 8, shingleWidth = 3).count()
      },
      time("corpus_clean_full") {
        graft.pipeline.CorpusClean.clean(docsBig).count()
        spark.catalog.clearCache()
      },
      time("corpus_clean_fast") {
        graft.pipeline.CorpusClean.clean(docsBig,
          graft.pipeline.CorpusClean.Params(fastHashing = true)).count()
        spark.catalog.clearCache()
      },
      time("ann_bruteforce_native") {
        graft.ops.Similarity.bruteForceTopKNative(
          embBig, emb.where(col("vec_id") < 5), "vec_id", k = 5).count()
      },
      time("weighted_minhash") {
        graft.ops.Dedup.weightedMinhashSignatures(docsBig, "doc_id", "text",
          k = 8).count()
      },
      time("weighted_minhash_fast") {
        graft.ops.Dedup.weightedMinhashSignaturesFast(docsBig, "doc_id", "text",
          k = 8).count()
      },
      time("neardup_components") {
        val sig = graft.ops.Dedup.minhashSignaturesFast(docsBig, "doc_id",
          "text", k = 8, shingleWidth = 3)
        // star edges: connectivity-equivalent, n-1 edges per bucket
        val edges = graft.ops.Dedup.lshCandidateEdges(sig, "doc_id",
          bands = 4, rowsPerBand = 2)
        graft.ops.Dedup.connectedComponents(edges).count()
      },
      time("funnel_interval_join") {
        // µs-long timestamps: exact integer range join, 1h = 3.6e9 µs
        val c = evBig.where(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"))
        val p = evBig.where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        c.join(p, col("user_id") === col("p_user")
            && col("p_ts") > col("c_ts")
            && col("p_ts") <= col("c_ts") + lit(3600000000L))
          .count()
      },
      time("incremental_dedup_plain") {
        // the anti-join alone has no cross-batch memory: every ingest
        // re-shuffles history, and new batches cannot be checked
        // against previously ACCEPTED batches without rewriting the
        // history table each time (not timed here — plain gets the
        // cheaper job of checking against the static epoch only)
        (0 until nIncBatches).foreach { b =>
          incBatch(b).join(incHist, Seq("fp"), "left_anti").count()
        }
      },
      time("incremental_dedup_bloom") {
        // per-run copy of the epoch bloom: admit() mutates, and the
        // best-of-2 second run must start from the same standing
        // state. Clone via serialization — create() sizes its bit
        // array differently than stat.bloomFilter's aggregate, and
        // mergeInPlace rejects mismatched sizes.
        val bos = new java.io.ByteArrayOutputStream()
        incBloom.writeTo(bos)
        val standing = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bos.toByteArray))
        (0 until nIncBatches).foreach { b =>
          val kept = graft.ops.IncrementalDedup.dedupAgainstBloom(
            incBatch(b), incHist, "fp", standing)
          kept.count()
          graft.ops.IncrementalDedup.admit(standing, kept.select("fp"),
            "fp", expectedItems = liRows, fpp = 0.01)
        }
      },
      time("incremental_dedup_plain_xl") {
        // 120M-fp history: every ingest re-shuffles all of it
        (0 until nIncBatches).foreach { b =>
          incBatch(b).join(incHistXl, Seq("fp"), "left_anti").count()
        }
      },
      time("incremental_dedup_bloom_xl") {
        // same ingests against the same 120M-fp history, standing
        // bloom + broadcast probe: history is scanned in place
        val bos = new java.io.ByteArrayOutputStream()
        incBloomXl.writeTo(bos)
        val standing = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bos.toByteArray))
        (0 until nIncBatches).foreach { b =>
          val kept = graft.ops.IncrementalDedup.dedupAgainstBloom(
            incBatch(b), incHistXl, "fp", standing)
          kept.count()
          graft.ops.IncrementalDedup.admit(standing, kept.select("fp"),
            "fp", expectedItems = xlRows, fpp = 0.01)
        }
      },
      time("incremental_dedup_sharded_xl") {
        // the sharded family on the same XL ingests: must match or beat
        // the monolithic bloom row (identical routing semantics; the
        // family's win is build/admit shape, not probe speed)
        val standing = incShardedXl.copy()
        (0 until nIncBatches).foreach { b =>
          val kept = graft.ops.IncrementalDedup.dedupAgainstSharded(
            incBatch(b), incHistXl, "fp", standing)
          kept.count()
          graft.ops.IncrementalDedup.admitSharded(standing,
            kept.select("fp"), "fp")
        }
      },
      time("incremental_dedup_shardedpath_xl") {
        // file-backed epoch probe: no broadcast, shards lazy-load into
        // the executor-wide cache. Epoch-static (no admit — a file
        // family is rebuilt per corpus epoch), so compare against
        // incremental_dedup_plain_xl, which also probes the static
        // epoch only
        (0 until nIncBatches).foreach { b =>
          graft.ops.IncrementalDedup.dedupAgainstShardedPath(
            incBatch(b), incHistXl, "fp", shardedDirXl, numShards = 8)
            .count()
        }
      }) ++ {
      // ---- saturation cadence at XL: a family sized 64x too small
      // (realized fpp ~1 — every probe says MAYBE, the whole batch
      // rides the exact join) vs the same ingests after maintainEpoch
      // rebuilds it properly — the cost the cadence exists to reclaim
      val satDirXl = s"$tmp/sharded_sat/epoch1"
      graft.ops.ShardedBloom.buildToPath(incHistXl, "fp",
        expectedItems = math.max(xlRows / 64, 1L), dir = satDirXl,
        fpp = 0.01, numShards = 8)
      var rotatedDir = satDirXl
      Seq(
        time("incremental_dedup_shardedpath_saturated_xl") {
          (0 until nIncBatches).foreach { b =>
            graft.ops.IncrementalDedup.dedupAgainstShardedPath(
              incBatch(b), incHistXl, "fp", satDirXl).count()
          }
        },
        timeOnce("bloom_epoch_rotate_xl") {
          // measure + rebuild + reroute: the full cadence tick on the
          // saturated family (epoch2 sized from the live history)
          val rep = graft.ops.ShardedBloom.maintainEpoch(spark,
            incHistXl, "fp", satDirXl)
          require(rep.rotated, s"saturated family must rotate: $rep")
          rotatedDir = rep.dir
        },
        time("incremental_dedup_shardedpath_rotated_xl") {
          (0 until nIncBatches).foreach { b =>
            graft.ops.IncrementalDedup.dedupAgainstShardedPath(
              incBatch(b), incHistXl, "fp", rotatedDir).count()
          }
        })
    } ++ {
      // ---- streaming segment dedup against XL standing history: the
      // fps store pre-seeded with the 120M-fp history as epoch 1, the
      // family built + published as the first generation (loop epoch
      // 2) — then two 2k-doc micro-batches ride the file-backed probe
      // + tiny delta join (single-run: the loop appends to its own
      // store)
      val segRoot = s"$tmp/segstream"
      incHistXl.select(col("fp").as("seg_fp")).withColumn("epoch", lit(1))
        .write.mode("overwrite").partitionBy("epoch")
        .parquet(s"$segRoot/fps")
      graft.ops.ShardedBloom.buildToPathVersioned(
        spark.read.parquet(s"$segRoot/fps").select("seg_fp"), "seg_fp",
        expectedItems = xlRows * 13 / 10, root = s"$segRoot/bloom",
        fpp = 0.01, numShards = 8)
      Seq(
        timeOnce("segdedup_stream_sharded_xlhist") {
          Seq(0, 1).foreach { b =>
            graft.streaming.SegmentDedupStream.applyBatchSharded(
              spark.read.parquet(s"$tmp/docs.parquet")
                .where(col("doc_id") % 25 === b),
              "doc_id", "text", segTokens = 10, storeRoot = segRoot,
              outPath = s"$segRoot/out", numShards = 8)
          }
        })
    } ++ Seq(
      time("gram_docfreq_sharded") {
        // two-pass with the survivor filter as an 8-shard family —
        // same probe semantics as gram_docfreq, shard-local build
        graft.ops.Contamination.gramDocFrequency(
          spark.read.parquet(s"$tmp/docs_gram.parquet"),
          "doc_id", "text", n = 3, minDf = 2L, survivorShards = 8).count()
      },
      time("gram_docfreq") {
        // two-pass (native hash-count -> bloom -> exact strings for
        // survivors) on the web-like corpus. NOTE: input changed in
        // r4 from exact replicas to the perturbed corpus above — the
        // r03 number (8.86 s) is continued by gram_docfreq_replica.
        graft.ops.Contamination.gramDocFrequency(
          spark.read.parquet(s"$tmp/docs_gram.parquet"),
          "doc_id", "text", n = 3, minDf = 2L).count()
      },
      time("gram_docfreq_onepass") {
        // the same web-like input through the single-pass string
        // aggregation: what the two-pass is being measured against
        graft.ops.Contamination.gramDocFrequency(
          spark.read.parquet(s"$tmp/docs_gram.parquet"),
          "doc_id", "text", n = 3, minDf = 2L, twoPass = false).count()
      },
      time("gram_docfreq_replica") {
        // r03's input: exact replicas, every gram survives minDf — a
        // df prefilter cannot prune, so single-pass by choice (the
        // documented twoPass=false regime)
        graft.ops.Contamination.gramDocFrequency(docsBig, "doc_id", "text",
          n = 3, minDf = 2L, twoPass = false).count()
      },
      time("heavy_hitters_cms_onepass") {
        // q112's production shape at scale: sketch + total count in
        // ONE aggregation over the exploded tokens (no cache needed —
        // a single scan feeds both)
        val toks = docsBig.select(
          explode(graft.ops.TextAnalysis.tokens(col("text"))).as("term"))
        val r = toks.agg(
          expr("count_min_sketch(term, 0.0005d, 0.99d, 42)").as("cms"),
          count(lit(1)).as("total")).head()
        require(r.getLong(1) > 0L)
      },
      time("heavy_hitters_mg_enum") {
        // q113's production path at scale: Misra-Gries enumeration —
        // <= k-entry partial per partition, tree-merged shuffle-free,
        // O(k) driver state regardless of token cardinality
        val toks = docsBig.select(
          explode(graft.ops.TextAnalysis.tokens(col("text"))).as("term"))
        val mg = graft.ops.FrequentKeys.summarize(toks, "term", 29)
        require(mg.scanned > 0L && mg.estimates.nonEmpty)
      },
      time("profile_onepass") {
        // q84's shape at 2x the column count: one scan, Expand x9
        graft.ops.Profile.profileNumericOnePass(liBig,
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax")).count()
      },
      time("profile_grouped") {
        // the memory-pressure escape hatch: 4 scans, Expand x3 each,
        // small per-pass hash state (loses to one-pass when healthy)
        graft.ops.Profile.profileNumericGrouped(liBig,
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          groupSize = 2).count()
      },
      // the retrieval access-path claim, measured: BM25 from a corpus
      // re-scan (tokenize everything per query) vs the same contract
      // answered from the materialized positional index (query terms'
      // buckets + _doclen sidecar only). Build priced separately.
      timeOnce("inverted_index_build") {
        graft.ops.InvertedIndex.writeIndex(docsBig, "doc_id", "text",
          s"$tmp/invidx")
      },
      time("bm25_corpus_scan") {
        val toks = docsBig.select(col("doc_id"),
          explode(graft.ops.TextAnalysis.tokens(col("text"))).as("term"))
        val dl = docsBig.select(col("doc_id"),
          graft.ops.TextAnalysis.tokenCount(col("text")).as("dl"))
        val stats = docsBig.agg(count(lit(1)).as("n_docs"),
          sum(graft.ops.TextAnalysis.tokenCount(col("text"))).as("total_len"))
        val tf = toks.where(col("term").isin("join", "data", "spark"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        require(graft.ops.InvertedIndex.bm25Score(tf, dfreq, dl, stats, 20)
          .collect().length == 20)
      },
      time("bm25_index_probe") {
        require(graft.ops.InvertedIndex.bm25SearchIndex(spark, s"$tmp/invidx",
          Seq("join", "data", "spark"), 20).collect().length == 20)
      },
      time("phrase_index_probe") {
        require(graft.ops.InvertedIndex.phraseSearchIndex(spark,
          s"$tmp/invidx", Seq("table", "hash")).count() > 0)
      },
      // append-chain cost, priced: N appends leave O(N) file sets per
      // bucket, so probes open more files and the pushed term filter
      // skips fewer row groups; compaction rewrites the live
      // generation term-sorted (one file per bucket) and the probe
      // returns to built-fresh cost. Chain setup is untimed (its cost
      // is the appends' own O(batch) rows, already priced by
      // inverted_index_build's shape).
      timeOnce("invidx_chain_setup_12appends") {
        graft.ops.InvertedIndex.writeIndexVersioned(spark,
          docsBig.where(pmod(col("doc_id"), lit(13L)) === 0L),
          "doc_id", "text", s"$tmp/invidx_gen")
        (1L to 12L).foreach { i =>
          graft.ops.InvertedIndex.appendIndex(
            docsBig.where(pmod(col("doc_id"), lit(13L)) === i),
            "doc_id", "text",
            graft.ops.Generations.livePath(spark, s"$tmp/invidx_gen"))
        }
      },
      time("invidx_probe_after_12appends") {
        require(graft.ops.InvertedIndex.bm25SearchIndex(spark,
          graft.ops.Generations.livePath(spark, s"$tmp/invidx_gen"),
          Seq("join", "data", "spark"), 20).collect().length == 20)
      },
      timeOnce("invidx_compact") {
        graft.ops.InvertedIndex.compactVersioned(spark, s"$tmp/invidx_gen")
        ()
      },
      time("invidx_probe_after_compact") {
        require(graft.ops.InvertedIndex.bm25SearchIndex(spark,
          graft.ops.Generations.livePath(spark, s"$tmp/invidx_gen"),
          Seq("join", "data", "spark"), 20).collect().length == 20)
      },
      time("containment_prefix_join") {
        // df-ordered prefixes on the web-like gram corpus: replicas'
        // rarest shingles are their replica-unique tagged tokens, so
        // cross-replica candidate pairs are suppressed by the filter
        // itself — the property that keeps this lossless join linear
        // on singleton-dominated df distributions. In-join length +
        // per-row positional filters (round 9) cut the pair shuffle;
        // one checkpointed tokenization pass replaced the ~5 corpus
        // re-tokenizations that dominated the round-8 218s wall
        graft.ops.PrefixJoin.containmentSelfJoin(
          spark.read.parquet(s"$tmp/docs_gram.parquet"),
          "doc_id", "text", shingleWidth = 3, minContainMilli = 700).count()
      },
      // candidate VOLUME, not time: the lever the in-join filters pull
      // — how many pairs reach the exact verify (silent overselection
      // reads as "covered" when it isn't)
      valueRow("containment_candidate_kpairs") {
        graft.ops.PrefixJoin.containmentCandidates(
          spark.read.parquet(s"$tmp/docs_gram.parquet"),
          "doc_id", "text", shingleWidth = 3, minContainMilli = 700)
          .count() / 1000.0
      },
      time("lpa_2rounds_copurchase") {
        // iterative-graph cost per round at scale: 2 synchronous LPA
        // rounds over the part co-purchase graph (one node-keyed join
        // + two aggs per round, argmax map-side combined)
        val pairs = liBig.select("l_orderkey", "l_partkey")
        val e = pairs.as("a").join(pairs.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        require(graft.ops.LabelPropagation.run(e, iters = 2).count() > 0)
      },
      time("expectations_onepass") {
        // the q132 gate at scale: six-rule verdict over 12M rows in
        // one aggregation pass + one FK left join
        import graft.ops.Expectations._
        val v = evaluate(liBig, Seq(
          NotNull("l_partkey"), Unique(Seq("l_orderkey", "l_linenumber")),
          InRange("l_quantity", 0.0, 100.0),
          InSet("l_linestatus", Seq("O", "F")),
          RowCount(1L, 10000000000L))).collect()
        require(v.length == 5)
      },
      timeOnce("rollup_history_setup") {
        // incremental rollup maintenance setup: fold 3/4 of the event
        // history into the aggregate table, batch by batch
        val evR = evBig.select(
          expr("CAST(to_date(timestamp_micros(ts)) AS STRING)").as("day"),
          col("event_type"), col("user_id"),
          expr("CAST(round(value * 1000.0) AS BIGINT)").as("v"))
        val keys = Seq("day", "event_type")
        val ms = Seq(graft.ops.IncrementalAgg.count("n"),
          graft.ops.IncrementalAgg.sum("v", "sv"))
        (1 to 3).foreach { i =>
          graft.ops.IncrementalAgg.updateTable(spark, s"$tmp/rollup",
            evR.where(col("user_id") % 4 === i), keys, ms, "day")
        }
        // the 4th batch arrives as its OWN files (a real ingest reads
        // its batch from storage; folding a filter over the full
        // history would charge the fold a history-wide scan)
        evR.where(col("user_id") % 4 === 0)
          .write.mode("overwrite").parquet(s"$tmp/rollup_batch.parquet")
      },
      timeOnce("rollup_incremental_batch") {
        // steady-state per-batch cost: one O(batch) fold against the
        // standing 3/4-history rollup — compare to rollup_full_rescan,
        // and the gap WIDENS with history (the fold never reads it)
        graft.ops.IncrementalAgg.updateTable(spark, s"$tmp/rollup",
          spark.read.parquet(s"$tmp/rollup_batch.parquet"),
          Seq("day", "event_type"),
          Seq(graft.ops.IncrementalAgg.count("n"),
            graft.ops.IncrementalAgg.sum("v", "sv")), "day")
      },
      time("rollup_full_rescan") {
        // the refresh the incremental fold replaces: one GROUP BY over
        // the whole event history per refresh
        require(evBig.select(
            expr("CAST(to_date(timestamp_micros(ts)) AS STRING)").as("day"),
            col("event_type"),
            expr("CAST(round(value * 1000.0) AS BIGINT)").as("v"))
          .groupBy("day", "event_type")
          .agg(count(lit(1)).as("n"), sum("v").as("sv"))
          .collect().nonEmpty)
      },
      timeOnce("fbi_build_sidecar") {
        // per-file bloom sidecar over the 12M-row lineitem copy keyed
        // by the unordered high-cardinality l_orderkey
        graft.ops.FileBloomIndex.build(spark, s"$tmp/src/lineitem.parquet",
          "l_orderkey", s"$tmp/fbi", expectedPerFile = 400000L, fpp = 0.001)
      },
      time("fbi_point_lookup") {
        // needle-in-haystack: each probed key's handful of rows lives
        // in a few files; the sidecar prunes the rest without any
        // clustering — the regime min/max stats cannot prune. Full
        // rows are materialized (a lookup RETURNS rows; a count would
        // let column pruning flatter the full scan)
        require(graft.ops.FileBloomIndex.pointLookup(spark,
          s"$tmp/src/lineitem.parquet", s"$tmp/fbi", "l_orderkey",
          Seq(1L, 7L, 4242L)).collect().length > 0)
      },
      time("fbi_full_scan_lookup") {
        require(spark.read.parquet(s"$tmp/src/lineitem.parquet")
          .where(col("l_orderkey").isin(1L, 7L, 4242L))
          .collect().length > 0)
      },
      // the scale claims in RECORDS READ (wall above is
      // cache-flattered): the incremental fold reads O(batch) rows +
      // O(touched rollup rows), the rescan reads the full history;
      // the sidecar probe reads the sidecar (one row per file) +
      // candidate files only, the scan reads every row
      inputMRows("rollup_incremental_mrows_read") {
        graft.ops.IncrementalAgg.updateTable(spark, s"$tmp/rollup",
          spark.read.parquet(s"$tmp/rollup_batch.parquet"),
          Seq("day", "event_type"),
          Seq(graft.ops.IncrementalAgg.count("n"),
            graft.ops.IncrementalAgg.sum("v", "sv")), "day")
      },
      inputMRows("rollup_full_rescan_mrows_read") {
        require(evBig.select(
            expr("CAST(to_date(timestamp_micros(ts)) AS STRING)").as("day"),
            col("event_type"),
            expr("CAST(round(value * 1000.0) AS BIGINT)").as("v"))
          .groupBy("day", "event_type")
          .agg(count(lit(1)).as("n"), sum("v").as("sv"))
          .collect().nonEmpty)
      },
      inputMRows("fbi_point_lookup_mrows_read") {
        require(graft.ops.FileBloomIndex.pointLookup(spark,
          s"$tmp/src/lineitem.parquet", s"$tmp/fbi", "l_orderkey",
          Seq(1L, 7L, 4242L)).collect().length > 0)
      },
      inputMRows("fbi_full_scan_mrows_read") {
        require(spark.read.parquet(s"$tmp/src/lineitem.parquet")
          .where(col("l_orderkey").isin(1L, 7L, 4242L))
          .collect().length > 0)
      },
      time("span_scrub_500k_docs") {
        // cross-doc duplicated-span accounting over the webby gram
        // corpus (replica boilerplate + ~3/7 singleton tokens), on
        // the two-pass path (round 11): the corpus-wide shuffle
        // carries 8-byte gram hashes, strings are built in-row only
        // for bloom survivors, and the string-df verify runs on the
        // duplicated slice alone — bit-identical output to the
        // single-pass row below, which prices what the rewrite saves
        require(graft.ops.SpanScrub.dupSpanStats(
            spark.read.parquet(s"$tmp/docs_gram.parquet"), "doc_id",
            "split(lower(trim(text)), '\\\\s+')", n = 5)
          .agg(sum(col("n_masked"))).collect().nonEmpty)
      },
      timeOnce("span_scrub_500k_singlepass") {
        require(graft.ops.SpanScrub.dupSpanStats(
            spark.read.parquet(s"$tmp/docs_gram.parquet"), "doc_id",
            "split(lower(trim(text)), '\\\\s+')", n = 5, twoPass = false)
          .agg(sum(col("n_masked"))).collect().nonEmpty)
      },
      time("phash_neardup_500k_bmps") {
        // image near-dup at corpus scale (the q185 pipeline priced):
        // 500k 32x32 BMPs muxed in-flight (no I/O term), DECODED
        // back, integer-DCT pHashed, banded 4x16 + exact Hamming
        // verify — map-only until the 8-byte (band, hash) shuffle
        import spark.implicits._
        val media = spark.range(0, 500000L).as[Long].map { d =>
          val g = d / 4
          val gray = Array.tabulate(32 * 32) { i =>
            val y = i / 32; val x = i % 32
            40 + ((x * (3 + (g % 29).toInt) + y * (7 + (g % 23).toInt) +
              ((x * y) % 11) * (1 + (g % 19).toInt)) % 150) +
              (d % 4).toInt * 9 + (if (d % 4 == 3 && x == y) 15 else 0)
          }
          graft.ops.Multimodal.MediaRecord(d, "image",
            graft.ops.Multimodal.buildBmp(32, 32, gray))
        }
        val ph = graft.ops.Multimodal.perceptualHashes(media).toDF()
          .select(col("id"), col("phash"))
        require(graft.ops.Dedup.hashNearDupPairs(ph, "id", "phash",
            bands = 4, bandBits = 16, maxHamming = 8)
          .agg(count(lit(1))).collect().nonEmpty)
      },
      time("maxsim_exact_2m_toks") {
        // late-interaction ground truth: 4 query docs x 8 tokens
        // against 2.56M corpus token vectors — broadcast query side,
        // one corpus scan, map-side-combinable max+sum
        val mv = graft.ops.MaxSim.multiVector(embBig, "vec_id", 8)
        require(graft.ops.MaxSim.scoreExact(
            mv, mv.where(col("doc_id") < 4), k = 10)
          .collect().length > 0)
      },
      time("maxsim_lsh_2m_toks") {
        // production path: md5-hyperplane doc shortlist, exact
        // re-rank on survivors only — same scoring tail, so the win
        // is pure candidate-volume reduction
        val mv = graft.ops.MaxSim.multiVector(embBig, "vec_id", 8)
        require(graft.ops.MaxSim.scoreLshPruned(
            mv, mv.where(col("doc_id") < 4), k = 10,
            nPlanes = 8, dims = 64)
          .collect().length > 0)
      },
      time("bpe_train6_500k_docs") {
        // BPE tokenizer training at corpus scale: ONE corpus-wide
        // word-count shuffle, then 6 merge rounds over the compact
        // vocabulary (narrow pair transform + vocab-scale agg +
        // 1-row argmax per round) — corpus bytes price the first
        // pass only, the loop is vocab-bound
        val vocab = graft.ops.Bpe.wordVocab(
          spark.read.parquet(s"$tmp/docs_gram.parquet"), "text")
        val (merges, seg) = graft.ops.Bpe.train(spark, vocab, 6)
        require(merges.length == 6)
        seg.unpersist()
      },
      timeOnce("bpe_train32_batch8_500k_docs") {
        // production cadence: 32 merges in ~4 batched rounds (top-8
        // disjoint pairs per round, one fold pass each) vs 32
        // sequential argmax rounds — the lever that makes a
        // 30k-merge tokenizer trainable (rounds, not merges, pay the
        // synchronization cost)
        val vocab = graft.ops.Bpe.wordVocab(
          spark.read.parquet(s"$tmp/docs_gram.parquet"), "text")
        val (merges, seg) = graft.ops.Bpe.trainBatched(spark, vocab, 32, 8)
        require(merges.length == 32)
        seg.unpersist()
      },
      timeOnce("bpe_train32_seq_500k_docs") {
        val vocab = graft.ops.Bpe.wordVocab(
          spark.read.parquet(s"$tmp/docs_gram.parquet"), "text")
        val (merges, seg) = graft.ops.Bpe.train(spark, vocab, 32)
        require(merges.length == 32)
        seg.unpersist()
      }) ++ {
      // tokenizer artifact lifecycle (round 10): train on 24/25 of the
      // corpus and persist under Generations (setup), then price the
      // two ways to absorb the remaining 1/25 ingest — the refresh
      // (one batch-scale wordVocab + one vocab-scale count fold + an
      // in-row merge replay for genuinely new words; the corpus is
      // NEVER rescanned) vs the retrain the refresh replaces (full
      // corpus re-count + 6 argmax rounds). The maintain probe prices
      // the cadence tick that decides between them.
      // the PLAIN replica corpus, deliberately: its vocabulary is the
      // base corpus's (replicas add count mass, not words), so the
      // mrows axis separates refresh (batch + compact vocab) from
      // retrain (full corpus) — the tagged gram corpus's synthetic
      // singleton vocabulary would hide exactly that separation.
      // Both slices are MATERIALIZED as their own files (a real
      // ingest reads its batch from storage — a filter over the full
      // corpus file would charge the refresh a corpus-wide scan and
      // flatten the very axis being measured, the rollup-row lesson)
      val bpeRoot = s"$tmp/bpe_model"
      docsBig.where(pmod(col("doc_id"), lit(25L)) =!= 0L)
        .write.mode("overwrite").parquet(s"$tmp/bpe_train.parquet")
      docsBig.where(pmod(col("doc_id"), lit(25L)) === 0L)
        .write.mode("overwrite").parquet(s"$tmp/bpe_batch.parquet")
      val gram = docsBig
      val trainSlice = spark.read.parquet(s"$tmp/bpe_train.parquet")
      val batchSlice = spark.read.parquet(s"$tmp/bpe_batch.parquet")
      Seq(
        timeOnce("bpe_model_train6_write") {
          val (merges, seg) = graft.ops.Bpe.train(spark,
            graft.ops.Bpe.wordVocab(trainSlice, "text"), 6)
          require(merges.length == 6)
          graft.ops.Bpe.writeModelVersioned(spark, merges, seg, bpeRoot)
          seg.unpersist()
        },
        timeOnce("bpe_refresh_4pct_batch") {
          graft.ops.Bpe.refresh(spark, bpeRoot, batchSlice, "text")
          ()
        },
        time("bpe_maintain_healthy_tick") {
          val rep = graft.ops.Bpe.maintain(spark, bpeRoot, rounds = 6,
            threshold = 1e9)
          require(!rep.retrained)
        },
        timeOnce("bpe_retrain6_full_corpus") {
          val (merges, seg) = graft.ops.Bpe.train(spark,
            graft.ops.Bpe.wordVocab(gram, "text"), 6)
          require(merges.length == 6)
          seg.unpersist()
        },
        // the O(batch)-vs-O(corpus) claim in RECORDS READ (wall above
        // is cache-flattered at this corpus size): the refresh reads
        // the batch + the stored vocab; the retrain reads everything
        inputMRows("bpe_refresh_mrows_read") {
          graft.ops.Bpe.refresh(spark, bpeRoot, batchSlice, "text")
          ()
        },
        inputMRows("bpe_retrain_mrows_read") {
          val (_, seg) = graft.ops.Bpe.train(spark,
            graft.ops.Bpe.wordVocab(gram, "text"), 6)
          seg.unpersist()
        })
    } ++ Seq(
      time("epoch_shuffle_export_500k") {
        // full epoch export: content-addressed (shard, pos)
        // assignment + hive-per-shard write with in-file stream
        // order — the one-shuffle dataloader hand-off
        val assigned = graft.ops.Export.epochShards(
          spark.read.parquet(s"$tmp/docs.parquet"), "doc_id",
          epoch = 1, nShards = 64)
        graft.ops.Export.writeEpoch(assigned, s"$tmp/epoch1")
      },
      // the export's scale contract, measured on its own axes: total
      // exchange volume (the documented ONE-shuffle shape — assignment
      // window + co-keyed write repartition) and the max per-reducer
      // read (the shard-fits-a-task contract: corpus/nShards plus
      // md5-uniform imbalance, no hot shard by construction)
      shuffleMb("epoch_export_shuffle_mb") {
        val assigned = graft.ops.Export.epochShards(
          spark.read.parquet(s"$tmp/docs.parquet"), "doc_id",
          epoch = 1, nShards = 64)
        graft.ops.Export.writeEpoch(assigned, s"$tmp/epoch1")
      },
      maxTaskShuffleReadMb("epoch_export_maxtask_mb") {
        val assigned = graft.ops.Export.epochShards(
          spark.read.parquet(s"$tmp/docs.parquet"), "doc_id",
          epoch = 1, nShards = 64)
        graft.ops.Export.writeEpoch(assigned, s"$tmp/epoch1")
      },
      // MaxSim stored token-bucket index lifecycle (round 10): build
      // once (quantization + bucketing paid at build, not per query),
      // probe = bucket-pruned postings read + doc-hash-pruned re-rank
      // read + the shared exact tail, append = O(batch) partitioned
      // file adds. Compare maxsim_index_probe against
      // maxsim_lsh_2m_toks (same params): the probe's win is exactly
      // the per-batch corpus quantization it no longer pays.
      timeOnce("maxsim_index_build") {
        graft.ops.MaxSim.writeIndex(
          graft.ops.MaxSim.multiVector(embBig, "vec_id", 8),
          s"$tmp/maxsim_idx", nPlanes = 8, dims = 64)
      },
      time("maxsim_index_probe") {
        val mv = graft.ops.MaxSim.multiVector(embBig, "vec_id", 8)
        require(graft.ops.MaxSim.searchIndex(spark, s"$tmp/maxsim_idx",
            mv.where(col("doc_id") < 4), k = 10, nPlanes = 8, dims = 64)
          .collect().length > 0)
      },
      timeOnce("maxsim_index_append_1pct") {
        graft.ops.MaxSim.appendIndex(
          graft.ops.MaxSim.multiVector(
            embBig.where(pmod(xxhash64(col("vec_id")), lit(100)) === 7)
              .select((col("vec_id") + 200000000L).as("vec_id"),
                col("embedding"), col("label")),
            "vec_id", 8),
          s"$tmp/maxsim_idx", nPlanes = 8, dims = 64)
      }) ++ {
      // ---- MaxSim append: fixed vs variable cost (round 12) ----
      // The r11 chain read 9.4 s per 1% append against an 18 s full
      // build, suggesting per-append FIXED overhead (two partitioned
      // write jobs + a file per task per touched partition) dominates
      // the O(batch) variable part — the real bill at streaming
      // cadence. Three batch sizes on the same index, batches derived
      // AND materialized in the setup row (the invidx_chain_setup
      // discipline) so each append row prices exactly one
      // appendIndex call: flat rows = floor-bound, linear rows =
      // batch-bound. The files rows price the floor's driver: with
      // the r12 write-key repartition in appendIndex, one append adds
      // at most one file per touched partition value (<= 2^8 + 64)
      // instead of tasks x partitions.
      var b01: DataFrame = null
      var b10: DataFrame = null
      val batchSetup = timeOnce("maxsim_append_batches_setup") {
        def slice(mod: Int, offset: Long): DataFrame =
          graft.ops.MaxSim.multiVector(
            embBig.where(pmod(xxhash64(col("vec_id")), lit(mod)) === 7)
              .select((col("vec_id") + offset).as("vec_id"),
                col("embedding"), col("label")),
            "vec_id", 8).localCheckpoint(true)
        b01 = slice(1000, 230000000L)
        b10 = slice(10, 240000000L)
        require(b01.count() > 0 && b10.count() > 0)
      }
      def idxFiles(): Double = countFiles(s"$tmp/maxsim_idx")
      val files0 = idxFiles()
      val a01 = timeOnce("maxsim_index_append_01pct") {
        graft.ops.MaxSim.appendIndex(b01, s"$tmp/maxsim_idx",
          nPlanes = 8, dims = 64)
      }
      val files1 = idxFiles()
      val a10 = timeOnce("maxsim_index_append_10pct") {
        graft.ops.MaxSim.appendIndex(b10, s"$tmp/maxsim_idx",
          nPlanes = 8, dims = 64)
      }
      val files2 = idxFiles()
      // ---- Buffered staging (round 13): the floor actually CUT ----
      // The rows above price the unbuffered floor (~5 s / ~320 files
      // per append at ANY batch size). These prove the staged path
      // moved that bill: a sub-threshold appendIndexBuffered lands as
      // ONE coalesced staging parquet file, the probe unions staging
      // (maxsim_staged_probe prices the union against
      // maxsim_index_probe), and the ~320-file two-partitioned-write
      // bill is paid ONCE at the explicit fold (maxsim_staging_fold),
      // not once per append. Done-bar: staged_append_01pct materially
      // below index_append_{01,1,10}pct.
      var s01: DataFrame = null
      var s1: DataFrame = null
      val stagedSetup = timeOnce("maxsim_staged_batches_setup") {
        def slice(mod: Int, offset: Long): DataFrame =
          graft.ops.MaxSim.multiVector(
            embBig.where(pmod(xxhash64(col("vec_id")), lit(mod)) === 7)
              .select((col("vec_id") + offset).as("vec_id"),
                col("embedding"), col("label")),
            "vec_id", 8).localCheckpoint(true)
        s01 = slice(1000, 250000000L)
        s1 = slice(100, 260000000L)
        require(s01.count() > 0 && s1.count() > 0)
      }
      val files3 = idxFiles()
      val sa01 = timeOnce("maxsim_staged_append_01pct") {
        // require(!folded): the row prices a sub-threshold append
        require(!graft.ops.MaxSim.appendIndexBuffered(s01,
          s"$tmp/maxsim_idx", nPlanes = 8, dims = 64))
      }
      val files4 = idxFiles()
      val sa1 = timeOnce("maxsim_staged_append_1pct") {
        require(!graft.ops.MaxSim.appendIndexBuffered(s1,
          s"$tmp/maxsim_idx", nPlanes = 8, dims = 64))
      }
      val files5 = idxFiles()
      val sProbe = time("maxsim_staged_probe") {
        val mv = graft.ops.MaxSim.multiVector(embBig, "vec_id", 8)
        require(graft.ops.MaxSim.searchIndex(spark, s"$tmp/maxsim_idx",
            mv.where(col("doc_id") < 4), k = 10, nPlanes = 8, dims = 64)
          .collect().length > 0)
      }
      val sFold = timeOnce("maxsim_staging_fold") {
        graft.ops.MaxSim.foldStaging(spark, s"$tmp/maxsim_idx")
      }
      val files6 = idxFiles()
      Seq(batchSetup,
        valueRow("maxsim_append_files_01pct") { files1 - files0 },
        a01,
        valueRow("maxsim_append_files_10pct") { files2 - files1 },
        a10,
        stagedSetup,
        valueRow("maxsim_staged_append_files_01pct") { files4 - files3 },
        sa01,
        valueRow("maxsim_staged_append_files_1pct") { files5 - files4 },
        sa1,
        sProbe,
        sFold,
        valueRow("maxsim_staging_fold_files") { files6 - files5 })
    } ++ {
      // ---- MaxSim pruned-path recall + append-chain (round 12) ----
      // The production shortlist's QUALITY vs the exact path — the
      // measurement the graph-ANN adjudication taught us never to
      // skip. ROUND-12 FIXTURE CHANGE: the r11 rows measured recall
      // on the replicate() corpus, whose planted neighbors are
      // jittered replicas (cos θ ≈ 1) — hyperplane LSH collides with
      // those at any plane count, so all eight rows read 1.000 and
      // the instrument couldn't justify a default nPlanes or catch a
      // regression. These rows now run on AnnEval.plantedTokenBags:
      // per query doc, 12 true neighbors at CONTROLLED angular
      // distance (nominal cos θ = 0.848 down to 0.606, the band
      // where per-plane collision probability compounds to a real
      // miss rate), over 2.56M independent hash-grid corpus tokens.
      // Ground truth once (exact top-10 per query); each sweep point
      // is mean recall@10 in milli (the q138 AnnEval convention).
      // nPlanes trades probe cost against recall; the _mp rows price
      // the multi-probe rescue (each query token also probes its
      // nearest-boundary buckets) where single-probe decays.
      val mvR = graft.ops.MaxSim.multiVector(embBig, "vec_id", 8)
      val (plantedC, plantedQ) = graft.ops.AnnEval.plantedTokenBags(
        spark, dims = 64, nBgDocs = 320000L, m = 8,
        nQueries = 4, nPlanted = 12)
      var pmvR: org.apache.spark.sql.DataFrame = null
      var qR: org.apache.spark.sql.DataFrame = null
      var gtR: org.apache.spark.sql.DataFrame = null
      // fixture generation + checkpoints priced in their OWN setup
      // row (the maxsim_append_batches_setup discipline) so the GT
      // row prices exactly the exact-scoring pass
      val fixtureRow = timeOnce("maxsim_recall_fixture_setup") {
        pmvR = plantedC.localCheckpoint(true)
        qR = plantedQ.localCheckpoint(true)
        ()
      }
      val gtRow = timeOnce("maxsim_exact_gt_topk10") {
        gtR = graft.ops.MaxSim.scoreExact(pmvR, qR, k = 10)
          .localCheckpoint(true)
        require(gtR.count() > 0)
      }
      def maxsimRecall(nPlanes: Int, multiProbe: Int): Double =
        graft.ops.AnnEval.recallAtK(
            graft.ops.MaxSim.scoreLshPruned(pmvR, qR, k = 10,
              nPlanes = nPlanes, dims = 64, multiProbe = multiProbe),
            gtR, "q_doc", "doc_id", k = 10)
          .agg(avg(col("recall_milli"))).head().getDouble(0)
      val sweep = Seq(8, 12, 16).map { p =>
        valueRow(s"maxsim_recall_milli_p$p") { maxsimRecall(p, 0) }
      } ++ Seq(
        valueRow("maxsim_recall_milli_p12_mp2") { maxsimRecall(12, 2) },
        valueRow("maxsim_recall_milli_p16_mp2") { maxsimRecall(16, 2) },
        valueRow("maxsim_recall_milli_p16_mp4") { maxsimRecall(16, 4) },
        // the cost axis of the same tradeoff: the aggressive-prune
        // probe with and without the multi-probe expansion (compare
        // against maxsim_lsh_2m_toks, the p8 wall)
        timeOnce("maxsim_lsh_probe_p16") {
          require(graft.ops.MaxSim.scoreLshPruned(pmvR, qR, k = 10,
            nPlanes = 16, dims = 64).collect().nonEmpty)
        },
        timeOnce("maxsim_lsh_probe_p16_mp2") {
          require(graft.ops.MaxSim.scoreLshPruned(pmvR, qR, k = 10,
            nPlanes = 16, dims = 64, multiProbe = 2).collect().nonEmpty)
        }) ++ {
        // the SPARSE-bag regime (m=2 tokens/doc): the doc-level OR
        // has only 2 collision chances per query token instead of 8,
        // which is where the shortlist actually starves and
        // multi-probe earns its keep — measured so the scaladoc's
        // "insurance for sparser bags" claim is a number, not a guess
        val (plantedCS, plantedQS) = graft.ops.AnnEval.plantedTokenBags(
          spark, dims = 64, nBgDocs = 1280000L, m = 2,
          nQueries = 16, nPlanted = 12)
        var mvS: org.apache.spark.sql.DataFrame = null
        var qS: org.apache.spark.sql.DataFrame = null
        var gtS: org.apache.spark.sql.DataFrame = null
        val fixtureSRow = timeOnce("maxsim_recall_m2_fixture_setup") {
          mvS = plantedCS.localCheckpoint(true)
          qS = plantedQS.localCheckpoint(true)
          ()
        }
        val gtSRow = timeOnce("maxsim_exact_gt_m2_topk10") {
          gtS = graft.ops.MaxSim.scoreExact(mvS, qS, k = 10)
            .localCheckpoint(true)
          require(gtS.count() > 0)
        }
        def recallS(nPlanes: Int, multiProbe: Int): Double =
          graft.ops.AnnEval.recallAtK(
              graft.ops.MaxSim.scoreLshPruned(mvS, qS, k = 10,
                nPlanes = nPlanes, dims = 64, multiProbe = multiProbe),
              gtS, "q_doc", "doc_id", k = 10)
            .agg(avg(col("recall_milli"))).head().getDouble(0)
        Seq(fixtureSRow, gtSRow,
          // round 13: the p8 (default-planes) multi-probe column and
          // the p4 floor — the r12 rows left sparse bags with mp
          // rescue measured only at p16, so a short-doc user had no
          // adjudicated setting at the default operating point
          valueRow("maxsim_recall_milli_m2_p4") { recallS(4, 0) },
          valueRow("maxsim_recall_milli_m2_p8") { recallS(8, 0) },
          valueRow("maxsim_recall_milli_m2_p8_mp2") { recallS(8, 2) },
          valueRow("maxsim_recall_milli_m2_p8_mp4") { recallS(8, 4) },
          valueRow("maxsim_recall_milli_m2_p16") { recallS(16, 0) },
          valueRow("maxsim_recall_milli_m2_p16_mp2") { recallS(16, 2) },
          valueRow("maxsim_recall_milli_m2_p16_mp4") { recallS(16, 4) },
          // the COST axis of the sparse candidates: what the mp
          // rescue (and the near-exhaustive p4 shortlist) actually
          // pay, against maxsim_exact_gt_m2_topk10 as the exact wall
          timeOnce("maxsim_lsh_m2_probe_p8_mp2") {
            require(graft.ops.MaxSim.scoreLshPruned(mvS, qS, k = 10,
              nPlanes = 8, dims = 64, multiProbe = 2).collect().nonEmpty)
          },
          timeOnce("maxsim_lsh_m2_probe_p8_mp4") {
            require(graft.ops.MaxSim.scoreLshPruned(mvS, qS, k = 10,
              nPlanes = 8, dims = 64, multiProbe = 4).collect().nonEmpty)
          },
          timeOnce("maxsim_lsh_m2_probe_p4") {
            require(graft.ops.MaxSim.scoreLshPruned(mvS, qS, k = 10,
              nPlanes = 4, dims = 64).collect().nonEmpty)
          })
      }
      // Append-chain degradation + maintenance recovery (the
      // invidx_probe_after_12appends shape): 12 O(batch) appends —
      // one deliberately REPLAYED, the crash-without-marker case —
      // grow file count and duplicate postings; the probe row prices
      // the decay, maintain detects the dups and compacts, and the
      // post-compact probe proves the cadence restores probe cost.
      val msRoot = s"$tmp/maxsim_vroot"
      def msBatch(i: Int) = graft.ops.MaxSim.multiVector(
        embBig.where(pmod(xxhash64(col("vec_id")), lit(100)) === i)
          .select((col("vec_id") + i * 10000000L + 300000000L).as("vec_id"),
            col("embedding"), col("label")),
        "vec_id", 8)
      val msChain = Seq(
        timeOnce("maxsim_vidx_build") {
          graft.ops.MaxSim.writeIndexVersioned(mvR, msRoot,
            nPlanes = 8, dims = 64)
          ()
        },
        // batch derivation (13 filtered corpus scans) is fixture cost,
        // not operator cost — it lands as its own setup row (the
        // invidx_chain_setup discipline) so the append row prices
        // exactly the O(batch) index adds a real ingest pays
        timeOnce("maxsim_chain_setup_12batches") {
          (1 to 12).foreach { i =>
            msBatch(i).write.mode("overwrite")
              .parquet(s"$tmp/maxsim_batch_$i")
          }
        },
        timeOnce("maxsim_12appends_one_replayed") {
          val live = graft.ops.Generations.livePath(spark, msRoot)
          (1 to 12).foreach { i =>
            graft.ops.MaxSim.appendIndex(
              spark.read.parquet(s"$tmp/maxsim_batch_$i"), live,
              nPlanes = 8, dims = 64)
          }
          // batch 7 replays (the crash-without-marker case)
          graft.ops.MaxSim.appendIndex(
            spark.read.parquet(s"$tmp/maxsim_batch_7"), live,
            nPlanes = 8, dims = 64)
        },
        time("maxsim_probe_after_12appends") {
          val live = graft.ops.Generations.livePath(spark, msRoot)
          require(graft.ops.MaxSim.searchIndex(spark, live, qR, k = 10,
            nPlanes = 8, dims = 64).collect().nonEmpty)
        },
        timeOnce("maxsim_maintain_compact") {
          require(graft.ops.MaxSim.maintain(spark, msRoot).compacted,
            "replayed append left no dup postings to trip maintain")
        },
        time("maxsim_probe_after_compact") {
          val live = graft.ops.Generations.livePath(spark, msRoot)
          require(graft.ops.MaxSim.searchIndex(spark, live, qR, k = 10,
            nPlanes = 8, dims = 64).collect().nonEmpty)
        })
      // ---- STREAMING chain economics (round 14) ----
      // The r13 verdict read the 12-append chain as PROBE-bound
      // (~5.3 s/batch searchIndex x 12 ≈ the whole 63 s wall). These
      // rows price the REAL streaming loop — MaxSimStream.applyBatch
      // per batch: ONE shared quantization (quantizeBag), ONE
      // postings scan per probe (the r14 shortlist checkpoint), the
      // batch-partitioned sink write, and a buffered staging append —
      // at realistic per-batch ingest (4 docs x 8 tokens, the qR
      // probe shape: a streaming intake scores ARRIVING docs, so the
      // query bag is batch-sized, never corpus-sized). Runs against
      // msRoot post-compact (a clean index; nothing else reads it
      // after). Done-bar vs r13: the 12-batch chain materially below
      // both the 63 s append-chain wall and 12 x the old 5.3 s probe.
      val streamChain = {
        var sBatches: Seq[org.apache.spark.sql.DataFrame] = Seq.empty
        val sSetup = timeOnce("maxsim_stream_chain_setup") {
          sBatches = (1 to 12).map { i =>
            graft.ops.MaxSim.multiVector(
              embBig.where(col("vec_id") >= (i - 1) * 32L &&
                  col("vec_id") < i * 32L)
                .select((col("vec_id") + 500000000L).as("vec_id"),
                  col("embedding"), col("label")),
              "vec_id", 8).localCheckpoint(true)
          }
          require(sBatches.forall(_.count() == 32L),
            "stream-chain fixture: each batch must carry 32 tokens")
        }
        val sChain = timeOnce("maxsim_stream_chain_12batches") {
          (1 to 12).foreach { i =>
            graft.streaming.MaxSimStream.applyBatch(sBatches(i - 1), msRoot,
              s"$tmp/maxsim_stream_out", k = 10, nPlanes = 8, dims = 64,
              dBuckets = 64, batchId = i.toLong)
          }
        }
        // the probe alone after the chain (staging still unfolded):
        // the per-batch probe bill the chain row amortizes
        val sProbe = time("maxsim_probe_after_stream_chain") {
          val live = graft.ops.Generations.livePath(spark, msRoot)
          require(graft.ops.MaxSim.searchIndex(spark, live, qR, k = 10,
            nPlanes = 8, dims = 64).collect().nonEmpty)
        }
        Seq(sSetup, sChain, sProbe)
      }
      // ---- m2 probe pair at DOUBLE corpus (round 14) ----
      // The sparse-bag default (p8/mp4) saved 14% vs exact at 1.28M
      // docs — a default worth keeping only if the gap WIDENS with
      // corpus growth (the shortlist is sublinear in corpus, the
      // exact wall linear). Same planted-angular fixture at 2.56M
      // docs; compare maxsim_lsh_m2_x2_probe_p8_mp4 against the
      // maxsim_exact_gt_m2_x2_topk10 wall, and the recall row against
      // the 1.28M 0.875.
      val m2x2 = {
        val (c2, q2) = graft.ops.AnnEval.plantedTokenBags(
          spark, dims = 64, nBgDocs = 2560000L, m = 2,
          nQueries = 16, nPlanted = 12)
        var mvX: org.apache.spark.sql.DataFrame = null
        var qX: org.apache.spark.sql.DataFrame = null
        var gtX: org.apache.spark.sql.DataFrame = null
        val fixX = timeOnce("maxsim_recall_m2_x2_fixture_setup") {
          mvX = c2.localCheckpoint(true)
          qX = q2.localCheckpoint(true)
          ()
        }
        val gtXRow = timeOnce("maxsim_exact_gt_m2_x2_topk10") {
          gtX = graft.ops.MaxSim.scoreExact(mvX, qX, k = 10)
            .localCheckpoint(true)
          require(gtX.count() > 0)
        }
        val probeX = timeOnce("maxsim_lsh_m2_x2_probe_p8_mp4") {
          require(graft.ops.MaxSim.scoreLshPruned(mvX, qX, k = 10,
            nPlanes = 8, dims = 64, multiProbe = 4).collect().nonEmpty)
        }
        val recX = valueRow("maxsim_recall_milli_m2_x2_p8_mp4") {
          graft.ops.AnnEval.recallAtK(
              graft.ops.MaxSim.scoreLshPruned(mvX, qX, k = 10,
                nPlanes = 8, dims = 64, multiProbe = 4),
              gtX, "q_doc", "doc_id", k = 10)
            .agg(avg(col("recall_milli"))).head().getDouble(0)
        }
        Seq(fixX, gtXRow, probeX, recX)
      }
      (fixtureRow +: gtRow +: sweep) ++ msChain ++ streamChain ++ m2x2
    } ++ {
      // ---- SCD2 streaming late-data economics (round 14) ----
      // r13 shipped the watermark split + quarantine + backfill but
      // never priced them at x20 (the q190 gate wall doubled with
      // machinery and drift unseparated). Batches from the 12M-event
      // log, 64 buckets: the monotone fold prices the split's
      // overhead when NOTHING is late (watermark join, null guard,
      // two isEmpty actions, eager checkpoint); the out-of-order fold
      // adds a ~1% withheld slice whose rows are mostly below their
      // keys' watermarks — the quarantine write's marginal cost; the
      // drain row prices backfillQuarantine's semi-join-filtered log
      // scan + touched-bucket swap at that same realistic fraction.
      val store = s"$tmp/scd2_store"
      val evT = evBig.select(col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      var aB: DataFrame = null; var t1B: DataFrame = null
      var t2B: DataFrame = null; var holdB: DataFrame = null
      val scd2Setup = timeOnce("scd2_late_batches_setup") {
        // time cuts at 80%/90% of the span; the 1% holdout (by
        // event-id hash, from the first 80%) becomes the late slice
        val mm = evT.agg(min("ts"), max("ts")).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val c = lo + ((hi - lo) * 8) / 10
        val cc = lo + ((hi - lo) * 9) / 10
        val hold = pmod(xxhash64(col("event_id")), lit(100)) === 7
        aB = evT.where(col("ts") < c && !hold).localCheckpoint(true)
        t1B = evT.where(col("ts") >= c && col("ts") < cc && !hold)
          .localCheckpoint(true)
        t2B = evT.where(col("ts") >= cc && !hold).localCheckpoint(true)
        holdB = evT.where(col("ts") < c && hold).localCheckpoint(true)
        require(aB.count() > 0 && t1B.count() > 0 && t2B.count() > 0 &&
          holdB.count() > 0, "scd2 late fixture: empty slice")
      }
      val scd2Init = timeOnce("scd2_stream_initial_fold") {
        graft.streaming.Scd2Stream.applyBatch(spark, store, aB,
          "user_id", "ts", "event_id", Seq("event_type"),
          nBuckets = 64, batchId = 0L)
      }
      val scd2Mono = timeOnce("scd2_fold_monotone") {
        graft.streaming.Scd2Stream.applyBatch(spark, store, t1B,
          "user_id", "ts", "event_id", Seq("event_type"),
          nBuckets = 64, batchId = 1L)
      }
      val scd2Ooo = timeOnce("scd2_fold_outoforder") {
        graft.streaming.Scd2Stream.applyBatch(spark, store,
          t2B.unionByName(holdB), "user_id", "ts", "event_id",
          Seq("event_type"), nBuckets = 64, batchId = 2L)
      }
      val scd2LateRows = valueRow("scd2_quarantined_rows") {
        spark.read.parquet(s"$store/_latedata").count().toDouble
      }
      val scd2Drain = timeOnce("scd2_backfill_drain") {
        require(graft.streaming.Scd2Stream.backfillQuarantine(spark, store,
            evT, "user_id", "ts", "event_id", Seq("event_type"),
            nBuckets = 64) > 0,
          "scd2 late fixture: the out-of-order fold quarantined nothing")
      }
      // event-tee compaction priced (round 14): a year of minute-cadence
      // micro-batches is ~500k tee partitions; the compaction row is
      // the bill paid per maintenance tick to keep the PERMANENT log
      // archive file-sane. Fixture: the 2M-event log laid out as 64
      // marked batch partitions (the tee's shape), compacted down to
      // one segment + the keep-window
      def logDirs(): Double = {
        val p = new org.apache.hadoop.fs.Path(s"$store/_eventlog")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).count(s => s.isDirectory &&
          s.getPath.getName.startsWith("batch_id=")).toDouble
      }
      val teeSetup = timeOnce("scd2_eventlog_tee_setup") {
        evT.withColumn("batch_id", pmod(col("event_id"), lit(64)))
          .repartition(col("batch_id"))
          .write.mode("overwrite").partitionBy("batch_id")
          .parquet(s"$store/_eventlog")
        (0 until 64).foreach { id =>
          graft.streaming.BatchMarkers.applyOnce(spark, store, id.toLong) {}
          ()
        }
      }
      val dirsBefore = valueRow("scd2_eventlog_dirs_before") { logDirs() }
      val compact = timeOnce("scd2_eventlog_compact") {
        require(graft.streaming.Scd2Stream.compactEventLog(spark, store,
          keepRecentBatches = 2) == 62L, "compaction fixture: 62 victims")
      }
      val dirsAfter = valueRow("scd2_eventlog_dirs_after") { logDirs() }
      Seq(scd2Setup, scd2Init, scd2Mono, scd2Ooo, scd2LateRows, scd2Drain,
        teeSetup, dirsBefore, compact, dirsAfter)
    } ++ Seq(
      time("scd2_event_history") {
        // SCD2 interval build over the full 12M-event log: one
        // Exchange on user_id serves both window passes
        require(graft.ops.ChangeCapture.scd2(
            evBig.withColumn("tts", expr("timestamp_micros(ts)")),
            "user_id", "tts", "event_id", Seq("event_type"))
          .agg(count(lit(1))).collect().nonEmpty)
      },
      time("lloyd_step_3m_vectors") {
        // one exact-integer Lloyd iteration over 3.3M vectors:
        // broadcast-argmin assignment + one (cell, dim) map-side
        // combined aggregate; the |sum| < 2^53 parity guard holds
        // with orders of magnitude to spare at this corpus size
        val m0 = graft.ops.Ivf.fitQuantized(embBig, "vec_id", nLists = 16)
        val m1 = graft.ops.Ivf.lloydStepQuantized(embBig, m0)
        require(m1.centroids.size == 16)
      },
      time("asof_native_12m") {
        // native sorted-merge as-of: 12M purchases-to-clicks-shaped
        // events (parity split), one exchange + sort per side, single
        // forward pass
        val l = evBig.where(col("event_id") % 2 === 0)
          .select(col("user_id"), col("ts"), col("event_id"))
        val r = evBig.where(col("event_id") % 2 === 1)
          .select(col("user_id"), col("ts"), col("value"))
        require(graft.ops.AsOf.joinAsOfNative(l, r, "user_id", "ts", "ts",
            Seq("value"))
          .agg(count(col("value_asof"))).collect().nonEmpty)
      },
      time("asof_composed_12m") {
        // the union+window reference form on the same inputs — the
        // plan the native operator replaces (row-widening + window
        // machinery over the union)
        val l = evBig.where(col("event_id") % 2 === 0)
          .select(col("user_id"), col("ts"), col("event_id"))
        val r = evBig.where(col("event_id") % 2 === 1)
          .select(col("user_id"), col("ts"), col("value"))
        require(graft.ops.AsOf.joinAsOf(l, r, "user_id", "ts", "ts",
            Seq("value"))
          .agg(count(col("value_asof"))).collect().nonEmpty)
      },
      time("jl_projection_3m_vectors") {
        // map-only Rademacher projection of the full corpus to 8 dims
        // (zero Exchange; measures pure codegen'd per-row throughput)
        // per-row norms are exact longs; the cross-row roll-up here is
        // just a materialization sink, so double is fine (3.3M rows of
        // ~1e17 overflow a long)
        require(graft.ops.Projection.rademacher(embBig, "vec_id", k = 8)
          .agg(sum(expr(
            "CAST(aggregate(proj, 0L, (acc, x) -> acc + x*x) AS DOUBLE)")))
          .collect().nonEmpty)
      },
      // salted-join when-to-use, measured in the regime the operator
      // exists for (round 10 — the r9 synthetic was too tame: a
      // narrow 3-column fact let the page cache absorb the hot
      // partition and salted lost BOTH axes). Now: half of the 12M
      // fact rows collapse onto ONE dim key AND every row drags a
      // 128-byte HIGH-ENTROPY payload (md5 concat — the shuffle codec
      // cannot compress it away) through the exchange, so the plain
      // hot reducer must pull ~half the table's bytes through one
      // task. The dim (3M rows) is past auto-broadcast; AQE skew
      // splitting is disabled inside the rows so the OPERATOR is
      // measured as the fallback it is documented to be (AQE first —
      // the plain_aqe row shows the free fix). saltFactor=8 bounds
      // the dim replication to 24M narrow rows while fanning the hot
      // key over 8 reducers. WALL rows tell the local story; the
      // per-REDUCER maxtask rows measure the axis that decides at
      // 1000 executors (the hot reducer's bytes ARE the straggler).
      // Broadcast is pinned OFF inside the operator rows (AQE happily
      // runtime-broadcasts this 3M-row dim and the whole scenario
      // evaporates — the plain_aqe row keeps that honest baseline);
      // the operator's stated regime is a dim too big to broadcast.
      // Thresholds land in Skew's scaladoc from these rows.
      time("skew_hotkey_plain_aqe") {
        val big = liBig.select(
          expr("IF(l_orderkey % 2 = 0, 7L, l_suppkey)").as("k"),
          col("l_orderkey"), col("l_quantity"),
          expr("concat(md5(CAST(l_orderkey AS STRING)), md5(CAST(l_partkey AS STRING)), md5(CAST(l_suppkey * 31 + l_linenumber AS STRING)), md5(CAST(l_extendedprice AS STRING)))").as("payload"))
        val dim = spark.range(0, 3000000).select(col("id").as("k"),
          (col("id") % 97L).as("w"))
        require(big.join(dim, "k")
          .agg(count(lit(1)), sum(col("l_quantity") * col("w")),
            sum(length(col("payload"))))
          .collect().nonEmpty)
      },
      timeOnce("skew_hotkey_plain_noaqe") {
        withSkewOverrides {
          val big = liBig.select(
            expr("IF(l_orderkey % 2 = 0, 7L, l_suppkey)").as("k"),
            col("l_orderkey"), col("l_quantity"),
            expr("concat(md5(CAST(l_orderkey AS STRING)), md5(CAST(l_partkey AS STRING)), md5(CAST(l_suppkey * 31 + l_linenumber AS STRING)), md5(CAST(l_extendedprice AS STRING)))").as("payload"))
          val dim = spark.range(0, 3000000).select(col("id").as("k"),
            (col("id") % 97L).as("w"))
          require(big.join(dim, "k")
            .agg(count(lit(1)), sum(col("l_quantity") * col("w")),
              sum(length(col("payload"))))
            .collect().nonEmpty)
        }
      },
      timeOnce("skew_hotkey_salted") {
        // same no-AQE-skew setting: the row measures the OPERATOR as
        // the fallback, not AQE rescuing it
        withSkewOverrides {
          val big = liBig.select(
            expr("IF(l_orderkey % 2 = 0, 7L, l_suppkey)").as("k"),
            col("l_orderkey"), col("l_quantity"),
            expr("concat(md5(CAST(l_orderkey AS STRING)), md5(CAST(l_partkey AS STRING)), md5(CAST(l_suppkey * 31 + l_linenumber AS STRING)), md5(CAST(l_extendedprice AS STRING)))").as("payload"))
          val dim = spark.range(0, 3000000).select(col("id").as("k"),
            (col("id") % 97L).as("w"))
          require(graft.ops.Skew
            .saltedJoin(big, dim, "k", col("l_orderkey"), saltFactor = 8)
            .agg(count(lit(1)), sum(col("l_quantity") * col("w")),
              sum(length(col("payload"))))
            .collect().nonEmpty)
        }
      },
      maxTaskShuffleReadMb("skew_hotkey_plain_maxtask_mb") {
        withSkewOverrides {
          val big = liBig.select(
            expr("IF(l_orderkey % 2 = 0, 7L, l_suppkey)").as("k"),
            col("l_orderkey"), col("l_quantity"),
            expr("concat(md5(CAST(l_orderkey AS STRING)), md5(CAST(l_partkey AS STRING)), md5(CAST(l_suppkey * 31 + l_linenumber AS STRING)), md5(CAST(l_extendedprice AS STRING)))").as("payload"))
          val dim = spark.range(0, 3000000).select(col("id").as("k"),
            (col("id") % 97L).as("w"))
          require(big.join(dim, "k")
            .agg(count(lit(1)), sum(col("l_quantity") * col("w")),
              sum(length(col("payload"))))
            .collect().nonEmpty)
        }
      },
      maxTaskShuffleReadMb("skew_hotkey_salted_maxtask_mb") {
        withSkewOverrides {
          val big = liBig.select(
            expr("IF(l_orderkey % 2 = 0, 7L, l_suppkey)").as("k"),
            col("l_orderkey"), col("l_quantity"),
            expr("concat(md5(CAST(l_orderkey AS STRING)), md5(CAST(l_partkey AS STRING)), md5(CAST(l_suppkey * 31 + l_linenumber AS STRING)), md5(CAST(l_extendedprice AS STRING)))").as("payload"))
          val dim = spark.range(0, 3000000).select(col("id").as("k"),
            (col("id") % 97L).as("w"))
          require(graft.ops.Skew
            .saltedJoin(big, dim, "k", col("l_orderkey"), saltFactor = 8)
            .agg(count(lit(1)), sum(col("l_quantity") * col("w")),
              sum(length(col("payload"))))
            .collect().nonEmpty)
        }
      },
      time("historyload_pipeline") {
        val hl = new graft.pipeline.HistoryLoad(spark,
          graft.pipeline.PipelineConfig(s"$tmp/src", s"$tmp/out", runId = 1L,
            updatedBy = "bench", tables = Seq(graft.pipeline.TableConfig("lineitem", "T"))))
        val report = hl.process()
        require(report.failed.isEmpty && report.rowCounts("lineitem") == liRows,
          s"pipeline reconcile mismatch: $report")
      })

    val ops = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // `value` sums SECONDS rows only; `measures` names the rows in
    // `ops` that are counts/recalls/MB/Mrows (unit in the row name)
    val total = results.collect {
      case (k, v) if !measureNames.contains(k) => v
    }.sum
    val measures = measureNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val loads = loadByRow.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val suspects = loadByRow.collect {
      case (k, v) if v > suspectLoad => "\"" + k + "\":true"
    }.mkString("{", ",", "}")
    val load1 = loadAvg()
    println(f"""{"metric":"scale_total","value":$total%.3f,"unit":"sec","ops":$ops,"measures":$measures,"loads":$loads,"suspect":$suspects,"load_avg_start":$load0%.2f,"load_avg_end":$load1%.2f,"suspect_load_threshold":$suspectLoad%.1f,"rows":{"lineitem":$liRows,"documents":$docRows,"embeddings":$embRows,"events":$evRows},"scale":$scale,"base":"$base"}""")
    spark.stop()
    // scaled inputs are gigabytes; leaving them accumulates dirty
    // page-cache + disk across runs and skews later write-heavy ops
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(tmp))
  }
}
