package graft.ops

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Catalog-pointer generation discipline for on-disk index roots —
  * the atomic-swap shape [[Ivf.maintain]]'s and
  * [[ShardedBloom.maintainEpoch]]'s scaladocs prescribe for
  * production and stand in for with delete+rename.
  *
  * Layout under one root directory:
  * {{{
  *   root/CURRENT        one line: the live generation's dir name
  *   root/gen-000001/    a fully-built, immutable index generation
  *   root/gen-000002/    ...
  * }}}
  *
  * The commit point is a SINGLE metadata operation: the new pointer
  * is written to a hidden temp file and renamed over `CURRENT` with
  * `Options.Rename.OVERWRITE` (atomic on HDFS-semantics stores). A
  * concurrent reader therefore resolves either the old generation or
  * the new one — never a missing pointer, a torn pointer, or a
  * half-written index — and keeps reading the OLD generation's files
  * safely after the flip, because generations are immutable and
  * [[prune]] never deletes the live one (callers prune with a keep
  * window covering their longest-running reader).
  *
  * This closes the one documented atomicity gap in the maintain
  * loops: `Ivf.checkedSwap` deletes the live dir before renaming the
  * rebuild over it, so a reader that listed files pre-swap can hit
  * FileNotFound mid-probe. Under a generation root, rebuild lands in
  * a NEW dir and the flip is pointer-only.
  *
  * At 100 TB nothing here scales with data: resolve is one small
  * file read per query plan (not per task), publish is one write +
  * one rename, prune deletes directories whose contents no pointer
  * reaches.
  *
  * Concurrency contract: readers unlimited, ONE maintainer at a time
  * — the same single-cadence-owner assumption every maintain loop in
  * this package already carries. Two concurrent builders would race
  * the same next-generation directory; serialize rotation through
  * whatever owns the cadence (a scheduler slot, a lock service).
  */
object Generations {
  private val Pointer = "CURRENT"
  private val GenPrefix = "gen-"

  private[ops] def genName(n: Long): String = f"$GenPrefix$n%06d"

  private def fcFor(p: Path, spark: SparkSession): FileContext =
    FileContext.getFileContext(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).getUri,
      spark.sparkContext.hadoopConfiguration)

  private def fsOf(p: Path, spark: SparkSession) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The live generation's number, if a pointer exists. A pointer
    * naming a non-existent dir (never possible through [[publish]],
    * which validates first) is reported as corrupt loudly rather
    * than silently treated as absent.
    */
  def current(spark: SparkSession, root: String): Option[Long] = {
    val ptr = new Path(root, Pointer)
    val fs = fsOf(ptr, spark)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val name =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val n =
        try {
          require(name.startsWith(GenPrefix))
          name.stripPrefix(GenPrefix).toLong
        } catch {
          case _: IllegalArgumentException => // bad prefix OR non-numeric
            throw new java.io.IOException(
              s"$root/$Pointer is corrupt: '$name' is not a generation name")
        }
      if (!fs.exists(new Path(root, name)))
        throw new java.io.IOException(
          s"$root/$Pointer names $name but that generation does not exist")
      Some(n)
    }
  }

  /** Absolute path of the live generation; error if none published. */
  def livePath(spark: SparkSession, root: String): String =
    current(spark, root) match {
      case Some(n) => new Path(root, genName(n)).toString
      case None => throw new java.io.IOException(
        s"no generation published under $root (missing $Pointer)")
    }

  /** The directory the NEXT generation should be built into. Does not
    * create or reserve it — the build job's own write commits it, and
    * nothing serves it until [[publish]].
    */
  def nextPath(spark: SparkSession, root: String): String =
    new Path(root, genName(current(spark, root).getOrElse(0L) + 1)).toString

  /** Atomically flip `CURRENT` to a fully-built generation dir under
    * `root`. Write-temp-then-rename-with-OVERWRITE: the pointer file
    * is never observable half-written, and the flip is one rename.
    */
  def publish(spark: SparkSession, root: String, genDir: String): Unit = {
    val gen = new Path(genDir)
    val name = gen.getName
    require(name.startsWith(GenPrefix),
      s"publish target must be a generation dir (got $genDir)")
    val rootP = new Path(root)
    val fs = fsOf(rootP, spark)
    require(fs.exists(gen), s"cannot publish $genDir: does not exist")
    val tmp = new Path(root,
      s".$Pointer.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write((name + "\n").getBytes("UTF-8")) finally out.close()
    fcFor(rootP, spark).rename(tmp, new Path(root, Pointer),
      Options.Rename.OVERWRITE)
  }

  /** Delete generations no pointer can reach, keeping the `keep`
    * newest — a keep window of 2 means one full generation of grace
    * for in-flight readers that resolved just before a flip. The live
    * generation is never deleted regardless of `keep`. Leftover
    * pointer temp files from crashed publishes go with them.
    *
    * Caveat: the window counts generation NUMBERS, so a
    * committed-but-never-published generation left by a crashed
    * rotation (skipped forward over, see ShardedBloom) occupies one
    * slot and shortens the previous live generation's grace by one
    * flip. If rotations crash often enough for that to matter, raise
    * `keep`.
    */
  def prune(spark: SparkSession, root: String, keep: Int = 2): Unit = {
    require(keep >= 1, "keep must be >= 1")
    val rootP = new Path(root)
    val fs = fsOf(rootP, spark)
    if (!fs.exists(rootP)) return
    val live = current(spark, root)
    val gens = fs.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(GenPrefix))
      .map(s => s.getPath.getName.stripPrefix(GenPrefix).toLong)
      .sorted
    gens.dropRight(keep).filterNot(live.contains).foreach { n =>
      fs.delete(new Path(root, genName(n)), true); ()
    }
    fs.listStatus(rootP).toSeq
      .filter(s => !s.isDirectory && s.getPath.getName.startsWith(s".$Pointer.tmp-"))
      .foreach { s => fs.delete(s.getPath, false); () }
  }
}
