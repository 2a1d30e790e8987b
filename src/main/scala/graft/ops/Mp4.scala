package graft.ops

/** MP4 / ISO BMFF (ISO/IEC 14496-12) header parse in pure JDK byte
  * arithmetic — the video sibling of [[Multimodal]]'s WAV/RIFF and
  * WebP chunk walks. Reads the box tree (`ftyp`, `moov/mvhd`,
  * `trak/tkhd`, `mdia/mdhd`, `minf/stbl/{stsd,stss,stsc,stsz,stco,
  * co64}`) for canvas dimensions, duration, sample count, codec
  * fourcc, and — the piece frame sampling needs — the BYTE OFFSET and
  * size of every sync (key) frame, derived by expanding the
  * sample-to-chunk (`stsc`) and chunk-offset (`stco`) tables exactly
  * as a demuxer would. The entropy-coded sample payloads themselves
  * need a real codec; everything a pipeline does BEFORE the codec
  * (locate keyframes, slice their bytes, pick k of them) is real here.
  *
  * Hostile-input stance (same as the sibling walks; the reference's
  * utils modules never parse media at all): 64-bit size fields, lying
  * lengths, truncated boxes, and pathological table counts must never
  * throw, hang, or allocate unbounded memory — the walk is monotone,
  * every table read is bounds-checked, table cardinalities are capped,
  * and [[parse]] returns None rather than propagating any failure.
  */
object Mp4 {

  /** Parsed header facts. `keyframeSamples` are 1-based sample numbers
    * from `stss` (empty + `allKeyframes=true` when the box is absent —
    * per spec that means every sample is a sync sample);
    * `keyframeOffsets`/`keyframeSizes` are the byte ranges of those
    * samples inside the payload, ready to hand to a codec;
    * `keyframeTimesMs` are their DECODE times from the `stts`
    * time-to-sample runs (cumulative delta sum, scaled by the media
    * timescale from `mdhd`) — empty when `stts` is absent or the
    * media timescale is unusable, so time-even frame sampling
    * ([[Multimodal.sampleKeyframes]]) can fall back to index-even.
    */
  case class Mp4Info(majorBrand: String, videoCodec: String,
                     timescale: Long, durationMs: Long,
                     width: Int, height: Int, nSamples: Int,
                     allKeyframes: Boolean,
                     keyframeSamples: Array[Int],
                     keyframeOffsets: Array[Long],
                     keyframeSizes: Array[Int],
                     mediaTimescale: Long = 0L,
                     keyframeTimesMs: Array[Long] = Array.empty)

  /** Caps on table cardinalities a crafted header could inflate: reads
    * stop at the cap (partial tables, never unbounded allocation).
    */
  private val MaxKeyframes = 4096
  private val MaxTableEntries = 1 << 20

  def isMp4(d: Array[Byte]): Boolean =
    d.length >= 12 && d(4) == 'f' && d(5) == 't' && d(6) == 'y' && d(7) == 'p'

  // ---- minimal muxer ------------------------------------------------

  /** Serialize a minimal but spec-valid single-track MP4: `ftyp` +
    * `moov` (mvhd, trak/tkhd, mdia/mdhd, minf/stbl with stsd, stts,
    * stsz, stss, stsc, stco) + one `mdat` chunk holding every sample's
    * payload back to back. Deterministic byte-for-byte in its inputs
    * (sample i's payload byte j is `(i*31 + j) & 0xff`), so specs and
    * oracle queries can predict the exact layout:
    * the single chunk's offset — and therefore every keyframe's byte
    * offset base — is `412 + stts + 4*sampleSizes.length +
    * 4*keyframes.length` where stts = `16 + 8*runs` (the default
    * uniform timing is one run, giving `436 + 4n + 4k`).
    *
    * This is the inverse of [[parse]] and the fixture generator for
    * the demuxer's tests: `parse(build(...))` must round-trip dims,
    * duration, codec, per-keyframe byte ranges, and decode times.
    *
    * @param keyframes 1-based sample numbers for the `stss` box
    * @param samplesPerChunk samples per mdat chunk; the default puts
    *   every sample in one chunk. A shorter final chunk gets its own
    *   `stsc` run, per spec — multi-chunk layouts exercise the
    *   demuxer's run expansion
    * @param sampleDeltas per-sample `stts` durations in timescale
    *   ticks; empty = uniform `durationTicks / n` for every sample
    *   (one run). Consecutive equal deltas are run-length encoded,
    *   exactly as the spec stores them
    */
  def build(width: Int, height: Int, timescale: Long, durationTicks: Long,
            codec: String, sampleSizes: Array[Int],
            keyframes: Array[Int],
            samplesPerChunk: Int = Int.MaxValue,
            sampleDeltas: Array[Long] = Array.empty): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach(out.write)
      out.toByteArray
    }
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      require(typ.length == 4)
      cat(be32(body.length + 8L), typ.getBytes("US-ASCII"), body)
    }
    val verFlags = be32(0L)
    val n = sampleSizes.length

    val ftyp = box("ftyp", cat("isom".getBytes("US-ASCII"), be32(0L)))
    val mvhd = box("mvhd", cat(verFlags, be32(0L), be32(0L), // creation, mod
      be32(timescale), be32(durationTicks),
      be32(0x00010000L), be16(0x0100), be16(0), // rate 1.0, volume, reserved
      new Array[Byte](8), // reserved
      cat(be32(0x00010000L), be32(0L), be32(0L), be32(0L), be32(0x00010000L),
        be32(0L), be32(0L), be32(0L), be32(0x40000000L)), // identity matrix
      new Array[Byte](24), be32(2L))) // pre_defined, next_track_id
    val tkhd = box("tkhd", cat(verFlags, be32(0L), be32(0L), be32(1L), // track 1
      be32(0L), be32(durationTicks), new Array[Byte](8),
      be16(0), be16(0), be16(0), be16(0), // layer, alt_group, volume, res
      cat(be32(0x00010000L), be32(0L), be32(0L), be32(0L), be32(0x00010000L),
        be32(0L), be32(0L), be32(0L), be32(0x40000000L)),
      be32(width.toLong << 16), be32(height.toLong << 16))) // 16.16 fixed
    val mdhd = box("mdhd", cat(verFlags, be32(0L), be32(0L),
      be32(timescale), be32(durationTicks), be16(0x55c4), be16(0))) // lang "und"
    val stsd = box("stsd", cat(verFlags, be32(1L),
      cat(be32(16L), codec.getBytes("US-ASCII"), new Array[Byte](8))))
    // stts: (sample_count, sample_delta) runs — run-length encode the
    // per-sample deltas (uniform default = a single run)
    val deltas: Array[Long] =
      if (sampleDeltas.nonEmpty) sampleDeltas
      else if (n > 0) Array.fill(n)(durationTicks / n)
      else Array.empty
    val sttsRuns = {
      val runs = Array.newBuilder[(Long, Long)]
      var i = 0
      while (i < deltas.length) {
        var j = i
        while (j + 1 < deltas.length && deltas(j + 1) == deltas(i)) j += 1
        runs += ((j - i + 1L, deltas(i)))
        i = j + 1
      }
      runs.result()
    }
    val stts = box("stts", cat(verFlags, be32(sttsRuns.length.toLong),
      cat(sttsRuns.map { case (c, dl) => cat(be32(c), be32(dl)) }
        .toIndexedSeq: _*)))
    val stsz = box("stsz", cat(verFlags, be32(0L), be32(n.toLong),
      cat(sampleSizes.map(s => be32(s.toLong)).toIndexedSeq: _*)))
    val stss = box("stss", cat(verFlags, be32(keyframes.length.toLong),
      cat(keyframes.map(k => be32(k.toLong)).toIndexedSeq: _*)))
    val spc = math.min(math.max(samplesPerChunk, 1), math.max(n, 1))
    val nChunks = if (n == 0) 1 else (n + spc - 1) / spc
    val tail = if (n == 0) spc else n - (nChunks - 1) * spc
    val runs = // second run only when the final chunk is short
      if (tail == spc || nChunks == 1) Array((1L, tail.toLong))
      else Array((1L, spc.toLong), (nChunks.toLong, tail.toLong))
    val stsc = box("stsc", cat(verFlags, be32(runs.length.toLong),
      cat(runs.map { case (fc, s) =>
        cat(be32(fc), be32(s), be32(1L))
      }.toIndexedSeq: _*)))
    // chunk c (0-based) starts after all samples of earlier chunks
    val prefix = sampleSizes.scanLeft(0L)(_ + _)
    val chunkRel = Array.tabulate(nChunks)(c => prefix(math.min(c * spc, n)))
    // two-pass: stco's entries are mdat-body-relative plus the header
    // length, which depends on every header byte before it — sizes are
    // layout-deterministic, so assemble once with base 0 to measure,
    // then with the real offset
    def assemble(chunkOff: Long): Array[Byte] = {
      val stco = box("stco", cat(verFlags, be32(nChunks.toLong),
        cat(chunkRel.map(rel => be32(chunkOff + rel)).toIndexedSeq: _*)))
      val stbl = box("stbl", cat(stsd, stts, stsz, stss, stsc, stco))
      val minf = box("minf", stbl)
      val mdia = box("mdia", cat(mdhd, minf))
      val trak = box("trak", cat(tkhd, mdia))
      val moov = box("moov", cat(mvhd, trak))
      val payload = cat(sampleSizes.zipWithIndex.map { case (sz, i) =>
        Array.tabulate[Byte](sz)(j => ((i * 31 + j) & 0xff).toByte)
      }.toIndexedSeq: _*)
      cat(ftyp, moov, box("mdat", payload))
    }
    val mdatBodyOff = assemble(0L).length - sampleSizes.map(_.toLong).sum
    assemble(mdatBodyOff)
  }

  def parse(d: Array[Byte]): Option[Mp4Info] =
    try parseUnsafe(d)
    catch { case scala.util.control.NonFatal(_) => None }

  // ---- byte readers (bounds-checked, big-endian per spec) ----------

  private def u32(d: Array[Byte], p: Long): Long =
    if (p < 0 || p + 4 > d.length) -1L
    else ((d(p.toInt) & 0xffL) << 24) | ((d(p.toInt + 1) & 0xffL) << 16) |
      ((d(p.toInt + 2) & 0xffL) << 8) | (d(p.toInt + 3) & 0xffL)

  private def u64(d: Array[Byte], p: Long): Long =
    if (p < 0 || p + 8 > d.length) -1L
    else (u32(d, p) << 32) | u32(d, p + 4)

  private def fourcc(d: Array[Byte], p: Long): String =
    if (p < 0 || p + 4 > d.length) ""
    else new String(d, p.toInt, 4, "US-ASCII")

  /** Child boxes of [start, end): (type, bodyStart, bodyEnd). The walk
    * is monotone — size==0 (to end) and size==1 (64-bit largesize) are
    * honored, anything smaller than its own header stops the walk.
    */
  private def children(d: Array[Byte], start: Long, end: Long): Seq[(String, Long, Long)] = {
    val out = Seq.newBuilder[(String, Long, Long)]
    var pos = start
    val stop = math.min(end, d.length.toLong)
    var walking = true
    while (walking && pos + 8 <= stop) {
      val size32 = u32(d, pos)
      val typ = fourcc(d, pos + 4)
      val (size, hdr) =
        if (size32 == 0L) (stop - pos, 8L) // box extends to container end
        else if (size32 == 1L) (u64(d, pos + 8), 16L)
        else (size32, 8L)
      if (size < hdr || pos + size > stop) walking = false // lying length
      else {
        out += ((typ, pos + hdr, pos + size))
        pos += size
      }
    }
    out.result()
  }

  private def child(d: Array[Byte], start: Long, end: Long,
                    typ: String): Option[(Long, Long)] =
    children(d, start, end).collectFirst { case (`typ`, s, e) => (s, e) }

  private def parseUnsafe(d: Array[Byte]): Option[Mp4Info] = {
    if (!isMp4(d)) return None
    val top = children(d, 0L, d.length.toLong)
    val brand = top.collectFirst { case ("ftyp", s, _) => fourcc(d, s) }
      .getOrElse("")
    val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
      .getOrElse(return None)

    // mvhd: movie timescale + duration (version 1 widens to 64-bit)
    val (timescale, durationMs) = child(d, moov._1, moov._2, "mvhd") match {
      case Some((s, _)) =>
        val ver = if (s < d.length) d(s.toInt) & 0xff else 0
        val (ts, dur) =
          if (ver == 1) (u32(d, s + 20), u64(d, s + 24))
          else (u32(d, s + 12), u32(d, s + 16))
        (math.max(ts, 0L),
          if (ts > 0 && dur >= 0) dur * 1000L / ts else 0L)
      case None => (0L, 0L)
    }

    // prefer the first trak with nonzero tkhd dims (the video track);
    // fall back to the first trak (audio-only files)
    val traks = children(d, moov._1, moov._2).collect { case ("trak", s, e) => (s, e) }
    if (traks.isEmpty)
      return Some(Mp4Info(brand, "", timescale, durationMs, 0, 0, 0,
        allKeyframes = false, Array.empty, Array.empty, Array.empty))

    def tkhdDims(trak: (Long, Long)): (Int, Int) =
      child(d, trak._1, trak._2, "tkhd") match {
        case Some((s, _)) =>
          val ver = if (s < d.length) d(s.toInt) & 0xff else 0
          val base = if (ver == 1) s + 88 else s + 76
          // 16.16 fixed point
          val w = u32(d, base); val h = u32(d, base + 4)
          (if (w < 0) 0 else (w >> 16).toInt, if (h < 0) 0 else (h >> 16).toInt)
        case None => (0, 0)
      }

    val video = traks.find(t => { val (w, h) = tkhdDims(t); w > 0 && h > 0 })
      .getOrElse(traks.head)
    val (width, height) = tkhdDims(video)

    val mdia = child(d, video._1, video._2, "mdia")

    // mdhd: MEDIA timescale — stts deltas are in these ticks, not the
    // movie timescale (version 1 widens creation/mod to 64-bit, which
    // shifts the timescale field)
    val mediaTs: Long = mdia.flatMap(m => child(d, m._1, m._2, "mdhd")) match {
      case Some((s, _)) =>
        val ver = if (s < d.length) d(s.toInt) & 0xff else 0
        math.max(if (ver == 1) u32(d, s + 20) else u32(d, s + 12), 0L)
      case None => 0L
    }

    val stbl = for {
      m <- mdia
      minf <- child(d, m._1, m._2, "minf")
      st <- child(d, minf._1, minf._2, "stbl")
    } yield st

    stbl match {
      case None =>
        Some(Mp4Info(brand, "", timescale, durationMs, width, height, 0,
          allKeyframes = false, Array.empty, Array.empty, Array.empty))
      case Some((ss, se)) =>
        // stsd: first sample-entry fourcc = codec (avc1, hev1, mp4a...)
        val codec = child(d, ss, se, "stsd")
          .map { case (s, _) => fourcc(d, s + 12) }.getOrElse("")

        // stsz: per-sample sizes (or one fixed size for all)
        val (fixedSize, sizes, nSamples) = child(d, ss, se, "stsz") match {
          case Some((s, e)) =>
            val fixed = u32(d, s + 4)
            val n0 = u32(d, s + 8)
            val n = math.min(math.max(n0, 0L), MaxTableEntries.toLong).toInt
            val arr =
              if (fixed == 0L)
                Array.tabulate(n) { i =>
                  val v = u32(d, s + 12 + 4L * i)
                  if (v < 0 || s + 12 + 4L * i + 4 > e) 0 else v.toInt
                }
              else Array.empty[Int]
            (fixed, arr, math.max(n0, 0L).toInt)
          case None => (0L, Array.empty[Int], 0)
        }

        // stss: sync-sample numbers (1-based); absent = every sample
        val (allKey, keySamples) = child(d, ss, se, "stss") match {
          case Some((s, e)) =>
            // entries must lie inside the box body; a truncated or lying
            // table yields the readable prefix (u32 is -1 past the end)
            val n = math.min(math.max(u32(d, s + 4), 0L), MaxKeyframes.toLong).toInt
            (false, (0 until n).iterator
              .map(i => (s + 8 + 4L * i, u32(d, s + 8 + 4L * i)))
              .takeWhile { case (p, v) => v > 0 && p + 4 <= e }
              .map(_._2.toInt).toArray)
          case None => (true, Array.empty[Int])
        }

        // stsc: (first_chunk, samples_per_chunk) runs
        val stsc = child(d, ss, se, "stsc") match {
          case Some((s, _)) =>
            val n = math.min(math.max(u32(d, s + 4), 0L), MaxTableEntries.toLong).toInt
            (0 until n).map { i =>
              (u32(d, s + 8 + 12L * i), u32(d, s + 12 + 12L * i))
            }.filter { case (fc, spc) => fc > 0 && spc > 0 }.toArray
          case None => Array.empty[(Long, Long)]
        }

        // stts: (sample_count, sample_delta) time-to-sample runs —
        // entry count capped, a truncated or lying table yields the
        // readable prefix (u32 is -1 past the end, dropped by the
        // takeWhile)
        val sttsRuns: Array[(Long, Long)] = child(d, ss, se, "stts") match {
          case Some((s, e)) =>
            val n = math.min(math.max(u32(d, s + 4), 0L), MaxTableEntries.toLong).toInt
            (0 until n).iterator
              .map(i => (s + 8 + 8L * i, u32(d, s + 8 + 8L * i),
                u32(d, s + 12 + 8L * i)))
              .takeWhile { case (p, c, dl) => p + 8 <= e && c > 0 && dl >= 0 }
              .map { case (_, c, dl) => (c, dl) }.toArray
          case None => Array.empty
        }

        // stco / co64: chunk byte offsets
        val chunkOffsets = child(d, ss, se, "stco") match {
          case Some((s, _)) =>
            val n = math.min(math.max(u32(d, s + 4), 0L), MaxTableEntries.toLong).toInt
            Array.tabulate(n)(i => u32(d, s + 8 + 4L * i))
          case None => child(d, ss, se, "co64") match {
            case Some((s, _)) =>
              val n = math.min(math.max(u32(d, s + 4), 0L), MaxTableEntries.toLong).toInt
              Array.tabulate(n)(i => u64(d, s + 8 + 8L * i))
            case None => Array.empty[Long]
          }
        }

        // expand stsc runs over the chunk list, walking sample offsets
        // inside each chunk — the demuxer's sample->byte-range map,
        // computed only as far as the keyframe targets need
        val targets: Array[Int] =
          if (allKey) Array.tabulate(math.min(nSamples, MaxKeyframes))(_ + 1)
          else keySamples
        val targetSet = targets.toSet
        val offs = Array.newBuilder[Long]
        val szs = Array.newBuilder[Int]
        val keptSamples = Array.newBuilder[Int]
        if (targets.nonEmpty && chunkOffsets.nonEmpty && stsc.nonEmpty) {
          val maxTarget = targets.max
          var sample = 1
          var run = 0
          var chunk = 1
          var done = false
          while (!done && chunk <= chunkOffsets.length && sample <= maxTarget) {
            // advance the stsc run covering this chunk
            while (run + 1 < stsc.length && stsc(run + 1)._1 <= chunk) run += 1
            val spc = stsc(run)._2.toInt
            var within = 0
            var off = chunkOffsets(chunk - 1)
            while (within < spc && sample <= maxTarget && !done) {
              val sz =
                if (fixedSize > 0L) fixedSize.toInt
                else if (sample - 1 < sizes.length) sizes(sample - 1)
                else { done = true; 0 }
              if (!done) {
                if (targetSet.contains(sample)) {
                  keptSamples += sample; offs += off; szs += sz
                }
                off += sz
                sample += 1
                within += 1
              }
            }
            chunk += 1
          }
        }
        // decode time of sample s (1-based) = sum of the deltas of
        // samples 1..s-1, read off the runs in ONE forward walk (kept
        // samples are emitted in ascending order). A table truncated
        // short of a target extrapolates with the last run's delta —
        // graceful, never throws.
        val kept = keptSamples.result()
        val times: Array[Long] =
          if (sttsRuns.isEmpty || mediaTs <= 0L) Array.empty
          else {
            val out = new Array[Long](kept.length)
            var run = 0
            var samplesBefore = 0L
            var ticksBefore = 0L
            var ki = 0
            while (ki < kept.length) {
              val target = kept(ki).toLong
              while (run < sttsRuns.length &&
                samplesBefore + sttsRuns(run)._1 < target) {
                ticksBefore += sttsRuns(run)._1 * sttsRuns(run)._2
                samplesBefore += sttsRuns(run)._1
                run += 1
              }
              val delta =
                if (run < sttsRuns.length) sttsRuns(run)._2
                else sttsRuns.last._2
              val ticks = ticksBefore + (target - 1L - samplesBefore) * delta
              out(ki) = ticks * 1000L / mediaTs
              ki += 1
            }
            out
          }
        Some(Mp4Info(brand, codec, timescale, durationMs, width, height,
          nSamples, allKey, kept, offs.result(), szs.result(),
          mediaTs, times))
    }
  }
}
