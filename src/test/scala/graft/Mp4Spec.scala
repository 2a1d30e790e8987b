package graft

import graft.ops.{Mp4, Multimodal}
import Multimodal.MediaRecord

/** [[Mp4]] demuxer contract: `parse(build(...))` round-trips the
  * header facts, the stsc/stco expansion yields the exact byte range
  * of every keyframe (single- and multi-chunk layouts), and hostile
  * headers (truncation, lying sizes, inflated table counts) degrade to
  * None / prefixes without throwing or allocating unbounded memory.
  */
class Mp4Spec extends SparkSpec {
  import spark.implicits._

  private val sizes = Array(10, 20, 30, 40, 50, 60)
  private val keys = Array(1, 3, 5)

  test("parse(build) round-trips dims, duration, codec, sample count") {
    val d = Mp4.build(640, 360, timescale = 1000L, durationTicks = 5000L,
      codec = "avc1", sampleSizes = sizes, keyframes = keys)
    assert(Mp4.isMp4(d))
    val info = Mp4.parse(d).get
    assert(info.majorBrand == "isom" && info.videoCodec == "avc1")
    assert(info.width == 640 && info.height == 360)
    assert(info.timescale == 1000L && info.durationMs == 5000L)
    assert(info.nSamples == 6 && !info.allKeyframes)
    assert(info.keyframeSamples.toSeq == Seq(1, 3, 5))
  }

  test("keyframe byte ranges: single chunk at the documented offset") {
    val d = Mp4.build(64, 64, 1000L, 1000L, "avc1", sizes, keys)
    val info = Mp4.parse(d).get
    // 436 = the 412 fixed header bytes + the 24-byte one-run stts
    val base = 436L + 4 * sizes.length + 4 * keys.length
    // sample k's offset = chunk base + sizes of samples before it
    assert(info.keyframeOffsets.toSeq ==
      Seq(base, base + 10 + 20, base + 10 + 20 + 30 + 40))
    assert(info.keyframeSizes.toSeq == Seq(10, 30, 50))
    // the ranges land on real payload bytes inside the file
    info.keyframeOffsets.zip(info.keyframeSizes).foreach { case (off, sz) =>
      assert(off >= 0 && off + sz <= d.length)
    }
  }

  test("multi-chunk stsc run expansion matches the single-chunk ranges' sizes") {
    // 6 samples split 4+2: chunk 2 starts fresh, so samples 5,6 sit at
    // the second stco entry; sample 5's offset = chunk2 base + 0
    val d = Mp4.build(64, 64, 1000L, 1000L, "avc1", sizes, keys,
      samplesPerChunk = 4)
    val info = Mp4.parse(d).get
    assert(info.keyframeSamples.toSeq == Seq(1, 3, 5))
    assert(info.keyframeSizes.toSeq == Seq(10, 30, 50))
    val o = info.keyframeOffsets
    // within chunk 1: s1 at base, s3 at base+10+20
    assert(o(1) - o(0) == 30L)
    // s5 opens chunk 2, which follows chunk 1's 100 payload bytes
    assert(o(2) - o(0) == 100L)
    // an even split (3+3) collapses to ONE stsc run covering both chunks
    val even = Mp4.parse(Mp4.build(64, 64, 1000L, 1000L, "avc1", sizes, keys,
      samplesPerChunk = 3)).get
    assert(even.keyframeSizes.toSeq == Seq(10, 30, 50))
    assert(even.keyframeOffsets(2) - even.keyframeOffsets(0) == 100L)
  }

  test("absent stss means every sample is a keyframe") {
    val d = Mp4.build(64, 64, 1000L, 1000L, "avc1", sizes, Array.empty[Int])
    // build writes an stss with 0 entries -> 0 keyframes, NOT allKey;
    // strip the stss box to exercise the absent-box branch
    val noStss = stripBox(d, "stss")
    val info = Mp4.parse(noStss).get
    assert(info.allKeyframes && info.nSamples == 6)
    assert(info.keyframeSamples.toSeq == Seq(1, 2, 3, 4, 5, 6))
    assert(info.keyframeSizes.toSeq == sizes.toSeq)
  }

  test("stts round-trip: uniform default is one run; explicit deltas RLE and time samples exactly") {
    // uniform default: durationTicks/n per sample, one run
    val u = Mp4.parse(Mp4.build(64, 64, 1000L, 6000L, "avc1", sizes, keys)).get
    assert(u.mediaTimescale == 1000L)
    // delta = 6000/6 = 1000 ticks = 1000 ms; keyframes 1,3,5 decode at
    // 0, 2000, 4000 ms
    assert(u.keyframeTimesMs.toSeq == Seq(0L, 2000L, 4000L))

    // explicit non-uniform deltas: 4 fast samples (100 ticks) then 2
    // slow (2800 ticks) -> two RLE runs; cumulative-sum times
    val deltas = Array(100L, 100L, 100L, 100L, 2800L, 2800L)
    val d = Mp4.build(64, 64, 1000L, 6000L, "avc1", sizes, keys,
      sampleDeltas = deltas)
    val info = Mp4.parse(d).get
    // sample s decodes at sum(deltas(0..s-2)): s1=0, s3=200, s5=400
    assert(info.keyframeTimesMs.toSeq == Seq(0L, 200L, 400L))
    // all six samples when stss is stripped: 0,100,200,300,400,3200
    val all = Mp4.parse(stripBox(d, "stss")).get
    assert(all.keyframeTimesMs.toSeq ==
      Seq(0L, 100L, 200L, 300L, 400L, 3200L))
    // a media timescale other than 1000 rescales to ms exactly
    val ts = Mp4.parse(Mp4.build(64, 64, 90000L, 540000L, "avc1", sizes,
      keys)).get // 90 kHz, 90000 ticks/sample
    assert(ts.keyframeTimesMs.toSeq == Seq(0L, 2000L, 4000L))

    // stripping stts yields NO times (and never throws) — the
    // index-even fallback contract
    val noStts = Mp4.parse(stripBox(d, "stts")).get
    assert(noStts.keyframeTimesMs.isEmpty)
    assert(noStts.keyframeSamples.toSeq == Seq(1, 3, 5)) // rest intact
  }

  test("time-even keyframe sampling spends the budget across time, not bursts") {
    // 8 samples, all keyframes; 4 cluster in the first 40 ticks, 4
    // spread over the remaining ~4 s
    val sz = Array(10, 10, 10, 10, 10, 10, 10, 10)
    val kf = Array(1, 2, 3, 4, 5, 6, 7, 8)
    val deltas = Array(10L, 10L, 10L, 10L, 1000L, 1000L, 1000L, 1000L)
    val d = Mp4.build(64, 64, 1000L, 4040L, "avc1", sz, kf,
      sampleDeltas = deltas)
    val ds = Seq(MediaRecord(1L, "video", d)).toDS()
    val got = Multimodal.sampleKeyframes(ds, k = 4).head()
    // times: 0,10,20,30,40,1040,2040,3040; span 3040, targets 0,760,
    // 1520,2280 -> samples 1,6,7,8 — index-even (1,3,5,7) would burn
    // three picks inside the 40-tick burst
    assert(got.samples.toSeq == Seq(1, 6, 7, 8))
    assert(got.times_ms.toSeq == Seq(0L, 1040L, 2040L, 3040L))
    // determinism: same input, same picks
    assert(Multimodal.sampleKeyframes(ds, k = 4).head().samples.toSeq ==
      got.samples.toSeq)
  }

  test("time-even sampling: duplicate timestamps collapse picks, never index out") {
    // zero-delta run puts samples 1-3 all at t=0 and sample 4 at
    // t=100: target 25 jumps straight to the LAST index at j=1, and
    // the remaining budget must collapse (not index past the array)
    val sz = Array(10, 10, 10, 10)
    val kf = Array(1, 2, 3, 4)
    val deltas = Array(0L, 0L, 100L, 0L)
    val d = Mp4.build(64, 64, 1000L, 100L, "avc1", sz, kf,
      sampleDeltas = deltas)
    val info = Mp4.parse(d).get
    assert(info.keyframeTimesMs.toSeq == Seq(0L, 0L, 0L, 100L))
    val ds = Seq(MediaRecord(1L, "video", d)).toDS()
    // under-budget (k < nk): j=0 -> index 0; j=1 (target 33) jumps to
    // index 3 (first at or past); j=2 has nothing left — the budget
    // collapses instead of indexing past the array
    val got = Multimodal.sampleKeyframes(ds, k = 3).head()
    assert(got.samples.toSeq == Seq(1, 4))
    assert(got.times_ms.toSeq == Seq(0L, 100L))
    // full budget (k >= nk): EVERY keyframe, duplicates or not — the
    // documented contract, exact by construction
    val full = Multimodal.sampleKeyframes(ds, k = 4).head()
    assert(full.samples.toSeq == Seq(1, 2, 3, 4))
    assert(full.times_ms.toSeq == Seq(0L, 0L, 0L, 100L))
  }

  test("hostile inputs never throw: truncation, lying size, inflated counts") {
    val d = Mp4.build(64, 64, 1000L, 1000L, "avc1", sizes, keys)
    // truncate at every byte boundary of the header region
    (0 until math.min(d.length, 600)).foreach { cut =>
      Mp4.parse(java.util.Arrays.copyOfRange(d, 0, cut)) // must not throw
    }
    // lying moov size: claim 0x7fffffff
    val lying = d.clone()
    val moovPos = indexOfBox(d, "moov")
    lying(moovPos) = 0x7f.toByte; lying(moovPos + 1) = 0xff.toByte
    lying(moovPos + 2) = 0xff.toByte; lying(moovPos + 3) = 0xff.toByte
    Mp4.parse(lying) // walk stops at the lying box, no throw
    // inflated stss count: claim 0x00ffffff entries in a 3-entry box —
    // capped + prefix-read, bounded allocation, no throw
    val inflated = d.clone()
    val stssPos = indexOfBox(d, "stss")
    inflated(stssPos + 8) = 0x00; inflated(stssPos + 9) = 0xff.toByte
    inflated(stssPos + 10) = 0xff.toByte; inflated(stssPos + 11) = 0xff.toByte
    val res = Mp4.parse(inflated)
    assert(res.forall(_.keyframeSamples.length <= 4096))
  }

  test("extractFeatures dispatches mp4 and sampleKeyframes slices real bytes") {
    val d = Mp4.build(320, 240, 1000L, 2000L, "avc1", sizes, keys)
    val ds = Seq(MediaRecord(7L, "video", d)).toDS()
    val f = Multimodal.extractFeatures(ds).head()
    assert(f.codec == "mp4/avc1" && f.width == 320 && f.height == 240)
    assert(f.n_frames == 6 && f.duration_ms == 2000L)
    val kf = Multimodal.sampleKeyframes(ds, k = 8).head()
    assert(kf.n_keyframes == 3 && kf.samples.toSeq == Seq(1, 3, 5))
    assert(kf.slice_md5.forall(_.nonEmpty)) // every slice inside payload
    // k smaller than the keyframe count picks an evenly spaced subset
    val kf1 = Multimodal.sampleKeyframes(ds, k = 1).head()
    assert(kf1.samples.length == 1)
    // a non-MP4 payload yields the empty sample
    val none = Multimodal.sampleKeyframes(
      Seq(MediaRecord(8L, "doc", "plain text".getBytes)).toDS(), k = 4).head()
    assert(none.n_keyframes == 0 && none.samples.isEmpty)
  }

  /** File offset of the first box with fourcc `typ` (size field). */
  private def indexOfBox(d: Array[Byte], typ: String): Int = {
    val t = typ.getBytes("US-ASCII")
    (0 until d.length - 8).find(p =>
      d(p + 4) == t(0) && d(p + 5) == t(1) && d(p + 6) == t(2) && d(p + 7) == t(3))
      .getOrElse(sys.error(s"no $typ box"))
  }

  /** Remove a box wholesale and shrink every enclosing ancestor's size
    * field (stco offsets are left untouched — fine for header-only
    * assertions).
    */
  private def stripBox(d: Array[Byte], typ: String): Array[Byte] = {
    val pos = indexOfBox(d, typ)
    val size = ((d(pos) & 0xff) << 24) | ((d(pos + 1) & 0xff) << 16) |
      ((d(pos + 2) & 0xff) << 8) | (d(pos + 3) & 0xff)
    val out = d.take(pos) ++ d.drop(pos + size)
    def readSize(q: Int): Int =
      ((out(q) & 0xff) << 24) | ((out(q + 1) & 0xff) << 16) |
        ((out(q + 2) & 0xff) << 8) | (out(q + 3) & 0xff)
    // shrink each ancestor (its stored size still counts the stripped
    // box) and recurse into it; siblings keep their sizes
    @annotation.tailrec
    def fix(q0: Int, end: Int): Unit = {
      var q = q0
      var ancestor = -1
      while (ancestor < 0 && q + 8 <= end) {
        val s = readSize(q)
        // a true ancestor's header sits strictly before the stripped
        // bytes; the next sibling starts exactly AT pos and must not
        // be shrunk
        if (q + 8 <= pos && pos < q + s) ancestor = q else q += s
      }
      if (ancestor >= 0) {
        val v = readSize(ancestor) - size
        out(ancestor) = ((v >> 24) & 0xff).toByte
        out(ancestor + 1) = ((v >> 16) & 0xff).toByte
        out(ancestor + 2) = ((v >> 8) & 0xff).toByte
        out(ancestor + 3) = (v & 0xff).toByte
        fix(ancestor + 8, ancestor + v)
      }
    }
    fix(0, out.length)
    out
  }
}
