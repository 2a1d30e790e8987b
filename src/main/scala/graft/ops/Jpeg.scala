package graft.ops

/** Pure-JDK baseline JPEG decoder (ITU-T T.81 sequential DCT, 8-bit).
  *
  * Implements the public file format from scratch — marker parse
  * (DQT/DHT/SOF0/SOF1/DRI/SOS), canonical Huffman decode with byte
  * stuffing and restart markers, DC prediction, zigzag dequantization
  * and a separable 8x8 IDCT — for the same reason Multimodal carries
  * its own PNG inflate path: the dominant web-image format should not
  * be an opaque fallback just because codec libraries are absent.
  *
  * Scope: the LUMA plane. Multimodal's image features (dimensions,
  * mean luminance, gray raster for thumbnail/perceptual hash) need Y
  * only, but the entropy stream is sequential so chroma blocks are
  * still Huffman-decoded (and then discarded without IDCT). Arbitrary
  * sampling factors (4:4:4, 4:2:2, 4:2:0, grayscale) are supported.
  *
  * Progressive (SOF2) is decoded too — T.81 annex G: DC-first /
  * DC-refine / AC-first / AC-refine scans with spectral selection,
  * successive approximation, and EOB runs, accumulated into a luma
  * coefficient plane and IDCT'd once at the end. Because each
  * progressive scan is an independently delimited entropy segment,
  * CHROMA AC scans are skipped outright (a marker search, zero
  * entropy work) — only scans containing the luma component are
  * decoded. Arithmetic coding and 12-bit precision decode header
  * dimensions only.
  *
  * Hostile input stance matches the PNG path: every length is bounds-
  * checked, the bit reader treats truncation as failure, and decode()
  * returns None rather than throwing — one bad web image must never
  * kill a task.
  */
object Jpeg {

  /** Decoded luma plane: full-image dims + the Y raster (yW x yH,
    * which equal the image dims whenever Y carries the max sampling
    * factor — i.e. every common layout).
    */
  final case class Luma(width: Int, height: Int,
                        yW: Int, yH: Int, y: Array[Int])

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // IDCT basis: cos((2x+1) u pi / 16) * (u == 0 ? 1/sqrt2 : 1) / 2
  private val Basis: Array[Double] = {
    val b = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        b(u * 8 + x) = cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    b
  }

  /** Canonical Huffman table (T.81 annex C): decode by walking code
    * lengths with per-length min/max codes.
    */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        code = (code << 1) | r.bit()
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return vals(valPtr(l) + code - minCode(l))
        l += 1
      }
      throw new IllegalArgumentException("bad huffman code")
    }
  }

  private final class BitReader(d: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= d.length) throw new IllegalArgumentException("truncated scan")
        var b = d(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val m = if (pos < d.length) d(pos) & 0xff else -1
          if (m == 0) pos += 1 // stuffed 0xFF00
          else throw new IllegalArgumentException("marker in scan") // EOI/garbage
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      cnt = 0
      // skip any fill bytes to the marker
      while (pos + 1 < d.length && (d(pos) & 0xff) != 0xff) pos += 1
      if (pos + 1 >= d.length) throw new IllegalArgumentException("truncated restart")
      val m = d(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) throw new IllegalArgumentException("expected RST")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Image dimensions from any SOFn marker (works for layouts the full
    * decode declines, e.g. progressive).
    */
  def header(d: Array[Byte]): Option[(Int, Int)] = {
    var pos = 2
    while (pos + 4 <= d.length) {
      if ((d(pos) & 0xff) != 0xff) return None
      val marker = d(pos + 1) & 0xff
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 &&
          marker != 0xc8 && marker != 0xcc) {
        if (pos + 9 > d.length) return None
        val h = ((d(pos + 5) & 0xff) << 8) | (d(pos + 6) & 0xff)
        val w = ((d(pos + 7) & 0xff) << 8) | (d(pos + 8) & 0xff)
        return Some((w, h))
      }
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) pos += 2
      else {
        val len = ((d(pos + 2) & 0xff) << 8) | (d(pos + 3) & 0xff)
        if (len < 2) return None
        pos += 2 + len
      }
    }
    None
  }

  /** Full baseline decode of the luma plane. None for non-baseline
    * layouts or malformed payloads.
    */
  def decodeLuma(d: Array[Byte]): Option[Luma] =
    try decodeUnsafe(d)
    catch { case scala.util.control.NonFatal(_) => None }

  // one frame component
  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: Huff = null
    var acTab: Huff = null
    var pred: Int = 0
  }

  private def decodeUnsafe(d: Array[Byte]): Option[Luma] = {
    if (d.length < 4 || (d(0) & 0xff) != 0xff || (d(1) & 0xff) != 0xd8)
      return None
    val qt = Array.ofDim[Int](4, 64)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Comp] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var pos = 2
    // progressive state: luma coefficients accumulate across scans
    var progressive = false
    var sawScan = false
    var lumaCoef: Array[Int] = null
    var bW = 0; var bH = 0
    var mcusX = 0; var mcusY = 0
    var maxH = 1; var maxV = 1
    def finish(): Option[Luma] =
      if (progressive && sawScan)
        finishProgressive(lumaCoef, bW, bH, qt(comps(0).tq), width, height,
          comps(0), maxH, maxV)
      else None

    while (pos + 4 <= d.length) {
      if ((d(pos) & 0xff) != 0xff) return None
      val marker = d(pos + 1) & 0xff
      if (marker == 0xd9) return finish() // EOI: done if progressive
      val len = ((d(pos + 2) & 0xff) << 8) | (d(pos + 3) & 0xff)
      if (len < 2 || pos + 2 + len > d.length) return None
      val seg = pos + 4
      val segEnd = pos + 2 + len
      var posOverride = -1 // progressive SOS sets the next marker pos
      marker match {
        case 0xdb => // DQT
          var p = seg
          while (p < segEnd) {
            val pq = (d(p) & 0xf0) >> 4
            val tq = d(p) & 0x0f
            if (tq > 3 || p + 1 + (if (pq == 0) 64 else 128) > segEnd) return None
            var i = 0; p += 1
            while (i < 64) {
              qt(tq)(i) =
                if (pq == 0) d(p) & 0xff
                else ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)
              p += (if (pq == 0) 1 else 2)
              i += 1
            }
          }
        case 0xc4 => // DHT
          var p = seg
          while (p < segEnd) {
            val tc = (d(p) & 0xf0) >> 4
            val th = d(p) & 0x0f
            if (tc > 1 || th > 3 || p + 17 > segEnd) return None
            val bits = Array.tabulate(16)(i => d(p + 1 + i) & 0xff)
            val n = bits.sum
            if (p + 17 + n > segEnd || n > 256) return None
            val vals = Array.tabulate(n)(i => d(p + 17 + i) & 0xff)
            val h = new Huff(bits, vals)
            if (tc == 0) dcT(th) = h else acT(th) = h
            p += 17 + n
          }
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 sequential, SOF2 progressive
          val precision = d(seg) & 0xff
          if (precision != 8) return None
          height = ((d(seg + 1) & 0xff) << 8) | (d(seg + 2) & 0xff)
          width = ((d(seg + 3) & 0xff) << 8) | (d(seg + 4) & 0xff)
          val nc = d(seg + 5) & 0xff
          if (width <= 0 || height <= 0 || nc < 1 || nc > 4 ||
              width.toLong * height > 64L * 1024 * 1024 ||
              seg + 6 + nc * 3 > segEnd) return None
          comps = Array.tabulate(nc) { i =>
            val b = seg + 6 + i * 3
            Comp(d(b) & 0xff, (d(b + 1) & 0xf0) >> 4, d(b + 1) & 0x0f,
              d(b + 2) & 0x0f)
          }
          if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3))
            return None
          if (marker == 0xc2) {
            progressive = true
            maxH = comps.map(_.h).max
            maxV = comps.map(_.v).max
            mcusX = (width + 8 * maxH - 1) / (8 * maxH)
            mcusY = (height + 8 * maxV - 1) / (8 * maxV)
            bW = mcusX * comps(0).h
            bH = mcusY * comps(0).v
            lumaCoef = new Array[Int](bW * bH * 64)
          }
        case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          return None // arithmetic / 12-bit / lossless: header-only path
        case 0xdd => // DRI
          restartInterval = ((d(seg) & 0xff) << 8) | (d(seg + 1) & 0xff)
        case 0xda if !progressive => // SOS: sequential entropy follows
          if (comps == null) return None
          val ns = d(seg) & 0xff
          if (ns != comps.length || seg + 1 + ns * 2 > segEnd) return None
          var i = 0
          while (i < ns) {
            val cs = d(seg + 1 + i * 2) & 0xff
            val c = comps.find(_.id == cs).getOrElse(return None)
            val tabs = d(seg + 2 + i * 2) & 0xff
            c.dcTab = dcT((tabs & 0xf0) >> 4)
            c.acTab = acT(tabs & 0x0f)
            if (c.dcTab == null || c.acTab == null) return None
            i += 1
          }
          return decodeScan(d, segEnd, comps, qt, width, height, restartInterval)
        case 0xda => // progressive SOS: one of many scans
          if (comps == null || lumaCoef == null) return None
          val ns = d(seg) & 0xff
          if (ns < 1 || ns > 4 || seg + 4 + ns * 2 > segEnd) return None
          val ss = d(seg + 1 + ns * 2) & 0xff
          val se = d(seg + 2 + ns * 2) & 0xff
          val ahal = d(seg + 3 + ns * 2) & 0xff
          val ah = (ahal & 0xf0) >> 4
          val al = ahal & 0x0f
          if (ss > 63 || se > 63 || se < ss || al > 13) return None
          val scanComps = Array.tabulate(ns) { i =>
            val cs = d(seg + 1 + i * 2) & 0xff
            val c = comps.find(_.id == cs).getOrElse(return None)
            val tabs = d(seg + 2 + i * 2) & 0xff
            c.dcTab = dcT((tabs & 0xf0) >> 4)
            c.acTab = acT(tabs & 0x0f)
            c
          }
          sawScan = true
          if (!scanComps.exists(_ eq comps(0))) {
            // chroma-only scan: an independently delimited entropy
            // segment we never need — skip straight to the next marker
            posOverride = nextMarker(d, segEnd)
          } else {
            val r = new BitReader(d, segEnd)
            decodeProgScan(r, scanComps, comps(0), lumaCoef, bW,
              mcusX, mcusY, width, height, ss, se, ah, al,
              restartInterval, maxH, maxV)
            posOverride = nextMarker(d, r.pos)
          }
        case _ => () // APPn / COM / others: skip
      }
      pos = if (posOverride >= 0) posOverride else segEnd
    }
    finish()
  }

  /** First position at/after `start` holding a real marker (0xFF
    * followed by anything but 0x00 stuffing, RSTn, or 0xFF fill) —
    * how a progressive scan's entropy segment is delimited.
    */
  private def nextMarker(d: Array[Byte], start: Int): Int = {
    var p = start
    while (p + 1 < d.length) {
      if ((d(p) & 0xff) != 0xff) p += 1
      else {
        val m = d(p + 1) & 0xff
        if (m == 0x00) p += 2 // byte stuffing
        else if (m >= 0xd0 && m <= 0xd7) p += 2 // restart marker
        else if (m == 0xff) p += 1 // fill byte
        else return p
      }
    }
    d.length
  }

  private def decodeScan(d: Array[Byte], scanStart: Int, comps: Array[Comp],
                         qt: Array[Array[Int]], width: Int, height: Int,
                         restartInterval: Int): Option[Luma] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val yComp = comps(0) // luma is the first frame component by convention
    val planeW = mcusX * yComp.h * 8
    val planeH = mcusY * yComp.v * 8
    val plane = new Array[Int](planeW * planeH)

    val r = new BitReader(d, scanStart)
    val coef = new Array[Int](64)
    val de = new Array[Double](64)
    val mid = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.restart()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // ---- one 8x8 block: DC diff + AC run-length ----
            java.util.Arrays.fill(coef, 0)
            val s = c.dcTab.decode(r)
            if (s > 11) throw new IllegalArgumentException("bad DC size")
            c.pred += extend(r.receive(s), s)
            coef(0) = c.pred
            var k = 1
            while (k < 64) {
              val rs = c.acTab.decode(r)
              val run = (rs & 0xf0) >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += run
                if (k > 63) throw new IllegalArgumentException("AC overflow")
                coef(Zigzag(k)) = extend(r.receive(size), size)
                k += 1
              }
            }
            if (ci == 0)
              // dequant + separable IDCT, luma only
              idctBlock(coef, 0, qt(c.tq), plane, planeW,
                (mx * c.h + bx) * 8, (my * c.v + by) * 8, de, mid)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // crop the luma plane to the component's true dimensions
    val yW = (width * yComp.h + maxH - 1) / maxH
    val yH = (height * yComp.v + maxV - 1) / maxV
    val out = new Array[Int](yW * yH)
    var yy = 0
    while (yy < yH) {
      System.arraycopy(plane, yy * planeW, out, yy * yW, yW)
      yy += 1
    }
    Some(Luma(width, height, yW, yH, out))
  }

  /** One progressive scan (T.81 annex G): DC scans may interleave all
    * components in MCU order; AC scans cover exactly one component in
    * block-raster order over that component's own grid. Only luma
    * coefficients are stored; chroma blocks in interleaved DC scans
    * are entropy-consumed and discarded (chroma-only scans never reach
    * here — they are skipped by marker search upstream).
    */
  private def decodeProgScan(r: BitReader, scanComps: Array[Comp],
                             luma: Comp, lumaCoef: Array[Int], bW: Int,
                             mcusX: Int, mcusY: Int, width: Int, height: Int,
                             ss: Int, se: Int, ah: Int, al: Int,
                             restartInterval: Int, maxH: Int, maxV: Int): Unit = {
    scanComps.foreach(_.pred = 0)
    var eobrun = 0

    if (ss == 0) { // DC scan (first pass or refinement)
      if (se != 0) throw new IllegalArgumentException("bad DC scan band")
      if (scanComps.length > 1) { // interleaved, MCU order
        var mcu = 0
        val total = mcusX * mcusY
        while (mcu < total) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            r.restart()
            scanComps.foreach(_.pred = 0)
          }
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                if (c eq luma)
                  dcOne(r, c, ah, al, lumaCoef,
                    ((my * c.v + by) * bW + (mx * c.h + bx)) * 64)
                else dcOne(r, c, ah, al, null, 0)
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mcu += 1
        }
      } else { // single component, its own block raster
        val c = scanComps(0)
        val (nbx, nby) = compBlocks(c, width, height, maxH, maxV)
        val isLuma = c eq luma
        var b = 0
        while (b < nbx * nby) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            r.restart()
            c.pred = 0
          }
          if (isLuma) dcOne(r, c, ah, al, lumaCoef, ((b / nbx) * bW + b % nbx) * 64)
          else dcOne(r, c, ah, al, null, 0)
          b += 1
        }
      }
    } else { // AC scan: always one component; only luma's is decoded
      if (scanComps.length != 1)
        throw new IllegalArgumentException("interleaved AC scan")
      val c = scanComps(0)
      if (c.acTab == null) throw new IllegalArgumentException("no AC table")
      val (nbx, nby) = compBlocks(c, width, height, maxH, maxV)
      var b = 0
      while (b < nbx * nby) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
          r.restart()
          eobrun = 0
        }
        val off = ((b / nbx) * bW + b % nbx) * 64
        eobrun =
          if (ah == 0) acFirst(r, c.acTab, lumaCoef, off, ss, se, al, eobrun)
          else acRefine(r, c.acTab, lumaCoef, off, ss, se, al, eobrun)
        b += 1
      }
    }
  }

  /** A component's own block grid (ceil of its scaled dims / 8). */
  private def compBlocks(c: Comp, width: Int, height: Int,
                         maxH: Int, maxV: Int): (Int, Int) = {
    val cw = (width * c.h + maxH - 1) / maxH
    val ch = (height * c.v + maxV - 1) / maxV
    (((cw + 7) / 8) max 1, ((ch + 7) / 8) max 1)
  }

  /** One block's DC in a progressive scan. First pass (Ah=0): Huffman
    * size + diff bits, prediction chain, coefficient = pred << Al.
    * Refinement: one raw bit ORed in at Al. `store == null` means a
    * chroma block — consume the bits, keep nothing.
    */
  private def dcOne(r: BitReader, c: Comp, ah: Int, al: Int,
                    store: Array[Int], off: Int): Unit =
    if (ah == 0) {
      if (c.dcTab == null) throw new IllegalArgumentException("no DC table")
      val s = c.dcTab.decode(r)
      if (s > 11) throw new IllegalArgumentException("bad DC size")
      c.pred += extend(r.receive(s), s)
      if (store != null) store(off) = c.pred << al
    } else {
      val bit = r.bit()
      if (store != null && bit == 1) store(off) |= 1 << al
    }

  /** AC first pass (Ah=0) for one block: run-length + EOBn codes over
    * the Ss..Se band, new coefficients scaled by << Al. Returns the
    * remaining EOB run.
    */
  private def acFirst(r: BitReader, ac: Huff, coef: Array[Int], off: Int,
                      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    if (eobrunIn > 0) return eobrunIn - 1 // block fully inside an EOB run
    var eobrun = 0
    var k = ss
    while (k <= se) {
      val rs = ac.decode(r)
      val run = (rs & 0xf0) >> 4
      val size = rs & 0x0f
      if (size == 0) {
        if (run == 15) k += 16 // ZRL
        else {
          eobrun = (1 << run) - 1 // EOBn: this block consumes one
          if (run > 0) eobrun += r.receive(run)
          return eobrun
        }
      } else {
        k += run
        if (k > se) throw new IllegalArgumentException("AC band overflow")
        coef(off + Zigzag(k)) = extend(r.receive(size), size) << al
        k += 1
      }
    }
    eobrun
  }

  /** AC refinement (Ah>0) for one block — T.81 G.2: already-nonzero
    * coefficients take a correction bit each; runs count only
    * zero-history positions; EOB runs refine the band's remaining
    * nonzero coefficients. Returns the remaining EOB run.
    */
  private def acRefine(r: BitReader, ac: Huff, coef: Array[Int], off: Int,
                       ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    val p1 = 1 << al
    val m1 = -1 << al
    var eobrun = eobrunIn
    var k = ss
    def correct(idx: Int): Unit =
      if (r.bit() == 1 && (coef(idx) & p1) == 0)
        coef(idx) += (if (coef(idx) >= 0) p1 else m1)

    if (eobrun == 0) {
      var eob = false
      while (k <= se && !eob) {
        val rs = ac.decode(r)
        var run = (rs & 0xf0) >> 4
        val size = rs & 0x0f
        var newval = 0
        if (size == 0) {
          if (run < 15) { // EOBn: includes this block, decremented below
            eobrun = 1 << run
            if (run > 0) eobrun += r.receive(run)
            eob = true
          } // run == 15: ZRL — skip 16 zero-history positions below
        } else {
          if (size != 1) throw new IllegalArgumentException("bad refine size")
          newval = if (r.bit() == 1) p1 else m1
        }
        if (!eob) {
          // advance: nonzero-history coefficients take correction bits,
          // zero-history ones count down the run; stop AT the target
          var advancing = true
          while (k <= se && advancing) {
            val idx = off + Zigzag(k)
            if (coef(idx) != 0) { correct(idx); k += 1 }
            else {
              run -= 1
              if (run < 0) advancing = false else k += 1
            }
          }
          if (newval != 0) {
            if (k > se) throw new IllegalArgumentException("refine overflow")
            coef(off + Zigzag(k)) = newval
          }
          k += 1
        }
      }
    }
    if (eobrun > 0) { // refine the band's remaining nonzero coefficients
      while (k <= se) {
        val idx = off + Zigzag(k)
        if (coef(idx) != 0) correct(idx)
        k += 1
      }
      eobrun -= 1
    }
    eobrun
  }

  /** Progressive finish: the accumulated luma coefficient plane,
    * dequantized and IDCT'd blockwise (same [[idctBlock]] as the
    * sequential path), cropped to the component's true dims.
    */
  private def finishProgressive(lumaCoef: Array[Int], bW: Int, bH: Int,
                                q: Array[Int], width: Int, height: Int,
                                luma: Comp, maxH: Int, maxV: Int): Option[Luma] = {
    val planeW = bW * 8
    val plane = new Array[Int](planeW * bH * 8)
    val de = new Array[Double](64)
    val mid = new Array[Double](64)
    var by = 0
    while (by < bH) {
      var bx = 0
      while (bx < bW) {
        idctBlock(lumaCoef, (by * bW + bx) * 64, q, plane, planeW,
          bx * 8, by * 8, de, mid)
        bx += 1
      }
      by += 1
    }
    val yW = (width * luma.h + maxH - 1) / maxH
    val yH = (height * luma.v + maxV - 1) / maxV
    val out = new Array[Int](yW * yH)
    var yy = 0
    while (yy < yH) {
      System.arraycopy(plane, yy * planeW, out, yy * yW, yW)
      yy += 1
    }
    Some(Luma(width, height, yW, yH, out))
  }

  /** Dequantize one natural-order 8x8 coefficient block and IDCT it
    * into `plane` at (gx0, gy0). Shared verbatim by the sequential
    * scan loop and the progressive finish pass — identical arithmetic
    * order, so both paths produce bit-identical rasters for the same
    * coefficients.
    */
  private def idctBlock(coefs: Array[Int], off: Int, q: Array[Int],
                        plane: Array[Int], planeW: Int, gx0: Int, gy0: Int,
                        de: Array[Double], mid: Array[Double]): Unit = {
    var i = 0
    while (i < 64) { de(i) = coefs(off + i).toDouble * q(zigOf(i)); i += 1 }
    // pass 1: columns (u over rows)
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += Basis(v * 8 + yy) * de(v * 8 + x); v += 1 }
        mid(yy * 8 + x) = acc
        yy += 1
      }
      x += 1
    }
    // pass 2: rows
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Basis(u * 8 + xx) * mid(yy * 8 + u); u += 1 }
        val px = math.round(acc + 128.0).toInt
        val clamped = if (px < 0) 0 else if (px > 255) 255 else px
        plane((gy0 + yy) * planeW + gx0 + xx) = clamped
        xx += 1
      }
      yy += 1
    }
  }

  // natural-order index -> zigzag position (for dequant table lookup):
  // quant tables are stored in zigzag order, coefficients were placed
  // into natural order above, so invert the mapping once
  private val zigOfTable: Array[Int] = {
    val inv = new Array[Int](64)
    var i = 0
    while (i < 64) { inv(Zigzag(i)) = i; i += 1 }
    inv
  }
  private def zigOf(natural: Int): Int = zigOfTable(natural)
}
