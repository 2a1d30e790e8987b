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
  * sampling factors (4:4:4, 4:2:2, 4:2:0, grayscale) are supported;
  * progressive (SOF2), arithmetic coding, and 12-bit precision decode
  * header dimensions only.
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

    while (pos + 4 <= d.length) {
      if ((d(pos) & 0xff) != 0xff) return None
      val marker = d(pos + 1) & 0xff
      if (marker == 0xd9) return None // EOI before SOS
      val len = ((d(pos + 2) & 0xff) << 8) | (d(pos + 3) & 0xff)
      if (len < 2 || pos + 2 + len > d.length) return None
      val seg = pos + 4
      val segEnd = pos + 2 + len
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
        case 0xc0 | 0xc1 => // SOF0/1: baseline + extended sequential
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
        case m if m >= 0xc2 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          return None // progressive / arithmetic / 12-bit: header-only path
        case 0xdd => // DRI
          restartInterval = ((d(seg) & 0xff) << 8) | (d(seg + 1) & 0xff)
        case 0xda => // SOS: entropy data follows
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
        case _ => () // APPn / COM / others: skip
      }
      pos = segEnd
    }
    None
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
            if (ci == 0) {
              // dequant + separable IDCT, luma only
              val q = qt(c.tq)
              var i = 0
              while (i < 64) { de(i) = coef(i).toDouble * q(zigOf(i)); i += 1 }
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
                  val gx = (mx * c.h + bx) * 8 + xx
                  val gy = (my * c.v + by) * 8 + yy
                  plane(gy * planeW + gx) = clamped
                  xx += 1
                }
                yy += 1
              }
            }
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
