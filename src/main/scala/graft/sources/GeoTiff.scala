package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.model.GridMeta

/** SURVEY §2.1 S4 — GeoTIFF ingest, pure JVM (no GDAL/rasterio).
  *
  * Scoped to the subset the reference's pipeline actually emits and reads
  * back (regenerate_viirs_pngs.py:13-15 `src.read(1)`, `src.transform`;
  * fix_transparency.py:55-60 nodata handling): single-band float32,
  * striped OR tiled, north-up affine from the ModelTiepoint +
  * ModelPixelScale GeoTIFF tags, CRS from the GeoKeyDirectory, nodata
  * from GDAL_NODATA. Pixel chunks may be uncompressed (1), LZW (5, TIFF6
  * MSB-first with early change), Deflate (8/32946) — the codecs
  * rasterio/GDAL actually emit when re-writing the reference's exports —
  * or PackBits (32773, legacy scanner/Mac exports).
  * The tiled layout (TileWidth/TileLength/TileOffsets/TileByteCounts,
  * edge tiles padded to full size) is what GDAL writes by default for
  * anything beyond small rasters (`-co TILED=YES`, rasterio
  * `tiled=True`), so real exported artifacts routinely arrive tiled.
  * Anything outside that subset (predictors, other sample formats) fails
  * loudly rather than decoding wrong.
  *
  * Spark integration is the `binaryFile` source → per-file parse →
  * pixel-row iterator: each file decodes inside its own task (binaryFile
  * packs small rasters several-per-partition), no shuffle, no driver-side
  * loop. At 100 TB the unit of parallelism is the raster file — the
  * reference's exports are one small GeoTIFF per (month, band), which is
  * exactly this shape. A writer for the same subset closes the loop so
  * exported artifacts can be read back (and pins the fixture bytes).
  */
object GeoTiff {

  final case class Raster(meta: GridMeta, values: Array[Float])

  /** Multi-band raster: `values` is pixel-interleaved (chunky,
    * PlanarConfiguration=1) — sample s of pixel (x,y) lives at
    * `(y*width + x)*nBands + s`, exactly the order the file stores. */
  final case class MultiRaster(meta: GridMeta, nBands: Int,
                               values: Array[Float])

  // 16 = LONG8, the BigTIFF 64-bit unsigned integer type
  private val TypeSizes =
    Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 11 -> 4, 12 -> 8, 16 -> 8)

  /** One IFD entry. `big` switches the BigTIFF conventions: the value
    * field is 8 bytes (values of ≤ 8 bytes live inline — the spec's
    * if-and-only-if rule), and external offsets are 64-bit. In-memory
    * payloads are capped at Array[Byte] size, so resolved offsets fit an
    * Int; a >2 GiB offset in a crafted small file fails loudly below. */
  private final case class Entry(tag: Int, typ: Int, count: Int, at: Int,
                                 buf: ByteBuffer, big: Boolean = false) {
    private def dataAt: Int = {
      val size = TypeSizes.getOrElse(typ,
        throw new IllegalArgumentException(s"TIFF tag $tag: unsupported type $typ"))
      if (size * count <= (if (big) 8 else 4)) at
      else if (big) {
        val off = buf.getLong(at)
        require(off >= 0 && off <= Int.MaxValue,
          s"TIFF tag $tag: offset $off outside the loaded payload")
        off.toInt
      } else buf.getInt(at)
    }
    def ints: IndexedSeq[Long] = {
      val off = dataAt
      typ match {
        case 3 => (0 until count).map(i => (buf.getShort(off + 2 * i) & 0xFFFF).toLong)
        case 4 => (0 until count).map(i => buf.getInt(off + 4 * i) & 0xFFFFFFFFL)
        case 16 => (0 until count).map(i => buf.getLong(off + 8 * i))
        case t => throw new IllegalArgumentException(s"TIFF tag $tag: expected int type, got $t")
      }
    }
    def doubles: IndexedSeq[Double] = {
      val off = dataAt
      require(typ == 12, s"TIFF tag $tag: expected DOUBLE, got type $typ")
      (0 until count).map(i => buf.getDouble(off + 8 * i))
    }
    def ascii: String = {
      val off = dataAt
      val bs = new Array[Byte](count)
      var i = 0; while (i < count) { bs(i) = buf.get(off + i); i += 1 }
      new String(bs, "US-ASCII").takeWhile(_ != '\u0000').trim
    }
  }

  /** Pixel-chunk layout: offsets/byte-counts of strips or tiles, the
    * tile geometry when tiled (None = striped, chunks are consecutive
    * row bands), the predictor applied inside each chunk, and the
    * samples-per-pixel (bands, chunky-interleaved). */
  private final case class Layout(chunks: IndexedSeq[(Long, Long)],
                                  tile: Option[(Int, Int)],
                                  predictor: Int,
                                  spp: Int,
                                  sampleBits: Int = 32,
                                  sampleFmt: Int = 3) {
    def bytesPer: Int = sampleBits / 8
  }

  /** Parse metadata only — never touches pixel data (S11 metadata
    * inspection stays cheap on big rasters). Returns the grid plus the
    * chunk layout needed to read pixels. */
  private def parseMeta(dataset: String, bytes: Array[Byte])
      : (GridMeta, Layout, ByteBuffer, Int) = {
    require(bytes.length >= 8, "not a TIFF: truncated header")
    val order = (bytes(0).toChar, bytes(1).toChar) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("not a TIFF: bad byte-order mark")
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    val magic = buf.getShort(2)
    // 42 = classic TIFF; 43 = BigTIFF (8-byte offsets/counts, 20-byte
    // IFD entries) — the format any >4 GiB GDAL export arrives in
    val big = magic == 43
    require(magic == 42 || big, "not a TIFF: bad magic")
    val (entriesStart, n, stride, countAt, valueAt) =
      if (big) {
        require(buf.getShort(4) == 8 && buf.getShort(6) == 0,
          s"BigTIFF $dataset: bad offset-size header")
        val ifd8 = buf.getLong(8)
        require(ifd8 >= 16 && ifd8 <= Int.MaxValue,
          s"BigTIFF $dataset: IFD offset $ifd8 outside the loaded payload")
        val nEnt = buf.getLong(ifd8.toInt)
        require(nEnt >= 1 && nEnt <= 65535,
          s"BigTIFF $dataset: implausible IFD entry count $nEnt")
        (ifd8.toInt + 8, nEnt.toInt, 20, 4, 12)
      } else {
        val ifd = buf.getInt(4)
        (ifd + 2, buf.getShort(ifd) & 0xFFFF, 12, 4, 8)
      }
    val entries: Map[Int, Entry] = (0 until n).map { i =>
      val at = entriesStart + i * stride
      val cnt =
        if (big) {
          val c = buf.getLong(at + countAt)
          require(c >= 0 && c <= Int.MaxValue,
            s"BigTIFF $dataset: tag count $c outside the loaded payload")
          c.toInt
        } else buf.getInt(at + countAt)
      val e = Entry(buf.getShort(at) & 0xFFFF, buf.getShort(at + 2) & 0xFFFF,
                    cnt, at + valueAt, buf, big)
      e.tag -> e
    }.toMap
    def req(tag: Int, what: String): Entry =
      entries.getOrElse(tag, throw new IllegalArgumentException(
        s"GeoTIFF $dataset: missing required tag $tag ($what)"))
    def intOr(tag: Int, dflt: Long): Long =
      entries.get(tag).map(_.ints.head).getOrElse(dflt)

    val width = req(256, "ImageWidth").ints.head.toInt
    val height = req(257, "ImageLength").ints.head.toInt
    val bits = entries.get(258).map(_.ints).getOrElse(IndexedSeq(1L))
    val compression = intOr(259, 1).toInt
    val spp = intOr(277, 1).toInt
    val fmt = entries.get(339).map(_.ints).getOrElse(IndexedSeq(1L))
    val planar = intOr(284, 1).toInt
    val predictor = intOr(317, 1).toInt
    require(Set(1, 5, 8, 32946, 32773)(compression),
      s"GeoTIFF $dataset: unsupported Compression=$compression (1/5/8/32946/32773)")
    // sample formats: float32 (SampleFormat=3, BitsPerSample=32 — the
    // reference's export format) plus the integer rasters GDAL emits for
    // byte/int16 products (quality flags, scaled indices): uint8/uint16
    // (SampleFormat=1, the TIFF default) and int16 (SampleFormat=2).
    // Bands must agree on one format (GDAL always writes them uniform).
    require(bits.nonEmpty && bits.forall(_ == bits.head),
      s"GeoTIFF $dataset: mixed per-band BitsPerSample=$bits unsupported")
    require(fmt.forall(_ == fmt.head),
      s"GeoTIFF $dataset: mixed per-band SampleFormat=$fmt unsupported")
    val sampleBits = bits.head.toInt
    val sampleFmt = fmt.head.toInt
    require((sampleBits == 32 && sampleFmt == 3) ||
            (Set(8, 16)(sampleBits) && Set(1, 2)(sampleFmt)),
      s"GeoTIFF $dataset: unsupported sample type (BitsPerSample=$sampleBits, SampleFormat=$sampleFmt)")
    // 1 = none; 3 = TIFF TechNote 3 floating-point predictor (float32
    // only); 2 = horizontal integer differencing (integer samples only)
    require(predictor == 1 ||
            (predictor == 3 && sampleBits == 32) ||
            (predictor == 2 && sampleBits < 32),
      s"GeoTIFF $dataset: Predictor=$predictor invalid for $sampleBits-bit samples")
    require(spp >= 1, s"GeoTIFF $dataset: bad SamplesPerPixel=$spp")
    // chunky (pixel-interleaved) only — the TIFF default and what GDAL
    // writes unless INTERLEAVE=BAND is forced; planar files fail loudly
    require(spp == 1 || planar == 1,
      s"GeoTIFF $dataset: only chunky interleave supported (PlanarConfiguration=$planar)")

    val layout =
      if (entries.contains(324) || entries.contains(322)) {
        val tw = req(322, "TileWidth").ints.head.toInt
        val th = req(323, "TileLength").ints.head.toInt
        require(tw > 0 && th > 0 && tw % 16 == 0 && th % 16 == 0,
          s"GeoTIFF $dataset: bad tile size ${tw}x$th (must be positive multiples of 16)")
        val offs = req(324, "TileOffsets").ints
        val counts = req(325, "TileByteCounts").ints
        require(offs.length == counts.length,
          s"GeoTIFF $dataset: tile offset/count mismatch")
        val expect = ((width + tw - 1) / tw) * ((height + th - 1) / th)
        require(offs.length == expect,
          s"GeoTIFF $dataset: ${offs.length} tiles for a $expect-tile grid")
        Layout(offs.zip(counts), Some((tw, th)), predictor, spp,
          sampleBits, sampleFmt)
      } else {
        val stripOffsets = req(273, "StripOffsets").ints
        val stripCounts = req(279, "StripByteCounts").ints
        require(stripOffsets.length == stripCounts.length,
          s"GeoTIFF $dataset: strip offset/count mismatch")
        Layout(stripOffsets.zip(stripCounts), None, predictor, spp,
          sampleBits, sampleFmt)
      }

    val scale = req(33550, "ModelPixelScale").doubles
    val tie = req(33922, "ModelTiepoint").doubles
    require(tie.length >= 6, s"GeoTIFF $dataset: short ModelTiepoint")
    // raster (i,j) ↦ model (X,Y): north-up affine
    val (sx, sy) = (scale(0), scale(1))
    val (i0, j0, x0, y0) = (tie(0), tie(1), tie(3), tie(4))
    val c = x0 - i0 * sx
    val f = y0 + j0 * sy
    val crs = entries.get(34735).map { gk =>
      val ks = gk.ints
      // GeoKeyDirectory: header of 4 shorts then (key, loc, count, value)*
      val keys = (4 until ks.length by 4)
        .map(i => ks(i).toInt -> ks(i + 3).toInt).toMap
      keys.get(3072).orElse(keys.get(2048)).map(code => s"EPSG:$code")
        .getOrElse("EPSG:4326")
    }.getOrElse("EPSG:4326")
    val nodata = entries.get(42113).map(_.ascii.toDouble)
    val scaleM =
      if (crs == "EPSG:4326") math.max(1, math.round(sx * 111320.0)).toInt
      else math.max(1, math.round(sx)).toInt
    val meta = GridMeta(dataset, sx, 0.0, c, 0.0, -sy, f, crs,
      width, height, nodata, scaleM)
    (meta, layout, buf, compression)
  }

  /** Decompress one pixel chunk (strip or tile) to a float-readable view. */
  private def decodeChunk(dataset: String, buf: ByteBuffer, compression: Int,
                          off: Long, count: Long): ByteBuffer =
    compression match {
      case 1 =>
        val fb = buf.duplicate().order(buf.order())
        fb.position(off.toInt).limit((off + count).toInt)
        fb
      case 5 =>
        val src = new Array[Byte](count.toInt)
        buf.duplicate().position(off.toInt).get(src)
        ByteBuffer.wrap(Lzw.decode(src)).order(buf.order())
      case 32773 =>
        val src = new Array[Byte](count.toInt)
        buf.duplicate().position(off.toInt).get(src)
        ByteBuffer.wrap(PackBits.decode(src)).order(buf.order())
      case 8 | 32946 =>
        val src = new Array[Byte](count.toInt)
        buf.duplicate().position(off.toInt).get(src)
        val inf = new java.util.zip.Inflater()
        inf.setInput(src)
        val out = new java.io.ByteArrayOutputStream(src.length * 4)
        val chunk = new Array[Byte](8192)
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(chunk)
          if (n > 0) out.write(chunk, 0, n)
          else if (!inf.finished()) throw new IllegalArgumentException(
            s"GeoTIFF $dataset: truncated deflate chunk")
        }
        inf.end()
        ByteBuffer.wrap(out.toByteArray).order(buf.order())
    }

  /** Undo the TIFF TechNote 3 floating-point predictor over one chunk:
    * per `rowBytes`-wide row, cumulative-sum the horizontal byte deltas,
    * then reassemble each float from its four byte planes (most
    * significant first — the predictor's layout is defined big-endian
    * independent of the file's byte order). Returns a BIG_ENDIAN buffer
    * of plain float32 rows. */
  private def undoFpPredictor(raw: ByteBuffer, rowBytes: Int): ByteBuffer = {
    val data = new Array[Byte](raw.remaining())
    raw.duplicate().get(data)
    require(data.length % rowBytes == 0,
      s"fp-predictor chunk of ${data.length} bytes is not whole $rowBytes-byte rows")
    val w = rowBytes / 4
    val out = new Array[Byte](data.length)
    var r = 0
    while (r < data.length / rowBytes) {
      val base = r * rowBytes
      var i = 1
      while (i < rowBytes) { // undo horizontal differencing
        data(base + i) = (data(base + i) + data(base + i - 1)).toByte
        i += 1
      }
      var j = 0
      while (j < w) { // de-interleave the four byte planes
        out(base + 4 * j) = data(base + j)
        out(base + 4 * j + 1) = data(base + w + j)
        out(base + 4 * j + 2) = data(base + 2 * w + j)
        out(base + 4 * j + 3) = data(base + 3 * w + j)
        j += 1
      }
      r += 1
    }
    ByteBuffer.wrap(out).order(ByteOrder.BIG_ENDIAN)
  }

  /** Undo TIFF Predictor=2 (horizontal integer differencing) over one
    * chunk: per `rowBytes`-wide row, each sample accumulates the previous
    * SAME-BAND sample (stride = spp), in the sample's own width with
    * wrapping two's-complement arithmetic — correct for signed and
    * unsigned alike. Returns a buffer in the chunk's own byte order. */
  private def undoIntPredictor(raw: ByteBuffer, rowBytes: Int, spp: Int,
                               bytesPer: Int): ByteBuffer = {
    val data = new Array[Byte](raw.remaining())
    raw.duplicate().get(data)
    val bb = ByteBuffer.wrap(data).order(raw.order())
    val samplesPerRow = rowBytes / bytesPer
    var rowStart = 0
    while (rowStart + rowBytes <= data.length) {
      var s = spp
      while (s < samplesPerRow) {
        val pos = rowStart + s * bytesPer
        val prev = rowStart + (s - spp) * bytesPer
        if (bytesPer == 1)
          data(pos) = (data(pos) + data(prev)).toByte
        else
          bb.putShort(pos, (bb.getShort(pos) + bb.getShort(prev)).toShort)
        s += 1
      }
      rowStart += rowBytes
    }
    bb
  }

  /** Apply Predictor=2 in place (inverse of [[undoIntPredictor]]): right
    * to left, each sample becomes the delta from the previous same-band
    * sample. */
  private def applyIntPredictor(data: Array[Byte], rowBytes: Int, spp: Int,
                                bytesPer: Int, order: ByteOrder): Unit = {
    val bb = ByteBuffer.wrap(data).order(order)
    val samplesPerRow = rowBytes / bytesPer
    var rowStart = 0
    while (rowStart + rowBytes <= data.length) {
      var s = samplesPerRow - 1
      while (s >= spp) {
        val pos = rowStart + s * bytesPer
        val prev = rowStart + (s - spp) * bytesPer
        if (bytesPer == 1)
          data(pos) = (data(pos) - data(prev)).toByte
        else
          bb.putShort(pos, (bb.getShort(pos) - bb.getShort(prev)).toShort)
        s -= 1
      }
      rowStart += rowBytes
    }
  }

  /** Apply the floating-point predictor (inverse of [[undoFpPredictor]]):
    * split each row's floats into big-endian byte planes, then difference
    * horizontally. */
  private def applyFpPredictor(rows: Int, w: Int,
                               get: Int => Float): Array[Byte] = {
    val rowBytes = w * 4
    val out = new Array[Byte](rows * rowBytes)
    var r = 0
    while (r < rows) {
      val base = r * rowBytes
      var j = 0
      while (j < w) {
        val bits = java.lang.Float.floatToIntBits(get(r * w + j))
        out(base + j) = (bits >>> 24).toByte
        out(base + w + j) = (bits >>> 16).toByte
        out(base + 2 * w + j) = (bits >>> 8).toByte
        out(base + 3 * w + j) = bits.toByte
        j += 1
      }
      var i = rowBytes - 1
      while (i >= 1) {
        out(base + i) = (out(base + i) - out(base + i - 1)).toByte
        i -= 1
      }
      r += 1
    }
    out
  }

  /** Parse a whole single-band raster: metadata + row-major float32
    * pixels. Multi-band files fail loudly here — use [[parseBands]]. */
  def parse(dataset: String, bytes: Array[Byte]): Raster = {
    val mr = parseBands(dataset, bytes)
    require(mr.nBands == 1,
      s"GeoTIFF $dataset: ${mr.nBands} bands — use parseBands/readBands for multi-band rasters")
    Raster(mr.meta, mr.values)
  }

  /** Parse a whole raster of any band count: metadata + pixel-interleaved
    * float32 samples (chunky layout, the file's own order). */
  def parseBands(dataset: String, bytes: Array[Byte]): MultiRaster = {
    val (meta, layout, buf, compression) = parseMeta(dataset, bytes)
    val spp = layout.spp
    val bp = layout.bytesPer
    val signed = layout.sampleFmt == 2
    val values = new Array[Float](meta.width * meta.height * spp)
    // sequential + positional sample reads, closed over the sample type —
    // integer samples surface as exact floats (|v| ≤ 65535 < 2^24)
    def nextSample(bb: ByteBuffer): Float = layout.sampleBits match {
      case 32 => bb.getFloat
      case 16 => if (signed) bb.getShort.toFloat
                 else (bb.getShort & 0xFFFF).toFloat
      case _ => if (signed) bb.get.toFloat else (bb.get & 0xFF).toFloat
    }
    def sampleAt(bb: ByteBuffer, k: Int): Float = {
      val pos = k * bp + bb.position()
      layout.sampleBits match {
        case 32 => bb.getFloat(pos)
        case 16 => if (signed) bb.getShort(pos).toFloat
                   else (bb.getShort(pos) & 0xFFFF).toFloat
        case _ => if (signed) bb.get(pos).toFloat else (bb.get(pos) & 0xFF).toFloat
      }
    }
    def chunk(off: Long, count: Long, rowBytes: Int): ByteBuffer = {
      val raw = decodeChunk(dataset, buf, compression, off, count)
      layout.predictor match {
        case 3 => undoFpPredictor(raw, rowBytes)
        case 2 => undoIntPredictor(raw, rowBytes, spp, bp)
        case _ => raw
      }
    }
    layout match {
      case Layout(strips, None, _, _, _, _) =>
        var k = 0
        strips.foreach { case (off, count) =>
          val raw = chunk(off, count, meta.width * spp * bp)
          while (raw.remaining() >= bp && k < values.length) {
            values(k) = nextSample(raw); k += 1
          }
        }
        require(k == values.length,
          s"GeoTIFF $dataset: strip data holds $k samples, header promises ${values.length}")
      case Layout(tiles, Some((tw, th)), _, _, _, _) =>
        // tiles are row-major over a ceil(w/tw) x ceil(h/th) grid; edge
        // tiles are PADDED to full tw x th (TIFF6) — clip the scatter-copy
        val tilesAcross = (meta.width + tw - 1) / tw
        tiles.zipWithIndex.foreach { case ((off, count), idx) =>
          val raw = chunk(off, count, tw * spp * bp)
          require(raw.remaining() >= tw * th * spp * bp,
            s"GeoTIFF $dataset: tile $idx holds ${raw.remaining() / bp} samples, expected ${tw * th * spp}")
          val x0 = (idx % tilesAcross) * tw
          val y0 = (idx / tilesAcross) * th
          var ty = 0
          while (ty < th) {
            val y = y0 + ty
            var tx = 0
            while (tx < tw) {
              val x = x0 + tx
              if (x < meta.width && y < meta.height) {
                var s = 0
                while (s < spp) {
                  values((y * meta.width + x) * spp + s) =
                    sampleAt(raw, (ty * tw + tx) * spp + s)
                  s += 1
                }
              }
              tx += 1
            }
            ty += 1
          }
        }
    }
    MultiRaster(meta, spp, values)
  }

  /** Grid metadata of the raster(s) at `pathGlob` — S11 inspection; strip
    * data is never read. */
  def grids(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    Blobs.requireReadable(spark, pathGlob, "GeoTiff.grids")
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        parseMeta(path.substring(path.lastIndexOf('/') + 1), bytes)._1
      }
      .toDF("dataset", "a", "b", "c", "d", "e", "f", "crs",
            "width", "height", "nodata", "scale_m")
  }

  /** Shared pixel-scan core: per-file parse → per-pixel rows, with a
    * per-file coordinate projection chosen from the grid metadata. The
    * affine model coordinates use the same center-offset expression as
    * Unpivot.gridToPixels, evaluated in the same operand order, so
    * coordinates are bit-identical across the ingest paths. */
  private def scanPixels(spark: SparkSession, pathGlob: String,
                         projectionOf: GridMeta => (Double, Double) => (Double, Double))
      : DataFrame = {
    import spark.implicits._
    Blobs.requireReadable(spark, pathGlob, "GeoTiff.read")
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val r = parse(path.substring(path.lastIndexOf('/') + 1), bytes)
        val m = r.meta
        val project = projectionOf(m)
        val ndF = m.nodata.map(_.toFloat)
        Iterator.range(0, m.height).flatMap { y =>
          Iterator.range(0, m.width).map { x =>
            val v = r.values(y * m.width + x)
            val value: Option[Double] =
              if (v.isNaN || ndF.exists(_ == v)) None else Some(v.toDouble)
            val mx = m.c + (x + 0.5) * m.a + (y + 0.5) * m.b
            val my = m.f + (x + 0.5) * m.d + (y + 0.5) * m.e
            val (lon, lat) = project(mx, my)
            (m.dataset, y, x, lon, lat, value)
          }
        }
      }
      .toDF("dataset", "y", "x", "lon", "lat", "value")
  }

  /** S4 — scan raster file(s) into the long pixel-coordinate table
    * (dataset, y, x, lon, lat, value); nodata/NaN → null value. Emits RAW
    * model coordinates in the lon/lat columns — correct only for
    * EPSG:4326 exports; use [[readLonLat]] for projected CRSs. */
  def read(spark: SparkSession, pathGlob: String): DataFrame =
    scanPixels(spark, pathGlob, _ => (mx, my) => (mx, my))

  /** S4 + F7 — scan raster file(s) with CRS-aware reprojection: the affine
    * model coordinates are routed through the EPSG registry
    * (graft.ops.Crs — geographic pass-through, Web-Mercator closed form,
    * all WGS84 UTM zones incl. southern via the Krüger inverse), so
    * `lon`/`lat` are true EPSG:4326 degrees whatever CRS the export used —
    * the general form of the reference's `rasterio.warp.transform(src.crs,
    * 'EPSG:4326')`. Files in an unregistered CRS fail loudly rather than
    * mislabeling projected meters as degrees. Reprojection is scalar math
    * inside the same per-file task as the decode — no extra stage, no
    * shuffle. */
  def readLonLat(spark: SparkSession, pathGlob: String): DataFrame =
    scanPixels(spark, pathGlob, m => {
      val proj = graft.ops.Crs.fromCrsString(m.crs).getOrElse(
        throw new IllegalArgumentException(
          s"GeoTIFF ${m.dataset}: no reprojection registered for ${m.crs}"))
      (mx, my) => graft.ops.Crs.toLonLat(proj, mx, my)
    })

  /** S4 multi-band — scan raster file(s) of any band count into the long
    * pixel table (dataset, band, y, x, lon, lat, value), one row per
    * sample; band is 0-based in file order. Same per-file-task shape as
    * [[read]]; nodata applies per sample (GDAL_NODATA is per-file). */
  def readBands(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    Blobs.requireReadable(spark, pathGlob, "GeoTiff.readBands")
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val r = parseBands(path.substring(path.lastIndexOf('/') + 1), bytes)
        val m = r.meta
        val ndF = m.nodata.map(_.toFloat)
        Iterator.range(0, m.height).flatMap { y =>
          Iterator.range(0, m.width).flatMap { x =>
            val mx = m.c + (x + 0.5) * m.a + (y + 0.5) * m.b
            val my = m.f + (x + 0.5) * m.d + (y + 0.5) * m.e
            Iterator.range(0, r.nBands).map { s =>
              val v = r.values((y * m.width + x) * r.nBands + s)
              val value: Option[Double] =
                if (v.isNaN || ndF.exists(_ == v)) None else Some(v.toDouble)
              (m.dataset, s, y, x, mx, my, value)
            }
          }
        }
      }
      .toDF("dataset", "band", "y", "x", "lon", "lat", "value")
  }

  // ------------------------------------------------------------------ write

  /** Encode a GeoTIFF for `meta` — float32 (default) or single-band
    * uint8/uint16/int16 via `sampleBits`/`sampleFormat` (north-up affine only:
    * b = d = 0, a > 0, e < 0). The exact inverse of [[parse]]/
    * [[parseBands]]; deterministic bytes so fixtures pin byte-for-byte.
    * `compression`: 1 = none, 5 = LZW, 8 = Deflate, 32773 = PackBits.
    * `tileSize` = 0 writes
    * the striped layout (`rowsPerStrip` row bands); a positive multiple
    * of 16 writes the tiled layout GDAL emits for larger rasters (square
    * tiles, edge tiles zero-padded to full size per TIFF6). `bands` > 1
    * writes chunky pixel-interleaved samples (`values` in
    * [[MultiRaster]] order) with explicit PlanarConfiguration and
    * ExtraSamples tags; the single-band byte stream is unchanged.
    * `bigTiff` writes the BigTIFF container (version 43, 8-byte
    * offsets/counts, 20-byte IFD entries, LONG8 chunk offset arrays —
    * what GDAL emits past 4 GiB); single-band only, and values of ≤ 8
    * bytes go inline per the BigTIFF if-and-only-if rule. */
  def write(meta: GridMeta, values: Array[Float], rowsPerStrip: Int = 64,
            bigEndian: Boolean = false, compression: Int = 1,
            tileSize: Int = 0, predictor: Int = 1,
            bands: Int = 1, sampleBits: Int = 32,
            sampleFormat: Int = 3, bigTiff: Boolean = false): Array[Byte] = {
    require(!bigTiff || bands == 1,
      "GeoTIFF writer: BigTIFF output is single-band only")
    require(meta.b == 0.0 && meta.d == 0.0 && meta.a > 0 && meta.e < 0,
      "GeoTIFF writer: only north-up affine grids")
    require(bands >= 1 && bands <= 4,
      s"GeoTIFF writer: bands must be 1..4, got $bands")
    require(values.length == meta.width * meta.height * bands,
      s"GeoTIFF writer: ${values.length} values for ${meta.width}x${meta.height}x$bands")
    require(Set(1, 5, 8, 32773)(compression),
      s"GeoTIFF writer: unsupported compression $compression (1/5/8/32773)")
    require(tileSize == 0 || (tileSize > 0 && tileSize % 16 == 0),
      s"GeoTIFF writer: tileSize must be 0 (striped) or a positive multiple of 16, got $tileSize")
    require((sampleBits == 32 && sampleFormat == 3) ||
            (Set(8, 16)(sampleBits) && Set(1, 2)(sampleFormat)),
      s"GeoTIFF writer: unsupported sample type ($sampleBits-bit, SampleFormat=$sampleFormat)")
    require(sampleBits == 32 || bands == 1,
      "GeoTIFF writer: integer samples are single-band only")
    require(predictor == 1 ||
            (predictor == 3 && sampleBits == 32) ||
            (predictor == 2 && sampleBits < 32),
      s"GeoTIFF writer: Predictor=$predictor invalid for $sampleBits-bit samples")
    val bytesPer = sampleBits / 8
    val signed = sampleFormat == 2
    // integer samples must BE integers in range — refuse silent truncation
    def checkInt(v: Float): Int = {
      val i = v.toInt
      val (lo, hi) = (sampleBits, signed) match {
        case (8, false) => (0, 255)
        case (8, true) => (-128, 127)
        case (16, false) => (0, 65535)
        case _ => (-32768, 32767)
      }
      require(i.toFloat == v && i >= lo && i <= hi,
        s"GeoTIFF writer: $v not a valid $sampleBits-bit ${if (signed) "signed" else "unsigned"} sample")
      i
    }
    def putSample(bb: ByteBuffer, v: Float): Unit = sampleBits match {
      case 32 => bb.putFloat(v)
      case 16 => bb.putShort(checkInt(v).toShort)
      case _ => bb.put(checkInt(v).toByte)
    }
    val epsg = meta.crs.stripPrefix("EPSG:").toInt
    val geographic = epsg == 4326
    val tiled = tileSize > 0
    def pack(arr: Array[Byte]): Array[Byte] = compression match {
      case 1 => arr
      case 5 => Lzw.encode(arr)
      case 32773 => PackBits.encode(arr)
      case 8 =>
        // fixed level so fixture bytes stay deterministic across JDKs
        val d = new java.util.zip.Deflater(6)
        d.setInput(arr); d.finish()
        val out = new java.io.ByteArrayOutputStream(arr.length / 2 + 16)
        val chunk = new Array[Byte](8192)
        while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
        d.end()
        out.toByteArray
    }
    def newBuf(n: Int): ByteBuffer = ByteBuffer.allocate(n)
      .order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val tilesAcross = if (tiled) (meta.width + tileSize - 1) / tileSize else 0
    val tilesDown = if (tiled) (meta.height + tileSize - 1) / tileSize else 0
    val nStrips =
      if (tiled) tilesAcross * tilesDown
      else (meta.height + rowsPerStrip - 1) / rowsPerStrip
    val rowSamples = meta.width * bands       // samples per raster row
    val tileRowSamples = tileSize * bands     // samples per tile row
    val stripData: IndexedSeq[Array[Byte]] =
      if (tiled) (0 until nStrips).map { idx =>
        val x0 = (idx % tilesAcross) * tileSize
        val y0 = (idx / tilesAcross) * tileSize
        def at(k: Int): Float = {
          val y = y0 + k / tileRowSamples
          val rem = k % tileRowSamples
          val x = x0 + rem / bands
          val s = rem % bands
          if (x < meta.width && y < meta.height)
            values((y * meta.width + x) * bands + s)
          else 0.0f
        }
        pack(
          if (predictor == 3) applyFpPredictor(tileSize, tileRowSamples, at)
          else {
            val bb = newBuf(tileSize * tileRowSamples * bytesPer)
            var k = 0
            while (k < tileSize * tileRowSamples) { putSample(bb, at(k)); k += 1 }
            if (predictor == 2)
              applyIntPredictor(bb.array(), tileRowSamples * bytesPer,
                bands, bytesPer, bb.order())
            bb.array()
          })
      }
      else (0 until nStrips).map { s =>
        val rows = math.min(rowsPerStrip, meta.height - s * rowsPerStrip)
        val base = s * rowsPerStrip * rowSamples
        pack(
          if (predictor == 3)
            applyFpPredictor(rows, rowSamples, k => values(base + k))
          else {
            val bb = newBuf(rows * rowSamples * bytesPer)
            var i = 0
            while (i < rows * rowSamples) { putSample(bb, values(base + i)); i += 1 }
            if (predictor == 2)
              applyIntPredictor(bb.array(), rowSamples * bytesPer,
                bands, bytesPer, bb.order())
            bb.array()
          })
      }
    val stripBytes = stripData.map(_.length)
    val nodataAscii = meta.nodata.map(nd =>
      (if (nd == nd.toLong.toDouble) nd.toLong.toString else nd.toString) + "\u0000")

    // tags in ascending order, as the spec requires: 13 fixed striped tags
    // (256,257,258,259,262,273,277,278,279,339,33550,33922,34735) or 14
    // tiled ones (277 then 322,323,324,325 replacing 273/278/279),
    // + Predictor (317) when used, + nodata, + PlanarConfiguration (284)
    // and ExtraSamples (338) for multi-band
    val nTags = (if (tiled) 14 else 13) +
      (if (predictor != 1) 1 else 0) + nodataAscii.size +
      (if (bands > 1) 2 else 0)
    val ifdAt = if (bigTiff) 16 else 8
    val ifdSize =
      if (bigTiff) 8 + nTags * 20 + 8 else 2 + nTags * 12 + 4
    var extAt = ifdAt + ifdSize // external value area cursor
    def reserve(n: Int): Int = { val at = extAt; extAt += n; at }
    val offBytes = if (bigTiff) 8 else 4 // LONG8 vs LONG chunk arrays
    val stripOffsetsAt = if (nStrips > 1) reserve(offBytes * nStrips) else -1
    val stripCountsAt = if (nStrips > 1) reserve(offBytes * nStrips) else -1
    val scaleAt = reserve(24)
    val tieAt = reserve(48)
    val geoKeysAt = reserve(2 * 16) // 4 header + 3 keys of 4 shorts
    // short arrays of count >= 3 exceed the 4-byte inline field
    val bitsAt = if (bands >= 3) reserve(2 * bands) else -1
    val fmtAt = if (bands >= 3) reserve(2 * bands) else -1
    val extraAt = if (bands - 1 >= 3) reserve(2 * (bands - 1)) else -1
    // values of size*count <= 4 live inline in the tag's value field (TIFF
    // spec; parseMeta's Entry.dataAt applies the same rule) — only reserve
    // external space for longer nodata strings
    val nodataAt = nodataAscii.filter(_.length > (if (bigTiff) 8 else 4))
      .map(s => reserve(s.length)).getOrElse(-1)
    val dataAt = extAt
    val stripOffsets = stripBytes.scanLeft(dataAt)(_ + _).init

    val total = dataAt + stripBytes.sum
    val buf = ByteBuffer.allocate(total)
      .order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    buf.put(0, (if (bigEndian) 'M' else 'I').toByte)
    buf.put(1, (if (bigEndian) 'M' else 'I').toByte)
    if (bigTiff) {
      buf.putShort(2, 43)
      buf.putShort(4, 8) // offset byte size
      buf.putShort(6, 0)
      buf.putLong(8, ifdAt.toLong)
    } else {
      buf.putShort(2, 42)
      buf.putInt(4, ifdAt)
    }

    var tagCursor = ifdAt + (if (bigTiff) 8 else 2)
    if (bigTiff) buf.putLong(ifdAt, nTags.toLong)
    else buf.putShort(ifdAt, nTags.toShort)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      buf.putShort(tagCursor, id.toShort)
      buf.putShort(tagCursor + 2, typ.toShort)
      if (bigTiff) buf.putLong(tagCursor + 4, count.toLong)
      else buf.putInt(tagCursor + 4, count)
      val vAt = tagCursor + (if (bigTiff) 12 else 8)
      // inline iff the payload fits the value field (4 / 8 bytes): the
      // TIFF/BigTIFF if-and-only-if rule Entry.dataAt applies on read
      val inline = TypeSizes(typ) * count <= (if (bigTiff) 8 else 4)
      (typ, inline) match {
        case (3, true) => buf.putShort(vAt, value.toShort) // count == 1
        case (4, true) => buf.putInt(vAt, value)
        case (16, true) => buf.putLong(vAt, value.toLong)
        case _ =>
          if (bigTiff) buf.putLong(vAt, value.toLong)
          else buf.putInt(vAt, value)
      }
      tagCursor += (if (bigTiff) 20 else 12)
    }
    // two SHORT values fit the 4-byte inline field (written explicitly —
    // an int-packed write would depend on byte order)
    def tag2Shorts(id: Int, a: Int, b: Int): Unit = {
      buf.putShort(tagCursor, id.toShort)
      buf.putShort(tagCursor + 2, 3.toShort)
      buf.putInt(tagCursor + 4, 2)
      buf.putShort(tagCursor + 8, a.toShort)
      buf.putShort(tagCursor + 10, b.toShort)
      tagCursor += 12
    }
    tag(256, 3, 1, meta.width)
    tag(257, 3, 1, meta.height)
    if (bands == 1) tag(258, 3, 1, sampleBits)
    else if (bands == 2) tag2Shorts(258, 32, 32)
    else tag(258, 3, bands, bitsAt)
    tag(259, 3, 1, compression)
    tag(262, 3, 1, 1)
    val offTyp = if (bigTiff) 16 else 4 // LONG8 chunk arrays in BigTIFF
    if (!tiled) {
      if (nStrips > 1) tag(273, offTyp, nStrips, stripOffsetsAt)
      else tag(273, offTyp, 1, stripOffsets.head)
    }
    tag(277, 3, 1, bands)
    if (!tiled) {
      tag(278, 3, 1, rowsPerStrip)
      if (nStrips > 1) tag(279, offTyp, nStrips, stripCountsAt)
      else tag(279, offTyp, 1, stripBytes.head)
    }
    if (bands > 1) tag(284, 3, 1, 1) // chunky interleave, explicit
    if (predictor != 1) tag(317, 3, 1, predictor)
    if (tiled) {
      tag(322, 3, 1, tileSize)
      tag(323, 3, 1, tileSize)
      if (nStrips > 1) tag(324, offTyp, nStrips, stripOffsetsAt)
      else tag(324, offTyp, 1, stripOffsets.head)
      if (nStrips > 1) tag(325, offTyp, nStrips, stripCountsAt)
      else tag(325, offTyp, 1, stripBytes.head)
    }
    if (bands == 2) tag(338, 3, 1, 0)            // 1 unspecified extra
    else if (bands == 3) tag2Shorts(338, 0, 0)   // 2 unspecified extras
    else if (bands == 4) tag(338, 3, 3, extraAt) // 3 unspecified extras
    if (bands == 1) tag(339, 3, 1, sampleFormat)
    else if (bands == 2) tag2Shorts(339, 3, 3)
    else tag(339, 3, bands, fmtAt)
    tag(33550, 12, 3, scaleAt)
    tag(33922, 12, 6, tieAt)
    tag(34735, 3, 16, geoKeysAt)
    nodataAscii.foreach { s =>
      if (s.length <= (if (bigTiff) 8 else 4)) {
        // short NUL-terminated string: bytes go inline in the value field
        buf.putShort(tagCursor, 42113.toShort)
        buf.putShort(tagCursor + 2, 2.toShort)
        if (bigTiff) buf.putLong(tagCursor + 4, s.length.toLong)
        else buf.putInt(tagCursor + 4, s.length)
        val vAt = tagCursor + (if (bigTiff) 12 else 8)
        s.getBytes("US-ASCII").zipWithIndex
          .foreach { case (b, i) => buf.put(vAt + i, b) }
        tagCursor += (if (bigTiff) 20 else 12)
      } else tag(42113, 2, s.length, nodataAt)
    }
    if (bigTiff) buf.putLong(tagCursor, 0L) // next IFD
    else buf.putInt(tagCursor, 0)

    if (nStrips > 1) (0 until nStrips).foreach { s =>
      if (bigTiff) {
        buf.putLong(stripOffsetsAt + 8 * s, stripOffsets(s).toLong)
        buf.putLong(stripCountsAt + 8 * s, stripBytes(s).toLong)
      } else {
        buf.putInt(stripOffsetsAt + 4 * s, stripOffsets(s))
        buf.putInt(stripCountsAt + 4 * s, stripBytes(s))
      }
    }
    buf.putDouble(scaleAt, meta.a)
    buf.putDouble(scaleAt + 8, -meta.e)
    buf.putDouble(scaleAt + 16, 0.0)
    // tiepoint (0,0,0) -> (c, f, 0)
    Seq(0.0, 0.0, 0.0, meta.c, meta.f, 0.0).zipWithIndex
      .foreach { case (v, i) => buf.putDouble(tieAt + 8 * i, v) }
    val geoKeys: Seq[Int] = Seq(
      1, 1, 0, 3, // version, revision, minor, numKeys
      1024, 0, 1, if (geographic) 2 else 1, // GTModelType
      1025, 0, 1, 1, // GTRasterType = PixelIsArea
      (if (geographic) 2048 else 3072), 0, 1, epsg)
    geoKeys.zipWithIndex.foreach { case (v, i) =>
      buf.putShort(geoKeysAt + 2 * i, v.toShort)
    }
    nodataAscii.filter(_.length > 4).foreach { s =>
      s.getBytes("US-ASCII").zipWithIndex
        .foreach { case (b, i) => buf.put(nodataAt + i, b) }
    }
    if (bands >= 3) (0 until bands).foreach { i =>
      buf.putShort(bitsAt + 2 * i, 32)
      buf.putShort(fmtAt + 2 * i, 3)
    }
    if (extraAt >= 0) (0 until bands - 1).foreach { i =>
      buf.putShort(extraAt + 2 * i, 0)
    }
    stripData.zip(stripOffsets).foreach { case (data, off) =>
      System.arraycopy(data, 0, buf.array(), off, data.length)
    }
    buf.array()
  }
}
