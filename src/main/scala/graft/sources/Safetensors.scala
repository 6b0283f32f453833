package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** safetensors — the tensor-serialization format modern training
  * stacks load weights from (HuggingFace `safetensors` spec):
  *
  *   [8-byte little-endian u64: header length N]
  *   [N bytes: JSON header — tensor name → {dtype, shape,
  *    data_offsets:[begin,end]} plus optional "__metadata__"]
  *   [raw tensor bytes, little-endian, concatenated per the offsets]
  *
  * Unlike pickle it is flat, seekable and safe to parse; unlike ARPA
  * it is LOSSLESS — raw IEEE bytes round-trip bit-exactly, so a model
  * scored from a reloaded artifact is BIT-IDENTICAL to the in-memory
  * model (x206 reuses x85's oracle verbatim on that strength).
  *
  * Supported dtypes: F64 and F32. The writer is canonical —
  * tensors serialize in name-sorted order, offsets are contiguous
  * from 0, the header is rendered with sorted keys and padded with
  * spaces to an 8-byte boundary (the reference implementation's
  * alignment rule) — so equal models produce byte-equal files. The
  * reader is a small recursive-descent JSON parser accepting any key
  * order/whitespace, and validates offsets against the buffer. */
object Safetensors {

  sealed trait Tensor { def shape: Seq[Long] }
  final case class F64(shape: Seq[Long], data: Array[Double]) extends Tensor
  final case class F32(shape: Seq[Long], data: Array[Float]) extends Tensor

  // ------------------------------------------------------------ write

  def render(tensors: Map[String, Tensor],
             metadata: Map[String, String] = Map.empty): Array[Byte] = {
    val names = tensors.keys.toSeq.sorted
    var off = 0L
    val entries = names.map { n =>
      val t = tensors(n)
      val nBytes = t match {
        case F64(_, d) => d.length.toLong * 8
        case F32(_, d) => d.length.toLong * 4
      }
      val nElems = t.shape.foldLeft(1L)(_ * _)
      require(nElems * (t match { case _: F64 => 8L; case _: F32 => 4L })
        == nBytes, s"tensor $n: shape ${t.shape} != data length")
      val e = (n, t, off, off + nBytes)
      off += nBytes
      e
    }
    val qname = (s: String) => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val metaJson =
      if (metadata.isEmpty) ""
      else metadata.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${qname(k)}:${qname(v)}" }
        .mkString("\"__metadata__\":{", ",", "},")
    val body = entries.map { case (n, t, b, e) =>
      val dt = t match { case _: F64 => "F64"; case _: F32 => "F32" }
      s"${qname(n)}:{" +
        s""""dtype":"$dt","shape":[${t.shape.mkString(",")}],""" +
        s""""data_offsets":[$b,$e]}"""
    }.mkString("{" + metaJson, ",", "}")
    // pad the header with trailing spaces to an 8-byte boundary
    val pad = (8 - (body.length % 8)) % 8
    val header = body + (" " * pad)
    val hb = header.getBytes(StandardCharsets.UTF_8)
    // a >2 GiB payload would silently truncate off.toInt and render a
    // corrupt file — fail loud instead (shard the tensors upstream)
    require(off + 8 + hb.length <= Int.MaxValue,
      s"safetensors payload ${off + 8 + hb.length} bytes exceeds the " +
        "2 GiB single-buffer render limit — split into shards")
    val out = ByteBuffer.allocate(8 + hb.length + off.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(hb.length.toLong)
    out.put(hb)
    entries.foreach { case (_, t, _, _) =>
      t match {
        case F64(_, d) => d.foreach(out.putDouble)
        case F32(_, d) => d.foreach(out.putFloat)
      }
    }
    out.array()
  }

  def write(path: String, tensors: Map[String, Tensor],
            metadata: Map[String, String] = Map.empty): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, render(tensors, metadata))
  }

  // ------------------------------------------------------------- read

  def parse(bytes: Array[Byte]): (Map[String, Tensor], Map[String, String]) = {
    require(bytes.length >= 8, "truncated safetensors: no header length")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val hlen = bb.getLong(0)
    require(hlen > 0 && hlen <= bytes.length - 8,
      s"bad header length $hlen for ${bytes.length}-byte file")
    val header = new String(bytes, 8, hlen.toInt, StandardCharsets.UTF_8)
    val root = Json.parse(header) match {
      case o: Map[_, _] => o.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException("header is not an object")
    }
    val dataBase = 8 + hlen.toInt
    val dataLen = bytes.length - dataBase
    val meta = root.get("__metadata__")
      .map(_.asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.toString })
      .getOrElse(Map.empty)
    val tensors = (root - "__metadata__").map { case (name, v) =>
      val o = v.asInstanceOf[Map[String, Any]]
      val dtype = o("dtype").asInstanceOf[String]
      val shape = o("shape").asInstanceOf[Seq[Any]]
        .map(x => x.asInstanceOf[Double].toLong)
      val Seq(b, e) = o("data_offsets").asInstanceOf[Seq[Any]]
        .map(x => x.asInstanceOf[Double].toLong)
      require(b >= 0 && e >= b && e <= dataLen,
        s"tensor $name offsets [$b,$e) outside data of $dataLen bytes")
      val n = shape.foldLeft(1L)(_ * _)
      dtype match {
        case "F64" =>
          require(e - b == n * 8, s"tensor $name: F64 size mismatch")
          val a = new Array[Double](n.toInt)
          var i = 0
          while (i < a.length) {
            a(i) = bb.getDouble(dataBase + b.toInt + i * 8); i += 1
          }
          name -> F64(shape, a)
        case "F32" =>
          require(e - b == n * 4, s"tensor $name: F32 size mismatch")
          val a = new Array[Float](n.toInt)
          var i = 0
          while (i < a.length) {
            a(i) = bb.getFloat(dataBase + b.toInt + i * 4); i += 1
          }
          name -> F32(shape, a)
        case d =>
          throw new IllegalArgumentException(s"unsupported dtype $d")
      }
    }
    (tensors, meta)
  }

  def read(path: String): (Map[String, Tensor], Map[String, String]) =
    parse(Files.readAllBytes(Paths.get(path)))

  /** Minimal recursive-descent JSON reader for the header subset:
    * objects, arrays, strings (with escapes), numbers, true/false/null.
    * Numbers surface as Double (offsets fit exactly below 2^53). */
  private object Json {
    def parse(s: String): Any = {
      val p = new P(s); val v = p.value(); p.ws()
      require(p.i == s.length, s"trailing JSON at ${p.i}")
      v
    }
    private final class P(s: String) {
      var i = 0
      def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
      def value(): Any = { ws(); s(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }}
      def lit(w: String, v: Any): Any = {
        require(s.startsWith(w, i), s"bad literal at $i"); i += w.length; v
      }
      def obj(): Map[String, Any] = {
        i += 1; ws()
        val b = Map.newBuilder[String, Any]
        if (s(i) == '}') { i += 1; return b.result() }
        while (true) {
          ws(); val k = str(); ws()
          require(s(i) == ':', s"expected : at $i"); i += 1
          b += k -> value(); ws()
          if (s(i) == ',') i += 1
          else { require(s(i) == '}', s"expected }} at $i"); i += 1
                 return b.result() }
        }
        b.result()
      }
      def arr(): Seq[Any] = {
        i += 1; ws()
        val b = Seq.newBuilder[Any]
        if (s(i) == ']') { i += 1; return b.result() }
        while (true) {
          b += value(); ws()
          if (s(i) == ',') i += 1
          else { require(s(i) == ']', s"expected ] at $i"); i += 1
                 return b.result() }
        }
        b.result()
      }
      def str(): String = {
        require(s(i) == '"', s"expected string at $i"); i += 1
        val sb = new StringBuilder
        while (s(i) != '"') {
          if (s(i) == '\\') {
            i += 1
            s(i) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
              case 'f' => sb.append('\f'); case '/' => sb.append('/')
              case '"' => sb.append('"'); case '\\' => sb.append('\\')
              case 'u' =>
                sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16)
                  .toChar)
                i += 4
              case c => throw new IllegalArgumentException(s"escape \\$c")
            }
            i += 1
          } else { sb.append(s(i)); i += 1 }
        }
        i += 1
        sb.toString
      }
      def num(): Double = {
        val st = i
        while (i < s.length &&
          (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
        s.substring(st, i).toDouble
      }
    }
  }
}
