package graft.sources

/** TIFF6 LZW codec (Compression=5): MSB-first code packing, 9→12-bit codes
  * with the spec's "early change" (width bumps when the table reaches
  * 2^bits − 1), ClearCode=256, EOI=257, table reset at 4094 entries.
  * Self-contained so [[GeoTiff]] reads rasterio/GDAL LZW strips without
  * native libs; the encoder exists for the writer round-trip and fixtures.
  */
object Lzw {
  private val Clear = 256
  private val Eoi = 257

  def decode(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length * 3)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var nextCode = 258
    var bits = 9
    var acc = 0L; var nAcc = 0; var pos = 0
    def readCode(): Int = {
      while (nAcc < bits) {
        if (pos >= src.length) return Eoi // tolerate missing explicit EOI
        acc = (acc << 8) | (src(pos) & 0xFFL); pos += 1; nAcc += 8
      }
      nAcc -= bits
      ((acc >>> nAcc) & ((1L << bits) - 1)).toInt
    }
    val stack = new Array[Byte](4096)
    def emit(code: Int): Byte = { // writes the code's string, returns first byte
      var c = code; var sp = 0
      while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c.toByte
      out.write(c)
      while (sp > 0) { sp -= 1; out.write(stack(sp)) }
      first
    }
    var oldCode = -1
    var code = readCode()
    while (code != Eoi) {
      if (code == Clear) {
        nextCode = 258; bits = 9; oldCode = -1
      } else if (oldCode < 0) {
        require(code < 256, s"LZW: first code after clear must be a root, got $code")
        out.write(code)
        oldCode = code
      } else {
        val inTable = code < 256 || code < nextCode
        if (nextCode < 4096) {
          prefix(nextCode) = oldCode
          // suffix = first byte of this code's string (in-table) or of the
          // old string (the K-ω-K case)
          suffix(nextCode) = firstByte(code, inTable, oldCode, prefix, suffix)
          nextCode += 1
          // early change, decoder side: widen at 2^bits − 1. The decoder's
          // table lags the encoder's by one entry, so this pairs with the
          // encoder widening at 2^bits — verified byte-identical against
          // the JDK TIFF plugin's LZW codec (ScratchLzw experiment).
          if (nextCode == (1 << bits) - 1 && bits < 12) bits += 1
        }
        require(inTable || code == nextCode - 1,
          s"LZW: code $code beyond table ($nextCode)")
        emit(code)
        oldCode = code
      }
      code = readCode()
    }
    out.toByteArray
  }

  private def firstByte(code: Int, inTable: Boolean, oldCode: Int,
                        prefix: Array[Int], suffix: Array[Byte]): Byte = {
    var c = if (inTable) code else oldCode
    while (c >= 258) c = prefix(c)
    c.toByte
  }

  def encode(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length / 2 + 16)
    var acc = 0L; var nAcc = 0
    var bits = 9
    def write(code: Int): Unit = {
      acc = (acc << bits) | code; nAcc += bits
      while (nAcc >= 8) { nAcc -= 8; out.write(((acc >>> nAcc) & 0xFF).toInt) }
    }
    val table = new java.util.HashMap[Integer, Integer](8192)
    var nextCode = 258
    def reset(): Unit = { table.clear(); nextCode = 258 }
    write(Clear)
    var omega = -1
    var i = 0
    while (i < src.length) {
      val k = src(i) & 0xFF
      if (omega < 0) omega = k
      else {
        val key = (omega << 8) | k
        val hit = table.get(key)
        if (hit != null) omega = hit
        else {
          write(omega)
          table.put(key, nextCode); nextCode += 1
          // early change, encoder side: widen at 2^bits (one later than the
          // decoder — its table runs one entry behind)
          if (nextCode == (1 << bits) && bits < 12) bits += 1
          if (nextCode == 4094) { write(Clear); reset(); bits = 9 }
          omega = k
        }
      }
      i += 1
    }
    if (omega >= 0) write(omega)
    write(Eoi)
    if (nAcc > 0) out.write(((acc << (8 - nAcc)) & 0xFF).toInt)
    out.toByteArray
  }
}
