package graft.sources

/** PackBits (TIFF6 §9, Compression=32773) — the byte-oriented RLE of
  * legacy scanner/Mac-origin GeoTIFF exports. Decoder: control byte n in
  * [0,127] copies the next n+1 literal bytes; n in [-127,-1] repeats the
  * next byte 1-n times; -128 is a no-op. Encoder: maximal runs ≥ 2 become
  * replicate packets, everything else literal packets of ≤ 128 — a valid
  * (and deterministic) encoding per spec, so fixtures pin byte-for-byte. */
object PackBits {

  def decode(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length * 2)
    var i = 0
    while (i < src.length) {
      val n = src(i).toInt
      i += 1
      if (n >= 0) {
        val cnt = n + 1
        require(i + cnt <= src.length, "PackBits: truncated literal packet")
        out.write(src, i, cnt)
        i += cnt
      } else if (n != -128) {
        require(i < src.length, "PackBits: truncated replicate packet")
        val b = src(i)
        i += 1
        var k = 1 - n
        while (k > 0) { out.write(b); k -= 1 }
      } // -128: no-op per spec
    }
    out.toByteArray
  }

  def encode(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length + src.length / 128 + 2)
    var i = 0
    val n = src.length
    while (i < n) {
      // measure the run starting at i (capped at the 128-byte packet max)
      var run = 1
      while (i + run < n && run < 128 && src(i + run) == src(i)) run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1)
        out.write(src(i))
        i += run
      } else {
        // literal segment: until the next run of >= 2 (or 128 bytes)
        val start = i
        i += 1
        var continue = true
        while (continue && i < n && i - start < 128) {
          if (i + 1 < n && src(i) == src(i + 1)) continue = false
          else i += 1
        }
        out.write(i - start - 1)
        out.write(src, start, i - start)
      }
    }
    out.toByteArray
  }
}
