package graft.raster

/** Terrarium (terrain-RGB) elevation encoding.
  *
  * Encode semantics pinned by the reference
  * (src/elevation/getTerrariumDemElevation.ts:10-20): per coordinate,
  * `e = elev + 32768`; bytes `[floor(e/256), trunc(e % 256),
  * floor((e - floor(e)) * 256)]` — the middle byte goes through JS
  * `Uint8Array` assignment, which truncates toward zero then wraps mod 256.
  * Decode is the published Terrarium formula `R*256 + G + B/256 - 32768`.
  */
object Terrarium {

  /** Low 8 bits of JS ToUint8 (truncate toward zero, wrap mod 256). */
  @inline private def toUint8(x: Double): Int = {
    val t = x.toLong // truncation toward zero, as JS ToIntegerOrInfinity
    (t & 0xffL).toInt
  }

  /** Encode one elevation into (r, g, b), each 0..255. */
  def encode(elev: Double): (Int, Int, Int) = {
    val e = elev + 32768.0
    val r = toUint8(math.floor(e / 256))
    val g = toUint8(e % 256) // Scala % matches JS % (trunc-mod) for e >= 0
    val b = toUint8(math.floor((e - math.floor(e)) * 256))
    (r, g, b)
  }

  /** Encode a sequence of elevations to the reference's 3-bytes-per-coordinate
    * stream in input order (content type application/x-terrarium-dem).
    */
  def encodeStream(elevs: Iterable[Double]): Array[Byte] = {
    val it = elevs.iterator
    val out = new Array[Byte](elevs.size * 3)
    var i = 0
    while (it.hasNext) {
      val (r, g, b) = encode(it.next())
      out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
      i += 3
    }
    out
  }

  /** Published Terrarium decode. Within 1/256 of the encoded elevation. */
  def decode(r: Int, g: Int, b: Int): Double =
    (r & 0xff) * 256.0 + (g & 0xff) + (b & 0xff) / 256.0 - 32768.0
}
