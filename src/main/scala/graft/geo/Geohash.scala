package graft.geo

/** Geohash cell strings (the public interleaved base-32 encoding,
  * G. Niemeyer 2008) — the third interoperable cell index next to
  * [[S2]] and [[Hex]], and the one whose PREFIX property is a string:
  * `substring(geohash, 1, k)` is the k-char parent cell, so prefix
  * range predicates (`geohash LIKE 'u4pr%'`) prune like the
  * [[Morton]] key ranges but stay human-readable and join against any
  * external geohash-keyed dataset (the encoding is fully specified —
  * unlike uber/h3's constant tables, there is nothing to be
  * bit-incompatible with).
  *
  * Closed form instead of the textbook bisection loop: quantize each
  * coordinate to 30 bits with ONE IEEE multiply + floor (association
  * order `((lng + 180) / 360) · 2³⁰` is part of the cross-engine
  * contract, mirroring [[Morton.qLng]]), spread with the standard magic
  * masks, and interleave lng into the odd (higher) positions — the top
  * `5·chars` bits of the 60-bit word are exactly the bisection bits,
  * because truncating a floor-quantization to fewer bits IS the coarser
  * floor-quantization. The DuckDB oracle replays the same arithmetic as
  * a 60-term bit sum.
  */
object Geohash {
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Spread the low 30 bits of v to the even bit positions of a 60-bit word. */
  def spread30(v: Long): Long = {
    var x = v & 0x3FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Quantize lng ∈ [−180, 180] to a 30-bit column, clamped. */
  def qLng(lng: Double): Long =
    math.min(1073741823L, math.max(0L,
      math.floor(((lng + 180.0) / 360.0) * 1073741824.0).toLong))

  /** Quantize lat ∈ [−90, 90] to a 30-bit row, clamped. */
  def qLat(lat: Double): Long =
    math.min(1073741823L, math.max(0L,
      math.floor(((lat + 90.0) / 180.0) * 1073741824.0).toLong))

  /** 60-bit interleaved code: lng bits at the odd (higher) positions —
    * geohash alternates lng-first from the MSB.
    */
  def bits(lng: Double, lat: Double): Long =
    (spread30(qLng(lng)) << 1) | spread30(qLat(lat))

  /** Decode a geohash to its cell box `(lngMin, lngMax, latMin, latMax)` —
    * the ideal real-arithmetic box (lower incl., upper excl.); callers that
    * prune against FLOAT coordinates must pad by an ulp-scale epsilon (the
    * closed-form encoder rounds once per coordinate). None on an invalid
    * character or length.
    */
  def box(gh: String): Option[(Double, Double, Double, Double)] = {
    if (gh.isEmpty || gh.length > 12) return None
    var bits = 0L; var n = 0
    var ci = 0
    while (ci < gh.length) {
      val v = Alphabet.indexOf(gh.charAt(ci))
      if (v < 0) return None
      bits = (bits << 5) | v; n += 5; ci += 1
    }
    var lngIdx = 0L; var latIdx = 0L; var nLng = 0; var nLat = 0
    var j = 0
    while (j < n) {
      val b = (bits >>> (n - 1 - j)) & 1L
      if ((j & 1) == 0) { lngIdx = (lngIdx << 1) | b; nLng += 1 }
      else { latIdx = (latIdx << 1) | b; nLat += 1 }
      j += 1
    }
    val lngSpan = 360.0 / (1L << nLng)
    val latSpan = 180.0 / (1L << nLat)
    Some((-180.0 + lngIdx * lngSpan, -180.0 + (lngIdx + 1) * lngSpan,
      -90.0 + latIdx * latSpan, -90.0 + (latIdx + 1) * latSpan))
  }

  /** Base-32 geohash of length `chars` (1..12 — 12 chars = 60 bits). */
  def encode(lng: Double, lat: Double, chars: Int): String = {
    require(chars >= 1 && chars <= 12, s"chars must be in 1..12: $chars")
    val b = bits(lng, lat)
    val sb = new java.lang.StringBuilder(chars)
    var i = 1
    while (i <= chars) {
      sb.append(Alphabet.charAt(((b >>> (60 - 5 * i)) & 31L).toInt))
      i += 1
    }
    sb.toString
  }
}
