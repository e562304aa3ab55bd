package graft.geo

import scala.collection.mutable.ArrayBuffer

/** Google encoded-polyline codec, precision 5 — the published algorithm the
  * reference delegates to `@mapbox/polyline.toGeoJSON` for
  * (src/server.ts:60). Decodes to (lng, lat) pairs in LineString order.
  */
object Polyline {
  private final val Factor = 1e5

  /** Decode an encoded polyline into (lng, lat) coordinates. */
  def decode(str: String): Array[(Double, Double)] = {
    val out = new ArrayBuffer[(Double, Double)]()
    var index = 0
    var lat = 0L
    var lng = 0L
    while (index < str.length) {
      var result = 0L
      var shift = 0
      var b = 0
      do {
        b = str.charAt(index) - 63; index += 1
        result |= (b & 0x1f).toLong << shift
        shift += 5
      } while (b >= 0x20)
      lat += (if ((result & 1) != 0) ~(result >> 1) else result >> 1)
      result = 0; shift = 0
      do {
        b = str.charAt(index) - 63; index += 1
        result |= (b & 0x1f).toLong << shift
        shift += 5
      } while (b >= 0x20)
      lng += (if ((result & 1) != 0) ~(result >> 1) else result >> 1)
      out += ((lng / Factor, lat / Factor))
    }
    out.toArray
  }

  /** Encode (lng, lat) coordinates into a precision-5 polyline string. */
  def encode(coords: Iterable[(Double, Double)]): String = {
    val sb = new StringBuilder
    var prevLat = 0L
    var prevLng = 0L
    def emit(v: Long): Unit = {
      var value = if (v < 0) ~(v << 1) else v << 1
      while (value >= 0x20) {
        sb.append(((0x20 | (value & 0x1f)) + 63).toChar)
        value >>= 5
      }
      sb.append((value + 63).toChar)
    }
    coords.foreach { case (lng, lat) =>
      val iLat = math.round(lat * Factor)
      val iLng = math.round(lng * Factor)
      emit(iLat - prevLat)
      emit(iLng - prevLng)
      prevLat = iLat; prevLng = iLng
    }
    sb.toString
  }
}
