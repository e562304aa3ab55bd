package graft.bench
object S2Dump {
  def main(args: Array[String]): Unit = {
    // deterministic probe points incl. all faces + boundaries
    val rnd = new scala.util.Random(99)
    val pts = (1 to 40).map { i =>
      (i, -179.9 + rnd.nextDouble() * 359.8, -89.0 + rnd.nextDouble() * 178.0)
    }
    pts.foreach { case (id, lng, lat) =>
      println(s"S2V,$id,$lng,$lat,${graft.geo.S2.latLngToCell(lng, lat, 12)},${graft.geo.S2.latLngToCell(lng, lat, 30)}")
    }
  }
}
