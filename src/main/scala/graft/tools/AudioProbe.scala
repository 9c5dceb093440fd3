package graft.tools

object AudioProbe {
  def main(args: Array[String]): Unit = {
    val payloads = (1L to 5000L).map(graft.etl.DataGen.audioBytes).toArray
    def decodeAll(par: Boolean): Double = {
      val t0 = System.nanoTime()
      val r = if (par) {
        import scala.collection.parallel.CollectionConverters._
        payloads.par.map(p => graft.multimodal.Multimodal.probeDecode(p)).sum
      } else payloads.map(p => graft.multimodal.Multimodal.probeDecode(p)).sum
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"par=$par sum=$r dt=$dt%.2f s")
      dt
    }
    decodeAll(false); decodeAll(false) // warm + serial
    decodeAll(true); decodeAll(true)   // parallel
  }
}
