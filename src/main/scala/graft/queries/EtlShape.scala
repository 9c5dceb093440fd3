package graft.queries
import graft.GQuery
object EtlShape {
  val all: Seq[GQuery] = Seq()
}
