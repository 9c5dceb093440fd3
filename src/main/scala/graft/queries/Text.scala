package graft.queries
import graft.GQuery
object Text {
  val all: Seq[GQuery] = Seq()
}
