package graft.queries
import graft.GQuery
object Analytics {
  val all: Seq[GQuery] = Seq()
}
