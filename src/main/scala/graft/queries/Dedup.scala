package graft.queries
import graft.GQuery
object Dedup {
  val all: Seq[GQuery] = Seq()
}
