package graft.queries
import graft.GQuery
object Similarity {
  val all: Seq[GQuery] = Seq()
}
