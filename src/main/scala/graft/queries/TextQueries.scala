package graft.queries

object TextQueries extends QueryBase {
  val all: Seq[Q] = Seq()
}
