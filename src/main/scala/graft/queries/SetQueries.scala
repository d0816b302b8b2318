package graft.queries

object SetQueries extends QueryBase {
  val all: Seq[Q] = Seq()
}
