package graft.queries

object JoinQueries extends QueryBase {
  val all: Seq[Q] = Seq()
}
