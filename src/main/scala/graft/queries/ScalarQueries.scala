package graft.queries

object ScalarQueries extends QueryBase {
  val all: Seq[Q] = Seq()
}
