package graft.queries

object DedupQueries extends QueryBase {
  val all: Seq[Q] = Seq()
}
