package graft.queries

object SimilarityQueries extends QueryBase {
  val all: Seq[Q] = Seq()
}
