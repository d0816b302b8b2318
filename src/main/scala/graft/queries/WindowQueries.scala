package graft.queries

object WindowQueries extends QueryBase {
  val all: Seq[Q] = Seq()
}
