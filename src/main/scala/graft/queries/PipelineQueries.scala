package graft.queries

object PipelineQueries extends QueryBase {
  val all: Seq[Q] = Seq()
}
