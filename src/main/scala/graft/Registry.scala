package graft

/** Single place where every implemented operator registers itself.
  * SparkEntry derives the driver contract maps from this list.
  */
object Registry {
  def all: Seq[QueryDef] =
    operators.Relational.queries ++
      operators.Aggregates.queries ++
      operators.Windows.queries ++
      operators.Scalars.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.EventWindows.queries ++
      operators.MultimodalOps.queries ++
      operators.Graph.queries ++
      operators.Pipeline.queries

  def byName(name: String): QueryDef =
    all.find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"graft: unknown query: $name"))
}
