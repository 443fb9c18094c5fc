package graft.queries

/** All driver-checkable queries, one per implemented operator family
  * (SURVEY.md §2). Names must stay unique.
  */
object Registry {
  val all: Seq[QueryDef] =
    BicisQueries.all ++ StreamingReplays.all ++ RelationalQueries.all ++
      ScalarQueries.all ++ DedupQueries.all ++ TextQueries.all ++
      EmbedQueries.all ++ MlQueries.all ++ GraphQueries.all

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
