package graft.queries

/** Assembles every query module into the single driver-contract map.
  * Each module covers one slice of SURVEY.md §2 + the LLM-pipeline
  * operator families.
  */
object QueryCatalog {
  def modules: Seq[Q] =
    Relational.all ++ Relational2.all ++ Relational2.aggQueries ++
      Relational2.sessionQueries ++ LlmOps.all ++ MrfGold.all

  def queries = modules.map(q => q.name -> q.fn).toMap
  def oracleSql = modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
  def benchNames = modules.filter(_.bench).map(_.name)
}
