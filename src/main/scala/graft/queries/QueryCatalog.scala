package graft.queries

/** Assembles every query module into the single driver-contract map.
  * Each module covers one slice of SURVEY.md §2 + the LLM-pipeline
  * operator families.
  */
object QueryCatalog {
  val modules: Seq[Q] = {
    val all = Relational.all ++ Relational2.all ++ Relational2.aggQueries ++
      Relational2.sessionQueries ++ LlmOps.all ++ MrfGold.all ++ Curation2.all ++
      ScaleOps.all ++ ScaleOps2.all ++ ScaleOps2.setOpQueries ++ ScaleOps3.all ++
      ScaleOps3.timeSeriesQueries ++ ScaleOps3.evalQueries ++ ScaleOps3.monitorQueries ++
      ScaleOps4.all ++ ScaleOps5.all ++ ScaleOps5.streamQueries2 ++
      ScaleOps5.streamQueries3 ++ ScaleOps6.all ++ ScaleOps7.all ++
      ScaleOps7.all2 ++ ScaleOps8.all ++ ScaleOps8.all2 ++ ScaleOps8.all3 ++ ScaleOps8.all4 ++ ScaleOps8.all5 ++ ScaleOps8.all6 ++ ScaleOps8.all7 ++ ScaleOps9.all ++ ScaleOps9.all2 ++ ScaleOps9.all3 ++ ScaleOps9.all4 ++ ScaleOps9.all5 ++ ScaleOps9.all6 ++ ScaleOps9.all7 ++ ScaleOps9.all8 ++ ScaleOps10.all ++ ScaleOps10.all2 ++ ScaleOps10.all3 ++ ScaleOps10.all4 ++ ScaleOps10.all5 ++ ScaleOps10.all6 ++ ScaleOps10.all7 ++ ScaleOps11.all ++ ScaleOps12.all ++ ScaleOps13.all ++ ScaleOps13.all2 ++ ScaleOps13.all3 ++ ScaleOps13.all4 ++ ScaleOps14.all ++ ScaleOps15.all
    // a colliding name would make toMap silently keep the LAST
    // definition while benchNames lists it twice — Verify could then
    // pair one module's result with another's oracle; fail fast instead
    val dup = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names in catalog: ${dup.mkString(", ")}")
    all
  }

  // vals: the catalog is immutable, and Bench/Verify look names up
  // per-query — rebuilding every Q (and its multi-KB oracle SQL) per
  // lookup is pointless allocation
  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    modules.map(q => q.name -> q.fn).toMap
  val oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
  val benchNames: Seq[String] = modules.filter(_.bench).map(_.name)
}
