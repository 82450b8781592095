package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped top-k as a FIRST-CLASS operator — "the k best items per
  * group" (top spenders per nation, hottest parts per supplier) with
  * the bounded-heap plan the ANN stack already proved out
  * ([[TopKByScore]]): map-side partial top-k heaps reduce every
  * partition to ≤ k rows per group BEFORE the shuffle, so ranking n
  * rows moves O(k · partitions) rows — the `row_number().over(...)`
  * formulation this replaces shuffles and sorts the ENTIRE input
  * through the window operator, which is exactly the plan that dies
  * first at 100 TB. Ordering is (score desc, id asc) — ties are
  * deterministic, NaN ranks worst, and ranks are dense 1..k.
  */
object Ranking {

  def topNPerGroup(
      df: DataFrame,
      group: Column,
      id: Column,
      score: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tk = udaf(new TopKByScore(k))
    df.select(
        group.as("group"),
        when(id.cast("long").isNull, raise_error(lit(
          "topNPerGroup: id must be non-null and long-castable")))
          .otherwise(id.cast("long")).as("__id"),
        when(score.cast("double").isNull, raise_error(lit(
          "topNPerGroup: score must be non-null and double-castable")))
          .otherwise(score.cast("double")).as("__s"))
      .groupBy(col("group"))
      .agg(tk(col("__s"), col("__id")).as("__topk"))
      .select(col("group"), posexplode(col("__topk.items")).as(Seq("__p", "__e")))
      .select(
        col("group"), (col("__p") + 1).cast("int").as("rank"),
        col("__e._2").as("id"), col("__e._1").as("score"))
  }

  /** STREAMABLE half of the grouped top-k: the aggregation alone,
    * heap left packed in a `topk` column — legal inside a streaming
    * complete/update-mode aggregation, where the state store then
    * holds ONE ≤ k-entry heap per group (not the event history) and
    * each micro-batch's partial heaps merge into it. Explode the
    * final emission with [[explodeTopK]] (a generate after a
    * streaming aggregation is not universally supported, and the
    * sink's last complete emission is the natural place to unpack).
    */
  def topKStreamable(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tk = udaf(new TopKByScore(k))
    df.groupBy(col(groupCol))
      .agg(tk(col(scoreCol).cast("double"), col(idCol).cast("long")).as("topk"))
  }

  /** Unpack a [[topKStreamable]] emission to (group, rank, <idName>,
    * <scoreName>) rows — ranks dense 1..k, same order contract as
    * [[topNPerGroup]]. The heap column is `heapName` (the name
    * [[topKStreamable]] emits) and the group column is `groupName`,
    * or — when not given — the SINGLE remaining column; any other
    * shape (projection added columns, renamed heap) fails loudly
    * instead of exploding the wrong column.
    */
  def explodeTopK(
      df: DataFrame,
      idName: String = "id",
      scoreName: String = "score",
      groupName: Option[String] = None,
      heapName: String = "topk"): DataFrame = {
    require(df.columns.contains(heapName),
      s"explodeTopK: no '$heapName' column in (${df.columns.mkString(", ")}) — " +
        "is this a topKStreamable emission?")
    val groupCol = groupName.getOrElse {
      val rest = df.columns.filterNot(_ == heapName)
      require(rest.length == 1,
        s"explodeTopK: cannot infer the group column from " +
          s"(${df.columns.mkString(", ")}) — pass groupName explicitly")
      rest.head
    }
    require(df.columns.contains(groupCol),
      s"explodeTopK: no '$groupCol' column in (${df.columns.mkString(", ")})")
    df.select(col(groupCol), posexplode(col(s"$heapName.items")).as(Seq("__p", "__e")))
      .select(col(groupCol), (col("__p") + 1).cast("int").as("rank"),
        col("__e._2").as(idName), col("__e._1").as(scoreName))
  }
}
