package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar spatial joins via grid-cell blocking — the classic
  * spatial-join geometry (e.g. SpatialHadoop / Sedona's uniform
  * grid): bucket every point into a square cell of side `radius`,
  * then any pair within `radius` must land in the same or one of the
  * 8 adjacent cells, so the all-pairs O(n²) collapses to a bounded
  * equi-join on cell ids. 100 TB shape: the blocking key is a plain
  * equi-join key (hash-partitionable, AQE-skew-splittable); the probe
  * side replicates ×9 via a literal offset explode (a constant
  * factor, not a blowup); the exact distance predicate runs map-side
  * after the join, so false candidates never shuffle twice.
  *
  * Determinism: the emitted `dist2` is (dx·dx + dy·dy) with each
  * coordinate cast to double BEFORE subtraction — float inputs widen
  * exactly, and the two products + one sum are IEEE-pinned, so the
  * threshold compare and the output value are bit-identical in any
  * engine replaying the same expression. No sqrt is taken (callers
  * comparing to `radius` should square it the same way).
  */
object Spatial {

  /** All unordered point pairs within `radius` (Euclidean, strict ≤):
    * (id_a, id_b, dist2) with id_a < id_b. Ids must be distinct
    * non-null longs; coordinates non-null finite doubles (raises
    * otherwise — a null coordinate is a data bug, not a miss).
    */
  def radiusJoin(
      df: DataFrame,
      id: Column,
      x: Column,
      y: Column,
      radius: Double): DataFrame = {
    require(radius > 0.0 && java.lang.Double.isFinite(radius),
      s"radiusJoin: radius must be positive and finite, got $radius")
    def fin(c: Column, name: String): Column = {
      val d = c.cast("double")
      when(d.isNull || isnan(d) || d === Double.PositiveInfinity ||
        d === Double.NegativeInfinity, raise_error(lit(
        s"radiusJoin: $name must be non-null and finite"))).otherwise(d)
    }
    val idG = when(id.cast("long").isNull, raise_error(lit(
      "radiusJoin: id must be non-null and long-castable")))
      .otherwise(id.cast("long"))
    val pts = df.select(idG.as("id"), fin(x, "x").as("x"), fin(y, "y").as("y"))
      .withColumn("cx", floor(col("x") / radius).cast("long"))
      .withColumn("cy", floor(col("y") / radius).cast("long"))
      .localCheckpoint(true) // both sides of the self-join below
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val probe = pts.select(
      col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
      col("cx"), col("cy"))
      .withColumn("o", explode(array(offsets: _*)))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx") + col("o.dx")).as("jx"), (col("cy") + col("o.dy")).as("jy"))
    val build = pts.select(
      col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
      col("cx").as("jx"), col("cy").as("jy"))
    val dx = col("xa") - col("xb")
    val dy = col("ya") - col("yb")
    val dist2 = dx * dx + dy * dy
    probe.join(build, Seq("jx", "jy"))
      .filter(col("id_a") < col("id_b"))
      .filter(dist2 <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), dist2.as("dist2"))
  }
}
