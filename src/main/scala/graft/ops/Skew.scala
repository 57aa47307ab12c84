package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys.
  *
  * AQE's skew-join handling splits oversized *partitions* at runtime, but
  * only for sort-merge joins and only per-partition; a single hot key that
  * dwarfs everything else (one series receiving most samples, one shingle
  * shared by half the corpus) still lands on one task. Salting splits the
  * key itself: the large side gets a deterministic salt in [0, n), the
  * small side is replicated n ways, and the join key becomes (key, salt).
  *
  * Deterministic salt (hash of the whole row, not rand()) keeps results
  * reproducible and retry-safe — a respawned task salts identically.
  */
object Skew {

  /** Add a deterministic salt column in [0, n) derived from `from`. */
  def withSalt(df: DataFrame, n: Int, from: Seq[String], as: String = "__salt"): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    df.withColumn(as, pmod(xxhash64(from.map(col): _*), lit(n.toLong)).cast("int"))
  }

  /** Equi-join `big` with `small` on `key`, salting `big` n ways and
    * replicating `small` n times so one hot key spreads over n tasks.
    * Result equals `big.join(small, keys, joinType)` for inner/left joins. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      n: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      "salted join supports inner/left (right/outer would duplicate unmatched small rows)")
    val saltedBig = withSalt(big, n, big.columns.toSeq)
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-stage aggregation for skewed groupBy keys: aggregate on
    * (key, salt) first (spreading the hot key), then combine partials.
    * `partials` maps each output column to its (stage-1 agg, stage-2
    * combine) pair — e.g. sum/sum, count/sum, min/min. */
  def saltedAgg(df: DataFrame, keys: Seq[String], n: Int,
      partials: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = withSalt(df, n, df.columns.toSeq)
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (name, agg, _) => agg.as(name) }: _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(partials.head._3(col(partials.head._1)).as(partials.head._1),
        partials.tail.map { case (name, _, comb) => comb(col(name)).as(name) }: _*)
  }
}
