package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef
import graft.core.Tables

/** Round-7 curation/maintenance additions: targeted deletion (GDPR-style
  * file-pruned rewrite), cross-source corpus overlap (exact + KMV
  * estimate on one card), CCNet-style perplexity bucketing, and weighted
  * priority sampling.
  */
object QueriesCurate {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.load(spark, dir, name)

  /** Targeted delete round-trip (the GDPR maintenance op): orders is laid
    * out range-partitioned, every order of customers with
    * `o_custkey % 19 = 0` is deleted via [[graft.core.io.Maintenance
    * .deleteMatching]] (file-pruned rewrite — see DeleteSpec for the
    * untouched-file identity assertions), and the surviving dataset is
    * aggregated. The oracle applies the same predicate declaratively, so
    * any row lost or kept wrongly by the swap protocol breaks the hash.
    */
  val q124 = QueryDef("q124_targeted_delete", (spark, dir) => {
    val out = Queries.tmpDir("graft_q124")
    val ds = s"$out/orders_ds"
    val orders = t(spark, dir, "orders")
    orders.repartitionByRange(8, col("o_orderkey"))
      .write.mode("overwrite").parquet(ds)
    val ids = orders.filter(col("o_custkey") % 19 === 0).select("o_orderkey")
    graft.core.io.Maintenance.deleteMatching(spark, ds, "o_orderkey", ids)
    spark.read.parquet(ds)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }, Some(
    """SELECT o_orderstatus, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_custkey % 19 <> 0
      |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin))

  val all: Seq[QueryDef] = Seq(q124)
}
