package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef

/** Round-10 widening: the drift family's remaining monitor lanes —
  * streaming KS partials and PERSISTED per-group references (q197/q205
  * previously rescanned every reference slice on every tick).
  */
object QueriesRound10 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String,
                name: String) = graft.core.Tables.load(spark, dir, name)

  /** STREAMING KS drift ([[graft.streaming.Streams.ksDriftSink]] —
    * q204's lane for the distribution-free test): the current snapshot
    * replays through a file stream in three micro-batches, each
    * landing its mergeable distinct-value counts; the accumulated
    * partials score through [[graft.ops.Stats.ksFromPartials]] against
    * the stored reference and must be bit-identical to q189's batch
    * recompute — its oracle verbatim.
    */
  val q206 = QueryDef("q206_stream_ks_drift", (spark, dir) => {
    val out = graft.Queries.tmpDir("graft_q206")
    val li = t(spark, dir, "lineitem")
    val ref = li.filter(col("l_orderkey") % 2 === 0)
      .select(col("l_extendedprice").as("v"))
    graft.ops.Stats.writeKsReference(ref, "v", s"$out/ref")
    val cur = li.filter(col("l_orderkey") % 2 === 1)
      .select((col("l_extendedprice") * 1.02).as("v"),
        pmod(col("l_orderkey"), lit(3)).as("_chunk"))
    (0 until 3).foreach(i => cur.filter(col("_chunk") === i).drop("_chunk")
      .coalesce(1).write.mode("append").parquet(s"$out/feed"))
    val stream = spark.readStream.schema("v DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(s"$out/feed")
    val q = graft.streaming.Streams.ksDriftSink(stream, "v",
      s"$out/partials", s"$out/ckpt")
    try q.processAllAvailable() finally q.stop()
    graft.ops.Stats.ksFromPartials(spark, s"$out/ref",
      spark.read.parquet(s"$out/partials/batch*"), buckets = 64)
  }, QueriesRound8.q189.oracle)

  /** Per-group PSI through a PERSISTED reference
    * ([[graft.ops.Stats.writePsiReferenceByGroup]] /
    * [[graft.ops.Stats.psiByGroupFromReference]]): q197's slice matrix
    * with the reference slices profiled ONCE — the monitor tick reads
    * only the current side, and the current side itself arrives as TWO
    * independent feeds whose integer partials merge order-free. Output
    * must be bit-identical to q197's full recompute — its oracle
    * verbatim.
    */
  val q207 = QueryDef("q207_psi_by_group_reference", (spark, dir) => {
    val out = graft.Queries.tmpDir("graft_q207")
    val li = t(spark, dir, "lineitem")
    val ref = li.filter(col("l_orderkey") % 2 === 0)
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    graft.ops.Stats.writePsiReferenceByGroup(ref, "l_returnflag", "v",
      s"$out/ref", bins = 10)
    def feed(r: Int) = li.filter(col("l_orderkey") % 4 === r)
      .select(col("l_returnflag"),
        when(col("l_returnflag") === "R", col("l_extendedprice") * 1.1)
          .otherwise(col("l_extendedprice")).as("v"))
    val pa = graft.ops.Stats.psiByGroupCurrentPartial(spark, s"$out/ref",
      feed(1), "l_returnflag", "v")
    val pb = graft.ops.Stats.psiByGroupCurrentPartial(spark, s"$out/ref",
      feed(3), "l_returnflag", "v")
    graft.ops.Stats.psiByGroupFromPartials(spark, s"$out/ref",
        pa.unionByName(pb))
      .orderBy("group", "bucket")
  }, QueriesRound8.q197.oracle)

  /** Per-group exact KS through a PERSISTED reference
    * ([[graft.ops.Stats.writeKsReferenceByGroup]] /
    * [[graft.ops.Stats.ksByGroupFromReference]]): q205's slice matrix
    * with each slice's distinct-value counts stored once; the tick
    * contracts only the current side and must be bit-identical to
    * q205's full recompute — its oracle verbatim.
    */
  val q208 = QueryDef("q208_ks_by_group_reference", (spark, dir) => {
    val out = graft.Queries.tmpDir("graft_q208")
    val li = t(spark, dir, "lineitem")
    val ref = li.filter(col("l_orderkey") % 2 === 0)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    graft.ops.Stats.writeKsReferenceByGroup(ref, "g", "v", s"$out/ref")
    def feed(r: Int) = li.filter(col("l_orderkey") % 4 === r)
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice") * 1.02).as("v"))
    val pa = graft.ops.Stats.ksByGroupCurrentPartial(feed(1), "g", "v")
    val pb = graft.ops.Stats.ksByGroupCurrentPartial(feed(3), "g", "v")
    graft.ops.Stats.ksByGroupFromPartials(spark, s"$out/ref",
        pa.unionByName(pb), buckets = 16)
      .orderBy("group")
  }, QueriesRound9.q205.oracle)

  val all: Seq[QueryDef] = Seq(q206, q207, q208)
}
