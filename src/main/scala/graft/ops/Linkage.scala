package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969, "A Theory for
  * Record Linkage"): candidate record pairs from blocked comparison,
  * a per-field agreement vector, and the summed log-likelihood-ratio
  * match score — the multi-field generalization of
  * [[Dedup.fuzzyKeyPairs]]'s single-key entity resolution (that op
  * collapses to DISTINCT keys because one key IS the entity; here
  * records sharing a blocking key still differ on the other fields, so
  * scoring stays at record grain and the quadratic guard is the block
  * cap).
  *
  * Weights are pre-quantized on the DRIVER: each field's agree weight
  * `ln(m/u)` and disagree weight `ln((1-m)/(1-u))` become integer
  * micro-unit literals in the plan, so the pair score is an exact
  * integer sum — order-free, engine-replayable (the [[Dsir]]
  * convention), and the classify thresholds compare integers.
  *
  * The reference has no linkage machinery; this extends SURVEY §2's
  * dedup family where the entity has structure (CRM contacts, product
  * catalogs, author disambiguation).
  */
object Linkage {

  /** One comparison field: `m` = P(agree | same entity), `u` =
    * P(agree | different entities), `maxDist` = Levenshtein tolerance
    * on the dedup-normalized value (0 = exact match).
    */
  final case class LinkField(name: String, m: Double, u: Double,
                             maxDist: Int = 0) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1 for field $name (m=$m, u=$u)")
    require(maxDist >= 0, s"maxDist must be >= 0 for field $name")
    def agreeMicro: Long = math.round(math.log(m / u) * 1e6)
    def disagreeMicro: Long = math.round(math.log((1 - m) / (1 - u)) * 1e6)
  }

  /** Candidate pairs + agreement vector + score + decision.
    *
    * Blocking ([[Dedup.fuzzyKeyPairs]]'s scheme at record grain):
    * `(prefix(4), length-bucket)` of the normalized `blockCol`, each
    * record probing its own and the next length bucket, blocks above
    * `maxBlockSize` skipped deterministically (recall traded for a hard
    * quadratic bound — at 100 TB an unbounded block is an outage, a
    * skipped one is a measured recall note). One self-join on the block
    * key is the only corpus-sized shuffle; scoring is row-local column
    * arithmetic on the pairs.
    *
    * Output: `(a_id, b_id, agree_<field>... , score_micro, decision)`
    * with `a_id < b_id`; decision = `match` / `possible` / `non_match`
    * by `upperMicro`/`lowerMicro`.
    */
  def linkagePairs(df: DataFrame, idCol: String, blockCol: String,
                   fields: Seq[LinkField],
                   blockMaxDist: Int = 1,
                   upperMicro: Long, lowerMicro: Long,
                   maxBlockSize: Long = 10000L): DataFrame = {
    require(fields.nonEmpty, "linkagePairs needs at least one field")
    require(upperMicro >= lowerMicro, "upperMicro must be >= lowerMicro")
    val norm = (c: Column) => graft.functions.TextFunctions.normalize(c)
    val cols = (Seq(idCol, blockCol) ++ fields.map(_.name)).distinct
    // normalize every comparison field ONCE per record, BEFORE the
    // pairing blowup: the agree comparisons run at PAIR grain, and a
    // per-pair norm() is 2 x |fields| regex chains per candidate pair
    // (millions of regex executions for thousands of records). The
    // block key's normalization is reused when it is also a field.
    // Raw field values are dropped here too — only ids, block key
    // derivatives, and normalized fields cross the pairing shuffle.
    val base0 = df.select(cols.map(col): _*)
      .withColumn("_nk", norm(col(blockCol)))
      .withColumn("_pfx", substring(col("_nk"), 1, 4))
      .withColumn("_lb",
        (length(col("_nk")) / lit(blockMaxDist + 1)).cast("long"))
    val base = fields.foldLeft(base0) { (d, f) =>
      d.withColumn(s"_nf_${f.name}",
        if (f.name == blockCol) col("_nk") else norm(col(f.name)))
    }.select((Seq(idCol, "_pfx", "_lb").map(col) ++
      fields.map(f => col(s"_nf_${f.name}"))).distinct: _*)
    val sized = base.join(
      base.groupBy("_pfx", "_lb").agg(count(lit(1)).as("_bn")),
      Seq("_pfx", "_lb"))
      .filter(col("_bn") <= maxBlockSize)
      .drop("_bn")
    // round-robin the probe side BEFORE the pairing join: the record
    // table often arrives in a couple of parquet splits, and a broadcast
    // join inherits the streamed side's partitioning — the quadratic
    // pair generation plus the per-pair levenshtein scoring would run
    // ~2-way. Spreading probe ROWS spreads each block's pair work
    // evenly (measured 22 s -> ~5 s on the sf0.1 q182 bench; the
    // removed distinct used to do this by accident, at the price of
    // shuffling the full wide candidate set AFTER the blowup)
    val probes = sized
      .repartition(sized.sparkSession.sessionState.conf.numShufflePartitions)
      .withColumn("_plb", explode(array(col("_lb"), col("_lb") + 1)))
    val smaller = col(s"x.$idCol") < col(s"y.$idCol")
    def side(s: String, f: String, as: String) = col(s"$s.$f").as(as)
    val cand = probes.as("x")
      .join(sized.as("y"),
        col("x._pfx") === col("y._pfx") && col("x._plb") === col("y._lb") &&
          (col("x._lb") =!= col("y._lb") || smaller))
      .filter(col(s"x.$idCol") =!= col(s"y.$idCol"))
      .select(Seq(
        when(smaller, col(s"x.$idCol")).otherwise(col(s"y.$idCol")).as("a_id"),
        when(smaller, col(s"y.$idCol")).otherwise(col(s"x.$idCol")).as("b_id")) ++
        fields.flatMap(f => Seq(side("x", s"_nf_${f.name}", s"_xa_${f.name}"),
          side("y", s"_nf_${f.name}", s"_xb_${f.name}"))): _*)
    // no distinct: discovery is unique by construction (same-bucket pairs
    // only via the smaller id's own-bucket probe; cross-bucket pairs only
    // via the smaller BUCKET's next-probe) — a distinct here shuffled the
    // full wide candidate set for nothing (measured 7.8 s -> ~5 s at
    // sf0.1 on q182)
    val withAgree = fields.foldLeft(cand) { (d, f) =>
      val a = col(s"_xa_${f.name}") // normalized per record above
      val b = col(s"_xb_${f.name}")
      // threshold-bounded levenshtein (banded DP, O(len x maxDist)
      // instead of O(len^2) per pair; returns -1 past the bound) —
      // `>= 0` is exactly `distance <= maxDist`, null stays null
      val agree =
        if (f.maxDist == 0) a === b
        else levenshtein(a, b, f.maxDist) >= 0
      d.withColumn(s"agree_${f.name}", coalesce(agree, lit(false)))
    }
    val score = fields.map(f =>
      when(col(s"agree_${f.name}"), lit(f.agreeMicro))
        .otherwise(lit(f.disagreeMicro))).reduce(_ + _)
    withAgree
      .withColumn("score_micro", score)
      .withColumn("decision",
        when(col("score_micro") >= upperMicro, "match")
          .when(col("score_micro") <= lowerMicro, "non_match")
          .otherwise("possible"))
      .select(Seq(col("a_id"), col("b_id")) ++
        fields.map(f => col(s"agree_${f.name}")) ++
        Seq(col("score_micro"), col("decision")): _*)
  }
}
