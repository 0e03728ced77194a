package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Linkage.linkagePairs]] — Fellegi-Sunter scoring on planted pairs
  * where every weight and decision is hand-checkable.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val name = Linkage.LinkField("name", m = 0.9, u = 0.1, maxDist = 1)
  private val brand = Linkage.LinkField("brand", m = 0.95, u = 0.2)

  test("agreement vector, integer weight sum, and decisions are exact") {
    // ln(0.9/0.1)=2.197225 -> 2197225; ln(0.1/0.9) -> -2197225
    // ln(0.95/0.2)=1.558145 -> 1558145; ln(0.05/0.8) -> -2772589
    assert(name.agreeMicro === 2197225L && name.disagreeMicro === -2197225L)
    assert(brand.agreeMicro === 1558145L && brand.disagreeMicro === -2772589L)
    val df = Seq(
      (1L, "golden lamp", "BrandA"),
      (2L, "golden lampx", "BrandA"), // name within dist 1, brand agrees
      (3L, "golden chair", "BrandB"), // name disagrees, brand disagrees
      (4L, "golden lamp", "BrandC")   // exact name, brand disagrees
    ).toDF("id", "name", "brand")
    val out = Linkage.linkagePairs(df, "id", "name",
        Seq(name, brand), blockMaxDist = 1,
        upperMicro = 3000000L, lowerMicro = 0L)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        ((r.getAs[Boolean]("agree_name"), r.getAs[Boolean]("agree_brand"),
          r.getAs[Long]("score_micro"), r.getAs[String]("decision")))).toMap
    assert(out((1L, 2L)) === ((true, true, 2197225L + 1558145L, "match")))
    assert(out((1L, 4L)) === ((true, false, 2197225L - 2772589L, "non_match")))
    // 1 vs 3: same "gold" prefix block, both fields disagree
    assert(out((1L, 3L))._4 === "non_match")
    // possible band: name agrees only -> between thresholds
    val mid = Linkage.linkagePairs(df, "id", "name",
        Seq(name, brand), blockMaxDist = 1,
        upperMicro = 3000000L, lowerMicro = -3000000L)
      .filter(col("a_id") === 1 && col("b_id") === 4).head()
    assert(mid.getAs[String]("decision") === "possible")
  }

  test("blocking: different prefixes never pair; null fields disagree") {
    val df = Seq(
      (1L, "alpha one", "X"),
      (2L, "omega one", "X"),                      // different block
      (3L, "alpha one", null.asInstanceOf[String]) // null field
    ).toDF("id", "name", "brand")
    val out = Linkage.linkagePairs(df, "id", "name",
        Seq(name, brand), blockMaxDist = 1,
        upperMicro = 3000000L, lowerMicro = 0L)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 3L)))
    assert(!out.head.getAs[Boolean]("agree_brand"),
      "a null comparison field must count as disagreement, not null-out the score")
  }
}
