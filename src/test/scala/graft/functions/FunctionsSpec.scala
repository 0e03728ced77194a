package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens lowercases and splits on single spaces") {
    val r = Seq("Hello World  x").toDF("t")
      .select(TextFunctions.tokens(col("t"))).head().getSeq[String](0)
    assert(r == Seq("hello", "world", "", "x"))
  }

  test("shingles builds distinct word n-grams, empty under n tokens") {
    val r = Seq("a b c d", "a b").toDF("t")
      .select(TextFunctions.shingles(col("t"), 3)).collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1).isEmpty)
  }

  test("fingerprint is md5 of normalized text") {
    val r = Seq("  The   QUICK fox ", "the quick fox").toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).collect().map(_.getString(0))
    assert(r(0) == r(1))
  }

  test("bowFingerprint is order-insensitive") {
    val r = Seq("b a c", "c b a", "c b b").toDF("t")
      .select(TextFunctions.bowFingerprint(col("t"))).collect().map(_.getString(0))
    assert(r(0) == r(1) && r(0) != r(2))
  }

  test("subwordCount splits letter runs, digit runs, single punct") {
    val r = Seq("abc12,de f").toDF("t")
      .select(TextFunctions.subwordCount(col("t"))).head().getInt(0)
    assert(r == 5) // abc | 12 | , | de | f
  }
}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot and cosine on known vectors") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f))).toDF("a", "b")
    val row = df.select(
      VectorFunctions.dot(col("a"), col("b")),
      VectorFunctions.cosine(col("a"), col("b")),
      VectorFunctions.l2sq(col("a"), col("b"))).head()
    assert(row.getDouble(0) == 2.0)
    assert(math.abs(row.getDouble(1) - 2.0 / (3.0 * 2.0)) < 1e-12)
    assert(row.getDouble(2) == 1.0 + 4.0 + 4.0)
  }

  test("cosine of zero vector is null") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine(col("a"), col("b"))).head().isNullAt(0))
  }
}
