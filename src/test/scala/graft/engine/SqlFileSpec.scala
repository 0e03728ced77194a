package graft.engine

import graft.SparkSpec

class SqlFileSpec extends SparkSpec {

  val sql =
    """----param---- 'min_n' : '2' ----
      |----param---- 'tbl' : 'v_{{min_n}}' ----
      |SELECT * FROM {{tbl}} WHERE n >= {{min_n}}""".stripMargin

  test("params parses header lines") {
    assert(SqlFile.params(sql) == Map("min_n" -> "2", "tbl" -> "v_{{min_n}}"))
  }

  test("body strips header lines") {
    assert(SqlFile.body(sql) == "SELECT * FROM {{tbl}} WHERE n >= {{min_n}}")
  }

  test("interpolation resolves recursively and leaves unknown keys") {
    val r = SqlFile.interpolate("{{a}}/{{missing}}", Map("a" -> "x{{b}}", "b" -> "y"))
    assert(r == "xy/{{missing}}")
  }

  test("interpolation terminates on cycles") {
    val r = SqlFile.interpolate("{{a}}", Map("a" -> "{{b}}", "b" -> "{{a}}"), maxDepth = 10)
    assert(r == "{{a}}" || r == "{{b}}") // bounded, no hang
  }

  test("run executes header-parameterized SQL over temp views") {
    import spark.implicits._
    Seq((1, "x"), (3, "y")).toDF("n", "s").createOrReplaceTempView("v_2")
    val out = SqlFile.run(spark, sql).collect()
    assert(out.map(_.getString(1)).toSeq == Seq("y"))
  }

  test("override beats header param") {
    import spark.implicits._
    Seq((1, "x"), (3, "y")).toDF("n", "s").createOrReplaceTempView("v_0")
    val out = SqlFile.run(spark, sql, Map("min_n" -> "0"))
    assert(out.count() == 2)
  }
}
