package graft.sources

import graft.SparkSpec
import graft.core.Tables
import graft.core.io.{Reader, Writer}
import graft.core.model.{DatasetSpec, JobSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Real JDBC round-trip against the embedded Derby engine that ships on
  * Spark's classpath (the Hive metastore's store) — proves the generic
  * JDBC source/sink path (SURVEY S7-S10 / K6-K8) end-to-end without a
  * network database: full write, full read, range-pushdown incremental
  * read, and append-mode incremental write.
  */
class JdbcDerbySpec extends SparkSpec {

  System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")

  private val dbDir = Files.createTempDirectory("graft_derby").toString + "/db"
  private val url = s"jdbc:derby:$dbDir;create=true"
  private val driverOpt = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  // Derby maps Spark StringType to CLOB, which Derby cannot compare in a
  // WHERE clause — the incremental field must be declared VARCHAR.
  private val createTypes = Map(
    "createTableColumnTypes" -> "o_orderstatus VARCHAR(2), day VARCHAR(10)")

  private def orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))

  test("Writer jdbc sink + Reader jdbc source round-trip through Derby") {
    val src = orders
    val job = JobSpec(name = "push_orders",
      output = Some(DatasetSpec(format = "jdbc",
        saveOptions = Map("url" -> url, "dbtable" -> "ORDERS_T")
          ++ driverOpt ++ createTypes)))
    Writer.write(src, job, job.output.get, now = "r1")
    val back = Reader.read(spark, DatasetSpec(format = "jdbc",
      readOptions = Jdbc.fullTableOptions(url, "ORDERS_T", driverOpt)))
    assert(back.count() == src.count())
    val a = src.agg(sum("o_totalprice")).head().getDouble(0)
    val b = back.agg(sum("o_totalprice")).head().getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }

  test("incremental read pushes the period range into the database query") {
    Jdbc.write(orders, url, "ORDERS_INC", incremental = false,
      extra = driverOpt ++ createTypes)
    val lo = "1996-01-01"
    val hi = "1997-01-01"
    val inc = Jdbc.read(spark,
      Jdbc.incrementalOptions(url, "ORDERS_INC", "day", lo, hi, driverOpt))
    val expected = orders.filter(col("day") >= lo && col("day") < hi).count()
    assert(expected > 0, "test period must select rows")
    assert(inc.count() == expected)
    // the predicate really ran in the database: the relation's schema comes
    // from the pushed query, and every returned day is inside the range
    val days = inc.agg(min("day"), max("day")).head()
    assert(days.getString(0) >= lo && days.getString(1) < hi)
  }

  test("incremental write appends instead of overwriting") {
    val first = orders.filter(col("day") < "1998-01-01")
    val second = orders.filter(col("day") >= "1998-01-01")
    Jdbc.write(first, url, "ORDERS_APPEND", incremental = false,
      extra = driverOpt ++ createTypes)
    Jdbc.write(second, url, "ORDERS_APPEND", incremental = true,
      extra = driverOpt ++ createTypes)
    val back = Jdbc.read(spark, Jdbc.fullTableOptions(url, "ORDERS_APPEND", driverOpt))
    assert(back.count() == orders.count())
  }
}
