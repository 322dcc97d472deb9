package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Storage-format breadth: the engine reads/writes parquet (primary),
  * ORC, JSON, and CSV with identical results — format choice is a sink
  * option, not a code path.
  */
class FormatsSpec extends SparkSpec {

  test("orders round-trips identically through parquet, orc, json, csv") {
    val dir = java.nio.file.Files.createTempDirectory("formats").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
    // (timestamps serialized as strings so CSV/JSON round-trip losslessly)
    val schema = orders.schema
    def checksum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(sum(col("h").cast("decimal(38,0)"))) // long sum overflows (ANSI)
        .collect()(0).getDecimal(0)
    val expected = checksum(orders)
    assert(expected.signum != 0)

    orders.write.mode("overwrite").parquet(s"$dir/p")
    orders.write.mode("overwrite").orc(s"$dir/o")
    orders.write.mode("overwrite").json(s"$dir/j")
    orders.write.mode("overwrite").option("header", "true").csv(s"$dir/c")

    assert(checksum(spark.read.schema(schema).parquet(s"$dir/p")) == expected)
    assert(checksum(spark.read.schema(schema).orc(s"$dir/o")) == expected)
    assert(checksum(spark.read.schema(schema).json(s"$dir/j")) == expected)
    assert(checksum(spark.read.schema(schema).option("header", "true").csv(s"$dir/c")) == expected)
  }
}
