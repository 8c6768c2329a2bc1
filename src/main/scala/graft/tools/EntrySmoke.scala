package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke: drives SparkEntry.entry exactly as the driver does
  * (rows > 0 on sf0.001) and prints the rows + the physical plan. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.explain("formatted")
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry() returned 0 rows")
    spark.stop()
  }
}
