import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object XxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val toks = Seq("key","agg","row","scan","slow","fast","table","value",
      "part","hash","a","the","line","sort","window","merge","batch","spark",
      "order","data","column","join","small","customer","query","big",
      "stream","group","filter", "x", "abcdefgh", "abcd", "abcde", "ab", "")
    toks.toDF("t").select(col("t"), xxhash64(col("t")).as("h"))
      .collect().foreach(r => println(s"XX|${r.getString(0)}|${r.getLong(1)}"))
    spark.stop()
  }
}
