package graft.tmpprof
import org.apache.spark.sql.SparkSession
import graft.pipeline.{ExtractJob, PageRow}
import jdk.jfr.{Recording, Configuration}
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pages = spark.read.parquet("target/bench_corpus_80000").as[PageRow]
    ExtractJob.extract(pages, 32).toDF().count()
    val rec = new Recording(Configuration.getConfiguration("profile"))
    rec.start()
    ExtractJob.extract(pages, 32).toDF().count()
    ExtractJob.extract(pages, 32).toDF().count()
    rec.stop()
    rec.dump(java.nio.file.Paths.get("/tmp/extract5.jfr"))
    println("JFR dumped")
    spark.stop()
  }
}
