package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object R21F21 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val d = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, d)
    println("R21F21 nvec=" + emb.count())
    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val n = f
      println(f"R21F21 $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.3f s rows=$n")
    }
    time("edges") { Similarity.exactCosineEdges(spark, emb, 0.35).count() }
    time("full_cc") { Similarity.semanticClusters(spark, emb, 0.35).count() }
    spark.stop()
  }
}
