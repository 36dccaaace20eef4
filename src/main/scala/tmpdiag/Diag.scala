import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Fns._
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val base = graft.Tables.documentsPar(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val plants = base.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 3, lit(1))).as("toks"))
    val docs = base.unionByName(plants)
    val hashes = docs.select(col("doc_id"), explode(col("toks")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val voteAggs = (0 until 64).map(j => sum(simhashVote(col("h"), j)).as(s"b$j"))
    val sigs = hashes.groupBy(col("doc_id"))
      .agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("doc_id"), simhashFromVotes(j => col(s"b$j")).as("sig"))
    val a = sigs.where(col("doc_id") < 1000000L).withColumnRenamed("sig","sig_a")
    val b = sigs.where(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("doc_id"), col("sig").as("sig_b"))
    val j = a.join(b, "doc_id")
      .select(col("doc_id"), hamming64(col("sig_a"), col("sig_b")).as("ham"),
        (0 until 4).map(c => (shiftrightunsigned(col("sig_a"), c*16).bitwiseAND(lit(0xFFFFL)) ===
          shiftrightunsigned(col("sig_b"), c*16).bitwiseAND(lit(0xFFFFL))).cast("int")).reduce(_+_).as("chunks_match"),
        (0 until 4).map(c => (shiftrightunsigned(col("sig_a"), c*16+8).bitwiseAND(lit(0xFFFFL)).bitwiseOR(when(lit(c)===3, shiftleft(col("sig_a").bitwiseAND(lit(0xFFL)), 8)).otherwise(lit(0L))) ===
          shiftrightunsigned(col("sig_b"), c*16+8).bitwiseAND(lit(0xFFFFL)).bitwiseOR(when(lit(c)===3, shiftleft(col("sig_b").bitwiseAND(lit(0xFFL)), 8)).otherwise(lit(0L)))).cast("int")).reduce(_+_).as("rot_match"))
    val rows = j.collect()
    println("[diag] total plants: " + rows.length)
    println("[diag] ham histogram: " + rows.groupBy(x => x.getAs[Number](1).longValue).map{case(k,v)=>(k,v.length)}.toSeq.sortBy(_._1).mkString(", "))
    println("[diag] ham<=8 & no chunk match: " + rows.count(r => r.getAs[Number](1).longValue <= 8 && r.getAs[Number](2).intValue == 0))
    println("[diag] ham<=8 & no match in EITHER table: " + rows.count(r => r.getAs[Number](1).longValue <= 8 && r.getAs[Number](2).intValue == 0 && r.getAs[Number](3).intValue == 0))
    println("[diag] ham>8: " + rows.count(x => x.getAs[Number](1).longValue > 8))
    spark.stop()
  }
}
