package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers graft's native Catalyst expressions as SQL functions so
  * they're reachable through the fully-public `call_function` API (and
  * from spark.sql). Idempotent — call before building a plan that
  * needs them. */
object Registry {
  def ensure(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk_vals", exprs =>
        TopKDistinctLongs(exprs(0),
          exprs(1).eval(null).asInstanceOf[Number].intValue())
          .toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_countmin", exprs =>
        CountMinLongs(exprs(0),
          exprs(1).eval(null).toString.split(",").map(_.trim.toLong).toSeq)
          .toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_sum", exprs =>
        VecSumDoubles(exprs(0)).toAggregateExpression(),
      "scala_udf")
    // Spark's own runtime-filter bloom pair, exposed by name: the
    // aggregate IS registered upstream (bloom_filter_agg) but the probe
    // side (might_contain) is not — registering both keeps the build
    // and the screen in native, codegen'd expressions instead of a
    // Scala UDF (see Dedup.bloomIncremental).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
          .toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain", exprs =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }
}
