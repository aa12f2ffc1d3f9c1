package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-side registration for graft's custom expressions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works alongside the
  * Column API (DotProduct.dot).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => {
        require(exprs.length == 2, "dot_product(arrayA, arrayB) takes 2 arguments")
        DotProduct(exprs(0), exprs(1))
      },
      "scala_udf")
  }
}
