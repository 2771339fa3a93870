package graft.functions

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("graft_shape / graft_fnv64 native expressions: SQL, Column API, codegen") {
    GraftFunctions.register(spark)
    val words = Seq("Alice", "ALICE", "the", "U.S.", "3.5", "iPhone", "").toDF("w")
    words.createOrReplaceTempView("words_t")
    // SQL surface
    val sql = spark.sql("SELECT w, graft_shape(w) AS s, graft_fnv64(w) AS h FROM words_t").collect()
    for (r <- sql) {
      assert(r.getString(1) == graft.text.WordShape.dan2NoLC(r.getString(0)))
      assert(r.getLong(2) == graft.ops.Hashing.fnv1a64(r.getString(0)))
    }
    // Column API surface
    val viaCol = words.select(GraftFunctions.graft_shape($"w")).as[String].collect()
    assert(viaCol.toSet == sql.map(_.getString(1)).toSet)
    // nulls propagate
    val n = Seq[(Integer, String)]((1, null)).toDF("i", "w")
      .select(GraftFunctions.graft_shape($"w")).collect()
    assert(n.head.isNullAt(0))
    // stays inside whole-stage codegen (no fallback): over a parquet scan the
    // expression must sit inside a codegen'd ("*(n)") Project stage (a local
    // relation would be constant-folded away)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(GraftFunctions.graft_fnv64($"text").as("h"), GraftFunctions.graft_shape($"source").as("s"))
    docs.collect()
    val plan = docs.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen stage, got:\n$plan")
    assert(!plan.toLowerCase.contains("fallback"), plan)
  }
}
