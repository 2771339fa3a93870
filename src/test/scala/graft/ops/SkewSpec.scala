package graft.ops

import graft.kg.EntityLink
import graft.pipeline.{Mention, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-stress fixtures (SURVEY.md M6): one pathologically hot entity and one
  * pathologically long conversation must not break correctness or blow a
  * single task.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted count equals plain count under a hot key") {
    val df = spark.range(100000)
      .select(when($"id" % 2 === 0, lit("HOT")).otherwise(concat(lit("k"), $"id" % 100)).as("k"))
    val plain = df.groupBy($"k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, Seq("k")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain("HOT") == 50000)
  }

  test("salted join equals plain join under a hot key") {
    val left = spark.range(50000)
      .select(when($"id" % 2 === 0, lit(0L)).otherwise($"id" % 50).as("k"), $"id".as("v"))
    val right = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, "k").agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    val salted = Skew.saltedJoin(left, right, "k").agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    assert(salted == plain)
  }

  test("entity linking survives a hot entity (50% of mentions) with capped buckets") {
    // 20k mentions of one surface + a tail of distinct surfaces
    val hot = (0 until 20000).map(i => Mention(s"c$i", 0, 0, "ORGANIZATION", 0, 9, "Acme Corp"))
    val tail = (0 until 2000).map(i => Mention(s"c$i", 1, 0, "ORGANIZATION", 0, 5, s"Org${i % 500}"))
    val linked = EntityLink.link((hot ++ tail).toDS())
    val byAcme = linked.where($"surface" === "Acme Corp").collect()
    assert(byAcme.length == 1)
    assert(byAcme.head.getAs[Long]("n_mentions") == 20000)
    // hot surface collapses to ONE vocabulary row before any pairwise work —
    // the mention-count skew never reaches the join
    assert(linked.count() == 501)
  }

  test("a pathologically long conversation tags without blowup (per-turn docs)") {
    val turns = (0 until 1000).map { t =>
      graft.pipeline.Turn("bigconv", t, "user", "Alice Johnson works at Acme Corp. in Berlin .", null,
        new java.sql.Timestamp(1700000000000L + t))
    }
    val model = graft.ner.NerModels.default(spark)
    val mentions = graft.ner.Tagger.mentions(turns.toDS(), model)
    assert(mentions.count() == 3000) // 3 mentions per turn
  }
}
