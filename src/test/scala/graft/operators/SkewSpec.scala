package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin == plain join on a 90%-hot-key distribution") {
    val big = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)).as("k"),
        col("id").as("payload"))
    val small = Seq((7L, "hot"), (0L, "a"), (10L, "b"), (20L, "c"))
      .toDF("sk", "label")
    val plain = big.join(small, big("k") === small("sk")).select("k", "payload", "label")
    val salted = Skew.saltedJoin(big, small, "k", "sk", buckets = 8)
      .select("k", "payload", "label")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("saltedSum == plain groupBy sum") {
    val df = spark.range(5000)
      .select((col("id") % 3).as("k"), (col("id") % 97).cast("double").as("v"))
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"), count("*").as("cnt"))
      .orderBy("k").collect()
    val salted = Skew.saltedSum(df, Seq("k"), "v", buckets = 16)
      .orderBy("k").collect()
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getLong(0) == s.getLong(0))
      assert(math.abs(p.getDouble(1) - s.getDouble(1)) < 1e-6)
      assert(p.getLong(2) == s.getLong(2))
    }
  }
}
