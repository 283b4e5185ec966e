package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class VectorExprsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): Option[Double] = {
    val r = df.head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("dot/l2sq/cosine match the fold semantics on double arrays") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(one(df.select(Similarity.dot(col("a"), col("b")))) === Some(32.0))
    assert(one(df.select(Similarity.l2sq(col("a"), col("b")))) === Some(27.0))
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(one(df.select(Similarity.cosine(col("a"), col("b")))) === Some(expected))
  }

  test("float arrays widen per element like cast-then-fold") {
    val df = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
    assert(one(df.select(Similarity.dot(col("a"), col("b")))) === Some(13.0))
    // mixed float/double sides
    val dfm = df.withColumn("bd", transform(col("b"), x => x.cast("double")))
    assert(one(dfm.select(Similarity.dot(col("a"), col("bd")))) === Some(13.0))
  }

  test("length mismatch and null elements yield NULL (zip_with parity)") {
    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(one(mismatch.select(Similarity.dot(col("a"), col("b")))) === None)
    val withNull = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
    assert(one(withNull.select(Similarity.dot(col("a"), col("b")))) === None)
    val nullSide = mismatch.select(lit(null).cast("array<double>").as("a"),
      col("b"))
    assert(one(nullSide.select(Similarity.cosine(col("a"), col("b")))) === None)
  }

  test("empty arrays give the fold seed (0.0 dot)") {
    val df = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    assert(one(df.select(Similarity.dot(col("a"), col("b")))) === Some(0.0))
  }

  test("vector kernels run inside WholeStageCodegen, not interpreted") {
    // spark.range (not a local Seq) so the projection isn't
    // constant-folded into a LocalTableScan before planning
    val df = spark.range(2).select(
      array(col("id").cast("double") + 1.0, lit(0.0)).as("a"),
      array(lit(0.5), lit(0.5)).as("b"))
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    df.collect() // finalize plan so codegen spans are visible
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("vec_cosine")).get
    // '*(n)' prefix = inside a WholeStageCodegen span
    assert(line.trim.matches("""^\+?-?\s*\*\(\d+\).*"""), plan)
  }

  test("integral element arrays (quantized embeddings) widen per element") {
    val df = Seq((Seq(1, 2, 3), Seq(4L, 5L, 6L))).toDF("ia", "la")
    val r = df.select(
      Similarity.dot(col("ia"), col("la")).as("d"),
      Similarity.l2sq(col("ia"), col("la")).as("l"),
      Similarity.cosine(col("ia"), col("ia")).as("c")).head()
    assert(r.getDouble(0) === 32.0) // 4 + 10 + 18
    assert(r.getDouble(1) === 27.0) // 9 + 9 + 9
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("unsupported element types fail at analysis time, not mid-job") {
    val df = Seq((Seq("a"), Seq("b"))).toDF("x", "y")
    val e = intercept[Exception] {
      df.select(Similarity.dot(col("x"), col("y"))).collect()
    }
    assert(e.getMessage.contains("vec_dot") ||
      e.getMessage.toLowerCase.contains("data type mismatch"), e.getMessage)
  }

  test("simhash32 rejects non-array<long> input at analysis time") {
    // ArrayData.getLong on an int-packed array would read garbage bytes;
    // the type check must catch it before any task runs
    val df = Seq(Tuple1(Seq(1, 2, 3))).toDF("ints")
    val e = intercept[Exception] {
      df.select(graft.functions.TextFunctions.simhash32(col("ints"))).collect()
    }
    assert(e.getMessage.contains("simhash32") ||
      e.getMessage.toLowerCase.contains("data type mismatch"), e.getMessage)
    // and the valid type still works
    val ok = Seq(Tuple1(Seq(0xFFFFFFFFL))).toDF("hs")
      .select(graft.functions.TextFunctions.simhash32(col("hs"))).head().getLong(0)
    assert(ok === 0xFFFFFFFFL)
  }

  test("minhash_sig runs inside WholeStageCodegen and matches the HOF fold") {
    import graft.functions.TextFunctions._
    val df = spark.range(3).select(
      array(col("id") + 1, col("id") + 2, col("id") * 1000 + 7).as("hs"))
      .select(col("hs"), minhashSignature(col("hs")).as("sig"))
    val rows = df.collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      val sig = r.getSeq[Long](1)
      val expect = MinhashA.indices.map(j =>
        hs.map(x => (x * MinhashA(j) + MinhashB(j)) % HashMod).min)
      assert(sig === expect)
    }
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("minhash_sig")).get
    assert(line.trim.matches("""^\+?-?\s*\*\(\d+\).*"""), plan)
    // empty / null input → null signature
    val empty = spark.range(1)
      .select(minhashSignature(array().cast("array<long>")).as("s")).head()
    assert(empty.isNullAt(0))
  }

  test("lshBucket on the native dot matches the round-2 HOF buckets") {
    val planes = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq((1L, Seq(5.0, 3.0)), (2L, Seq(-5.0, -3.0)), (3L, Seq(0.1, -9.0)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.lshBucket(col("embedding"), planes).as("b"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
  }
}
