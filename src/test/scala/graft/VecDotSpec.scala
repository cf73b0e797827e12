package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

class VecDotSpec extends AnyFunSuite with SparkFixture {

  test("vec_dot computes the dot product and resolves from SQL") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    assert(df.select(VectorFunctions.vecDot(col("a"), col("b")))
      .head().getDouble(0) === 32.0)
    df.createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT vec_dot(a, b) FROM vecs").head().getDouble(0) === 32.0)
  }

  test("vec_dot agrees with the higher-order fold on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>").as("v"))
    val fold = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = emb.select(
      abs(VectorFunctions.vecDot(col("v"), col("v")) - fold).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(diff === 0.0) // identical summation order → bit-identical
  }

  test("sig_match_count counts agreeing positions, codegen and SQL paths") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 4L)))
      .toDF("a", "b")
    assert(df.select(VectorFunctions.sigMatchCount(col("a"), col("b")))
      .head().getInt(0) === 3)
    df.createOrReplaceTempView("sigs")
    assert(spark.sql("SELECT sig_match_count(a, b) FROM sigs")
      .head().getInt(0) === 3)
    // agrees with the interpreted HOF fold on real signatures
    val real = graft.llm.Dedup.minhashSigs(
      graft.llm.Dedup.shingleHashes(Tables.documents(spark, sfDir)))
      .select(col("sig").as("sa"), reverse(col("sig")).as("sb"))
    val fold = expr(
      """aggregate(zip_with(sa, sb, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
        |  0, (acc, v) -> acc + v)""".stripMargin)
    val mismatches = real.filter(
      VectorFunctions.sigMatchCount(col("sa"), col("sb")) =!= fold).count()
    assert(mismatches === 0)
    // null-safe like the built-ins
    val n = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
    assert(n.select(VectorFunctions.sigMatchCount(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("pack_longs round-trips through the binary match count") {
    import spark.implicits._
    val df = Seq(
      (Array(1L, -2L, Long.MaxValue, 0L), Array(1L, -2L, 7L, 0L)),
      (Array(5L, 5L), Array(5L, 6L)))
      .toDF("a", "b")
    val packed = df.select(
      VectorFunctions.sigMatchCount(col("a"), col("b")).as("arr"),
      VectorFunctions.sigMatchCountBin(
        VectorFunctions.packLongs(col("a")),
        VectorFunctions.packLongs(col("b"))).as("bin"))
    assert(packed.collect().forall(r => r.getInt(0) === r.getInt(1)))
    // equal arrays pack to byte-identical blobs (the dictionary property)
    val blobs = Seq((Array(3L, 4L), Array(3L, 4L))).toDF("a", "b")
      .select(VectorFunctions.packLongs(col("a")).as("pa"),
        VectorFunctions.packLongs(col("b")).as("pb"))
      .head()
    assert(java.util.Arrays.equals(
      blobs.getAs[Array[Byte]](0), blobs.getAs[Array[Byte]](1)))
  }

  test("native lsh_buckets equals the composed HOF formula on real embeddings") {
    import graft.llm.Ann
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // the pre-native composed form, verbatim
    val planes = array(Ann.hyperplanes(Ann.NumBands * Ann.BitsPerBand)
      .map(p => array(p.map(lit): _*)): _*)
    val composed = transform(sequence(lit(0), lit(Ann.NumBands - 1)), t =>
      aggregate(sequence(lit(0), lit(Ann.BitsPerBand - 1)),
        lit(0),
        (acc, b) => acc * 2 +
          when(Ann.dot(col("v"),
            element_at(planes, t * Ann.BitsPerBand + b + 1)) > 0, 1)
            .otherwise(0)))
    val mismatches = emb.select(
      Ann.lshBucketInts(col("v")).as("native"), composed.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches === 0)
  }

  test("centroid_argmax matches a driver-side argmax, ties to highest cell") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cents = Seq.fill(16)(Array.fill(8)(rnd.nextGaussian()))
    val flat = cents.flatten.toIndexedSeq
    val vecs = Seq.fill(200)(Array.fill(8)(rnd.nextGaussian()))
    val expected = vecs.map { v =>
      // same score + same >= tie-break (highest cell id wins) as the
      // composed array_max(struct(...)) form the expression replaced
      val scored = cents.zipWithIndex.map { case (c, j) =>
        (v.zip(c).map { case (a, b) => a * b }.sum -
          c.map(x => x * x).sum / 2.0, j)
      }
      scored.maxBy { case (s, j) => (s, j) }._2
    }
    val got = vecs.zipWithIndex.toDF("v", "i")
      .select(col("i"), VectorFunctions.centroidArgmax(col("v"), flat, 16).as("cid"))
      .orderBy("i").collect().map(_.getInt(1)).toSeq
    assert(got === expected)
    // identical centroids: the highest cell id must win (struct-max tie)
    val twin = Seq(Array(1.0, 0.0)).toDF("v")
      .select(VectorFunctions.centroidArgmax(col("v"),
        IndexedSeq(1.0, 0.0, 1.0, 0.0, 0.5, 0.5), 3))
    assert(twin.head().getInt(0) === 1)
    // null vector → null assignment
    val nul = Seq(Option.empty[Array[Double]]).toDF("v")
      .select(VectorFunctions.centroidArgmax(col("v"), IndexedSeq(1.0), 1))
    assert(nul.head().isNullAt(0))
  }

  test("vec_dot is null-safe and rejects wrong types") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(VectorFunctions.vecDot(col("a"), col("b")))
      .head().isNullAt(0))
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(VectorFunctions.vecDot(col("a"), col("b"))).head()
    }
    assert(err.getMessage.toLowerCase.contains("vec_dot") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
