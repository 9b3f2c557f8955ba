package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Similarity}
import graft.ops.exprs.OpsExprs

/** Pins the native ops expressions (ByteHistCounts, LshBandKeys,
  * QuantizedDot) value- and null-identical to the HOF/translate
  * constructions they replaced — on the same inputs, including the edge
  * shapes the HOF null algebra produces (ragged vectors, null elements,
  * empty arrays). The end-to-end q17/q18/q26/q31 DuckDB oracles pin the
  * same semantics against a third engine. */
class OpsExprSpec extends SparkSuite {

  // the exact HOF forms the natives replaced (kept here as the reference)
  private def hofQuantizedDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast("double") * 1000).cast("long") * floor(y.cast("double") * 1000).cast("long")),
      lit(0L), (acc, x) => acc + x)

  private def hofSignedDot(qv: Column, signs: Array[Long]): Column =
    aggregate(zip_with(qv, typedlit(signs), (q, s) => q * s), lit(0L), (acc, x) => acc + x)

  private def hofBandKey(qv: Column, b: Int, w: Int, dims: Int): Column =
    (0 until w).map { j =>
      when(hofSignedDot(qv, Similarity.planeSigns(b * w + j, dims)) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("ByteHistCounts ≡ translate twin ≡ Scala decoder counts") {
    val s = spark
    import s.implicits._
    val r = rng(31L)
    val rows: Seq[(Long, Array[Byte])] = Seq(
      0L -> Array.empty[Byte],
      1L -> Array.tabulate(256)(_.toByte),
      2L -> "hello wbot — höhößü".getBytes("UTF-8")) ++
      (3L to 40L).map(i => i -> Array.fill(r.nextInt(400))(r.nextInt(256).toByte))
    val df = rows.toDF("id", "payload")
    val native = df
      .withColumn("__hist", OpsExprs.byteHistCounts(col("payload")))
      .select(col("id") +: (0 until 8).map(j => element_at(col("__hist"), j + 1).as(s"b$j")): _*)
      .collect().map(row => row.getLong(0) -> (1 to 8).map(row.getLong).toVector).toMap
    val twin = df
      .withColumn("__high", Multimodal.highNibbles(hex(col("payload"))))
      .select(col("id") +: (0 until 8).map(j =>
        Multimodal.byteHistCountCol("__high", j).as(s"b$j")): _*)
      .collect().map(row => row.getLong(0) -> (1 to 8).map(row.getLong).toVector).toMap
    rows.foreach { case (id, bytes) =>
      val cnt = new Array[Long](8)
      bytes.foreach(b => cnt((b & 0xff) >>> 5) += 1)
      assert(native(id) == cnt.toVector, s"native vs Scala, id=$id")
      assert(native(id) == twin(id), s"native vs translate twin, id=$id")
    }
  }

  test("LshBandKeys ≡ per-plane HOF band keys (q17 and q26 shapes)") {
    val s = spark
    import s.implicits._
    for ((bands, w, dims) <- Seq((6, 6, 64), (6, 4, 64), (3, 5, 16))) {
      val r = rng(1000L * bands + w)
      val vecs = (0L until 40L).map(i =>
        i -> Array.fill(dims)((r.nextDouble() * 2 - 1).toFloat))
      val df = vecs.toDF("id", "vec")
        .withColumn("__qv", Similarity.quantizedChecked("vec", dims))
      val native = df
        .select(col("id"), posexplode(OpsExprs.lshBandKeys(col("__qv"), bands, w, dims)))
        .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
        .collect().map(row => (row.getLong(0), row.getInt(1)) -> row.getLong(2)).toMap
      val hof = df
        .select(col("id") +: (0 until bands).map(b =>
          hofBandKey(col("__qv"), b, w, dims).as(s"k$b")): _*)
        .collect().flatMap(row =>
          (0 until bands).map(b => (row.getLong(0), b) -> row.getLong(1 + b))).toMap
      assert(native == hof, s"bands=$bands w=$w dims=$dims")
    }
  }

  test("SimhashTokenBits ≡ per-bit md5-substring construction") {
    val s = spark
    import s.implicits._
    val r = rng(99L)
    val toks = Seq("a", "wbot", "héllo", "ü—ß", "0", "#a", "x" * 50) ++
      (0 until 50).map(_ => r.alphanumeric.take(1 + r.nextInt(12)).mkString)
    val df = toks.toDF("tok")
    def refBit(i: Int): Column = {
      val src = if (i < 32) md5(concat(col("tok"), lit("#a")))
      else md5(concat(col("tok"), lit("#b")))
      substring(src, (i % 32) + 1, 1) >= "8"
    }
    val refBits = (0 until 64).map(i =>
      when(refBit(i), lit(1L << i)).otherwise(lit(0L))).reduce(_ bitwiseOR _)
    val got = df.select(col("tok"),
        graft.ops.exprs.OpsExprs.simhashTokenBits(col("tok")).as("native"),
        refBits.as("ref"))
      .collect()
    got.foreach(row =>
      assert(row.getLong(1) == row.getLong(2), s"tok=${row.getString(0)}"))
  }

  test("SimhashDocHex ≡ explode-tokens 64-vote groupBy construction") {
    val s = spark
    import s.implicits._
    val r = rng(77L)
    val words = Seq("wbot", "crawl", "héllo", "ß", "a", "xyz0", "—", "\tq", "\nz")
    val texts = Seq("", " ", "   ", "one", " lead", "trail ", "a  b", "\t", "\n \n") ++
      (0 until 40).map(_ =>
        (0 until (1 + r.nextInt(30))).map(_ => words(r.nextInt(words.length)))
          .mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // the previous construction, verbatim
    val toks = df.select(col("doc_id").as("id"), explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
      .withColumn("ma", md5(concat(col("tok"), lit("#a"))))
      .withColumn("mb", md5(concat(col("tok"), lit("#b"))))
    def bitAt(i: Int): Column = {
      val src = if (i < 32) col("ma") else col("mb")
      substring(src, (i % 32) + 1, 1) >= "8"
    }
    val votes = (0 until 64).map(i => sum(when(bitAt(i), 1).otherwise(-1)).as(s"v_$i"))
    val voted = toks.groupBy("id").agg(votes.head, votes.tail: _*)
    val nibbles = (0 until 16).map { j =>
      val d = (0 until 4).map(b =>
        s"(CASE WHEN v_${4 * j + b} > 0 THEN ${8 >> b} ELSE 0 END)").mkString(" + ")
      expr(s"substr('0123456789abcdef', ($d) + 1, 1)")
    }
    val ref = voted.select(col("id"), concat(nibbles: _*).as("simhash_hex"))
      .collect().map(row => row.getLong(0) -> row.getString(1)).toMap
    val got = graft.ops.Dedup.simhashMd5(df, "doc_id", "text")
      .collect().map(row => row.getLong(0) -> row.getString(1)).toMap
    assert(got == ref)
  }

  test("MinhashDocSigs ≡ explode-shingles groupBy-min construction") {
    val s = spark
    import s.implicits._
    val r = rng(55L)
    val alphabet = "abc defé—😀xyz"
    val texts = Seq("", "abcde", "abcdef", "ßßßßßß—😀😀😀", "a" * 200) ++
      (0 until 40).map(_ =>
        (0 until (r.nextInt(120))).map(_ => alphabet(r.nextInt(alphabet.length))).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for ((w, k) <- Seq((6, 4), (3, 2))) {
      // the previous construction, verbatim
      val sh = graft.ops.Dedup.charShingles(df, "doc_id", "text", w)
      val aggs = (0 until k).map(i =>
        min(md5(concat(col("shingle"), lit(s"#$i")))).as(s"sig_$i"))
      val ref = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
        .collect().map(row => row.getLong(0) -> (1 to k).map(row.getString).toVector).toMap
      val got = graft.ops.Dedup.minhashSignatures(df, "doc_id", "text", w, k)
        .collect().map(row => row.getLong(0) -> (1 to k).map(row.getString).toVector).toMap
      assert(got == ref, s"width=$w numHashes=$k")
    }
  }

  test("TokenSetCounts ≡ per-set filter-HOF marker counts") {
    val s = spark
    import s.implicits._
    val r = rng(42L)
    val sets = Seq(Seq("the", "and", "of", "is"), Seq("der", "die", "und", "ist"),
      Seq("le", "é—ß"))
    val vocab = sets.flatten ++ Seq("zzz", "", "thee", "a", "é—ß!")
    val texts = Seq("", " ", "the the the", " the  and ", "é—ß é—ß") ++
      (0 until 40).map(_ =>
        (0 until r.nextInt(25)).map(_ => vocab(r.nextInt(vocab.length))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = df.withColumn("__mc",
        graft.ops.exprs.OpsExprs.tokenSetCounts(col("text"), sets))
      .select(col("id") +: sets.indices.map(k =>
        element_at(col("__mc"), k + 1).as(s"c$k")): _*)
      .collect().map(row => row.getLong(0) -> (1 to sets.size).map(row.getLong).toVector).toMap
    val hof = df.select(col("id") +: sets.zipWithIndex.map { case (ws, k) =>
        size(filter(split(col("text"), " "), t => t.isin(ws: _*))).cast("long").as(s"c$k") }: _*)
      .collect().map(row => row.getLong(0) -> (1 to sets.size).map(row.getLong).toVector).toMap
    assert(native == hof)
  }

  test("QuantizedDot ≡ HOF form, including the null algebra") {
    val s = spark
    import s.implicits._
    val r = rng(7L)
    val dims = 64
    val pairs: Seq[(Long, Array[java.lang.Float], Array[java.lang.Float])] =
      (0L until 30L).map { i =>
        (i,
          Array.fill[java.lang.Float](dims)((r.nextDouble() * 2 - 1).toFloat),
          Array.fill[java.lang.Float](dims)((r.nextDouble() * 2 - 1).toFloat))
      } ++ Seq(
        (100L, Array.empty[java.lang.Float], Array.empty[java.lang.Float]), // both empty → 0
        (101L, Array.fill[java.lang.Float](3)(0.5f), Array.fill[java.lang.Float](5)(0.5f)), // ragged → null
        (102L, Array[java.lang.Float](0.5f, null, 0.25f), Array.fill[java.lang.Float](3)(1.0f))) // null elem → null
    val df = pairs.toDF("id", "a", "b")
    val got = df.select(col("id"),
        OpsExprs.quantizedDot(col("a"), col("b")).as("native"),
        hofQuantizedDot(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { row =>
      val n = if (row.isNullAt(1)) null else java.lang.Long.valueOf(row.getLong(1))
      val h = if (row.isNullAt(2)) null else java.lang.Long.valueOf(row.getLong(2))
      assert(n == h, s"id=${row.getLong(0)}: native=$n hof=$h")
    }
    // the documented edge shapes hold
    val byId = got.map(row => row.getLong(0) ->
      (if (row.isNullAt(1)) null else java.lang.Long.valueOf(row.getLong(1)))).toMap
    assert(byId(100L) == 0L)
    assert(byId(101L) == null)
    assert(byId(102L) == null)
  }
}
