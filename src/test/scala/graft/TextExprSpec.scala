package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.expr.TextExprs

/** Equivalence of the native codegen text expressions with the
  * built-in HOF formulations they replace, on arbitrary strings
  * (ScalaCheck) and on the real documents table; plus codegen and SQL
  * registration checks.
  */
class TextExprSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // the HOF formulations the expressions must match exactly
  private def hofTokenCount = size(filter(split(lower(col("s")), "\\s+"),
    t => t =!= lit("")))
  private def hofSubwordCount = size(filter(split(lower(col("s")), "[^a-z0-9]+"),
    t => t =!= lit("")))
  private def hofRollingHash = aggregate(
    transform(filter(split(col("s"), ""), c => c =!= lit("")),
      c => ascii(c).cast("long")),
    lit(0L), (h, c) => pmod(h * 31 + c, lit(1000000007L)))

  // seeded pseudo-random corpus: whitespace runs, punctuation, casing,
  // empty strings, edge shapes
  private val randomStrings: Seq[String] = {
    val rnd = new scala.util.Random(7)
    val chars = "abcXYZ019 .,-_!@\t\n\r  "
    Seq("", " ", "\t\n", "a", "  a  ", "a b", "..,,!!") ++
      (1 to 300).map { _ =>
        val len = rnd.nextInt(60)
        (1 to len).map(_ => chars(rnd.nextInt(chars.length))).mkString
      }
  }

  test("token/subword/rolling expressions equal HOF formulations (property)") {
    val df = randomStrings.toDF("s").select(
      col("s"),
      hofTokenCount.as("h_tok"), TextExprs.token_count(col("s")).as("e_tok"),
      hofSubwordCount.as("h_sub"), TextExprs.subword_count(col("s")).as("e_sub"),
      hofRollingHash.as("h_fp"), TextExprs.rolling_hash(col("s")).as("e_fp"))
    df.collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"token_count on ${r.getString(0)}")
      assert(r.getInt(3) == r.getInt(4), s"subword_count on ${r.getString(0)}")
      assert(r.getLong(5) == r.getLong(6), s"rolling_hash on ${r.getString(0)}")
    }
  }

  test("expressions equal HOFs on the whole sf0.001 documents table") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumnRenamed("text", "s")
    val bad = docs.select(
      hofTokenCount.as("h_tok"), TextExprs.token_count(col("s")).as("e_tok"),
      hofRollingHash.as("h_fp"), TextExprs.rolling_hash(col("s")).as("e_fp"))
      .filter(col("h_tok") =!= col("e_tok") || col("h_fp") =!= col("e_fp"))
    assert(bad.count() == 0)
  }

  test("simhash64 expression equals the HOF formulation (random + real docs)") {
    import graft.operators.Dedup
    val rand = randomStrings.toDF("text")
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
    for (df <- Seq(rand, real)) {
      val bad = df.select(Dedup.simhashHof(col("text")).as("h"),
          TextExprs.simhash64(col("text")).as("e"))
        .filter(not(col("h") <=> col("e")))
      assert(bad.count() == 0)
    }
  }

  test("minhash_sig expression equals the HOF formulation") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
    val bad = docs.select(
        Dedup.minhashSignature(Dedup.shingleHashes(col("sh")), 64).as("h"),
        TextExprs.minhash_sig(col("sh"), 64).as("e"))
      .filter(not(col("h") <=> col("e")))
    assert(bad.count() == 0)
    // empty shingle array → k nulls, matching array_min([]) = NULL
    val empty = Seq(Seq.empty[String]).toDF("sh")
      .select(TextExprs.minhash_sig(col("sh"), 4).as("e"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("sh")), 4).as("h"))
      .collect().head
    assert(empty.getSeq[Any](0) == empty.getSeq[Any](1))
  }

  test("hash_set expression equals the HOF formulation") {
    import graft.operators.Dedup
    // column-level md5-64 twin: the two 32-bit hex halves recombined,
    // exactly PortableHash.md5_64's (word32(d,0) << 32) | word32(d,1)
    def md5_64(s: org.apache.spark.sql.Column) =
      shiftleft(conv(substring(md5(s), 1, 8), 16, 10).cast("long"), 32)
        .bitwiseOR(conv(substring(md5(s), 9, 8), 16, 10).cast("long"))
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(Dedup.shingles(col("text"), 2).as("sh"))
      .unionAll(Seq(Seq.empty[String], Seq("a"), Seq("a", "a", "b"))
        .toDF("sh"))
    val bad = docs.select(
        array_sort(array_distinct(transform(col("sh"), s => md5_64(s)))).as("h"),
        TextExprs.hash_set(col("sh")).as("e"))
      .filter(not(col("h") <=> col("e")))
    assert(bad.count() == 0)
  }

  test("sorted_intersect_count expression equals size(array_intersect)") {
    import graft.operators.Dedup
    val sets = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        TextExprs.hash_set(Dedup.shingles(col("text"), 2)).as("hs"))
    val pairs = sets.as("a").join(sets.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          pmod(col("a.doc_id") + col("b.doc_id"), lit(7L)) === 0)
      .select(col("a.hs").as("x"), col("b.hs").as("y"))
      .unionAll(Seq((Seq.empty[Long], Seq(1L, 2L)),
        (Seq(1L, 2L, 3L), Seq(2L, 3L, 9L)),
        (Seq.empty[Long], Seq.empty[Long])).toDF("x", "y"))
    val bad = pairs.select(
        size(array_intersect(col("x"), col("y"))).as("h"),
        TextExprs.sorted_intersect_count(col("x"), col("y")).as("e"))
      .filter(not(col("h") <=> col("e")))
    assert(bad.count() == 0)
  }

  test("word_shingles expression equals the HOF formulation (random + real)") {
    import graft.operators.Dedup
    // the HOF formulation is only total on inputs with >= n tokens:
    // under ANSI mode (Spark 4 default) its element_at past the array
    // end THROWS. The native expression is total; compare where both
    // are defined.
    val rand = randomStrings.toDF("text")
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
    for (df <- Seq(rand, real); n <- Seq(2, 3)) {
      val bad = df.filter(TextExprs.token_count(col("text")) >= n)
        .select(Dedup.shinglesHof(col("text"), n).as("h"),
          TextExprs.word_shingles(col("text"), n).as("e"))
        .filter(not(col("h") <=> col("e")))
      assert(bad.count() == 0, s"n=$n")
    }
  }

  test("word_shingles declared semantics on short inputs (HOF throws under ANSI)") {
    val r = Seq("", "   ", "one", "one two").toDF("text")
      .select(TextExprs.word_shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0).toList)
    assert(r.toList == List(List(""), List(""), List("one"), List("one two")))
  }

  test("top_ngram_frac equals the relational mode formulation (random + real)") {
    // executable spec: explode n-grams, group, max-count / total — the
    // same shape the DuckDB oracle runs in qX_repetition
    def relational(df: org.apache.spark.sql.DataFrame, n: Int): Map[Long, Double] = {
      val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= lit(""))
      val grams = df.select(col("id"), toks.as("t"))
        .select(col("id"), explode(
          filter(transform(col("t"), (_, i) => slice(col("t"), i + 1, lit(n))),
            a => size(a) === n).cast("array<array<string>>")).as("g"))
        .select(col("id"), concat_ws(" ", col("g")).as("g"))
      grams.groupBy("id", "g").count()
        .groupBy("id").agg((max("count") / sum("count")).as("f"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"), col("text"))
      .unionAll(randomStrings.zipWithIndex
        .map { case (s, i) => (100000L + i, s) }.toDF("id", "text"))
    for (n <- Seq(2, 3)) {
      val want = relational(docs, n) // ids with <n tokens absent → 0.0
      val got = docs.select(col("id"),
          TextExprs.top_ngram_frac(col("text"), n).as("f"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      got.foreach { case (id, f) =>
        assert(math.abs(f - want.getOrElse(id, 0.0)) < 1e-12,
          s"top_${n}gram_frac on id=$id: got $f want ${want.getOrElse(id, 0.0)}")
      }
    }
  }

  test("top_ngram_frac edge semantics: short inputs and exact repetition") {
    val r = Seq("", "one", "one two", "a a a a", "x y x y x")
      .toDF("text")
      .select(TextExprs.top_ngram_frac(col("text"), 2).as("f"))
      .collect().map(_.getDouble(0)).toList
    // "" and "one": no bigrams → 0.0; "a a a a": "a a" 3/3 = 1.0;
    // "x y x y x": "x y" 2/4, "y x" 2/4 → 0.5
    assert(r == List(0.0, 0.0, 1.0, 1.0, 0.5), r)
  }

  test("word_pairs expression equals the HOF pair extraction (random + real)") {
    val rand = randomStrings.toDF("text")
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
    for (df <- Seq(rand, real); w <- Seq(1, 3)) {
      // HOF only total on >= 2 tokens (negative sequence otherwise)
      val hof = df.filter(TextExprs.token_count(col("text")) >= 2)
        .select(explode(graft.operators.TextAnalysis
          .pairExtractHof(col("text"), w)).as("p"))
        .select(concat_ws(" ", col("p.a"), col("p.b")).as("ab"))
        .collect().map(_.getString(0)).sorted.toSeq
      val native = df
        .select(explode(TextExprs.word_pairs(col("text"), w)).as("ab"))
        .collect().map(_.getString(0)).sorted.toSeq
      assert(native === hof, s"w=$w")
    }
    // short/empty inputs: empty pair array, no negative-sequence blowup
    val short = Seq("", "   ", "one").toDF("text")
      .select(TextExprs.word_pairs(col("text"), 3).as("p"))
      .collect().map(_.getSeq[String](0).toList)
    assert(short.toList == List(Nil, Nil, Nil))
  }

  test("char_bigram_counts ≡ the split-transform-explode formulation (random + real)") {
    val rand = randomStrings.toDF("text")
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
    for (df <- Seq(rand, real)) {
      // the executable spec: occurrence explode, then a global
      // (bigram → count) fold — exactly what bigramCondEntropy ran
      // before the expression replaced it
      val spec = df
        .select(expr("filter(split(text, ''), x -> x <> '')").as("cs"))
        .filter(size(col("cs")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(cs) - 1), " +
            "i -> concat(element_at(cs, i), element_at(cs, i + 1)))"))
          .as("bg"))
        .filter(length(col("bg")) === 2)
        .groupBy("bg").agg(count(lit(1)).as("n12"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val fast = df
        .select(explode(TextExprs.char_bigram_counts(col("text"))).as("e"))
        .groupBy(col("e.bg").as("bg")).agg(sum(col("e.n12")).as("n12"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fast == spec)
    }
  }

  test("null flows through as null (nullIntolerant)") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(TextExprs.token_count(col("s"))).collect().head
    assert(r.isNullAt(0))
  }

  test("the expressions participate in WholeStageCodegen") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = docs.select(TextExprs.token_count(col("text")),
      TextExprs.rolling_hash(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  test("SQL registration: token_count/rolling_hash usable from spark.sql") {
    TextExprs.register(spark)
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("docs_v")
    val r = spark.sql(
      "SELECT token_count(text) AS t, rolling_hash(text) AS h FROM docs_v LIMIT 1")
      .collect().head
    assert(r.getInt(0) > 0 && r.getLong(1) >= 0)
  }
}
