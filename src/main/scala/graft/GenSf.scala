package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fresh-universe scale fixture builder — the "true sf1" probe
  * (VERDICT r5 #7). [[ScaleUp]] replicates rows with shifted KEYS, which
  * is right for relational plans but multiplies duplicate CONTENT:
  * every document/vector/name exists `copies` times, so near-dup and
  * fuzzy-pair answers grow quadratically by construction (the replica
  * artifacts PLANS.md documents). Real TPC-H scaling instead grows the
  * key space with fresh content at the same distributions. This builder
  * approximates that:
  *
  *   - keys shift per copy exactly like ScaleUp (disjoint universes);
  *   - `c_name`/`s_name` are REGENERATED from the shifted key (same
  *     `Customer#%09d` format), so fuzzy name-pair blocks stay the size
  *     a real sf1 would have;
  *   - document text is rewritten through a per-copy VOCABULARY
  *     BIJECTION (a rotation of the corpus vocabulary): within one copy
  *     every dup/near-dup relation is preserved token-for-token — the
  *     planted cluster rate scales linearly like a real corpus — while
  *     across copies texts share no shingles except by chance, and the
  *     global vocabulary (= shingle space per block) stays the same;
  *   - embedding vectors are circularly ROTATED by the copy index:
  *     norms and all within-copy pairwise distances are preserved
  *     exactly, cross-copy near-neighbors occur only by chance.
  *
  * Dimension tables (region/nation) stay dimension-sized, as in
  * production. `events.ts` is re-emitted as int64 nanos so the output
  * round-trips through `Tables.loadEvents` like the driver fixtures.
  *
  * Usage: `runMain graft.GenSf [srcDir] [outDir] [copies]`
  */
object GenSf {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1_fresh")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stride = 100000000L // far above any fixture key

    def shifted(base: DataFrame, keyCols: Seq[String], i: Int): DataFrame =
      keyCols.foldLeft(base)((df, k) =>
        df.withColumn(k, col(k) + lit(i.toLong * stride)))

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gensf] $name x$copies -> $out/$name.parquet")
    }

    def copyAsIs(name: String): Unit = {
      spark.read.parquet(graft.engine.Tables.path(src, name))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gensf] $name (dimension, 1x) -> $out/$name.parquet")
    }

    /** Union of per-copy frames with a per-copy transform. */
    def fanout(name: String, keyCols: Seq[String])(
        refresh: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = graft.engine.Tables.load(spark, src, name)
      (0 until copies).map(i => refresh(shifted(base, keyCols, i), i))
        .reduce(_.unionAll(_))
    }

    copyAsIs("region")
    copyAsIs("nation")

    // entity names regenerated from the shifted key: a fresh key space
    // gets fresh names, so name-similarity blocks scale like real data
    write(fanout("customer", Seq("c_custkey")) { (df, _) =>
      df.withColumn("c_name",
        format_string("Customer#%09d", col("c_custkey")))
    }, "customer")
    write(fanout("supplier", Seq("s_suppkey")) { (df, _) =>
      df.withColumn("s_name",
        format_string("Supplier#%09d", col("s_suppkey")))
    }, "supplier")
    write(fanout("part", Seq("p_partkey"))((df, _) => df), "part")
    write(fanout("orders", Seq("o_orderkey", "o_custkey"))((df, _) => df),
      "orders")
    write(fanout("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))(
      (df, _) => df), "lineitem")
    write(
      fanout("events", Seq("event_id", "user_id"))((df, _) => df)
        .withColumn("ts", unix_micros(col("ts")) * 1000L),
      "events")

    // documents: per-copy vocabulary rotation. The fixture corpus is a
    // fixed small vocabulary, so a driver-collected bijection is exact.
    val vocab = spark.read.parquet(graft.engine.Tables.path(src, "documents"))
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().orderBy("w")
      .collect().map(_.getString(0))
    val vocabIdx = vocab.zipWithIndex.toMap
    val bcVocab = spark.sparkContext.broadcast((vocab, vocabIdx))
    // The rotation group has order |V|, so past |V| copies the bijections
    // REPEAT and aliased copies carry token-identical texts — quadratic
    // planted dup pairs (the 100x probe billed doc_minhash_neardups 145x
    // on the 31-word fixture vocabulary exactly this way). Copies beyond
    // the group order move to a fresh token universe via a per-group
    // suffix (group g = r div |V|): still a bijection within every copy
    // (dup/near-dup relations preserved token-for-token), zero cross-group
    // shingle collisions, and the global vocabulary grows by ×(copies/|V|)
    // — the sublinear Heaps-style growth a real corpus would show.
    val rotate = udf((text: String, r: Int) => {
      if (text == null) null
      else {
        val (v, idx) = bcVocab.value
        val suffix = if (r / v.length > 0) "~" + (r / v.length) else ""
        text.split("\\s+").filter(_.nonEmpty).map { w =>
          idx.get(w) match {
            case Some(j) => v((j + r) % v.length) + suffix
            case None => w
          }
        }.mkString(" ")
      }
    })
    write(fanout("documents", Seq("doc_id")) { (df, i) =>
      df.withColumn("text", rotate(col("text"), lit(i)))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    // embeddings: circular component rotation composed with a per-GROUP
    // diagonal ±1 sign pattern — both orthogonal maps, so each copy is
    // an isometry of the base (all pairwise distances/cosines preserved)
    // while no two copies share an exact transform. The rotation alone
    // has group order dim: copies i and i+dim would repeat a rotation
    // and carry IDENTICAL vectors, planting ~copies²/(2·dim) exact
    // cross-copy duplicate pairs past copies ≈ 2·dim — the same
    // quadratic-aliasing cliff the 100x probe exposed for documents
    // (vocabulary group order 31). The sign mask is keyed on the
    // rotation group index g = i div dim (mask_g = g·2654435761, bit j
    // flips component j), so group 0 (all copies < dim, i.e. every
    // fixture up to ~64x) is bit-identical to the old generator and
    // every later group gets a distinct orthogonal transform — zero
    // planted cross-copy coincidences at ANY copy count.
    write(fanout("embeddings", Seq("vec_id")) { (df, i) =>
      if (i == 0) df
      else df.withColumn("embedding",
        expr(s"""transform(
          concat(
            slice(embedding, ($i % size(embedding)) + 1,
                  size(embedding) - ($i % size(embedding))),
            slice(embedding, 1, $i % size(embedding))),
          (x, j) -> x * cast(1 - 2 * (shiftright(
              ($i div size(embedding)) * 2654435761, pmod(j, 64)) & 1)
            as float))"""))
    }, "embeddings")

    spark.stop()
  }
}
