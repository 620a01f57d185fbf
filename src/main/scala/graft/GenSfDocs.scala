package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Documents-only fresh-universe builder for the third-decade (1000x)
  * probe of the dedup family (VERDICT r11 #7). Universe semantics are
  * identical to [[GenSf]] (same key stride, same per-copy vocabulary
  * bijection with a per-group suffix past the rotation-group order),
  * but:
  *
  *   - it builds ONLY the documents table — the probe target
  *     (`doc_dedup_normalized`) reads nothing else, and a full 1000x
  *     GenSf run would write ~17 GB of unused relational tables;
  *   - it fans out through ONE `range(copies) ⨯ broadcast(documents)`
  *     join instead of a copies-way `unionAll` — at 1000 branches the
  *     union PLAN itself becomes the bottleneck, while the join form
  *     is a single pipelined scan at any factor (range partitioning
  *     gives the parallelism; the 0.6 MB base corpus rides a
  *     broadcast), the shape a real 100 TB synthesizer would use;
  *   - it lives in its own file so GenSf.scala's content hash — the
  *     GENSF_VERSION stamp the scale probe uses to validate the
  *     standing 10x/100x fixtures — is untouched.
  *
  * Usage: `runMain graft.GenSfDocs [srcDir] [outDir] [copies]`
  */
object GenSfDocs {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1000x_docs")
    val copies = args.lift(2).map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stride = 100000000L // same disjoint-universe stride as GenSf

    val docs = spark.read.parquet(graft.engine.Tables.path(src, "documents"))

    // per-copy vocabulary bijection — see GenSf.scala for the aliasing
    // analysis (rotation group order |V|; groups past it get a suffix so
    // no two copies ever share shingles except by chance)
    val vocab = docs
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().orderBy("w")
      .collect().map(_.getString(0))
    val vocabIdx = vocab.zipWithIndex.toMap
    val bcVocab = spark.sparkContext.broadcast((vocab, vocabIdx))
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

    spark.range(0, copies, 1, cpus.toInt)
      .select(col("id").cast("int").as("r"))
      .crossJoin(broadcast(docs))
      .withColumn("doc_id", col("doc_id") + col("r").cast("long") * stride)
      .withColumn("text", rotate(col("text"), col("r")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("r")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[gensfdocs] documents x$copies -> $out/documents.parquet")
    spark.stop()
  }
}
