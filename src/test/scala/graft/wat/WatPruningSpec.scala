package graft.wat

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.JsonToStructs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType, ArrayType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.WatEnvelope

/** Pins the SURVEY §4.2 claim the extraction's scale story rests on:
  * `from_json` with the lean envelope schema parses ONLY the navigated
  * fields — Catalyst prunes the parse schema to what the query reads
  * (OptimizeJsonExprs), and fields absent from the schema are
  * lexed-and-skipped by the parser, never materialized. Real CC records
  * are dominated by envelope metadata the extraction ignores (response
  * headers, Head title/metas/scripts — the shapes around
  * cc2dataset/main.py:144-164's navigation); the lean fixtures are
  * nearly all Links, so without this spec a pruning regression would be
  * invisible locally and expensive at crawl scale.
  */
class WatPruningSpec extends AnyFunSuite with SparkTestBase {

  private val tmp = Files.createTempDirectory("watpruning").toFile

  /** Every JsonToStructs parse schema in the optimized plan. */
  private def jsonSchemas(df: DataFrame): Seq[DataType] =
    df.queryExecution.optimizedPlan.flatMap(p =>
      p.expressions.flatMap(_.collect { case j: JsonToStructs => j.schema })).toSeq

  /** Leaf paths of a (possibly nested, array-bearing) struct schema. */
  private def leafPaths(dt: DataType, prefix: String = ""): Set[String] = dt match {
    case st: StructType =>
      st.fields.toSet.flatMap((f: org.apache.spark.sql.types.StructField) =>
        leafPaths(f.dataType, if (prefix.isEmpty) f.name else s"$prefix.${f.name}"))
    case at: ArrayType => leafPaths(at.elementType, prefix)
    case _ => Set(prefix)
  }

  /** One-row payload frame that survives optimization as a real scan
    * input: a literal or LocalRelation payload is constant-folded (the
    * optimizer evaluates from_json at PLAN time, collapsing the whole
    * tree to a LocalRelation with no JsonToStructs left to inspect) —
    * a parquet scan never folds.
    */
  private def payloadDf(json: String) = {
    import spark.implicits._
    val p = new File(tmp, s"payload-${json.hashCode}.parquet").getAbsolutePath
    Seq(json).toDF("payload").write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("from_json parse schema prunes to the selected subfield") {
    // a projection reading ONE leaf must not parse the Envelope subtree
    val df = payloadDf("""{"Container": {"Filename": "f"}}""")
      .select(from_json(col("payload"), WatEnvelope.schema).as("r"))
      .select(col("r.Container.Filename"))
    val schemas = jsonSchemas(df)
    assert(schemas.nonEmpty, "no JsonToStructs in optimized plan")
    schemas.foreach { s =>
      assert(leafPaths(s) == Set("Container.Filename"),
        s"parse schema not pruned to the read leaf: $s")
    }
  }

  test("extraction parses at most the navigated envelope leaves") {
    val plan = WatExtract.extract(payloadDf("{}"), "image").toDF()
    val schemas = jsonSchemas(plan)
    assert(schemas.nonEmpty, "no JsonToStructs in extraction plan")
    val navigated = leafPaths(WatEnvelope.schema)
    schemas.foreach { s =>
      val got = leafPaths(s)
      assert(got.subsetOf(navigated),
        s"extraction parses beyond the navigated schema: ${got -- navigated}")
      assert(got.exists(_.endsWith("Links.url")), s"Links.url missing: $got")
    }
    // the lean schema itself stays lean: 6 navigated non-link leaves +
    // 4 link fields — a schema growth here silently taxes every record
    assert(navigated.size <= 8, s"envelope schema grew: $navigated")
  }

  test("10x envelope bloat changes NOTHING in the extraction output") {
    // same seed → byte-identical link stream; bloat only fattens the
    // never-navigated metadata, so every extracted row must be identical
    val lean = WatFixture.syntheticWat(
      new File(tmp, "lean.warc.wat.gz").getAbsolutePath, 60, 5, seed = 42L)
    val bloated = WatFixture.syntheticWat(
      new File(tmp, "bloat.warc.wat.gz").getAbsolutePath, 60, 5, seed = 42L,
      bloatUnits = 10)
    // compare UNCOMPRESSED archive bytes: the bloat is what the JSON
    // parser must lex, and gzip flatters repetitive synthetic fields
    def rawBytes(p: String): Long = {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(p), 1 << 16)
      try {
        val buf = new Array[Byte](1 << 16)
        var total = 0L
        var n = in.read(buf)
        while (n >= 0) { total += n; n = in.read(buf) }
        total
      } finally in.close()
    }
    val leanSz = rawBytes(lean)
    val bloatSz = rawBytes(bloated)
    assert(bloatSz > 8 * leanSz,
      s"bloat fixture not bloated: $leanSz vs $bloatSz raw bytes")

    def rows(p: String) = WatExtract.fromPaths(spark, Seq(p), "image_only")
      .collect().map(d => (d.uid, d.url, d.alt, d.page_url)).sorted.toSeq
    val a = rows(lean)
    val b = rows(bloated)
    assert(a.nonEmpty && a == b,
      s"extraction diverged under envelope bloat: ${a.size} vs ${b.size} rows")
  }
}
