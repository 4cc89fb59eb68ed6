package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) interchange — the de-facto corpus
  * format LLM pipelines exchange (one document object per line,
  * gzip-compressed shards). Spark's json source IS the right engine
  * for it; this wraps the two decisions that matter at corpus scale
  * and keep a 1000-executor read sane:
  *
  *  - WRITE with a target shard count and gzip codec (a shard is the
  *    unit of parallelism for every downstream consumer — and gzip
  *    shards are non-splittable, so shard count = max read
  *    parallelism forever after; pick it for the FLEET, not the
  *    writer);
  *  - READ with an explicit caller schema: schema inference on
  *    JSONL is a full extra pass over the corpus and infers
  *    unioned-supersets on dirty data — a 100 TB anti-pattern. The
  *    permissive corrupt-record column is kept so one bad line
  *    quarantines instead of failing the shard.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  def write(df: DataFrame, path: String, shards: Int): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    df.repartition(shards)
      .write.mode("overwrite")
      .option("compression", "gzip")
      .json(path)
  }

  /** Read with the caller's schema + a corrupt-record column appended;
    * rows whose line failed to parse carry the raw line there and null
    * data columns.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    // the caller's data schema must not already claim the quarantine
    // column: schema.add would produce a duplicate field and a
    // confusing downstream analysis error instead of this message
    require(!schema.fieldNames.contains(CorruptCol),
      s"caller schema must not contain '$CorruptCol' — it is reserved " +
        "for the corrupt-line quarantine column Jsonl.read appends")
    val withCorrupt = schema.add(CorruptCol, "string")
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }
}
