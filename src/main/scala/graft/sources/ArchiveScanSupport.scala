package graft.sources

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.sources.{And, EqualTo, Filter, In, IsNotNull, Not, Or, StringContains, StringEndsWith, StringStartsWith}

/** The archive-source scan logic shared by the `wat` and `warc`
  * formats, parameterized by the path column name — planning-time path
  * predicates and bounded task batching are transport-independent, and
  * keeping one copy means a new pushable filter type (or a three-valued
  * -logic subtlety like the null In-list below) cannot be fixed in one
  * source and silently missed in the other.
  */
private[sources] object ArchiveScanSupport {

  /** Is this filter decidable from the constant-per-partition path
    * column alone? Such predicates prune partitions at PLANNING time —
    * matching archives become input partitions, the rest are never
    * fetched.
    */
  def pathOnly(column: String)(f: Filter): Boolean = f match {
    case EqualTo(`column`, _: String)  => true
    // a null In-list element makes NOT IN three-valued (UNKNOWN for
    // non-matches) — two-valued eval below would wrongly keep rows, so
    // leave those to Spark's post-scan filter
    case In(`column`, vs)              => vs != null && !vs.contains(null)
    case StringStartsWith(`column`, _) => true
    case StringEndsWith(`column`, _)   => true
    case StringContains(`column`, _)   => true
    case IsNotNull(`column`)           => true
    case And(l, r) => pathOnly(column)(l) && pathOnly(column)(r)
    case Or(l, r)  => pathOnly(column)(l) && pathOnly(column)(r)
    case Not(c)    => pathOnly(column)(c)
    case _         => false
  }

  /** Evaluate a [[pathOnly]]-accepted filter against a concrete path. */
  def eval(column: String)(f: Filter, p: String): Boolean = f match {
    case EqualTo(`column`, v: String)  => p == v
    case In(`column`, vs)              => vs.contains(p)
    case StringStartsWith(`column`, v) => p.startsWith(v)
    case StringEndsWith(`column`, v)   => p.endsWith(v)
    case StringContains(`column`, v)   => p.contains(v)
    case IsNotNull(`column`)           => true
    case And(l, r) => eval(column)(l, p) && eval(column)(r, p)
    case Or(l, r)  => eval(column)(l, p) || eval(column)(r, p)
    case Not(c)    => !eval(column)(c, p)
    case _         => true // unreachable: pathOnly gated
  }

  /** ≤ maxTasks archives → one per partition (the reference's
    * one-task-per-archive unit). Above it, contiguous groups of
    * ceil(n / maxTasks) archives share a partition: the scheduler sees
    * at most maxTasks tasks however large the listing, each task still
    * processes archives strictly sequentially, and contiguous grouping
    * keeps neighboring archives (same crawl prefix on CC layouts) in
    * one task for S3 locality.
    */
  def planPartitions(paths: Seq[String], maxTasks: Int,
      mk: Seq[String] => InputPartition): Array[InputPartition] =
    if (paths.size <= maxTasks)
      paths.map(p => mk(Seq(p))).toArray
    else {
      val perTask = math.ceil(paths.size.toDouble / maxTasks).toInt
      paths.grouped(perTask).map(mk).toArray
    }
}
