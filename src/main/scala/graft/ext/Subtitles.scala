package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Subtitle parsing (SRT + WebVTT) — the text half of video training
  * pairs. Crawled video corpora ship captions as SubRip (.srt) or
  * WebVTT (.vtt, the W3C/WHATWG format); aligning clips to text needs
  * the cue timeline parsed exactly. Both are PUBLIC text formats:
  *
  *  - SRT: blank-line-separated blocks of (index, `HH:MM:SS,mmm -->
  *    HH:MM:SS,mmm`, text lines);
  *  - WebVTT: a `WEBVTT` header, then cues with `.` millisecond
  *    separators, optional cue identifiers, optional settings after
  *    the arrow, and `MM:SS.mmm` short timestamps.
  *
  * The cue list is the operator currency: [[subtitleCues]] explodes a
  * documents-shaped frame into one row per cue (doc-bounded — the
  * explode never exceeds the subtitle's own cue count), ready for
  * interval-joining against frame timelines ([[Mp4]]/[[Webm]] sample
  * times) or packing into clip-text training pairs.
  */
object Subtitles {

  final case class Cue(index: Int, startMs: Long, endMs: Long, text: String)

  private val SrtTime =
    """(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})""".r
  private val VttShortTime =
    """(\d{1,2}):(\d{2})\.(\d{3})\s*-->\s*(\d{1,2}):(\d{2})\.(\d{3})""".r

  private def ms(h: String, m: String, s: String, f: String): Long =
    h.toLong * 3600000L + m.toLong * 60000L + s.toLong * 1000L + f.toLong

  /** Parse SRT or WebVTT (dispatch on the WEBVTT magic). Cues are
    * renumbered 1..n in file order regardless of declared indices
    * (real-world SRT indices drift); malformed blocks are skipped —
    * an empty result means the text is not a subtitle file.
    */
  def parse(text: String): Vector[Cue] = {
    val isVtt = text.startsWith("WEBVTT") || text.startsWith("﻿WEBVTT")
    val body =
      if (isVtt) text.linesIterator.drop(1).mkString("\n") else text
    val blocks = body.split("\n\\s*\n")
    val out = Vector.newBuilder[Cue]
    var idx = 0
    for (block <- blocks) {
      val lines = block.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
      val timeLineIdx = lines.indexWhere(l => l.contains("-->"))
      if (timeLineIdx >= 0) {
        val parsed: Option[(Long, Long)] =
          SrtTime.findFirstMatchIn(lines(timeLineIdx)).map { m =>
            (ms(m.group(1), m.group(2), m.group(3), m.group(4)),
              ms(m.group(5), m.group(6), m.group(7), m.group(8)))
          }.orElse(VttShortTime.findFirstMatchIn(lines(timeLineIdx)).map { m =>
            (ms("0", m.group(1), m.group(2), m.group(3)),
              ms("0", m.group(4), m.group(5), m.group(6)))
          })
        parsed.foreach { case (s, e) =>
          val textLines = lines.drop(timeLineIdx + 1)
          if (textLines.nonEmpty && e >= s) {
            idx += 1
            out += Cue(idx, s, e, textLines.mkString("\n"))
          }
        }
      }
    }
    out.result()
  }

  final case class CueRow(doc_id: Long, cue_idx: Long, start_ms: Long,
      end_ms: Long, text: String)

  /** One row per cue of each document's subtitle text (SRT or VTT,
    * auto-dispatched). Documents that parse to zero cues contribute
    * nothing.
    */
  def subtitleCues(docs: DataFrame, idCol: String,
      textCol: Column): Dataset[CueRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), textCol.cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        if (t == null) Seq.empty
        else parse(t).map(c => CueRow(id, c.index.toLong, c.startMs,
          c.endMs, c.text))
      }
  }

  /** One deterministic subtitle document per id — SRT for odd ids,
    * WebVTT for even (both paths through one [[subtitleCues]] pass).
    * Closed form: n = 2 + (id%6) cues; cue j runs
    * [(j-1)*2000 + id%500, +1500) ms with text
    * `cue <j> of doc <id>` — the q_subtitles oracle recomputes all of
    * it. Lives in the operator layer (executor-lambda rule, see
    * [[Multimodal.syntheticVideoMedia]]).
    */
  def syntheticSubtitleDocs(
      ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (2 + id % 6).toInt
      val cues = (1 to n).map { j =>
        val start = (j - 1) * 2000L + id % 500
        Cue(j, start, start + 1500L, s"cue $j of doc $id")
      }
      (id, write(cues, vtt = id % 2 == 0))
    }).toDF("doc_id", "sub_text")
  }

  /** Subtitle docs paced for the CLIP-TEXT join fixture: cue k of doc
    * id covers [(k-1)*120 + id%40, +100) ms — dense enough that each
    * cue catches 2-3 of the synthetic video's 40 ms frames — with
    * n = 3 + (id%5) cues, SRT/VTT alternating by id parity. Closed
    * form for the q_clip_text oracle.
    */
  def syntheticClipSubtitles(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (3 + id % 5).toInt
      val cues = (1 to n).map { k =>
        val start = (k - 1) * 120L + id % 40
        Cue(k, start, start + 100L, s"clip $k")
      }
      (id, write(cues, vtt = id % 2 == 0))
    }).toDF("doc_id", "sub_text")
  }

  /** Serialize cues as SRT (`,` millisecond separator) or WebVTT. */
  def write(cues: Seq[Cue], vtt: Boolean): String = {
    def stamp(v: Long, sep: String): String =
      f"${v / 3600000}%02d:${v / 60000 % 60}%02d:${v / 1000 % 60}%02d$sep${v % 1000}%03d"
    val sep = if (vtt) "." else ","
    val body = cues.map { c =>
      val head = if (vtt) "" else s"${c.index}\n"
      s"$head${stamp(c.startMs, sep)} --> ${stamp(c.endMs, sep)}\n${c.text}"
    }.mkString("\n\n")
    (if (vtt) "WEBVTT\n\n" else "") + body + "\n"
  }
}
