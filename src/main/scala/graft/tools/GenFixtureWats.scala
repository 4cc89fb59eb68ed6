package graft.tools

import graft.wat.WatFixture

/** Dev utility: materialize canonical + synthetic fixture WATs. */
object GenFixtureWats {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp"
    println(WatFixture.write(s"$dir/fixture1.warc.wat.gz"))
    println(WatFixture.write(s"$dir/fixture2.warc.wat.gz"))
    WatFixture.ensureBenchWats(4).foreach(println)
  }
}
