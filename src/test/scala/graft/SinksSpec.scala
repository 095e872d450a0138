package graft

import graft.sinks.Sinks
import java.nio.file.{Files, Paths}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitionedParquet bounds files per partition") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val df = (1 to 1000).map(i => (i % 3, i)).toDF("part", "v")
    Sinks.writePartitionedParquet(df, dir, Seq("part"),
      filesPerPartition = 2)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    (0 to 2).foreach { p =>
      val files = new java.io.File(s"$dir/part=$p")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files <= 2, s"partition $p has $files files")
    }
  }

  test("writeJsonl emits line-delimited json") {
    val dir = Files.createTempDirectory("graft-jsonl-out").toString
    Sinks.writeJsonl(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    val lines = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    assert(lines.length == 2 && lines.forall(_.startsWith("{\"id\":")))
  }
}
