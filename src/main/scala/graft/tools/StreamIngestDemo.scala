package graft.tools

import graft.ingest.{Ingest, SimpleParser}
import org.apache.spark.sql.SparkSession

/** Dev tool: end-to-end demo of continuous directory ingestion —
  * writes a file, streams it through
  * [[graft.ingest.Ingest.readStreamDirectory]] → parse, writes a second
  * file mid-stream, and prints each micro-batch to the console sink.
  * `runMain graft.tools.StreamIngestDemo [rootDir]`.
  */
object StreamIngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = args.headOption.map(new java.io.File(_))
      .getOrElse(java.nio.file.Files.createTempDirectory("graft-stream-demo").toFile)
    root.mkdirs()
    def write(name: String, content: String): Unit =
      java.nio.file.Files.write(new java.io.File(root, name).toPath,
        content.getBytes("UTF-8"))
    write("first.zig", "fn first() {\n  second()\n}\n")
    val units = Ingest.parseFiles(
      Ingest.readStreamDirectory(spark, root.getAbsolutePath,
        include = Seq("**/*.zig")), SimpleParser)
    val q = units.toDF().select("unitId", "unitType", "name")
      .writeStream.format("console").outputMode("append").start()
    q.processAllAvailable()
    write("second.zig", "fn second() {\n}\nconst LIMIT = 3\n")
    q.processAllAvailable()
    q.stop()
    spark.stop()
  }
}
