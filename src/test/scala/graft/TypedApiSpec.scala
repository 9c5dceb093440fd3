package graft

import graft.etl.{DataGen, Models, SlackFormatter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Typed Dataset boundary (SURVEY.md §1.3: DataFrame-first, Dataset[T]
  * at the API edge) + the S19 streaming side-effect sink. */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("Dataset[Activity] round-trips through the typed boundary") {
    val ds = DataGen.activities(spark, nEmployees = 5, avgPerEmployee = 4)
      .as[Models.Activity]
    assert(ds.count() == 20)
    // typed transformations keep compile-time field access
    val longest = ds
      .filter((a: Models.Activity) => a.Distance_m.exists(_ > 0))
      .map((a: Models.Activity) =>
        (a.ID_salarie, a.Date_de_fin.getTime - a.Date_de_debut.getTime))
      .toDF("emp", "dur_ms")
    assert(longest.filter($"dur_ms" <= 0).isEmpty)
    // None <-> null option mapping survives
    val nulls = ds.filter((a: Models.Activity) => a.Distance_m.isEmpty).count()
    assert(nulls == DataGen.activities(spark, 5, 4)
      .filter(col("Distance_m").isNull).count())
  }

  test("S19: streaming foreach sink posts one message per insert") {
    val dir = java.nio.file.Files.createTempDirectory("graft_s19").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/one.json"),
      """{"payload":{"op":"c","before":null,"after":{"ID":1,"ID_salarie":101,"Date_de_debut":1724069978076346,"Sport_type":"V","Distance_m":1500,"Date_de_fin":1724073578076346,"Commentaire":null},"ts_ms":1}}""")
    // CollectingSink lives on the executor; in local mode we can reach
    // it back through a static holder
    TypedApiSpec.collected.clear()
    val msgs = SlackFormatter.messages(
      graft.streaming.BronzeIngest.decode(
        spark.readStream.format("text").load(dir)))
    val q = msgs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .foreach(new SlackFormatter.SlackForeachWriter(
        () => TypedApiSpec.StaticSink))
      .start()
    q.awaitTermination(120000)
    assert(TypedApiSpec.collected.size == 1)
    val m = TypedApiSpec.collected.head
    assert(m.startsWith("🚴 Bravo 101 !") && m.contains("1.5 km")
      && m.contains("1 heure"))
  }
}

object TypedApiSpec {
  // local-mode executors share the JVM, so a synchronized buffer works
  val collected = scala.collection.mutable.ArrayBuffer.empty[String]
  object StaticSink extends SlackFormatter.MessageSink {
    def post(message: String): Unit =
      collected.synchronized { collected += message }
  }
}
