package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Foreign-written TIMESTAMP(NANOS) files: the Batch row reader's
  * nanos→micros conversion must FLOOR (Spark's semantics), not
  * truncate — a pre-epoch value that is not a whole microsecond would
  * otherwise read one microsecond high. Unit-level: one hand-written
  * parquet-mr file through [[GraftPartitionReader]]. */
class BatchReaderNanosSpec extends AnyFunSuite {

  test("NANOS timestamps floor to micros, pre-epoch included") {
    val dir = java.nio.file.Files.createTempDirectory("nanos").toString
    val file = s"$dir/nanos.parquet"
    val schema = Types.buildMessage()
      .addField(Types.optional(PrimitiveType.PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts"))
      .named("spark_schema")
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(
        new org.apache.hadoop.fs.Path(file))
      .withConf(conf).withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    val nanos = Seq(-1500L, 1500L, -7999999999L, 0L, -1000L)
    try nanos.foreach(n => w.write(f.newGroup().append("ts", n)))
    finally w.close()

    val kvs = {
      import scala.jdk.CollectionConverters._
      new Configuration().iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
    }
    val reader = new GraftPartitionReader(file,
      StructType(Seq(StructField("ts", TimestampType))), kvs)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    try while (reader.next()) got += reader.get().getLong(0)
    finally reader.close()
    assert(got.toSeq == nanos.map(n => Math.floorDiv(n, 1000L)),
      s"nanos→micros must floor: $got")
  }
}
