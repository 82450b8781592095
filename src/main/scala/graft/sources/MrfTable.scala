package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 table for `format("payer-mrf")` — batch AND micro-batch
  * over the same chunking scan (the reference is streaming-only and built
  * on internal V1 APIs: `Source`/`LogicalRDD`/`executePlan`,
  * `/root/reference/src/main/scala/com/databricks/JsonMRFSource.scala:
  * 6-7,214-221`; V2 lets the planner own the DataFrame).
  */
final class MrfTable(opts: MrfOptions, userOptions: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = s"payer-mrf(${opts.paths.mkString(",")})"

  override def schema(): StructType = opts.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MrfScan(opts, options)
}

final class MrfScan(opts: MrfOptions, userOptions: CaseInsensitiveStringMap)
    extends Scan {

  /** Session Hadoop conf + per-source `hadoop.*` overrides, captured on
    * the driver and shipped to readers.
    */
  private def hadoopConf(): Configuration = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    MrfOptions.hadoopOverrides(userOptions).foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  override def readSchema(): StructType = opts.schema

  override def description(): String =
    s"payer-mrf chunking scan of ${opts.paths.mkString(",")} " +
      s"(chunkBytes=${opts.chunkBytes}, maxElements=${opts.maxElements})"

  override def toBatch: Batch = new MrfBatch(opts, hadoopConf())

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MrfMicroBatchStream(opts, hadoopConf())
}

/** Batch scan: split every input file up front, one task per chunk.
  * Files are split in parallel (one splitter per file — the per-file scan
  * is inherently sequential, the fleet of files is not).
  */
final class MrfBatch(opts: MrfOptions, conf: Configuration) extends Batch {

  override lazy val planInputPartitions: Array[InputPartition] = {
    val files = MrfFileSplitter.listFiles(opts, conf)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(files.size, Runtime.getRuntime.availableProcessors() / 2)))
    try {
      val tasks = files.map { f =>
        pool.submit(new java.util.concurrent.Callable[Seq[MrfInputPartition]] {
          override def call(): Seq[MrfInputPartition] =
            MrfSplitCache.getOrSplit(f, opts, conf)
        })
      }
      tasks.flatMap(_.get()).zipWithIndex
        .map { case (p, i) => p.copy(ordinal = i.toLong): InputPartition }
        .toArray
    } finally pool.shutdown()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MrfPartitionReaderFactory(
      new SerializableHadoopConf(conf), opts.payloadAsArray, opts.perElement)
}
