package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 face of the indexed-FASTA source (SURVEY §7.3; reference
  * fastdoop/IndexedFastaFormat.scala:33-36 re-architected): `spark.read
  * .format("indexed-fasta").option("k", 35).load(path)` plans the same
  * driver-side .fai byte-range splits as [[IndexedFasta]] and reads them
  * with the same executor seek kernel, but through the connector API — the
  * scan shows up in the SQL UI with row/byte metrics, and REQUIRED-COLUMN
  * PRUNING reaches the reader: a query that never touches `nucleotides`
  * (a title/location listing, a fragment count) skips the genome byte-range
  * reads entirely, turning an I/O scan into a .fai-only metadata pass.
  *
  * Splits are bin-packed round-robin into `parallelism` partitions (option,
  * default the session's defaultParallelism) so a 100 GB genome yields
  * bounded-size tasks without scheduling 100k one-split partitions.
  */
final class IndexedFastaSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "indexed-fasta"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IndexedFastaSource.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new IndexedFastaTable(new CaseInsensitiveStringMap(properties))
}

object IndexedFastaSource {
  /** The [[InputFragment]] shape: `.load(...).as[InputFragment]` just works. */
  val SCHEMA: StructType = StructType(Seq(
    StructField("header", StringType, nullable = false),
    StructField("location", LongType, nullable = false),
    StructField("nucleotides", StringType, nullable = false),
    StructField("nucleotides2", StringType, nullable = true)))
}

private[sources] final class IndexedFastaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val path = {
    val p = options.get("path")
    require(p != null, "indexed-fasta needs a path (load(...) or option(\"path\", ...))")
    p
  }

  // capture the ISSUING session while its planner instantiates this table:
  // resolving SparkSession.active again at scan-execution time would, in a
  // multi-session app, silently read through whichever session happens to
  // be active then (different Hadoop conf, different parallelism)
  private val session = org.apache.spark.sql.SparkSession.active

  override def name(): String = s"indexed-fasta($path)"
  override def schema(): StructType = IndexedFastaSource.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new IndexedFastaScanBuilder(session, path,
      opts.getInt("k", 35),
      opts.getInt("maxFragment", 1000000),
      opts.getInt("parallelism", 0))
}

private[sources] final class IndexedFastaScanBuilder(
    session: org.apache.spark.sql.SparkSession, path: String, k: Int,
    maxFragment: Int, parallelism: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = IndexedFastaSource.SCHEMA

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new IndexedFastaScan(session, path, k, maxFragment, parallelism, required)
}

private[sources] final class IndexedFastaScan(
    session: org.apache.spark.sql.SparkSession, path: String, k: Int,
    maxFragment: Int, parallelism: Int, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"indexed-fasta $path k=$k cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    require(!path.endsWith(".gz") && !path.endsWith(".bz2"),
      "indexed FASTA requires an uncompressed file (byte-range seeks); " +
        "use Sequences.fasta for compressed inputs")
    val entries = IndexedFasta.readFai(session, path + ".fai")
    val splits = IndexedFasta.planSplits(path, entries, k, maxFragment)
    val bins = math.max(1, math.min(splits.size,
      if (parallelism > 0) parallelism
      else session.sparkContext.defaultParallelism))
    // round-robin bin-pack: neighbors land in different bins, so the long
    // sequences' many splits spread across tasks instead of clustering
    splits.zipWithIndex.groupBy(_._2 % bins).toSeq.sortBy(_._1)
      .map { case (_, ss) => FastaSplitsPartition(ss.map(_._1).toArray) }
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FastaPartitionReaderFactory(required,
      new SerializableConfiguration(session.sparkContext.hadoopConfiguration))
}

private[sources] final case class FastaSplitsPartition(splits: Array[FastaSplit])
    extends InputPartition

private[sources] final class FastaPartitionReaderFactory(required: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val splits = partition.asInstanceOf[FastaSplitsPartition].splits
    // pruning contract: read genome bytes ONLY if nucleotides was required
    val wantSeq = required.fieldNames.contains("nucleotides")
    new PartitionReader[InternalRow] {
      private var i = -1

      override def next(): Boolean = { i += 1; i < splits.length }

      override def get(): InternalRow = {
        val s = splits(i)
        val values: Array[Any] = required.fieldNames.map {
          case "header" => UTF8String.fromString(s.name)
          case "location" => s.baseStart
          case "nucleotides" =>
            if (wantSeq) UTF8String.fromString(IndexedFasta.readSplit(s, conf.value))
            else null
          case "nucleotides2" => null
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }.toArray[Any]
        InternalRow.fromSeq(values.toIndexedSeq)
      }

      override def close(): Unit = ()
    }
  }
}
