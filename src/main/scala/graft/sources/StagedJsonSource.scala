package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's staged-file layout
  * (`api/season_S/league_L/endpoint/run_ts.json`, ref
  * `ingestion/main.py:86,91,107-111`) — the path convention becomes a
  * first-class TABLE with partition columns `(season, league,
  * endpoint)` recovered from directory names.
  *
  * Scale behaviors a generic `spark.read.text` + regex post-filter
  * cannot give:
  *  - **partition pruning at the source**: EqualTo filters on
  *    season/league/endpoint are pushed into `planInputPartitions`,
  *    so a query over one league lists and reads ONLY that league's
  *    directories (at 100 TB the file listing itself is the cost);
  *  - **column pruning into IO**: when `content` is not in the
  *    required schema (e.g. a `count` or a pk audit), the file bytes
  *    are never read — metadata rows come from the listing alone;
  *  - one file = one InputPartition: reads parallelize across
  *    executors, no driver-side content handling.
  *
  * Usage: `spark.read.format("staged-json").load(root)` (registered
  * via DataSourceRegister) or the full class name.
  */
class StagedJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "staged-json"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StagedJson.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StagedJsonTable(Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("staged-json requires a path")))
}

object StagedJson {
  val SCHEMA: StructType = StructType(Seq(
    StructField("season", LongType),
    StructField("league", LongType),
    StructField("endpoint", StringType),
    StructField("pk", StringType),
    StructField("path", StringType),
    StructField("content", StringType)))

  private[sources] val PathRe =
    """.*/season_([0-9]+)/league_([0-9]+)/([^/]+)/[^/]+\.json$""".r

  /** Test/diagnostic hook: number of input partitions planned by the
    * most recent scan in this JVM (observes pruning). */
  val lastPlannedPartitions = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Directory-pruned listing: pushed equality filters cut the walk at
    * each level (season dirs, league dirs, endpoint dirs), so a
    * one-league query never even LISTS other leagues — at object-store
    * scale the
    * listing itself is the dominant cost of a scan over many
    * partitions. `dirOk(level, name)` vets each directory name before
    * descent; files under non-conforming directories are returned only
    * when nothing was pushed (the "unknown"-pk fallback). */
  private[graft] def listFiles(root: String,
      dirOk: (Int, String) => Boolean = (_, _) => true,
      keepNonConforming: Boolean = true): Seq[String] = {
    val base = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(base)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def ls(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala.toSeq finally s.close()
    }
    def walk(dir: java.nio.file.Path, level: Int): Unit =
      ls(dir).sortBy(_.toString).foreach { p =>
        if (java.nio.file.Files.isDirectory(p)) {
          val conforming = level match {
            case 0 => p.getFileName.toString.startsWith("season_")
            case 1 => p.getFileName.toString.startsWith("league_")
            case _ => true
          }
          if (conforming && level <= 2) {
            if (dirOk(level, p.getFileName.toString)) walk(p, level + 1)
          } else if (keepNonConforming) walk(p, level + 1)
        } else if (p.toString.endsWith(".json") &&
            (level >= 3 || keepNonConforming)) out += p.toString
      }
    walk(base, 0)
    out.toSeq.sorted
  }
}

final class StagedJsonTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"staged-json:$root"
  override def schema(): StructType = StagedJson.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StagedJsonScanBuilder(root)
}

final class StagedJsonScanBuilder(root: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = StagedJson.SCHEMA

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // partition-column equality prunes directories; everything else
    // stays a post-scan filter (returned to Spark)
    val (accepted, rest) = filters.partition {
      case EqualTo(a, _) => Seq("season", "league", "endpoint").contains(a)
      case _ => false
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new StagedJsonScan(root, pushed, required)
}

final class StagedJsonScan(root: String, pushed: Array[Filter],
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"StagedJsonScan(root=$root, pushed=${pushed.mkString(",")}, cols=${required.fieldNames.mkString(",")})"

  private def matches(season: Long, league: Long, endpoint: String): Boolean =
    pushed.forall {
      case EqualTo("season", v) => v.toString.toLong == season
      case EqualTo("league", v) => v.toString.toLong == league
      case EqualTo("endpoint", v) => v.toString == endpoint
      case _ => true
    }

  /** Pushed equality → directory-name predicate per walk level. */
  private def dirOk(level: Int, name: String): Boolean = level match {
    case 0 => pushed.collectFirst { case EqualTo("season", v) =>
      name == s"season_$v" }.getOrElse(true)
    case 1 => pushed.collectFirst { case EqualTo("league", v) =>
      name == s"league_$v" }.getOrElse(true)
    case _ => pushed.collectFirst { case EqualTo("endpoint", v) =>
      name == v.toString }.getOrElse(true)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val files = StagedJson.listFiles(root, dirOk, keepNonConforming = pushed.isEmpty)
    val parts: Array[InputPartition] = files.flatMap { path =>
      path match {
        case StagedJson.PathRe(season, league, endpoint)
            if matches(season.toLong, league.toLong, endpoint) =>
          Some(StagedFilePartition(path, season.toLong, league.toLong, endpoint): InputPartition)
        case StagedJson.PathRe(_, _, _) => None
        case _ if pushed.isEmpty =>
          // non-conforming path: kept with null partition values (the
          // reference's "unknown" pk fallback, helpers.py:21-23)
          Some(StagedFilePartition(path, -1L, -1L, null): InputPartition)
        case _ => None
      }
    }.toArray
    StagedJson.lastPlannedPartitions.set(parts.length)
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StagedFileReaderFactory(required)
}

final case class StagedFilePartition(path: String, season: Long,
    league: Long, endpoint: String) extends InputPartition

final class StagedFileReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new StagedFileReader(partition.asInstanceOf[StagedFilePartition], required)
}

final class StagedFileReader(p: StagedFilePartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private var done = false

  override def next(): Boolean = if (done) false else { done = true; true }

  override def get(): InternalRow = {
    val known = p.endpoint != null
    val values = required.fieldNames.map {
      case "season" => if (known) java.lang.Long.valueOf(p.season) else null
      case "league" => if (known) java.lang.Long.valueOf(p.league) else null
      case "endpoint" => if (known) UTF8String.fromString(p.endpoint) else null
      case "pk" => UTF8String.fromString(
        if (known) s"${p.season}-${p.league}" else "unknown")
      case "path" => UTF8String.fromString(p.path)
      case "content" => UTF8String.fromString( // read ONLY when required
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p.path)),
          java.nio.charset.StandardCharsets.UTF_8))
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = ()
}
