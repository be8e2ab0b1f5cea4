package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Catalog-listing scan (reference: etl_service/main.py:106-116): the
  * Drive `files().list(q="'<folder>' in parents", fields="files(id,
  * name, mimeType)")` call as a Spark table.
  *
  * Spark-first form: the built-in `binaryFile` source already IS a
  * listing-backed table —
  *  - the parent-folder predicate is the load path;
  *  - a name predicate pushes to the file listing via `pathGlobFilter`
  *    (evaluated by the FileIndex while globbing, so non-matching files
  *    are never opened — the listing-time analogue of PushedFilters);
  *  - the `fields=` projection is column pruning: `content` is only
  *    read when selected, so a metadata query never touches file bytes
  *    (CatalogListingSpec pins that with a read-schema audit).
  * At 100 TB-scale catalogs the same plan holds: listing is driver/
  * FileIndex metadata work, and the per-file rows scan in parallel.
  *
  * The fixture directory is generated deterministically from the scale
  * factor (≤200 files, named like the reference's token folder:
  * `token_<i>.tok`, with `sa_key_<i>.json` interlopers that the
  * reference skips at main.py:122-125), so a DuckDB range() CTE
  * replays the listing exactly for the correctness gate.
  */
object CatalogListing {
  type Q = (SparkSession, String) => DataFrame

  /** Number of fixture files for a scale dir: |documents| capped at 200
    * (listing semantics don't need data-scale file counts).
    */
  private def fileCount(s: SparkSession, d: String): Long =
    math.min(Tables.documents(s, d).count(), 200L)

  /** Create-once fixture dir under java.io.tmpdir, keyed by sf dir and
    * count so concurrent sessions at different SFs never collide.
    * token_<i>.tok content is "tok<i>" — file length is then
    * 3 + len(str(i)), which the oracle recomputes.
    */
  def fixtureDir(s: SparkSession, d: String): String = synchronized {
    val n = fileCount(s, d)
    val dir = new File(System.getProperty("java.io.tmpdir"),
      s"graft_catalog_${new File(d).getName}_$n")
    val marker = new File(dir, ".complete")
    if (!marker.exists()) {
      dir.mkdirs()
      (0L until n).foreach { i =>
        val (name, body) =
          if (i % 4 == 0) (s"sa_key_$i.json", s"""{"key":$i}""")
          else (s"token_$i.tok", s"tok$i")
        Files.write(Paths.get(dir.getPath, name), body.getBytes(StandardCharsets.UTF_8))
      }
      Files.write(marker.toPath, Array.emptyByteArray)
    }
    dir.getAbsolutePath
  }

  val queries: Map[String, Q] = Map(
    // Q-scan-catalog: list the folder, project name/size/mimeType. The
    // ".tok only" predicate is pushed to the listing (pathGlobFilter),
    // so the .json interlopers are never even stat-read as rows; the
    // projection omits `content`, so no file bytes are read at all.
    "q_scan_catalog" -> ((s, d) => {
      val dir = fixtureDir(s, d)
      s.read.format("binaryFile")
        .option("pathGlobFilter", "token_*.tok")
        .load(dir)
        .select(
          element_at(split(col("path"), "/"), -1).as("name"),
          col("length").as("size"))
        .withColumn("mime_type", lit("application/octet-stream"))
        .orderBy(col("name"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_scan_catalog" ->
      """WITH files AS (
        |  SELECT unnest(range(0, least(200, (SELECT count(*) FROM documents)))) AS i)
        |SELECT 'token_' || CAST(i AS VARCHAR) || '.tok' AS name,
        |  3 + len(CAST(i AS VARCHAR)) AS size,
        |  'application/octet-stream' AS mime_type
        |FROM files WHERE i % 4 <> 0
        |ORDER BY name""".stripMargin
  )
}
