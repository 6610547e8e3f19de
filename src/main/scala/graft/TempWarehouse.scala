package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** One per-JVM temp `spark.sql.warehouse.dir`, deleted on exit.
  *
  * Every graft main (Verify, Bench, tools/PlanAudit) needs a writable
  * catalog location for the table-writing queries (q_join_bucket's
  * bucketed tables, q_join_dpp's partitioned fact) that (a) never
  * pollutes the repo working tree with a `spark-warehouse/` dir and
  * (b) is FRESH per JVM — reusing a persistent location against a
  * fresh in-memory catalog is exactly the catalog-miss +
  * location-exists trap the queries' ensure-helpers guard against.
  * The shutdown hook removes the tree so repeated local runs don't
  * accumulate abandoned warehouses under /tmp (they hold a full copy
  * of the written tables each).
  */
object TempWarehouse {
  lazy val path: Path = {
    val p = Files.createTempDirectory("graft_warehouse")
    sys.addShutdownHook {
      try
        Files.walk(p).sorted(Comparator.reverseOrder())
          .forEach(f => { Files.deleteIfExists(f); () })
      catch { case scala.util.control.NonFatal(_) => () }
    }
    p
  }

  def dir(): String = path.toString
}
