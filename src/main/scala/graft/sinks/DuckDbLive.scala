package graft.sinks

import java.nio.file.{Files, Path, Paths}
import java.sql.Connection

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import scala.util.control.NonFatal

/** Live DuckDB JDBC + native-Appender binding — the reference's actual
  * sink path (`DatabaseWriter.cs:141-212`: one appender per table,
  * `BeginRow`/typed `Append` per ordinal-sorted column, periodic flush as
  * the commit cadence), re-expressed against the public
  * `org.duckdb:duckdb_jdbc` driver.
  *
  * The binding is deliberately REFLECTIVE and OPTIONAL: the jar is
  * discovered in the machine-local artifact caches (the same pre-warmed,
  * offline cache the test dependencies resolve from — no remote fetch, no
  * repository host named anywhere) and loaded in a child classloader, so
  * `build.sbt`'s dependency set stays fixed and every caller degrades to
  * the open-format handshake (parquet + generated DDL/`read_parquet`
  * INSERT, `DuckDbSink.write`) when no jar is present.
  *
  * Scale posture: DuckDB is a single-node store, so the LIVE path is for
  * bounded, driver-side exports — exactly the reference's single-process
  * appender loop. At 100 TB the durable handoff stays the distributed
  * parquet write; a warehouse that wants live appends gets one appender
  * connection per output partition (`df.foreachPartition`), which this
  * object's per-connection API supports but the demo does not need.
  */
object DuckDbLive {

  /** First `duckdb_jdbc-*.jar` found under the local artifact caches,
    * lowest path lexicographically for determinism. None → unavailable.
    */
  lazy val jarPath: Option[Path] =
    try {
      val home = Paths.get(sys.props.getOrElse("user.home", "/root"))
      val roots = Seq(".cache/coursier", ".ivy2", ".m2")
        .map(home.resolve)
        .filter(Files.isDirectory(_))
      import scala.jdk.CollectionConverters._
      roots.flatMap { r =>
        val stream = Files.walk(r)
        try
          stream.iterator().asScala.filter { p =>
            val n = p.getFileName.toString
            n.startsWith("duckdb_jdbc") && n.endsWith(".jar")
          }.toList
        finally stream.close()
      }.sortBy(_.toString).headOption
    } catch { case NonFatal(_) => None }

  /** The JDBC driver instance from the child classloader. `java.sql.Driver`
    * is JDK-loaded, so the instance is usable across the loader boundary
    * (DriverManager itself would refuse drivers it cannot see, hence
    * `driver.connect`, not `getConnection`).
    */
  private lazy val driver: Option[java.sql.Driver] = jarPath.flatMap { p =>
    try {
      val loader = new java.net.URLClassLoader(Array(p.toUri.toURL), getClass.getClassLoader)
      Some(
        loader
          .loadClass("org.duckdb.DuckDBDriver")
          .getDeclaredConstructor()
          .newInstance()
          .asInstanceOf[java.sql.Driver]
      )
    } catch { case NonFatal(_) => None }
  }

  def available: Boolean = driver.isDefined

  def withConnection[A](dbFile: String)(f: Connection => A): A = {
    val d = driver.getOrElse(
      throw new IllegalStateException("duckdb_jdbc not present in the local artifact cache")
    )
    val conn = d.connect(s"jdbc:duckdb:$dbFile", new java.util.Properties)
    try f(conn)
    finally conn.close()
  }

  def execute(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try { st.execute(sql); () }
    finally st.close()
  }

  /** Run a query and return the single result row as a Seq of values. */
  def queryRow(conn: Connection, sql: String): IndexedSeq[AnyRef] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      require(rs.next(), s"empty result for: $sql")
      (1 to rs.getMetaData.getColumnCount).map(rs.getObject)
    } finally st.close()
  }

  /** Append every row of `df` to `table` through the NATIVE appender
    * (`DuckDBConnection.createAppender` → `beginRow`/typed
    * `append`/`endRow`), flushing every `commitEvery` rows — the commit
    * cadence of the reference's `CommitEveryRows` loop. All appender calls
    * are reflective (the class lives in the child loader). Returns the row
    * count appended.
    *
    * Driver-side by design: callers hand in BOUNDED exports (see class
    * doc); rows stream via `toLocalIterator`, so only one partition is
    * resident at a time.
    */
  def appendAll(conn: Connection, table: String, df: DataFrame, commitEvery: Int = 1000): Long = {
    val createAppender =
      conn.getClass.getMethod("createAppender", classOf[String], classOf[String])
    val ap = createAppender.invoke(conn, "main", table)
    val apc = ap.getClass
    val beginRow = apc.getMethod("beginRow")
    val endRow = apc.getMethod("endRow")
    val flush = apc.getMethod("flush")
    val close = apc.getMethod("close")

    // one boxed-invoke thunk per column, resolved once (not per row)
    val setters: Array[(org.apache.spark.sql.Row, Int) => Unit] =
      df.schema.fields.map { f =>
        f.dataType match {
          case LongType =>
            val m = apc.getMethod("append", java.lang.Long.TYPE)
            (r: org.apache.spark.sql.Row, i: Int) => { m.invoke(ap, java.lang.Long.valueOf(r.getLong(i))); () }
          case IntegerType =>
            val m = apc.getMethod("append", java.lang.Integer.TYPE)
            (r: org.apache.spark.sql.Row, i: Int) => { m.invoke(ap, java.lang.Integer.valueOf(r.getInt(i))); () }
          case FloatType =>
            val m = apc.getMethod("append", java.lang.Float.TYPE)
            (r: org.apache.spark.sql.Row, i: Int) => { m.invoke(ap, java.lang.Float.valueOf(r.getFloat(i))); () }
          case DoubleType =>
            val m = apc.getMethod("append", java.lang.Double.TYPE)
            (r: org.apache.spark.sql.Row, i: Int) => { m.invoke(ap, java.lang.Double.valueOf(r.getDouble(i))); () }
          case BooleanType =>
            val m = apc.getMethod("append", java.lang.Boolean.TYPE)
            (r: org.apache.spark.sql.Row, i: Int) => { m.invoke(ap, java.lang.Boolean.valueOf(r.getBoolean(i))); () }
          case StringType =>
            val m = apc.getMethod("append", classOf[String])
            (r: org.apache.spark.sql.Row, i: Int) => { m.invoke(ap, r.getString(i)); () }
          case other =>
            throw new IllegalArgumentException(
              s"live appender supports scalar columns only; ${f.name} is $other"
            )
        }
      }

    var n = 0L
    try {
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        beginRow.invoke(ap)
        var i = 0
        while (i < setters.length) { setters(i)(row, i); i += 1 }
        endRow.invoke(ap)
        n += 1
        if (n % commitEvery == 0) flush.invoke(ap)
      }
    } finally close.invoke(ap)
    n
  }
}
