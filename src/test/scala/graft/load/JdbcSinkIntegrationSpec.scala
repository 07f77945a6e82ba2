package graft.load

import graft.SparkSuite

/** END-TO-END sink integration against Spark's bundled embedded Derby:
  * real executor JDBC stage writes, a real server-side merge, a real
  * key-map read-back, FK remap through the key-map, and an idempotent
  * re-run. This exercises the exact failure mode from the round-1 review:
  * a parent row that ALREADY exists in the DB under a different id must
  * have children remapped to the DB id, which requires the merge to be
  * committed before the key-map read.
  */
class JdbcSinkIntegrationSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_sink;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private val author = TargetInfo("author", "", "author_id", Seq("name"), Nil)
  private val book   = TargetInfo("book", "", "book_id", Seq("title"), Seq("author_id"))

  private def query(sql: String): Seq[Seq[Any]] = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val out = Seq.newBuilder[Seq[Any]]
      while (rs.next()) out += (1 to n).map(rs.getObject(_))
      out.result()
    } finally conn.close()
  }

  test("full load: stage -> merge -> key-map -> FK remap -> idempotent re-run") {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE author (author_id BIGINT PRIMARY KEY, " +
        "name VARCHAR(100) NOT NULL UNIQUE)")
      st.execute("CREATE TABLE book (book_id BIGINT PRIMARY KEY, " +
        "title VARCHAR(100) NOT NULL UNIQUE, author_id BIGINT NOT NULL)")
      // Pre-existing parent under a DIFFERENT id than the run assigns.
      st.execute("INSERT INTO author VALUES (100, 'ada')")
    } finally conn.close()

    // Run-local frames: author 'ada' minted local id 1 (collides with the
    // pre-existing DB row), 'bob' local id 2 (fresh).
    val authors = Seq((1L, "ada"), (2L, "bob")).toDF("author_id", "name")
    val books = Seq((10L, "letters", 1L), (11L, "logic", 2L))
      .toDF("book_id", "title", "author_id")

    JdbcUpsertSink.load(spark, url, props,
      Seq(author -> authors, book -> books), DerbyDialect)

    // 'ada' kept her DB id (conflict-skip), 'bob' was inserted as-is.
    assert(query("SELECT author_id, name FROM author ORDER BY name") ===
      Seq(Seq(100L, "ada"), Seq(2L, "bob")))
    // Books remapped: 'letters' must point at ada's DB id 100, not local 1.
    assert(query("SELECT book_id, title, author_id FROM book ORDER BY title") ===
      Seq(Seq(10L, "letters", 100L), Seq(11L, "logic", 2L)))

    // Idempotency: the same load again changes nothing.
    JdbcUpsertSink.load(spark, url, props,
      Seq(author -> authors, book -> books), DerbyDialect)
    assert(query("SELECT count(*) FROM author").head.head === 2)
    assert(query("SELECT count(*) FROM book").head.head === 2)
    assert(query("SELECT author_id FROM book WHERE title='letters'").head.head === 100L)
  }

  test("loadAllOrNothing: failed child target rolls back the parent's fresh rows") {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE band (band_id BIGINT PRIMARY KEY, " +
        "bname VARCHAR(50) NOT NULL UNIQUE)")
      st.execute("CREATE TABLE album (album_id BIGINT PRIMARY KEY, " +
        "aname VARCHAR(50) NOT NULL UNIQUE, " +
        "band_id BIGINT NOT NULL REFERENCES band (band_id))")
      st.execute("INSERT INTO band VALUES (100, 'queen')")    // pre-existing
    } finally conn.close()

    val bandT  = TargetInfo("band", "", "band_id", Seq("bname"), Nil)
    val albumT = TargetInfo("album", "", "album_id", Seq("aname"), Seq("band_id"))
    val bands  = Seq((1L, "queen"), (2L, "kraftwerk")).toDF("band_id", "bname")
    // 'radio' dangles: band_id 999 has no parent -> the album merge fails
    // AFTER the band merge committed 'kraftwerk'.
    val albums = Seq((10L, "radio", 999L)).toDF("album_id", "aname", "band_id")

    intercept[ForeignKeyViolationException] {
      JdbcUpsertSink.loadAllOrNothing(spark, url, props,
        Seq(bandT -> bands, albumT -> albums), DerbyDialect)
    }
    // All-or-nothing: this run's fresh parent row was compensated away;
    // the PRE-EXISTING row survived. No partial load remains.
    assert(query("SELECT band_id, bname FROM band") === Seq(Seq(100L, "queen")))
    assert(query("SELECT count(*) FROM album").head.head === 0)
    // Snapshot tables are cleaned up on both paths.
    assert(query("SELECT count(*) FROM SYS.SYSTABLES WHERE TABLENAME LIKE '%__PRE'")
      .head.head === 0)

    // The same load with the child fixed converges (idempotent re-run
    // machinery unchanged).
    val okAlbums = Seq((10L, "radio", 2L)).toDF("album_id", "aname", "band_id")
    JdbcUpsertSink.loadAllOrNothing(spark, url, props,
      Seq(bandT -> bands, albumT -> okAlbums), DerbyDialect)
    assert(query("SELECT bname FROM band ORDER BY bname") ===
      Seq(Seq("kraftwerk"), Seq("queen")))
    assert(query("SELECT aname, band_id FROM album") === Seq(Seq("radio", 2L)))
  }

  test("loadAllOrNothing: startup compensates a crashed run's fossil rows before loading") {
    // Simulate a driver death BETWEEN a committed merge and its
    // compensation: the __pre snapshot and __stage table survive, and a
    // 'ghost' row this crashed run inserted sits committed in the target.
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE city (city_id BIGINT PRIMARY KEY, " +
        "cname VARCHAR(50) NOT NULL UNIQUE)")
      st.execute("INSERT INTO city VALUES (100, 'oldtown')")   // pre-existed
      st.execute("INSERT INTO city VALUES (55, 'ghost')")      // crashed run's insert
      st.execute("CREATE TABLE city__pre (cname VARCHAR(50))")
      st.execute("INSERT INTO city__pre VALUES ('oldtown')")   // snapshot before merge
      st.execute("CREATE TABLE city__stage (city_id BIGINT, cname VARCHAR(50))")
      st.execute("INSERT INTO city__stage VALUES (1, 'oldtown')")
      st.execute("INSERT INTO city__stage VALUES (55, 'ghost')")
    } finally conn.close()

    val cityT = TargetInfo("city", "", "city_id", Seq("cname"), Nil)
    val cities = Seq((1L, "oldtown"), (2L, "newtown")).toDF("city_id", "cname")
    JdbcUpsertSink.loadAllOrNothing(spark, url, props, Seq(cityT -> cities), DerbyDialect)

    // The fossil was compensated away (stage-minus-pre), the pre-existing
    // row survived, and the fresh load merged normally on top.
    assert(query("SELECT city_id, cname FROM city ORDER BY cname") ===
      Seq(Seq(2L, "newtown"), Seq(100L, "oldtown")))
    assert(query("SELECT count(*) FROM SYS.SYSTABLES WHERE TABLENAME LIKE '%__PRE'")
      .head.head === 0)
  }

  test("the success-marker table name is a cross-version contract") {
    // Recovery decides compensate-vs-cleanup by this NAME: renaming it
    // would orphan markers written by a previous version mid-crash and
    // compensate their fully committed loads away.
    assert(JdbcUpsertSink.markerTable === "graft__load_ok")
  }

  test("loadAllOrNothing: a post-SUCCESS crash is cleaned up, never compensated") {
    // Simulate a driver death AFTER all merges committed and the success
    // marker was written, but BEFORE cleanup finished: __pre + __stage are
    // leftover exactly as in the mid-load crash — only the marker
    // disambiguates. Startup must keep the committed rows (drop-only),
    // not compensate them away as a partial load.
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE port (port_id BIGINT PRIMARY KEY, " +
        "pname VARCHAR(50) NOT NULL UNIQUE)")
      st.execute("INSERT INTO port VALUES (100, 'old')")   // pre-existed
      st.execute("INSERT INTO port VALUES (55, 'fresh')")  // committed by the crashed run
      st.execute("CREATE TABLE port__pre (pname VARCHAR(50))")
      st.execute("INSERT INTO port__pre VALUES ('old')")
      st.execute("CREATE TABLE port__stage (port_id BIGINT, pname VARCHAR(50))")
      st.execute("INSERT INTO port__stage VALUES (1, 'old')")
      st.execute("INSERT INTO port__stage VALUES (55, 'fresh')")
      st.execute(s"CREATE TABLE ${JdbcUpsertSink.markerTable} (ok INT)")
    } finally conn.close()

    val portT = TargetInfo("port", "", "port_id", Seq("pname"), Nil)
    val ports = Seq((1L, "old"), (2L, "newer")).toDF("port_id", "pname")
    JdbcUpsertSink.loadAllOrNothing(spark, url, props, Seq(portT -> ports), DerbyDialect)

    // 'fresh' SURVIVED (it was a committed success, not a fossil), and the
    // new load merged on top; marker and snapshots are gone.
    assert(query("SELECT port_id, pname FROM port ORDER BY pname") ===
      Seq(Seq(55L, "fresh"), Seq(2L, "newer"), Seq(100L, "old")))
    assert(query("SELECT count(*) FROM SYS.SYSTABLES WHERE TABLENAME LIKE '%__PRE'")
      .head.head === 0)
    assert(query(s"SELECT count(*) FROM SYS.SYSTABLES WHERE TABLENAME = " +
      s"'${JdbcUpsertSink.markerTable.toUpperCase}'").head.head === 0)
  }

  test("loadAllOrNothing: post-SUCCESS cleanup covers a DIFFERENT target set's pairs") {
    // The marker is database-global but a crashed run's TARGET SET may
    // differ from the next caller's. Recovery must discover the marked
    // run's pairs from catalog metadata — cleaning only the current
    // call's pairs would leave the other set's pairs marker-less, and a
    // later run covering them would compensate fully committed rows away.
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE pier (pier_id BIGINT PRIMARY KEY, " +
        "qname VARCHAR(50) NOT NULL UNIQUE)")
      st.execute("INSERT INTO pier VALUES (55, 'done')")  // committed by the crashed run
      st.execute("CREATE TABLE pier__pre (qname VARCHAR(50))")
      st.execute("CREATE TABLE pier__stage (pier_id BIGINT, qname VARCHAR(50))")
      st.execute("INSERT INTO pier__stage VALUES (55, 'done')")
      st.execute(s"CREATE TABLE ${JdbcUpsertSink.markerTable} (ok INT)")
      // the next caller loads a DIFFERENT table entirely
      st.execute("CREATE TABLE dock (dock_id BIGINT PRIMARY KEY, " +
        "dname VARCHAR(50) NOT NULL UNIQUE)")
    } finally conn.close()

    val dockT = TargetInfo("dock", "", "dock_id", Seq("dname"), Nil)
    val docks = Seq((1L, "north")).toDF("dock_id", "dname")
    JdbcUpsertSink.loadAllOrNothing(spark, url, props, Seq(dockT -> docks), DerbyDialect)

    // pier's pair was cleaned (stage emptied, pre dropped) even though
    // pier was not in this call's targets — and its committed row
    // survived. A later pier-covering run now finds nothing to compensate.
    assert(query("SELECT count(*) FROM SYS.SYSTABLES WHERE TABLENAME = 'PIER__PRE'")
      .head.head === 0)
    assert(query("SELECT count(*) FROM pier__stage").head.head === 0)
    assert(query("SELECT pier_id, qname FROM pier") === Seq(Seq(55L, "done")))
    assert(query("SELECT dname FROM dock") === Seq(Seq("north")))
    val pierT = TargetInfo("pier", "", "pier_id", Seq("qname"), Nil)
    val piers = Seq((1L, "done")).toDF("pier_id", "qname")
    JdbcUpsertSink.loadAllOrNothing(spark, url, props, Seq(pierT -> piers), DerbyDialect)
    assert(query("SELECT pier_id, qname FROM pier") === Seq(Seq(55L, "done")))
  }

  test("loadAllOrNothing: a FAILED marker-present cleanup keeps the marker") {
    // Regression pin for the round-6 advice: if a pair's DROP fails for a
    // reason OTHER than does-not-exist (here: a dependent view), recovery
    // must PROPAGATE and keep the marker. The old code swallowed the
    // failure and dropped the marker, so the next run's no-marker branch
    // compensated the committed run's rows away — data loss.
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE quay (quay_id BIGINT PRIMARY KEY, " +
        "yname VARCHAR(50) NOT NULL UNIQUE)")
      st.execute("INSERT INTO quay VALUES (55, 'kept')") // committed by the marked run
      st.execute("CREATE TABLE quay__pre (yname VARCHAR(50))")
      st.execute("CREATE TABLE quay__stage (quay_id BIGINT, yname VARCHAR(50))")
      st.execute("INSERT INTO quay__stage VALUES (55, 'kept')")
      st.execute(s"CREATE TABLE ${JdbcUpsertSink.markerTable} (ok INT)")
      // a dependent view makes DROP TABLE quay__pre fail (Derby X0Y23)
      st.execute("CREATE VIEW quay_v AS SELECT * FROM quay__pre")
    } finally conn.close()

    val wharfT = TargetInfo("wharf", "", "wharf_id", Seq("wname"), Nil)
    val wharfs = Seq((1L, "west")).toDF("wharf_id", "wname")
    intercept[java.sql.SQLException] {
      JdbcUpsertSink.loadAllOrNothing(spark, url, props, Seq(wharfT -> wharfs), DerbyDialect)
    }
    // marker SURVIVED the failed cleanup — the pair stays drop-only
    assert(query(s"SELECT count(*) FROM SYS.SYSTABLES WHERE TABLENAME = " +
      s"'${JdbcUpsertSink.markerTable.toUpperCase}'").head.head === 1)

    // unblock and re-run: recovery completes, the committed row SURVIVES
    // (under the old marker-dropping code this run compensated it away)
    val c2 = java.sql.DriverManager.getConnection(url, props)
    try c2.createStatement().execute("DROP VIEW quay_v") finally c2.close()
    val c3 = java.sql.DriverManager.getConnection(url, props)
    try c3.createStatement().execute("CREATE TABLE wharf (wharf_id BIGINT PRIMARY KEY, " +
      "wname VARCHAR(50) NOT NULL UNIQUE)") finally c3.close()
    JdbcUpsertSink.loadAllOrNothing(spark, url, props, Seq(wharfT -> wharfs), DerbyDialect)
    assert(query("SELECT quay_id, yname FROM quay") === Seq(Seq(55L, "kept")))
    assert(query("SELECT count(*) FROM SYS.SYSTABLES WHERE TABLENAME = 'QUAY__PRE'")
      .head.head === 0)
    assert(query(s"SELECT count(*) FROM SYS.SYSTABLES WHERE TABLENAME = " +
      s"'${JdbcUpsertSink.markerTable.toUpperCase}'").head.head === 0)
  }

  test("typed error mapping: FK violation during merge -> ForeignKeyViolationException") {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE dept (dept_id BIGINT PRIMARY KEY, " +
        "dname VARCHAR(50) NOT NULL UNIQUE)")
      st.execute("CREATE TABLE emp (emp_id BIGINT PRIMARY KEY, " +
        "ename VARCHAR(50) NOT NULL UNIQUE, " +
        "dept_id BIGINT NOT NULL REFERENCES dept (dept_id))")
    } finally conn.close()

    val empTarget = TargetInfo("emp", "", "emp_id", Seq("ename"), Seq("dept_id"))
    // No parent load in this call -> dept_id 999 dangles; Derby raises
    // SQLState 23503 inside the merge, which must surface typed.
    val emps = Seq((1L, "eve", 999L)).toDF("emp_id", "ename", "dept_id")
    val ex = intercept[ForeignKeyViolationException] {
      JdbcUpsertSink.load(spark, url, props, Seq(empTarget -> emps), DerbyDialect)
    }
    assert(ex.table === "emp")
    assert(ex.getCause.asInstanceOf[java.sql.SQLException].getSQLState === "23503")
  }

  test("typed error mapping: secondary unique violation -> UniqueViolationException") {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      conn.createStatement().execute("CREATE TABLE person (person_id BIGINT PRIMARY KEY, " +
        "pname VARCHAR(50) NOT NULL UNIQUE, email VARCHAR(50) NOT NULL UNIQUE)")
    } finally conn.close()

    val personTarget = TargetInfo("person", "", "person_id", Seq("pname"), Nil)
    // Natural keys differ (no conflict-skip), but both rows share an email —
    // the SECONDARY unique constraint fires: SQLState 23505, surfaced typed.
    val people = Seq((1L, "ann", "x@y"), (2L, "amy", "x@y"))
      .toDF("person_id", "pname", "email")
    val ex = intercept[UniqueViolationException] {
      JdbcUpsertSink.load(spark, url, props, Seq(personTarget -> people), DerbyDialect)
    }
    assert(ex.table === "person")
    assert(ex.getCause.asInstanceOf[java.sql.SQLException].getSQLState === "23505")
  }
}
