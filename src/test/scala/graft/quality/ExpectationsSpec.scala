package graft.quality

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.SparkSpec
import graft.pipeline._
import Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    (1, "AA", 100.0, "ok"),
    (2, "DL", 200.0, "ok"),
    (3, null, 5000.0, "bad"),
    (4, "UA", -1.0, "ok")
  ).toDF("id", "code", "dist", "status")

  test("passing and failing checks evaluate in one report") {
    val report = validate(df, Seq(
      rowCountBetween(1, 100),
      columnExists("id", "code"),
      notNull("code", mostly = 0.7),   // 3/4 = 0.75 ≥ 0.7 → pass
      notNull("code", mostly = 0.9),   // 0.75 < 0.9 → fail
      between("dist", 0, 1000, mostly = 0.5), // nulls none; 2/4 in range... -1 and 5000 out → 0.5 → pass
      unique("id"),
      unique("status"),                 // duplicates → fail
      inSet("status", Seq("ok", "bad")),
      ofType("id", IntegerType)))
    assert(report.total === 9)
    assert(report.failed === 2)
    val failures = report.results.filterNot(_.success).map(_.name)
    assert(failures.exists(_.startsWith("not_null(code,mostly=0.9")))
    assert(failures.contains("unique(status)"))
  }

  test("between ignores nulls (GE semantics)") {
    val d = Seq(Some(10.0), None, Some(20.0)).toDF("x")
    val report = validate(d, Seq(between("x", 0, 100)))
    assert(report.success)
  }

  test("empty data: row count fails, ratio checks pass vacuously") {
    val d = Seq.empty[(Int, String)].toDF("id", "code")
    val report = validate(d, Seq(rowCountBetween(1), notNull("code")))
    assert(!report.results.head.success)
    assert(report.results(1).success)
  }

  test("reference suites pass on the fixture pipeline") {
    val clock = lit("2025-02-01 00:00:00").cast("timestamp")
    val bronze = Bronze.ingest(spark, fixture("flights.csv"),
      fixture("L_AIRPORT_ID.csv"), fixture("L_UNIQUE_CARRIERS.csv"),
      clock, inferSchema = false)
    val silver = Silver.transform(bronze)
    assert(validate(bronze, FlightSuites.bronze).success,
      validate(bronze, FlightSuites.bronze).summary)

    // fixture rows deliberately include invalid speeds/distances; check
    // the suite runs and the structural checks pass
    val silverReport = validate(silver, FlightSuites.silver)
    assert(silverReport.results.filter(r =>
      r.name.startsWith("columns_exist") || r.name.startsWith("in_set") ||
      r.name.startsWith("between(DATA_QUALITY_SCORE")).forall(_.success),
      silverReport.summary)

    val dimDate = GoldDims.dimDate(spark)
    assert(validate(dimDate, FlightSuites.dimDate).success)
    val dimTime = GoldDims.dimTime(spark)
    assert(validate(dimTime, FlightSuites.dimTime).success)
    val dimAirport = GoldDims.dimAirport(silver, clock)
    assert(validate(dimAirport, FlightSuites.dimAirport).success)
    val dimRoute = GoldDims.dimRoute(silver, clock)
    assert(validate(dimRoute, FlightSuites.dimRoute).success)
    val fact = FactFlights.build(silver, dimDate, dimAirport,
      GoldDims.dimAirline(silver, clock), dimRoute)
    assert(validate(fact, FlightSuites.factFlights).success,
      validate(fact, FlightSuites.factFlights).summary)
  }

  test("corpus suites pass on the testdata tables, one scan each") {
    val t = graft.core.Tables.Tpch(spark, "/root/testdata/sf0.001")
    val docs = validate(t.documents, CorpusSuites.documents)
    assert(docs.success, docs.summary)
    val vecs = validate(t.embeddings, CorpusSuites.embeddings())
    assert(vecs.success, vecs.summary)
  }

  test("corpus suites catch the defects they claim to") {
    import spark.implicits._
    // drifted n_chars + out-of-domain lang
    val badDocs = Seq(
      (1L, "hello world", "en", "src0", 11L),
      (2L, "short", "xx", "src0", 99L)) // lang out of domain, n_chars wrong
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = validate(badDocs, CorpusSuites.documents)
    val failed = r.results.filterNot(_.success).map(_.name)
    assert(failed.exists(_.startsWith("in_set(lang")), r.summary)
    assert(failed.exists(_.contains("n_chars_matches_text")), r.summary)
    // NaN embedding + ragged dims + duplicate key
    val badVecs = Seq(
      (1L, Array(1.0f, Float.NaN), 3),
      (1L, Array(1.0f), 12))
      .toDF("vec_id", "embedding", "label")
    val v = validate(badVecs, CorpusSuites.embeddings(dims = 2))
    val vf = v.results.filterNot(_.success).map(_.name)
    assert(vf.exists(_.contains("embedding_all_finite")), v.summary)
    assert(vf.exists(_.contains("embedding_dim_2")), v.summary)
    assert(vf.exists(_.startsWith("unique(vec_id")), v.summary)
    assert(vf.exists(_.startsWith("between(label")), v.summary)
  }
}
