package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GeomFunctions._

/** Oracle-checked coverage for the geometry family (SURVEY A7/F1-F3/
  * F18-F19). The testdata has no geometry tables, so each query
  * synthesizes deterministic polygons from `part` integer columns and
  * the oracle verifies against an INDEPENDENT closed-form derivation
  * (rectangle area = w*h, envelope = corners, WKT via printf) rather
  * than re-running the same fold — a stronger check than mirrored SQL.
  *
  * All geometry ops are narrow HOF maps: at 100 TB they pipeline inside
  * whole-stage codegen'd scans with zero shuffle.
  */
object GeomQueries {
  private def part50(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .filter(col("p_partkey") < 50)
      .withColumn("x0", expr("cast(p_partkey % 10 as double)"))
      .withColumn("y0", expr("cast(p_partkey % 7 as double)"))
      .withColumn("w", expr("cast(1 + p_partkey % 5 as double)"))
      .withColumn("h", expr("cast(1 + p_partkey % 3 as double)"))

  /** Unclosed 4-corner rectangle ring (tests F1's no-closure quirk). */
  private val openGeom = expr(
    """array(array(
      |  array(x0, y0), array(x0 + w, y0),
      |  array(x0 + w, y0 + h), array(x0, y0 + h)))""".stripMargin)

  /** Closed 5-point rectangle ring. */
  private val closedGeom = expr(
    """array(array(
      |  array(x0, y0), array(x0 + w, y0), array(x0 + w, y0 + h),
      |  array(x0, y0 + h), array(x0, y0)))""".stripMargin)

  private val oracleBase =
    """WITH g AS (SELECT p_partkey,
      |  CAST(p_partkey % 10 AS DOUBLE) AS x0,
      |  CAST(p_partkey % 7 AS DOUBLE) AS y0,
      |  CAST(1 + p_partkey % 5 AS DOUBLE) AS w,
      |  CAST(1 + p_partkey % 3 AS DOUBLE) AS h
      | FROM part WHERE p_partkey < 50)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: outer-ring-only WKT, ring NOT closed (reference quirk).
    "g1_wkt_ring" -> ((s, dir) =>
      part50(s, dir)
        .select(col("p_partkey"), wktOuterRing(openGeom).as("wkt"))
        .orderBy("p_partkey")),

    // A7/F18: shoelace area, perimeter, point count, validity — oracle
    // checks the closed forms (w*h, 2(w+h)).
    "g2_geom_stats" -> ((s, dir) =>
      part50(s, dir)
        .select(col("p_partkey"),
          floor(stArea(closedGeom) + 0.5).cast("long").as("area_i"),
          floor(stPerimeter(closedGeom) + 0.5).cast("long").as("perim_i"),
          stNumPoints(closedGeom).as("n_points"),
          stIsValid(closedGeom).as("is_valid"))
        .orderBy("p_partkey")),

    // A7 bounds: envelope fold vs corner closed form.
    "g3_envelope" -> ((s, dir) =>
      part50(s, dir)
        .withColumn("env", stEnvelope(closedGeom))
        .select(col("p_partkey"),
          col("env.xmin").cast("long").as("xmin_i"),
          col("env.ymin").cast("long").as("ymin_i"),
          col("env.xmax").cast("long").as("xmax_i"),
          col("env.ymax").cast("long").as("ymax_i"))
        .orderBy("p_partkey")),

    // F2: colon-string parse WITH ring closure (seg-etl quirk) → WKT.
    "g4_colon_parse" -> ((s, dir) =>
      part50(s, dir)
        .withColumn("colon", expr(
          """concat('[', cast(p_partkey % 10 as int), ':',
            | cast(p_partkey % 7 as int), ':',
            | cast(p_partkey % 10 + 1 + p_partkey % 5 as int), ':',
            | cast(p_partkey % 7 as int), ':',
            | cast(p_partkey % 10 + 1 + p_partkey % 5 as int), ':',
            | cast(p_partkey % 7 + 1 + p_partkey % 3 as int), ']')"""
            .stripMargin))
        .withColumn("geom", polygonFromColonString(col("colon")))
        .select(col("p_partkey"), wktOuterRing(col("geom")).as("wkt"),
          stNumPoints(col("geom")).as("n_points"))
        .orderBy("p_partkey")),

    // F3: denormalized WKT (x*width, y*height, %.2f, closes the ring).
    "g5_denorm_wkt" -> ((s, dir) =>
      part50(s, dir)
        .withColumn("norm_geom", expr(
          """array(array(
            | array(x0 / 10.0, y0 / 7.0),
            | array((x0 + w) / 10.0, y0 / 7.0),
            | array((x0 + w) / 10.0, (y0 + h) / 7.0),
            | array(x0 / 10.0, (y0 + h) / 7.0)))""".stripMargin))
        .select(col("p_partkey"),
          wktDenormalized(col("norm_geom"), lit(1000.0), lit(2000.0))
            .as("wkt"))
        .orderBy("p_partkey")),

    // Spatial point-in-polygon JOIN via grid binning — the scale
    // pattern for "which marks fall inside which regions": polygons
    // explode to the 2.0-unit grid cells their envelope covers (a
    // bounded fan-out), points key to their single cell, and the
    // equi-join on (cx, cy) replaces the quadratic cross join; the
    // exact even-odd ray cast (stContains) then verifies candidates
    // — inverted-index + verify, same shape as LSH/d10. Points sit
    // at half-integer offsets so no test point lies on a polygon
    // edge (boundary floats are ambiguous). The oracle never sees
    // the grid: rectangles make containment a CLOSED-FORM strict
    // bbox test, independently derived — while the engine runs the
    // general concave-capable ray cast (concavity itself is pinned
    // by GeomFunctionsSpec).
    "g7_grid_pip_join" -> ((s, dir) => {
      val cell = 2.0
      val polyCells = part50(s, dir)
        .withColumn("geom", closedGeom)
        .select(col("p_partkey"), col("geom"), col("y0"), col("h"),
          explode(expr(s"sequence(cast(floor(x0 / $cell) as int), " +
            s"cast(floor((x0 + w) / $cell) as int))")).as("cx"))
        .select(col("p_partkey"), col("geom"), col("cx"),
          explode(expr(s"sequence(cast(floor(y0 / $cell) as int), " +
            s"cast(floor((y0 + h) / $cell) as int))")).as("cy"))
      val pts = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < 2000)
        .select(col("c_custkey"),
          (col("c_custkey") % 12 + 0.5).cast("double").as("px"),
          (col("c_custkey") % 9 + 0.5).cast("double").as("py"))
        .withColumn("cx", floor(col("px") / cell).cast("int"))
        .withColumn("cy", floor(col("py") / cell).cast("int"))
      polyCells.join(pts, Seq("cx", "cy"))
        .filter(stContains(col("geom"), col("px"), col("py")))
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_pts"))
        .orderBy("p_partkey")
    }),

    // Radius-bounded nearest neighbor (distance-≤r NN join) over a
    // deterministic point set, grid-blocked: with cell = r, a
    // point's every within-radius neighbor provably lies in its 3×3
    // cell neighborhood — LOSSLESS blocking (the claim the n² oracle
    // tests), and candidate volume is density-bounded per cell,
    // never n². Coordinates are eighths (k + m/8), so squared
    // distances are exact multiples of 1/64 and d2×64 is an exact
    // integer on both engines; argmin = min(struct(d2_e64, nb)) with
    // the neighbor id as deterministic tie-break. The same shape at
    // 100 TB: one explode(9 cells) map, one equi-join on the cell
    // key, one map-side-combined min-struct agg.
    "g8_radius_nn" -> ((s, dir) => {
      val cell = 2.0
      val pts = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("id"),
          ((col("c_custkey") % 61) +
            (col("c_custkey") % 7) / lit(8.0)).as("px"),
          ((col("c_custkey") % 53) +
            (col("c_custkey") % 5) / lit(8.0)).as("py"))
        .withColumn("cx", floor(col("px") / cell).cast("int"))
        .withColumn("cy", floor(col("py") / cell).cast("int"))
      val probe = pts
        .withColumn("ncx",
          explode(array(col("cx") - 1, col("cx"), col("cx") + 1)))
        .withColumn("ncy",
          explode(array(col("cy") - 1, col("cy"), col("cy") + 1)))
        .select(col("id"), col("px"), col("py"), col("ncx"), col("ncy"))
      val build = pts.select(col("id").as("nb"),
        col("px").as("qx"), col("py").as("qy"),
        col("cx").as("ncx"), col("cy").as("ncy"))
      probe.join(build, Seq("ncx", "ncy"))
        .filter(col("id") =!= col("nb"))
        .withColumn("d2",
          (col("px") - col("qx")) * (col("px") - col("qx")) +
            (col("py") - col("qy")) * (col("py") - col("qy")))
        // r² derived from the CELL so the lossless-blocking invariant
        // (r ≤ cell ⇒ 3×3 neighborhood suffices) can't be broken by
        // editing one literal without the other
        .filter(col("d2") <= lit(cell * cell))
        .groupBy(col("id"))
        .agg(min(struct((col("d2") * 64).cast("long").as("d2_e64"),
          col("nb"))).as("m"))
        .select(col("id").as("c_custkey"), col("m.nb").as("nn_id"),
          col("m.d2_e64").as("d2_e64"))
        .orderBy("c_custkey")
    }),

    // F18 `.geom_type`: canonical CamelCase from a declared GeoJSON
    // type, case-insensitively; unknown types → null (the reference's
    // extraction-failure → None path). Input casing is deliberately
    // mixed to exercise the normalization.
    "g6_geom_type" -> ((s, dir) =>
      part50(s, dir)
        .withColumn("raw", expr(
          """case cast(p_partkey % 6 as int)
            | when 0 then 'Polygon' when 1 then 'POINT'
            | when 2 then 'lineString' when 3 then 'MULTIPOLYGON'
            | when 4 then 'geometrycollection' else 'banana' end"""
            .stripMargin))
        .select(col("p_partkey"), col("raw"),
          stGeometryType(col("raw")).as("geom_type"))
        .orderBy("p_partkey"))
  )

  val oracle: Map[String, String] = Map(
    "g1_wkt_ring" -> (oracleBase + """
      |SELECT p_partkey,
      | printf('POLYGON ((%.2f %.2f, %.2f %.2f, %.2f %.2f, %.2f %.2f))',
      |  x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h) AS wkt
      |FROM g ORDER BY p_partkey""".stripMargin),
    "g2_geom_stats" -> (oracleBase + """
      |SELECT p_partkey,
      | CAST(w * h AS BIGINT) AS area_i,
      | CAST(2 * (w + h) AS BIGINT) AS perim_i,
      | 5::BIGINT AS n_points, true AS is_valid
      |FROM g ORDER BY p_partkey""".stripMargin),
    "g3_envelope" -> (oracleBase + """
      |SELECT p_partkey,
      | CAST(x0 AS BIGINT) AS xmin_i, CAST(y0 AS BIGINT) AS ymin_i,
      | CAST(x0 + w AS BIGINT) AS xmax_i, CAST(y0 + h AS BIGINT) AS ymax_i
      |FROM g ORDER BY p_partkey""".stripMargin),
    "g4_colon_parse" -> (oracleBase + """
      |SELECT p_partkey,
      | printf('POLYGON ((%.2f %.2f, %.2f %.2f, %.2f %.2f, %.2f %.2f))',
      |  x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0) AS wkt,
      | 4::BIGINT AS n_points
      |FROM g ORDER BY p_partkey""".stripMargin),
    "g5_denorm_wkt" -> (oracleBase + """
      |SELECT p_partkey,
      | printf('POLYGON ((%.2f %.2f, %.2f %.2f, %.2f %.2f, %.2f %.2f, %.2f %.2f))',
      |  x0 / 10.0 * 1000, y0 / 7.0 * 2000,
      |  (x0 + w) / 10.0 * 1000, y0 / 7.0 * 2000,
      |  (x0 + w) / 10.0 * 1000, (y0 + h) / 7.0 * 2000,
      |  x0 / 10.0 * 1000, (y0 + h) / 7.0 * 2000,
      |  x0 / 10.0 * 1000, y0 / 7.0 * 2000) AS wkt
      |FROM g ORDER BY p_partkey""".stripMargin),
    "g6_geom_type" -> (oracleBase + """
      |SELECT p_partkey,
      | CASE p_partkey % 6
      |  WHEN 0 THEN 'Polygon' WHEN 1 THEN 'POINT'
      |  WHEN 2 THEN 'lineString' WHEN 3 THEN 'MULTIPOLYGON'
      |  WHEN 4 THEN 'geometrycollection' ELSE 'banana' END AS raw,
      | CASE p_partkey % 6
      |  WHEN 0 THEN 'Polygon' WHEN 1 THEN 'Point'
      |  WHEN 2 THEN 'LineString' WHEN 3 THEN 'MultiPolygon'
      |  WHEN 4 THEN 'GeometryCollection' ELSE NULL END AS geom_type
      |FROM g ORDER BY p_partkey""".stripMargin),
    // closed-form strict bbox containment over the brute cross join —
    // no grid, no ray cast: fully independent of the engine plan
    "g7_grid_pip_join" -> (oracleBase + """,
      |pts AS (SELECT c_custkey,
      |  (c_custkey % 12) + 0.5 AS px, (c_custkey % 9) + 0.5 AS py
      | FROM customer WHERE c_custkey < 2000)
      |SELECT p_partkey, count(*) AS n_pts
      |FROM g JOIN pts ON px > x0 AND px < x0 + w
      |  AND py > y0 AND py < y0 + h
      |GROUP BY 1 ORDER BY 1""".stripMargin),

    // the independent n² spelling: every pair, no blocking
    "g8_radius_nn" ->
      """WITH pts AS (SELECT c_custkey AS id,
        |  (c_custkey % 61) + (c_custkey % 7)/8.0 AS px,
        |  (c_custkey % 53) + (c_custkey % 5)/8.0 AS py
        | FROM customer),
        |cand AS (SELECT a.id, b.id AS nb,
        |  (a.px-b.px)*(a.px-b.px) + (a.py-b.py)*(a.py-b.py) AS d2
        | FROM pts a JOIN pts b ON a.id <> b.id),
        |r AS (SELECT id, nb, d2, row_number() OVER
        |  (PARTITION BY id ORDER BY d2, nb) AS rn
        | FROM cand WHERE d2 <= 4.0)
        |SELECT id AS c_custkey, nb AS nn_id,
        | (d2*64)::BIGINT AS d2_e64
        |FROM r WHERE rn = 1 ORDER BY 1""".stripMargin
  )
}
