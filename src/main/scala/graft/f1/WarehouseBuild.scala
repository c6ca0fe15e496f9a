package graft.f1

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Interp

/** E1 warehouse build: raw telemetry samples → cleaned → per-lap 10 m
  * distance-grid resample → Hive-partitioned parquet warehouse.
  *
  * Re-expresses process_single_round (F1_Data_PreProcessing.ipynb:21-182)
  * Spark-first: the reference's ProcessPoolExecutor-per-round becomes
  * ordinary task parallelism; the per-(Driver,LapNumber) pandas groups
  * become a `groupByKey.flatMapGroups` — the one operator with no
  * built-in Spark equivalent (SURVEY §2.6).
  *
  * Scale notes (100 TB design):
  *  - The only shuffle is the groupByKey on (Year,Round,Driver,LapNumber).
  *    Groups are single laps (≤ a few thousand samples, ~100 KB), so
  *    per-group in-memory sort is safe at any corpus size; parallelism
  *    grows with the number of laps, not lap size. No skew risk: key
  *    cardinality is uniform.
  *  - Per-group failure isolation (reference `except: continue`) is the
  *    gate checks returning an empty iterator — a malformed lap never
  *    kills a task.
  */
object WarehouseBuild {
  import F1Constants._

  /** P2/P3 cleanup (F1_Data_PreProcessing.ipynb:58-61): drop rows with
    * null Speed/Distance/LapNumber; nGear/DRS null→0 and truncated to
    * int; Brake to int 0/1. Pure column expressions — stays in
    * whole-stage codegen, pushed to the scan where possible. */
  def clean(raw: DataFrame): DataFrame =
    raw
      // Time/Throttle/Brake feed non-nullable CleanSample doubles — a
      // null there must drop the ROW, not kill the task at encoding
      // time (the malformed-lap isolation contract)
      .na.drop(Seq("Speed", "Distance", "LapNumber", "Time", "Throttle", "Brake"))
      .select(
        col("Year").cast("long").as("Year"),
        col("Round").cast("long").as("Round"),
        col("Driver").cast("long").as("Driver"),
        col("LapNumber").cast("long").as("LapNumber"),
        col("Time").cast("double").as("Time"),
        col("Speed").cast("double").as("Speed"),
        coalesce(col("RPM").cast("double"), lit(0.0)).as("RPM"),
        coalesce(col("nGear"), lit(0.0)).cast("int").cast("double").as("nGear"),
        col("Throttle").cast("double").as("Throttle"),
        col("Brake").cast("int").cast("double").as("Brake"),
        coalesce(col("DRS"), lit(0.0)).cast("int").cast("double").as("DRS"),
        col("Distance").cast("double").as("Distance"),
        coalesce(col("Compound"), lit("UNKNOWN")).as("Compound"),
        coalesce(col("TyreLife").cast("double"), lit(0.0)).as("TyreLife"))

  /** The §2.6 custom operator. Per (Year,Round,Driver,LapNumber):
    * stable time order → dedup by Distance keep-first → validity gates
    * (≥10 samples, ≥2000 m) → grid arange(0, maxDist, 10) → linear
    * interp (Speed/RPM/Throttle) + nearest (Brake/nGear/DRS), both with
    * extrapolation → first-row Compound/TyreLife + LapTime = max−min
    * Time, replicated to every grid row. */
  def resample(cleaned: Dataset[CleanSample]): Dataset[TelemetryPoint] = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    cleaned
      .groupByKey(s => (s.Year, s.Round, s.Driver, s.LapNumber))
      .flatMapGroups((key: (Long, Long, Long, Long), it: Iterator[CleanSample]) =>
        resampleLap(key._1, key._2, key._3, key._4, it))
  }

  /** Pure per-lap kernel (unit-tested directly). */
  private[f1] def resampleLap(
      year: Long, round: Long, driver: Long, lap: Long,
      it: Iterator[CleanSample]): Iterator[TelemetryPoint] = {
    // stable document order = sample time order (Mongo insertion order)
    val timeOrdered = it.toArray.sortBy(_.Time)
    // drop_duplicates(subset=['Distance'], keep='first')
    val seen = new java.util.HashSet[java.lang.Double]()
    val dedup = timeOrdered.filter(s => seen.add(s.Distance))
    if (dedup.length < MinSamples) return Iterator.empty
    val maxDist = dedup.map(_.Distance).max
    if (maxDist < MinLapDistance) return Iterator.empty

    val compound = dedup.head.Compound
    val tyreLife = dedup.head.TyreLife
    val times = dedup.map(_.Time)
    val lapTime = times.max - times.min

    val byDist = dedup.sortBy(_.Distance)
    val xs = byDist.map(_.Distance)
    val speed = byDist.map(_.Speed)
    val rpm = byDist.map(_.RPM)
    val thr = byDist.map(_.Throttle)
    val brake = byDist.map(_.Brake)
    val gear = byDist.map(_.nGear)
    val drs = byDist.map(_.DRS)

    // np.arange(0, maxDist, 10) — length ceil(maxDist/10), excludes maxDist
    val n = math.ceil(maxDist / GridStep).toInt
    Iterator.tabulate(n) { k =>
      val x = k * GridStep
      TelemetryPoint(
        Distance = x.toFloat,
        Speed = Interp.linear(xs, speed, x).toFloat,
        RPM = Interp.linear(xs, rpm, x).toFloat,
        Throttle = Interp.linear(xs, thr, x).toFloat,
        Brake = Interp.nearest(xs, brake, x),
        nGear = Interp.nearest(xs, gear, x),
        DRS = Interp.nearest(xs, drs, x),
        Year = year, Round = round, Driver = driver, LapNumber = lap,
        Compound = compound, TyreLife = tyreLife, LapTime_Sec = lapTime)
    }
  }

  /** S5 partitioned sink: year=/round= layout, snappy (reference
    * F1_Data_PreProcessing.ipynb:133-139).
    *
    * Deliberate deviation from the reference's file shape: the
    * reference stores Year/Round BOTH in-file and as directory names
    * (a pandas artifact — SURVEY §1.2 note); Spark's case-insensitive
    * analyzer cannot even read such a tree with partition discovery
    * ("duplicate column" year vs Year). We store the keys once, as the
    * partition columns, and [[readWarehouse]] reconstructs the
    * canonical capitalized schema — same queries, same semantics, no
    * redundant bytes. */
  def writeWarehouse(points: Dataset[TelemetryPoint], root: String): Unit =
    points
      .withColumnRenamed("Year", "year")
      .withColumnRenamed("Round", "round")
      .withColumn("year", col("year").cast("int"))
      .withColumn("round", col("round").cast("int"))
      .write
      .partitionBy("year", "round")
      .option("compression", "snappy")
      .mode("overwrite")
      .parquet(root)

  /** Idempotent single-round rebuild — the reference's delete-then-
    * insert (F1_Data_Collect.ipynb:122) as dynamic partition overwrite:
    * only the partitions present in `points` are replaced; the rest of
    * the warehouse is untouched. Re-running a failed round is safe. */
  def overwriteRounds(points: Dataset[TelemetryPoint], root: String): Unit =
    points
      .withColumnRenamed("Year", "year")
      .withColumnRenamed("Round", "round")
      .withColumn("year", col("year").cast("int"))
      .withColumn("round", col("round").cast("int"))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("year", "round")
      .option("compression", "snappy")
      .mode("overwrite")
      .parquet(root)

  /** S6/S7 scan: full-tree read with partition discovery; Catalyst
    * prunes `year=`/`round=` directories on filter (upcast comparisons
    * on the reconstructed bigint Year/Round are unwrapped back onto
    * the int partition attributes, so pruning survives the rename).
    * Also accepts reference-shaped single-partition files that carry
    * in-file Year/Round. */
  def readWarehouse(spark: SparkSession, root: String): DataFrame = {
    val df = spark.read.parquet(root)
    val names = df.schema.fieldNames.toSet
    val (yearCol, roundCol) =
      if (names.contains("Year")) (col("Year"), col("Round")) // reference-shaped
      else (col("year").cast("long").as("Year"),
        col("round").cast("long").as("Round"))
    df.select(
      col("Distance"), col("Speed"), col("RPM"), col("Throttle"),
      col("Brake"), col("nGear"), col("DRS"), yearCol, roundCol,
      col("Driver"), col("LapNumber"), col("Compound"), col("TyreLife"),
      col("LapTime_Sec"))
  }

  /** End-to-end E1: raw → clean → resample (typed). */
  def build(spark: SparkSession, raw: DataFrame): Dataset[TelemetryPoint] = {
    import spark.implicits._
    resample(clean(raw).as[CleanSample])
  }
}
