package graft.matching

import org.apache.spark.ml.util.MLWritable
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** M7 + S6 — filesystem model registry standing in for the MLflow registry
  * (ref `03_Train & Deploy Model.py:283-343`): versioned saves under
  * `<root>/<name>/v<N>/`, plus a `production` pointer file implementing the
  * stage-transition lifecycle (archive old → promote new). Transport only;
  * the persisted bytes are MLlib's own MLWriter format (S6, `01:517-531`).
  */
object ModelStore {

  def save(model: MLWritable, root: String, name: String): Int = {
    val dir = Paths.get(root, name)
    Files.createDirectories(dir)
    val next = versions(root, name).maxOption.getOrElse(0) + 1
    model.write.overwrite().save(dir.resolve(s"v$next").toString)
    next
  }

  /** Register a new version from an existing one's artifact (file-level
    * copy). The registry op for "promote this exact artifact again" —
    * re-serializing an unchanged model through MLWriter costs a full
    * Spark write job per pipeline stage; a directory copy is metadata-rate.
    * Returns the new version number. */
  def copyVersion(root: String, name: String, fromVersion: Int): Int = {
    val dir = Paths.get(root, name)
    val src = dir.resolve(s"v$fromVersion")
    require(Files.exists(src), s"no version v$fromVersion under $dir")
    val next = versions(root, name).maxOption.getOrElse(0) + 1
    val dst = dir.resolve(s"v$next")
    org.apache.commons.io.FileUtils.copyDirectory(src.toFile, dst.toFile)
    // the artifact's run-metric record travels with the artifact: a
    // re-registered copy IS the same fitted model, so its measured
    // metric still describes it
    val m = dir.resolve(s"v$fromVersion.metrics")
    if (Files.exists(m))
      Files.copy(m, dir.resolve(s"v$next.metrics"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** The run-metric record logged with a registered version — what the
    * reference's registry stores beside each model (the validation
    * metric of the run that produced it, `03:300-314`): metric name,
    * value, a fingerprint of the frame it was measured on, and the
    * hyperparameters. Answers "which Production model, at what measured
    * quality, trained how?" from the registry alone. */
  final case class RunMetric(metric: String, value: Double,
                             frameFingerprint: String,
                             params: Map[String, String])

  /** Persist a version's run metric (one sidecar per version; a re-log
    * overwrites — the record describes the version, and a version's
    * artifact never changes after save). */
  def logMetric(root: String, name: String, version: Int,
                metric: String, value: Double,
                frameFingerprint: String = "",
                params: Map[String, String] = Map.empty): Unit = {
    require(versions(root, name).contains(version),
      s"no version v$version under $root/$name")
    // EVERY persisted field must be TSV-safe, not just the metric name:
    // a tab inside a param value would silently truncate it on read, a
    // newline inside the fingerprint would parse its tail as a bogus
    // param — fail at write time instead
    def tsvSafe(label: String, s: String): Unit =
      require(!s.contains("\t") && !s.contains("\n") && !s.contains("\r"),
        s"$label must be TSV-safe (no tab/newline): ${s.take(80)}")
    tsvSafe("metric name", metric)
    tsvSafe("frameFingerprint", frameFingerprint)
    params.foreach { case (k, v) =>
      tsvSafe("param key", k); tsvSafe(s"param '$k' value", v)
    }
    val lines = s"$metric\t$value\t$frameFingerprint" +:
      params.toSeq.sorted.map { case (k, v) => s"$k\t$v" }
    Files.writeString(Paths.get(root, name, s"v$version.metrics"),
      lines.mkString("\n"))
  }

  /** The whole registry as ONE queryable frame — (version, stage,
    * metric, value, frame_fingerprint, params) per registered version —
    * so "which Production model, at what measured quality, trained
    * how?" is a DataFrame filter instead of a file spelunk (the view
    * the reference reads off its registry UI, `03:300-343`). Driver-side
    * listing is correct here by construction: a registry holds FEW
    * versions (they are promoted artifacts, not data), and the frame
    * exists to JOIN against evaluation tables, not to carry volume.
    * Params ride as a proper MAP column — a rendered `k=v;…` string
    * would be ambiguous for values containing the separators (which the
    * TSV guard deliberately allows). */
  def metricsTable(spark: org.apache.spark.sql.SparkSession, root: String,
                   name: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    versions(root, name).sorted.map { v =>
      val m = readMetric(root, name, v)
      (v, stage(root, name, v),
        m.map(_.metric), m.map(_.value), m.map(_.frameFingerprint),
        m.map(_.params).getOrElse(Map.empty[String, String]))
    }.toDF("version", "stage", "metric", "value", "frame_fingerprint",
      "params")
  }

  /** The version's recorded run metric, if one was logged. */
  def readMetric(root: String, name: String, version: Int): Option[RunMetric] = {
    val p = Paths.get(root, name, s"v$version.metrics")
    if (!Files.exists(p)) None
    else {
      val lines = Files.readString(p).linesIterator.toSeq
      val head = lines.head.split('\t')
      Some(RunMetric(head(0), head(1).toDouble,
        if (head.length > 2) head(2) else "",
        lines.tail.filter(_.nonEmpty).map { l =>
          val a = l.split('\t'); a(0) -> (if (a.length > 1) a(1) else "")
        }.toMap))
    }
  }

  def versions(root: String, name: String): Seq[Int] = {
    val dir = Paths.get(root, name)
    if (!Files.exists(dir)) Seq.empty
    else {
      val stream = Files.list(dir) // must close — holds a directory handle
      try stream.iterator().asScala
        .map(_.getFileName.toString).filter(_.matches("v\\d+"))
        .map(_.drop(1).toInt).toSeq
      finally stream.close()
    }
  }

  /** Version stages, mirroring the MLflow registry lifecycle the reference
    * drives (`03:326-343`): `None` (fresh save) → `Staging`/`Production` →
    * `Archived`. The stage is a per-version file; every transition appends
    * to `transitions.log` (the registry's audit trail). */
  val Stages: Set[String] = Set("None", "Staging", "Production", "Archived")

  /** The version's lifecycle stage. "Production" is DEFINED by the
    * `production` pointer file, not the per-version stage file: the
    * promote sequence ([[setProduction]]) is a multi-file transition
    * (archive old stage file → write new stage file → log → move
    * pointer) with no transactional boundary, so a crash or a racing
    * promote can leave two stage files claiming Production or a stage
    * file disagreeing with the pointer. Reading through the pointer
    * reconciles every such state to ONE Production version: the pointer
    * holder reads Production regardless of its stage file, and a stale
    * "Production" stage file on any other version reads as Archived
    * (what a completed promote would have written). */
  def stage(root: String, name: String, version: Int): String = {
    val p = Paths.get(root, name, s"v$version.stage")
    val fromFile = if (Files.exists(p)) Files.readString(p).trim else "None"
    val ptr = productionVersion(root, name)
    if (ptr.contains(version)) "Production"
    else if (fromFile == "Production") "Archived" // stale file: pointer moved
    else fromFile
  }

  /** All versions currently in `s` (e.g. the Archived history). */
  def versionsInStage(root: String, name: String, s: String): Seq[Int] =
    versions(root, name).filter(v => stage(root, name, v) == s).sorted

  /** Move a version between the non-Production stages. "Production" is
    * REJECTED here: the pointer file is what defines Production
    * ([[stage]] reconciles through it), so a direct
    * setStage(..., "Production") that never moved the pointer would
    * append `-> Production` to the audit log while reading back as
    * Archived — log and read path contradicting each other.
    * [[setProduction]] is the only Production writer. */
  def setStage(root: String, name: String, version: Int, to: String): Unit = {
    require(to != "Production",
      "Production is defined by the pointer file — promote via " +
        "setProduction(root, name, version), which archives the previous " +
        "holder and moves the pointer")
    writeStage(root, name, version, to)
  }

  private def writeStage(root: String, name: String, version: Int,
                         to: String): Unit = {
    require(Stages.contains(to), s"unknown stage '$to' (valid: $Stages)")
    require(versions(root, name).contains(version),
      s"no version v$version under $root/$name")
    val from = stage(root, name, version)
    Files.writeString(Paths.get(root, name, s"v$version.stage"), to)
    val log = Paths.get(root, name, "transitions.log")
    Files.writeString(log, s"v$version: $from -> $to\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** Promote a version to Production: the PREVIOUS Production version (if
    * any) transitions to Archived first — the
    * `archive_existing_versions=True` semantics of the reference's MLflow
    * promote (`03:326-343`) — then the pointer moves. The pointer file
    * stays the single serve-time read ([[productionPath]]); stages are
    * the queryable lifecycle history around it. */
  def setProduction(root: String, name: String, version: Int): Unit = {
    productionVersion(root, name)
      .filter(prev => prev != version && versions(root, name).contains(prev))
      .foreach(prev => writeStage(root, name, prev, "Archived"))
    writeStage(root, name, version, "Production")
    Files.writeString(Paths.get(root, name, "production"), version.toString)
  }

  def productionVersion(root: String, name: String): Option[Int] = {
    val p = Paths.get(root, name, "production")
    if (Files.exists(p)) Some(Files.readString(p).trim.toInt) else None
  }

  /** Path of the Production model, for `XxxModel.load`. */
  def productionPath(root: String, name: String): String = {
    val v = productionVersion(root, name).getOrElse(
      throw new IllegalStateException(s"no production version for $name"))
    Paths.get(root, name, s"v$v").toString
  }
}
