// The dry run's USER application — a deliberately separate sbt project
// that consumes graft exactly as an adopter would: Spark provided by the
// platform, the graft library jar dropped into lib/ (the script copies
// it from the repo's `sbt package` output).
name := "graft-dryrun-userapp"
scalaVersion := "2.13.17"
// SPARK_JARS_DIR is exported by dryrun.sh from the spark-submit it was
// pointed at, so a non-/opt/spark install builds against the same jars
// it will run on
Compile / unmanagedJars ++=
  (file(sys.env.getOrElse("SPARK_JARS_DIR", "/opt/spark/jars")) ** "*.jar").classpath
