// The dry run's USER application — a deliberately separate sbt project
// that consumes graft exactly as an adopter would: Spark provided by the
// platform, the graft library jar dropped into lib/ (the script copies
// it from the repo's `sbt package` output).
name := "graft-dryrun-userapp"
scalaVersion := "2.13.17"
Compile / unmanagedJars ++= (file("/opt/spark/jars") ** "*.jar").classpath
