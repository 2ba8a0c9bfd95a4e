#!/bin/bash
# Direct-JVM bench runner (no sbt): mirrors the driver's Bench invocation.
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
# 16g measured fastest for the full catalog at sf0.1: a 90g heap made
# G1 spread allocations over cold pages (first-touch faults dominated)
# and the run degraded 2x; sf0.1 fits comfortably in 16g.
# 2g code cache: 113 queries x 5 reps of whole-stage codegen emit
# enough generated classes that 1g triggered flushing+recompilation
# visible as descending rep times (see BENCH_NOTES round 5)
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-16g} \
  -XX:ReservedCodeCacheSize=${SPARK_CODE_CACHE:-2g} -XX:+UseCodeCacheFlushing \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "${MAIN:-graft.Bench}" "$@"
