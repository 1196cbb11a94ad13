#!/bin/bash
cd /root/repo
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar; do OPENS="$OPENS --add-opens=$p=ALL-UNNAMED"; done
# internal deadline defaults to 1800s — 600s of emit headroom under the
# 2400s external timeout (the bench sizes its attempt to the measured
# host speed and hard-kills a phase that would ride past the deadline)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=24g timeout 2400 \
  java -cp "$CP" $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  graft.Bench > bench_r5.out 2> bench_r5.err
echo "rc=$?" >> bench_r5.out
