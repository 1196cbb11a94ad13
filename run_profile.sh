#!/bin/bash
cd /root/repo
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar; do OPENS="$OPENS --add-opens=$p=ALL-UNNAMED"; done
for C in 8 2; do
  echo "=== cpus=$C ==="
  SPARK_GRAFT_BENCH_DOCS=600000 SPARK_GRAFT_CPUS=$C SPARK_GRAFT_LOCAL_DIR=/dev/shm/graft-prof \
    java -Xmx24g -cp "$CP" $OPENS -Dspark.ui.enabled=false -Djava.io.tmpdir=/dev/shm/graft-prof \
    graft.tools.ProfileBuild 2>&1 | grep -E "profile|writeIndex"
done
