#!/bin/bash
# runj.sh against a SNAPSHOT classes dir (SNAP_CP) so probes can run
# while sbt recompiles the live classes dir.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
exec java -Dderby.system.home=/tmp $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC $JAVA_EXTRA \
  -cp "${SNAP_CP:-/root/repo/target/probe_r11/classes}:/opt/spark/jars/*" "$@"
