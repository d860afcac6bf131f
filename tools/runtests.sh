#!/bin/bash
# Direct-java ScalaTest runner (sbt's forked test harness has episodic
# multi-second stalls under gVisor — same reason tools/runj.sh exists).
# Usage: tools/runtests.sh                 # discover + run all suites
#        tools/runtests.sh graft.cep.CepSpec [more suites...]
set -e
cd /root/repo
# Resolve test jars from the local coursier cache without assuming which
# repository host they were mirrored from.
TESTJARS=$(find /root/.cache/coursier -type f \
  \( -path "*/org/scalatest/*" -o -path "*/org/scalactic/*" -o -path "*/org/scalacheck/*" \
     -o -path "*/org/scala-lang/modules/scala-xml_2.13/*" \) \
  \( -name "*_2.13-*.jar" -o -name "scalatest-compatible*.jar" \) \
  2>/dev/null | grep -vE "sources|javadoc" | sort -u | tr '\n' ':')
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
ARGS=""
if [ $# -gt 0 ]; then for s in "$@"; do ARGS="$ARGS -s $s"; done; fi
exec java -Dderby.system.home=/tmp $OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/test-classes:target/scala-2.13/classes:/opt/spark/jars/*:$TESTJARS" \
  org.scalatest.tools.Runner -R target/scala-2.13/test-classes -oD $ARGS
