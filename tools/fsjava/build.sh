#!/bin/sh
# Rebuild sparkgraft-fs.jar from the committed sources. Requires a JDK
# and pyspark's bundled hadoop-client-api jar on the classpath.
set -e
cd "$(dirname "$0")"
HADOOP_JAR=$(python - <<'PY'
import glob, os, pyspark
print(glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "hadoop-client-api-*.jar"))[0])
PY
)
rm -rf classes && mkdir -p classes
javac -encoding UTF-8 -cp "$HADOOP_JAR" -d classes src/sparkgraft/*.java
jar cf sparkgraft-fs.jar -C classes .
rm -rf classes
echo "built $(pwd)/sparkgraft-fs.jar"
