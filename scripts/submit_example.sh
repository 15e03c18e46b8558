#!/usr/bin/env bash
# Launch the engine on a multi-executor cluster via spark-submit
# --py-files (north rule).  Builds the dependency zip from the package
# directory, then submits a driver script; local[*] stands in when no
# cluster master is given.
#
#   ./scripts/submit_example.sh [master-url]
#
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${1:-local[*]}"
ZIP=/tmp/raster_tools_spark.zip

rm -f "$ZIP"
# package only the library (tests and fixtures stay out of the zip)
python - <<'EOF'
import zipfile, pathlib
zf = zipfile.ZipFile("/tmp/raster_tools_spark.zip", "w",
                     zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path("raster_tools_spark").rglob("*.py")):
    zf.write(p, p.as_posix())
zf.close()
print("wrote /tmp/raster_tools_spark.zip")
EOF

exec spark-submit \
    --master "$MASTER" \
    --py-files "$ZIP" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.sql.shuffle.partitions=32 \
    scripts/submit_driver.py
