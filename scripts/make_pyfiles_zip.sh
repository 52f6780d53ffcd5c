#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/data_profiler_spark.zip
python - <<'EOF'
import zipfile
from pathlib import Path

with zipfile.ZipFile("dist/data_profiler_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(Path("data_profiler_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("dist/data_profiler_spark.zip written")
EOF
