#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ferrobus_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/ferrobus_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("ferrobus_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/ferrobus_spark.zip")
EOF
