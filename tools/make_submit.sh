#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/warchaeology_spark.zip
# zip the package (no tests/tools; pure-python, no build step needed)
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/warchaeology_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("warchaeology_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/warchaeology_spark.zip")
EOF
