#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (SURVEY §6/§7 M5).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("text_extraction_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/engine.zip")
EOF
