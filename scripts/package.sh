#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit:
#   scripts/package.sh && spark-submit --py-files dist/nemo_curator_spark.zip \
#       scripts/run_pipeline.py --input ... --output ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/nemo_curator_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/nemo_curator_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("nemo_curator_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            # .py modules + data artifacts (histograms, code_meta.csv);
            # artifacts load driver-side (plan build), so a repo checkout
            # on the driver suffices even when executors import the zip
            if f.endswith(".py") or "/artifacts" in root:
                z.write(os.path.join(root, f))
print("wrote dist/nemo_curator_spark.zip")
EOF
