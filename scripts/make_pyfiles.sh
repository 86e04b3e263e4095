#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north_rule requirement).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ht_ner_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/ht_ner_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("ht_ner_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/ht_ner_spark.zip")
EOF
