#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north rule shipping shape).
#   scripts/make_pyfiles.sh [out.zip]
# then:
#   spark-submit --py-files dist/arkouda_njit_spark.zip your_job.py
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$REPO/dist/arkouda_njit_spark.zip}"
mkdir -p "$(dirname "$OUT")"
rm -f "$OUT"
cd "$REPO"
python - "$OUT" <<'EOF'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("arkouda_njit_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(out)
EOF
