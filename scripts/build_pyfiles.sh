#!/usr/bin/env bash
# Build the spark-submit --py-files artifact (north_star: "ships as a
# spark-submit --py-files package").
#
#   scripts/build_pyfiles.sh            # -> dist/ethereum_etl_spark.zip
#   spark-submit --py-files dist/ethereum_etl_spark.zip \
#       --master <cluster> run_cli.py apply --wal <path> --table <path>
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ethereum_etl_spark.zip
python - <<'PY'
import os, zipfile
with zipfile.ZipFile("dist/ethereum_etl_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("ethereum_etl_spark"):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                z.write(p, p)
print("wrote dist/ethereum_etl_spark.zip")
PY
