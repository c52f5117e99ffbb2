#!/bin/bash
# spark-submit --py-files deployment path (north rule: "run via spark-submit
# --py-files on a multi-executor cluster").
#
# Packages colly_spark into dist/colly_spark.zip and submits bench.py FROM A
# SCRATCH DIRECTORY, so `import colly_spark` can only resolve through the
# shipped zip — the same way a real cluster's driver and executors would get
# the package. Everything bench.py needs (the entry module, the zip) travels
# via --py-files; nothing relies on the repo being present on the "cluster".
#
# Usage: tools/submit.sh [cores] [extra spark-submit args...]
#   BENCH_* / SPARK_GRAFT_* env vars pass through to bench.py unchanged.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORES="${1:-8}"
shift || true

mkdir -p "$REPO/dist"
ZIP="$REPO/dist/colly_spark.zip"
rm -f "$ZIP"
(cd "$REPO" && python - "$ZIP" <<'PY'
import sys, zipfile, pathlib
zip_path = sys.argv[1]
root = pathlib.Path(".")
with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("colly_spark/**/*.py")):
        z.write(p, p.as_posix())
print(f"built {zip_path}")
PY
)

SCRATCH="$(mktemp -d /tmp/colly_submit.XXXXXX)"
trap 'rm -rf "$SCRATCH"' EXIT
cp "$REPO/bench.py" "$REPO/__spark_entry__.py" "$SCRATCH/"

export SPARK_GRAFT_CPUS="$CORES"
cd "$SCRATCH"
exec spark-submit \
  --master "local[$CORES]" \
  --driver-memory "${SPARK_DRIVER_MEM:-32g}" \
  --conf "spark.ui.enabled=false" \
  --conf "spark.driver.extraJavaOptions=-XX:ActiveProcessorCount=$CORES" \
  --py-files "$ZIP" \
  "$@" \
  "$SCRATCH/bench.py"
