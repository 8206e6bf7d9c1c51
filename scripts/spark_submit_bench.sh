#!/usr/bin/env bash
# Package frontier_engine and run one bench cycle via spark-submit
# --py-files (the north-star shipping mode). Usage:
#   scripts/spark_submit_bench.sh [master] [fixture_dir] [pages_canon] [cycles]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export REPO
MASTER="${1:-local[8]}"
FIXTURE="${2:-$REPO/.bench_cache/n20000}"
PAGES="${3:-$FIXTURE/pages_canon}"
CYCLES="${4:-1}"

# generate the fixture (and its bucketed corpus) if absent; autogen only
# knows how to build the cache-dir naming scheme n<NUM>
python - "$FIXTURE" <<'EOF'
import os, re, sys
fix = sys.argv[1]
if not os.path.exists(os.path.join(fix, "pages_canon")):
    base = os.path.basename(fix.rstrip("/"))
    m = re.fullmatch(r"n(\d+)", base)
    if m is None:
        sys.exit(
            f"fixture {fix} is missing pages_canon and is not an "
            f"autogeneratable n<NUM> cache dir — build it explicitly "
            f"(bench.ensure_corpus)"
        )
    sys.path.insert(0, os.environ.get("REPO", os.getcwd()))
    from bench import ensure_corpus
    ensure_corpus(int(m.group(1)))
EOF

ZIP=/tmp/frontier_engine_pyfiles.zip
rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" frontier_engine -x '*__pycache__*')

SPARK_SUBMIT="$(python - <<'EOF'
import os, pyspark
print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))
EOF
)"

"$SPARK_SUBMIT" \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  "$REPO/scripts/submit_entry.py" \
  --master "$MASTER" --fixture "$FIXTURE" --pages-canon "$PAGES" \
  --cycles "$CYCLES"
