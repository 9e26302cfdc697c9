#!/usr/bin/env bash
# Example-suite runner — mirrors /root/reference/examples/run_all_examples.sh
# (run each example, assert on outputs, tally pass/fail).
set -u
cd "$(dirname "$0")/.."
export RAY_GRAFT_CPUS="${RAY_GRAFT_CPUS:-4}"
SF="${GRAFT_SF_DIR:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/tinyetl-examples-XXXX)"
pass=0; fail=0

check() { # name condition
  if eval "$2"; then echo "PASS $1"; pass=$((pass+1)); else echo "FAIL $1"; fail=$((fail+1)); fi
}

# 01: csv -> json basic copy
python - <<PY
import pandas as pd, pyarrow.parquet as pq
pq.read_table("$SF/supplier.parquet").to_pandas().to_csv("$OUT/supplier.csv", index=False)
PY
python -m tinyetl_ray.cli transfer "$OUT/supplier.csv" "$OUT/01_json" --sniff-types --target-format json >/dev/null 2>&1
check "01_csv_to_json" '[ -n "$(ls "$OUT/01_json"/*.json 2>/dev/null)" ] && [ "$(cat "$OUT/01_json"/*.json | wc -l)" -ge 10 ]'

# 02: derived columns
python -m tinyetl_ray.cli transfer "$OUT/supplier.csv" "$OUT/02_parquet" --sniff-types \
  --transform "acct_annual = s_acctbal * 12; name_upper = upper(s_name)" \
  --target-format parquet >/dev/null 2>&1
check "02_derived_columns" 'python -c "
import pyarrow.parquet as pq, glob
t = pq.read_table(glob.glob(\"$OUT/02_parquet/*.parquet\")[0])
assert \"acct_annual\" in t.column_names and \"name_upper\" in t.column_names
" 2>/dev/null'

# 03: schema validation with drop
cat > "$OUT/schema.json" <<JSON
{"columns": [
  {"name": "s_suppkey", "type": "integer", "nullable": false},
  {"name": "s_name", "type": "string", "pattern": "Supplier.*"},
  {"name": "s_acctbal", "type": "decimal", "default": 0}
]}
JSON
python -m tinyetl_ray.cli transfer "$OUT/supplier.csv" "$OUT/03_parquet" --sniff-types \
  --schema-file "$OUT/schema.json" --drop-invalid --target-format parquet >/dev/null 2>&1
check "03_schema_validation" '[ -n "$(ls "$OUT/03_parquet"/*.parquet 2>/dev/null)" ]'

# 04: parquet -> csv with filter
python -m tinyetl_ray.cli transfer "$SF/orders.parquet" "$OUT/04_csv" \
  --filter "o_totalprice > 200000" --target-format csv >/dev/null 2>&1
check "04_filtered_csv" '[ "$(cat "$OUT/04_csv"/*.csv | wc -l)" -gt 1 ]'

# 05: CDC replay + resume + compact
python - <<PY
import pyarrow.parquet as pq
from tinyetl_ray.synth import make_changes
import os
os.makedirs("$OUT/changes", exist_ok=True)
for i, t in enumerate(make_changes(n_events=2000, n_convs=20, seed=5, n_epochs=2)):
    pq.write_table(t, f"$OUT/changes/e{i}.parquet")
PY
python -m tinyetl_ray.cli cdc replay "$OUT/05_table" "$OUT/changes/e0.parquet" "$OUT/changes/e1.parquet" >/dev/null 2>&1
python -m tinyetl_ray.cli cdc replay "$OUT/05_table" "$OUT/changes/e0.parquet" "$OUT/changes/e1.parquet" > "$OUT/05_rerun.json" 2>/dev/null
python -m tinyetl_ray.cli cdc compact "$OUT/05_table" >/dev/null 2>&1
check "05_cdc_replay_resume_compact" 'grep -q "\"applied_epochs\": \[\]" "$OUT/05_rerun.json" && [ -f "$OUT/05_table/_commits/LATEST" ]'

# 06: http source via loopback server (bearer-authenticated download-to-temp)
python - "$OUT" <<'PY' >/dev/null 2>&1
import http.server, os, subprocess, sys, threading

out = sys.argv[1]
body = b"id,name\n1,ada\n2,grace\n3,katherine\n"

class H(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        if self.headers.get("Authorization") != "Bearer s3cret-tok":
            self.send_response(401); self.end_headers(); return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
    def log_message(self, *a):
        pass

srv = http.server.HTTPServer(("127.0.0.1", 0), H)
threading.Thread(target=srv.serve_forever, daemon=True).start()
rc = subprocess.run(
    [sys.executable, "-m", "tinyetl_ray.cli", "transfer",
     f"http://127.0.0.1:{srv.server_address[1]}/people.csv",
     os.path.join(out, "06_parquet"),
     "--sniff-types", "--target-format", "parquet",
     "--option", "auth.bearer=s3cret-tok"],
    capture_output=True,
).returncode
srv.shutdown()
sys.exit(rc)
PY
check "06_http_source" 'python -c "
import pyarrow.parquet as pq, glob
files = glob.glob(\"$OUT/06_parquet/*.parquet\")
assert files and sum(pq.ParquetFile(f).metadata.num_rows for f in files) == 3
" 2>/dev/null'

# 07: WAL-tail + incremental CDC-out (streaming end to end). A burst of
# pending files batches into ONE commit; a later-landing file becomes the
# next epoch, visible through changes-since.
mkdir -p "$OUT/incoming"
python - "$OUT" <<'PY' >/dev/null 2>&1
import sys, os
import pyarrow.parquet as pq
from tinyetl_ray.synth import make_changes
out = sys.argv[1]
for i, t in enumerate(make_changes(n_events=1800, n_convs=20, seed=31, n_epochs=3)):
    pq.write_table(t, os.path.join(out, "incoming", f"{i:04d}.parquet"))
os.rename(os.path.join(out, "incoming", "0002.parquet"),
          os.path.join(out, "late.parquet"))  # lands after the first tail
PY
python -m tinyetl_ray.cli cdc tail "$OUT/07_table" "$OUT/incoming" --partitions 4 --poll 0.1 --max-idle 2 > "$OUT/07_tail.json" 2>/dev/null
mv "$OUT/late.parquet" "$OUT/incoming/0002.parquet"
python -m tinyetl_ray.cli cdc tail "$OUT/07_table" "$OUT/incoming" --partitions 4 --poll 0.1 --max-idle 2 > "$OUT/07_tail2.json" 2>/dev/null
python -m tinyetl_ray.cli cdc changes-since "$OUT/07_table" 0 > "$OUT/07_delta.txt" 2>/dev/null
check "07_tail_cdc_out" 'grep -q "\"applied_epochs\": \[0\]" "$OUT/07_tail.json" && grep -q "\"applied_epochs\": \[1\]" "$OUT/07_tail2.json" && grep -qE "rows: [1-9]" "$OUT/07_delta.txt"'

# 08: training-data batching ops over a documents parquet — deterministic
# sample, token-budget packing, global shuffle rank, incremental dedup of
# an incoming batch against the corpus.
python - "$OUT" <<'PY' >/dev/null 2>&1
import sys, os
import pandas as pd
out = sys.argv[1]
docs = pd.DataFrame({
    "doc_id": range(40),
    "text": [f"doc number {i} with a few extra words {'pad ' * (i % 5)}" for i in range(40)],
    "lang": (["en", "zh", "de", "fr"] * 10),
})
docs.to_parquet(os.path.join(out, "docs.parquet"), index=False)
docs.iloc[:10].to_parquet(os.path.join(out, "incoming.parquet"), index=False)
docs.iloc[5:].to_parquet(os.path.join(out, "corpus.parquet"), index=False)
PY
python -m tinyetl_ray.cli corpus sample "$OUT/docs.parquet" "$OUT/08_sample" >/dev/null 2>&1
python -m tinyetl_ray.cli corpus pack "$OUT/docs.parquet" "$OUT/08_pack" --budget 32 >/dev/null 2>&1
python -m tinyetl_ray.cli corpus shuffle-rank "$OUT/docs.parquet" "$OUT/08_rank" >/dev/null 2>&1
python -m tinyetl_ray.cli corpus dedup-incremental "$OUT/incoming.parquet" "$OUT/08_inc" --existing "$OUT/corpus.parquet" >/dev/null 2>&1
check "08_batching_ops" 'python -c "
import pyarrow.parquet as pq, glob, sys
def rows(d):
    return sum(pq.ParquetFile(f).metadata.num_rows for f in glob.glob(d + \"/*.parquet\"))
assert 0 < rows(\"$OUT/08_sample\") < 40          # deterministic subset
assert rows(\"$OUT/08_pack\") == 40               # every doc packed
assert rows(\"$OUT/08_rank\") == 40               # a full permutation
assert rows(\"$OUT/08_inc\") == 5                 # docs 0-4 are new, 5-9 exist
" 2>/dev/null'

# 09: table lifecycle — materialized view, zero-copy clone, rollback, fsck.
# Reuses example 05's committed table (epochs 0..2 incl. the compaction).
python -m tinyetl_ray.cli cdc view-refresh "$OUT/05_table" "$OUT/09_view" > "$OUT/09_view.json" 2>/dev/null
python -m tinyetl_ray.cli cdc clone "$OUT/05_table" "$OUT/09_clone" > "$OUT/09_clone.json" 2>/dev/null
python -m tinyetl_ray.cli cdc restore "$OUT/05_table" 0 > "$OUT/09_restore.json" 2>/dev/null
python -m tinyetl_ray.cli cdc fsck "$OUT/05_table" > "$OUT/09_fsck.json" 2>/dev/null
fsck_rc=$?
python -m tinyetl_ray.cli cdc view-show "$OUT/09_view" > "$OUT/09_show.txt" 2>/dev/null
check "09_lifecycle" 'grep -q "\"partitions_rebuilt\"" "$OUT/09_view.json" \
  && grep -q "\"cloned_from\"" "$OUT/09_clone.json" \
  && grep -q "\"restored_from_epoch\": 0" "$OUT/09_restore.json" \
  && grep -q "\"ok\": true" "$OUT/09_fsck.json" && [ "$fsck_rc" -eq 0 ] \
  && grep -qE "rows: [1-9]" "$OUT/09_show.txt"'

# 10: training-shape exports (whole transcripts + per-turn context windows)
# from the (restored) table of example 09
python -m tinyetl_ray.cli cdc export "$OUT/05_table" "$OUT/10_tx" > "$OUT/10_tx.json" 2>/dev/null
python -m tinyetl_ray.cli cdc export "$OUT/05_table" "$OUT/10_wx" --shape windows --k 1 > "$OUT/10_wx.json" 2>/dev/null
check "10_training_exports" 'python -c "
import json
tx = json.load(open(\"$OUT/10_tx.json\"))
wx = json.load(open(\"$OUT/10_wx.json\"))
assert tx[\"shape\"] == \"transcripts\" and tx[\"rows\"] > 0
assert wx[\"shape\"] == \"windows\" and wx[\"rows\"] >= tx[\"rows\"]
" 2>/dev/null'

# 11: money to a SQL target — YAML job writes DECIMAL(18,2) through the
# MySQL-shaped (pyformat) fake server driver; stored values are exact cents
cat > "$OUT/11_money.csv" <<CSV
k,bal
0,0.01
1,123.45
2,99999999.99
3,-0.10
CSV
cat > "$OUT/11_job.yaml" <<YAML
source: "$OUT/11_money.csv"
target: "fake-mysql://$OUT/11_money.db#accounts"
decimal_cols:
  bal: "18,2"
YAML
python -m tinyetl_ray.cli run "$OUT/11_job.yaml" >/dev/null 2>&1
check "11_decimal_sql_target" 'python -c "
import sqlite3
rows = sqlite3.connect(\"$OUT/11_money.db\").execute(
    \"SELECT bal FROM accounts ORDER BY k\").fetchall()
assert [b for (b,) in rows] == [\"0.01\", \"123.45\", \"99999999.99\", \"-0.10\"]
" 2>/dev/null'

echo "----------------------------------------"
echo "examples: $pass passed, $fail failed (out: $OUT)"
[ "$fail" -eq 0 ]
