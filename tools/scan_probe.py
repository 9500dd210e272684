"""Generic scan-audit probe: run one registry query in a fresh session,
then sum REST scan-node 'size of files read' and report eff_scans per
source table (bytes read / file size)."""
import json
import os
import re
import sys
import urllib.request
from collections import defaultdict

from pyspark.sql import SparkSession

sf = "/root/testdata/sf0.01"
qname = sys.argv[1]
port = sys.argv[2] if len(sys.argv) > 2 else "4096"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", port)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pandasql_spark.queries import REGISTRY  # noqa: E402

n = REGISTRY[qname].fn(spark, sf).count()

# query the port Spark ACTUALLY bound, not the requested one: when the
# requested port is taken, spark.port.maxRetries binds port+1 silently
# and the REST read would attribute ANOTHER app's scan bytes to this
# query (r16 review finding — floors could be recorded off the wrong
# process with no error)
ui_url = spark.sparkContext.uiWebUrl
base = f"{ui_url}/api/v1/applications"
app_id = json.load(urllib.request.urlopen(base))[0]["id"]
sqls = json.load(
    urllib.request.urlopen(
        f"{base}/{app_id}/sql?details=true&planDescription=true&length=2000"
    )
)
UNITS = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3}


def parse_size(s):
    m = re.match(r"\s*([\d.]+)\s*(B|KiB|MiB|GiB)", s)
    return float(m.group(1)) * UNITS[m.group(2)] if m else 0.0


# attribute scans to tables via node name ("Scan parquet <path or rel>")
per = defaultdict(float)
cnt = defaultdict(int)
for q in sqls:
    for node in q.get("nodes", []):
        name = node.get("nodeName", "")
        if "Scan" not in name:
            continue
        for m in node.get("metrics", []):
            if m["name"] == "size of files read":
                b = parse_size(m["value"])
                if b > 0:
                    per[name] += b
                    cnt[name] += 1

tables = {}
for f in os.listdir(sf):
    if f.endswith(".parquet"):
        p = os.path.join(sf, f)
        tables[f.replace(".parquet", "")] = (
            os.path.getsize(p)
            if os.path.isfile(p)
            else sum(
                os.path.getsize(os.path.join(r, x))
                for r, _, fs in os.walk(p)
                for x in fs
            )
        )

out = []
for name, b in sorted(per.items()):
    # node names look like "Scan parquet " or include the relation
    matched = None
    for t, size in tables.items():
        if t in name:
            matched = (t, size)
            break
    if matched:
        out.append(f"{matched[0]}: {b/matched[1]:.2f} scans ({cnt[name]} nodes)")
    else:
        out.append(f"{name}: {int(b)} B ({cnt[name]} nodes)")
print(f"PROBE {qname} rows={n} :: " + " | ".join(out) if out else f"PROBE {qname} rows={n} :: no file reads")
# machine-readable total for tools/scan_gate.py — the human PROBE line
# above is lossy (unit-rounded, format-coupled); this is the exact sum
print(f"PROBE_TOTAL_BYTES {qname} {int(sum(per.values()))}")
spark.stop()

# Usage: PYTHONPATH=. python tools/scan_probe.py <query_name> [ui_port]
# Prints eff_scans (true parquet bytes read / table size) per source
# table for ONE registry query in a fresh session. This is the r15
# auditor that caught the lazy-persist race class (SCALING.md r15):
# plan text cannot show it — only file-byte accounting can.
