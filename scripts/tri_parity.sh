#!/usr/bin/env bash
# Tri-SF parity: run the Verify+DuckDB-oracle gate at ALL THREE
# driver scale factors and fold the results into one committed
# artifact. The rounding-tie bug class is SF-dependent (CLAUDE.md:
# q15/e03 only bit at sf0.1, q25 only at sf0.001), so a single-SF
# CORRECTNESS run samples the tie-freedom claim — this pins it.
#
# Usage: scripts/tri_parity.sh PARITY_r11.json
set -u
out="${1:-PARITY.json}"
cd "$(dirname "$0")/.."
tmp=$(mktemp -d)
declare -A results
fail=0
for sfd in sf0.001 sf0.01 sf0.1; do
  echo "== $sfd =="
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch \
    "runMain graft.Verify /root/testdata/$sfd $tmp/$sfd" \
    > "$tmp/$sfd.verify.log" 2>&1 || { echo "VERIFY FAILED ($sfd)"; fail=1; }
  python3 scripts/parity.py "/root/testdata/$sfd" "$tmp/$sfd" \
    > "$tmp/$sfd.parity.log" 2>&1 || fail=1
  tail -1 "$tmp/$sfd.parity.log"
  results[$sfd]=$(tail -1 "$tmp/$sfd.parity.log")
  grep -E "^(FAIL|ERR)" "$tmp/$sfd.parity.log" || true
done
python3 - "$out" "$tmp" <<'EOF'
import json, re, sys, subprocess
out, tmp = sys.argv[1], sys.argv[2]
res = {}
ok = True
for sfd in ["sf0.001", "sf0.01", "sf0.1"]:
    lines = open(f"{tmp}/{sfd}.parity.log").read().splitlines()
    tally = lines[-1] if lines else "missing"
    fails = [l for l in lines if l.startswith(("FAIL", "ERR"))]
    m = re.match(r"(\d+)/(\d+) pass", tally)
    res[sfd] = {"tally": tally, "fails": fails}
    ok = ok and bool(m) and m.group(1) == m.group(2) and not fails
commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                        capture_output=True, text=True).stdout.strip()
json.dump({"metric": "tri_sf_parity", "commit": commit,
           "all_pass": ok, "sfs": res}, open(out, "w"), indent=1)
print(f"wrote {out} all_pass={ok}")
EOF
rm -rf "$tmp"
exit $fail
