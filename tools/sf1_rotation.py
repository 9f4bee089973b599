"""Per-round sf1 full-value oracle rotation for the events family
(round-9 VERDICT item 8): the numeric cliffs this family exists to catch
(2^53 doubles, decimal power sums, window-rank overflow) only appear
past the driver's sf0.01 gate scale, so one slice of the family is
re-proven at sf1 every round and the result committed as
CORRECTNESS_SF1_r{N}.json.

Rotation is deterministic: the round number N is inferred from the
newest CORRECTNESS_r*.json the driver left in the repo (+1, since this
runs mid-round before the driver writes its own file), and the slice is
EVENTS_FAMILY[(N % n_slices) * size : ...] — four rounds cover the whole
family.  The sf1 decade is generated on demand by tools/gen_sf1.py.

Usage: python tools/sf1_rotation.py [sf1_dir]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SLICES = 4


def current_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))
        if (m := re.search(r"r(\d+)\.json$", os.path.basename(p)))
    ]
    return (max(rounds) if rounds else 0) + 1


def main() -> None:
    from tools.check_oracle import EVENTS_FAMILY

    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    if not os.path.isdir(sf1_dir):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "tools", "gen_sf1.py"), sf1_dir],
            check=True,
        )
    rnd = current_round()
    fam = sorted(EVENTS_FAMILY)
    size = (len(fam) + SLICES - 1) // SLICES
    k = rnd % SLICES
    names = fam[k * size : (k + 1) * size]
    print(f"# round {rnd}: sf1 rotation slice {k}/{SLICES}: {names}")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "tools", "check_oracle.py"),
            sf1_dir,
            *names,
        ],
        capture_output=True,
        text=True,
    )
    sys.stdout.write(proc.stdout[-4000:])
    ok = proc.returncode == 0 and "ALL MATCH" in proc.stdout
    out = {
        "round": rnd,
        "slice": k,
        "sf_dir": sf1_dir,
        "queries": names,
        "all_match": ok,
        "rc": proc.returncode,
    }
    path = os.path.join(HERE, f"CORRECTNESS_SF1_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n# wrote {path}: all_match={ok}")
    if not ok:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise SystemExit(1)


if __name__ == "__main__":
    main()
