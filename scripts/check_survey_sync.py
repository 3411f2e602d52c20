#!/usr/bin/env python3
"""Cross-check the graded contract against SURVEY.md §2b.

The judge reads the §2b operator table line by line, so every key in the
code's `queries` maps must have a `| `key` |` table row and vice versa.
Run after adding/removing keys; exit code = number of mismatches.

Usage: python3 scripts/check_survey_sync.py
"""
import re
import subprocess
import sys

PREFIXES = ("s_", "p_", "j_", "a_", "w_", "o_", "f_", "t_", "x_", "u_")


def main():
    src = subprocess.run(
        ["grep", "-rhoE", '"[a-z0-9_]+" *->', "src/main/scala/graft/ops/"],
        capture_output=True, text=True).stdout
    keys = {k for k in re.findall(r'"([a-z0-9_]+)"', src)
            if k.startswith(PREFIXES)}
    survey = open("SURVEY.md").read()
    rows = {r for r in re.findall(r"^\| `([a-z0-9_]+)`", survey, re.M)
            if r.startswith(PREFIXES)}
    missing = sorted(keys - rows)
    extra = sorted(rows - keys)
    print(f"keys in code: {len(keys)}  table rows: {len(rows)}")
    if missing:
        print(f"KEYS MISSING A SURVEY ROW: {missing}")
    if extra:
        print(f"SURVEY ROWS WITH NO KEY: {extra}")
    count_line = re.search(r"\*\*Count: ([0-9+]+) = (\d+) declared", survey)
    if count_line:
        total = sum(int(x) for x in count_line.group(1).split("+"))
        declared = int(count_line.group(2))
        if total != declared or declared != len(keys):
            print(f"COUNT LINE MISMATCH: sum={total} declared={declared} "
                  f"actual={len(keys)}")
            return 1 + len(missing) + len(extra)
    else:
        # A reworded count line must FAIL, not silently skip the check —
        # otherwise the script reports "in sync" while the declared count
        # can disagree with the key inventory.
        print("COUNT LINE NOT FOUND: expected '**Count: a+b+... = N declared'"
              " in SURVEY.md §2b")
        return 1 + len(missing) + len(extra)
    if not missing and not extra:
        print("SURVEY §2b and the code contract are in sync.")
    return len(missing) + len(extra)


if __name__ == "__main__":
    sys.exit(main())
