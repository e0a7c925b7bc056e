"""Create a variant of a mesh case directory with an edited BC.json.

The BC.json IS the dataset's physics API (SURVEY.md §5 "Config / flag
system"), so parameter studies beyond the shipped ranges — e.g. the
BASELINE metric of record "steady cylinder Re=100", which needs inlet
velocities above the shipped cylinder case's Re_max=33 — are expressed as
case variants: same mesh files (symlinked), overridden BC entries.

Usage:
    python scripts/make_case_variant.py \
        --case /root/reference/mesh_example/cylinder_flow_tri_quad \
        --out /tmp/cylinder_re100 \
        --set theta_PDE.inlet='[1,0.05,10]' --set theta_PDE.Re_max=105
"""

import argparse
import json
import os
import sys


def set_path(tree, dotted, value):
    keys = dotted.split(".")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    if keys[-1] not in node:
        raise KeyError(f"BC.json has no key {dotted!r}")
    node[keys[-1]] = value


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--case", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--set", action="append", default=[],
                    metavar="DOTTED.KEY=JSON",
                    help="override a BC.json entry (value parsed as JSON)")
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    bc = json.load(open(os.path.join(args.case, "BC.json")))
    for item in args.set:
        key, _, raw = item.partition("=")
        set_path(bc, key, json.loads(raw))
    with open(os.path.join(args.out, "BC.json"), "wt") as f:
        json.dump(bc, f, indent=4)

    linked = []
    for name in os.listdir(args.case):
        if name == "BC.json" or name.startswith("."):
            continue
        src = os.path.abspath(os.path.join(args.case, name))
        dst = os.path.join(args.out, name)
        if not os.path.exists(dst):
            os.symlink(src, dst)
        linked.append(name)
    print(f"variant at {args.out}: linked {linked}, "
          f"overrides {args.set}")


if __name__ == "__main__":
    sys.exit(main())
