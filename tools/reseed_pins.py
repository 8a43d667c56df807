#!/usr/bin/env python3
"""Seed/re-seed tools/bench_baseline.json per-op pins from a quiet-box
double run (the established min-of-two protocol).

Usage: python3 tools/reseed_pins.py run1.json run2.json [--reseed k1,k2,...]

- keys with NO existing pin (new ops) get min-of-two;
- keys named in --reseed get min-of-two REPLACING the old pin (the quiet
  re-seed sweep for rows whose ancient pins read 2-4x low — VERDICT r13 #7);
- every other existing pin is left untouched (it is the accumulated
  quiet-box minimum).
Prints a before/after table for the touched keys.
"""
import json
import re
import sys


def load_times(path):
    txt = open(path).read()
    m = re.search(r'"queries"\s*:\s*\{([^}]*)\}', txt)
    body = m.group(1)
    return {k: float(v) for k, v in
            re.findall(r'"([A-Za-z0-9_]+)"\s*:\s*([0-9.eE+-]+)', body)}


def main(argv):
    r1, r2 = load_times(argv[0]), load_times(argv[1])
    reseed = set()
    if len(argv) > 3 and argv[2] == "--reseed":
        reseed = set(argv[3].split(","))
    pins = json.load(open("tools/bench_baseline.json"))
    touched = []
    for k in sorted(set(r1) | set(r2)):
        mn = round(min(r1.get(k, 1e9), r2.get(k, 1e9)), 3)
        if k not in pins:
            pins[k] = mn
            touched.append((k, None, mn))
        elif k in reseed:
            touched.append((k, pins[k], mn))
            pins[k] = mn
    with open("tools/bench_baseline.json", "w") as f:
        json.dump(dict(sorted(pins.items())), f, indent=1)
    for k, old, new in touched:
        print(f"{k}: {old} -> {new}")
    print(f"== {len(touched)} pins touched, {len(pins)} total")


if __name__ == "__main__":
    main(sys.argv[1:])
