#!/usr/bin/env python3
"""Diff two BENCH_FULL.json files, classifying every timing delta.

Usage: python3 scripts/bench_diff.py OLD.json NEW.json [threshold_sec]
       python3 scripts/bench_diff.py <(git show r4:BENCH_FULL.json) BENCH_FULL.json

For each query present in both files, the delta is labeled:
  PLAN   — the physical-plan fingerprint changed: a real plan diff to
           explain (broadcast lost, exchange added, pushdown dropped ...)
  NOISE  — fingerprint identical: the plan Spark chose is byte-identical,
           so the timing delta is machine load / JIT / GC, not a change
           in the engine.
Queries only in one file are listed as ADDED/REMOVED.
"""
import json
import sys


def load(path):
    """Load a bench artifact: either Bench's own JSON line (BENCH_FULL.json)
    or the driver wrapper (BENCH_r0N.json), which nests it under 'parsed'."""
    try:
        d = json.load(open(path))
    except (json.JSONDecodeError, UnicodeDecodeError) as e:
        sys.exit(f"{path}: not JSON ({e})")
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if not isinstance(d.get("queries"), dict):
        sys.exit(f"{path}: no 'queries' map found — not a bench artifact "
                 f"(keys: {sorted(d)[:8]})")
    return d


def main(old_path, new_path, threshold=0.25):
    old = load(old_path)
    new = load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    ofp, nfp = old.get("plan_fp", {}), new.get("plan_fp", {})

    # Rebaseline detection: if the HASH differs on nearly every common
    # query while the structural suffix (x/s/pf/rc) is identical, the
    # fingerprint algorithm changed between the two files (round 6 did
    # this once), not the plans — classify those rows by structure.
    def struct(fp):
        return fp.split(":", 1)[1] if ":" in fp else fp
    common_fp = [k for k in set(oq) & set(nq) if k in ofp and k in nfp]
    hash_only = [k for k in common_fp
                 if ofp[k] != nfp[k] and struct(ofp[k]) == struct(nfp[k])]
    rebaseline = len(common_fp) > 10 and len(hash_only) > 0.9 * len(common_fp)
    if rebaseline:
        print(f"NOTE: {len(hash_only)}/{len(common_fp)} queries changed hash "
              "with identical x/s/pf/rc structure — fingerprint-algorithm "
              "rebaseline detected; classifying by structural fields only\n")

    rows = []
    for k in sorted(set(oq) & set(nq)):
        d = nq[k] - oq[k]
        if abs(d) < threshold:
            continue
        fp_known = k in ofp and k in nfp
        fp_changed = fp_known and (
            struct(ofp[k]) != struct(nfp[k]) if rebaseline else ofp[k] != nfp[k])
        label = "PLAN " if fp_changed else ("NOISE" if fp_known else "??   ")
        rows.append((abs(d), label, k, oq[k], nq[k], d,
                     f"{ofp.get(k,'-')} -> {nfp.get(k,'-')}" if fp_changed else ""))
    rows.sort(reverse=True)
    for _, label, k, o, n, d, fp in rows:
        print(f"{label} {k:36s} {o:7.2f} -> {n:7.2f}  ({d:+.2f} s)  {fp}")

    for k in sorted(set(nq) - set(oq)):
        print(f"ADDED {k:36s}            {nq[k]:7.2f}")
    for k in sorted(set(oq) - set(nq)):
        print(f"REMOVED {k:34s} {oq[k]:7.2f}")

    ot, nt = old.get("value"), new.get("value")
    totals = (f"total: {ot:.1f} -> {nt:.1f} s"
              if isinstance(ot, (int, float)) and isinstance(nt, (int, float))
              else "total: n/a (missing 'value' in one file)")
    print(f"\n{totals} "
          f"(loadavg {old.get('loadavg','?')} -> {new.get('loadavg','?')}); "
          f"deltas >= {threshold}s shown; PLAN = fingerprint changed, "
          f"NOISE = identical plan (machine variance)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 0.25)
