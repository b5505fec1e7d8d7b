#!/usr/bin/env python3
"""Derive the scale/skew probe ratios from benchdata/*.json.

Reads the raw per-rep bench JSONs the probes leave behind
(probe_<sf>_<rep>.json from scale_probe.sh, <unif|skew><sf>_<rep>.json
from skew_probe.sh), takes the per-query MIN across reps (the probes'
convention), and prints:

  - scale: sf0.1 -> sf1 per-query and total ratios (10x rows)
  - skew: skew/uniform per-query and total ratios at each sf

Also writes benchdata/probe_summary.json with the same numbers, so the
committed artifacts carry their own derivation. A query timed at -1.0
in any rep (errored) is reported as such and excluded from totals.
"""
import json, os, sys, glob

BD = os.path.join(os.path.dirname(__file__), "..", "benchdata")


def best(tag):
    """Per-query min across reps for benchdata/<tag>_<rep>.json.

    A query that errored (-1.0) in ANY rep is excluded from `out`
    entirely — a min over fewer reps is not comparable to the other
    side's 3-rep min, and the docstring's 'excluded from totals'
    promise must hold even for partial failures."""
    reps = sorted(glob.glob(os.path.join(BD, f"{tag}_*.json")))
    out, errored = {}, set()
    for p in reps:
        with open(p) as f:
            qs = json.load(f)["queries"]
        for q, v in qs.items():
            if v < 0:
                errored.add(q)
            elif q not in out or v < out[q]:
                out[q] = v
    for q in errored:
        out.pop(q, None)
    return out, errored, len(reps)


def ratio_table(name, base, num):
    (b, berr, bn), (n, nerr, nn) = base, num
    common = sorted(set(b) & set(n))
    rows = [(q, b[q], n[q], n[q] / b[q] if b[q] > 0 else float("nan"))
            for q in common]
    tb, tn = sum(b[q] for q in common), sum(n[q] for q in common)
    print(f"\n== {name} ({bn}/{nn} reps, {len(common)} queries) ==")
    for q, vb, vn, r in sorted(rows, key=lambda r: -r[3]):
        print(f"  {q:32s} {vb:8.2f} -> {vn:8.2f}  {r:5.2f}x")
    total = tn / tb if tb > 0 else float("nan")
    print(f"  {'TOTAL':32s} {tb:8.2f} -> {tn:8.2f}  {total:5.2f}x")
    for q in sorted(berr | nerr):
        print(f"  ERRORED (-1.0 in some rep): {q}")
    return {"queries": {q: {"base": vb, "probe": vn, "ratio": r}
                        for q, vb, vn, r in rows},
            "total_base": tb, "total_probe": tn, "total_ratio": total,
            "errored": sorted(berr | nerr)}


def canary_headline():
    """Print the committed bench headline.

    Format v2 (round 13): `value` is the sum of per-query MEDIANS over
    `reps` interleaved full passes — compare THIS across rounds;
    `value_pass1` is the old v1 single-pass raw total kept for
    continuity. The canary (canary_sec / canary_ratio) is a
    HOST-HEALTH flag only: a ratio far from 1.0 means the host ran at
    a different speed than the committed reference, so read
    cross-round deltas with suspicion — but nothing divides by it
    (r12 proved one-instant normalization amplifies burstiness)."""
    br = os.path.join(BD, "..", "bench_result.json")
    if not os.path.exists(br):
        return None
    with open(br) as f:
        d = json.load(f)
    out = {"value": d.get("value")}
    print("\n== bench headline ==")
    if d.get("format") == "v2":
        out.update(format="v2", reps=d.get("reps"),
                   value_pass1=d.get("value_pass1"))
        print(f"  v2 median-of-{d.get('reps')} total: {d.get('value')} s"
              f" ({len(d.get('queries', {}))} queries)"
              f"  <- compare THIS across rounds")
        print(f"  pass-1 raw total (v1 continuity): {d.get('value_pass1')} s")
    else:
        print(f"  raw total: {d.get('value')} s"
              f" ({len(d.get('queries', {}))} queries)")
    if "canary_ratio" in d:
        out.update(canary_sec=d["canary_sec"],
                   canary_ref_sec=d["canary_ref_sec"],
                   canary_ratio=d["canary_ratio"])
        print(f"  canary host-health: {d['canary_sec']} s vs ref"
              f" {d['canary_ref_sec']} s -> ratio {d['canary_ratio']}x"
              f" (flag only; nothing is normalized by this)")
    elif "canary_sec" in d:
        out["canary_sec"] = d["canary_sec"]
        print(f"  canary: {d['canary_sec']} s (no committed reference)")
    else:
        print("  no canary in this bench run")
    return out


def shuffle_drift():
    """Flag queries whose per-query shuffle WRITE bytes moved >20%
    vs the committed previous-round sidecar.

    bench_shuffle.json is written by graft.Bench next to
    bench_result.json; benchdata/shuffle_ref.json is the committed
    previous-round copy (refresh it with the round's final bench).
    Shuffle bytes are deterministic per plan (unlike seconds), so ANY
    significant movement here is a plan/data change, not ambient noise
    — the arithmetic complement of the time canary. Returns the flag
    list for probe_summary.json."""
    cur_p = os.path.join(BD, "..", "bench_shuffle.json")
    ref_p = os.path.join(BD, "shuffle_ref.json")
    if not os.path.exists(cur_p) or not os.path.exists(ref_p):
        return None
    with open(cur_p) as f:
        cur_doc = json.load(f)
    with open(ref_p) as f:
        ref_doc = json.load(f)
    # bytes are only comparable at the SAME scale factor: when the
    # last bench run before this report was a probe at another SF
    # (e.g. the gate's sf1 skew rep), a byte-ratio against the sf0.1
    # reference reads ~10x on every linearly-scaling query and prints
    # a wall of spurious "plan drift?" lines (round-15 gate log).
    if cur_doc.get("sf") != ref_doc.get("sf"):
        print(f"\n== shuffle drift: SKIPPED — sidecar sf "
              f"{cur_doc.get('sf')!r} != reference sf "
              f"{ref_doc.get('sf')!r} (re-run after a bench at the "
              f"reference SF) ==")
        return None
    cur = cur_doc["queries"]
    ref = ref_doc["queries"]
    flags = []
    for q in sorted(set(cur) & set(ref)):
        rb, cb = ref[q]["shuffle_bytes"], cur[q]["shuffle_bytes"]
        if rb == 0 and cb == 0:
            continue
        r = cb / rb if rb > 0 else float("inf")
        if r > 1.2 or r < 1 / 1.2:
            flags.append({"query": q, "ref_bytes": rb, "cur_bytes": cb,
                          "ratio": round(r, 3) if rb > 0 else None,
                          "ref_stages": ref[q].get("stages"),
                          "cur_stages": cur[q].get("stages")})
    print(f"\n== shuffle drift vs {os.path.basename(ref_p)} ==")
    if not flags:
        print(f"  no query moved >20% ({len(set(cur) & set(ref))} compared)")
    for fl in flags:
        print(f"  {fl['query']:32s} {fl['ref_bytes']:>12} -> "
              f"{fl['cur_bytes']:>12} bytes  ({fl['ratio']}x, stages "
              f"{fl['ref_stages']}->{fl['cur_stages']})  <- plan drift?")
    return {"flagged": flags,
            "compared": len(set(cur) & set(ref))}


def main():
    summary = {}
    pairs = [
        ("scale sf0.1->sf1", "probe_sf0.1", "probe_sf1", "scale"),
        ("skew/unif @ sf0.1", "unif0.1", "skew0.1", "skew0.1"),
        ("skew/unif @ sf1", "unif1", "skew1", "skew1"),
    ]
    for name, base_tag, num_tag, key in pairs:
        base, num = best(base_tag), best(num_tag)
        if not base[0] or not num[0]:
            print(f"\n== {name}: missing data ({base_tag} or {num_tag}) ==")
            continue
        summary[key] = ratio_table(name, base, num)
    ch = canary_headline()
    if ch:
        summary["headline"] = ch
    sd = shuffle_drift()
    if sd is not None:
        summary["shuffle_drift"] = sd
    with open(os.path.join(BD, "probe_summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\nwrote {os.path.join(BD, 'probe_summary.json')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
