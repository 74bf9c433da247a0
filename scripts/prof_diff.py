"""Diff two prof_trace JSON dumps taken at different batch sizes.

Classifies each op by how its device time scales with batch: an op whose
time is ~constant across batches is per-step fixed cost (dispatch/small-op
overhead — the thing ROADMAP's train-step bisection attributes ~56 ms to);
an op that scales ~linearly is real per-image work. Prints the top
batch-invariant ops — the targets for op-count reduction.

Usage: python scripts/prof_diff.py a.json b.json batch_a batch_b
"""
import json
import sys


def main():
    pa, pb, ba, bb = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    a = json.load(open(pa))
    b = json.load(open(pb))
    ops_a, ops_b = a["ops_ms"], b["ops_ms"]
    keys = set(ops_a) | set(ops_b)
    rows = []
    for k in keys:
        ta, tb = ops_a.get(k, 0.0), ops_b.get(k, 0.0)
        # fixed+marginal model: t = f + m*batch  =>  solve from two points
        m = (tb - ta) / (bb - ba)
        f = ta - m * ba
        rows.append((f, m, ta, tb, k))
    total_f = sum(max(r[0], 0.0) for r in rows)
    total_m = sum(max(r[1], 0.0) for r in rows)
    steps = 3  # prof_trace records 3 steps
    print(f"batch {ba} total {a['total_ms']:.1f} ms, batch {bb} total {b['total_ms']:.1f} ms (x{steps} steps)")
    print(f"fixed cost ~{total_f/steps:.1f} ms/step, marginal ~{total_m/steps:.3f} ms/img/step")
    print(f"{'fixed/step':>10} {'marg/img':>9} {'t@'+str(ba):>8} {'t@'+str(bb):>8}  op")
    for f, m, ta, tb, k in sorted(rows, key=lambda r: -r[0])[:40]:
        print(f"{f/steps:10.3f} {m/steps:9.4f} {ta/steps:8.2f} {tb/steps:8.2f}  {k[:100]}")

    # aggregate fixed cost by op kind prefix
    import collections
    import re

    kind_f = collections.Counter()
    kind_n = collections.Counter()
    for f, m, ta, tb, k in rows:
        mm = re.match(r"%?([a-zA-Z\-_]+)", k)
        kk = mm.group(1) if mm else k
        kind_f[kk] += max(f, 0.0)
        kind_n[kk] += 1
    print("-- fixed cost by op kind (ms/step):")
    for k, f in kind_f.most_common(15):
        print(f"  {f/steps:8.2f} ms  n={kind_n[k]:5d}  {k}")


if __name__ == "__main__":
    main()
