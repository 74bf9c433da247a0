#!/usr/bin/env python
"""Join a prof_trace JSON (per-op device ms) with the optimized HLO text to
attribute device time to MODEL REGIONS (stem, DLA levels, FPN, head towers,
predictors, decode/NMS, input prep, quantize-only passes). This is the
roofline-accounting tool VERDICT r4 #1 asks for: per-region ms next to what
the op actually is (conv fusion vs standalone elementwise).

Usage: python scripts/prof_regions.py /tmp/int8_b128.json /tmp/int8_opt_hlo.txt [steps=3]
"""
import collections
import json
import re
import sys


def main():
    prof_path, hlo_path = sys.argv[1], sys.argv[2]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    prof = json.load(open(prof_path))
    ops_ms = prof["ops_ms"]

    # op name (%xxx.NN) -> (op_name metadata, is_conv) from the HLO text
    meta = {}
    isconv = {}
    shape_of = {}
    pat = re.compile(r"^\s+(%[\w.\-]+) = ([^ ]+) ")
    for line in open(hlo_path):
        m = pat.match(line)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        om = re.search(r'op_name="([^"]+)"', line)
        meta[name] = om.group(1) if om else ""
        isconv[name] = "window_config" in line or line.lstrip().startswith("%conv")
        shape_of[name] = shape

    def region(op_name, hlo_name):
        s = op_name
        if "/backbone/bottom_up/base_layer" in s or "/base_layer" in s:
            return "stem(base_layer)"
        for lv in range(7):
            if f"/level{lv}/" in s or s.endswith(f"/level{lv}") or f"/level{lv}_" in s:
                return f"dla_level{lv}"
        if "/backbone/fpn" in s or "fpn_" in s or "/top_block" in s:
            return "fpn"
        if "tower" in s:
            return "head_towers"
        if "fcos2d_head" in s or "fcos3d_head" in s:
            return "head_predictors"
        if "dd3d_inference" in s or "nms" in s or "top_k" in s or "sort" in s or "decode" in s:
            return "decode_nms"
        if "while" in hlo_name or "sort" in hlo_name:
            return "decode_nms"
        if s == "":
            return "unattributed"
        return "other"

    by_region = collections.Counter()
    by_region_conv = collections.Counter()
    by_region_n = collections.Counter()
    rows = []
    for opname, ms in ops_ms.items():
        hlo_name = opname.split(" = ")[0].strip()
        key = hlo_name if hlo_name in meta else None
        if key is None:
            # profile truncates at 110 chars; match by prefix
            base = hlo_name.split(" ")[0]
            key = base if base in meta else None
        om = meta.get(key, "")
        r = region(om, key or "")
        per_step = ms / steps
        by_region[r] += per_step
        by_region_n[r] += 1
        if key is not None and isconv.get(key):
            by_region_conv[r] += per_step
        rows.append((per_step, r, key or hlo_name, om, isconv.get(key, False)))

    total = sum(by_region.values())
    print(f"total {total:.1f} ms/step over {len(ops_ms)} ops")
    print(f"{'region':18s} {'ms/step':>8s} {'conv ms':>8s} {'elemw ms':>9s} {'n':>5s}")
    for r, ms in by_region.most_common():
        conv = by_region_conv[r]
        print(f"{r:18s} {ms:8.2f} {conv:8.2f} {ms-conv:9.2f} {by_region_n[r]:5d}")

    print("\n-- top 30 ops with region/metadata:")
    for per_step, r, name, om, conv in sorted(rows, reverse=True)[:30]:
        tag = "CONV" if conv else "elem"
        print(f"{per_step:7.3f} ms {tag} {r:16s} {name[:46]:46s} {om[-70:]}")


if __name__ == "__main__":
    main()
