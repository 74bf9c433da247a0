import collections, re, sys
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtrace/plugins/profile/2026_08_17_16_26_35/vm.xplane.pb"
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    ev_meta = plane.event_metadata
    for line in plane.lines:
        if line.name not in ("XLA Ops",):
            continue
        cat = collections.Counter(); catn = collections.Counter()
        top = collections.Counter()
        total = 0.0
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            dur = ev.duration_ps / 1e9
            total += dur
            m = re.match(r"%?([a-zA-Z\-_]+)", name)
            k = m.group(1) if m else name
            cat[k] += dur; catn[k] += 1
            top[name[:100]] += dur
        print(f"line={line.name} total={total:.1f} ms over 3 steps")
        print("-- by op kind:")
        for k, ms in cat.most_common(20):
            print(f"  {ms:9.2f} ms  n={catn[k]:5d}  {k}")
        print("-- top individual ops:")
        for k, ms in top.most_common(25):
            print(f"  {ms:9.2f} ms  {k}")
