import glob, collections
try:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
except ImportError:
    from tensorboard_plugin_profile.protobuf import xplane_pb2
f = glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True)[0]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(f, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    ev_md = plane.event_metadata
    agg = collections.Counter()
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Ops" not in line.name:
            continue
        for ev in line.events:
            md = ev_md[ev.metadata_id]
            agg[md.name] += ev.duration_ps
    total = sum(agg.values())
    print(f"== plane {plane.name}, total {total/1e12*1000:.2f} ms over lines")
    for name, ps in agg.most_common(25):
        print(f"{ps/1e9:10.3f} ms-ish {100*ps/max(total,1):5.1f}%  {name[:110]}")
    break
