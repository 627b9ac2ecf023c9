"""Device-trace timing for the flagship roundtrip.

This rig's IFRT-proxy tunnel resolves block_until_ready before the device
has actually executed (see PERFNOTES.md round 2), so wall-clock timing of
dispatches measures nothing. Instead: capture a jax.profiler device trace
and report the DEVICE duration of the executed XLA modules, parsed straight
from the xplane protobuf.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import time


def device_trace_durations(logdir: str):
    """Parse xplane.pb files -> {plane_name: [(event_name, dur_ns), ...]}."""
    from tensorboard_plugin_profile.protobuf import xplane_pb2
    out = {}
    for path in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                          recursive=True):
        xspace = xplane_pb2.XSpace()
        with open(path, 'rb') as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            events = []
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    events.append((meta.get(ev.metadata_id, '?'),
                                   ev.duration_ps / 1e3))  # ns
            if events:
                out.setdefault(plane.name, []).extend(events)
    return out


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastpcc_tpu.models.lossl_coord import Config
    from fastpcc_tpu.models.lossl_coord.model import Model, _bucket, sp_pad_codes
    from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan
    from fastpcc_tpu.ops.morton import np_morton_encode

    channels = int(os.environ.get('BENCH_CH', '128'))
    cfg = Config()
    cfg.channels = channels
    cfg.coord_bits = 16
    cfg.check()
    model = Model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rt = model.split_roundtrip()

    clouds = []
    cap = 0
    for i in range(3):
        xyz = synthetic_lidar_scan(seed=i, resolution=65536)
        codes = np.unique(np_morton_encode(xyz.astype(np.int64)))
        cap = max(cap, _bucket(len(codes)))
        clouds.append(codes)
    dev = [(jnp.asarray(sp_pad_codes(c, cap)), jnp.int32(len(c)))
           for c in clouds]

    out = rt(params, *dev[0])            # compile
    jax.block_until_ready(out)
    time.sleep(2)

    logdir = '/tmp/fpc_trace'
    os.system(f'rm -rf {logdir}')
    with jax.profiler.trace(logdir):
        outs = [rt(params, *dev[i]) for i in (1, 2)]
        jax.block_until_ready(outs)
        time.sleep(8)                    # let remote execution actually finish
    print('oks:', [bool(o[1]) for o in outs])  # forces real completion

    planes = device_trace_durations(logdir)
    for name, events in sorted(planes.items()):
        total = sum(d for _, d in events)
        if 'TPU' not in name and 'device' not in name.lower():
            continue
        print(f'--- plane {name}: {len(events)} events, total {total/1e6:.2f} ms')
        agg = {}
        for n, d in events:
            agg[n] = agg.get(n, 0.0) + d
        for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
            print(f'    {d/1e6:9.3f} ms  {n[:90]}')
    n_pts = len(clouds[1])
    print(f'points per scan: {n_pts}')


if __name__ == '__main__':
    main()
