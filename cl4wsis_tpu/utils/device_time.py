"""Device-time extraction from jax.profiler traces.

The wall clock through remote-TPU tunnels is unreliable (bench.py's
implied-MFU gate flags impossible numbers); the profiler's XSpace trace
records what the DEVICE actually did. This reads the .xplane.pb files a
``jax.profiler.trace(dir)`` context writes and sums busy time on the device
planes, giving a ground-truth step time for bench audits and kernel A/Bs.

Usage:
    with jax.profiler.trace("/tmp/trace"):
        ... run N steps ...
    report = device_time_report("/tmp/trace")
    # {'device_busy_s': ..., 'span_s': ..., 'planes': {...}}
"""

from __future__ import annotations

import glob
import os
from typing import Dict


def _xplane_pb2():
    import importlib
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2",
                "tensorboard_plugin_profile.protobuf.xplane_pb2"):
        try:
            return importlib.import_module(mod)
        except ImportError:
            continue
    raise ImportError("no xplane_pb2 available (tensorflow not installed?)")


def _load_xspaces(trace_dir: str):
    xplane_pb2 = _xplane_pb2()
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


def device_time_report(trace_dir: str) -> Dict:
    """Busy-time per device plane (union of event intervals per line,
    max over lines per plane — XLA op lines overlap sub-ops)."""
    planes: Dict[str, Dict] = {}
    for xs in _load_xspaces(trace_dir):
        for plane in xs.planes:
            name = plane.name
            is_device = ("TPU" in name or "/device:" in name
                         or "gpu" in name.lower())
            if not is_device:
                continue
            best_busy = 0.0
            span_lo, span_hi = None, None
            for line in plane.lines:
                ivs = []
                for ev in line.events:
                    start = line.timestamp_ns + ev.offset_ps / 1e3
                    dur = ev.duration_ps / 1e3  # ns
                    ivs.append((start, start + dur))
                if not ivs:
                    continue
                ivs.sort()
                busy = 0.0
                cur_lo, cur_hi = ivs[0]
                for lo, hi in ivs[1:]:
                    if lo > cur_hi:
                        busy += cur_hi - cur_lo
                        cur_lo, cur_hi = lo, hi
                    else:
                        cur_hi = max(cur_hi, hi)
                busy += cur_hi - cur_lo
                best_busy = max(best_busy, busy)
                lo = ivs[0][0]
                hi = max(h for _, h in ivs)
                span_lo = lo if span_lo is None else min(span_lo, lo)
                span_hi = hi if span_hi is None else max(span_hi, hi)
            if best_busy > 0:
                planes[name] = {
                    "busy_s": best_busy / 1e9,
                    "span_s": ((span_hi - span_lo) / 1e9
                               if span_lo is not None else 0.0),
                }
    total_busy = sum(p["busy_s"] for p in planes.values())
    total_span = max((p["span_s"] for p in planes.values()), default=0.0)
    return {"device_busy_s": total_busy, "span_s": total_span,
            "planes": planes}


def module_step_times(trace_dir: str) -> Dict[str, list]:
    """Per-execution durations (seconds) of each XLA module on the device.

    TPU xplane traces carry an "XLA Modules" line on each device plane with
    one event per module execution — for a timed loop of N identical train
    steps that is N events of the step program, giving per-step device
    times (min/mean/variance) instead of only a busy-time total.

    Returns {module_name: [duration_s, ...]} merged across device planes.
    """
    out: Dict[str, list] = {}
    for xs in _load_xspaces(trace_dir):
        for plane in xs.planes:
            name = plane.name
            is_device = ("TPU" in name or "/device:" in name
                         or "gpu" in name.lower())
            if not is_device:
                continue
            metadata = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            for line in plane.lines:
                if "module" not in line.name.lower():
                    continue
                for ev in line.events:
                    mname = metadata.get(ev.metadata_id, str(ev.metadata_id))
                    out.setdefault(mname, []).append(ev.duration_ps / 1e12)
    return out


def op_breakdown(trace_dir: str, top: int = 40) -> list:
    """Aggregate device op time by (normalized) HLO op name.

    Reads the "XLA Ops" lines of the device planes and sums durations per
    op name with trailing .N / digit suffixes stripped, so all instances
    of e.g. `fusion.123` pool into `fusion`. Returns [(name, total_s,
    count)] sorted by total, top-N — the kernel A/B compass.
    """
    import re
    agg: Dict[str, list] = {}
    for xs in _load_xspaces(trace_dir):
        for plane in xs.planes:
            name = plane.name
            if not ("TPU" in name or "/device:" in name):
                continue
            metadata = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            for line in plane.lines:
                lname = line.name.lower()
                if "op" not in lname or "module" in lname:
                    continue
                for ev in line.events:
                    mname = metadata.get(ev.metadata_id, str(ev.metadata_id))
                    key = re.sub(r"[.\d]+$", "", mname)
                    ent = agg.setdefault(key, [0.0, 0])
                    ent[0] += ev.duration_ps / 1e12
                    ent[1] += 1
    rows = sorted(((k, v[0], v[1]) for k, v in agg.items()),
                  key=lambda r: -r[1])
    return rows[:top]


def main_module_times(trace_dir: str) -> list:
    """Durations of the dominant module (largest total device time) — for a
    bench loop this is the train step program. Empty when no module line
    exists in the trace."""
    mods = module_step_times(trace_dir)
    if not mods:
        return []
    return max(mods.values(), key=sum)


if __name__ == "__main__":
    import json
    import sys
    rep = device_time_report(sys.argv[1])
    rep["module_steps"] = {k: [round(v, 4) for v in vs]
                           for k, vs in module_step_times(sys.argv[1]).items()}
    print(json.dumps(rep, indent=2))
