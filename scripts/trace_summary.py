"""Summarize a ``jax.profiler`` trace: top device ops by self-time.

TPU-native analog of the reference's profiler post-processing
(reference scripts/run_profiler.py prints torch.profiler tables); here we
parse the xplane protobufs a ``jax.profiler.trace`` capture writes and
print the op-profile tree flattened to the top-K ops — the tool that
produced the "trace shares" tables in PERF.md.

Usage: python scripts/trace_summary.py /tmp/some_trace_dir [top_k]
"""
import glob
import json
import sys


def summarize(trace_dir: str, top_k: int = 25):
    from xprof.convert import raw_to_tool_data as rtd

    runs = sorted(glob.glob(trace_dir + "/plugins/profile/*"))
    if not runs:
        raise SystemExit(f"no profile runs under {trace_dir}")
    xp = glob.glob(runs[-1] + "/*.xplane.pb")
    data, _ = rtd.xspace_to_tool_data(xp, "op_profile", {})
    d = json.loads(data) if isinstance(data, (str, bytes)) else data

    rows = []
    total = [0.0]

    def walk(node, path):
        children = node.get("children", [])
        m = node.get("metrics", {})
        name = node.get("name", "?")
        if not children:
            t = m.get("rawTime", m.get("time", 0.0))
            rows.append((float(t), " / ".join(path + [name])))
            total[0] += float(t)
        for c in children:
            walk(c, path + [name])

    root = d.get("byCategory") or d.get("byProgram") or d
    walk(root, [])
    rows.sort(reverse=True)
    print(f"total leaf self-time: {total[0]:.3g}")
    for t, name in rows[:top_k]:
        print(f"{100.0 * t / max(total[0], 1e-12):6.2f}%  {name[:150]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
