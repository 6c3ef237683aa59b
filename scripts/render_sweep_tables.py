"""Render docs/benchmarks.md tables from the round-5 sweep JSONL.

Usage: python scripts/render_sweep_tables.py [/tmp/round5_sweeps.jsonl]
Prints markdown: the static multi-scene family table (PSNR @2500 per scene
+ mean), the dynamic family table, K-Planes stability rows, BARF and
opaque rows.  Keeps docs regenerable from the measurement artifact.
"""
import json
import sys
from collections import defaultdict

STATIC_SCENES = [
    "procedural", "proceduraltextured", "proceduralthin",
    "proceduralmixed", "proceduralopaque",
]
SCENE_SHORT = {
    "procedural": "base", "proceduraltextured": "textured",
    "proceduralthin": "thin", "proceduralmixed": "mixed",
    "proceduralopaque": "opaque", "proceduraldynamic": "smooth-warp",
    "procedurallocaldyn": "local-dyn",
}


def main(path="/tmp/round5_sweeps.jsonl"):
    rows = {}
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        rows[d["name"]] = d

    # ---- static: family x scene PSNR @2500 ----
    fams = defaultdict(dict)
    for name, d in rows.items():
        if "@" not in name or "results" not in d:
            continue
        fam, scene = name.rsplit("@", 1)
        if scene in STATIC_SCENES:
            fams[fam][scene] = d

    print("## Static multi-scene head-to-head (PSNR @2500 steps)\n")
    hdr = "| field | " + " | ".join(SCENE_SHORT[s] for s in STATIC_SCENES)
    print(hdr + " | mean | mean wall |")
    print("|---" * (len(STATIC_SCENES) + 3) + "|")
    for fam in sorted(fams):
        cells, psnrs, walls = [], [], []
        for s in STATIC_SCENES:
            d = fams[fam].get(s)
            if d is None:
                cells.append("—")
                continue
            p = d["results"][-1]["psnr"]
            w = d["results"][-1]["train_wall_s"]
            psnrs.append(p)
            walls.append(w)
            cells.append(f"{p:.2f}")
        mean = sum(psnrs) / len(psnrs) if psnrs else float("nan")
        mw = sum(walls) / len(walls) if walls else float("nan")
        print(
            f"| {fam} | " + " | ".join(cells)
            + f" | **{mean:.2f}** | {mw:.0f} s |"
        )

    # ---- dynamic ----
    print("\n## Dynamic scenes (10k steps)\n")
    print("| run | scene | PSNR | SSIM | wall | samples/s |")
    print("|---|---|---|---|---|---|")
    for name, d in sorted(rows.items()):
        if d.get("field") in ("tnerf", "kplanes", "tineuvox"):
            print(
                f"| {name} | {SCENE_SHORT.get(d['scene'], d['scene'])} | "
                f"{d['psnr']:.2f} | {d['ssim']:.4f} | "
                f"{d['train_wall_s']:.0f} s | {d['samples_per_sec']/1e6:.1f}M |"
            )

    # ---- barf ----
    print("\n## BARF\n")
    print("| run | PSNR | rot (deg) | trans | init rot | wall |")
    print("|---|---|---|---|---|---|")
    for name, d in sorted(rows.items()):
        if "rot_deg" in d:
            print(
                f"| {name} | {d.get('psnr', '—')} | {d['rot_deg']} | "
                f"{d['trans']} | {d.get('rot_deg_init', '—')} | "
                f"{d.get('train_wall_s', d.get('wall_s', '—'))} s |"
            )

    # ---- opaque quality rows ----
    print("\n## Opaque-scene quality rows (train_ngp_nerf_occ defaults)\n")
    print("| run | PSNR | SSIM |")
    print("|---|---|---|")
    for name, d in sorted(rows.items()):
        if name.startswith("opaque-"):
            print(f"| {name} | {d['psnr']:.2f} | {d['ssim']:.4f} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
