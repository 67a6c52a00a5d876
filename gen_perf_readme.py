"""Regenerate README.md's performance table from a bench JSON line
(VERDICT r2 next #6: no perf number in README that bench.py didn't
produce).

Usage:
    python bench.py | tail -1 > /tmp/bench.json
    python gen_perf_readme.py /tmp/bench.json
    # or from a driver round file:
    python gen_perf_readme.py BENCH_r02.json
"""

import json
import sys

START = "<!-- PERF_TABLE_START (gen_perf_readme.py) -->"
END = "<!-- PERF_TABLE_END -->"


def load_detail(path):
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data:  # driver BENCH_r*.json wrapper
        data = data["parsed"]
    return data


def fmt(detail):
    d = detail["detail"]
    sol = d.get("sol", {})
    rows = [
        ("Cornell forward (12 bounces)",
         f"{d['fwd_ms']} ms ({d['fwd_rays_per_s'] / 1e6:.0f}M rays/s)"),
        ("Cornell forward+backward",
         f"{d['fwd_bwd_ms']} ms ({detail['value'] / 1e6:.0f}M rays/s, "
         f"bwd/fwd {sol.get('bwd_over_fwd', '?')}x)"),
        ("ReSTIR (restir_demo, 9 lights, fused in-kernel pipeline)",
         f"{d['restir_ms_per_pass']} ms "
         f"(round-3 split path: {d.get('restir_split_ms_per_pass', '?')} ms)"),
        ("ReSTIR fwd+bwd (differentiable reservoir state, fused adjoint)",
         f"{d.get('restir_fwd_bwd_ms', '?')} ms"
         + (f" (XLA route: {d['restir_fwd_bwd_xla_ms']} ms)"
            if 'restir_fwd_bwd_xla_ms' in d else "")),
        ("ReSTIR stress (41 lights)",
         f"{d.get('restir_stress_ms_per_pass', '?')} ms"),
        ("animated ReSTIR frame (6 bounces, EMA)",
         f"{d.get('animated_restir_ms_per_frame', '?')} ms "
         f"(reference animation gate: {d.get('animated_budget_ms', 16)} ms)"),
        ("image-textured Cornell (deferred texels)",
         f"{d.get('imgtex_ms_per_pass', '?')} ms "
         f"(XLA route: {d.get('imgtex_xla_ms_per_pass', '?')} ms)"),
        ("photographic cubemap (deferred fetches)",
         f"{d.get('cubemap_ms_per_pass', '?')} ms "
         f"(XLA route: {d.get('cubemap_xla_ms_per_pass', '?')} ms)"),
        ("gloss-coupled image texture (suffix-resume split)",
         f"{d.get('gloss_ms_per_pass', '?')} ms "
         f"(XLA route: {d.get('gloss_xla_ms_per_pass', '?')} ms)"),
        ("spectral+volumetric (config 5)",
         f"{d['config5_ms_per_pass']} ms"),
    ]
    lines = [START,
             "",
             f"Headline: **{detail['value'] / 1e6:.0f}M fwd+bwd rays/s/chip** "
             f"({detail['vs_baseline']}x the documented reference estimate, "
             "see bench.py docstring). "
             f"Steady-state per pass at {d['size']}, offline budget:",
             "",
             "| workload | measured |",
             "|---|---|"]
    for name, val in rows:
        lines.append(f"| {name} | {val} |")
    if sol:
        line = (
            f"Speed of light: {sol.get('xla_flops_per_step', 0) / 1e9:.1f} "
            f"GFLOP/step (XLA cost oracle) → "
            f"{sol.get('achieved_tflops', '?')} TFLOP/s ≈ "
            f"{100 * (sol.get('sol_fraction') or 0):.0f}% of the "
            f"{sol.get('device_kind', '?')} f32 vector peak.")
        mix = sol.get("op_mix")
        if mix:
            line += (
                f" Op-mix-weighted ceiling (selects/compares at full VPU "
                f"slots, transcendentals multi-slot): ideal "
                f"{mix.get('ideal_ms', '?')} ms → the step runs at "
                f"{100 * (mix.get('of_op_mix_ceiling') or 0):.0f}% of the "
                f"op-mix ceiling; top ops "
                + ", ".join(f"{k} {v}%" for k, v in
                            list(mix.get("top_ops_pct", {}).items())[:4])
                + ".")
        sweep = sol.get("adjoint_sweep")
        if sweep:
            line += (" Adjoint sweep (fwd / fwd+bwd ms): "
                     + ", ".join(
                         f"{k.split('_')[1]} bounces {v['fwd_ms']}/"
                         f"{v['fwd_bwd_ms']}"
                         for k, v in sweep.items()) + ".")
        lines += ["", line]
    lines.append(END)
    return "\n".join(lines)


def main():
    path = sys.argv[1]
    detail = load_detail(path)
    with open("README.md") as f:
        readme = f.read()
    a = readme.index(START)
    b = readme.index(END) + len(END)
    readme = readme[:a] + fmt(detail) + readme[b:]
    with open("README.md", "w") as f:
        f.write(readme)
    print("README.md perf table regenerated from", path)


if __name__ == "__main__":
    main()
