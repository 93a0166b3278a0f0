"""One-command real-weights acceptance runner (VERDICT r4 #2).

The reference's de-facto acceptance test replays actual upstream checkpoints
through hard thresholds (``/root/reference/example/correctness.rs:666-904``,
``/root/reference/tool/import_depth_pro.rs:24-64``).  This host has no
network, so real weights have never flowed through this repo's import+verify
path; the day they appear, the whole checklist (NEXT.md, PARITY.md) must run
in order without anyone reconstructing it.  This runner IS that checklist —
one command, one machine-readable pass/fail report.

Stages (each runs iff its inputs were given; the report records every
stage's verdict):

1. ``import``      — checkpoint → param tree via the production importers,
                     STRICT report: every source tensor applied or
                     explicitly ignorable, none missing.
2. ``correctness`` — ``cli.correctness`` full gates on a golden dump
                     (reference thresholds verbatim, incl. the
                     decoder-isolation and head-only-from-tokens bisection
                     stages the verify harness prints).
3. ``knob_sweep``  — DA3-small ``rope_coords``/``cat_order`` 4-combination
                     sweep: the gate must pass on EXACTLY ONE combination
                     (localizes the upstream convention; a pass on several
                     means the dump cannot discriminate and parity is not
                     proven).
4. ``tier_drift``  — the serving-tier ladder measured on the IMPORTED
                     weights (``tools/tier_drift.py --checkpoint``): full
                     int8, the int8mix graceful-degradation rungs, and the
                     outlier-robust calibrations — trained activation
                     outliers are the canonical int8 breaker and the
                     committed synthetic legs only bound them (BENCH.md
                     round 4/5).
5. ``adjudicate``  — the tier gate re-run on the fresh record with BOTH
                     gate stats (scale-free ``abs_rel_mean`` AND the
                     absolute ``inv_mean_abs`` — VERDICT r4 weak #3: the
                     width-leg gate choice must be re-adjudicated on real
                     weights, where the conditioning-scale argument no
                     longer applies).

Offline CI proof: ``tests/test_real_weights_day.py`` drives this exact
runner end-to-end with the HF thin-oracle / torch-oracle artifacts standing
in for real weights, so the command cannot rot before the day it matters.

Real-weights day:

  python tools/real_weights_day.py \\
      --depth-pro-checkpoint depth_pro.pt --depth-pro-golden dp_dump.safetensors \\
      --da3-small-state da3s_state.safetensors --da3-small-config da3s.json \\
      --da3-small-golden da3s_dump.safetensors \\
      --workdir /tmp/rwd --report /tmp/rwd/report.json [--platform tpu --time]

(Generate the goldens first with the upstream-repo backends:
``tools/correctness_depth_pro.py --backend apple`` /
``tools/correctness_da3.py --backend upstream`` — their first-ever
execution is step 0 of the day.)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

KNOB_COMBOS = [("index", "prev_first"), ("index", "cur_first"),
               ("norm_pm1", "prev_first"), ("norm_pm1", "cur_first")]


def stage_import(model: str, checkpoint: Path, config: Path | None,
                 variant: str = "metric-large") -> dict:
    """Strict import: every tensor applied; none ignored or missing."""
    cfg = None
    if config is not None:
        from burn_depth_tpu.core.configio import load_config

        cfg = load_config(str(config))
    if model == "depth_pro":
        from burn_depth_tpu.io.importers import import_depth_pro

        _m, report = (import_depth_pro(str(checkpoint), config=cfg)
                      if cfg is not None else import_depth_pro(str(checkpoint)))
    else:
        from burn_depth_tpu.io.importers import import_da3

        _m, report = import_da3(str(checkpoint), variant=variant, config=cfg)
    ignored = list(getattr(report, "ignored", []) or [])
    missing = list(getattr(report, "missing", []) or [])
    return {
        "ok": not ignored and not missing,
        "applied": getattr(report, "applied", None),
        "ignored": ignored[:20],
        "missing": missing[:20],
    }


def stage_correctness(model_flag: str, golden: Path, checkpoint: Path,
                      config: Path | None, rel_floor: float | None) -> dict:
    from burn_depth_tpu.cli.correctness import main as correctness_main

    argv = ["--model", model_flag, "--golden", str(golden),
            "--checkpoint", str(checkpoint)]
    if config is not None:
        argv += ["--config", str(config)]
    if rel_floor is not None:
        argv += ["--rel-floor", str(rel_floor)]
    rc = correctness_main(argv)
    return {"ok": rc == 0, "exit_code": rc}


def stage_knob_sweep(state: Path, config: Path, golden: Path,
                     rel_floor: float | None) -> dict:
    """4-combination convention sweep — exactly one combination may pass."""
    import dataclasses

    from burn_depth_tpu.core.configio import load_config
    from burn_depth_tpu.io.checkpoint import load_safetensors
    from burn_depth_tpu.io.importers import import_da3
    from burn_depth_tpu.verify.da3 import run_da3_parity

    thresholds = {"rel_floor": rel_floor} if rel_floor is not None else None
    gold = load_safetensors(str(golden))
    results = {}
    for rope_coords, cat_order in KNOB_COMBOS:
        cfg = dataclasses.replace(
            load_config(str(config)), rope_coords=rope_coords, cat_order=cat_order
        )
        model, _ = import_da3(str(state), variant="small", config=cfg)
        results[f"{rope_coords}/{cat_order}"] = bool(
            run_da3_parity(model, gold, thresholds).ok
        )
    passing = [k for k, ok in results.items() if ok]
    return {"ok": len(passing) == 1, "passing": passing, "combos": results}


def stage_tier_drift(model: str, checkpoint: Path, config: Path | None,
                     image: Path, out: Path, platform: str | None,
                     timed: bool, tiers: list | None) -> dict:
    """Run tools/tier_drift.py --checkpoint; returns the written leg."""
    import tools.tier_drift as td

    if tiers is None:
        # CPU → f32 names (drift resolved at f32; the bf16 floor would mask
        # it); TPU → the shipping bf16 names + timing.
        on_tpu = platform == "tpu"
        base = "bf16" if on_tpu else "f32"
        fused = "_fused" if model == "depth_pro" else ""
        tiers = [f"{base}_erf{fused}", f"{base}_tanh{fused}",
                 f"{base}_tanh_int8{fused}",
                 f"{base}_tanh_int8mix4{fused}", f"{base}_tanh_int8mix12{fused}",
                 f"{base}_tanh_int8_p999{fused}"]
    argv = ["--leg", "flagship", "--model", model,
            "--checkpoint", str(checkpoint), "--image", str(image),
            "--out", str(out), "--tiers", *tiers]
    if config is not None:
        argv += ["--config", str(config)]
    if platform is not None:
        argv += ["--platform", platform]
    if timed:
        argv += ["--time"]
    rc = td.main(argv)
    leg = ("flagship" if model == "depth_pro" else f"{model}_flagship") + "_imported"
    return {"ok": rc == 0, "leg": leg, "record": str(out)}


def stage_adjudicate(drift_path: Path, leg: str) -> dict:
    """Both-stat tier gate on the imported-weights record (VERDICT r4 weak
    #3): report the fastest tier passing the conservative two-stat AND, the
    fastest passing the scale-free clause stat alone, and whether they
    agree.  On real weights there is no conditioning-scale caveat, so the
    SHIPPING decision is the two-stat (strict) one."""
    from burn_depth_tpu.core.tiers import TIER_LADDER, tier_passes_accuracy

    record = json.loads(Path(drift_path).read_text())
    if leg not in record:
        return {"ok": False, "error": f"leg {leg!r} missing from {drift_path}"}
    tiers = record[leg]["tiers"]

    def pick(scale_free_only: bool):
        # ladder order = fastest first; accept calibration-suffixed names
        for _m, _g, name, _s in TIER_LADDER:
            stem = name.replace("bf16_", "").replace("_fused", "")
            # plain absmax name first, calibration-suffixed variants after
            for tname, rec in sorted(tiers.items(), key=lambda kv: len(kv[0])):
                tstem = (tname.replace("bf16_", "").replace("f32_", "")
                         .replace("_fused", "").replace("_p999", "").replace("_mse", ""))
                if tstem == stem and tier_passes_accuracy(rec, scale_free_only):
                    return tname
        return None

    strict = pick(False)
    scale_free = pick(True)
    return {
        "ok": strict is not None,
        "strict_two_stat_tier": strict,
        "scale_free_tier": scale_free,
        "stats_agree": strict == scale_free,
        "shipping_decision": strict or "parity (no tier passed the strict gate)",
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--image", type=Path, default=REPO / "assets" / "image" / "test.png")
    ap.add_argument("--workdir", type=Path, required=True)
    ap.add_argument("--report", type=Path, default=None)
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--time", action="store_true", help="record per-tier ms (TPU)")
    ap.add_argument("--skip-drift", action="store_true")
    ap.add_argument("--drift-tiers", nargs="*", default=None,
                    help="override the tier list for the drift stage (the CI "
                    "dry run uses a reduced list; default = full ladder incl. "
                    "mix rungs + p999)")

    ap.add_argument("--depth-pro-checkpoint", type=Path)
    ap.add_argument("--depth-pro-golden", type=Path)
    ap.add_argument("--depth-pro-config", type=Path)
    ap.add_argument("--depth-pro-rel-floor", type=float, default=None)

    ap.add_argument("--da3-checkpoint", type=Path, help="DA3 metric-large (mono)")
    ap.add_argument("--da3-golden", type=Path)
    ap.add_argument("--da3-config", type=Path)

    ap.add_argument("--da3-small-state", type=Path)
    ap.add_argument("--da3-small-golden", type=Path)
    ap.add_argument("--da3-small-config", type=Path)
    ap.add_argument("--da3-rel-floor", type=float, default=None)
    args = ap.parse_args(argv)

    args.workdir.mkdir(parents=True, exist_ok=True)
    drift_out = args.workdir / "imported_tier_drift.json"
    report: dict = {"stages": {}}

    def run(name, fn, *a, **kw):
        print(f"=== {name}", file=sys.stderr)
        try:
            out = fn(*a, **kw)
        except Exception as e:  # a stage crash is a FAIL, not a crash of the day
            out = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        report["stages"][name] = out
        print(f"    -> {json.dumps(out)[:300]}", file=sys.stderr)

    if args.depth_pro_checkpoint:
        run("depth_pro.import", stage_import, "depth_pro",
            args.depth_pro_checkpoint, args.depth_pro_config)
        if args.depth_pro_golden:
            run("depth_pro.correctness", stage_correctness, "depth-pro",
                args.depth_pro_golden, args.depth_pro_checkpoint,
                args.depth_pro_config, args.depth_pro_rel_floor)
        if not args.skip_drift:
            run("depth_pro.tier_drift", stage_tier_drift, "depth_pro",
                args.depth_pro_checkpoint, args.depth_pro_config, args.image,
                drift_out, args.platform, args.time, args.drift_tiers)
            run("depth_pro.adjudicate", stage_adjudicate, drift_out,
                "flagship_imported")

    if args.da3_checkpoint:
        run("da3.import", stage_import, "da3", args.da3_checkpoint,
            args.da3_config, "metric-large")
        if args.da3_golden:
            run("da3.correctness", stage_correctness, "depth-anything-3",
                args.da3_golden, args.da3_checkpoint, args.da3_config,
                args.da3_rel_floor)

    if args.da3_small_state:
        run("da3_small.import", stage_import, "da3", args.da3_small_state,
            args.da3_small_config, "small")
        if args.da3_small_golden:
            run("da3_small.correctness", stage_correctness, "depth-anything-3",
                args.da3_small_golden, args.da3_small_state,
                args.da3_small_config, args.da3_rel_floor)
            run("da3_small.knob_sweep", stage_knob_sweep, args.da3_small_state,
                args.da3_small_config, args.da3_small_golden, args.da3_rel_floor)

    if not report["stages"]:
        print("no checkpoints given — nothing to do (see --help)", file=sys.stderr)
        return 2

    report["ok"] = all(s.get("ok") for s in report["stages"].values())
    text = json.dumps(report, indent=1)
    if args.report:
        args.report.write_text(text + "\n")
    print(text)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
