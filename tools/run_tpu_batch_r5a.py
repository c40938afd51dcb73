"""First round-5 TPU batch (one process — the claim queue is 13-35 min
per process, so every TPU measurement rides one claim; CLAUDE.md r4).

Stages (validation first so a Mosaic-compile problem surfaces early):
 1. lsfused_ab      — fused ladder+AL-merit kernel A/B (flagship/rocket/
                      grasp). On failure or universal loss, pins
                      ALTRO_TPU_LSFUSED=0 for the remaining stages.
 2. fused_check p1  — fused-SOC COST-PARITY gate data (all lanes).
 3. rocket_gap p1   — the k=4 cost-gap knob diagnosis (7 config variants).
 4. conic_overhead  — compacted-step phase attribution (rocket).
 5. quad_attr       — quadruped segment attribution + compaction sweep.
 6. flexsat_compact — flexsat compaction cap sweep.
 7. batched_conic   — rocket/grasp throughput rows under current defaults.
Then the scrubbed-CPU phase2s (fused_check, rocket_gap).

Run on TPU: python tools/run_tpu_batch_r5a.py
"""
import json
import os
import subprocess
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def stage(name, fn):
    print(f"==== {name}", flush=True)
    try:
        fn()
        return True
    except SystemExit as e:
        if e.code not in (0, None):
            print(f"==== {name} FAILED rc={e.code} (continuing)", flush=True)
            return False
        return True
    except Exception:
        traceback.print_exc()
        print(f"==== {name} FAILED (continuing)", flush=True)
        return False


def lsfused_ab():
    import tools.exp_r5_lsfused_ab as m
    try:
        m.main()
    finally:
        # pin the default OFF if the fused path lost (or failed to
        # compile) everywhere — later stages must not inherit a broken
        # default path
        wins = []
        try:
            with open("results_tpu/lsfused_ab.json") as f:
                res = json.load(f)
            wins = [v.get("speedup", 0) > 1.0 for v in res.values()
                    if isinstance(v, dict) and "speedup" in v]
        except Exception:
            pass
        if not wins or not any(wins):
            print("lsfused lost/failed everywhere — pinning "
                  "ALTRO_TPU_LSFUSED=0", flush=True)
            os.environ["ALTRO_TPU_LSFUSED"] = "0"


def fused_check_p1():
    from altro_tpu.bench import fused_check
    fused_check.phase1_tpu("/tmp/altro_tpu_fused_check.npz")


def rocket_gap_p1():
    import tools.exp_r5_rocket_gap as m
    m.phase1("/tmp/altro_tpu_rocket_gap.npz")


def conic_overhead():
    import tools.exp_r5_conic_overhead as m
    m.main("rocket", 1024)


def quad_attr():
    import tools.exp_r5_quad_attr as m
    m.main(512, "qp")


def quad_grouped():
    import tools.exp_r5_quad_grouped as m
    m.main(128, "qp")


def flexsat_compact():
    from altro_tpu.bench.batched_families import flexsat_batched
    rows = []
    for kw in (dict(compact_cap=0),
               dict(compact_cap=4, compact_block=128,
                    compact_levels=((4, 128),)),
               dict(compact_cap=6, compact_block=128,
                    compact_levels=((6, 128),)),
               dict(compact_cap=8, compact_block=256,
                    compact_levels=((8, 128),))):
        rows.append(dict(flexsat_batched(B=1024, T=30, **kw), **kw,
                         compact_levels_used=str(kw.get("compact_levels"))))
    with open("results_tpu/flexsat_compact_r5.json", "w") as f:
        json.dump(rows, f, indent=1, default=str)


def batched_conic():
    from altro_tpu.bench import batched_conic as m
    argv = sys.argv
    sys.argv = ["batched_conic"]
    try:
        m.main()
    finally:
        sys.argv = argv


def cpu_phase2s():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    for mod, args in (
            ("altro_tpu.bench.fused_check",
             ["phase2", "--npz", "/tmp/altro_tpu_fused_check.npz",
              "--out", "results_tpu/fused_soc_check.json"]),):
        r = subprocess.run([sys.executable, "-m", mod] + args, env=env,
                           cwd=REPO)
        print(f"phase2 {mod}: rc={r.returncode}", flush=True)
    r = subprocess.run(
        [sys.executable, "tools/exp_r5_rocket_gap.py", "phase2",
         "--npz", "/tmp/altro_tpu_rocket_gap.npz",
         "--out", "results_tpu/rocket_gap_diag.json"], env=env, cwd=REPO)
    print(f"phase2 rocket_gap: rc={r.returncode}", flush=True)


for nm, fn in (("lsfused_ab", lsfused_ab),
               ("fused_check_p1", fused_check_p1),
               ("rocket_gap_p1", rocket_gap_p1),
               ("conic_overhead", conic_overhead),
               ("quad_attr", quad_attr),
               ("quad_grouped", quad_grouped),
               ("flexsat_compact", flexsat_compact),
               ("roofline", lambda: __import__(
                   "tools.exp_r5_roofline", fromlist=["main"]).main()),
               ("batched_conic", batched_conic),
               ("cpu_phase2s", cpu_phase2s)):
    stage(nm, fn)
print("==== r5a batch done", flush=True)
