"""One-process TPU batch for the round-4 probes (the claim queue costs
~15 min per process, so independent measurements share one claim):

1. flexsat tuning sweep        (tools/exp_family_tune.run_flexsat)
2. quadruped B=512/1024 rows   (tools/exp_family_tune.run_quadruped)
3. fused-kernel context probe  (tools/exp_fused_context.main)

Run on TPU: python tools/run_tpu_batch_r4.py
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import exp_family_tune
import exp_fused_context


def run_batched_conic():
    """Final rocket/grasp artifacts at the decided ladder configs
    (writes results_tpu/{rocket,grasp}_batched.json via the module CLI)."""
    import sys as _sys

    from altro_tpu.bench import batched_conic
    argv = _sys.argv
    _sys.argv = ["batched_conic"]
    try:
        batched_conic.main()
    finally:
        _sys.argv = argv


def run_agreement():
    """Re-gate the shipped conic configs (rocket L=5 / grasp L=2):
    phase1 on this TPU claim, phase2 in the scrubbed-CPU subprocess."""
    import sys as _sys

    from altro_tpu.bench import agreement_conic
    argv = _sys.argv
    _sys.argv = ["agreement_conic"]
    try:
        agreement_conic.main()
    finally:
        _sys.argv = argv


for name, fn in (("flexsat", exp_family_tune.run_flexsat),
                 ("quadruped", exp_family_tune.run_quadruped),
                 ("fused_context", exp_fused_context.main),
                 ("batched_conic", run_batched_conic),
                 ("agreement_conic", run_agreement)):
    print(f"==== {name}", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"==== {name} FAILED (continuing)", flush=True)
print("==== batch done", flush=True)
