'''Region-metric eval benchmark at the PR-curve operating point.

Times RegionBasedConfusionMatrix.update_state at batch 64 x 100 thresholds
x 256^2 (the Visualizer PR-curve export path, reference
annotator/utils/callbacks.py:190-204) and the metrics.yaml suite fan-out
(9 instances at one threshold). Reports:
  - cold wall time (compile + escalation recompiles, the ROADMAP #10 pain)
  - steady-state per-batch time
  - suite time with the shared-raw dedupe (should be ~1 instance's cost)

Round-1 baseline at this operating point: 1.9 s/batch steady state
(RESULTS.md "Pallas CCA kernel").
'''

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    import jax.numpy as jnp
    from dnncancerannotator_tpu.metrics import region

    rng = np.random.RandomState(0)
    # synthetic lesion-ish masks: blobby labels, noisy predictions
    B, H, W = 64, 256, 256
    yy, xx = np.mgrid[0:H, 0:W]
    y = np.zeros((B, H, W), np.float32)
    p = np.zeros((B, H, W), np.float32)
    for b in range(B):
        for _ in range(rng.randint(1, 5)):
            cy, cx = rng.randint(20, H - 20), rng.randint(20, W - 20)
            r = rng.randint(5, 18)
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            y[b][m] = 1.0
            p[b][m] = np.clip(0.75 + 0.2 * rng.randn(), 0, 1)
        p[b] += np.abs(rng.randn(H, W)) * 0.12   # noise floor
    y_d, p_d = jnp.asarray(y), jnp.asarray(np.clip(p, 0, 1))

    thresholds = np.linspace(0.005, 0.995, 100).tolist()
    # resize 0.5 is the round-1 operating point (RESULTS.md "Pallas CCA
    # kernel": 1.9 s/batch) — measure that first for comparability, then
    # the full-resolution variant.
    for rf, base in ((0.5, ' (round-1 baseline 1.9 s)'), (1.0, '')):
        cm = region.RegionBasedConfusionMatrix(
            thresholds=thresholds, IoU_threshold=0.30, resize_factor=rf)

        t0 = time.perf_counter()
        cm.update_state(y_d, p_d)
        cold = time.perf_counter() - t0
        print(f'[resize {rf}] PR-curve cold (compile+escalate): {cold:.1f} s '
              f'(caps now {cm.max_label_regions}/{cm.max_pred_regions})',
              flush=True)

        times = []
        for i in range(3):
            del region._RAW_CACHE[:]
            t0 = time.perf_counter()
            cm.update_state(y_d, p_d)
            times.append(time.perf_counter() - t0)
        print(f'[resize {rf}] PR-curve steady per-batch: '
              f'{min(times):.3f} s{base}', flush=True)

    # metrics.yaml suite: 9 region instances at one threshold
    kw = dict(thresholds=[0.8], IoU_threshold=0.3, resize_factor=0.5)
    suite = [region.RegionBasedPrecision(**kw), region.RegionBasedRecall(**kw),
             region.RegionBasedTruePositives(**kw),
             region.RegionBasedFalsePositives(**kw),
             region.RegionBasedFalseNegatives(**kw),
             region.RegionBasedFBetaScore(beta=1.0, **kw),
             region.RegionBasedFBetaScore(beta=2.0, **kw)]
    for m in suite:
        m.update_state(y_d, p_d)     # compile
    del region._RAW_CACHE[:]
    t0 = time.perf_counter()
    for m in suite:
        m.update_state(y_d, p_d)
    shared = time.perf_counter() - t0
    t0 = time.perf_counter()
    for m in suite:
        del region._RAW_CACHE[:]     # defeat the dedupe
        m.update_state(y_d, p_d)
    unshared = time.perf_counter() - t0
    print(f'suite (9 region metrics): shared {shared:.3f} s vs '
          f'unshared {unshared:.3f} s ({unshared / max(shared, 1e-9):.1f}x)',
          flush=True)


if __name__ == '__main__':
    main()
