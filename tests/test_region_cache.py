'''Region-metric raw-count dedupe + capacity persistence.

configs/additionals/metrics.yaml instantiates 9 region metrics with
identical parameters; the engine feeds each the same batch arrays. The
base-metric ``_raw`` must compute the expensive region confusion once per
(batch, params) and share it (weakref-identity cache), and escalated
region capacities must persist on the instance so later batches skip the
re-escalation passes.
'''

import jax.numpy as jnp
import numpy as np
import pytest

from dnncancerannotator_tpu.metrics import region


@pytest.fixture(autouse=True)
def _clear_cache():
    del region._RAW_CACHE[:]
    yield
    del region._RAW_CACHE[:]


def _counting(monkeypatch):
    '''Count _raw_uncached invocations (one per uncached batch; capacity
    escalation may legitimately call region_confusion_batch several times
    within a single uncached pass).'''
    calls = []
    orig = region._RegionBasedMetric._raw_uncached

    def wrapper(self, y_true, y_pred):
        calls.append(1)
        return orig(self, y_true, y_pred)

    monkeypatch.setattr(region._RegionBasedMetric, '_raw_uncached', wrapper)
    return calls


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    y = (rng.rand(2, 32, 32) > 0.7).astype(np.float32)
    p = rng.rand(2, 32, 32).astype(np.float32)
    return jnp.asarray(y), jnp.asarray(p)


def test_raw_shared_across_instances(monkeypatch):
    calls = _counting(monkeypatch)
    kw = dict(thresholds=[0.5], IoU_threshold=0.3)
    suite = [region.RegionBasedRecall(**kw), region.RegionBasedPrecision(**kw),
             region.RegionBasedTruePositives(**kw),
             region.RegionBasedFBetaScore(beta=1.0, **kw)]
    y, p = _batch()
    for m in suite:
        m.update_state(y, p)
    assert sum(calls) == 1, f'expected 1 region pass, got {sum(calls)}'
    # results still self-consistent
    r = suite[0].result()
    assert 0.0 <= float(np.squeeze(r)) <= 1.0

    # a new batch recomputes exactly once more
    y2, p2 = _batch(seed=1)
    for m in suite:
        m.update_state(y2, p2)
    assert sum(calls) == 2


def test_raw_not_shared_across_params(monkeypatch):
    calls = _counting(monkeypatch)
    a = region.RegionBasedRecall(thresholds=[0.5], IoU_threshold=0.3)
    b = region.RegionBasedRecall(thresholds=[0.5], IoU_threshold=0.5)
    y, p = _batch()
    a.update_state(y, p)
    b.update_state(y, p)
    assert sum(calls) == 2


def test_cached_counts_match_uncached():
    y, p = _batch(seed=2)
    m1 = region.RegionBasedRecall(thresholds=[0.3, 0.6], IoU_threshold=0.3)
    m2 = region.RegionBasedRecall(thresholds=[0.3, 0.6], IoU_threshold=0.3)
    m1.update_state(y, p)   # fills the cache
    m2.update_state(y, p)   # consumes it
    assert np.array_equal(m1.tp_count, m2.tp_count)
    assert np.array_equal(m1.fp_count, m2.fp_count)
    assert np.array_equal(m1.fn_count, m2.fn_count)

    del region._RAW_CACHE[:]
    m3 = region.RegionBasedRecall(thresholds=[0.3, 0.6], IoU_threshold=0.3)
    m3.update_state(y, p)
    assert np.array_equal(m1.tp_count, m3.tp_count)


def test_capacity_escalation_persists():
    # 64 separated label dots > the default cap of 32 -> must escalate
    y = np.zeros((1, 64, 64), np.float32)
    for i in range(8):
        for j in range(8):
            y[0, i * 8 + 2, j * 8 + 2] = 1.0
    p = y.copy()
    m = region.RegionBasedRecall(thresholds=[0.5], IoU_threshold=0.3,
                                 morph_filter_size=1)
    assert m.max_label_regions == 32
    m.update_state(jnp.asarray(y), jnp.asarray(p))
    assert m.max_label_regions >= 64
    assert m.max_pred_regions >= 64
    # perfect prediction at 64 regions: all detected
    assert int(np.squeeze(m.tp_count)) == 64
    assert int(np.squeeze(m.fn_count)) == 0


def test_pixel_counts_shared(monkeypatch):
    from dnncancerannotator_tpu.metrics import pixel
    del pixel._COUNT_CACHE[:]
    calls = []
    orig = pixel._confusion_counts

    def wrapper(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pixel, '_confusion_counts', wrapper)
    th = [i / 9.0 for i in range(10)]
    suite = [pixel.TruePositives(th), pixel.FalsePositives(th),
             pixel.Recall(th), pixel.Precision(th)]
    y, p = _batch()
    for m in suite:
        m.update_state(y, p)
    assert sum(calls) == 1
    # different thresholds -> separate pass
    pixel.Recall([0.5]).update_state(y, p)
    assert sum(calls) == 2
    # results consistent between cached instances
    r = suite[2].result()
    assert r.shape == (10,)
    del pixel._COUNT_CACHE[:]
    fresh = pixel.Recall(th)
    fresh.update_state(y, p)
    np.testing.assert_array_equal(fresh.result(), r)
